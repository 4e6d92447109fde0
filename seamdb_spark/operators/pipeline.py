"""End-to-end corpus-curation pipeline over the ``documents`` table.

The composed training-data flow the individual operators exist for:
quality filter (t02 formula) -> near-dup clustering (d03 simhash pairs
-> d09 connected components) -> one keeper per cluster among the
quality survivors (d11 argmax) -> a per-document verdict. One query,
one oracle, so the whole chain is hash-checked end-to-end rather than
only stage-by-stage.

Scale (100 TB): the chain adds nothing beyond its stages' own costs —
the verdict join is doc_id-keyed (skew-free), and the keeper argmax is
a groupBy over cluster assignments whose group sizes are bounded by
near-dup cluster sizes. Cluster membership is computed on the FULL
corpus and the keeper among quality survivors only (the conservative
production choice: a dropped bridge document does not re-split a
cluster into two keepers); the oracle encodes the identical rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _cc_clusters, _cc_ctes
from .registry import register
from .rounding import dround
from .text import QUALITY_SQL, t02_quality_score

QUALITY_MIN = 0.10


def _pipeline_oracle() -> str:
    return f"""
    WITH RECURSIVE {_cc_ctes()},
    labels AS (
      SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
    ),
    quality AS ({QUALITY_SQL}),
    members AS (
      SELECT q.doc_id, q.quality_score, l.cluster_id
      FROM quality q LEFT JOIN labels l ON l.doc_id = q.doc_id
    ),
    ranked AS (
      SELECT cluster_id, doc_id,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY quality_score DESC, doc_id ASC) AS rn
      FROM members
      WHERE cluster_id IS NOT NULL AND quality_score >= {QUALITY_MIN}
    ),
    keepers AS (
      SELECT cluster_id, doc_id AS keeper_doc_id FROM ranked WHERE rn = 1
    )
    SELECT m.doc_id,
           ROUND(m.quality_score, 6) AS quality_score,
           CAST(m.cluster_id AS BIGINT) AS cluster_id,
           CASE
             WHEN m.quality_score < {QUALITY_MIN} THEN 'dropped_quality'
             WHEN m.cluster_id IS NOT NULL
                  AND m.doc_id <> k.keeper_doc_id THEN 'dropped_duplicate'
             ELSE 'kept'
           END AS status
    FROM members m LEFT JOIN keepers k ON m.cluster_id = k.cluster_id
    """


@register("p01_curation_pipeline", oracle=_pipeline_oracle())
def p01_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    quality = t02_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    clusters = _cc_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    members = quality.join(clusters, "doc_id", "left")
    keepers = (
        members.filter(
            F.col("cluster_id").isNotNull()
            & (F.col("quality_score") >= QUALITY_MIN)
        )
        .groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(
                    F.col("quality_score").alias("q"),
                    (-F.col("doc_id")).alias("neg_id"),
                )
            ).alias("m")
        )
        .select("cluster_id", (-F.col("m.neg_id")).alias("keeper_doc_id"))
    )
    verdict = (
        F.when(F.col("quality_score") < QUALITY_MIN, F.lit("dropped_quality"))
        .when(
            F.col("cluster_id").isNotNull()
            & (F.col("doc_id") != F.col("keeper_doc_id")),
            F.lit("dropped_duplicate"),
        )
        .otherwise(F.lit("kept"))
    )
    return (
        members.join(keepers, "cluster_id", "left")
        .select(
            "doc_id",
            dround(F.col("quality_score"), 6).alias("quality_score"),
            F.col("cluster_id").cast("long").alias("cluster_id"),
            verdict.alias("status"),
        )
    )


# --------------------------------------------------------------------------
# p02: semantic dedup — near-duplicate *embedding* pairs (d06's exact
# block-matrix int64 kernel) joined back to the documents table and
# classified: pairs whose surface text is byte-identical (md5 of
# normalized text matches) vs semantic-only near-dups whose text
# differs. The cross-modal composition a curation pipeline runs after
# lexical dedup: embedding-similar but textually-distinct pairs are
# the paraphrase/translation candidates lexical methods miss.
#
# Scale: d06's kernel cost dominates (see SCALING.md); the doc join is
# two doc_id-keyed equi-joins (skew-free), and the pair table is the
# near-dup output — orders smaller than the corpus.
# --------------------------------------------------------------------------
from .similarity import _quant_oracle, d06_embedding_neardup_blocked


def _semantic_oracle() -> str:
    return f"""
    WITH pairs AS ({_quant_oracle()})
    SELECT p.vec_a AS doc_a, p.vec_b AS doc_b, p.cosine,
           CAST(md5(lower(trim(da.text))) = md5(lower(trim(db.text)))
                AS BIGINT) AS same_text,
           CAST(LEAST(p.vec_a, p.vec_b) AS BIGINT) AS keeper_doc_id
    FROM pairs p
    JOIN documents da ON da.doc_id = p.vec_a
    JOIN documents db ON db.doc_id = p.vec_b
    """


@register("p02_semantic_dedup", oracle=_semantic_oracle())
def p02_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table

    pairs = d06_embedding_neardup_blocked(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("h")
    )
    da = docs.select(F.col("doc_id").alias("vec_a"), F.col("h").alias("h_a"))
    db = docs.select(F.col("doc_id").alias("vec_b"), F.col("h").alias("h_b"))
    return (
        pairs.join(da, "vec_a")
        .join(db, "vec_b")
        .select(
            F.col("vec_a").alias("doc_a"),
            F.col("vec_b").alias("doc_b"),
            "cosine",
            (F.col("h_a") == F.col("h_b")).cast("long").alias("same_text"),
            F.least("vec_a", "vec_b").alias("keeper_doc_id"),
        )
    )
