"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

Beyond-reference extension (BASELINE.json north star):
- ``s01_ann_bruteforce_topk`` — exact top-k cosine neighbors for a probe
  set; the correctness baseline. Dot products run through
  ``F.zip_with`` + ``F.aggregate`` (JVM codegen, no Python).
- ``s02_ann_lsh_topk`` — random-hyperplane LSH variant: 16-bit signs
  signature, blocked on two 8-bit halves, exact re-rank of candidates.
  The scale path: candidate generation is an equi-join on signature
  blocks instead of an all-pairs cross join. (No SQL oracle — recall
  < 1 by design; pytest checks recall against s01.)
- ``d05_embedding_neardup`` — cosine near-duplicate pairs above a
  threshold (brute-force verified; the oracle mirrors it exactly).

Determinism: both engines fold the dot product left-to-right in double
precision (Spark ``aggregate``; DuckDB ``list_reduce``), then round to
6 decimals before any threshold/ordering decision.

Scale notes (100 TB): probes broadcast; the data side stays
partitioned. For a billion-vector corpus swap the brute-force stage for
IVF (cluster-id blocking) — the LSH variant demonstrates the identical
plan shape (block key equi-join + exact re-rank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register
from .rounding import dround

N_PROBES = 10
TOP_K = 5
NEARDUP_COSINE = 0.35
LSH_PLANES = 16


def _dot(a: str | Column, b: str | Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


_DOT_SQL = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (x, y) -> x + y)"
)
_NORM_SQL = (
    "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_transform({a}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), (x, y) -> x + y))"
)


def _cos_sql(a: str, b: str) -> str:
    return (
        f"({_DOT_SQL.format(a=a, b=b)} / "
        f"({_NORM_SQL.format(a=a)} * {_NORM_SQL.format(a=b)}))"
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --------------------------------------------------------------------------
# Brute-force exact top-k cosine (the ANN correctness baseline)
# --------------------------------------------------------------------------
@register(
    "s01_ann_bruteforce_topk",
    oracle=f"""
    WITH probes AS (SELECT vec_id AS probe_id, embedding AS pe
                    FROM embeddings WHERE vec_id < {N_PROBES}),
    scored AS (
      SELECT probe_id, e.vec_id AS neighbor_id,
             ROUND({_cos_sql('pe', 'e.embedding')}, 6) AS cosine
      FROM probes JOIN embeddings e ON e.vec_id <> probe_id
    ),
    ranked AS (
      SELECT probe_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY probe_id
                                ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT probe_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= {TOP_K}
    """,
)
def s01_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    scored = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            dround(
                _dot("pe", "embedding") / (_norm("pe") * _norm("embedding")), 6
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("probe_id", "neighbor_id", "cosine", "rk")
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs
# --------------------------------------------------------------------------
@register(
    "d05_embedding_neardup",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_cos_sql('a.embedding', 'b.embedding')} >= {NEARDUP_COSINE}
    """,
)
def d05_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: brute-force O(n^2) is the *verifier*; at corpus scale the
    # candidate set comes from LSH/IVF blocking (see s02) — this query is
    # the exact semantics both paths must agree with.
    emb = _emb(spark, sf_dir)
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cos = _dot("ea", "eb") / (_norm("ea") * _norm("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= NEARDUP_COSINE)
        .select("vec_a", "vec_b", dround("cos_raw", 6).alias("cosine"))
    )


# --------------------------------------------------------------------------
# LSH-bucketed ANN (scale path; recall measured in tests, no SQL oracle)
# --------------------------------------------------------------------------
def _hyperplanes(spark: SparkSession, dims: int) -> DataFrame:
    """Deterministic pseudo-random hyperplanes derived from md5 — no RNG,
    reproducible across runs and engines."""
    rows = []
    import hashlib

    for p in range(LSH_PLANES):
        weights = []
        for d in range(dims):
            h = int(hashlib.md5(f"plane{p}_dim{d}".encode()).hexdigest()[:8], 16)
            weights.append((h % 2001 - 1000) / 1000.0)
        rows.append((p, weights))
    return spark.createDataFrame(rows, "plane int, w array<double>")


def _signatures(emb: DataFrame, planes: DataFrame) -> DataFrame:
    """16-bit sign signature per vector, as two 8-bit block keys."""
    sig_bits = (
        emb.crossJoin(F.broadcast(planes))
        .select(
            "vec_id",
            "plane",
            F.when(_dot("embedding", "w") > 0, F.lit(1)).otherwise(F.lit(0)).alias("bit"),
        )
        .groupBy("vec_id")
        .agg(
            F.sum(F.expr("shiftleft(CAST(bit AS BIGINT), plane)")).alias("sig")
        )
    )
    return sig_bits.select(
        "vec_id",
        F.expr("(sig & 255)").alias("block0"),
        F.expr("(shiftright(sig, 8) & 255)").alias("block1"),
    )


@register("s02_ann_lsh_topk")
def s02_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    dims = 64
    planes = _hyperplanes(spark, dims)
    sigs = _signatures(emb, planes)
    data = emb.join(sigs, "vec_id")
    probes = data.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pe"),
        F.col("block0").alias("pb0"),
        F.col("block1").alias("pb1"),
    )
    # Candidates share at least one signature block with the probe
    # (equi-join on block key — the scale path; no cross join).
    c0 = data.join(F.broadcast(probes), F.col("block0") == F.col("pb0"))
    c1 = data.join(F.broadcast(probes), F.col("block1") == F.col("pb1"))
    cand = (
        c0.select("probe_id", "pe", "vec_id", "embedding")
        .unionAll(c1.select("probe_id", "pe", "vec_id", "embedding"))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .dropDuplicates(["probe_id", "vec_id"])
    )
    scored = cand.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        dround(_dot("pe", "embedding") / (_norm("pe") * _norm("embedding")), 6).alias(
            "cosine"
        ),
    )
    w = W.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("probe_id", "neighbor_id", "cosine", "rk")
    )
