"""Incremental MinHash-LSH index maintenance over engine tables — the
operational form of d02 for a growing corpus: instead of re-banding
100 TB per dedup run, ``refresh()`` diffs the source table's snapshot
manifest against the segments already indexed (the ContinuousRollup
pattern, rollups.py) and bands ONLY the newly appended files, appending
their band rows to a persisted index snapshot. Work per refresh is
O(new documents); near-dup candidate pairs come from an equi-join on
the maintained index.

Correctness stance: the index after any refresh equals full re-banding
of the current snapshot (band rows are per-document and the banding is
deterministic, so append order cannot change the set — tested in
tests/test_dedup_index.py). If indexed segments DISAPPEAR from the
source manifest (compaction / overwrite rewrote history), refresh
detects it and rebuilds from the current snapshot — incrementality is
an optimization, never a correctness assumption.

Scale notes (100 TB): per-refresh banding scans new segments only; the
index table holds N_BANDS rows per document (tiny vs the corpus) and is
the ONLY thing the candidate join touches — the original text never
participates after indexing. `new_candidate_pairs` joins the new batch
(small) against the full index on (band_id, band_key): broadcast-sized
while the batch is, shuffle-on-band-key beyond.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.hashing import (
    MINHASH_PARAMS,
    N_BANDS,
    ROWS_PER_BAND,
    md5_prefix_long,
    minhash_value,
)
from .snapshots import TableSnapshots


def band_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, band_id, band_key) LSH band rows for each document —
    the same deterministic banding as d02 (hashing.py constants), on an
    arbitrary (id, text) DataFrame."""
    # Docs with <3 tokens produce no 3-shingles (matches d02's
    # _SHINGLES_SQL `WHERE len >= 3`), and the expression must be TOTAL
    # — safe on short docs regardless of filter placement: a bare
    # sequence(0, size - 3) auto-descends for size < 3 (ANSI-mode index
    # error, or silent 1/2-gram pseudo-shingles with ANSI off), and
    # Catalyst merges/reorders filters (InferFiltersFromGenerate +
    # CombineFilters evaluate the downstream generate guard before a
    # preceding size filter), so index positions are clamped inside the
    # expression: sequence(0, size-1) is always ascending, and the
    # i <= size-3 filter empties it for short docs.
    sh = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("toks"),
        )
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    "transform("
                    " filter(sequence(0, size(toks) - 1),"
                    "        i -> i <= size(toks) - 3),"
                    " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
                )
            ).alias("shingles"),
        )
        .filter(F.size("shingles") > 0)
    )
    hashed = sh.select("doc_id", F.explode("shingles").alias("s")).select(
        "doc_id", md5_prefix_long(F.col("s")).alias("h")
    )
    sigs = hashed.groupBy("doc_id").agg(
        *[
            F.min(minhash_value(F.col("h"), a, b)).alias(f"mh{j}")
            for j, (a, b) in enumerate(MINHASH_PARAMS)
        ]
    )
    band_structs = []
    for band in range(N_BANDS):
        lo = band * ROWS_PER_BAND
        key = F.concat_ws(
            "-",
            *[F.col(f"mh{j}").cast("string") for j in range(lo, lo + ROWS_PER_BAND)],
        )
        band_structs.append(
            F.struct(F.lit(band).alias("band_id"), key.alias("band_key"))
        )
    return sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("b")
    ).select("doc_id", F.col("b.band_id").alias("band_id"), F.col("b.band_key").alias("band_key"))


class IncrementalLSHIndex:
    """Persisted, incrementally-maintained LSH band index of an Engine
    table's text column."""

    def __init__(self, engine, name: str, source: str,
                 id_col: str, text_col: str) -> None:
        self.engine = engine
        self.name = name
        self.source = source
        self.id_col = id_col
        self.text_col = text_col
        base = os.path.join(
            engine.store.warehouse_dir, "_dedup_index", engine.database, name
        )
        self.state = TableSnapshots(os.path.join(base, "state"))

    # --------------------------------------------------------- helpers
    def _source_snaps(self) -> TableSnapshots:
        store = self.engine.store
        return TableSnapshots(store.table_dir(self.engine.database, self.source))

    def _source_schema(self):
        return self.engine.store.get_table(
            self.engine.database, self.source
        ).spark_schema()

    def _processed(self) -> list[str] | None:
        extra = self.state.current_extra()
        if "processed" in extra:
            return extra["processed"]
        return None if self.state.current_version() > 0 else []

    def _state_schema(self):
        spark = self.engine.spark
        return band_rows(
            spark.createDataFrame([], self._source_schema()),
            self.id_col, self.text_col,
        ).schema

    def _bands_of(self, files: list[str]) -> DataFrame:
        spark = self.engine.spark
        df = (
            spark.read.schema(self._source_schema()).parquet(*files)
            if files
            else spark.createDataFrame([], self._source_schema())
        )
        return band_rows(df, self.id_col, self.text_col)

    # ------------------------------------------------------------- api
    def refresh(self) -> dict:
        """Index newly appended source segments.

        Returns {"mode": "incremental"|"rebuild"|"noop",
                 "files_read": <segments banded this refresh>,
                 "n_new_docs": <documents indexed this refresh>}.
        """
        snaps = self._source_snaps()
        current = snaps.current_files()
        processed_list = self._processed()
        processed = set(processed_list or [])
        unsound = processed_list is None
        vanished = processed - set(current)
        new_files = [f for f in current if f not in processed]

        if vanished or unsound:
            full = self._bands_of(current)
            self.state.commit(
                full, mode="overwrite", extra={"processed": current}
            )
            n = full.select("doc_id").distinct().count()
            return {"mode": "rebuild", "files_read": len(current), "n_new_docs": n}

        if not new_files:
            return {"mode": "noop", "files_read": 0, "n_new_docs": 0}

        fresh = self._bands_of(new_files)
        self.state.commit(fresh, mode="append", extra={"processed": current})
        n = fresh.select("doc_id").distinct().count()
        return {"mode": "incremental", "files_read": len(new_files), "n_new_docs": n}

    def index(self) -> DataFrame:
        """The current band index (doc_id, band_id, band_key)."""
        return self.state.read(self.engine.spark, self._state_schema())

    def candidate_pairs(self) -> DataFrame:
        """All near-dup candidate pairs (doc_a < doc_b) from the index."""
        bands = self.index()
        b1 = bands.alias("b1")
        b2 = bands.alias("b2")
        return (
            b1.join(
                b2,
                (F.col("b1.band_id") == F.col("b2.band_id"))
                & (F.col("b1.band_key") == F.col("b2.band_key"))
                & (F.col("b1.doc_id") < F.col("b2.doc_id")),
            )
            .select(
                F.col("b1.doc_id").alias("doc_a"),
                F.col("b2.doc_id").alias("doc_b"),
            )
            .distinct()
        )

    def new_candidate_pairs(self, new_doc_ids: DataFrame) -> DataFrame:
        """Candidate pairs INVOLVING the given new documents — the
        per-batch dedup check a growing corpus actually runs: the new
        batch's band rows (small) join the full index, so existing
        documents are never re-banded and never pair among themselves."""
        bands = self.index()
        new_bands = bands.join(
            F.broadcast(new_doc_ids.select(F.col(self.id_col).alias("doc_id"))),
            "doc_id",
        )
        nb = new_bands.alias("nb")
        ib = bands.alias("ib")
        return (
            nb.join(
                ib,
                (F.col("nb.band_id") == F.col("ib.band_id"))
                & (F.col("nb.band_key") == F.col("ib.band_key"))
                & (F.col("nb.doc_id") != F.col("ib.doc_id")),
            )
            .select(
                F.least("nb.doc_id", "ib.doc_id").alias("doc_a"),
                F.greatest("nb.doc_id", "ib.doc_id").alias("doc_b"),
            )
            .distinct()
        )
