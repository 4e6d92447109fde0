"""Session-scoped materialized intermediates (materialized-view analogue).

Several operators share expensive deterministic sub-pipelines (the
simhash near-dup graph feeds d03/d09/d13/d14/g01; the quantized
embedding corpus and its Lloyd centroids feed s03/d06/d17/s09).
Recomputing them per query is what a database without materialized
views would do; this memo is the engine-side equivalent: compute once
per (session, sf_dir), localCheckpoint the result (always pairs/labels
/centroid-sized, never corpus-sized), and let every dependent operator
start from it. The pipelines are deterministic, so reuse cannot change
any result — the DuckDB parity oracles are unaffected.

Entries are keyed by applicationId and pruned when the session
changes, so a dead session's cached blocks are never referenced. On a
cluster the same role is played by a writeback table (``checkpoint()``
or CREATE MATERIALIZED VIEW); see SCALING.md.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MATERIALIZED: dict[tuple[str, str, str], object] = {}


def _prune(app_id: str) -> None:
    for stale in [k for k in _MATERIALIZED if k[0] != app_id]:
        del _MATERIALIZED[stale]


def materialized_df(
    spark: SparkSession, sf_dir: str, key: str, builder: Callable[[], DataFrame]
) -> DataFrame:
    """Build-once DataFrame, localCheckpointed (blocks live with the session)."""
    app_id = spark.sparkContext.applicationId
    mkey = (app_id, sf_dir, key)
    df = _MATERIALIZED.get(mkey)
    if df is None:
        _prune(app_id)
        df = builder().localCheckpoint()
        _MATERIALIZED[mkey] = df
    return df


def materialized_value(
    spark: SparkSession, sf_dir: str, key: str, builder: Callable[[], object]
) -> object:
    """Build-once driver-side value (e.g. a centroid table — always O(1))."""
    app_id = spark.sparkContext.applicationId
    mkey = (app_id, sf_dir, key)
    val = _MATERIALIZED.get(mkey)
    if val is None:
        _prune(app_id)
        val = builder()
        _MATERIALIZED[mkey] = val
    return val
