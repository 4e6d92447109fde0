"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the LLM-pipeline extensions) for the driver's
DuckDB-oracle correctness gate at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from seamdb_spark.operators import ORACLE_SQL, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Queries that already have a hash-green row in CORRECTNESS_r01.json.
# The driver's gate samples the FIRST 50 entries of queries(), so order
# everything still lacking a green row (or whose oracle changed) first;
# previously-green queries fill the remaining slots for regression cover.
_R1_HASH_GREEN = {
    "d01_dedup_exact", "d02_dedup_minhash_lsh", "d03_dedup_simhash",
    "d04_dedup_ngram_jaccard", "d07_dedup_jaccard_prefix_filtered",
    "d08_dedup_jaccard_blocked", "e01_hourly_rollup", "e02_sessionization",
    "e03_json_props", "x02_percentile", "x04_array_agg", "e04_asof_join",
    "e05_range_join", "q50_window_time_range", "e06_gapfill_rollup",
    "m01_binary_metadata", "m03_frame_sample",
    "q01_pricing_summary", "q02_filter_predicates", "q03_shipping_priority",
    "q04_order_priority", "q05_local_supplier_volume", "q06_forecast_revenue",
    "q07_left_join_nulls", "q08_full_outer_join", "q09_anti_join",
    "q10_semi_join", "q11_theta_band_join", "q12_having_distinct",
    "q13_stats_aggregates", "q14_rollup", "q15_cube", "q16_grouping_sets",
    "q17_window_rank", "q18_window_running", "q19_window_range_frame",
    "q20_set_operations", "q21_scalar_subquery", "q22_correlated_subquery",
    "q23_cte_max_revenue", "q24_string_functions", "q26_datetime_functions",
    "q27_date_diff_interval", "q28_case_cast", "q29_distinct",
}


def _ordered() -> list[str]:
    names = list(QUERIES)
    unchecked = [n for n in names if n not in _R1_HASH_GREEN]
    checked = [n for n in names if n in _R1_HASH_GREEN]
    return unchecked + checked


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["q01_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: QUERIES[n] for n in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    ops: engine-specific sketches, LSH-recall variants, stubbed decode)."""
    return dict(ORACLE_SQL)
