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


# Frozen round-2 window: exactly the 50 queries lacking a driver-green
# row, pinned so that registering NEW queries cannot displace any of
# them out of the driver's first-50 check. New queries land after these
# and get their rows in round 3 (when this window's greens free slots).
#
# ROUND-3 PROCEDURE: after CORRECTNESS_r02 lands, fold its green keys
# into _R1_HASH_GREEN (rename mentally to "driver-green any round") and
# replace _R2_WINDOW with the 25 queries still lacking a row — at the
# time of writing: t13–t20, d11, d12, e10–e13, x06, m05, p01, p02,
# s06, s07, q51–q55 (they already sit at positions 51–75 via
# _ordered()'s rest_unchecked rule, all locally hash-green at sf0.01).
_R2_WINDOW = [
    "d09_dedup_clusters", "d10_decontaminate", "x01_approx_distinct",
    "x03_percentile_approx", "e07_funnel_steps", "e08_retention_cohorts",
    "e09_conversion_lag", "m02_media_features", "m04_image_resize",
    "q25_math_functions", "q30_topk_per_group", "q31_pivot",
    "q32_sort_limit_offset", "q33_in_subquery", "q34_union_all_agg",
    "q35_market_share", "q36_returned_items", "q37_unpivot",
    "q38_filtered_agg", "q39_null_functions", "q40_exists_inequality",
    "q41_recursive_cte", "q42_right_join", "q43_cross_join",
    "q44_window_distribution", "q45_pattern_matching",
    "q46_below_avg_quantity", "q47_supplier_share", "q48_multiset_ops",
    "q49_lateral_join", "x05_histogram", "s01_ann_bruteforce_topk",
    "d05_embedding_neardup", "s02_ann_lsh_topk", "s03_ann_ivf_topk",
    "d06_embedding_neardup_blocked", "s04_ann_quantized_topk",
    "s05_ann_range_search", "t01_token_count", "t02_quality_score",
    "t03_lang_id", "t04_fingerprint", "t05_wordcount",
    "t06_tfidf_top_terms", "t07_heavy_hitters_salted", "t08_train_split",
    "t09_stratified_sample", "t10_deterministic_shuffle",
    "t11_repetition_signals", "t12_lm_quality_score",
]


def _ordered() -> list[str]:
    names = list(QUERIES)
    pinned = [n for n in _R2_WINDOW if n in names]
    rest_unchecked = [
        n for n in names if n not in _R1_HASH_GREEN and n not in _R2_WINDOW
    ]
    checked = [n for n in names if n in _R1_HASH_GREEN]
    return pinned + rest_unchecked + checked


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
