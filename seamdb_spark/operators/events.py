"""Batch analytics over the ``events`` table (timestamps, JSON props).

Superset of the reference: seamdb has no timestamp storage type and no
streaming surface (SURVEY.md §2.B date/time + streaming rows); our
events fixture exercises real TimestampType columns, JSON extraction,
tumbling windows and sessionization. The streaming (readStream)
counterparts live in ``seamdb_spark.streaming``; these batch queries
define the semantics the streaming versions must agree with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register
from .rounding import dround

SESSION_GAP_MINUTES = 30


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --------------------------------------------------------------------------
# Tumbling-window aggregation (batch semantics of the streaming query)
# --------------------------------------------------------------------------
@register(
    "e01_hourly_rollup",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT)             AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(SUM(value), 2)                 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def e01_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F.window() aligns to the epoch, so 1-hour tumbling windows start on
    # the hour — identical to date_trunc('hour') in the oracle.
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dround(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# Sessionization: gap-based sessions via lag + cumulative sum
# --------------------------------------------------------------------------
@register(
    "e02_sessionization",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MINUTES} MINUTE
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, event_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM ordered
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT)            AS n_events,
           MIN(ts)                             AS session_start,
           MAX(ts)                             AS session_end,
           CAST(DATE_DIFF('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_s,
           ROUND(SUM(value), 2)                AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def e02_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: two windows over the same (user_id, ts) partitioning — one
    # shuffle total; Catalyst reuses the sort for both window operators.
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = SESSION_GAP_MINUTES * 60
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                > gap_s
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("long")
        .alias("duration_s"),
        dround(F.sum("value"), 2).alias("session_value"),
    )


# --------------------------------------------------------------------------
# JSON property extraction
# --------------------------------------------------------------------------
@register(
    "e03_json_props",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)  AS n,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    GROUP BY event_type
    """,
)
def e03_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            dround(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


# --------------------------------------------------------------------------
# Approximate aggregates (engine-specific sketches → no SQL oracle;
# accuracy asserted against exact values in tests)
# --------------------------------------------------------------------------
@register("x01_approx_distinct")
def x01_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@register(
    "x02_percentile",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4)  AS p50,
           ROUND(quantile_cont(value, 0.95), 4) AS p95
    FROM events
    GROUP BY event_type
    """,
)
def x02_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact interpolated percentile — matches DuckDB quantile_cont.
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        dround(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        dround(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
    )


@register("x03_percentile_approx")
def x03_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
        dround(F.expr("percentile(value, 0.5)"), 4).alias("exact_p50"),
    )


# --------------------------------------------------------------------------
# Ordered array_agg rendered as string (collect_list coverage,
# cross-engine-comparable representation)
# --------------------------------------------------------------------------
@register(
    "x04_array_agg",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_seen,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) >= 20
    """,
)
def x04_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias(
                "types_seen"
            ),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") >= 20)
    )
