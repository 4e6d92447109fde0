"""Registry mapping query names → (Spark builder, optional DuckDB oracle).

Every operator claimed done in SURVEY.md §2 registers here; the driver
contract (``__spark_entry__``) simply re-exports these dicts. A query
without an oracle gets the driver's weaker rows-only check — reserve that
for genuinely non-SQL-expressible ops (approximate sketches, streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}

# Candidate-stage builders for blocking operators: each returns the
# DataFrame of candidate pairs ENUMERATED by the blocking join, BEFORE
# the verify filter. The candidate-volume gate in tests counts these
# rows on the smoke fixture and pins a k·N budget — the Exchange-count
# gate cannot see an enumeration blow-up (a quadratic candidate set
# hides inside one codegen join stage); this registry makes it visible.
CANDIDATE_STAGES: dict[str, QueryFn] = {}


def register_candidates(name: str) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in CANDIDATE_STAGES:
            raise ValueError(f"duplicate candidate stage: {name}")
        CANDIDATE_STAGES[name] = fn
        return fn

    return deco


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco
