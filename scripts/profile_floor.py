"""Decompose the per-query fixed floor of the bench tail (round 15).

For a sample of tail queries, split the bench's measured wall
(fn(spark, sf_dir).count()) into:
  build_s  — Python-side DataFrame construction (py4j + any eager
             driver work the query does while building),
  count1_s — first .count() on the built frame (Catalyst analysis +
             optimization + job scheduling + execution),
  count2_s — second .count() on the SAME frame object (execution with
             the analysis cache warm: isolates re-analysis cost).

Usage: python scripts/profile_floor.py [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as usual.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seamdb_spark.session import build_session  # noqa: E402


DEFAULT_SAMPLE = [
    # q relational tail
    "q05_local_supplier_volume", "q17_window_rank", "q30_topk_per_group",
    "q45_pattern_matching", "q60_column_profile",
    # t text tail
    "t05_wordcount", "t20_rule_filter", "t30_perplexity_buckets",
    # m multimodal tail
    "m05_binary_windows", "m15_jpeg_roundtrip",
    "m31_progressive_jpeg_consistency",
    # x sketches / e events / g graph
    "x05_histogram", "e10_last_touch_attribution", "e21_sax_motifs",
    "g02_triangle_count",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    names = sys.argv[1:] or [n for n in DEFAULT_SAMPLE if n in queries]
    if sys.argv[1:]:
        missing = [n for n in names if n not in queries]
        if missing:
            raise SystemExit(f"unknown queries: {missing}")

    spark = build_session("profile_floor")
    # Bench-equivalent warm-up
    from seamdb_spark.sources import load_table

    queries["q01_pricing_summary"](spark, sf_dir).count()
    for t in ("documents", "embeddings", "events"):
        load_table(spark, sf_dir, t).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    rows = []
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"floor:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        df.count()
        t2 = time.time()
        df.count()
        t3 = time.time()
        # fresh build + count to approximate the bench's total on a warm
        # session (min against t1-t0+t2-t1 separately is unfair; keep raw)
        rows.append(
            {
                "query": name,
                "build_s": round(t1 - t0, 3),
                "count1_s": round(t2 - t1, 3),
                "count2_s": round(t3 - t2, 3),
                "total_s": round(t2 - t0, 3),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    spark.sparkContext.setJobDescription(None)

    tot = {
        k: round(sum(r[k] for r in rows), 3)
        for k in ("build_s", "count1_s", "count2_s", "total_s")
    }
    print(json.dumps({"n": len(rows), **tot}))
    spark.stop()


if __name__ == "__main__":
    main()
