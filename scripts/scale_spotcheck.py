"""Spot-check the heaviest query families one order of magnitude above
the driver's bench SF (sf0.1 → 10×, the sf1-equivalent), backing the
100 TB design claims with a measured scale-up instead of extrapolation.

The scaled fixture is derived from sf0.1 deterministically (no RNG):
each replica k = 0..K-1 shifts ids by 10M·k and perturbs content with
a STRUCTURE-PRESERVING transformation —

- documents: every token after the first gets a ``k<k>_`` prefix for
  k > 0 (a bijective token rename): within-replica Jaccard/shingle
  relationships are IDENTICAL to the original (near-dup structure
  scales exactly K×), while cross-replica token universes are disjoint
  (no band collisions), so dedup candidate work scales ~K, not K².
- embeddings: the vector is ROTATED by k positions — an orthogonal
  transformation, so within-replica cosines are exactly preserved
  while cross-replica cosines decorrelate.

Usage: python scripts/scale_spotcheck.py [K]
Prints one JSON line per query: name, rows, seconds at the scaled SF,
plus the same query re-timed at sf0.1 in the SAME session for a
like-for-like ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from seamdb_spark.session import build_session  # noqa: E402
from seamdb_spark.sources import load_table  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
QUERIES = [
    "d02_dedup_minhash_lsh",
    "d09_dedup_clusters",
    "d17_semantic_dedup",
    "s23_kmeans_stability_audit",
    "p16_incremental_lsh_index",
    "p20_incremental_ivf_index",
    # streaming parity family (round 11, VERDICT r10 #8): each runs a
    # full availableNow Structured Streaming pipeline inside the query
    # body — the one heavy family the round-10 spot-check didn't cover.
    # events replicate with disjoint per-replica user/event id spaces
    # (state cardinality and join fan-out scale exactly Kx; within-
    # replica session/join/window structure identical; timestamps
    # unchanged so watermark behavior is like-for-like).
    "e44_lsh_stream_batch_parity",
    "e45_stream_stream_join_parity",
    "e46_stream_sessionization_parity",
    "e47_stateful_totals_parity",
    "e48_checkpoint_restart_parity",
    # rebuild/admission family (round 12, VERDICT r11 #8): the round-11
    # registrations without a 10x row — index rebuild-on-compaction for
    # the LSH and IVF families, the maintained SimHash index pair, the
    # dual-detector batch admission, and the round-12 streaming
    # admission composition (e49). p30 is omitted: it runs on the
    # 25-row nation table (absent from the scaled fixture) and its
    # scale story is the bucket-count knob, not corpus growth.
    "p25_index_compaction_rebuild",
    "p26_incremental_simhash_index",
    "p27_simhash_batch_candidates",
    "p28_ivf_compaction_rebuild",
    "p29_dual_detector_admission",
    "e49_streaming_admission_parity",
    # round 13: the out-of-order admission composition — e49's shape
    # plus the pair-log finalization sweep
    "e50_outoforder_admission",
]


def build_scaled(spark, k_factor: int) -> str:
    out = f"/tmp/seamdb_scale_x{k_factor}"
    # Completion sentinel (ADVICE r13): _DOCS_DONE is written only
    # after documents/embeddings/events ALL land — per-file exists
    # checks silently reused a partial directory left by a run killed
    # mid-write. build_scaled_tpch always runs (own sentinel), so a
    # pre-round-13 fixture that predates the TPC-H replication gets
    # backfilled instead of skipped.
    if os.path.exists(os.path.join(out, "_DOCS_DONE")):
        build_scaled_tpch(spark, k_factor, out)
        return out
    os.makedirs(out, exist_ok=True)
    docs = load_table(spark, BASE_SF, "documents")
    embs = load_table(spark, BASE_SF, "embeddings")
    evs = load_table(spark, BASE_SF, "events")
    ev_parts = []
    for k in range(k_factor):
        if k == 0:
            ev_parts.append(evs)
            continue
        ev_parts.append(
            evs.select(
                (F.col("event_id") + 10_000_000 * k).alias("event_id"),
                (F.col("user_id") + 10_000_000 * k).alias("user_id"),
                *[c for c in evs.columns if c not in ("event_id", "user_id")],
            ).select(evs.columns)
        )
    all_evs = ev_parts[0]
    for p in ev_parts[1:]:
        all_evs = all_evs.unionByName(p)
    # Write events exactly like the driver fixture: ONE pyarrow file
    # named events.parquet with TIMESTAMP(NANOS) — a Spark parquet
    # write would store INT96/LTZ micros, which the streaming readers'
    # footer sniff (nanosAsLong path) doesn't model. The bounded
    # toPandas is the replicated events table (~2M rows at 10x), well
    # inside driver memory for a spot-check script.
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = all_evs.toPandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[ns]")
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        out + "/events.parquet",
    )
    doc_parts = []
    emb_parts = []
    for k in range(k_factor):
        if k == 0:
            doc_parts.append(docs)
            emb_parts.append(embs)
            continue
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + 10_000_000 * k).alias("doc_id"),
                F.regexp_replace("text", " ", f" k{k}_").alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            ).select(docs.columns)
        )
        dim_roll = f"""
          concat(slice(embedding, {k} + 1, size(embedding) - {k}),
                 slice(embedding, 1, {k}))
        """
        emb_parts.append(
            embs.select(
                (F.col("vec_id") + 10_000_000 * k).alias("vec_id"),
                F.expr(dim_roll).alias("embedding"),
                *[c for c in embs.columns if c not in ("vec_id", "embedding")],
            ).select(embs.columns)
        )
    all_docs = doc_parts[0]
    for p in doc_parts[1:]:
        all_docs = all_docs.unionByName(p)
    all_embs = emb_parts[0]
    for p in emb_parts[1:]:
        all_embs = all_embs.unionByName(p)
    all_docs.repartition(32).write.mode("overwrite").parquet(
        out + "/documents.parquet"
    )
    all_embs.repartition(32).write.mode("overwrite").parquet(
        out + "/embeddings.parquet"
    )
    with open(os.path.join(out, "_DOCS_DONE"), "w") as f:
        f.write("ok\n")
    build_scaled_tpch(spark, k_factor, out)
    return out


# Key-column shift per replica — larger than any sf0.1 key, so replica
# key spaces are disjoint and FKs stay consistent WITHIN a replica
# (orders.o_custkey shifts exactly like customer.c_custkey, etc.).
TPCH_SHIFT = 10_000_000

# TPC-H scales exactly this way by spec: region/nation are FIXED
# dimensions at every scale factor; the fact/dim tables grow linearly.
# Replicating with shifted keys and unchanged nationkeys reproduces
# that: each nation's customer/supplier fan-out grows k_factor-fold,
# within-replica join structure is identical, dates/prices unchanged.
TPCH_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
}


def build_scaled_tpch(spark, k_factor: int, out: str) -> None:
    """Replicate the TPC-H side into the scaled fixture (round 13:
    needed to run the FULL driver window at 10×, not just the
    document/vector/event families).

    Completion sentinel (ADVICE r13): guard on _TPCH_DONE, written only
    after EVERY table lands — the old lineitem.parquet-exists guard let
    a run killed mid-lineitem-write leave a partial directory that
    later runs silently reused (and it skipped region/nation, which
    are written before the table it checked)."""
    sentinel = os.path.join(out, "_TPCH_DONE")
    if os.path.exists(sentinel):
        return
    for tbl in ("region", "nation"):
        load_table(spark, BASE_SF, tbl).write.mode("overwrite").parquet(
            out + f"/{tbl}.parquet"
        )
    for tbl, keys in TPCH_KEYS.items():
        df = load_table(spark, BASE_SF, tbl)
        parts = [df]
        for k in range(1, k_factor):
            parts.append(
                df.select(
                    *[
                        (F.col(c) + TPCH_SHIFT * k).alias(c)
                        if c in keys
                        else F.col(c)
                        for c in df.columns
                    ]
                )
            )
        allp = parts[0]
        for p in parts[1:]:
            allp = allp.unionByName(p)
        allp.repartition(32).write.mode("overwrite").parquet(
            out + f"/{tbl}.parquet"
        )
    with open(sentinel, "w") as f:
        f.write("ok\n")


def main() -> None:
    k_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    # optional argv[2]: comma-separated subset of QUERIES to run (new
    # families get their 10x rows without re-running the whole table),
    # or the literal "window" — the FIRST 50 of queries(), i.e. the
    # driver's active correctness window (round 13, VERDICT r12 #7:
    # upgrade the scale evidence from heaviest-families to the whole
    # window).
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = build_session("seamdb_scale_spotcheck")
    scaled = build_scaled(spark, k_factor)

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    run_list = QUERIES
    if only == {"window"}:
        run_list, only = list(queries)[:50], None
    elif only is not None:
        # explicit subsets may name ANY registered query, not just the
        # standing QUERIES table
        run_list, only = [n for n in queries if n in only], None
    # warm the JVM/codegen/worker pool once
    load_table(spark, scaled, "documents").count()
    load_table(spark, scaled, "embeddings").count()

    results = []
    for name in run_list:
        if only is not None and name not in only:
            continue
        fn = queries[name]
        t0 = time.time()
        n_scaled = fn(spark, scaled).count()
        t_scaled = round(time.time() - t0, 2)
        t0 = time.time()
        n_base = fn(spark, BASE_SF).count()
        t_base = round(time.time() - t0, 2)
        rec = {
            "query": name,
            "k_factor": k_factor,
            "rows_scaled": n_scaled,
            "sec_scaled": t_scaled,
            "rows_sf01": n_base,
            "sec_sf01": t_base,
            "time_ratio": round(t_scaled / max(t_base, 0.001), 2),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"spotcheck": results}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
