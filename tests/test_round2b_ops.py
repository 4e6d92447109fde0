"""Invariant tests for the late-round-2 operators (q51, q52, e11, t17,
t18, d12, s06) beyond the oracle gate: structural properties that must
hold at any scale factor, checked at SF_SMOKE."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

import __spark_entry__ as entry_mod


def _q(name):
    return entry_mod.queries()[name]


def test_suppliers_kept_waiting_sole_late(spark):
    # Every reported supplier must have >= 1 late item; the numwait sum
    # can't exceed the total number of late lineitems in the corpus.
    rows = _q("q51_suppliers_kept_waiting")(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(r.numwait >= 1 for r in rows)
    from seamdb_spark.sources import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    late_total = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .count()
    )
    assert sum(r.numwait for r in rows) <= late_total


def test_event_transitions_probabilities_sum_to_one(spark):
    rows = _q("e11_event_transitions")(spark, SF_SMOKE).collect()
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r.prev_type, []).append(r)
    for prev, group in by_prev.items():
        assert abs(sum(g.p for g in group) - 1.0) < 1e-3, prev
        assert all(g.n >= 1 for g in group)


def test_chunking_covers_every_token(spark):
    from seamdb_spark.operators.text import CHUNK_STRIDE, CHUNK_TOKENS

    chunks = _q("t17_doc_chunking")(spark, SF_SMOKE)
    docs = (
        chunks.groupBy("doc_id")
        .agg(
            F.max("chunk_id").alias("last_chunk"),
            F.sum("chunk_tokens").alias("sum_tokens"),
            F.max(F.col("chunk_id") * CHUNK_STRIDE + F.col("chunk_tokens")).alias(
                "max_end"
            ),
        )
        .collect()
    )
    from seamdb_spark.sources import load_table

    n_tokens = {
        r.doc_id: r.n
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    for d in docs:
        n = n_tokens[d.doc_id]
        # chunks must reach the final token and overlap by chunk-stride
        assert d.max_end == n
        expected_chunks = 1 + max(0, -(-(n - CHUNK_TOKENS) // CHUNK_STRIDE)) if n > CHUNK_TOKENS else 1
        assert d.last_chunk == expected_chunks - 1


def test_novelty_first_doc_is_fully_novel(spark):
    rows = {r.doc_id: r for r in _q("t18_ngram_novelty")(spark, SF_SMOKE).collect()}
    first = rows[min(rows)]
    assert first.novelty == 1.0  # the earliest document can't repeat anything
    assert all(0.0 <= r.novelty <= 1.0 for r in rows.values())
    assert all(r.n_novel <= r.n_shingles for r in rows.values())


def test_duplicated_spans_symmetric(spark):
    # A span flagged duplicated appears in >= 2 docs, so the flagged
    # document count is >= 2 whenever any document is flagged.
    rows = _q("d12_duplicated_spans")(spark, SF_SMOKE).collect()
    if rows:
        assert len(rows) >= 2
        assert all(0 < r.n_dup_spans <= r.n_spans for r in rows)
        assert all(0.0 < r.dup_fraction <= 1.0 for r in rows)


def test_filtered_ann_respects_predicate(spark):
    from seamdb_spark.sources import load_table

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    rows = _q("s06_ann_filtered_topk")(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.neighbor_label != labels[r.probe_id]
        assert r.neighbor_id != r.probe_id
        assert r.rk <= 5


def test_filtered_ann_subset_of_unfiltered_corpus(spark):
    # With the label filter, per-probe results never contain a
    # same-label vector that brute-force top-k would admit.
    s01 = _q("s01_ann_bruteforce_topk")(spark, SF_SMOKE).collect()
    s06 = _q("s06_ann_filtered_topk")(spark, SF_SMOKE).collect()
    # same probe set, k rows per probe on both sides
    assert {r.probe_id for r in s01} == {r.probe_id for r in s06}


def test_rerank_recall_at_least_quantized(spark):
    # Re-ranking a 20-candidate quantized pool with exact floats can only
    # improve on the pure-quantized top-k: recall vs the float baseline
    # must be >= s04's, and every returned pair must rank by exact cosine.
    def pairs(name):
        return {
            (r.probe_id, r.neighbor_id)
            for r in _q(name)(spark, SF_SMOKE).collect()
        }

    exact = pairs("s01_ann_bruteforce_topk")
    quant = pairs("s04_ann_quantized_topk")
    rerank = pairs("s07_ann_rerank_topk")
    r_q = len(exact & quant) / len(exact)
    r_r = len(exact & rerank) / len(exact)
    assert r_r >= r_q, f"rerank recall {r_r:.2f} < quantized {r_q:.2f}"
    assert r_r >= 0.8
