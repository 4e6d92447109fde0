"""Invariant tests for the round-2 pipeline operators (d11, p01,
t13–t16, e10) beyond the oracle gate: structural properties that must
hold at any scale factor, checked at SF_SMOKE."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

import __spark_entry__ as entry_mod


def _q(name):
    return entry_mod.queries()[name]


def test_canonical_keeper_invariants(spark):
    keepers = _q("d11_canonical_keeper")(spark, SF_SMOKE).collect()
    clusters = {
        r.cluster_id: r for r in _q("d09_dedup_clusters")(spark, SF_SMOKE).collect()
    }
    assert len(keepers) > 0
    for k in keepers:
        assert k.n_dropped == k.n_members - 1
        assert k.n_members >= 1
        # the keeper must belong to its own cluster
        assert k.cluster_id in clusters


def test_keeper_is_quality_argmax(spark):
    quality = {
        r.doc_id: r.quality_score
        for r in _q("t02_quality_score")(spark, SF_SMOKE).collect()
    }
    members = {}
    for r in _q("d09_dedup_clusters")(spark, SF_SMOKE).collect():
        members.setdefault(r.cluster_id, []).append(r.doc_id)
    for k in _q("d11_canonical_keeper")(spark, SF_SMOKE).collect():
        best = max(members[k.cluster_id], key=lambda d: (quality[d], -d))
        assert k.keeper_doc_id == best


def test_curation_pipeline_invariants(spark):
    rows = _q("p01_curation_pipeline")(spark, SF_SMOKE).collect()
    n_docs = _q("t02_quality_score")(spark, SF_SMOKE).count()
    assert len(rows) == n_docs  # exactly one verdict per document
    from seamdb_spark.operators.pipeline import QUALITY_MIN

    statuses = {r.status for r in rows}
    assert statuses <= {"kept", "dropped_quality", "dropped_duplicate"}
    keepers_per_cluster = {}
    for r in rows:
        if r.status == "dropped_quality":
            assert r.quality_score < QUALITY_MIN
        else:
            assert r.quality_score >= QUALITY_MIN
        if r.cluster_id is not None and r.status == "kept":
            keepers_per_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    # at most one survivor kept per near-dup cluster
    for cluster, kept in keepers_per_cluster.items():
        assert len(kept) == 1, (cluster, kept)


def test_sequence_pack_budget(spark):
    from seamdb_spark.operators.text import PACK_BUDGET

    packs = _q("t13_sequence_pack")(spark, SF_SMOKE).collect()
    assert len(packs) > 0
    for p in packs:
        assert p.overflow == (p.total_tokens > PACK_BUDGET)
        assert p.first_doc <= p.last_doc
        assert p.n_docs >= 1
    # packs within a shard partition the shard's docs contiguously
    by_shard = {}
    for p in packs:
        by_shard.setdefault(p.shard, []).append(p)
    for shard, plist in by_shard.items():
        plist.sort(key=lambda p: p.pack_id)
        for a, b in zip(plist, plist[1:]):
            assert a.last_doc < b.first_doc


def test_pii_redaction_counts(spark):
    rows = _q("t14_pii_redact")(spark, SF_SMOKE).collect()
    # every doc gets exactly one injected email and one injected phone
    for r in rows:
        assert r.n_emails == 1
        assert r.n_phones == 1
        assert r.redacted_len > 0


def test_domain_mixture_normalized(spark):
    rows = _q("t15_domain_mixture")(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.sample_weight for r in rows) - 1.0) < 1e-4
    # alpha < 1 compresses the distribution: max weight shrinks,
    # min weight grows
    shares = sorted(r.token_share for r in rows)
    weights = sorted(r.sample_weight for r in rows)
    assert weights[-1] <= shares[-1] + 1e-9
    assert weights[0] >= shares[0] - 1e-9


def test_bigram_lm_score_bounds(spark):
    rows = _q("t16_bigram_lm_score")(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 < r.min_ppm <= 1_000_000
        assert r.min_ppm <= r.mean_ppm <= 1_000_000
        assert r.n_bigrams >= 1


def test_attribution_channels(spark):
    rows = _q("e10_last_touch_attribution")(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    channels = {r.channel for r in rows}
    assert channels <= {"view", "click", "organic"}
    for r in rows:
        if r.channel == "organic":
            assert r.lag_us is None
        else:
            assert r.lag_us >= 0


def test_selection_pipeline_decision_precedence(spark):
    """p04: every document gets exactly one decision; the decision must
    agree with recomputing the precedence chain from the composed
    stages' own outputs."""
    from seamdb_spark.operators.dedup import EVAL_SET_MOD
    from seamdb_spark.operators.pipeline import P04_DUP_MAX_MILLI, QUALITY_MIN

    rows = _q("p04_selection_pipeline")(spark, SF_SMOKE).collect()
    n_docs = _q("t02_quality_score")(spark, SF_SMOKE).count()
    assert len(rows) == n_docs
    seen = set()
    for r in rows:
        assert r.doc_id not in seen
        seen.add(r.doc_id)
        if r.doc_id % EVAL_SET_MOD == 0:
            want = "eval_holdout"
        elif r.contaminated == 1:
            want = "drop_contaminated"
        elif r.quality_score < QUALITY_MIN:
            want = "drop_quality"
        elif r.dup_ratio_milli >= P04_DUP_MAX_MILLI:
            want = "drop_duplication"
        elif not r.dsir_selected:
            want = "defer_low_importance"
        else:
            want = "select"
        assert r.decision == want, (r.doc_id, r.decision, want)
    decisions = {r.decision for r in rows}
    assert "select" in decisions and "defer_low_importance" in decisions


def test_mixture_quota_hamilton_invariants(spark):
    """Largest-remainder allocation contract: quotas sum to the budget
    EXACTLY, every quota is within one token of the exact proportional
    share (the Hamilton guarantee), bonus count equals the floor-sum
    leftover, and bonuses go to the largest remainders (ties by key)."""
    rows = _q("p10_mixture_quota_allocation")(spark, SF_SMOKE).collect()
    assert len(rows) > 1
    total = sum(r.bucket_tokens for r in rows)
    budget = total * 20 // 100
    assert sum(r.quota for r in rows) == budget
    n_bonus = sum(r.got_bonus for r in rows)
    assert n_bonus == budget - sum(
        budget * r.bucket_tokens // total for r in rows
    )
    for r in rows:
        exact = budget * r.bucket_tokens / total
        assert exact - 1 < r.quota < exact + 1
        assert r.share_ppm == 1_000_000 * r.bucket_tokens // total
    # the bonus set is exactly the top-n_bonus by (remainder, key) order
    ordered = sorted(
        rows,
        key=lambda r: (-(budget * r.bucket_tokens % total), r.lang, r.source),
    )
    assert {(r.lang, r.source) for r in ordered[:n_bonus]} == {
        (r.lang, r.source) for r in rows if r.got_bonus
    }


def test_quota_sampler_take_until_contract(spark):
    """p11's selection contract per bucket: selected docs are a PREFIX
    of the deterministic hash order, their token sum reaches the quota
    with overshoot strictly smaller than the boundary doc, and
    deselecting the boundary doc would land short of quota."""
    rows = _q("p11_quota_sampler")(spark, SF_SMOKE).collect()
    quotas = {
        (r.lang, r.source): r.quota
        for r in _q("p10_mixture_quota_allocation")(spark, SF_SMOKE).collect()
    }
    buckets = {}
    for r in rows:
        buckets.setdefault((r.lang, r.source), []).append(r)
    assert set(buckets) == set(quotas)
    for key, docs in buckets.items():
        docs.sort(key=lambda r: r.running_tokens)
        q = quotas[key]
        assert q == docs[0].quota
        sel = [r for r in docs if r.selected]
        # prefix property: every selected doc precedes every unselected
        if sel:
            max_sel = max(r.running_tokens for r in sel)
            assert all(
                r.running_tokens > max_sel for r in docs if not r.selected
            )
            got = sum(r.n_tokens for r in sel)
            boundary = sel[-1]
            assert got - q < boundary.n_tokens  # overshoot < one doc
            assert got >= min(q, 1)
            if got > q:
                assert got - boundary.n_tokens < q  # boundary was needed
        else:
            assert q == 0


def test_grouped_running_sum_matches_single_task_window(spark):
    """ranks.grouped_running_sum must equal the naive
    Window.partitionBy(group) prefix sum on randomized inputs — same
    values, computed without ever giving one task a whole group."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from seamdb_spark.operators.ranks import grouped_running_sum

    rng = random.Random(7)
    rows = [
        (f"g{rng.randrange(5)}", i, rng.randrange(-50, 200))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, i long, v long")
    got = {
        (r.g, r.i): r.run
        for r in grouped_running_sum(
            df, ["g"], [F.col("i")], "v", "run", num_partitions=8
        ).collect()
    }
    w = (
        W.partitionBy("g")
        .orderBy("i")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    want = {
        (r.g, r.i): r.run
        for r in df.select(
            "g", "i", F.sum("v").over(w).alias("run")
        ).collect()
    }
    assert got == want
