"""Unit tests for the bench trajectory gate (bench.check_regressions):
the max(2x, +2s) bound, new-query and allowlist exemptions, and the
SF-mismatch guard that keeps a local sf0.01 iteration from gating (or
poisoning) the sf0.1 trajectory."""

import sys

sys.path.insert(0, "/root/repo")

from bench import check_regressions


def test_bound_is_max_of_double_and_plus_two():
    baseline = {"sf": 0.1, "queries": {"fast": 0.5, "slow": 10.0}}
    # fast: bound = max(1.0, 2.5) = 2.5 — +2s dominates small queries
    assert check_regressions({"fast": 2.4}, baseline, 0.1) == []
    out = check_regressions({"fast": 2.6}, baseline, 0.1)
    assert [r["query"] for r in out] == ["fast"] and out[0]["bound"] == 2.5
    # slow: bound = max(20.0, 12.0) = 20.0 — 2x dominates heavy queries
    assert check_regressions({"slow": 19.9}, baseline, 0.1) == []
    assert check_regressions({"slow": 20.1}, baseline, 0.1)[0]["bound"] == 20.0


def test_new_queries_and_allowlist_are_exempt():
    baseline = {"sf": 0.1, "queries": {"old": 1.0}}
    # a query with no baseline entry never gates
    assert check_regressions({"brand_new": 99.0}, baseline, 0.1) == []
    # an allowlisted deliberate plan change never gates
    assert (
        check_regressions(
            {"old": 99.0}, baseline, 0.1, allow={"old": "reworked plan"}
        )
        == []
    )
    # without the allowlist entry the same time fails
    assert check_regressions({"old": 99.0}, baseline, 0.1)


def test_baseline_at_other_sf_gates_nothing():
    baseline = {"sf": 0.1, "queries": {"q": 1.0}}
    assert check_regressions({"q": 99.0}, baseline, 0.01) == []
    assert check_regressions({"q": 99.0}, {}, 0.1) == []


def test_improvements_never_flag():
    baseline = {"sf": 0.1, "queries": {"q": 84.5}}
    # the t49 case: a 60x improvement passes, and the next clean run
    # advances the baseline down so the bound tightens with it
    assert check_regressions({"q": 1.4}, baseline, 0.1) == []
