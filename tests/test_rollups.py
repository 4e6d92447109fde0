"""Incremental rollup maintenance: after every refresh, the stored
state must equal a full recompute over the source snapshot, refreshes
must scan only the newly appended segments, and history rewrites
(compaction) must trigger a sound full rebuild."""

from seamdb_spark.rollups import ContinuousRollup


def _setup(engine):
    engine.sql(
        "CREATE TABLE metrics (id serial PRIMARY KEY, bucket bigint, value double precision)"
    )
    return ContinuousRollup(
        engine,
        "metrics_by_bucket",
        "metrics",
        keys=[("bucket", "bucket")],
        sum_cols=["value"],
    )


def _full_recompute(engine):
    df = engine.table("metrics")
    rows = {}
    for r in df.collect():
        n, s = rows.get(r.bucket, (0, 0.0))
        rows[r.bucket] = (n + 1, s + r.value)
    return rows


def _state(rollup):
    return {
        r.bucket: (r.n_rows, round(r.sum_value, 9), round(r.avg_value, 9))
        for r in rollup.read().collect()
    }


def test_incremental_refresh_equals_full_recompute(engine):
    rollup = _setup(engine)

    engine.sql("INSERT INTO metrics (bucket, value) VALUES (1, 10.0), (1, 20.0), (2, 5.0)")
    out = rollup.refresh()
    assert out["mode"] == "incremental" and out["files_read"] >= 1
    expect = _full_recompute(engine)
    got = _state(rollup)
    assert set(got) == set(expect)
    for b, (n, s) in expect.items():
        assert got[b][0] == n and abs(got[b][1] - s) < 1e-9
        assert abs(got[b][2] - s / n) < 1e-9

    # Second batch: refresh must scan ONLY the new segment's files.
    snaps_before = set(rollup._source_snaps().current_files())
    engine.sql("INSERT INTO metrics (bucket, value) VALUES (2, 7.0), (3, 1.5)")
    snaps_after = set(rollup._source_snaps().current_files())
    out = rollup.refresh()
    assert out["mode"] == "incremental"
    assert out["files_read"] == len(snaps_after - snaps_before)
    expect = _full_recompute(engine)
    got = _state(rollup)
    assert set(got) == set(expect)
    for b, (n, s) in expect.items():
        assert got[b][0] == n and abs(got[b][1] - s) < 1e-9


def test_noop_refresh_reads_nothing(engine):
    rollup = _setup(engine)
    engine.sql("INSERT INTO metrics (bucket, value) VALUES (1, 1.0)")
    assert rollup.refresh()["mode"] == "incremental"
    again = rollup.refresh()
    assert again == {"mode": "noop", "files_read": 0}


def test_compaction_triggers_rebuild_and_stays_correct(engine):
    rollup = _setup(engine)
    engine.sql("INSERT INTO metrics (bucket, value) VALUES (1, 2.0), (2, 4.0)")
    engine.sql("INSERT INTO metrics (bucket, value) VALUES (1, 8.0)")
    rollup.refresh()
    engine.compact("metrics")  # rewrites history: processed files vanish
    engine.sql("INSERT INTO metrics (bucket, value) VALUES (3, 9.0)")
    out = rollup.refresh()
    assert out["mode"] == "rebuild"
    expect = _full_recompute(engine)
    got = _state(rollup)
    assert set(got) == set(expect)
    for b, (n, s) in expect.items():
        assert got[b][0] == n and abs(got[b][1] - s) < 1e-9
