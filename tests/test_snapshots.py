"""Snapshot isolation + atomic manifest swap
(≙ reference KvSemantics::Snapshot / per-statement transaction,
reference: src/kv.rs:110-115, src/sql/client.rs:67-80)."""

import os

from seamdb_spark.snapshots import TableSnapshots
from seamdb_spark.types import ColumnDescriptor, IndexDescriptor, TableDescriptor


def _desc():
    return TableDescriptor(
        name="t",
        columns=[
            ColumnDescriptor("id", "int64", nullable=False),
            ColumnDescriptor("v", "string"),
        ],
        indexes=[IndexDescriptor("primary_key", ["id"])],
    )


def test_versions_and_append(spark, tmp_path):
    snaps = TableSnapshots(str(tmp_path / "t"))
    schema = _desc().spark_schema()
    assert snaps.current_version() == 0
    assert snaps.read(spark, schema).count() == 0

    snaps.commit(spark.createDataFrame([(1, "a")], schema))
    snaps.commit(spark.createDataFrame([(2, "b")], schema))
    assert snaps.current_version() == 2
    assert snaps.read(spark, schema).count() == 2


def test_reader_pinned_to_old_snapshot(spark, tmp_path):
    """A DataFrame resolved before a commit keeps reading the old file
    list — per-statement snapshot isolation."""
    snaps = TableSnapshots(str(tmp_path / "t"))
    schema = _desc().spark_schema()
    snaps.commit(spark.createDataFrame([(1, "a")], schema))
    pinned = snaps.read(spark, schema)
    snaps.commit(spark.createDataFrame([(2, "b")], schema))
    assert pinned.count() == 1                      # old snapshot
    assert snaps.read(spark, schema).count() == 2   # new snapshot


def test_crash_before_manifest_swap_keeps_old_snapshot(spark, tmp_path):
    """Segment files without a manifest swap are invisible
    (write-manifest-last crash safety)."""
    snaps = TableSnapshots(str(tmp_path / "t"))
    schema = _desc().spark_schema()
    snaps.commit(spark.createDataFrame([(1, "a")], schema))
    # simulate a crashed writer: orphan segment dir, no manifest update
    orphan = spark.createDataFrame([(99, "zz")], schema)
    orphan.write.mode("overwrite").parquet(
        os.path.join(str(tmp_path / "t"), "seg-999999")
    )
    assert snaps.read(spark, schema).count() == 1


def test_overwrite_mode(spark, tmp_path):
    snaps = TableSnapshots(str(tmp_path / "t"))
    schema = _desc().spark_schema()
    snaps.commit(spark.createDataFrame([(1, "a"), (2, "b")], schema))
    snaps.commit(spark.createDataFrame([(3, "c")], schema), mode="overwrite")
    rows = snaps.read(spark, schema).collect()
    assert [r.id for r in rows] == [3]


def test_time_travel_reads(spark, tmp_path):
    snaps = TableSnapshots(str(tmp_path / "t"))
    schema = _desc().spark_schema()
    snaps.commit(spark.createDataFrame([(1, "a")], schema))
    snaps.commit(spark.createDataFrame([(2, "b")], schema))
    snaps.commit(spark.createDataFrame([(3, "c")], schema))
    assert snaps.read(spark, schema, version=1).count() == 1
    assert snaps.read(spark, schema, version=2).count() == 2
    assert snaps.read(spark, schema, version=3).count() == 3
    assert snaps.read(spark, schema, version=0).count() == 0


def test_time_travel_unretained_version_raises(spark, tmp_path):
    import pytest

    snaps = TableSnapshots(str(tmp_path / "t"))
    schema = _desc().spark_schema()
    for i in range(5):  # KEEP_MANIFESTS=3 → v1, v2 manifests GC'd
        snaps.commit(spark.createDataFrame([(i, "x")], schema))
    with pytest.raises(ValueError, match="not retained"):
        snaps.read(spark, schema, version=1)


def test_segment_gc_after_overwrites(spark, tmp_path):
    """Segments referenced by no retained manifest are deleted; segments
    of retained (time-travel-able) versions survive."""
    snaps = TableSnapshots(str(tmp_path / "t"))
    schema = _desc().spark_schema()
    for i in range(6):  # KEEP_MANIFESTS=3 → v1..v3 manifests pruned
        snaps.commit(spark.createDataFrame([(i, "x")], schema), mode="overwrite")
    seg_dirs = sorted(
        d for d in os.listdir(str(tmp_path / "t")) if d.startswith("seg-")
    )
    # overwrites orphan every older segment; only retained versions keep theirs
    assert seg_dirs == ["seg-000004", "seg-000005", "seg-000006"]
    # every retained version still reads cleanly
    for v in (4, 5, 6):
        assert snaps.read(spark, schema, version=v).count() == 1


def test_engine_compact(spark, tmp_path):
    from seamdb_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"), database="db")
    e.sql("CREATE TABLE t (id bigint PRIMARY KEY, v text)")
    for i in range(4):
        e.sql(f"INSERT INTO t VALUES ({i}, 'v{i}')")
    before = len(
        TableSnapshots(e.store.table_dir("db", "t")).current_files()
    )
    e.compact("t")
    snaps = TableSnapshots(e.store.table_dir("db", "t"))
    after = len(snaps.current_files())
    assert after < before
    assert e.sql("SELECT count(*) AS n FROM t").collect()[0].n == 4
    # appends continue to work after compaction
    e.sql("INSERT INTO t VALUES (99, 'z')")
    assert e.sql("SELECT count(*) AS n FROM t").collect()[0].n == 5


def test_json_and_csv_source_roundtrip(spark, tmp_path):
    """Source-format coverage: the engine's tables round-trip through
    JSON-lines and CSV with explicit schemas — write a sample of the
    events fixture to both formats, read each back, and compare the
    per-type counts and value sums (cents-exact) against the parquet
    source of truth."""
    from pyspark.sql import functions as F

    from seamdb_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.col("ts").cast("string").alias("ts_s"),
    )

    def tally(df):
        return {
            r.event_type: (r.n, r.cents)
            for r in df.groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            )
            .collect()
        }
    want = tally(ev)

    jdir, cdir = str(tmp_path / "ev_json"), str(tmp_path / "ev_csv")
    ev.write.mode("overwrite").json(jdir)
    ev.write.mode("overwrite").option("header", True).csv(cdir)
    schema = "event_id long, user_id long, event_type string, value double, ts_s string"
    got_json = tally(spark.read.schema(schema).json(jdir))
    got_csv = tally(
        spark.read.schema(schema).option("header", True).csv(cdir)
    )
    assert got_json == want
    assert got_csv == want


def test_orc_source_roundtrip(spark, tmp_path):
    """ORC completes the columnar source matrix (parquet is primary;
    ORC ships with Spark): events round-trip through ORC with native
    types preserved — including the timestamp column parquet needs the
    nanos workaround for — and per-type tallies match the source."""
    from pyspark.sql import functions as F

    from seamdb_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )

    def tally(df):
        return {
            r.event_type: (r.n, r.cents, str(r.t0), str(r.t1))
            for r in df.groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
                F.min("ts").alias("t0"),
                F.max("ts").alias("t1"),
            )
            .collect()
        }

    want = tally(ev)
    odir = str(tmp_path / "ev_orc")
    ev.write.mode("overwrite").orc(odir)
    back = spark.read.orc(odir)
    assert dict(back.dtypes)["ts"] == "timestamp"
    assert tally(back) == want


def test_commit_once_replay_guard(spark, tmp_path):
    """Exactly-once micro-batch commits (e49/e50's consume): a replayed
    bid is skipped (no duplicate segment, version unchanged), a newer
    bid commits, and other extra keys survive the merge."""
    snaps = TableSnapshots(str(tmp_path / "t"))
    schema = _desc().spark_schema()
    snaps.commit(
        spark.createDataFrame([(0, "seed")], schema),
        mode="overwrite",
        extra={"keep": "me"},
    )
    b1 = spark.createDataFrame([(1, "a")], schema)
    assert snaps.commit_once(b1, 0) is True
    v = snaps.current_version()
    # replay of the SAME micro-batch: skipped, nothing changes
    assert snaps.commit_once(b1, 0) is False
    assert snaps.current_version() == v
    assert snaps.read(spark, schema).count() == 2
    # an OLDER bid (late replay after a newer commit) is also skipped
    assert snaps.commit_once(spark.createDataFrame([(2, "b")], schema), 1)
    assert snaps.commit_once(b1, 0) is False
    assert snaps.read(spark, schema).count() == 3
    # unrelated extra metadata is carried through every guard commit
    assert snaps.current_extra() == {"keep": "me", "last_bid": 1}
