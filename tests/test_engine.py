"""End-to-end engine tests mirroring the reference's SQL e2e suite
(reference: src/sql/mod.rs:175-275 — create db/table, multi-row insert
returning count, multi-column ORDER BY with Postgres NULL placement,
session functions; :587-638 DDL descriptor assertions)."""

import pytest

from seamdb_spark.errors import (
    InvalidArgumentError,
    TableAlreadyExistsError,
    TableNotFoundError,
    UnsupportedError,
)


def _setup_table1(engine):
    engine.sql(
        """CREATE TABLE table1 (
            id serial PRIMARY KEY,
            count bigint,
            price double precision,
            description text
        )"""
    )


def test_create_database_result_strings(engine):
    assert engine.sql("CREATE DATABASE db2").collect()[0].result == "created"
    assert (
        engine.sql("CREATE DATABASE IF NOT EXISTS db2").collect()[0].result
        == "already exists"
    )
    with pytest.raises(Exception):
        engine.sql("CREATE DATABASE db2")


def test_create_table_and_describe(engine):
    _setup_table1(engine)
    assert (
        engine.sql("CREATE TABLE IF NOT EXISTS table1 (id int PRIMARY KEY)")
        .collect()[0]
        .result
        == "already exists"
    )
    with pytest.raises(TableAlreadyExistsError):
        engine.sql("CREATE TABLE table1 (id int PRIMARY KEY)")
    desc = {r.column_name: r for r in engine.sql("DESCRIBE table1").collect()}
    assert desc["id"].serial and not desc["id"].nullable
    assert desc["count"].data_type == "int64" and desc["count"].nullable
    assert desc["price"].data_type == "float64"
    assert desc["description"].data_type == "string"


def test_insert_returns_count_and_serial_assignment(engine):
    _setup_table1(engine)
    n = engine.sql(
        "INSERT INTO table1 (count, price, description) VALUES"
        " (4, 15.6, 'window'), (3, 0.8, 'door'), (8, 2.5, NULL)"
    ).collect()[0]["count"]
    assert n == 3
    rows = engine.sql("SELECT id, count, description FROM table1 ORDER BY id").collect()
    assert [r.id for r in rows] == [1, 2, 3]
    assert rows[2].description is None


def test_order_by_null_placement_matches_postgres(engine):
    # ≙ reference: src/sql/mod.rs:236-260 — under `count DESC` the NULL
    # count row sorts FIRST (Postgres default), id ASC ties.
    _setup_table1(engine)
    engine.sql(
        "INSERT INTO table1 (count, price, description) VALUES"
        " (4, 15.6, 'a'), (NULL, 0.8, 'b'), (4, 2.5, 'c')"
    )
    rows = engine.sql(
        "SELECT id, count FROM table1 ORDER BY count DESC, id ASC"
    ).collect()
    assert [r.id for r in rows] == [2, 1, 3]
    rows = engine.sql("SELECT id, count FROM table1 ORDER BY count ASC").collect()
    assert rows[-1]["count"] is None  # ASC → NULLS LAST


def test_insert_select_and_aggregates(engine):
    _setup_table1(engine)
    engine.sql(
        "INSERT INTO table1 (count, price, description) VALUES"
        " (4, 15.6, 'x'), (6, 2.0, 'y')"
    )
    n = engine.sql(
        "INSERT INTO table1 (count, price, description)"
        " SELECT count * 10, price, description FROM table1"
    ).collect()[0]["count"]
    assert n == 2
    agg = engine.sql(
        "SELECT sum(count) AS s, max(price) AS mx, count(*) AS n FROM table1"
    ).collect()[0]
    assert (agg.s, agg.n) == (4 + 6 + 40 + 60, 4)


def test_session_functions(engine):
    row = engine.sql(
        "SELECT current_catalog AS c, current_schema AS s,"
        " current_user AS u, inet_client_port() AS p"
    ).collect()[0]
    assert (row.c, row.s, row.u, row.p) == ("db1", "public", "tester", 0)


def test_single_statement_enforced(engine):
    with pytest.raises(InvalidArgumentError):
        engine.sql("SELECT 1; SELECT 2")
    with pytest.raises(InvalidArgumentError):
        engine.sql("   ")


def test_unsupported_statements(engine):
    for stmt in [
        "CREATE VIEW v AS SELECT 1",
        "CREATE INDEX i ON t (c)",
        "CREATE SCHEMA s",
        "CREATE FUNCTION f() RETURNS int",
        "CREATE EXTERNAL TABLE t (id int) LOCATION 'x'",
        "BEGIN",
        "COMMIT",
        "UPDATE t SET c = 1",
        "DELETE FROM t",
        "CREATE TEMP TABLE t (id int PRIMARY KEY)",
    ]:
        with pytest.raises(UnsupportedError):
            engine.sql(stmt)


def test_default_rejected(engine):
    # ≙ reference: src/sql/postgresql/mod.rs:192
    with pytest.raises(UnsupportedError):
        engine.sql("CREATE TABLE t (id int PRIMARY KEY, c int DEFAULT 5)")


def test_primary_key_mandatory(engine):
    # ≙ reference: src/sql/shared.rs:156-158
    with pytest.raises(InvalidArgumentError):
        engine.sql("CREATE TABLE t (id int, c text)")


def test_drop_table(engine):
    _setup_table1(engine)
    engine.sql("INSERT INTO table1 (count) VALUES (1)")
    assert engine.sql("DROP TABLE table1").collect()[0].result == "dropped"
    with pytest.raises(TableNotFoundError):
        engine.sql("SELECT * FROM table1")  # view gone after re-register
    assert (
        engine.sql("DROP TABLE IF EXISTS table1").collect()[0].result
        == "does not exist"
    )
    with pytest.raises(TableNotFoundError):
        engine.sql("DROP TABLE table1")


def test_pg_cast_rewrite(engine):
    row = engine.sql("SELECT '41'::int + 1 AS v, 2.5::text AS t").collect()[0]
    assert row.v == 42 and row.t in ("2.5",)


def test_show_tables(engine):
    _setup_table1(engine)
    engine.sql("CREATE TABLE zeta (id int PRIMARY KEY)")
    names = [r.table_name for r in engine.sql("SHOW TABLES").collect()]
    assert names == ["table1", "zeta"]


def test_explain_passthrough(engine):
    _setup_table1(engine)
    plan = engine.sql("EXPLAIN SELECT count FROM table1 WHERE count > 2").collect()
    assert "Filter" in plan[0][0] or "Scan" in plan[0][0]


def test_udf_registration_surface(engine, spark):
    # ≙ reference UDF registration API (state.register_udf,
    # src/sql/mod.rs:85-88; ContextProvider lookup :295-317) — Spark's
    # native surface is spark.udf.register, usable through engine.sql.
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def double_it(s: pd.Series) -> pd.Series:
        return s * 2.0

    spark.udf.register("double_it", double_it)
    _setup_table1(engine)
    engine.sql("INSERT INTO table1 (count, price) VALUES (1, 2.5), (2, 10.0)")
    rows = engine.sql(
        "SELECT id, double_it(price) AS p2 FROM table1 ORDER BY id"
    ).collect()
    assert [r.p2 for r in rows] == [5.0, 20.0]


def test_large_insert_select_serial_uniqueness(engine, spark):
    # serial assignment must stay dense+unique on a multi-partition input
    engine.sql("CREATE TABLE big (id serial PRIMARY KEY, v bigint)")
    spark.range(0, 10000, 1, 8).createOrReplaceTempView("src10k")
    n = engine.sql("INSERT INTO big (v) SELECT id FROM src10k").collect()[0]["count"]
    assert n == 10000
    stats = engine.sql(
        "SELECT count(*) AS n, count(DISTINCT id) AS nd, min(id) AS lo,"
        " max(id) AS hi FROM big"
    ).collect()[0]
    assert (stats.n, stats.nd, stats.lo, stats.hi) == (10000, 10000, 1, 10000)


def test_information_schema(engine):
    _setup_table1(engine)
    engine.sql("CREATE TABLE other (x bigint PRIMARY KEY)")
    rows = engine.sql(
        "SELECT table_name, table_type FROM information_schema.tables"
        " ORDER BY table_name"
    ).collect()
    assert [r.table_name for r in rows] == ["other", "table1"]
    cols = engine.sql(
        "SELECT column_name, data_type, is_nullable"
        " FROM information_schema.columns WHERE table_name = 'table1'"
        " ORDER BY ordinal_position"
    ).collect()
    assert [c.column_name for c in cols] == ["id", "count", "price", "description"]
    assert cols[0].is_nullable == "NO" and cols[1].is_nullable == "YES"


def test_information_schema_full_surface(engine):
    # ≙ reference src/sql/mod.rs:82 — DataFusion's ENTIRE
    # information_schema is on: schemata/views/df_settings/routines/
    # parameters resolve too, and tables spans all databases.
    _setup_table1(engine)
    engine.sql("CREATE DATABASE isdb2")
    engine.sql("CREATE TABLE isdb2.public.t2 (x bigint PRIMARY KEY)")
    rows = engine.sql(
        "SELECT table_catalog, table_name FROM information_schema.tables"
        " ORDER BY table_catalog, table_name"
    ).collect()
    assert ("isdb2", "t2") in [(r.table_catalog, r.table_name) for r in rows]
    schemata = engine.sql(
        "SELECT catalog_name, schema_name FROM information_schema.schemata"
        " ORDER BY catalog_name, schema_name"
    ).collect()
    assert ("isdb2", "public") in [(r.catalog_name, r.schema_name) for r in schemata]
    assert engine.sql("SELECT * FROM information_schema.views").count() == 0
    tz = engine.sql(
        "SELECT value FROM information_schema.df_settings"
        " WHERE name = 'spark.sql.session.timeZone'"
    ).collect()
    assert tz[0].value == "UTC"
    fns = {
        r.routine_name
        for r in engine.sql(
            "SELECT routine_name FROM information_schema.routines"
        ).collect()
    }
    assert {"current_catalog", "current_schema", "current_user"} <= fns
    assert engine.sql("SELECT * FROM information_schema.parameters").count() == 0


def test_qualified_table_names(engine):
    # 3-level naming resolves: db.public.t, public.t, bare t
    _setup_table1(engine)
    engine.sql("INSERT INTO table1 (count) VALUES (7)")
    for name in ("table1", "public.table1", "db1.public.table1"):
        assert engine.sql(f"SELECT count(*) AS n FROM {name}").collect()[0].n == 1


def test_cross_database_qualified_names(engine):
    # ≙ reference: src/sql/mod.rs:120,130 — names resolve per-session
    # with default schema "public"; other databases reachable via
    # 3-part names in DDL, DML, and queries.
    from seamdb_spark.errors import DatabaseNotFoundError

    _setup_table1(engine)
    engine.sql("INSERT INTO table1 (count) VALUES (7)")
    engine.sql("CREATE DATABASE db2")
    engine.sql("CREATE TABLE db2.public.t2 (k bigint PRIMARY KEY, v text)")
    assert engine.sql("INSERT INTO db2.public.t2 VALUES (1, 'x'), (2, 'y')").collect()[
        0
    ]["count"] == 2
    assert engine.sql("SELECT count(*) AS n FROM db2.public.t2").collect()[0].n == 2
    # cross-database join with the session database's bare name
    joined = engine.sql(
        "SELECT t2.v FROM db2.public.t2 t2 JOIN table1 ON t2.k < table1.count"
        " ORDER BY t2.v"
    ).collect()
    assert [r.v for r in joined] == ["x", "y"]
    desc = {r.column_name for r in engine.sql("DESCRIBE db2.public.t2").collect()}
    assert desc == {"k", "v"}
    with pytest.raises(DatabaseNotFoundError):
        engine.sql("SELECT * FROM nosuch.public.t2")
    with pytest.raises(DatabaseNotFoundError):
        engine.sql("INSERT INTO nosuch.public.t2 VALUES (1, 'x')")
    with pytest.raises(DatabaseNotFoundError):
        engine.sql("CREATE TABLE db2.private.t3 (k bigint PRIMARY KEY)")
    engine.sql("DROP TABLE db2.public.t2")
    with pytest.raises(TableNotFoundError):
        engine.sql("DESCRIBE db2.public.t2")


def test_identifier_case_folding(engine):
    # Unquoted identifiers fold to lowercase (DataFusion/Postgres
    # normalization) — mixed-case DDL/DML/queries all hit one table.
    engine.sql("CREATE TABLE Foo (Id bigint PRIMARY KEY, Val text)")
    assert engine.sql("INSERT INTO FOO (ID, VAL) VALUES (1, 'a')").collect()[0][
        "count"
    ] == 1
    desc = {r.column_name for r in engine.sql("DESCRIBE Foo").collect()}
    assert desc == {"id", "val"}
    assert engine.sql("SELECT Val FROM foo").collect()[0].Val == "a"
    assert "foo" in [
        r.table_name for r in engine.sql("SHOW TABLES").collect()
    ]


def test_explicit_null_serial_rejected(engine):
    # ≙ reference client.rs prefill_row: serial fills only when the
    # column is OMITTED; an explicit NULL into a non-nullable serial is
    # a null violation, not a silent fill.
    from seamdb_spark.errors import NullViolationError

    engine.sql("CREATE TABLE t (id serial PRIMARY KEY, v text)")
    with pytest.raises(NullViolationError):
        engine.sql("INSERT INTO t (id, v) VALUES (NULL, 'x')")
    # omitted column still auto-fills
    assert engine.sql("INSERT INTO t (v) VALUES ('y')").collect()[0]["count"] == 1
    assert engine.sql("SELECT id FROM t").collect()[0].id == 1


def test_bench_trajectory_gate():
    """bench.py's regression gate (round-8): a query slower than
    max(2x, +2s) of its own last clean-run time fails; new queries,
    allowlisted queries, and other-SF baselines gate nothing."""
    import bench

    base = {"sf": 0.1, "queries": {"fast": 0.4, "slow": 5.0, "plan": 1.0}}
    # within bounds: small-query jitter is absorbed by the +2s guard,
    # big-query jitter by the 2x factor
    assert bench.check_regressions(
        {"fast": 1.1, "slow": 9.9, "brand_new": 99.0}, base, 0.1
    ) == []
    # breaches: fast needs > 2.4s, slow needs > 10s
    hits = bench.check_regressions({"fast": 2.5, "slow": 10.1}, base, 0.1)
    assert {h["query"] for h in hits} == {"fast", "slow"}
    assert hits[0]["bound"] == 2.4
    # allowlist exempts a deliberate plan change
    assert bench.check_regressions(
        {"plan": 50.0}, base, 0.1, allow={"plan": "reason recorded"}
    ) == []
    # a baseline recorded at another SF never gates
    assert bench.check_regressions({"fast": 99.0}, base, 0.001) == []
