"""Unit tests for the PostgreSQL-dialect front door
(≙ reference: src/sql/postgresql/mod.rs single-statement check,
CREATE TABLE parsing, unsupported rejections)."""

import pytest

from seamdb_spark import sqlparse
from seamdb_spark.errors import InvalidArgumentError, UnsupportedError


def test_split_statements_string_aware():
    assert sqlparse.split_statements("SELECT 'a;b'; SELECT 2") == [
        "SELECT 'a;b'",
        "SELECT 2",
    ]
    assert sqlparse.split_statements("SELECT 1;") == ["SELECT 1"]


def test_single_statement():
    assert sqlparse.single_statement(" SELECT 1 ; ") == "SELECT 1"
    with pytest.raises(InvalidArgumentError):
        sqlparse.single_statement("SELECT 1; SELECT 2")
    with pytest.raises(InvalidArgumentError):
        sqlparse.single_statement("")


def test_create_table_descriptor():
    # ≙ reference DDL planning test: src/sql/postgresql/mod.rs:587-638
    parsed = sqlparse.parse_create_table(
        """CREATE TABLE IF NOT EXISTS t (
            id bigserial PRIMARY KEY,
            name varchar(10) NOT NULL,
            email text UNIQUE NULLS NOT DISTINCT,
            score double precision,
            UNIQUE (name, score)
        )"""
    )
    d = parsed.descriptor
    assert parsed.if_not_exists
    assert [c.kind for c in d.columns] == ["int64", "string", "string", "float64"]
    assert d.column("id").serial and not d.column("id").nullable
    assert d.column("name").varchar_len == 10 and not d.column("name").nullable
    kinds = {tuple(ix.columns): ix.kind for ix in d.indexes}
    assert kinds[("id",)] == "primary_key"
    assert kinds[("email",)] == "unique_nulls_not_distinct"
    assert kinds[("name", "score")] == "unique_nulls_distinct"


def test_create_table_requires_pk():
    with pytest.raises(InvalidArgumentError):
        sqlparse.parse_create_table("CREATE TABLE t (id int)")


def test_unsupported_type():
    with pytest.raises(UnsupportedError):
        sqlparse.parse_create_table(
            "CREATE TABLE t (id int PRIMARY KEY, ts timestamp)"
        )
    with pytest.raises(UnsupportedError):
        sqlparse.parse_create_table(
            "CREATE TABLE t (id int PRIMARY KEY, d decimal(10,2))"
        )


def test_insert_parsing():
    p = sqlparse.parse_insert("INSERT INTO t (a, b) VALUES (1, 'x'), (2, 'y')")
    assert p.table == "t" and p.columns == ["a", "b"]
    assert p.values_sql.startswith("(1,")
    p = sqlparse.parse_insert("INSERT INTO t SELECT * FROM u")
    assert p.select_sql.lower().startswith("select")
    with pytest.raises(UnsupportedError):
        sqlparse.parse_insert("INSERT INTO t VALUES (1) ON CONFLICT DO NOTHING")


def test_cast_rewrite_maps_pg_types():
    f = sqlparse.rewrite_pg_casts
    assert f("SELECT x::int8 FROM t") == "SELECT CAST(x AS bigint) FROM t"
    assert f("'1'::float8") == "CAST('1' AS double)"
    assert f("x::double precision") == "CAST(x AS double)"
    assert f("f(y)::text") == "CAST(f(y) AS string)"
    assert f("(a + b)::int") == "CAST((a + b) AS int)"
    # nested: innermost first, then outer
    assert f("x::int::text") == "CAST(CAST(x AS int) AS string)"


def test_null_ordering_rewrite():
    f = sqlparse.append_pg_null_ordering
    assert f("SELECT * FROM t ORDER BY a, b DESC") == (
        "SELECT * FROM t ORDER BY a NULLS LAST, b DESC NULLS FIRST"
    )
    assert f("SELECT * FROM t ORDER BY a DESC NULLS LAST") == (
        "SELECT * FROM t ORDER BY a DESC NULLS LAST"
    )
    out = f("SELECT * FROM t ORDER BY a LIMIT 5")
    assert out == "SELECT * FROM t ORDER BY a NULLS LAST LIMIT 5"
    # ORDER BY inside a subquery/window is left alone
    inner = "SELECT rank() OVER (ORDER BY x) FROM t"
    assert f(inner) == inner


def test_classify_unsupported():
    for stmt, msg in [
        ("BEGIN", "transactions"),
        ("UPDATE t SET x = 1", "update"),
        ("CREATE VIEW v AS SELECT 1", "view"),
        ("SET search_path = x", "set"),
    ]:
        with pytest.raises(UnsupportedError, match=msg):
            sqlparse.classify(stmt)


def test_ctas_rejected():
    with pytest.raises(UnsupportedError, match="AS SELECT"):
        sqlparse.parse_create_table("CREATE TABLE t AS SELECT 1 AS x")


def test_rewrites_never_touch_string_literals():
    f = sqlparse.rewrite_pg_casts
    assert f("SELECT 'a::b' AS s") == "SELECT 'a::b' AS s"
    assert f("SELECT 'x'::int, 'a::b' AS s") == "SELECT CAST('x' AS int), 'a::b' AS s"
    g = sqlparse.append_pg_null_ordering
    assert g("SELECT 'order by z' AS s FROM t") == "SELECT 'order by z' AS s FROM t"
    assert g("SELECT 'order by z' AS s FROM t ORDER BY s").endswith(
        "ORDER BY s NULLS LAST"
    )
    out = sqlparse.normalize_query(
        "SELECT 'current_user' AS a, current_user AS b FROM t", "db1", "bob"
    )
    assert "'current_user' AS a" in out and "'bob' AS b" in out
    # doubled-quote escapes inside literals survive
    assert f("SELECT 'it''s ::fine'") == "SELECT 'it''s ::fine'"
