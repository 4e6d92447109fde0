"""PostgreSQL-dialect statement handling for the engine entry point.

Mirrors the reference's planner front door
(reference: src/sql/postgresql/mod.rs:99-268):
- exactly one statement per query string (``:104-109``),
- CREATE TABLE parsed by the engine itself (``:121-268``),
- an explicit "unsupported" list for DDL the reference rejects
  (reference: src/sql/mod.rs:104-128,
  src/sql/postgresql/mod.rs:133-141,192-235,252-263),
- everything else handed to the relational planner (DataFusion there,
  Spark SQL here) after dialect normalization.

We parse with focused tokenization rather than a full grammar — the
accepted DDL/DML surface is small and fixed (8 types, serial variants,
PK/UNIQUE constraints, INSERT VALUES/SELECT).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .errors import DatabaseNotFoundError, InvalidArgumentError, UnsupportedError
from .types import ColumnDescriptor, IndexDescriptor, TableDescriptor, parse_ddl_type


# ---------------------------------------------------------------------------
# identifier normalization + qualified-name resolution
# ---------------------------------------------------------------------------
def fold_ident(name: str) -> str:
    """Unquoted identifiers fold to lowercase — the reference inherits
    DataFusion's Postgres-style normalization; our grammar only accepts
    unquoted identifiers, so folding is unconditional."""
    return name.lower()


def resolve_table_name(ident: str, database: str) -> tuple[str, str]:
    """Resolve 1/2/3-part table identifiers the way the reference's
    per-session resolver does (reference: src/sql/mod.rs:120,130;
    default schema "public": src/sql/context.rs:47-49):

    - ``t``              → (session database, t)
    - ``public.t``       → (session database, t)
    - ``db.public.t``    → (db, t)

    Any schema other than ``public`` is rejected (the metastore creates
    exactly one schema per database, like the reference)."""
    parts = [fold_ident(p) for p in ident.split(".")]
    if len(parts) == 1:
        return database, parts[0]
    if len(parts) == 2:
        schema, table = parts
    elif len(parts) == 3:
        database, schema, table = parts
    else:
        raise InvalidArgumentError(f"invalid table name: {ident}")
    if schema != "public":
        raise DatabaseNotFoundError(f"schema {schema} not found")
    return database, table

# ---------------------------------------------------------------------------
# statement splitting (string-literal aware)
# ---------------------------------------------------------------------------
def split_statements(text: str) -> list[str]:
    stmts, depth, cur, i = [], 0, [], 0
    in_str: str | None = None
    while i < len(text):
        ch = text[i]
        if in_str:
            cur.append(ch)
            if ch == in_str:
                if in_str == "'" and i + 1 < len(text) and text[i + 1] == "'":
                    cur.append(text[i + 1])
                    i += 1
                else:
                    in_str = None
        elif ch in ("'", '"'):
            in_str = ch
            cur.append(ch)
        elif ch == ";" and depth == 0:
            stmts.append("".join(cur))
            cur = []
        else:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            cur.append(ch)
        i += 1
    stmts.append("".join(cur))
    return [s.strip() for s in stmts if s.strip()]


def single_statement(text: str) -> str:
    """≙ reference: src/sql/postgresql/mod.rs:104-109 — exactly one."""
    stmts = split_statements(text)
    if len(stmts) != 1:
        raise InvalidArgumentError(
            f"expect one statement, got {len(stmts)}"
        )
    return stmts[0]


# ---------------------------------------------------------------------------
# classification + unsupported surface
# ---------------------------------------------------------------------------
_UNSUPPORTED_PREFIXES: list[tuple[str, str]] = [
    # (regex on leading keywords, message) — mirrors the reference's
    # rejection list; OLTP statements are unsupported per spark_approach.
    (r"create\s+(or\s+replace\s+)?view\b", "create view is not supported"),
    (r"create\s+schema\b", "create schema is not supported"),
    (r"create\s+(unique\s+)?index\b", "create index is not supported"),
    (r"create\s+(or\s+replace\s+)?function\b", "create function is not supported"),
    (r"create\s+external\s+table\b", "create external table is not supported"),
    (r"create\s+(global\s+|local\s+)?temp(orary)?\s+table\b", "temporary table is not supported"),
    (r"create\s+or\s+replace\s+table\b", "create or replace table is not supported"),
    (r"alter\b", "alter is not supported"),
    (r"drop\s+database\b", "drop database is not supported"),
    (r"drop\s+schema\b", "drop schema is not supported"),
    (r"drop\s+view\b", "drop view is not supported"),
    (r"drop\s+index\b", "drop index is not supported"),
    (r"(begin|start\s+transaction)\b", "transactions are not supported (spark_approach: OLTP unsupported)"),
    (r"(commit|rollback|abort)\b", "transactions are not supported (spark_approach: OLTP unsupported)"),
    (r"update\b", "update is not supported"),
    (r"delete\b", "delete is not supported"),
    (r"merge\b", "merge is not supported"),
    (r"truncate\b", "truncate is not supported"),
    (r"(grant|revoke)\b", "access control is not supported"),
    (r"set\b", "set is not supported"),
]


def classify(stmt: str) -> str:
    s = stmt.strip().lower()
    for pattern, message in _UNSUPPORTED_PREFIXES:
        if re.match(pattern, s):
            raise UnsupportedError(message)
    if re.match(r"create\s+database\b", s):
        return "create_database"
    if re.match(r"create\s+table\b", s):
        return "create_table"
    if re.match(r"drop\s+table\b", s):
        return "drop_table"
    if re.match(r"insert\b", s):
        return "insert"
    if re.match(r"(select|with|values|explain|show|describe|table)\b", s):
        return "query"
    raise UnsupportedError(f"unsupported statement: {stmt.split()[0]}")


# ---------------------------------------------------------------------------
# CREATE DATABASE / DROP TABLE
# ---------------------------------------------------------------------------
_CREATE_DB_RE = re.compile(
    r"create\s+database\s+(if\s+not\s+exists\s+)?([A-Za-z_][\w$]*)\s*$",
    re.IGNORECASE,
)
_DROP_TABLE_RE = re.compile(
    r"drop\s+table\s+(if\s+exists\s+)?([A-Za-z_][\w$.]*)\s*$", re.IGNORECASE
)


def parse_create_database(stmt: str) -> tuple[str, bool]:
    m = _CREATE_DB_RE.match(stmt.strip())
    if not m:
        raise InvalidArgumentError(f"malformed CREATE DATABASE: {stmt}")
    return fold_ident(m.group(2)), bool(m.group(1))


def parse_drop_table(stmt: str) -> tuple[str, bool]:
    m = _DROP_TABLE_RE.match(stmt.strip())
    if not m:
        raise InvalidArgumentError(f"malformed DROP TABLE: {stmt}")
    return fold_ident(m.group(2)), bool(m.group(1))


# ---------------------------------------------------------------------------
# CREATE TABLE
# ---------------------------------------------------------------------------
@dataclass
class ParsedCreateTable:
    name: str
    if_not_exists: bool
    descriptor: TableDescriptor = field(repr=False, default=None)  # type: ignore[assignment]


_CREATE_TABLE_RE = re.compile(
    r"create\s+table\s+(if\s+not\s+exists\s+)?([A-Za-z_][\w$.]*)\s*\((.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)

_TYPE_TOKENS = (
    "double precision",
    "character varying",
    "boolean", "bool", "smallint", "int2", "integer", "int4", "int8",
    "bigint", "int", "real", "float4", "float8", "bytea", "text",
    "varchar", "smallserial", "serial2", "serial4", "serial8",
    "bigserial", "serial",
)


def _split_top_level(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def _parse_column_def(defn: str) -> tuple[ColumnDescriptor, list[IndexDescriptor]]:
    m = re.match(r"([A-Za-z_][\w$]*)\s+(.*)$", defn.strip(), re.DOTALL)
    if not m:
        raise InvalidArgumentError(f"malformed column definition: {defn}")
    name, rest = fold_ident(m.group(1)), m.group(2).strip()
    rest_l = rest.lower()
    type_str = None
    for t in _TYPE_TOKENS:
        if rest_l.startswith(t):
            tail = rest_l[len(t):]
            if tail.startswith("("):
                close = tail.index(")")
                type_str = rest[: len(t) + close + 1]
            else:
                type_str = rest[: len(t)]
            break
    if type_str is None:
        raise UnsupportedError(f"unsupported column type in: {defn}")
    try:
        kind, serial, varchar_len = parse_ddl_type(type_str)
    except (KeyError, ValueError) as e:
        raise UnsupportedError(f"unsupported column type: {type_str}") from e

    options = rest[len(type_str):].strip().lower()
    if re.search(r"\bdefault\b", options):
        # ≙ reference: src/sql/postgresql/mod.rs:192 — DEFAULT rejected.
        raise UnsupportedError("DEFAULT expressions are unimplemented")
    nullable = not re.search(r"\bnot\s+null\b", options) and not re.search(
        r"\bprimary\s+key\b", options
    )
    indexes: list[IndexDescriptor] = []
    if re.search(r"\bprimary\s+key\b", options):
        indexes.append(IndexDescriptor("primary_key", [name]))
    elif re.search(r"\bunique\b", options):
        kind_ix = (
            "unique_nulls_not_distinct"
            if re.search(r"nulls\s+not\s+distinct", options)
            else "unique_nulls_distinct"
        )
        indexes.append(IndexDescriptor(kind_ix, [name]))
    col = ColumnDescriptor(
        name=name, kind=kind, nullable=nullable, serial=serial, varchar_len=varchar_len
    )
    return col, indexes


def _parse_table_constraint(defn: str) -> IndexDescriptor | None:
    d = defn.strip()
    m = re.match(r"primary\s+key\s*\(([^)]*)\)", d, re.IGNORECASE)
    if m:
        cols = [fold_ident(c.strip()) for c in m.group(1).split(",")]
        return IndexDescriptor("primary_key", cols)
    m = re.match(
        r"unique(\s+nulls\s+(not\s+)?distinct)?\s*\(([^)]*)\)", d, re.IGNORECASE
    )
    if m:
        cols = [fold_ident(c.strip()) for c in m.group(3).split(",")]
        kind = "unique_nulls_not_distinct" if m.group(2) else "unique_nulls_distinct"
        return IndexDescriptor(kind, cols)
    if re.match(r"(constraint|foreign|check)\b", d, re.IGNORECASE):
        raise UnsupportedError(f"unsupported table constraint: {d.split()[0]}")
    return None


def parse_create_table(stmt: str) -> ParsedCreateTable:
    if re.search(r"\)\s*as\s+select\b|\bas\s+select\b", stmt, re.IGNORECASE):
        raise UnsupportedError("CREATE TABLE AS SELECT is not supported")
    m = _CREATE_TABLE_RE.match(stmt.strip())
    if not m:
        raise InvalidArgumentError(f"malformed CREATE TABLE: {stmt}")
    if_not_exists, name, body = bool(m.group(1)), fold_ident(m.group(2)), m.group(3)
    columns: list[ColumnDescriptor] = []
    indexes: list[IndexDescriptor] = []
    for defn in _split_top_level(body):
        constraint = None
        if re.match(r"(primary|unique|constraint|foreign|check)\b", defn, re.IGNORECASE):
            constraint = _parse_table_constraint(defn)
            if constraint is not None:
                indexes.append(constraint)
                continue
        col, col_indexes = _parse_column_def(defn)
        columns.append(col)
        indexes.extend(col_indexes)

    pk = [ix for ix in indexes if ix.kind == "primary_key"]
    if len(pk) > 1:
        raise InvalidArgumentError("multiple primary keys")
    if not pk:
        # ≙ reference: src/sql/shared.rs:156-158 — primary key mandatory.
        raise InvalidArgumentError(f"table {name} has no primary key")
    by_name = {c.name: c for c in columns}
    for ix in indexes:
        for c in ix.columns:
            if c not in by_name:
                raise InvalidArgumentError(f"index column {c} not in table")
    for c in pk[0].columns:
        by_name[c].nullable = False

    desc = TableDescriptor(name=name, columns=columns, indexes=indexes)
    return ParsedCreateTable(name=name, if_not_exists=if_not_exists, descriptor=desc)


# ---------------------------------------------------------------------------
# INSERT
# ---------------------------------------------------------------------------
@dataclass
class ParsedInsert:
    table: str
    columns: list[str] | None
    values_sql: str | None  # "(...), (...)" literal rows
    select_sql: str | None


_INSERT_RE = re.compile(
    r"insert\s+into\s+([A-Za-z_][\w$.]*)\s*(\(([^)]*)\))?\s*(values\s*(.*)|select\b.*|with\b.*)$",
    re.IGNORECASE | re.DOTALL,
)


def parse_insert(stmt: str) -> ParsedInsert:
    s = stmt.strip()
    if re.search(r"\bon\s+conflict\b", s, re.IGNORECASE):
        # ≙ reference: src/sql/plan/table.rs:195-197 — ON CONFLICT rejected.
        raise UnsupportedError("ON CONFLICT is not supported")
    if re.match(r"insert\s+overwrite\b", s, re.IGNORECASE):
        raise UnsupportedError("INSERT OVERWRITE is not supported")
    m = _INSERT_RE.match(s)
    if not m:
        raise InvalidArgumentError(f"malformed INSERT: {stmt}")
    table = fold_ident(m.group(1))
    columns = (
        [fold_ident(c.strip()) for c in m.group(3).split(",")] if m.group(3) else None
    )
    tail = m.group(4)
    if tail.lower().startswith("values"):
        values = (m.group(5) or "").strip()
        if not values:
            raise InvalidArgumentError("INSERT ... VALUES requires at least one row")
        return ParsedInsert(table, columns, values, None)
    return ParsedInsert(table, columns, None, tail)


# ---------------------------------------------------------------------------
# dialect normalization for the query path
# ---------------------------------------------------------------------------
_CAST_RE = re.compile(
    r"::\s*([A-Za-z_][A-Za-z0-9_ ]*?)\s*(?=[,)\s;]|$)"
)



# ---------------------------------------------------------------------------
# string-literal masking: dialect rewrites must never touch the inside
# of '...' literals (e.g. SELECT 'a::b', or a literal containing the
# words ORDER BY)
# ---------------------------------------------------------------------------
_LITERAL_RE = re.compile(r"'(?:[^']|'')*'")


def _mask_literals(sql: str) -> tuple[str, list[str]]:
    literals: list[str] = []

    def stash(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"'\x01{len(literals) - 1}\x01'"

    return _LITERAL_RE.sub(stash, sql), literals


def _unmask_literals(sql: str, literals: list[str]) -> str:
    return re.sub(
        r"'\x01(\d+)\x01'", lambda m: literals[int(m.group(1))], sql
    )


def _sub_outside_literals(pattern: str, repl, sql: str, flags=0) -> str:
    masked, lits = _mask_literals(sql)
    return _unmask_literals(re.sub(pattern, repl, masked, flags=flags), lits)


# Postgres type name → Spark SQL type name (for :: cast rewriting).
_PG_TO_SPARK_TYPE = {
    "text": "string",
    "varchar": "string",
    "character varying": "string",
    "bytea": "binary",
    "int2": "smallint",
    "int4": "int",
    "int8": "bigint",
    "integer": "int",
    "float4": "float",
    "float8": "double",
    "real": "float",
    "double precision": "double",
    "bool": "boolean",
}


def _spark_type_name(pg_name: str) -> str:
    n = " ".join(pg_name.strip().lower().split())
    base = n.split("(")[0].strip()
    return _PG_TO_SPARK_TYPE.get(base, base)


def rewrite_pg_casts(sql: str) -> str:
    """Rewrite the simple-operand forms of ``expr::type``
    (literal / identifier / parenthesized / function call) into
    CAST(expr AS type), mapping Postgres type names to Spark's."""
    out = sql
    pattern = re.compile(
        r"((?:'[^']*')|(?:\b\d+(?:\.\d+)?\b)|(?:[A-Za-z_][\w$.]*\s*\([^()]*\))|(?:[A-Za-z_][\w$.]*)|(?:\([^()]*\)))"
        r"\s*::\s*"
        r"(double\s+precision|character\s+varying(?:\(\d+\))?|[A-Za-z_]\w*(?:\(\d+\))?)",
        re.IGNORECASE,
    )

    def repl(m: re.Match) -> str:
        return f"CAST({m.group(1)} AS {_spark_type_name(m.group(2))})"

    masked, lits = _mask_literals(out)
    while True:
        new = pattern.sub(repl, masked)
        if new == masked:
            return _unmask_literals(masked, lits)
        masked = new


def append_pg_null_ordering(sql: str) -> str:
    """Make Postgres' default NULL placement explicit (NULLS LAST on
    ASC, NULLS FIRST on DESC — Spark defaults are the opposite).
    Rewrites the outermost ORDER BY only, skipping items that already
    specify NULLS."""
    sql, _literals = _mask_literals(sql)
    low = sql.lower()
    idx, depth, pos = -1, 0, 0
    while pos < len(sql) - 7:
        ch = sql[pos]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and low.startswith("order by", pos):
            idx = pos
        pos += 1
    if idx < 0:
        return _unmask_literals(sql, _literals)
    head = sql[:idx]
    clause = sql[idx + len("order by"):]
    # terminate at top-level LIMIT/OFFSET/FETCH
    tail = ""
    m = re.search(r"\b(limit|offset|fetch)\b", clause, re.IGNORECASE)
    if m:
        tail = clause[m.start():]
        clause = clause[: m.start()]
    items = _split_top_level(clause)
    fixed = []
    for item in items:
        il = item.lower()
        if "nulls" in il:
            fixed.append(item)
        elif re.search(r"\bdesc\b", il):
            fixed.append(item + " NULLS FIRST")
        else:
            fixed.append(item + " NULLS LAST")
    return _unmask_literals(
        head + "ORDER BY " + ", ".join(fixed) + (" " + tail if tail else ""),
        _literals,
    )


_QUALIFIED_RE = re.compile(r"\b([A-Za-z_]\w*)\.public\.([A-Za-z_]\w*)", re.IGNORECASE)


def qualified_databases(sql: str) -> set[str]:
    """Database names referenced via 3-part ``db.public.table`` names —
    the engine validates their existence before planning (unknown-db
    error parity with the reference's per-session resolver)."""
    masked, _ = _mask_literals(sql)
    return {fold_ident(m.group(1)) for m in _QUALIFIED_RE.finditer(masked)}


def mangle_view_name(database: str, table: str) -> str:
    """Temp-view name for a (database, table) pair. Spark temp views are
    single-level, so 3-part names rewrite to this mangled form (Spark's
    view resolution is case-insensitive, matching folded idents)."""
    return f"{database}__public__{table}"


def normalize_query(sql: str, database: str, user: str) -> str:
    """Postgres-isms → Spark SQL + session-function substitution
    (≙ the reference's session UDFs A12-A15,
    reference: src/sql/postgresql/functions/mod.rs:32-193).

    Also resolves the reference's 3-level naming
    (catalog(database).schema.table, default schema "public" —
    reference: src/sql/context.rs:47-49): ``db.public.t`` rewrites to
    the mangled cross-database view name; ``public.t`` collapses to the
    bare temp-view name of the session database."""
    out = rewrite_pg_casts(sql)
    out = _sub_outside_literals(
        r"\b([A-Za-z_]\w*)\.public\.([A-Za-z_]\w*)",
        lambda m: mangle_view_name(fold_ident(m.group(1)), fold_ident(m.group(2))),
        out,
        flags=re.IGNORECASE,
    )
    out = _sub_outside_literals(r"\bpublic\.([A-Za-z_]\w*)", r"\1", out)
    out = _sub_outside_literals(
        r"\b(current_catalog|current_database\s*\(\s*\))", f"'{database}'", out,
        flags=re.IGNORECASE,
    )
    out = _sub_outside_literals(
        r"\bcurrent_schema\s*(\(\s*\))?", "'public'", out, flags=re.IGNORECASE
    )
    out = _sub_outside_literals(
        r"\b(current_user|current_role|session_user)\b", f"'{user}'", out,
        flags=re.IGNORECASE,
    )
    out = _sub_outside_literals(
        r"\binet_client_port\s*\(\s*\)", "0", out, flags=re.IGNORECASE
    )  # non-socket session (reference: src/sql/mod.rs:270-274)
    out = append_pg_null_ordering(out)
    return out
