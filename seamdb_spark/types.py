"""The reference's 8-type SQL type system → Spark types.

ColumnTypeKind (reference: src/protos/protos/sql.proto:68-77) admits
exactly: Boolean, Int16, Int32, Int64, Float32, Float64, Bytes, String.
DDL type-name acceptance mirrors reference:
src/sql/postgresql/mod.rs:149-183 (including the serial variants, which
set a serial flag on the underlying int kind).

``varchar(n)`` stores the declared length as metadata only — the
reference does not enforce it at insert (src/sql/client.rs:247-264
validates only nullability and type kind), and neither do we.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# DDL name → (kind, serial)
_DDL_TYPES: dict[str, tuple[str, bool]] = {
    "boolean": ("boolean", False),
    "bool": ("boolean", False),
    "smallint": ("int16", False),
    "int2": ("int16", False),
    "int": ("int32", False),
    "int4": ("int32", False),
    "integer": ("int32", False),
    "bigint": ("int64", False),
    "int8": ("int64", False),
    "real": ("float32", False),
    "float4": ("float32", False),
    "double precision": ("float64", False),
    "float8": ("float64", False),
    "bytea": ("bytes", False),
    "text": ("string", False),
    "varchar": ("string", False),
    "character varying": ("string", False),
    "smallserial": ("int16", True),
    "serial2": ("int16", True),
    "serial": ("int32", True),
    "serial4": ("int32", True),
    "bigserial": ("int64", True),
    "serial8": ("int64", True),
}

_SPARK_TYPES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}

SERIAL_MAX = {"int16": 2**15 - 1, "int32": 2**31 - 1, "int64": 2**63 - 1}


def parse_ddl_type(name: str) -> tuple[str, bool, int | None]:
    """DDL type name → (kind, serial, varchar_len). Raises KeyError if
    the type is not one the reference accepts."""
    n = " ".join(name.strip().lower().split())
    varchar_len = None
    if n.startswith(("varchar(", "character varying(")):
        base, _, rest = n.partition("(")
        varchar_len = int(rest.rstrip(")").strip())
        n = base.strip()
    kind, serial = _DDL_TYPES[n]
    return kind, serial, varchar_len


def spark_type(kind: str) -> T.DataType:
    return _SPARK_TYPES[kind]


@dataclass
class ColumnDescriptor:
    """≙ ColumnDescriptor (reference: src/protos/protos/sql.proto:121-129)."""

    name: str
    kind: str
    nullable: bool = True
    serial: bool = False
    varchar_len: int | None = None

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "kind": self.kind,
            "nullable": self.nullable,
            "serial": self.serial,
            "varchar_len": self.varchar_len,
        }

    @classmethod
    def from_json(cls, d: dict) -> ColumnDescriptor:
        return cls(**d)


@dataclass
class IndexDescriptor:
    """≙ IndexDescriptor; kind ∈ {primary_key, unique_nulls_distinct,
    unique_nulls_not_distinct} (reference: src/protos/protos/sql.proto:
    131-136; kind mapping src/sql/shared.rs:122-135). Non-unique
    secondary indexes are meaningless on Spark (scans are the access
    path) and not persisted."""

    kind: str
    columns: list[str]

    def to_json(self) -> dict:
        return {"kind": self.kind, "columns": self.columns}

    @classmethod
    def from_json(cls, d: dict) -> IndexDescriptor:
        return cls(**d)


@dataclass
class TableDescriptor:
    """≙ TableDescriptor (reference: src/protos/protos/sql.proto:47-61).
    A primary key is mandatory (reference: src/sql/shared.rs:156-158)."""

    name: str
    columns: list[ColumnDescriptor]
    indexes: list[IndexDescriptor] = field(default_factory=list)

    @property
    def primary_key(self) -> IndexDescriptor:
        for ix in self.indexes:
            if ix.kind == "primary_key":
                return ix
        raise ValueError(f"table {self.name} has no primary key")

    def column(self, name: str) -> ColumnDescriptor:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(c.name, spark_type(c.kind), c.nullable)
                for c in self.columns
            ]
        )

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "columns": [c.to_json() for c in self.columns],
            "indexes": [i.to_json() for i in self.indexes],
        }

    @classmethod
    def from_json(cls, d: dict) -> TableDescriptor:
        return cls(
            name=d["name"],
            columns=[ColumnDescriptor.from_json(c) for c in d["columns"]],
            indexes=[IndexDescriptor.from_json(i) for i in d["indexes"]],
        )
