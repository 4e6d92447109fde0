"""INSERT execution: validation, serial assignment, unique enforcement,
snapshot append.

≙ the reference's InsertExec + prefill_row + insert_rows_once
(reference: src/sql/plan/insert.rs:55-247, src/sql/client.rs:247-313):
- defaults/NULL handling and type/nullability validation
  (client.rs:247-264),
- serial ids allocated from the metastore counter
  (≙ KV increment, client.rs:276-307),
- uniqueness enforced per index with NULLS [NOT] DISTINCT semantics
  (≙ put-if-absent key construction, src/sql/row.rs:89-109; e2e tests
  src/sql/mod.rs:277-426),
- returns a single-row ``count`` result (insert.rs:50-53,232-234).

Spark-first: uniqueness = in-batch groupBy duplicate check + anti-join
against the current snapshot — both distributed, no driver loop. The
whole statement commits atomically via the snapshot manifest swap; a
constraint violation aborts before any manifest change.

Scale notes (100 TB): the existing-side join prunes to the index
columns only (column pruning at the parquet scan); for huge tables this
is the documented bucketed-index design — bucket the snapshot by the
unique key so the anti-join co-locates without a full shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .catalog import Metastore
from .errors import NullViolationError, TypeMismatchError, UniqueIndexError
from .snapshots import TableSnapshots
from .types import TableDescriptor, spark_type

_KIND_FAMILY = {
    "boolean": "bool",
    "int16": "num",
    "int32": "num",
    "int64": "num",
    "float32": "num",
    "float64": "num",
    "bytes": "bytes",
    "string": "str",
}

_SPARK_FAMILY = {
    "boolean": "bool",
    "tinyint": "num",
    "smallint": "num",
    "int": "num",
    "bigint": "num",
    "float": "num",
    "double": "num",
    "decimal": "num",
    "binary": "bytes",
    "string": "str",
    "void": "null",
}


def _family_of_spark(dt: str) -> str:
    base = dt.split("(")[0]
    return _SPARK_FAMILY.get(base, base)


def align_and_validate(
    df: DataFrame,
    desc: TableDescriptor,
    insert_columns: list[str] | None,
) -> DataFrame:
    """Map positional/named input columns onto the table schema, fill
    unmentioned columns with NULL, check type-kind compatibility, cast."""
    target_cols = [c.name for c in desc.columns]
    names = insert_columns if insert_columns is not None else target_cols
    if len(df.columns) != len(names):
        raise TypeMismatchError(
            f"INSERT has {len(df.columns)} expressions but {len(names)} target columns"
        )
    for n in names:
        desc.column(n)  # raises KeyError → surfaced by engine
    renamed = df.toDF(*names)

    exprs = []
    for col in desc.columns:
        if col.name in names:
            src_type = dict(renamed.dtypes)[col.name]
            src_fam = _family_of_spark(src_type)
            dst_fam = _KIND_FAMILY[col.kind]
            if src_fam not in (dst_fam, "null"):
                raise TypeMismatchError(
                    f"column {col.name}: cannot insert {src_type} into {col.kind}"
                )
            exprs.append(
                F.col(col.name).cast(spark_type(col.kind)).alias(col.name)
            )
        else:
            exprs.append(
                F.lit(None).cast(spark_type(col.kind)).alias(col.name)
            )
    return renamed.select(*exprs)


def assign_serials(
    df: DataFrame,
    desc: TableDescriptor,
    store: Metastore,
    database: str,
    insert_columns: list[str] | None,
) -> DataFrame:
    """Fill serial columns OMITTED from the insert column list with
    consecutive counter values (one metastore allocation per statement,
    ≙ per-row KV increment batched; reference: src/sql/client.rs:276-307).

    Matching the reference's ``prefill_row`` (src/sql/client.rs:247-264):
    a serial is assigned only when the column is absent from the row;
    an explicit NULL flows through to the nullability check and is
    rejected there for non-nullable serials.

    Scale path, all JVM-side (no .rdd round-trip through Python): a
    dense row number is derived from ``monotonically_increasing_id`` —
    consecutive within each partition by construction — plus
    per-partition offsets from one tiny aggregation (#partitions rows to
    the driver). No global sort, no single partition (a row_number()
    window over the whole batch would collapse an INSERT..SELECT of
    billions of rows onto one task).
    """
    names = (
        insert_columns if insert_columns is not None else [c.name for c in desc.columns]
    )
    fill_cols = [c for c in desc.columns if c.serial and c.name not in names]
    if not fill_cols:
        return df
    spark = df.sparkSession
    # Pin the batch so the offsets job and the fill job see the same
    # partition layout and row order.
    with_idx = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    stats = (
        with_idx.groupBy("__pid")
        .agg(F.count("*").alias("__cnt"), F.min("__mid").alias("__mn"))
        .collect()
    )
    offsets, acc = [], 0
    for r in sorted(stats, key=lambda r: r["__pid"]):
        offsets.append((r["__pid"], r["__mn"], acc))
        acc += r["__cnt"]
    n = acc
    if n == 0:
        return df
    odf = spark.createDataFrame(
        offsets,
        T.StructType(
            [
                T.StructField("__pid", T.IntegerType(), False),
                T.StructField("__mn", T.LongType(), False),
                T.StructField("__off", T.LongType(), False),
            ]
        ),
    )
    out = with_idx.join(F.broadcast(odf), "__pid").withColumn(
        "__rn", F.col("__off") + (F.col("__mid") - F.col("__mn")) + 1
    )
    for c in fill_cols:
        ids = store.next_serial(database, desc.name, c.name, c.kind, count=n)
        base = ids[0] - 1
        out = out.withColumn(
            c.name, (F.lit(base) + F.col("__rn")).cast(spark_type(c.kind))
        )
    return out.drop("__pid", "__mid", "__mn", "__off", "__rn")


def check_nullability(df: DataFrame, desc: TableDescriptor) -> None:
    """≙ reference: src/sql/client.rs:253-256."""
    non_nullable = [c.name for c in desc.columns if not c.nullable]
    if not non_nullable:
        return
    cond = None
    for name in non_nullable:
        c = F.col(name).isNull()
        cond = c if cond is None else cond | c
    bad = df.filter(cond).limit(1).collect()
    if bad:
        row = bad[0]
        for name in non_nullable:
            if row[name] is None:
                raise NullViolationError(f"null value in non-null column {name}")


def check_unique(
    new_rows: DataFrame, existing: DataFrame, desc: TableDescriptor
) -> None:
    """Enforce every unique index (incl. PK) with NULLS [NOT] DISTINCT
    semantics (≙ reference: src/sql/row.rs:89-109 key construction;
    tests src/sql/mod.rs:277-426):

    - nulls_distinct: rows with any NULL key column never conflict;
    - nulls_not_distinct: NULLs compare equal (conflict).
    """
    for ix in desc.indexes:
        if ix.kind not in ("primary_key", "unique_nulls_distinct", "unique_nulls_not_distinct"):
            continue
        nulls_conflict = ix.kind == "unique_nulls_not_distinct"
        cols = ix.columns

        batch = new_rows.select(*cols)
        if not nulls_conflict:
            cond = None
            for c in cols:
                nn = F.col(c).isNotNull()
                cond = nn if cond is None else cond & nn
            batch = batch.filter(cond)
        # in-batch duplicates (groupBy treats NULLs as equal, which is
        # exactly nulls_not_distinct; nulls_distinct filtered them out)
        dup = batch.groupBy(*cols).count().filter(F.col("count") > 1).limit(1).collect()
        if dup:
            raise UniqueIndexError(
                f"duplicate key value violates unique constraint on ({', '.join(cols)})"
            )
        # against the existing snapshot
        if nulls_conflict:
            join_cond = [batch[c].eqNullSafe(existing[c]) for c in cols]
        else:
            join_cond = [batch[c] == existing[c] for c in cols]
        cond_expr = join_cond[0]
        for jc in join_cond[1:]:
            cond_expr = cond_expr & jc
        clash = batch.join(existing.select(*cols), cond_expr, "left_semi").limit(1).collect()
        if clash:
            raise UniqueIndexError(
                f"duplicate key value violates unique constraint on ({', '.join(cols)})"
            )


def execute_insert(
    input_df: DataFrame,
    desc: TableDescriptor,
    insert_columns: list[str] | None,
    store: Metastore,
    database: str,
    snapshots: TableSnapshots,
) -> int:
    """Full insert pipeline; returns affected-row count."""
    spark = input_df.sparkSession
    aligned = align_and_validate(input_df, desc, insert_columns)
    filled = assign_serials(aligned, desc, store, database, insert_columns)
    # Materialize once: serial assignment + the multiple validation
    # passes below must see one deterministic batch.
    filled = filled.cache()
    try:
        count = filled.count()
        check_nullability(filled, desc)
        existing = snapshots.read(spark, desc.spark_schema())
        check_unique(filled, existing, desc)
        snapshots.commit(filled, mode="append")
    finally:
        filled.unpersist()
    return count
