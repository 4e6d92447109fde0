"""seamdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kezhuw/seamdb.

The reference (at /root/reference, Rust) is a distributed KV store with a
PostgreSQL-dialect SQL layer delegated to Apache DataFusion
(reference: src/sql/mod.rs:27-36,84). This package reproduces the
query-visible surface Spark-first:

- ``engine``     — SQL entry point (single-statement, Postgres-dialect
                   normalization, session functions) ≙ PostgreSqlExecutor
- ``catalog``    — metastore (databases/schemas/tables, serial counters,
                   unique-index declarations) ≙ the KV-backed ``_databases``
                   catalog table (reference: src/sql/client.rs:445-564)
- ``snapshots``  — versioned parquet table snapshots with atomic manifest
                   swap ≙ per-statement snapshot isolation
                   (reference: src/kv.rs:110-115 KvSemantics)
- ``ddl`` / ``dml`` — CREATE/DROP DATABASE|TABLE, INSERT with serial
                   assignment + unique enforcement
                   (reference: src/sql/plan/{create_table,drop_table,
                   catalog,insert}.rs)
- ``operators``  — the relational operator surface (SURVEY.md §2.B) plus
                   LLM-data-pipeline extensions (dedup, similarity search,
                   text analysis, multimodal)
- ``streaming``  — Structured Streaming over the events table (extension;
                   the reference has no streaming surface)
"""

__version__ = "0.1.0"

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
