"""Operator surface: relational (SURVEY.md §2.B) + LLM-pipeline extensions.

Importing this package populates the query registry used by
``__spark_entry__.queries()`` / ``oracle_sql()``.
"""

from . import dedup, events, multimodal, pipeline, relational, similarity, text  # noqa: F401
from .registry import ORACLE_SQL, QUERIES

__all__ = ["QUERIES", "ORACLE_SQL"]
