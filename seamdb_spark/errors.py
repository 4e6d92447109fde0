"""Error taxonomy mirroring the reference's SqlError
(reference: src/sql/error.rs:26-60) and its "unsupported" rejections
(reference: src/sql/mod.rs:104-128, src/sql/postgresql/mod.rs:133-141,
192-235, 252-263).
"""

from __future__ import annotations


class SqlError(Exception):
    """Base for all engine errors."""


class UnsupportedError(SqlError):
    """Statement/feature the engine intentionally rejects
    (≙ SqlError::unsupported)."""


class InvalidArgumentError(SqlError):
    """Malformed statement / bad value (≙ SqlError::invalid)."""


class DatabaseNotFoundError(SqlError):
    pass


class TableNotFoundError(SqlError):
    pass


class TableAlreadyExistsError(SqlError):
    pass


class DatabaseAlreadyExistsError(SqlError):
    pass


class UniqueIndexError(SqlError):
    """Unique constraint violation
    (≙ SqlError::UniqueIndexAlreadyExists, enforced at insert —
    reference: src/sql/client.rs:67-80 put-if-absent)."""


class TypeMismatchError(SqlError):
    """Inserted value's type does not match the column type
    (reference: src/sql/client.rs:247-264)."""


class NullViolationError(SqlError):
    """NULL into a NOT NULL column (reference: src/sql/client.rs:253-256)."""


class SerialOverflowError(SqlError):
    """Serial counter exceeded the column type's range
    (reference: src/sql/client.rs:276-307)."""
