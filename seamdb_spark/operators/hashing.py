"""Cross-engine deterministic hashing helpers.

MinHash / SimHash / fingerprinting need an integer hash that is
*bit-identical* in Spark and in the DuckDB oracle. Engine-native hashes
(Spark murmur3 ``F.hash``, DuckDB ``hash()``) differ, so we derive a
32-bit integer from the first 8 hex chars of ``md5`` — both engines
expose md5 as a lowercase hex string — via positional hex-digit
arithmetic (``conv`` on the Spark side, ``strpos`` arithmetic on the
DuckDB side).

Universal-hash family for MinHash: h_j(x) = (a_j * x + b_j) mod P with
P prime > 2^32 and a_j < 2^30 so a*x never overflows int64 in either
engine (DuckDB raises on BIGINT overflow; Spark wraps silently).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Prime > 2^32 (same constant both engines).
MINHASH_PRIME = 4294967311

# (a, b) pairs — fixed, arbitrary primes; a < 2^30 to avoid int64 overflow.
MINHASH_PARAMS: list[tuple[int, int]] = [
    (973078513, 433494437),
    (910111237, 193877777),
    (805306457, 362436069),
    (741103597, 521288629),
    (688846501, 886459393),
    (611603,    97755331),
    (536870909, 13466917),
    (479001599, 257885161),
]

N_BANDS = 4
ROWS_PER_BAND = 2
assert N_BANDS * ROWS_PER_BAND == len(MINHASH_PARAMS)

_HEX_DIGITS = "0123456789abcdef"


def md5_prefix_long(col: Column) -> Column:
    """Spark: first 8 hex chars of md5 as a non-negative int64 (< 2^32)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def md5_prefix_long_sql(expr: str) -> str:
    """DuckDB SQL for the same 32-bit value as :func:`md5_prefix_long`.

    ``conv`` does not exist in DuckDB 1.0, so expand the hex parse into
    positional strpos arithmetic over the md5 hex string.
    """
    terms = []
    for i in range(8):
        weight = 16 ** (7 - i)
        terms.append(
            f"(strpos('{_HEX_DIGITS}', substr(md5({expr}), {i + 1}, 1)) - 1)"
            f" * CAST({weight} AS BIGINT)"
        )
    return "(" + " + ".join(terms) + ")"


def minhash_value(hash_col: Column, a: int, b: int) -> Column:
    return (F.lit(a) * hash_col + F.lit(b)) % F.lit(MINHASH_PRIME)


def minhash_value_sql(hash_expr: str, a: int, b: int) -> str:
    return f"((CAST({a} AS BIGINT) * {hash_expr} + {b}) % {MINHASH_PRIME})"
