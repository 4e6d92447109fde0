"""Cross-engine deterministic rounding.

Spark's ``F.round`` on DoubleType rounds the *decimal string* rendering
(BigDecimal.valueOf → HALF_UP), while DuckDB's ``round`` rounds the
*binary* double (half away from zero on the scaled value). On boundary
values (e.g. a double storing 152741.23499999998 printed as
"152741.235") the two differ by one ulp of the last kept digit, which
breaks oracle hash-parity.

``dround`` reproduces DuckDB's semantics in Spark expressions:
``sign(x) * floor(abs(x) * 10^n + 0.5) / 10^n`` — floor/abs/sign are
pure IEEE ops, so for identical double inputs the result is
bit-identical across engines. Use this instead of ``F.round`` whenever
the column is compared against a DuckDB oracle.

Contract: bit-equality with DuckDB ROUND is guaranteed for
``|x| * 10^n < 2^52`` — far above every oracle-compared value in this
repo (max ~1e12 scaled). Beyond that, double spacing exceeds the
rounding granularity and DuckDB's platform-specific arithmetic takes
over (hypothesis found several regimes); dround degrades gracefully to
``scaled / p`` there rather than corrupting odd integers via the
``+ 0.5`` ties-to-even trap.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TWO_52 = float(2**52)


def dround(col: Column | str, scale: int = 0) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("double")
    p = F.lit(float(10**scale))
    scaled = F.abs(c) * p
    rounded = F.floor(scaled + F.lit(0.5)) / p
    return F.signum(c) * F.when(scaled >= F.lit(_TWO_52), scaled / p).otherwise(rounded)
