"""Cross-engine-stable numeric aggregation helpers.

Floating-point SUM is order-dependent; Spark and the DuckDB oracle
aggregate in different orders, so hash-comparing raw double sums is
flaky. The stable pattern used across the catalog:

1. compute the per-row expression in DOUBLE (deterministic IEEE ops —
   identical bit-for-bit in both engines for the same expression),
2. CAST each row's result to DECIMAL(18, s) where s >= the *true
   decimal precision* of the expression (e.g. 2-decimal money times two
   2-decimal factors has 6 true decimals -> s=6). When s covers the true
   precision, the scaled value sits within ~1e-5 of an integer and both
   engines round it identically; when it does not, true decimal
   midpoints appear and Spark (HALF_UP) vs DuckDB (half-even) diverge,
3. SUM the decimals — exact integer arithmetic, order-insensitive,
4. CAST the exact sum to DOUBLE as the *output* type, then ROUND to a
   fixed 6-decimal grain on BOTH sides. The cast alone is only
   bit-identical while the scaled integer sum fits in 2^53: Spark's
   BigDecimal->double is a single correctly-rounded conversion, but
   DuckDB converts the hugeint-backed decimal and divides by 10^scale
   (two roundings), so above ~2^53/10^scale (~9e11 at scale 4) the
   engines can differ by 1 ulp. The shared ROUND re-quantizes both
   results through the identical decimal grain; for sums large enough
   that 1 ulp exceeds the grain the residual risk is a straddled
   rounding boundary (~ulp/grain probability) — at the driver's SFs the
   sums stay far below the 2^53 bound and the cast is already exact.
   Returning DecimalType here is a trap: Spark->pandas yields Python
   ``Decimal`` objects while DuckDB->pandas yields float64, so
   dtype-sensitive hashers flag equal values as different.

AVG keeps double arithmetic but rounds to 6 decimals: the cross-order
error of a double mean is ~1e-12 relative, vastly below the 1e-6 grain.

The same expressions are emitted in SQL for the oracle via
``sql_dsum`` / ``sql_ravg``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

__all__ = ["dsum", "ravg", "sql_dsum", "sql_ravg"]


def dsum(expr: Column, alias: str, scale: int = 4, digits: int = 6) -> Column:
    """Order-insensitive exact sum of a double expression (see module doc)."""
    return (
        F.round(F.sum(expr.cast(DecimalType(18, scale))).cast("double"), digits)
        .alias(alias)
    )


def ravg(expr: Column, alias: str, digits: int = 6) -> Column:
    """Cross-engine-stable mean of a double expression."""
    return F.round(F.avg(expr), digits).alias(alias)


def sql_dsum(expr_sql: str, alias: str, scale: int = 4, digits: int = 6) -> str:
    """DuckDB SQL emitting the identical decimal-sum as :func:`dsum`."""
    return (
        f"ROUND(CAST(SUM(CAST(({expr_sql}) AS DECIMAL(18,{scale}))) "
        f"AS DOUBLE), {digits}) AS {alias}"
    )


def sql_ravg(expr_sql: str, alias: str, digits: int = 6) -> str:
    """DuckDB SQL emitting the identical rounded mean as :func:`ravg`."""
    return f"ROUND(AVG({expr_sql}), {digits}) AS {alias}"
