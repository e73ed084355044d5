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
4. convert the exact sum to DOUBLE through exactly ONE correctly-
   rounded conversion on each engine: Spark's decimal->double cast is
   BigDecimal.doubleValue (correctly rounded at every magnitude); the
   oracle routes through VARCHAR — ``CAST(CAST(sum AS VARCHAR) AS
   DOUBLE)`` — because DuckDB's *direct* decimal->double cast is
   two-step (hugeint conversion then scale multiply) and drifts 1 ulp
   above ~2^53/10^scale, while its string->double parse is correctly
   rounded. Two correctly-rounded conversions of the same exact
   decimal are bit-identical, so the comparison is exact at ALL
   magnitudes.

Earlier rounds instead cast directly and re-quantized both sides with
a shared ROUND(…,6). Round-4 measurement (tests/test_numeric_policy.py)
showed that formulation breaks far below its documented ~2^53/10^scale
bound: DuckDB evaluates ROUND(x, 6) on doubles as a multiply/round/
divide through x*1e6, which is inexact once x*1e6 exceeds 2^53 —
ROUND(600030003333.0, 6) returns 600030003332.9999 — so sums above
~9e9 could hash-mismatch even though both casts were still exact. The
string-roundtrip formulation has no such cliff and needs no final
ROUND at all; output values are unchanged wherever the old ROUND was
identity (every catalog sum at the driver's SFs, where true decimal
precision <= s <= 6 digits and sums sit far below 2^53).

Returning DecimalType here would be a trap: Spark->pandas yields Python
``Decimal`` objects while DuckDB->pandas yields float64, so
dtype-sensitive hashers flag equal values as different.

AVG keeps double arithmetic but rounds to 6 decimals: the cross-order
error of a double mean is ~1e-12 relative, vastly below the 1e-6 grain
(and catalog means stay small enough that DuckDB's ROUND stays exact).

The same expressions are emitted in SQL for the oracle via
``sql_dsum`` / ``sql_ravg``.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

__all__ = [
    "dsum",
    "ravg",
    "sql_dsum",
    "sql_ravg",
    "double_array_lit",
    "double_matrix_lit",
]


def _double_sql(x: float) -> str:
    # repr() is Python's shortest round-trip rendering and Spark's
    # string->double cast is correctly rounded, so the parsed double is
    # bit-identical to x (including -0.0 and subnormals; non-finite
    # values are routed to the fallback paths below).
    return f"CAST('{x!r}' AS DOUBLE)"


def double_array_lit(values: Iterable[float]) -> Column:
    """A literal ``array<double>`` built as ONE ``F.expr`` call.

    ``F.lit(list)`` / ``F.array(*[F.lit(x) ...])`` issue one py4j
    round-trip per element — measured ~0.8 s of pure driver time for a
    10x64 matrix, paid per plan construction (round 12, guide §1.2:
    per-invocation plan cost is real cost in iterative loops and
    anchor loops). Rendering the values into a single SQL expression
    string moves the whole build into one JVM parse (~ms), with
    bit-identical doubles via repr round-trip.
    """
    vals = [float(x) for x in values]
    if not vals or not all(math.isfinite(v) for v in vals):
        return F.array(*[F.lit(v) for v in vals]).cast("array<double>")
    return F.expr("array(" + ",".join(_double_sql(v) for v in vals) + ")")


def double_matrix_lit(rows: Sequence[Sequence[float]]) -> Column:
    """A literal ``array<array<double>>`` in ONE ``F.expr`` call —
    the k x dim centroid-matrix form of :func:`double_array_lit`."""
    mat = [[float(x) for x in r] for r in rows]
    if not mat or not all(math.isfinite(v) for r in mat for v in r):
        # cast pins the schema for the EMPTY fallback too — a bare
        # F.lit([]) is array<null>, inconsistent with the 1-D variant
        # (round-13 advice fix; unreachable for current callers)
        return F.lit(mat).cast("array<array<double>>")
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_double_sql(v) for v in r) + ")" for r in mat
        )
        + ")"
    )


def dsum(expr: Column, alias: str, scale: int = 4) -> Column:
    """Order-insensitive exact sum of a double expression (see module doc)."""
    return (
        F.sum(expr.cast(DecimalType(18, scale))).cast("double").alias(alias)
    )


def ravg(expr: Column, alias: str, digits: int = 6) -> Column:
    """Cross-engine-stable mean of a double expression."""
    return F.round(F.avg(expr), digits).alias(alias)


def sql_dexpr(expr_sql: str, scale: int = 4) -> str:
    """Alias-free DuckDB decimal-sum -> double EXPRESSION (composable
    into larger formulas — ratios, CTE columns). The VARCHAR hop
    forces DuckDB's correctly-rounded string->double parse instead of
    its drifting direct decimal->double cast; every oracle needing the
    conversion must route through here (round-9 review found two
    hand-inlined copies in the Q17/Q22 oracles — a policy change must
    have ONE place to land)."""
    return (
        f"CAST(CAST(SUM(CAST(({expr_sql}) AS DECIMAL(18,{scale}))) "
        f"AS VARCHAR) AS DOUBLE)"
    )


def sql_dsum(expr_sql: str, alias: str, scale: int = 4) -> str:
    """DuckDB SQL emitting the identical decimal-sum as :func:`dsum`."""
    return f"{sql_dexpr(expr_sql, scale)} AS {alias}"


def sql_ravg(expr_sql: str, alias: str, digits: int = 6) -> str:
    """DuckDB SQL emitting the identical rounded mean as :func:`ravg`."""
    return f"ROUND(AVG({expr_sql}), {digits}) AS {alias}"
