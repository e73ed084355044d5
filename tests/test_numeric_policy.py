"""Magnitude stress test for the dsum cross-engine policy
(functions/numeric.py): each engine performs exactly ONE correctly-
rounded decimal->double conversion — Spark via its BigDecimal cast,
the DuckDB oracle via a VARCHAR hop (its direct decimal->double cast
drifts 1 ulp near 2^53, and the earlier shared-ROUND(…,6) formulation
broke even sooner because DuckDB's ROUND multiplies through x*1e6).
Two correctly-rounded conversions of the same exact decimal are
bit-identical at any magnitude; this synthesizes scaled sums far above
2^53 — where the OLD formulation measurably diverged — and asserts
Spark dsum == DuckDB sql_dsum bit-for-bit."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from rabbithole_spark.functions.numeric import dsum, sql_dsum

# v_i = 9e7 + (i % 10000) * 1e-4: true decimal precision 4; over
# N=20000 rows the scale-4 scaled integer sum is ~1.8e16 > 2^53.
_N = 20000
_EXPR = "90000000.0 + (CAST(i % 10000 AS DOUBLE) * 0.0001)"


def test_dsum_beyond_2_53_matches_oracle(spark):
    sdf = spark.range(_N).select(
        F.expr(_EXPR.replace("i", "id")).alias("v")
    )
    got = sdf.agg(dsum(F.col("v"), "s", 4)).collect()[0]["s"]
    # sanity: the scaled sum really exceeds the 2^53 exact-double bound
    assert got * 10**4 > 2**53
    want = duckdb.sql(
        f"SELECT {sql_dsum('v', 's', 4)} FROM ("
        f"  SELECT {_EXPR} AS v"
        f"  FROM (SELECT unnest(range({_N})) AS i))"
    ).fetchone()[0]
    assert got == want, (got, want, got - want)


def test_dsum_grouped_beyond_2_53_matches_oracle(spark):
    """Same bound but through a grouped aggregation — the shape every
    catalog dsum user actually runs."""
    sdf = spark.range(_N).select(
        (F.col("id") % 3).alias("g"),
        F.expr(_EXPR.replace("i", "id")).alias("v"),
    )
    got = {
        r["g"]: r["s"]
        for r in sdf.groupBy("g").agg(dsum(F.col("v"), "s", 4)).collect()
    }
    rows = duckdb.sql(
        f"SELECT g, {sql_dsum('v', 's', 4)} FROM ("
        f"  SELECT i % 3 AS g, {_EXPR} AS v"
        f"  FROM (SELECT unnest(range({_N})) AS i)) GROUP BY g"
    ).fetchall()
    want = {g: s for g, s in rows}
    assert got == want, (got, want)


def test_double_array_lit_bit_equal_to_per_element_path(spark):
    """double_array_lit builds its values via one SQL-text parse; the
    parsed doubles must be BIT-identical to the per-element F.lit path
    (repr round-trip + correctly-rounded string->double cast),
    including signed zero, subnormals, extremes and non-dyadic sums."""
    import struct

    from rabbithole_spark.functions.numeric import (
        double_array_lit,
        double_matrix_lit,
    )

    vals = [
        0.1 + 0.2,
        -0.0,
        5e-324,            # min subnormal
        1e-308,
        1.7976931348623157e308,
        -1.2345678901234567,
        1e16 + 1,
        3.0,
    ]
    row = (
        spark.range(1)
        .select(
            F.array(*[F.lit(float(x)) for x in vals]).alias("o"),
            double_array_lit(vals).alias("n"),
            double_matrix_lit([vals, vals[::-1]]).alias("m"),
        )
        .first()
    )
    pack = lambda xs: [struct.pack("d", x) for x in xs]  # noqa: E731
    assert pack(row["o"]) == pack(row["n"])
    assert pack(row["m"][0]) == pack(vals)
    assert pack(row["m"][1]) == pack(vals[::-1])


def test_double_array_lit_nonfinite_and_empty_fallback(spark):
    """Non-finite values and empty input route to the py4j fallback
    and still produce a usable array<double> column."""
    import math

    from rabbithole_spark.functions.numeric import double_array_lit

    row = (
        spark.range(1)
        .select(
            double_array_lit([float("inf"), float("-inf")]).alias("i"),
            double_array_lit([]).alias("e"),
        )
        .first()
    )
    assert row["i"][0] == math.inf and row["i"][1] == -math.inf
    assert row["e"] == []
