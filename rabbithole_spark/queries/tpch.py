"""TPC-H-shaped flagship analytics (beyond Q1/Q5 in core/joins),
adapted to the driver tables: Q3/Q10 (join-agg-rank), Q4 (EXISTS as
semi join), Q6 (pure pushdown), Q7/Q8 (nation-pair / market-share
multiway joins), Q13 (outer-join histogram), Q14 (conditional ratio),
Q15 (top-over-view without re-aggregation), Q17 (correlated avg as a
window), Q18 (HAVING-IN as agg-then-join), Q19 (disjunctive
pushdown), Q21 (multi-EXISTS as one grouped pass), Q22 (scalar
subquery + anti join). The driver schema has no partsupp table and no
l_shipmode/l_commitdate/c_phone columns, so Q2/Q9/Q11/Q12/Q16/Q20
have no faithful analog; every shape that is expressible is
registered. Common plan discipline at scale: broadcast every dim,
one shuffle per fact join key, partial aggs before every exchange,
TakeOrderedAndProject for top-k (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from rabbithole_spark.catalog import register
from rabbithole_spark.functions.numeric import dsum, sql_dsum
from rabbithole_spark.session import table

_Q3_ORACLE = f"""
SELECT l_orderkey,
       {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue", 4)},
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-01'
  AND l_shipdate > TIMESTAMP '1997-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@register(
    "tpch_q3_shipping_priority",
    oracle=_Q3_ORACLE,
    doc="TPC-H Q3 shape: segment-filtered 3-way join, grouped revenue, "
    "top-10 by revenue (TakeOrderedAndProject, not a global sort).",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.to_timestamp(F.lit("1997-06-01"))
    customer = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    lineitem = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4))
        .orderBy(
            F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey")
        )
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


_Q10_ORACLE = f"""
SELECT c_custkey, c_name,
       {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue", 4)},
       round(c_acctbal, 2) AS c_acctbal,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register(
    "tpch_q10_returned_items",
    oracle=_Q10_ORACLE,
    doc="TPC-H Q10 shape: returned-lineitem revenue per customer over a "
    "date window, broadcast nation dim, top-20.",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01")))
    )
    lineitem = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
    )


_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, {sql_dsum("l_quantity", "total_qty", 2)}
  FROM lineitem GROUP BY l_orderkey
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
WHERE total_qty > 250
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


@register(
    "tpch_q18_large_volume",
    oracle=_Q18_ORACLE,
    doc="TPC-H Q18 shape (large-volume customers): the classic "
    "IN-(grouped-HAVING-subquery) is expressed as agg -> filter -> "
    "join, so the per-order quantity sum is computed ONCE and carried "
    "through the join instead of re-aggregated after it; the filtered "
    "order set is small, so AQE broadcasts it against orders and "
    "customer joins stay shuffle-light. Decimal-exact sum per the "
    "numeric policy; deterministic tie-break on orderkey.",
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), "total_qty", 2))
        .filter(F.col("total_qty") > 250)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(
            F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey"
        )
        .limit(100)
    )


_Q4_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "tpch_q4_exists_shape",
    oracle=_Q4_ORACLE,
    doc="TPC-H Q4 shape (correlated EXISTS): orders with at least one "
    "line shipped >30 days after the order date, counted by priority. "
    "The correlated subquery compiles to a LEFT SEMI join on "
    "(orderkey, date predicate) — one shuffle, no row multiplication "
    "from multi-line matches, which is why EXISTS-as-semi-join is the "
    "scalable translation (an inner join + distinct would shuffle the "
    "duplicated matches first).",
)
def tpch_q4_exists_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


_Q6_ORACLE = f"""
SELECT {sql_dsum("l_extendedprice * l_discount", "revenue_delta", 4)},
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register(
    "tpch_q6_revenue_delta",
    oracle=_Q6_ORACLE,
    doc="TPC-H Q6 shape: the pure-pushdown probe — every predicate "
    "(shipdate range, discount band, quantity cap) reaches the "
    "parquet scan as PushedFilters, then a single partial-aggregated "
    "global sum. The canonical 'how much would revenue change' "
    "what-if; at 100 TB the plan is scan-local except one 1-row "
    "final-agg exchange.",
)
def tpch_q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue_delta", 4),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q14_ORACLE = f"""
SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
       {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", "promo_revenue", 4)},
       {sql_dsum("l_extendedprice * (1 - l_discount)", "total_revenue", 4)},
       -- lateral alias refs: the ratio divides the SAME two converted
       -- doubles Spark divides, not re-aggregated expressions
       round(100.0 * promo_revenue / total_revenue, 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""


@register(
    "tpch_q14_promo_share",
    oracle=_Q14_ORACLE,
    doc="TPC-H Q14 shape: promo revenue share per ship month — "
    "broadcast part dim join (fact never shuffles for it), "
    "conditional decimal-exact sums, ratio-of-sums in double. The "
    "conditional-aggregation-over-join pattern; plan at scale: "
    "pushed date range, one month-key exchange.",
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    part = F.broadcast(table(spark, sf_dir, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    out = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.month("l_shipdate").cast("int").alias("ship_month"))
        .agg(
            dsum(promo, "promo_revenue", 4),
            dsum(rev, "total_revenue", 4),
        )
    )
    return out.select(
        "ship_month",
        "promo_revenue",
        "total_revenue",
        F.round(
            100.0 * F.col("promo_revenue") / F.col("total_revenue"), 6
        ).alias("promo_pct"),
    )
