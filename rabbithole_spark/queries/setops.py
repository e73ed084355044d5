"""Set-operation surface (SURVEY.md §2B Set ops): union all/distinct,
intersect (all), except (all).

Scale notes: UNION ALL is a zero-shuffle concatenation; DISTINCT /
INTERSECT / EXCEPT each cost one hash shuffle on the full row — at
100 TB prefer pre-aggregated or bucketed inputs when possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rabbithole_spark.catalog import register
from rabbithole_spark.session import table


def _cust_nations(spark, sf_dir):
    return table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


_UNION_ALL_ORACLE = """
SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
UNION ALL
SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
"""


@register(
    "setop_union_all",
    oracle=_UNION_ALL_ORACLE,
    doc="UNION ALL (bag union, no shuffle).",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cust_nations(spark, sf_dir).withColumn("side", F.lit("customer"))
    s = _supp_nations(spark, sf_dir).withColumn("side", F.lit("supplier"))
    return c.unionByName(s)


_UNION_DISTINCT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


@register(
    "setop_union_distinct",
    oracle=_UNION_DISTINCT_ORACLE,
    doc="UNION (set union = bag union + hash distinct).",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


_INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


@register(
    "setop_intersect",
    oracle=_INTERSECT_ORACLE,
    doc="INTERSECT (distinct values present on both sides).",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


_EXCEPT_ORACLE = """
SELECT o_custkey AS custkey FROM orders
EXCEPT
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
"""


@register(
    "setop_except",
    oracle=_EXCEPT_ORACLE,
    doc="EXCEPT (set difference): ordering customers without a positive "
    "account balance.",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    ordering = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    positive = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return ordering.subtract(positive)


_INTERSECT_ALL_ORACLE = """
SELECT event_type FROM events WHERE event_id % 2 = 0
INTERSECT ALL
SELECT event_type FROM events WHERE event_id % 2 = 1
"""


@register(
    "setop_intersect_all",
    oracle=_INTERSECT_ALL_ORACLE,
    doc="INTERSECT ALL (multiset intersection, per-value min multiplicity).",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    even = ev.filter(F.col("event_id") % 2 == 0).select("event_type")
    odd = ev.filter(F.col("event_id") % 2 == 1).select("event_type")
    return even.intersectAll(odd)


_EXCEPT_ALL_ORACLE = """
SELECT event_type FROM events WHERE event_id % 2 = 0
EXCEPT ALL
SELECT event_type FROM events WHERE event_id % 2 = 1
"""


@register(
    "setop_except_all",
    oracle=_EXCEPT_ALL_ORACLE,
    doc="EXCEPT ALL (multiset difference, multiplicity-aware).",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    even = ev.filter(F.col("event_id") % 2 == 0).select("event_type")
    odd = ev.filter(F.col("event_id") % 2 == 1).select("event_type")
    return even.exceptAll(odd)
