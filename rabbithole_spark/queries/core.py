"""Flagship query: TPC-H-Q1-style pricing summary on lineitem.

Exercises the scan -> filter -> partial/final hash aggregate -> sort
pipeline. Catalyst pushes the shipdate filter and the 8-column
projection into the parquet scan; the groupBy aggregates map-side
(partial) before the 2-key shuffle, so shuffled bytes are O(groups),
not O(rows) — the shape that survives a 100 TB lineitem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rabbithole_spark.catalog import register
from rabbithole_spark.functions.numeric import dsum, ravg, sql_dsum, sql_ravg
from rabbithole_spark.session import table

_CUTOFF = "1998-09-02"

_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum("l_quantity", "sum_qty", 2)},
  {sql_dsum("l_extendedprice", "sum_base_price", 2)},
  {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price", 4)},
  {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge", 6)},
  {sql_ravg("l_quantity", "avg_qty")},
  {sql_ravg("l_extendedprice", "avg_price")},
  {sql_ravg("l_discount", "avg_disc")},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "pricing_summary",
    oracle=_ORACLE,
    doc="TPC-H Q1 shape: filtered grouped aggregation on lineitem "
    "(SURVEY.md §2B Aggregation; build-plan milestone 0 §7).",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit(_CUTOFF)))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty", 2),
            dsum(F.col("l_extendedprice"), "sum_base_price", 2),
            dsum(disc_price, "sum_disc_price", 4),
            dsum(charge, "sum_charge", 6),
            ravg(F.col("l_quantity"), "avg_qty"),
            ravg(F.col("l_extendedprice"), "avg_price"),
            ravg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
