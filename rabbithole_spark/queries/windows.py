"""Window-function surface (SURVEY.md §2B Window fns): ranking,
analytic (lag/lead/first/last), row frames, range frames, top-k.

Scale notes: each window is one shuffle on its partition key + a
per-partition sort. Running sums use the decimal-cast policy
(functions/numeric.py) because engines may evaluate frames via segment
trees with different float association. All orderings are total
(tie-broken on a unique key) so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rabbithole_spark.catalog import register
from rabbithole_spark.operators.relational import top_k_per_group
from rabbithole_spark.session import table

_RANK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


@register(
    "window_rank_orders",
    oracle=_RANK_ORACLE,
    doc="row_number / rank / dense_rank / ntile per customer.",
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


_LAG_ORACLE = """
SELECT user_id, event_id, ts, value,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER (
         PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS last_type
FROM events
-- NULLS FIRST explicitly: Spark's ascending default; DuckDB defaults
-- to NULLS LAST, which flips first/last and lag/lead neighbors for
-- NULL event times (round-6 NULL-fixture pin)
WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
"""


@register(
    "window_lag_lead",
    oracle=_LAG_ORACLE,
    doc="lag/lead/first/last analytics per user ordered by event time.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
    )


_RUNNING_ORACLE = """
SELECT user_id, event_id, ts,
       CAST(count(*) OVER w AS BIGINT) AS running_events,
       -- VARCHAR hop = the numeric.py decimal->double policy: DuckDB's
       -- direct decimal->double cast drifts 1 ulp past ~2^53/10^scale
       -- (round-4 measurement); round-9 review aligned this oracle
       CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS VARCHAR)
            AS DOUBLE) AS running_value,
       ROUND(avg(value) OVER (
         PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
       ), 6) AS moving_avg_4
FROM events
-- NULLS FIRST pin: see _LAG_ORACLE
WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register(
    "window_running_totals",
    oracle=_RUNNING_ORACLE,
    doc="Cumulative count/sum + 4-row moving average per user.",
)
def window_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_move = base.rowsBetween(-3, Window.currentRow)
    return table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.count(F.lit(1)).over(w_run).alias("running_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w_run)
        .cast("double")
        .alias("running_value"),
        F.round(F.avg("value").over(w_move), 6).alias("moving_avg_4"),
    )


_RANGE_FRAME_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(count(*) OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice
         RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING
       ) AS BIGINT) AS similar_priced
FROM orders
"""


@register(
    "window_range_frame",
    oracle=_RANGE_FRAME_ORACLE,
    doc="RANGE frame: per order, same-customer orders within +-1000 price.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("similar_priced"),
    )


_TOPK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS BIGINT) AS rn
  FROM orders
) WHERE rn <= 3
"""


@register(
    "topk_per_group",
    oracle=_TOPK_ORACLE,
    doc="Top-3 orders per customer (operators.relational.top_k_per_group).",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_k_per_group(
        table(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderkey", "o_totalprice"
        ),
        group_cols=["o_custkey"],
        order_cols=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    )


_DISTRIBUTION_ORACLE = """
SELECT o_orderpriority, o_orderkey,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cdist,
       nth_value(o_orderkey, 2) OVER w AS second_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


@register(
    "window_distribution",
    oracle=_DISTRIBUTION_ORACLE,
    doc="Distribution window functions: percent_rank, cume_dist, "
    "nth_value over a totally-ordered per-priority window.",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )
