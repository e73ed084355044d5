"""Spark-4 SQL-surface queries: recursive CTEs and LATERAL correlated
subqueries — constructs the SQL layer exposes beyond the DataFrame API
(SURVEY.md §2B declares the SQL surface alongside the DataFrame one).

Recursive CTEs landed in Spark 4.0 (``WITH RECURSIVE``); the iteration
is driver-coordinated like the repo's connected-components loop, so
recursion depth must stay bounded (default level limit 100) — ladders
over calendar grains, not over row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (kept for parity with sibling modules)

from rabbithole_spark.catalog import register
from rabbithole_spark.session import table

_GAPFILL_ORACLE = """
WITH RECURSIVE days(d) AS (
  SELECT CAST((SELECT min(CAST(ts AS DATE)) FROM events) AS DATE)
  UNION ALL
  SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM days
  WHERE d < (SELECT max(CAST(ts AS DATE)) FROM events)
), purchases AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS n
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT days.d AS day, COALESCE(purchases.n, 0) AS n_purchases
FROM days LEFT JOIN purchases ON days.d = purchases.d
"""


@register(
    "sql_recursive_gapfill_days",
    oracle=_GAPFILL_ORACLE,
    doc="Gap-filled daily purchase counts via a recursive-CTE calendar "
    "ladder (WITH RECURSIVE, new in Spark 4): days with zero "
    "purchases appear explicitly as 0 instead of vanishing from the "
    "grouped result — the time-series densification every dashboard "
    "rollup needs. Recursion depth = number of DAYS (bounded by the "
    "data's calendar span, not its row count), so the driver-side "
    "iteration stays trivial at 100 TB while the per-step join is "
    "distributed; session.prepare() raises cteRecursionLevelLimit "
    "past the 100-level default (a ~3-month cliff — round-9 review; "
    "150-day differential pinned in tests/test_map_semantics.py).",
)
def sql_recursive_gapfill_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "events").createOrReplaceTempView("events_rgf")
    # the calendar bounds are computed ONCE in a plain CTE and the hi
    # bound is CARRIED THROUGH the recursion as a column (round 12,
    # guide §1.2): the previous anchor/step scalar subqueries
    # ((SELECT min/max(ts) FROM events)) were re-planned and re-run at
    # EVERY recursion level — one full events aggregation per calendar
    # day, measured 12-25 s at sf0.1 for a 30-day span vs 1.3 s for
    # this shape. Same recursion depth, same emitted days, identical
    # rows (value-checked old-vs-new before the swap).
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
          SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
          FROM events_rgf
        ), days(d, hi) AS (
          SELECT lo, hi FROM bounds
          UNION ALL
          SELECT CAST(d + INTERVAL 1 DAY AS DATE), hi FROM days
          WHERE d < hi
        ), purchases AS (
          SELECT CAST(ts AS DATE) AS d, count(*) AS n
          FROM events_rgf WHERE event_type = 'purchase' GROUP BY 1
        )
        SELECT days.d AS day, COALESCE(purchases.n, CAST(0 AS BIGINT)) AS n_purchases
        FROM days LEFT JOIN purchases ON days.d = purchases.d
        """
    )


_LATERAL_ORACLE = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) t
"""


@register(
    "join_lateral_topn",
    oracle=_LATERAL_ORACLE,
    doc="Top-2 customers by account balance per nation via a LATERAL "
    "correlated subquery — the SQL-standard alternative to the "
    "window-function top-k (topk_per_group); Spark decorrelates the "
    "lateral into a ranked join rather than executing per-row, so "
    "the plan is the same shuffle-and-rank shape at scale. "
    "Deterministic tie-break on c_custkey.",
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation_lat n,
        LATERAL (
          SELECT c_custkey, c_acctbal
          FROM customer_lat
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) t
        """
    )
