"""Temporal surface (SURVEY.md §2B Date/time + Streaming windows as
batch-checkable queries): datetime parts, truncation, arithmetic, and
tumbling / sliding / session windows.

The window queries use the exact operators Structured Streaming uses
(``F.window`` / ``F.session_window``) — in batch mode they are
deterministic and oracle-checkable; the streaming variants (with
watermarks) live in rabbithole_spark.streaming and are tested with
AvailableNow triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rabbithole_spark.catalog import register
from rabbithole_spark.functions.numeric import dsum, sql_dsum
from rabbithole_spark.session import table

_PARTS_ORACLE = """
SELECT event_id,
       CAST(year(ts) AS INTEGER) AS y,
       CAST(month(ts) AS INTEGER) AS m,
       CAST(day(ts) AS INTEGER) AS d,
       CAST(hour(ts) AS INTEGER) AS h,
       CAST(minute(ts) AS INTEGER) AS mi,
       CAST(second(ts) AS INTEGER) AS s,
       CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
       CAST(dayofyear(ts) AS INTEGER) AS doy,
       CAST(ts AS DATE) AS event_date
FROM events
"""


@register(
    "temporal_parts",
    oracle=_PARTS_ORACLE,
    doc="Datetime component extraction (year..second, dow, doy, date cast). "
    "DuckDB dow is 0-based Sunday; Spark dayofweek is 1-based Sunday.",
)
def temporal_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("s"),
        F.dayofweek("ts").alias("dow"),
        F.dayofyear("ts").alias("doy"),
        F.col("ts").cast("date").alias("event_date"),
    )


_TRUNC_ORACLE = f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
       count(*) AS n_events,
       {sql_dsum("value", "day_value", 2)}
FROM events
GROUP BY 1
"""


@register(
    "temporal_trunc_daily",
    oracle=_TRUNC_ORACLE,
    doc="date_trunc-based daily aggregation (DuckDB date_trunc returns "
    "DATE -> cast to TIMESTAMP for schema parity).",
)
def temporal_trunc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "day_value", 2),
        )
    )


_ARITH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(datediff('day', o_orderdate, l_shipdate) AS INTEGER) AS ship_delay_days,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
       CAST(o_orderdate - INTERVAL 1 DAY AS DATE) AS day_before
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
"""


@register(
    "temporal_arithmetic",
    oracle=_ARITH_ORACLE,
    doc="datediff / date_add / date_sub across a join.",
)
def temporal_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias(
            "ship_delay_days"
        ),
        F.date_add(F.col("o_orderdate"), 30).alias("due_date"),
        F.date_sub(F.col("o_orderdate"), 1).alias("day_before"),
    )


_TUMBLING_ORACLE = f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       count(*) AS n_events,
       {sql_dsum("value", "window_value", 2)}
FROM events
-- F.window drops NULL event times; mirror it (NULL-fixture pin)
WHERE ts IS NOT NULL
GROUP BY 1, 2, 3
"""


@register(
    "window_tumbling_hourly",
    oracle=_TUMBLING_ORACLE,
    doc="Tumbling event-time window (streaming-identical F.window in "
    "batch mode; reference analogue: the batcher A5 is the degenerate "
    "processing-time form, batcher.py:54-109).",
)
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "window_value", 2),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "window_value",
        )
    )


_SLIDING_ORACLE = """
WITH offsets(k) AS (VALUES (0), (1))
SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS window_start,
       time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' + INTERVAL '1 hour' AS window_end,
       count(*) AS n_events
FROM events CROSS JOIN offsets
-- F.window drops NULL event times; mirror it (NULL-fixture pin)
WHERE ts IS NOT NULL
GROUP BY 1, 2
"""


@register(
    "window_sliding_hourly",
    oracle=_SLIDING_ORACLE,
    doc="Sliding window (1h width, 30m slide): each event belongs to 2 "
    "windows; oracle rewrites via bucket-offset expansion.",
)
def window_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
        )
    )


_SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= INTERVAL '30 minutes'
              THEN 0 ELSE 1 END AS new_session
  -- F.session_window drops NULL event times; mirror it (NULL pin)
  FROM events WHERE ts IS NOT NULL
), sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
"""


@register(
    "window_session_per_user",
    oracle=_SESSION_ORACLE,
    doc="Session window (30 min gap) per user — F.session_window in batch "
    "mode vs the classic gaps-and-islands SQL rewrite.",
)
def window_session_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


_CALENDAR_ORACLE = """
SELECT o_orderkey,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3_months
FROM orders
WHERE o_orderkey <= 2000
"""


@register(
    "temporal_calendar_funcs",
    oracle=_CALENDAR_ORACLE,
    doc="Calendar functions: quarter, ISO week, last_day, add_months.",
)
def temporal_calendar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("q"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months("o_orderdate", 3).alias("plus_3_months"),
    )


_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.view_ts
    AND e.ts <= v.view_ts + INTERVAL 1 DAY
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
    AND e.ts <= c.click_ts + INTERVAL 1 DAY
  GROUP BY e.user_id
)
SELECT stage, n_users FROM (
  SELECT 1 AS ord, 'view' AS stage,
         (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_users
  UNION ALL
  SELECT 2, 'view>click', (SELECT CAST(count(*) AS BIGINT) FROM c)
  UNION ALL
  SELECT 3, 'view>click>purchase',
         (SELECT CAST(count(*) AS BIGINT) FROM p)
) ORDER BY ord
"""


@register(
    "funnel_conversion_stages",
    oracle=_FUNNEL_ORACLE,
    doc="Event funnel: users who viewed, then clicked at-or-after their "
    "first view, then purchased at-or-after that click — per-stage "
    "user counts. Each stage is a filtered min-aggregate joined to the "
    "previous stage's user set, so the event scan is pruned by "
    "event_type pushdown per stage; join strategy is left to AQE — "
    "the view-stage user set is ~all users at scale, so a forced "
    "broadcast would be wrong there and a dynamically-chosen one is "
    "right at small SF. No window over the full event stream.",
)
def funnel_conversion_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # each stage's user set feeds BOTH the next stage's join and its
    # own count branch; localCheckpoint materializes the compact
    # (user, ts) frames once so the three count branches don't re-run
    # the whole upstream chain (v would otherwise execute 3x — NOTES.md
    # lesson 9), and gives AQE exact sizes for its join choice.
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
        .localCheckpoint(eager=False)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") >= F.col("view_ts"))
            & (F.col("ts") <= F.col("view_ts") + F.expr("INTERVAL 1 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
        .localCheckpoint(eager=False)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") >= F.col("click_ts"))
            & (F.col("ts") <= F.col("click_ts") + F.expr("INTERVAL 1 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
        .localCheckpoint(eager=False)
    )
    counts = [
        v.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("view").alias("stage"), "n_users"
        ),
        c.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("view>click").alias("stage"), "n_users"
        ),
        p.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("view>click>purchase").alias("stage"), "n_users"
        ),
    ]
    out = counts[0]
    for piece in counts[1:]:
        out = out.unionByName(piece)
    return out
