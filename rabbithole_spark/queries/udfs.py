"""UDF surface (SURVEY.md §2B UDF surface): row-at-a-time Python UDF,
Arrow-vectorized pandas UDF, grouped applyInPandas, and lateral UDTF.

Each query's kernel is deliberately SQL-expressible so the DuckDB oracle
hash-checks the *mechanism* (serialization, Arrow batching, group
spilling, lateral correlation), not just row counts. The reference's
config-driven parameter mappers (src/rabbithole/sql.py:110-215) are the
closest analogue — user code applied per message inside the engine.

Scale notes: row-at-a-time UDFs pay one Python call per row — keep them
out of 100 TB hot paths (udf_python_rowwise exists to cover the API, not
as a pattern). pandas UDFs amortize over Arrow batches
(spark.sql.execution.arrow.maxRecordsPerBatch); applyInPandas shuffles
once on the group key and needs each group to fit in executor memory.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from rabbithole_spark.catalog import register
from rabbithole_spark.session import table

# --- row-at-a-time Python UDF ------------------------------------------------

_ROWWISE_ORACLE = """
SELECT c_custkey, reverse(c_name) AS rev_name,
       CAST(length(c_name) AS INTEGER) AS name_len
FROM customer
WHERE c_custkey <= 1000
"""


@register(
    "udf_python_rowwise",
    oracle=_ROWWISE_ORACLE,
    doc="Row-at-a-time Python UDF (the documented slow path): one "
    "interpreter call per row; oracle-checked against reverse().",
)
def udf_python_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(StringType())
    def py_reverse(s: str) -> str:
        return s[::-1] if s is not None else None

    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 1000)
    return c.select(
        "c_custkey",
        py_reverse(F.col("c_name")).alias("rev_name"),
        F.length("c_name").alias("name_len"),
    )


# --- vectorized pandas UDF ---------------------------------------------------

_PANDAS_ORACLE = """
SELECT event_id,
       -- NULL pin: the numpy kernel propagates NaN -> NULL, but
       -- DuckDB greatest() SKIPS NULL args (returns 0, not NULL) —
       -- guard explicitly (round-9 udf probe)
       CASE WHEN value IS NULL THEN NULL
            ELSE round(ln(1 + greatest(value, 0)), 6) END AS log_value,
       CASE WHEN value IS NULL THEN NULL
            ELSE round(sqrt(greatest(value, 0)), 6) END AS sqrt_value
FROM events
"""


@register(
    "udf_pandas_vectorized",
    oracle=_PANDAS_ORACLE,
    doc="Arrow-batched pandas UDF: numpy transforms whole columnar "
    "batches (the 10-100x-over-rowwise fast path for custom Python).",
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @F.pandas_udf(DoubleType())
    def log1p_clip(v: pd.Series) -> pd.Series:
        return pd.Series(np.round(np.log1p(np.maximum(v.to_numpy(), 0.0)), 6))

    @F.pandas_udf(DoubleType())
    def sqrt_clip(v: pd.Series) -> pd.Series:
        return pd.Series(np.round(np.sqrt(np.maximum(v.to_numpy(), 0.0)), 6))

    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        log1p_clip(F.col("value")).alias("log_value"),
        sqrt_clip(F.col("value")).alias("sqrt_value"),
    )


# --- grouped applyInPandas ---------------------------------------------------

_ZSCORE_ORACLE = """
SELECT user_id, event_id,
       round((value - avg(value) OVER (PARTITION BY user_id))
             / nullif(stddev_samp(value) OVER (PARTITION BY user_id), 0),
             6) AS zscore
FROM events
"""


@register(
    "udf_grouped_zscore",
    oracle=_ZSCORE_ORACLE,
    doc="groupBy().applyInPandas per-user z-score: one shuffle on the "
    "group key, each group normalized as a pandas frame; NULL where "
    "the group is degenerate (n=1 or zero variance).",
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        std = pdf["value"].std(ddof=1)
        if not np.isfinite(std) or std == 0.0:
            z = pd.Series([None] * len(pdf), dtype="float64")
        else:
            z = ((pdf["value"] - pdf["value"].mean()) / std).round(6)
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "zscore": z}
        )

    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id").applyInPandas(
        zscore, schema="user_id bigint, event_id bigint, zscore double"
    )


# --- lateral UDTF ------------------------------------------------------------

_UDTF_ORACLE = """
SELECT p_partkey, u.pos, u.word
FROM (
  -- coalesce pin: the UDTF kernel is (text or '').split(' '), so a
  -- NULL p_type emits ONE empty token (the documented ''-> 1-token
  -- quirk) where string_split(NULL) would drop the row (round-9 probe)
  SELECT p_partkey,
         unnest(list_transform(string_split(coalesce(p_type, ''), ' '),
                               (w, i) -> {'pos': CAST(i - 1 AS INTEGER), 'word': w})) AS u
  FROM part
  WHERE p_partkey <= 100
)
"""


@register(
    "udf_udtf_lateral_split",
    oracle=_UDTF_ORACLE,
    doc="Python UDTF in a correlated LATERAL join: one generator "
    "invocation per input row, arbitrary rows out (Spark 4 UDTF API).",
)
def udf_udtf_lateral_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, word: string")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split(" ")):
                yield i, w

    spark.udtf.register("rh_split_words", SplitWords)
    table(spark, sf_dir, "part").createOrReplaceTempView("rh_part_v")
    return spark.sql(
        """
        SELECT p_partkey, s.pos, s.word
        FROM rh_part_v, LATERAL rh_split_words(p_type) s
        WHERE p_partkey <= 100
        """
    )


# --- cogrouped applyInPandas -------------------------------------------------

_COGROUP_ASOF_ORACLE = """
SELECT p.user_id,
       p.ts AS purchase_ts,
       (SELECT max(c.ts) FROM events c
        WHERE c.event_type = 'click'
          -- IS NOT DISTINCT FROM: cogroup's groupBy puts NULL keys in
          -- ONE group, so a NULL-user purchase sees NULL-user clicks —
          -- plain equality would yield NULL instead (round-9 probe,
          -- NULL-semantics class 5)
          AND c.user_id IS NOT DISTINCT FROM p.user_id
          AND c.ts <= p.ts) AS last_click_ts
FROM events p
WHERE p.event_type = 'purchase'
"""


@register(
    "udf_cogrouped_asof",
    oracle=_COGROUP_ASOF_ORACLE,
    doc="Cogrouped applyInPandas: clicks and purchases cogrouped per "
    "user, a vectorized numpy binary-search as-of inside each group "
    "attaching the most recent click at-or-before every purchase. "
    "The cogroup API is the "
    "two-input sibling of applyInPandas — both sides shuffle once on "
    "the group key and arrive as per-key pandas frames, so arbitrary "
    "two-table Python logic (asof, interval overlap, per-entity "
    "reconciliation) runs without a JVM join; the repo's JVM-side "
    "union-merge as-of (join_asof_events) is the built-in-operator "
    "twin of the same semantics.",
)
def udf_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    def asof(clicks: pd.DataFrame, purchases: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if purchases.empty:
            # typed empties: bare [] columns default to float64 and
            # Arrow refuses float64 -> timestamp, so a clicks-only
            # group would kill the task (round-9 review)
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "purchase_ts": pd.Series([], dtype="datetime64[ns]"),
                    "last_click_ts": pd.Series([], dtype="datetime64[ns]"),
                }
            )
        # np.searchsorted(side='right')-1 IS backward merge_asof: the
        # last click with ts <= purchase_ts (round 12, guide §4.2 —
        # the pandas merge_asof call carried ~4.5 ms of per-call frame
        # setup against 0.5 ms for the search itself, x one call per
        # user group; values are identical, pinned by the unchanged
        # oracle). NULL semantics are the same as before, now without
        # routing frames around the merge: a NaT purchase keeps its
        # row with NaT last_click (c.ts <= NULL matches nothing), a
        # NaT click is dropped (never anyone's most-recent click) —
        # one bad row must not kill a 100 TB job (round-9 review).
        pv = purchases["ts"].to_numpy(dtype="datetime64[ns]")
        c = np.sort(clicks["ts"].dropna().to_numpy(dtype="datetime64[ns]"))
        last = np.full(len(pv), np.datetime64("NaT", "ns"))
        mask = ~pd.isna(pv)
        if len(c) and mask.any():
            idx = np.searchsorted(c, pv[mask], side="right") - 1
            last[mask] = np.where(
                idx >= 0, c[np.clip(idx, 0, None)], np.datetime64("NaT", "ns")
            )
        return pd.DataFrame(
            {
                "user_id": purchases["user_id"].to_numpy(),
                "purchase_ts": pv,
                "last_click_ts": last,
            }
        )

    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            asof,
            schema="user_id bigint, purchase_ts timestamp, "
            "last_click_ts timestamp",
        )
    )
