"""session.table()'s per-session resolution cache (round 12): the
metastore-catalog contract — resolve once per (session, dir, name),
REFRESH TABLE analogue for replaced files, zero semantic drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from rabbithole_spark.session import refresh_tables, table

from tests.conftest import SF_SMALL


def test_table_resolution_is_cached_per_session(spark):
    """Two resolutions of the same (dir, name) return the SAME
    DataFrame object — the second pays no file listing / footer read
    (the ~120 ms/call round-12 profiling found)."""
    a = table(spark, SF_SMALL, "nation")
    b = table(spark, SF_SMALL, "nation")
    assert a is b
    # distinct dirs and names resolve independently
    assert table(spark, SF_SMALL, "region") is not a


def test_cached_relation_still_plans_fresh(spark):
    """The cache holds METADATA only: downstream plans built on the
    cached relation are independent (a filter on one query cannot
    leak into another)."""
    n1 = table(spark, SF_SMALL, "nation").filter(F.col("n_nationkey") < 5)
    n2 = table(spark, SF_SMALL, "nation")
    assert n1.count() == 5
    assert n2.count() == 25


def test_refresh_tables_sees_replaced_files(spark, tmp_path):
    """REFRESH TABLE analogue: rewriting a table under the same path
    is invisible until refresh_tables(), visible after — the pinned
    file listing is the documented catalog semantics, not a bug."""
    d = str(tmp_path)
    spark.range(3).write.mode("overwrite").parquet(f"{d}/nation.parquet")
    assert table(spark, d, "nation").count() == 3
    spark.range(7).coalesce(1).write.mode("overwrite").parquet(
        f"{d}/nation.parquet"
    )
    refresh_tables(spark, d)
    assert table(spark, d, "nation").count() == 7


def test_refresh_tables_scopes_by_dir(spark, tmp_path):
    """refresh_tables(sf_dir) drops only that dir's entries; the
    registry dir's cached relations survive."""
    d = str(tmp_path)
    spark.range(2).write.mode("overwrite").parquet(f"{d}/events.parquet")
    kept = table(spark, SF_SMALL, "supplier")
    table(spark, d, "events")
    refresh_tables(spark, d)
    cache = spark._rh_table_cache
    assert all(k[0] != d for k in cache)
    assert table(spark, SF_SMALL, "supplier") is kept
    # and a full refresh drops everything
    refresh_tables(spark)
    assert not cache
