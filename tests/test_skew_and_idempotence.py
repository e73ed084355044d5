"""Contracts for skew salting and the exactly-once batch-id sink."""

from __future__ import annotations

import sqlite3

from pyspark.sql import functions as F

from rabbithole_spark.operators.skew import salted_join
from rabbithole_spark.streaming.sinks import idempotent_sqlite_table_sink


def test_salted_join_matches_plain_join(spark):
    # 90% of fact rows share one hot key
    large = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("row_id"),
    )
    small = spark.createDataFrame(
        [(k, f"dim-{k}") for k in range(50)], ["k", "label"]
    )
    plain = large.join(small, "k").select("row_id", "label")
    salted = salted_join(large, small, on="k", salt_from="row_id",
                         salt_factor=8).select("row_id", "label")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_spreads_hot_key(spark):
    large = spark.range(0, 1000).select(
        F.lit(1).alias("k"), F.col("id").alias("row_id")
    )
    salts = (
        large.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("row_id")), F.lit(8)).cast("int")
        )
        .groupBy("__salt")
        .count()
        .collect()
    )
    # the single hot key lands in every salt bucket, none holding >1/4
    assert len(salts) == 8
    assert max(r["count"] for r in salts) < 250


def test_salted_left_join_keeps_unmatched(spark):
    large = spark.createDataFrame(
        [(1, 10), (1, 11), (99, 12)], ["k", "row_id"]
    )
    small = spark.createDataFrame([(1, "one")], ["k", "label"])
    out = salted_join(large, small, on="k", salt_from="row_id",
                      salt_factor=4, how="left").collect()
    by_row = {r.row_id: r.label for r in out}
    assert by_row == {10: "one", 11: "one", 12: None}


def _make_db(path):
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE sink (event_id INTEGER, value REAL, __batch_id INTEGER)"
    )
    con.commit()
    con.close()


def test_idempotent_sink_replay_safe(spark, tmp_path):
    db = str(tmp_path / "idem.sqlite")
    _make_db(db)
    sink = idempotent_sqlite_table_sink(
        f"sqlite:///{db}", "sink", ["event_id", "value"]
    )
    batch = spark.createDataFrame(
        [(1, 1.5), (2, 2.5), (3, 3.5)], ["event_id", "value"]
    )
    sink(batch, 7)
    sink(batch, 7)  # replay of the SAME batch id (post-crash redelivery)
    later = spark.createDataFrame([(4, 4.5)], ["event_id", "value"])
    sink(later, 8)

    con = sqlite3.connect(db)
    rows = sorted(con.execute("SELECT event_id, __batch_id FROM sink").fetchall())
    con.close()
    assert rows == [(1, 7), (2, 7), (3, 7), (4, 8)]


def test_cdc_upsert_merge_on_read_and_compact(spark, tmp_path):
    """Append-only CDC deltas resolve last-write-wins per key (deletes
    drop out); compaction preserves the state while folding the log."""
    from rabbithole_spark.streaming.sinks import (
        cdc_compact,
        cdc_current_state,
        cdc_upsert_sink,
    )

    path = str(tmp_path / "cdc_table")
    sink = cdc_upsert_sink(path)
    b0 = spark.createDataFrame(
        [(1, "alice", 10.0, "u"), (2, "bob", 20.0, "u"), (3, "carol", 30.0, "u")],
        "id long, name string, score double, op string",
    )
    b1 = spark.createDataFrame(
        [(2, "bob", 25.0, "u"), (3, "carol", 0.0, "d"), (4, "dave", 40.0, "u")],
        "id long, name string, score double, op string",
    )
    sink(b0, 0)
    sink(b1, 1)
    state = {
        r.id: r.score
        for r in cdc_current_state(spark, path, ["id"], op_col="op").collect()
    }
    assert state == {1: 10.0, 2: 25.0, 4: 40.0}
    # replayed batch (same id) must not change the state
    sink(b1, 1)
    state2 = {
        r.id: r.score
        for r in cdc_current_state(spark, path, ["id"], op_col="op").collect()
    }
    assert state2 == state
    n = cdc_compact(spark, path, ["id"], op_col="op")
    assert n == 3
    state3 = {
        r.id: r.score
        for r in cdc_current_state(spark, path, ["id"], op_col="op").collect()
    }
    assert state3 == state


def test_partitioned_overwrite_sink_replay_idempotent(spark, tmp_path):
    """A replayed micro-batch overwrites only its own partition: the
    corrected replay supersedes the earlier partial attempt, other
    batches' partitions are untouched."""
    from rabbithole_spark.streaming.sinks import partitioned_overwrite_sink

    path = str(tmp_path / "po_sink")
    sink = partitioned_overwrite_sink(path)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    sink(b0, 0)
    # first (partial) attempt of batch 1, then its full replay
    sink(spark.createDataFrame([(3, "c")], "id long, v string"), 1)
    sink(spark.createDataFrame([(3, "c2"), (4, "d")], "id long, v string"), 1)
    rows = {
        (r.id, r.v, r["__batch_id"])
        for r in spark.read.parquet(path).collect()
    }
    assert rows == {(1, "a", 0), (2, "b", 0), (3, "c2", 1), (4, "d", 1)}
    # partition pruning: reading one batch touches only its directory
    one = spark.read.parquet(path).filter("__batch_id = 1")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(__batch_id" in plan.replace(
        "#", ""
    ) or "__batch_id" in plan
    assert {r.id for r in one.collect()} == {3, 4}


def test_salted_join_shuffles_on_salted_key(spark):
    """Under a real shuffle join (broadcast off), the Exchange hash-
    partitions on (k, __salt) — the whole point of salting. A
    broadcast-eligible dim would hide this at test scale, so pin it
    with the threshold disabled."""
    large = spark.range(0, 1000).select(
        F.lit(1).alias("k"), F.col("id").alias("row_id")
    )
    small = spark.createDataFrame(
        [(k, f"dim-{k}") for k in range(50)], ["k", "label"]
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = salted_join(large, small, on="k", salt_from="row_id",
                          salt_factor=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    exchanges = [
        line for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
    ]
    assert exchanges, plan
    assert all("__salt" in line for line in exchanges), plan
