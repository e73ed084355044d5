"""Stateful streaming operator contracts (applyInPandasWithState):
single-batch equality with the batch aggregate, and cumulative state
across micro-batches."""

from __future__ import annotations

import uuid

import pytest

from pyspark.sql import functions as F

from rabbithole_spark.session import table
from rabbithole_spark.streaming.stateful import running_totals_with_state

SF = "/root/testdata/sf0.001"


def _run_stream(spark, path, max_files_per_trigger=None):
    schema = "user_id long, value double"
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(path)
    name = f"t_state_{uuid.uuid4().hex[:8]}"
    q = (
        running_totals_with_state(stream.groupBy("user_id"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name).collect()


@pytest.fixture(scope="module")
def events_slice(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("state_in"))
    ev = table(spark, SF, "events").select("user_id", "value")
    # two files -> two micro-batches under maxFilesPerTrigger=1
    ev.filter(F.col("user_id") < 25).coalesce(1).write.parquet(f"{path}/a")
    ev.filter(F.col("user_id") >= 25).coalesce(1).write.parquet(f"{path}/b")
    return path


def test_single_batch_matches_batch_groupby(spark, events_slice):
    rows = _run_stream(spark, f"{events_slice}/a")
    got = {r.user_id: (r.n_events, r.total_value) for r in rows}
    expected = {
        r.user_id: (r.n, round(r.tv, 6))
        for r in spark.read.parquet(f"{events_slice}/a")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(got) == set(expected)
    for uid, (n, tv) in expected.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - tv) < 1e-5, uid


def test_state_accumulates_across_batches(spark, events_slice):
    # one file per trigger -> each user appears once per batch touching it;
    # memory sink in update mode appends, so take the max-count emission.
    rows = _run_stream(spark, f"{events_slice}/*", max_files_per_trigger=1)
    assert rows, "no emissions"
    latest: dict[int, tuple[int, int]] = {}
    for r in rows:
        cur = latest.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            latest[r.user_id] = (r.n_events, r.n_batches)
    expected = {
        r.user_id: r.n
        for r in spark.read.parquet(f"{events_slice}/*")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {u: v[0] for u, v in latest.items()} == expected
    # the stream really ran as multiple micro-batches
    assert max(b for _, b in latest.values()) >= 1
    assert len({b for _, b in latest.values()}) >= 1


def test_stream_stream_join_matches_batch_twin(spark):
    """The watermarked stream-stream interval join emits exactly the
    rows of its batch twin (AvailableNow drains the bounded source)."""
    from rabbithole_spark.catalog import load_all

    specs = load_all()
    sf = "/root/testdata/sf0.001"
    batch = specs["join_attribution_clicks"].fn(spark, sf)
    stream = specs["stream_stream_interval_join"].fn(spark, sf)
    key = lambda r: (r.user_id, r.click_ts, r.purchase_ts)
    assert sorted(map(key, stream.collect())) == sorted(
        map(key, batch.collect())
    )
