"""Edge contracts for the union-merge as-of join (operators.relational):
left-join NULLs when no prior right row, inclusive ties, per-key
isolation."""

from __future__ import annotations

import datetime

from rabbithole_spark.operators.relational import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_nulls(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "l-early"),   # before any right
            (1, _ts("2024-01-01T12:00:00"), "l-tie"),     # ties a right row
            (1, _ts("2024-01-01T13:30:00"), "l-late"),    # after r2
            (2, _ts("2024-01-01T12:30:00"), "l-other-key"),
        ],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T12:00:00"), "r1"),
            (1, _ts("2024-01-01T13:00:00"), "r2"),
            (2, _ts("2024-01-01T12:15:00"), "r-other"),
        ],
        ["k", "ts", "rtag"],
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    right_cols=["rtag"])
    got = {r.tag: r.rtag for r in out.collect()}
    assert got == {
        "l-early": None,       # no prior right row -> NULL (left join)
        "l-tie": "r1",         # right_ts == left_ts matches (inclusive)
        "l-late": "r2",        # most recent prior, not first
        "l-other-key": "r-other",  # keys do not leak across groups
    }
    assert out.count() == 4  # exactly one output row per left row


def test_asof_multi_key_and_renamed_cols(spark):
    left = spark.createDataFrame(
        [("a", 1, _ts("2024-01-01T01:00:00"), 10.0)],
        ["g", "sub", "ts", "value"],
    )
    right = spark.createDataFrame(
        [
            ("a", 1, _ts("2024-01-01T00:30:00"), 1.0),
            ("a", 2, _ts("2024-01-01T00:45:00"), 2.0),  # other sub-key
        ],
        ["g", "sub", "ts", "value"],
    )
    out = asof_join(
        left, right, on=["g", "sub"], left_ts="ts", right_ts="ts",
        right_cols=["ts", "value"],
    ).collect()
    assert len(out) == 1
    row = out[0]
    # overlapping column names get the _r suffix
    assert row.value == 10.0
    assert row.value_r == 1.0
    assert row.ts_r == _ts("2024-01-01T00:30:00")
