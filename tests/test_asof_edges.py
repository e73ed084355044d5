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


def test_asof_null_keys_never_match(spark):
    """SQL equi-join NULL semantics (round-9 review): a NULL join key
    never matches — DuckDB's ASOF LEFT JOIN equality condition is
    false on NULL = NULL (measured), so the window formulation must
    not group NULL keys together and pair them. NULL-key left rows
    come back unmatched; NULL-key right rows match nobody; non-NULL
    partitions are unaffected."""
    left = spark.createDataFrame(
        [
            (None, _ts("2024-01-01T10:00:00"), "l-null-key"),
            (1, _ts("2024-01-01T10:00:00"), "l-real"),
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (None, _ts("2024-01-01T09:00:00"), "r-null-key"),
            (1, _ts("2024-01-01T09:30:00"), "r-real"),
        ],
        "k int, ts timestamp, rtag string",
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    right_cols=["rtag"])
    got = {r.tag: r.rtag for r in out.collect()}
    assert got == {"l-null-key": None, "l-real": "r-real"}

    # and the REGISTERED query agrees with its DuckDB ASOF oracle on a
    # fixture with NULL-user error AND click rows (the case the sf
    # corpora and the NULL probe never exercised together)
    import duckdb
    import tempfile, os
    from rabbithole_spark.catalog import load_all

    rows = [
        (1, None, _ts("2024-01-01T09:00:00"), 1.0, "error"),
        (2, None, _ts("2024-01-01T10:00:00"), 2.0, "click"),
        (3, 7, _ts("2024-01-01T09:10:00"), 3.0, "error"),
        (4, 7, _ts("2024-01-01T10:10:00"), 4.0, "click"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, user_id int, ts timestamp, value double, "
            "event_type string",
        ).write.parquet(os.path.join(d, "events.parquet"))
        spec = load_all()["join_asof_events"]
        got2 = {
            r.event_id: (r.error_ts, r.error_event_id)
            for r in spec.fn(spark, d).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet/*.parquet')"
        )
        want = {
            r[1]: (r[2], r[3])
            for r in con.execute(
                "SELECT user_id, event_id, error_ts, error_event_id "
                "FROM (" + spec.oracle + ")"
            ).fetchall()
        }
    assert got2 == want
    assert got2[2] == (None, None)  # NULL-user click stays unmatched
    assert got2[4][1] == 3  # real key still matches its prior error
