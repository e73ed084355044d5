"""Differential pin for scalar_map_funcs' coercion model: Spark's
from_json(Map<String,Integer>) nulls the ENTIRE map when any value is
not a JSON integer token in int32 range (measured: 12.5, "5", true,
and 99999999999 all null the whole map; a JSON null value keeps the
key with a NULL value) — and the DuckDB oracle must reproduce exactly
that on payloads the generator never emits. The Spark side runs the
REGISTERED query against a temp parquet events table, so drift in the
real query body is caught, not just drift in a private re-statement."""

from __future__ import annotations

import duckdb
import pandas as pd

from rabbithole_spark.catalog import load_all

_PAYLOADS = [
    (1, '{"k": 3, "j": 7}'),            # all-valid -> both keys render
    (2, '{"k": 12.5, "j": 1}'),         # fractional -> whole map NULL
    (3, '{"k": 99999999999, "j": 1}'),  # > int32    -> whole map NULL
    (4, '{"k": -5}'),                   # negative ok
    (5, '{"j": 2}'),                    # k missing -> k_value NULL only
    (6, '{"k": 12345678901234567890123456}'),  # huge -> whole map NULL
    (7, '{"k": "5"}'),                  # QUOTED int -> whole map NULL
    (8, '{"k": true}'),                 # boolean -> whole map NULL
    (9, '{"k": null, "j": 4}'),         # null value -> map kept
]


def test_map_funcs_oracle_matches_spark_on_edge_payloads(spark, tmp_path):
    spec = load_all()["scalar_map_funcs"]

    # materialize the payloads as the events table the registered
    # query reads, so spec.fn itself is under test
    sf_dir = str(tmp_path)
    spark.createDataFrame(_PAYLOADS, ["event_id", "props"]).write.parquet(
        f"{sf_dir}/events.parquet"
    )
    got = {
        r.event_id: (r.prop_keys, r.prop_values, r.n_props, r.k_value)
        for r in spec.fn(spark, sf_dir).collect()
    }

    con = duckdb.connect()
    con.register(
        "events", pd.DataFrame(_PAYLOADS, columns=["event_id", "props"])
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(spec.oracle).fetchall()
    }

    def norm(t):  # pandas NaN-ish -> None
        return tuple(None if v is None or v != v else v for v in t)

    assert {k: norm(v) for k, v in got.items()} == {
        k: norm(v) for k, v in want.items()
    }
    # the edge rows really exercise each path
    for eid in (2, 3, 6, 7, 8):
        assert got[eid] == (None, None, None, None), (eid, got[eid])
    assert got[5][3] is None and got[5][0] == "j"
    assert got[9][0] == "j,k" and got[9][3] is None


_EDGE_TOKENS = [
    (1, "a", '{"k": 7, "j": 1}'),        # integral -> 7 everywhere
    (2, "a", '{"k": 12.5}'),             # fractional: try_cast NULL, variant truncs 12
    (3, "a", '{"k": -12.5}'),            # truncation TOWARD ZERO -> -12
    (4, "a", '{"k": 13.7}'),             # -> 13 (not half-even 14)
    (5, "b", '{"k": true}'),             # boolean: try_cast NULL, variant 1
    (6, "b", '{"k": false}'),            # variant 0
    (7, "b", '{"k": "5"}'),              # quoted integral -> 5 both paths
    (8, "b", '{"k": "12.5"}'),           # quoted fractional -> NULL both paths
    (9, "c", '{"k": " 8 "}'),            # string trim -> 8
    (10, "c", '{"k": "abc"}'),           # -> NULL
    (11, "c", '{"k": 99999999999}'),     # int32 overflow -> NULL
    (12, "c", '{"k": 2147483648.9}'),    # double out of range -> NULL
    (13, "c", '{"k": null, "j": 1}'),    # JSON null -> NULL
    (14, "c", '{"k": [1, 2]}'),          # array -> NULL
    (15, "c", '{"j": 3}'),               # missing -> NULL
    (16, "c", '{"k": 1e3}'),             # sci notation double -> 1000
]


def _edge_events(spark, tmp_path):
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        _EDGE_TOKENS, ["event_id", "event_type", "props"]
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(_EDGE_TOKENS, columns=["event_id", "event_type", "props"]),
    )
    return sf_dir, con


def test_json_funcs_try_cast_matches_oracle_on_edge_tokens(spark, tmp_path):
    """Round-9 review: k_int is a try_cast (one poisoned token must not
    kill the job under ANSI mode), and the oracle replays Spark's
    string->int semantics — integral tokens only, where DuckDB's bare
    TRY_CAST would round '12.5' to 13."""
    spec = load_all()["scalar_json_funcs"]
    sf_dir, con = _edge_events(spark, tmp_path)
    got = {r.event_id: r.k_int for r in spec.fn(spark, sf_dir).collect()}
    want = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT event_id, k_int FROM (" + spec.oracle + ")"
        ).fetchall()
    }
    assert got == want
    assert got[1] == 7 and got[9] == 8 and got[7] == 5
    assert got[2] is None and got[5] is None and got[11] is None


def test_variant_json_matches_oracle_on_edge_tokens(spark, tmp_path):
    """Round-9 review: the variant oracle replays try_variant_get's
    per-json-type coercion (double truncates toward zero, boolean ->
    1/0, quoted fractional -> NULL, int32 overflow -> NULL) instead of
    a plain CAST that rounds 12.5 to 13 and CRASHES DuckDB on 'true'."""
    spec = load_all()["scalar_variant_json"]
    sf_dir, con = _edge_events(spark, tmp_path)
    got = {
        r.event_type: (r.n, r.avg_k, r.n_missing)
        for r in spec.fn(spark, sf_dir).collect()
    }
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(spec.oracle).fetchall()}

    def norm(t):
        return tuple(None if v is None or v != v else v for v in t)

    assert {k: norm(v) for k, v in got.items()} == {
        k: norm(v) for k, v in want.items()
    }
    # group 'a' avg over (7, 12, -12, 13); 'b' over (1, 0, 5);
    # 'c' over (8, 1000) — every coercion path contributes
    assert got["a"][1] == 5.0 and got["b"][1] == 2.0 and got["c"][1] == 504.0


def test_array_hof_empty_vector_matches_oracle(spark, tmp_path):
    """Round-9 review: Spark's aggregate fold over [] returns its 0.0
    seed while DuckDB's list_aggregate([], 'sum') is NULL — the oracle
    coalesces under its NULL-element guard so both report 0.0."""
    spec = load_all()["scalar_array_hof"]
    sf_dir = str(tmp_path)
    rows = [(0, [1.0, 2.0]), (1, []), (2, None)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")
    got = {r.vec_id: r.sq_norm for r in spec.fn(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
    )
    want = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT vec_id, sq_norm FROM (" + spec.oracle + ")"
        ).fetchall()
    }
    assert got == want
    assert got[0] == 5.0 and got[1] == 0.0 and got[2] is None


def test_recursive_gapfill_survives_long_calendar_span(spark, tmp_path):
    """Round-9 review: the gapfill recursive CTE recurses once per
    calendar day; Spark 4's default cteRecursionLevelLimit=100 would
    throw RECURSION_LEVEL_LIMIT_EXCEEDED on any corpus spanning over
    ~3 months while the DuckDB oracle succeeded. session.prepare()
    raises the limit; this drives the REGISTERED query on a 150-day
    span and hash-compares against its oracle."""
    import datetime

    spec = load_all()["sql_recursive_gapfill_days"]
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(days=d), 1, "purchase", 1.0, "{}")
        for i, d in enumerate([0, 3, 149])  # sparse: 150-day span
    ] + [(99, base + datetime.timedelta(days=75), 2, "click", 1.0, "{}")]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf_dir}/events.parquet")
    got = {r[0]: tuple(r[1:]) for r in map(tuple, spec.fn(spark, sf_dir).collect())}
    assert len(got) == 150  # every day of the span, gaps filled
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    want = {r[0]: tuple(r[1:]) for r in con.execute(spec.oracle).fetchall()}
    assert got == want
