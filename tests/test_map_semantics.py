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
