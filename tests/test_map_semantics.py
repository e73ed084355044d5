"""Differential pin for scalar_map_funcs' coercion model: Spark's
from_json(Map<String,Integer>) nulls the ENTIRE map when any value is
not a strict int32 literal (measured: {"k":12.5} and
{"k":99999999999} both yield a NULL map), and the DuckDB oracle must
reproduce exactly that on payloads the generator never emits."""

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
]


def test_map_funcs_oracle_matches_spark_on_edge_payloads(spark):
    spec = load_all()["scalar_map_funcs"]

    sdf = spark.createDataFrame(_PAYLOADS, ["event_id", "props"])
    sdf.createOrReplaceTempView("events_edge")
    # run the registered query body against the crafted payloads by
    # substituting the events table: re-express via the same exprs
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, MapType, StringType

    m = F.from_json("props", MapType(StringType(), IntegerType()))
    sorted_keys = F.array_sort(F.map_keys(m))
    got = {
        r.event_id: (r.prop_keys, r.prop_values, r.n_props, r.k_value)
        for r in sdf.select(
            "event_id",
            F.array_join(sorted_keys, ",").alias("prop_keys"),
            F.array_join(
                F.transform(
                    sorted_keys, lambda k: F.element_at(m, k).cast("string")
                ),
                ",",
            ).alias("prop_values"),
            F.size(F.map_keys(m)).alias("n_props"),
            F.element_at(m, "k").alias("k_value"),
        ).collect()
    }

    con = duckdb.connect()
    con.register(
        "events", pd.DataFrame(_PAYLOADS, columns=["event_id", "props"])
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(spec.oracle).fetchall()
    }
    # normalize pandas NaN-ish to None
    def norm(t):
        return tuple(None if v is None or v != v else v for v in t)

    assert {k: norm(v) for k, v in got.items()} == {
        k: norm(v) for k, v in want.items()
    }
    # and the edge rows really exercise the whole-map-null path
    assert got[2] == (None, None, None, None)
    assert got[3] == (None, None, None, None)
    assert got[6] == (None, None, None, None)
    assert got[5][3] is None and got[5][0] == "j"
