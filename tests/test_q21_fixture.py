"""Adversarial fixture for the TPC-H Q21 shape (VERDICT r7 item 7).

The synthetic driver corpus rarely produces an order with two or more
LATE suppliers, so `tpch_q21_waiting_suppliers`'s `n_late == 1` +
`max(when(is_late, suppkey))` pair was only as tested as that collision
pattern. This fixture plants every boundary case:

- an order where exactly one of two suppliers is late (counted),
- an order where BOTH suppliers are late (excluded — the NOT EXISTS
  half of the classic formulation),
- a single-supplier late order (excluded — the EXISTS half),
- a late order with non-'F' status (excluded),
- a multi-line supplier that is late on one line and on-time on
  another (late at the (order, supplier) grain — max over lines),
- two counted orders blaming the same supplier (numwait = 2).

Both the Spark query and its DuckDB oracle run on the fixture and must
produce the identical hand-computed answer — so the fixture guards the
oracle's semantics too, not just the Spark plan.
"""

from __future__ import annotations

import datetime

import duckdb

from rabbithole_spark.catalog import load_all

D = datetime.date
ORDER_COLS = "o_orderkey long, o_orderstatus string, o_orderdate date"
LINE_COLS = "l_orderkey long, l_suppkey long, l_shipdate date"
SUPP_COLS = "s_suppkey long, s_name string"

_T0 = D(2024, 1, 1)
_LATE = D(2024, 3, 15)  # > 60 days after _T0
_ONTIME = D(2024, 1, 15)

ORDERS = [
    (1, "F", _T0),  # one late of two -> counted, blame S1
    (2, "F", _T0),  # two late -> excluded (n_late = 2)
    (3, "F", _T0),  # single late supplier -> excluded (n_supp = 1)
    (4, "O", _T0),  # not finalized -> excluded
    (5, "F", _T0),  # S2 late on one of its two lines -> counted, blame S2
    (6, "F", _T0),  # one late of two -> counted, blame S1 again
]
LINEITEM = [
    (1, 101, _LATE), (1, 102, _ONTIME),
    (2, 101, _LATE), (2, 102, _LATE), (2, 103, _ONTIME),
    (3, 101, _LATE),
    (4, 101, _LATE), (4, 102, _ONTIME),
    (5, 102, _LATE), (5, 102, _ONTIME), (5, 101, _ONTIME),
    (6, 101, _LATE), (6, 103, _ONTIME),
]
SUPPLIER = [(101, "S1"), (102, "S2"), (103, "S3")]

EXPECTED = [("S1", 2), ("S2", 1)]  # numwait desc, name asc


def _write_fixture(spark, tmp):
    for name, schema, rows in (
        ("orders", ORDER_COLS, ORDERS),
        ("lineitem", LINE_COLS, LINEITEM),
        ("supplier", SUPP_COLS, SUPPLIER),
    ):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp / f"{name}.parquet"))
    return tmp


def test_q21_multi_late_supplier_orders(spark, tmp_path):
    spec = load_all()["tpch_q21_waiting_suppliers"]
    fixture = _write_fixture(spark, tmp_path)

    got = [
        (r.s_name, r.numwait)
        for r in spec.fn(spark, str(fixture)).collect()
    ]
    assert got == EXPECTED

    con = duckdb.connect()
    for name in ("orders", "lineitem", "supplier"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"'{fixture}/{name}.parquet/*.parquet'"
        )
    assert [tuple(r) for r in con.execute(spec.oracle).fetchall()] == EXPECTED
