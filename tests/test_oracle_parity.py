"""Oracle-differential parity: every catalog query with an oracle must
match DuckDB on sf0.001 (the driver runs the same shape at sf0.01)."""

from __future__ import annotations

import pytest

from rabbithole_spark.catalog import load_all
from rabbithole_spark.oracle import compare, duckdb_connect

SF = "/root/testdata/sf0.001"

_SPECS = {n: s for n, s in load_all().items() if s.oracle is not None}


@pytest.fixture(scope="module")
def con():
    return duckdb_connect(SF)


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_oracle_parity(spark, con, name):
    spec = _SPECS[name]
    report = compare(name, spec.fn(spark, SF), spec.oracle, con)
    assert report.ok, str(report)
