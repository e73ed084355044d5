"""Smoke tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_aligned():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert "pricing_summary" in qs


def test_no_compound_output_columns(spark):
    """Driver-canonicalizer contract: every registered batch query must
    emit only atomic top-level columns — raw array/map cells crash the
    external comparator's pandas sort (unhashable type: list), the
    exact failure multimodal_feature_extract and scalar_map_funcs hit
    in earlier rounds. Streaming queries are skipped (they execute on
    call; their outputs are scalar by construction and covered by the
    streaming tests)."""
    from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

    from rabbithole_spark.catalog import load_all

    offenders = []
    for name, spec in load_all().items():
        if name.startswith("stream_"):
            continue
        df = spec.fn(spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, BinaryType, StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders


def test_canon_handles_struct_binary_and_signed_zero():
    """Cross-engine cell canonicalization: Spark Rows (structs) vs
    DuckDB dicts, bytearray vs bytes, and +0.0 vs -0.0 must all
    canonicalize identically or struct/binary/zero-valued results
    falsely mismatch."""
    from pyspark.sql import Row

    from rabbithole_spark.oracle import _canon

    assert _canon(Row(a=1, b="x")) == _canon({"a": 1, "b": "x"})
    assert _canon(bytearray(b"ab")) == _canon(b"ab")
    assert _canon(-0.0) == _canon(0.0)
    assert _canon(float("nan")) == ("f", "nan")
