"""Property-based check (hypothesis): the JVM-side schemaless dotted-path
mapper agrees with a pure-Python transliteration of the reference's
semantics (rabbithole sql.py:145-166) on arbitrary nested payloads:
missing -> NULL, traversal through scalars -> NULL, dict/list values ->
compact JSON string."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from rabbithole_spark.plans.mapper import ParametersMapper

_KEYS = ["a", "b", "c"]
_PATHS = ["a", "b", "c", "a.b", "a.b.c", "b.a", "c.missing", "missing"]

_scalars = st.one_of(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.booleans(),
    st.text(alphabet="xyz 123", max_size=8),
    st.none(),
)


def _payloads(depth: int):
    if depth == 0:
        return _scalars
    return st.one_of(
        _scalars,
        st.lists(_scalars, max_size=3),
        st.dictionaries(
            st.sampled_from(_KEYS), _payloads(depth - 1), max_size=3
        ),
    )


def _ref_extract(payload: dict, path: str):
    """The reference's mapping rules, transliterated (sql.py:145-166),
    projected into the schemaless engine's string-typed value space."""
    current: object = payload
    for seg in path.split("."):
        if isinstance(current, dict):
            current = current.get(seg)
        else:
            return None
    if current is None:
        return None
    if isinstance(current, (dict, list)):
        return json.dumps(current, separators=(",", ":"), ensure_ascii=False)
    if isinstance(current, bool):
        return "true" if current else "false"
    return str(current)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.dictionaries(st.sampled_from(_KEYS), _payloads(2), max_size=3),
        min_size=1,
        max_size=6,
    )
)
def test_schemaless_mapper_matches_reference_semantics(spark, payloads):
    df = spark.createDataFrame(
        [(i, json.dumps(p, separators=(",", ":"), ensure_ascii=False))
         for i, p in enumerate(payloads)],
        ["i", "payload"],
    )
    mapper = ParametersMapper({f"p{j}": path for j, path in enumerate(_PATHS)})
    got = {
        r["i"]: [r[f"p{j}"] for j in range(len(_PATHS))]
        for r in mapper.apply(df, keep=["i"]).collect()
    }
    for i, payload in enumerate(payloads):
        expected = [_ref_extract(payload, path) for path in _PATHS]
        assert got[i] == expected, (payload, _PATHS, got[i], expected)


def test_list_form_positional_naming(spark):
    df = spark.createDataFrame(
        [(json.dumps({"a": 1, "b": {"c": "x"}}),)], ["payload"]
    )
    mapper = ParametersMapper(["a", "b.c", "missing"])
    out = mapper.apply(df)
    assert out.columns == ["param_0", "param_1", "param_2"]
    row = out.collect()[0]
    assert (row.param_0, row.param_1, row.param_2) == ("1", "x", None)


def test_duplicate_json_keys_first_wins_documented_divergence(spark):
    """Raw JSON may repeat a key ({"k":1,"k":2}) — something the
    reference never sees because Python json.loads collapses to the
    LAST occurrence before mapping (sql.py parses to dict). The
    JVM-side mapper reads the serialized payload directly and Spark's
    get_json_object returns the FIRST occurrence — as does DuckDB's
    json_extract_string, so the oracle hash-compare stays aligned.
    This test pins that documented divergence: first-wins here,
    last-wins in the reference."""
    df = spark.createDataFrame([('{"k":1,"k":2}',)], ["payload"])
    out = ParametersMapper({"k": "k"}).apply(df).collect()[0]
    assert out.k == "1"


def test_list_traversal_yields_null_like_reference(spark):
    """A dotted path into a list value ('a.0' where a=[1,2,3]) is NULL:
    the reference's dict.get traversal returns None for non-dict
    intermediates (sql.py:145-166), and the mapper's struct/JSON walk
    must agree — '0' is only a real key when the payload holds an
    object with that string key."""
    df = spark.createDataFrame(
        [('{"a":[1,2,3]}',), ('{"a":{"0":"zero"}}',), ('{"a":5}',)],
        ["payload"],
    )
    rows = (
        ParametersMapper({"a0": "a.0", "ab": "a.b"})
        .apply(df)
        .collect()
    )
    got = [(r.a0, r.ab) for r in rows]
    assert got.count((None, None)) == 2 and got.count(("zero", None)) == 1
