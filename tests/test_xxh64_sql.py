"""Parity pins for functions/xxh64_sql.py — the pure-SQL XXH64 that
lets the MinHash/SimHash oracles replay Spark's F.xxhash64.

Three layers: (1) a pure-Python XXH64 reference checked against the
published test-vector (seed-0 empty input) so the reference itself is
anchored to the public spec, (2) the DuckDB expression vs that
reference over adversarial + hypothesis-random strings (every length
branch: empty, <4, <8, 8..31, >=32 stripes, multi-stripe, plus
multi-byte UTF-8), (3) DuckDB vs Spark's actual xxhash64 end-to-end.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rabbithole_spark.functions.xxh64_sql import xxh64_sql, xxh64_unsigned_sql

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * P2) & M, 31) * P1) & M


def xxh64_ref(data: bytes, seed: int = 42) -> int:
    """Reference XXH64 (public spec), unsigned."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= _round(0, v)
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def _signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


#: Every length-branch boundary + multi-byte UTF-8 (2/3/4-byte chars).
CASES = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "1234567",
    "12345678",
    "123456789",
    "x" * 31,
    "x" * 32,
    "x" * 33,
    "y" * 39,
    "y" * 40,
    "z" * 63,
    "z" * 64,
    "z" * 65,
    "w" * 100,
    "hello world",
    "café",
    "naïve Ω",
    "中文字符串",
    "emoji \U0001f600 tail",
    "  　",  # exotic whitespace must hash, not tokenize
    "the quick brown fox jumps over the lazy dog " * 5,
]


def test_reference_matches_public_test_vector():
    # XXH64("", seed=0) == 0xEF46DB3751D8E999 — the spec's vector
    assert xxh64_ref(b"", seed=0) == 0xEF46DB3751D8E999
    # and a seed-42 length-1 sanity anchor stays stable
    assert xxh64_ref(b"a") == xxh64_ref(b"a")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE MACRO xx(s) AS {xxh64_sql('s')}")
    c.execute(f"CREATE MACRO xxu(s) AS {xxh64_unsigned_sql('s')}")
    return c


def _duck(con, s: str) -> int:
    return con.execute("SELECT xx(?::VARCHAR)", [s]).fetchone()[0]


def test_duckdb_matches_reference_on_cases(con):
    for s in CASES:
        assert _duck(con, s) == _signed(xxh64_ref(s.encode("utf-8"))), repr(s)


def test_unsigned_variant_is_the_unsigned_word(con):
    for s in CASES:
        u = con.execute("SELECT xxu(?::VARCHAR)", [s]).fetchone()[0]
        assert int(u) == xxh64_ref(s.encode("utf-8")), repr(s)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=150))
def test_duckdb_matches_reference_hypothesis(s):
    # fresh macro-less eval: hypothesis may outlive the module fixture
    con = _HYPO_CON
    assert _duck(con, s) == _signed(xxh64_ref(s.encode("utf-8"))), repr(s)


_HYPO_CON = duckdb.connect()
_HYPO_CON.execute(f"CREATE MACRO xx(s) AS {xxh64_sql('s')}")


def test_duckdb_matches_spark_end_to_end(spark, con):
    df = spark.createDataFrame([(s,) for s in CASES], ["s"])
    got = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for s in CASES:
        assert got[s] == _duck(con, s), repr(s)


LONG_CASES = [0, 1, -1, 42, 7, -7, 2**31, -(2**31), 2**62, -(2**63),
              (2**63) - 1, 123456789012345, -987654321]


def test_long_fast_path_matches_spark(spark):
    """Spark's xxhash64 over a BIGINT column takes XXH64's fixed-width
    long path — the same mapping HLL++ registers use. Pin the SQL twin
    against it across sign/magnitude extremes."""
    from rabbithole_spark.functions.xxh64_sql import xxh64_long_unsigned_sql

    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE MACRO hl(v) AS {xxh64_long_unsigned_sql('v')}")
    df = spark.createDataFrame([(v,) for v in LONG_CASES], "v long")
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in LONG_CASES:
        u = int(con.execute("SELECT hl(?::BIGINT)", [v]).fetchone()[0])
        assert _signed(u) == got[v], v
