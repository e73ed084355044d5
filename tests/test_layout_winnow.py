"""Round-5 additions: winnowing fingerprints, Z-order layout, sketch
tolerance audit — behavioral contracts + plan-shape pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from rabbithole_spark.operators.layout import (
    scale_to_16bit,
    spread_bits16,
    zorder_key,
    zorder_write,
)
from rabbithole_spark.operators.text_analysis import winnow_fingerprints
from rabbithole_spark.queries.aggregates import sketch_tolerance_audit
from tests.conftest import SF_SMALL

K, W = 8, 4


def _fps(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = winnow_fingerprints(df).collect()
    return {r.doc_id: set(r.fps) for r in rows}


def test_winnow_shared_substring_guarantees_shared_fingerprint(spark):
    """The winnowing guarantee (Schleimer et al. §2): any shared
    substring of length >= k + w - 1 yields at least one shared
    selected fingerprint, wherever it sits in either doc."""
    shared = "zqxjkvwpbfy"  # k + w - 1 = 11 chars
    a = "the quick brown fox " + shared + " jumped over it all"
    b = shared.join(["0123456789 ", " 9876543210"])
    fps = _fps(spark, [a, b])
    assert fps[0] & fps[1], "guaranteed shared fingerprint missing"


def test_winnow_disjoint_alphabets_share_nothing(spark):
    fps = _fps(spark, ["abcdefgh" * 10, "0123456789" * 8])
    assert not (fps[0] & fps[1])


def test_winnow_edge_cases(spark):
    fps = _fps(spark, ["", None, "abcdefg", "abcdefgh", "  AbC   DeFgH  "])
    assert fps[0] == set() and fps[1] == set()  # empty / NULL
    assert fps[2] == set()  # 7 chars < k
    assert len(fps[3]) == 1  # exactly one gram -> one fingerprint
    # canonicalization: lower + collapse whitespace + trim ->
    # "abc defgh" has exactly 2 grams -> one window -> min survives
    assert len(fps[4]) == 1


def test_winnow_plan_is_arrow_and_shuffle_free(spark):
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = winnow_fingerprints(df).select("doc_id", F.explode("fps").alias("fp"))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, "kernel must be Arrow-vectorized"
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF crept in"
    assert "Exchange" not in plan, "winnowing must stay row-local"


def _spread_ref(v: int) -> int:
    out = 0
    for bit in range(16):
        out |= ((v >> bit) & 1) << (2 * bit)
    return out


def test_zorder_key_matches_bitwise_reference(spark):
    samples = [(0, 0), (1, 0), (0, 1), (65535, 65535), (1234, 40321), (255, 256)]
    df = spark.createDataFrame(samples, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for x, y in samples:
        assert got[(x, y)] == _spread_ref(x) | (_spread_ref(y) << 1)


def test_zorder_write_range_partitions_and_tightens_zone_maps(spark, tmp_path):
    """The write recipe produces a RangePartitioning exchange on the
    Morton key, and the resulting files carry tight min/max extents on
    BOTH interleaved columns (the property zone-map pruning needs)."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    bounds = li.agg(
        (F.max("l_partkey") + 1).alias("mp"), (F.max("l_orderkey") + 1).alias("mo")
    )
    with_z = li.crossJoin(F.broadcast(bounds)).select(
        "l_partkey",
        "l_orderkey",
        zorder_key(
            scale_to_16bit(F.col("l_partkey"), F.col("mp")),
            scale_to_16bit(F.col("l_orderkey"), F.col("mo")),
        ).alias("z"),
    )
    staged = with_z.repartitionByRange(16, "z")
    assert "rangepartitioning" in (
        staged._jdf.queryExecution().executedPlan().toString().lower()
    )
    out = str(tmp_path / "zordered")
    zorder_write(with_z, F.col("z"), out, files=16)

    back = spark.read.parquet(out).select(
        "l_partkey", "l_orderkey", F.input_file_name().alias("f")
    )
    spans = back.groupBy("f").agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("ps"),
        (F.max("l_orderkey") - F.min("l_orderkey")).alias("os"),
    )
    full = back.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("ps"),
        (F.max("l_orderkey") - F.min("l_orderkey")).alias("os"),
    ).collect()[0]
    med = spans.agg(
        F.median("ps").alias("ps"), F.median("os").alias("os")
    ).collect()[0]
    # 16 z-range files = 2 bits per dimension -> typical file covers
    # ~1/4 of each key range; assert with slack against the full span.
    assert med.ps <= full.ps / 2, (med.ps, full.ps)
    assert med.os <= full.os / 2, (med.os, full.os)


def test_sketch_audit_all_within_tolerance(spark):
    rows = sketch_tolerance_audit(spark, SF_SMALL).collect()
    assert len(rows) >= 4
    bad = [r for r in rows if not r.within_tol]
    assert not bad, bad


def test_winnow_kernel_matches_oracle_on_adversarial_whitespace(spark, tmp_path):
    """Differential pin of the canonicalization contract: the Python
    kernel and the DuckDB oracle must select identical fingerprints
    for ARBITRARY ASCII text including the characters where \\s
    definitions diverge (\\v is whitespace to Python/Java but not to
    RE2; nbsp is whitespace only to Unicode-aware \\s — both pinned
    NON-whitespace by the explicit class). Drives the REGISTERED query
    end to end on a crafted corpus."""
    import duckdb

    from rabbithole_spark.catalog import load_all

    texts = [
        "plain old ascii text with words repeated words repeated",
        "vertical\x0btab\x0bseparated\x0btokens are not whitespace",
        "mixed \t tabs\nnewlines\r\fand formfeeds   collapsing",
        "nbsp\u00a0is not whitespace either way",
        " leading and trailing   ",
        "\x0b\x0b\x0b padded with spaces \x0b\x0b\x0b",
        "UPPER lower MiXeD case CANON",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    tbl = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(tbl)
    spec = load_all()["text_winnow_fingerprints"]
    got = {
        (r.doc_id, r.fp) for r in spec.fn(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tbl}/*.parquet'"
    )
    want = {tuple(r) for r in con.execute(spec.oracle).fetchall()}
    assert got == want and len(got) > 0


def _winnow_ref(text, k=8, w=4, base=257, mod=1_000_000_007):
    """Naive per-character Python reference of the winnowing selection
    (no numpy) — the spec the vectorized kernel must match."""
    import re as _re

    canon = _re.sub(r"[ \t\n\r\f]+", " ", (text or "").lower()).strip(" ")
    n = len(canon) - k + 1
    if n < 1:
        return set()
    hashes = []
    for i in range(n):
        acc = 0
        for ch in canon[i : i + k]:
            acc = (acc * base + ord(ch)) % mod
        hashes.append(acc)
    n_win = max(n - w + 1, 1)
    return {min(hashes[j : j + w]) for j in range(n_win)}


def test_winnow_kernel_matches_reference_on_random_text(spark):
    """Property pin: the numpy kernel equals the naive reference for
    random ASCII text with adversarial whitespace mixed in."""
    import random

    rng = random.Random(20260814)
    alphabet = "abcdefgh01 \t\n\r\f\x0b.,!"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        for _ in range(200)
    ]
    fps = _fps(spark, texts)
    for i, t in enumerate(texts):
        assert fps[i] == _winnow_ref(t), (i, repr(t))


def test_zorder_spread_matches_reference_exhaustive_edges(spark):
    """spread_bits16 equals the bit-loop reference over random and
    boundary inputs (single Spark round-trip for all samples)."""
    import random

    rng = random.Random(7)
    xs = [0, 1, 2, 3, 0x5555, 0xAAAA, 0xFFFF, 0x8000, 0x7FFF] + [
        rng.randrange(0, 65536) for _ in range(200)
    ]
    df = spark.createDataFrame([(v,) for v in xs], "v long")
    got = {
        r.v: r.s
        for r in df.select("v", spread_bits16(F.col("v")).alias("s")).collect()
    }
    for v in xs:
        assert got[v] == _spread_ref(v), v
