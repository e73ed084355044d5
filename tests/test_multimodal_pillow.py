"""Pillow-gated real-image decode tier (VERDICT r9 item 6).

The multimodal queries pin their *plumbing* with a deterministic fake
decoder because no codec library ships in this container. This module
pins the REAL decode path whenever Pillow is importable: the fixture
PNGs are built from stdlib zlib (real, spec-conformant PNG bytes —
deterministic, no Pillow needed to construct them), so the decoded
pixel content is pinned by a stored hash in every environment and the
pixel-exact decode assertions activate the moment the codec is
present.

PNG container layout per the W3C spec: 8-byte signature, IHDR
(width/height/bitdepth/colortype), IDAT (zlib-compressed scanlines,
each prefixed with filter byte 0), IEND; every chunk carries a CRC32.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from rabbithole_spark.operators import multimodal


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def make_png(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """A real RGB8 PNG from a row-major pixel grid, stdlib only."""
    h, w = len(pixels), len(pixels[0])
    raw = b"".join(
        b"\x00" + bytes(c for px in row for c in px) for row in pixels
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # RGB, 8-bit
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


#: deterministic non-square gradient: pixel (y, x) = (x*16, y*32, x^y)
GRID = [
    [(x * 16, y * 32, (x ^ y) & 0xFF) for x in range(8)] for y in range(5)
]
SOLID = [[(7, 11, 13)] * 3 for _ in range(2)]  # 3x2 solid color


def test_png_fixture_bytes_are_pinned():
    """The fixture's DECODED CONTENT is pinned to stored constants in
    every environment: the IDAT payload must decompress to the exact
    scanline stream whose sha256 is recorded here. (The compressed
    bytes themselves may legally differ across zlib builds — what a
    green Pillow run elsewhere certifies is this pixel content, which
    zlib round-trips losslessly by contract.)"""
    pinned = {
        # sha256 of the filter-byte-0 scanline stream, row-major RGB8
        "grid": (
            GRID,
            8,
            5,
            "d420db77ba094fb824241f24b682350157d5dfba"
            "4a4530a9136a9b6424072fa6",
        ),
        "solid": (
            SOLID,
            3,
            2,
            "268d935a4ffdfd30f2c8814c95d91630b87f48fc"
            "0a51dbb2dce0ea411b657292",
        ),
    }
    for name, (pixels, ew, eh, digest) in pinned.items():
        png = make_png(pixels)
        assert png[:8] == b"\x89PNG\r\n\x1a\n", name
        w, h = struct.unpack(">II", png[16:24])
        assert (w, h) == (ew, eh), name
        # walk chunks without any decoder; IDAT must round-trip to the
        # pinned scanlines
        pos, idat = 8, b""
        while pos < len(png):
            (ln,) = struct.unpack(">I", png[pos : pos + 4])
            tag = png[pos + 4 : pos + 8]
            if tag == b"IDAT":
                idat += png[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
        assert hashlib.sha256(zlib.decompress(idat)).hexdigest() == digest, name


needs_pillow = pytest.mark.skipif(
    multimodal._pil() is None,
    reason="Pillow not importable: real-decode tier skipped (the "
    "deterministic-fake tier in test_llm_operators.py still pins the "
    "distributed plumbing); `pip install Pillow` activates this tier",
)


@needs_pillow
def test_decode_stub_returns_exact_pixels():
    arr = multimodal.decode_stub(make_png(GRID), "image/png")
    assert arr.shape == (5, 8, 3)
    for y in range(5):
        for x in range(8):
            assert tuple(int(v) for v in arr[y, x]) == GRID[y][x], (y, x)
    solid = multimodal.decode_stub(make_png(SOLID), "image/png")
    assert solid.shape == (2, 3, 3)
    assert (solid == [7, 11, 13]).all()


@needs_pillow
def test_decode_or_fake_prefers_real_decode():
    """With a codec present, decode_or_fake must return the REAL
    pixels, not the byte-tiling fake (metadata dims deliberately
    disagree with the true image dims to expose a fake fallback)."""
    arr = multimodal.decode_or_fake(
        make_png(SOLID), "image/png", width=99, height=77
    )
    assert arr.shape == (2, 3, 3)  # true dims, not the metadata lie
    assert (arr == [7, 11, 13]).all()


@needs_pillow
def test_distributed_real_decode_pipeline(spark):
    """Real PNGs through the production plumbing: binary column +
    metadata struct -> mapInPandas kernel calling the real decoder ->
    per-doc mean-channel features. Pins that the Arrow batch transfer
    hands the kernel intact PNG bytes and the (H, W, 3) contract holds
    row-by-row in executors, not just driver-side."""
    from collections.abc import Iterator

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    rows = [
        (1, make_png(GRID), 8, 5),
        (2, make_png(SOLID), 3, 2),
        (3, None, None, None),  # NULL payload must propagate
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, content binary, width long, height long"
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("shape", ArrayType(LongType())),
            StructField("mean_rgb", ArrayType(DoubleType())),
        ]
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "shape": [], "mean_rgb": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                out["doc_id"].append(doc_id)
                if blob is None:
                    out["shape"].append(None)
                    out["mean_rgb"].append(None)
                    continue
                arr = multimodal.decode_stub(bytes(blob), "image/png")
                out["shape"].append(list(arr.shape))
                out["mean_rgb"].append(
                    [float(arr[:, :, c].mean()) for c in range(3)]
                )
            yield pd.DataFrame(out)

    got = {r.doc_id: r for r in df.mapInPandas(kernel, schema).collect()}
    assert got[1].shape == [5, 8, 3]
    exp = [
        sum(GRID[y][x][c] for y in range(5) for x in range(8)) / 40.0
        for c in range(3)
    ]
    assert got[1].mean_rgb == pytest.approx(exp)
    assert got[2].shape == [2, 3, 3]
    assert got[2].mean_rgb == pytest.approx([7.0, 11.0, 13.0])
    assert got[3].shape is None and got[3].mean_rgb is None
