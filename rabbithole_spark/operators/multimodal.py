"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode / feature-extraction as Arrow-batched pandas kernels.

Image/audio/video bytes travel as ``binary`` columns with a
``StructType`` metadata sibling (modality, mime, width/height/duration)
— Spark shuffles and spills binary columns like any other, so the
pipeline shape (partitioning, batch sizes, schema) is identical to a
production media pipeline; only the codec call is stubbed here because
the decode libraries (PIL/ffmpeg/torchaudio) are not in this container.

``decode_stub`` raises NotImplementedError exactly where a real decoder
would plug in; ``extract_features`` uses a deterministic fake (byte
statistics) so the distributed plumbing is fully testable.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "extract_features",
    "decode_stub",
    "decode_or_fake",
    "resize_media",
    "sample_frames",
]

#: metadata struct carried next to every binary payload
MEDIA_SCHEMA = StructType(
    [
        StructField("modality", StringType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deterministic fake media: the utf-8 bytes of the text as the
    binary payload + synthesized metadata. Real pipelines read payloads
    from object storage with spark.read.format('binaryFile')."""
    content = F.encode(F.col(text_col), "utf-8")
    # Dims derive from the *byte* length of the payload (octet_length),
    # not the character count — they must agree with oracles that
    # measure the encoded blob, including non-ASCII text.
    n_bytes = F.octet_length(content)
    meta = F.struct(
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        (n_bytes % 512 + 1).cast("long").alias("width"),
        (n_bytes % 256 + 1).cast("long").alias("height"),
    )
    return df.select(
        F.col(id_col), content.alias("content"), meta.alias("media_meta")
    )


def _pil():  # pragma: no cover - environment-dependent import probe
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_stub(payload: bytes, mime: str):
    """Decode an image payload to an HxWxC uint8 numpy array.

    Uses Pillow when it is importable (real decode of real image
    formats); otherwise raises NotImplementedError exactly where any
    other codec library (ffmpeg/torchaudio) would plug in. Callers that
    need a guaranteed result use :func:`decode_or_fake`.
    """
    image_mod = _pil()
    if image_mod is None:
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "environment"
        )
    import io

    import numpy as np

    with image_mod.open(io.BytesIO(payload)) as img:
        return np.asarray(img.convert("RGB"))


def decode_or_fake(payload: bytes, mime: str, width: int, height: int):
    """Real decode when a codec is available, else the deterministic
    fake (payload bytes tiled to the metadata dims).

    Both paths return an (H, W, 3) uint8 array so downstream kernels
    see one shape contract regardless of environment. The VALUES still
    differ between a real decode and the fake (that is inherent), so
    registered queries keep using the byte-histogram kernel, which is
    bit-identical everywhere; this helper is for pipelines that accept
    environment-dependent features in exchange for real decoding."""
    import numpy as np

    try:
        return decode_stub(payload, mime)
    except (NotImplementedError, OSError):
        data = np.frombuffer(payload, dtype=np.uint8)
        return np.resize(data, (height, width, 3))


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The kernel sees Arrow record batches (zero-copy binary), computes a
    deterministic 8-dim byte-histogram 'embedding' per payload — the
    stand-in for a real encoder forward pass. Batch shape, schema, and
    partition parallelism are exactly what a GPU encoder stage uses
    (mapInPandas + arrow.maxRecordsPerBatch to bound device memory).
    """

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            sizes = []
            for blob in pdf["content"]:
                if blob is None:
                    # NULL payload: propagate NULLs instead of crashing
                    # the whole job on np.frombuffer(None) — one bad
                    # row must not kill a 100 TB encode pass (round-9
                    # review; same contract as the NULL-vector probes)
                    sizes.append(None)
                    feats.append(None)
                    continue
                data = np.frombuffer(blob, dtype=np.uint8)
                sizes.append(len(data))
                hist, _ = np.histogram(data, bins=8, range=(0, 256))
                total = hist.sum() or 1
                feats.append((hist / total).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": sizes,
                    "features": feats,
                }
            )

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content", BinaryType()),
        StructField("media_meta", MEDIA_SCHEMA),
    ]
)


def resize_media(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id"
) -> DataFrame:
    """Resize every payload to (width, height) via mapInPandas.

    The kernel treats the payload as a raveled uint8 image at the
    metadata dims and block-averages it to the target size (numpy) — a
    real decoder/resizer (PIL/opencv) drops into the same loop via
    :func:`decode_stub`. Output keeps the (content, media_meta) shape so
    resize stages compose with feature extraction downstream.
    """

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_blobs = []
            metas = []
            for blob, meta in zip(pdf["content"], pdf["media_meta"]):
                if blob is None or meta is None:
                    # NULL payload/metadata: propagate (round-9 review)
                    out_blobs.append(None)
                    metas.append(None)
                    continue
                w, h = int(meta["width"]), int(meta["height"])
                data = np.frombuffer(blob, dtype=np.uint8)
                img = np.resize(data, (h, w))
                # nearest-neighbor index selection on the uint8 grid
                # directly — the old float64 round-trip allocated 8x
                # the payload per row and then did pure indexing anyway
                # (round-9 review; the oracle replays nearest-neighbor
                # pixel SELECTION, no averaging happens here)
                ys = (np.arange(height) * h // height).clip(0, h - 1)
                xs = (np.arange(width) * w // width).clip(0, w - 1)
                resized = img[np.ix_(ys, xs)]
                out_blobs.append(resized.tobytes())
                metas.append(
                    {
                        "modality": meta["modality"],
                        "mime": meta["mime"],
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].values, "content": out_blobs, "media_meta": metas}
            )

    return df.mapInPandas(kernel, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_frames", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_sha", StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_size: int = 256,
    every_k: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sample every k-th fixed-size frame from each payload (1->N rows).

    Video frame-sampling plumbing: mapInPandas yields one output row per
    sampled frame, so a single binary column fans out into a frame table
    without ever materializing all frames. A real demuxer (ffmpeg)
    replaces the fixed-stride slicer; everything else — Arrow batching,
    fan-out row multiplication, per-frame digests — is production shape.
    """

    def kernel(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "n_frames": [],
                    "frame_bytes": [], "frame_sha": []}
            for doc_id, blob in zip(pdf[id_col], pdf["content"]):
                if blob is None:
                    continue  # NULL payload: no frames (round-9 review)
                n_frames = max((len(blob) + frame_size - 1) // frame_size, 1)
                for idx in range(0, n_frames, every_k):
                    frame = bytes(blob[idx * frame_size : (idx + 1) * frame_size])
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["n_frames"].append(n_frames)
                    rows["frame_bytes"].append(len(frame))
                    rows["frame_sha"].append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, FRAME_SCHEMA)
