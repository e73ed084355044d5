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
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["MEDIA_SCHEMA", "attach_fake_media", "extract_features", "decode_stub"]

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
    meta = F.struct(
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        (F.length(F.col(text_col)) % 512 + 1).cast("long").alias("width"),
        (F.length(F.col(text_col)) % 256 + 1).cast("long").alias("height"),
    )
    return df.select(
        F.col(id_col), content.alias("content"), meta.alias("media_meta")
    )


def decode_stub(payload: bytes, mime: str):  # pragma: no cover - stub
    """Where a real image/audio decoder would go (PIL.Image.open /
    soundfile.read). Not available in this container."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this environment"
    )


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
