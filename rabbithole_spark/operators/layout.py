"""Data-layout operators: Z-order (Morton) multi-column clustering.

At 100 TB the dominant cost of a selective query is the scan, and the
scan is bounded by how well file-level zone maps (per-file min/max,
parquet row-group stats, Delta/Iceberg file stats) prune. Sorting by
one key prunes that key only; interleaving the bits of several keys
(the Z-order / Morton curve) gives every interleaved column
locality, so a filter on ANY of them skips most files. This module
supplies the key computation as pure column algebra (shift/mask
spreads, no UDF — stays in whole-stage codegen) plus the
``repartitionByRange``-on-z write recipe; the registered query
(`layout_zorder_clustering`, queries/layout.py) measures the
resulting zone-map quality, and the plan test pins the
RangePartitioning exchange of the write path.

Engine-portable by construction: the spread is 4 shift/mask steps on
BIGINT, identical in Spark SQL and DuckDB, so the oracle replays the
exact curve.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (shift, mask) steps spreading a 16-bit value onto even bit positions.
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits16(v: Column) -> Column:
    """Spread the low 16 bits of ``v`` onto even bit positions
    (b15..b0 -> bit 30, 28, ..., 0) via the classic magic-number
    shift/mask ladder — O(log bits) integer ops, no loop, no UDF."""
    x = v.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def scale_to_16bit(v: Column, upper_exclusive: Column) -> Column:
    """Map ``v`` in [0, upper_exclusive) to a 16-bit bucket by
    proportional scaling: floor(v * 65536 / upper_exclusive).
    ``v`` is widened to LONG first (round-9 review: an IntegerType key
    > 32767 would wrap at 2^31 in the multiply and z-cluster files on
    a corrupted curve with zero error); products then stay < 2^53, so
    the double division is exact and engine-portable."""
    return F.floor(v.cast("long") * 65536 / upper_exclusive).cast("long")


def zorder_key(x16: Column, y16: Column) -> Column:
    """Interleave two 16-bit bucket values into the 32-bit Morton
    key: x on even bits, y on odd bits."""
    return spread_bits16(x16).bitwiseOR(F.shiftleft(spread_bits16(y16), 1))


def zorder_write(
    df: DataFrame, z: Column, path: str, files: int = 64
) -> None:
    """The 100 TB layout recipe: range-partition on the Morton key so
    each output file owns a contiguous z-range (a small rectangle in
    key space), then write. Zone maps on every interleaved column then
    prune point/range filters on any of them. One range-partitioning
    shuffle — the same cost as a plain global sort."""
    df.withColumn("_z", z).repartitionByRange(files, "_z").drop("_z").write.mode(
        "overwrite"
    ).parquet(path)
