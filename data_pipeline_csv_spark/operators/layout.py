"""Z-order (Morton-curve) data layout for MULTI-column pruning — the
lakehouse `OPTIMIZE ZORDER BY` shape (Delta/Iceberg/Hudi all ship it;
Morton 1966 for the curve): interleave the bits of two quantized sort
keys so that files/partitions become axis-aligned RECTANGLES in
(x, y) space, and a 2-D range query statically prunes to the buckets
whose rectangle intersects the query box — where a single-column sort
can only prune one dimension.

Spark-first shape: the z-value is a pure JVM bit-op projection, the
layout is an ordinary Hive-partitioned parquet write (one bucket =
one partition dir = one rectangle), and the covering-bucket set for a
query box is computed driver-side over the FIXED 2^prefix_bits bucket
grid (256 ints — no data touched), then inlined as literals so
Catalyst prunes statically, exactly like the IVF probe
(operators/similarity.read_ivf_lists). Covering completeness is by
construction: quantization is monotone, so any row inside the raw box
quantizes into a bucket whose rectangle intersects the quantized box.

At 100 TB the same math holds with more prefix bits (4096-65536
buckets) and row-group-level min/max pruning inside each bucket from
the z-sorted write order (``sortWithinPartitions(z)``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 10  # per-dimension quantization width (z is 2*ZBITS bits)
PREFIX_BITS = 8  # bucket = top PREFIX_BITS of z -> 256 rectangles


def zvalue(xq: Column, yq: Column, bits: int = ZBITS) -> Column:
    """Morton interleave of two ``bits``-bit quantized keys: bit 2i+1
    of z is bit i of x, bit 2i is bit i of y. Pure JVM bit ops."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftrightunsigned(xq.cast("long"), i).bitwiseAND(F.lit(1).cast("long")), 2 * i + 1))
            .bitwiseOR(F.shiftleft(F.shiftrightunsigned(yq.cast("long"), i).bitwiseAND(F.lit(1).cast("long")), 2 * i))
        )
    return z


def write_zorder_layout(
    df: DataFrame,
    xq: Column,
    yq: Column,
    path: str,
    bits: int = ZBITS,
    prefix_bits: int = PREFIX_BITS,
) -> None:
    """Materialize ``df`` partitioned by its z-order bucket, rows
    z-sorted within each bucket file (row-group min/max stay tight on
    BOTH dimensions)."""
    z = zvalue(xq, yq, bits)
    zb = F.shiftrightunsigned(z, 2 * bits - prefix_bits).cast("int")
    (
        df.withColumn("_z", z)
        .withColumn("zb", zb)
        .repartition("zb")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .partitionBy("zb")
        .parquet(path)
    )


def _deinterleave_bucket(b: int, prefix_bits: int) -> tuple[int, int]:
    """Bucket id -> (x_hi, y_hi) cell coordinates. The bucket's bits
    alternate x/y starting from x (z's MSB is an x bit)."""
    x_hi = y_hi = 0
    # bucket bit (prefix_bits-1-j) corresponds to z bit (2*bits-1-j):
    # even j -> x, odd j -> y (MSB-first alternation)
    xbits = [(b >> (prefix_bits - 1 - j)) & 1 for j in range(0, prefix_bits, 2)]
    ybits = [(b >> (prefix_bits - 1 - j)) & 1 for j in range(1, prefix_bits, 2)]
    for bit in xbits:
        x_hi = (x_hi << 1) | bit
    for bit in ybits:
        y_hi = (y_hi << 1) | bit
    return x_hi, y_hi


def zorder_covering_buckets(
    xq_lo: int,
    xq_hi: int,
    yq_lo: int,
    yq_hi: int,
    bits: int = ZBITS,
    prefix_bits: int = PREFIX_BITS,
) -> list[int]:
    """All bucket ids whose rectangle intersects the quantized query
    box — driver-side arithmetic over the fixed 2^prefix_bits grid,
    no data touched. Complete: quantization is monotone, so every row
    in the raw box lands in one of these buckets."""
    nx = (prefix_bits + 1) // 2  # x bits in the prefix (x leads)
    ny = prefix_bits // 2
    x_cell = 1 << (bits - nx)  # x width of one bucket rectangle
    y_cell = 1 << (bits - ny)
    out = []
    for b in range(1 << prefix_bits):
        x_hi, y_hi = _deinterleave_bucket(b, prefix_bits)
        x0, x1 = x_hi * x_cell, (x_hi + 1) * x_cell - 1
        y0, y1 = y_hi * y_cell, (y_hi + 1) * y_cell - 1
        if x1 >= xq_lo and x0 <= xq_hi and y1 >= yq_lo and y0 <= yq_hi:
            out.append(b)
    return out
