"""Vector column expressions over ``array<float>`` embeddings.

Two precision modes:

- ``*_exact``: element products in IEEE double (bit-identical in any
  engine) cast to DECIMAL(38,20) and summed exactly — order-
  insensitive, so the DuckDB oracle reproduces the result bit-for-bit.
  Used by the correctness-gated queries.
- ``*_fast``: plain double accumulation via ``F.aggregate`` (single
  pass, whole-stage codegen) — the throughput path for ANN re-ranking
  where last-ulp determinism doesn't matter.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed-point scale for deterministic dot products. Every per-element
# step is an IEEE double op (bit-identical in any engine) followed by
# floor -> BIGINT, so the integer sums are exact and order-insensitive.
# (DECIMAL casts were tried first: DuckDB's double->DECIMAL(p,18) cast
# is not correctly rounded, so high-scale decimal sums drift.)
# Magnitudes: |x*y| < 100 -> scaled < 1e16; 64-dim sums < 6.4e17 < 2^63.
DOT_SCALE = 1e14


def dot_exact(a: Column, b: Column) -> Column:
    """Deterministic fixed-point dot product of two float-array columns,
    in units of 1/DOT_SCALE (a bigint)."""
    prods = F.zip_with(
        a, b, lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(DOT_SCALE)).cast("bigint")
    )
    return F.aggregate(prods, F.lit(0).cast("bigint"), lambda acc, v: acc + v)


def norm_sq_exact(a: Column) -> Column:
    return dot_exact(a, a)


def cosine_from_parts(dxy: Column, nxx: Column, nyy: Column) -> Column:
    """cosine = dot / sqrt(|x||y|) as single IEEE ops on the exact
    fixed-point sums (the 1/DOT_SCALE units cancel)."""
    return dxy.cast("double") / F.sqrt(nxx.cast("double") * nyy.cast("double"))


def absmax(a: Column) -> Column:
    """max(|x_i|) over a float-array column — the per-vector int8
    quantization scale source. Single IEEE comparisons, identical in
    any engine."""
    return F.aggregate(
        a, F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v.cast("double")))
    )


def quantize_int8(x: Column, amax: Column) -> Column:
    """Symmetric per-tensor int8 quantization of one element:
    round(x * 127 / amax) as TINYINT (0 when the vector is all-zero).

    The training-data storage primitive — int8 embeddings are 4x
    smaller on disk and in shuffle than float32, and reconstruction
    error is bounded by amax/254 per element. Every step is an IEEE
    double op + round-half-away-from-zero, which Spark and DuckDB
    evaluate identically, so quantized values carry a FULL value
    oracle (queries/similarity.py embedding_quantize_int8).
    """
    return (
        F.when(amax == 0.0, F.lit(0))
        .otherwise(F.round(x.cast("double") * F.lit(127.0) / amax))
        .cast("tinyint")
    )


def dot_fast(a: Column, b: Column) -> Column:
    """Double-accumulation dot product (throughput path)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def cosine_fast(a: Column, b: Column) -> Column:
    return dot_fast(a, b) / F.sqrt(dot_fast(a, a) * dot_fast(b, b))
