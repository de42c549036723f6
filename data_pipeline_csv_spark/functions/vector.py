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


def dot_fast(a: Column, b: Column) -> Column:
    """Double-accumulation dot product (throughput path)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def cosine_fast(a: Column, b: Column) -> Column:
    return dot_fast(a, b) / F.sqrt(dot_fast(a, a) * dot_fast(b, b))
