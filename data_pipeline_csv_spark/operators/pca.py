"""Distributed PCA via power iteration over an embedding column.

Reference scope note: the reference repo (pandas/SQLite ETL, see
SURVEY.md) has no linear-algebra surface at all; this operator belongs
to the engine's large-scale training-data extension family
(embedding-space analytics next to operators/similarity.py and
operators/clustering.py).

Algorithm: classic power iteration on the Gram matrix G = X^T X
(equivalently, un-centered PCA / the top right-singular vector of X):

    v_0   = (1/sqrt(d), ..., 1/sqrt(d))
    c_i   = x_i . v_t            (per-row scalar, map-side)
    w     = sum_i c_i * x_i      (d-vector, one tree-aggregated pass)
    v_t+1 = w / ||w||

Every aggregation is a FIXED-POINT integer sum (the determinism
contract shared with operators/clustering.py k-means): each product is
floored to a BIGINT at a fixed scale before summing, so the sum is
exact and order-insensitive, and the DuckDB oracle replaying the same
chain (queries/similarity.py) is bit-identical. The float divisions
and the sqrt that follow are single IEEE ops on identical inputs.

Scale shape (100 TB): each iteration is ONE scan of the corpus with a
d-column partially-aggregated sum (map-side combine collapses every
partition to one d-long row before the exchange) — no shuffle of the
data, no driver-side matrices beyond d values. Driver traffic is d
BIGINTs per iteration; the d x d covariance matrix is never formed.
Fixed-point scales bound the row count: |sum_i floor(x.c.S2)| must
stay under 2^63, so S2 = 1e12 is safe past 1e6 rows of unit-scale
embeddings and S2 should shrink as the corpus grows (the relative
precision per term stays ~1e-12 regardless).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixed-point scales, mirrored literally in the SQL oracle.
S_DOT = 1e14  # per-element product scale for row dot products
S_W = 1e12  # per-element product scale for the aggregated w vector
S_NRM = 1e4  # scale for the squared-norm fold of w


def _dot_fixed(vec_col, v: list[float], scale: float):
    """SUM_j floor(x_j * v_j * scale) as a BIGINT fold — the exact,
    order-insensitive fixed-point dot product of an array column with
    a literal vector."""
    v_arr = F.array(*[F.lit(float(x)) for x in v])
    return F.aggregate(
        F.zip_with(
            vec_col,
            v_arr,
            lambda a, b: F.floor(a.cast("double") * b * F.lit(scale)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


def power_iteration_top(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    iters: int = 3,
) -> tuple[list[float], float]:
    """Top principal direction of the (un-centered) Gram matrix.

    Returns ``(v, gram_eigval)``: the unit loading vector after
    ``iters`` deterministic power iterations, and ||w|| of the final
    iteration (the Rayleigh-quotient estimate of the top eigenvalue of
    X^T X). Driver traffic: ``dim`` BIGINTs per iteration.
    """
    v = [1.0 / math.sqrt(float(dim))] * dim
    x = F.col("_x")
    # Each iteration is its own job (the d-row collect), so the scan
    # of the embedding column re-runs per round without a persist —
    # iters full corpus reads instead of one. Persist the single-
    # column projection for the loop (guide §5: reused across jobs,
    # recompute costs a corpus scan), unpersist before returning so
    # nothing leaks past the call.
    base = df.select(F.col(vec_col).alias("_x")).persist()
    eigval = 0.0
    try:
        for _ in range(iters):
            c = _dot_fixed(x, v, S_DOT).cast("double") / F.lit(S_DOT)
            staged = base.select(x.alias("_x"), c.alias("_c"))
            row = staged.agg(
                *[
                    F.sum(
                        F.floor(
                            F.col("_x")[j].cast("double") * F.col("_c") * F.lit(S_W)
                        ).cast("long")
                    ).alias(f"w{j}")
                    for j in range(dim)
                ]
            ).first()
            # Mirror the oracle's implicit BIGINT -> DOUBLE casts exactly:
            # float(int) is the same round-to-nearest the SQL cast applies.
            w = [float(row[f"w{j}"]) / S_W for j in range(dim)]
            nfix = sum(math.floor(wj * wj * S_NRM) for wj in w)
            nrm = math.sqrt(float(nfix) / S_NRM)
            v = [wj / nrm for wj in w]
            eigval = nrm
    finally:
        base.unpersist()
    return v, eigval


def project_onto(
    df: DataFrame,
    v: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-row projection onto a literal direction ``v`` — one
    map-side fixed-point fold per row, zero shuffles."""
    proj = _dot_fixed(F.col(vec_col), v, S_DOT).cast("double") / F.lit(S_DOT)
    return df.select(F.col(id_col), proj.alias("proj"))
