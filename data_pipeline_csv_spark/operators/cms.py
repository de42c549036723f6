"""Count-Min sketch frequency estimation (Cormode & Muthukrishnan,
J. Algorithms 2005): a d×w counter matrix that answers "how often does
item x occur?" with one-sided error (never under-counts, over-counts
by ≤ εN w.h.p.) from constant-size, merge-by-addition state — the
frequency complement of the KMV distinct sketch (operators/kmv.py)
and the standard heavy-hitters screen at stream/corpus scale.

Spark-first shape: the sketch build is one corpus explode + a map-side
d-way replication (posexplode of a d-entry bucket array) + a partial
agg to the d·w counter rows — counters add, so partial aggregation IS
the sketch merge, and the exchange carries ≤ d·w rows per map task
regardless of corpus size. Estimation joins candidates against the
d·w-row sketch (AQE broadcasts it) and takes min over the d rows.

Cross-engine exactness: buckets come from md5 of the salted token
("j:tok", first 15 hex chars mod w) and every counter is an exact
int64, so the DuckDB oracle replays the sketch and every estimate
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, j: int, w: int) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.encode(F.concat(F.lit(f"{j}:"), col), "utf-8")), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % w
    )


def cms_sketch(tok: DataFrame, token_col: str, d: int, w: int) -> DataFrame:
    """Build the d×w Count-Min sketch of a token-occurrence frame:
    returns (j, b, c) counter rows, ≤ d·w of them. The d-way
    replication is a map-side posexplode; counters partial-aggregate
    (the sketch's additive merge) before the single ≤d·w-row
    exchange."""
    arr = F.array(*[_bucket(F.col(token_col), j, w) for j in range(d)])
    return (
        tok.select(F.posexplode(arr).alias("j", "b"))
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate_topk(
    sketch: DataFrame, tok: DataFrame, token_col: str, k: int, d: int, w: int
) -> DataFrame:
    """Heavy-hitters audit against a (j, b, c) sketch frame: the exact
    top-k tokens (ties broken by token asc) with their Count-Min
    estimates alongside — emits (token, exact_cnt, est_cnt,
    overcount). The exact side exists for verification; the
    production path keeps only the d·w counters and a candidate heap.
    overcount = est − exact ≥ 0 always (one-sided error). The sketch
    may come from :func:`cms_sketch` or from a drained streaming fold
    (counters add, so the two are bit-identical)."""
    cand = (
        tok.groupBy(F.col(token_col).alias("token"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("token").asc())
        .limit(k)
    )
    arr = F.array(*[_bucket(F.col("token"), j, w) for j in range(d)])
    return (
        cand.select("token", "exact_cnt", F.posexplode(arr).alias("j", "b"))
        .join(F.broadcast(sketch), ["j", "b"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("c").alias("est_cnt"))
        .select(
            "token",
            F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
            F.col("est_cnt").cast("bigint").alias("est_cnt"),
            (F.col("est_cnt") - F.col("exact_cnt")).cast("bigint").alias("overcount"),
        )
    )


def cms_topk_audit(
    tok: DataFrame, token_col: str, k: int = 20, d: int = 4, w: int = 1024
) -> DataFrame:
    """One-shot batch form: build the sketch and audit the exact
    top-k against it (see :func:`cms_estimate_topk`)."""
    return cms_estimate_topk(
        cms_sketch(tok, token_col, d, w), tok, token_col, k, d, w
    )
