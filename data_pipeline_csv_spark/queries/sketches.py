"""Approximate-sketch queries: HLL distinct counts, quantile sketches.

Approximate by construction — raw estimates are engine-specific, so
they can't be value-hashed against DuckDB directly. Both queries are
still oracle-checked via their ERROR BOUNDS: the oracle carries the
exact answer (distinct count / interpolated quantiles, bit-identical
across engines) plus a TRUE flag, and the Spark side computes the
sketch AND the exact form, emitting the flag only if the sketch landed
inside the bound. The exact sides exist solely for verification; the
production 100 TB path is approx-only: a single pass + constant-size
mergeable state where the exact forms (countDistinct, sort-based
percentiles) shuffle the full key set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


@query(
    "sketch_distinct_customers",
    # The raw HLL estimate is engine-specific, but its ERROR BOUND is
    # SQL-expressible: the oracle emits the exact distinct count plus a
    # TRUE bounds flag, and the Spark side hash-matches only if its
    # sketch landed within 3*rsd of the exact answer it computed
    # alongside. The exact countDistinct here exists solely to make the
    # sketch verifiable — the production 100 TB path uses the
    # approx-only form (constant-size mergeable state, no key shuffle).
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           TRUE AS within_3rsd
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="approx_count_distinct (HyperLogLog++, rsd=0.01) of customers per "
    "order priority, verified against the exact count via the 3*rsd "
    "error bound (holds w.p. ~99.7%; deterministic for a fixed corpus "
    "since the sketch itself is deterministic).",
    tags=("sketch", "hll", "agg"),
)
def sketch_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    rsd = 0.01
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.approx_count_distinct("o_custkey", rsd=rsd).alias("_approx"),
        )
        .select(
            "o_orderpriority",
            "exact_customers",
            (
                F.abs(F.col("_approx") - F.col("exact_customers"))
                <= F.lit(3 * rsd) * F.col("exact_customers")
            ).alias("within_3rsd"),
        )
    )


@query(
    "sketch_price_quantiles",
    # Same bounds-oracle pattern as the HLL query above: the sketch
    # estimate itself is engine-specific, but Spark's EXACT
    # ``percentile`` and DuckDB's ``quantile_cont`` share the linear-
    # interpolation definition and are bit-identical on identical
    # doubles (verified on this corpus), so the oracle carries the
    # exact quantiles plus a TRUE flag, and the Spark side hash-matches
    # only if its sketch landed within 2% of the exact answer. The
    # exact percentile (a full per-group sort) exists solely for
    # verification — production uses the approx-only form (one-pass
    # constant-size mergeable sketch).
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.50) AS p50,
           quantile_cont(l_extendedprice, 0.75) AS p75,
           quantile_cont(l_extendedprice, 0.95) AS p95,
           TRUE AS within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="approx_percentile of extended price per return flag (accuracy "
    "10000, one-pass mergeable quantile sketch), verified against the "
    "exact interpolated quantiles via a 2% relative-error bound. "
    "Output flattened to scalar p25/p50/p75/p95 columns (array columns "
    "crash the driver's pandas canonicalizer).",
    tags=("sketch", "quantile", "agg"),
)
def sketch_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", [0.25, 0.5, 0.75, 0.95], 10000
            ).alias("_aq"),
            F.expr(
                "percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.95D))"
            ).alias("_eq"),
        )
    )
    within = None
    for i in range(4):
        ok_i = (
            F.abs(F.col("_aq")[i] - F.col("_eq")[i]) <= F.lit(0.02) * F.abs(F.col("_eq")[i])
        )
        within = ok_i if within is None else (within & ok_i)
    return q.select(
        "l_returnflag",
        F.col("_eq")[0].alias("p25"),
        F.col("_eq")[1].alias("p50"),
        F.col("_eq")[2].alias("p75"),
        F.col("_eq")[3].alias("p95"),
        within.alias("within_tol"),
    )
