"""Approximate-sketch queries: HLL distinct counts, quantile sketches.

Approximate by construction — estimates are engine-specific, so no
DuckDB value oracle (rows-only in the driver); accuracy bounds vs the
exact answers are pinned in tests/test_sketches.py. These are the
100 TB workhorses: a single pass + constant-size mergeable state where
the exact forms (countDistinct, sort-based percentiles) shuffle the
full key set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


@query(
    "sketch_distinct_customers",
    oracle=None,  # HLL estimate; tolerance vs exact pinned in tests
    doc="approx_count_distinct (HyperLogLog++, rsd=0.01) of customers per "
    "order priority — mergeable constant-size state vs a full key shuffle.",
    tags=("sketch", "hll", "agg"),
)
def sketch_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_customers"))
    )


@query(
    "sketch_price_quantiles",
    oracle=None,  # KLL-style sketch estimate; tolerance pinned in tests
    doc="approx_percentile of extended price per return flag (accuracy "
    "10000): one-pass mergeable quantile sketch. Output flattened to "
    "scalar p25/p50/p75/p95 columns (array columns crash the driver's "
    "pandas canonicalizer).",
    tags=("sketch", "quantile", "agg"),
)
def sketch_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", [0.25, 0.5, 0.75, 0.95], 10000
            ).alias("_q")
        )
    )
    return q.select(
        "l_returnflag",
        F.col("_q")[0].alias("p25"),
        F.col("_q")[1].alias("p50"),
        F.col("_q")[2].alias("p75"),
        F.col("_q")[3].alias("p95"),
    )
