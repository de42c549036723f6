"""Incremental materialized-view refresh as a driver-checked query.

The MV: per (ship_year, ship_month) revenue rollup over lineitem. The
incremental path splits the fact table into a base snapshot (90% of
order keys) and a delta batch (the remaining 10%), aggregates each
into mergeable state SEPARATELY, merges, and finishes — never
re-aggregating base rows together with delta rows. The oracle is the
plain full-table GROUP BY: fixed-point state merge is bit-identical
to a from-scratch recompute, which is exactly the guarantee a
production refresh needs (operators/incremental.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import (
    finalize_state,
    merge_agg_state,
    partial_agg_state,
)
from ..sources.tables import load_table
from .canon import REV_SCALE, REV_TERM_SQL, fp_sql, rev_term
from .registry import query


def _keyed(df: DataFrame) -> DataFrame:
    return df.select(
        F.year("l_shipdate").cast("bigint").alias("ship_year"),
        F.month("l_shipdate").cast("bigint").alias("ship_month"),
        F.col("l_extendedprice"),
        F.col("l_discount"),
    )


@query(
    "incremental_mv_refresh",
    oracle=f"""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(month(l_shipdate) AS BIGINT) AS ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {fp_sql(REV_TERM_SQL, REV_SCALE)} AS sum_revenue,
           ({fp_sql(REV_TERM_SQL, REV_SCALE)}) / COUNT(*) AS avg_revenue,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem
    GROUP BY 1, 2
    """,
    doc="Incremental MV refresh: base (o_orderkey%10!=0) and delta "
    "(%10=0) halves of lineitem are aggregated into mergeable state "
    "independently, merged on the rollup key, and finished — the "
    "oracle is the FULL-table GROUP BY, proving merged incremental "
    "state is bit-identical to recomputing from scratch. At 100 TB "
    "the base state is a stored table of |keys| rows; refresh "
    "shuffles only the delta partition plus that state "
    "(operators/incremental.py).",
    tags=("incremental", "mv", "aggregate", "state-merge"),
)
def incremental_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    sums = {"sum_revenue": (rev_term(), REV_SCALE)}
    mins = {"min_price": F.col("l_extendedprice")}
    maxs = {"max_price": F.col("l_extendedprice")}
    keys = ["ship_year", "ship_month"]

    base = partial_agg_state(
        _keyed(li.filter(F.col("l_orderkey") % 10 != 0)), keys, sums, mins, maxs
    )
    delta = partial_agg_state(
        _keyed(li.filter(F.col("l_orderkey") % 10 == 0)), keys, sums, mins, maxs
    )
    merged = merge_agg_state(
        [base, delta], keys, mins=["min_price"], maxs=["max_price"]
    )
    out = finalize_state(
        merged, sums={"sum_revenue": REV_SCALE}, avgs={"avg_revenue": "sum_revenue"}
    )
    return out.select(
        "ship_year",
        "ship_month",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        "sum_revenue",
        "avg_revenue",
        F.col("min_price").cast("double").alias("min_price"),
        F.col("max_price").cast("double").alias("max_price"),
    )
