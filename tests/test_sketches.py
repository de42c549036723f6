"""Sketch accuracy bounds vs exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_csv_spark.queries import REGISTRY
from data_pipeline_csv_spark.sources.tables import load_table


def test_hll_within_rsd(spark, sf_dir):
    rows = REGISTRY["sketch_distinct_customers"].fn(spark, sf_dir).collect()
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert {r["o_orderpriority"] for r in rows} == set(exact)
    for r in rows:
        assert r["exact_customers"] == exact[r["o_orderpriority"]]
        assert r["within_3rsd"] is True, r


def test_quantile_sketch_brackets_exact(spark, sf_dir):
    got = {
        r["l_returnflag"]: [r["p25"], r["p50"], r["p75"], r["p95"]]
        for r in REGISTRY["sketch_price_quantiles"].fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    for flag, qs in got.items():
        vals = [
            r["l_extendedprice"]
            for r in li.filter(F.col("l_returnflag") == flag).select("l_extendedprice").collect()
        ]
        vals.sort()
        n = len(vals)
        for p, est in zip([0.25, 0.5, 0.75, 0.95], qs):
            exact = vals[min(n - 1, int(p * n))]
            assert abs(est - exact) / max(exact, 1.0) < 0.05, (flag, p, est, exact)
