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
    rows = REGISTRY["sketch_price_quantiles"].fn(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    for r in rows:
        assert r["within_tol"] is True, r  # sketch inside the 2% bound
        vals = sorted(
            x["l_extendedprice"]
            for x in li.filter(F.col("l_returnflag") == r["l_returnflag"])
            .select("l_extendedprice")
            .collect()
        )
        n = len(vals)
        for p, got in zip([0.25, 0.5, 0.75, 0.95], [r["p25"], r["p50"], r["p75"], r["p95"]]):
            # linear-interpolation definition, replayed independently
            pos = p * (n - 1)
            lo, frac = int(pos), pos - int(pos)
            exact = vals[lo] + (vals[min(lo + 1, n - 1)] - vals[lo]) * frac
            assert abs(got - exact) <= 1e-9 * max(1.0, abs(exact)), (r["l_returnflag"], p, got, exact)
