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


def test_kmv_exact_branch_and_set_ops(spark):
    """Sets smaller than k: the sketch IS the distinct set, so every
    estimate must be EXACT — including the intersection (θ = 2^60)."""
    from data_pipeline_csv_spark.operators.kmv import kmv_setops, kmv_sketch

    a = spark.createDataFrame([(i,) for i in range(40)] * 3, "v long")
    b = spark.createDataFrame([(i,) for i in range(25, 55)], "v long")
    r = kmv_setops(kmv_sketch(a, "v", 128), kmv_sketch(b, "v", 128), 128).collect()[0]
    assert (r.n_a, r.n_b) == (40, 30)
    assert r.est_a == 40.0 and r.est_b == 30.0
    assert r.est_union == 55.0  # |0..39 ∪ 25..54|
    assert r.est_intersect == 15.0  # |25..39|


def test_kmv_estimator_within_error_bound(spark):
    """Above k the KMV estimate must land within 5 standard errors of
    the true distinct count (se ≈ true/sqrt(k-2)); union/intersection
    likewise. Deterministic for a fixed corpus."""
    from data_pipeline_csv_spark.operators.kmv import kmv_setops, kmv_sketch

    k = 128
    a = spark.createDataFrame([(i,) for i in range(3000)], "v long")
    b = spark.createDataFrame([(i,) for i in range(1500, 6000)], "v long")
    r = kmv_setops(kmv_sketch(a, "v", k), kmv_sketch(b, "v", k), k).collect()[0]
    se = 1.0 / (k - 2) ** 0.5
    assert abs(r.est_a - 3000) <= 5 * se * 3000, r.est_a
    assert abs(r.est_b - 4500) <= 5 * se * 4500, r.est_b
    assert abs(r.est_union - 6000) <= 5 * se * 6000, r.est_union
    # intersection variance is higher (θ from the weaker sketch)
    assert abs(r.est_intersect - 1500) <= 10 * se * 1500, r.est_intersect


def test_cms_one_sided_error_and_exact_when_wide(spark):
    """Count-Min never under-counts (est >= exact for every queried
    token); with w wide enough that no buckets collide the estimate
    is exact for every candidate."""
    from data_pipeline_csv_spark.operators.cms import cms_topk_audit

    rows = [("w%02d" % (i % 30),) for i in range(600)] + [("rare",)]
    tok = spark.createDataFrame(rows, "t string")
    out = cms_topk_audit(tok, "t", k=10, d=4, w=16).collect()
    assert len(out) == 10
    for r in out:
        assert r.overcount >= 0 and r.est_cnt == r.exact_cnt + r.overcount, r

    wide = cms_topk_audit(tok, "t", k=31, d=4, w=65536).collect()
    assert len(wide) == 31
    for r in wide:
        assert r.overcount == 0, r  # no collisions at this width
    assert {r.token: r.exact_cnt for r in wide}["rare"] == 1


def test_correlated_join_size_exact_at_full_rate(spark, sf_dir):
    """At p_bits=0 (tau = 2^60, every key sampled) the correlated-
    sampling estimator degenerates to the exact join size — est ==
    exact, rel_err 0. At the registered 1/64 rate the estimate is
    deterministic and unbiased-by-construction; pin only that it is
    integer-consistent (est = 64 * sampled sum) and the audit columns
    agree with a direct computation."""
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.kmv import correlated_join_size
    from data_pipeline_csv_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    full = correlated_join_size(li, li, "l_partkey", "l_partkey", p_bits=0).collect()[0]
    assert full["est_join_size"] == full["exact_join_size"]
    assert full["rel_err_fp"] == 0 and full["p_denom"] == 1

    est = correlated_join_size(li, li, "l_partkey", "l_partkey", p_bits=6).collect()[0]
    assert est["p_denom"] == 64
    assert est["est_join_size"] % 64 == 0
    assert est["exact_join_size"] == full["exact_join_size"]
    want_err = (
        1_000_000 * abs(est["est_join_size"] - est["exact_join_size"])
    ) // est["exact_join_size"]
    assert est["rel_err_fp"] == want_err
    # two-table form agrees with the self-join form on identical inputs
    other = correlated_join_size(
        li.limit(0).unionByName(li), li, "l_partkey", "l_partkey", p_bits=6
    ).collect()[0]
    assert other == est


def test_join_strategy_flips_with_threshold(spark, sf_dir):
    """join_with_estimated_strategy: actual_rows is the exact join
    count regardless of the chosen plan, and the strategy flips as the
    threshold crosses the (deterministic) estimate."""
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.kmv import (
        estimate_join_size,
        join_with_estimated_strategy,
    )
    from data_pipeline_csv_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    exact = li.join(urgent, li["l_orderkey"] == urgent["o_orderkey"]).count()
    est = estimate_join_size(li, urgent, "l_orderkey", "o_orderkey").collect()[0]

    hi = join_with_estimated_strategy(
        li, urgent, "l_orderkey", "o_orderkey", broadcast_threshold=10**12
    ).collect()[0]
    assert hi["strategy"] == "broadcast"
    assert hi["actual_rows"] == exact
    assert hi["est_join_size"] == est["est_join_size"]

    lo = join_with_estimated_strategy(
        li, urgent, "l_orderkey", "o_orderkey", broadcast_threshold=0
    ).collect()[0]
    assert lo["strategy"] == "shuffle"
    assert lo["actual_rows"] == exact
    assert lo["est_join_size"] == est["est_join_size"]
