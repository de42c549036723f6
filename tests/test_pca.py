"""Power-iteration PCA (operators/pca.py): correctness on planted
anisotropic data, determinism, and the source-overlap matrix."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_pipeline_csv_spark.operators.pca import (
    power_iteration_top,
    project_onto,
)


def _planted_df(spark, n=200, dim=8, axis=2, spread=10.0, seed=7):
    """Rows spread ``spread``x wider along one axis than the others —
    the top principal direction is that axis."""
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(n, dim))
    data[:, axis] *= spread
    rows = [(i, [float(x) for x in data[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


def test_power_iteration_finds_planted_axis(spark):
    df = _planted_df(spark)
    v, eig = power_iteration_top(df, dim=8, iters=5)
    assert abs(abs(v[2]) - 1.0) < 0.05  # dominant loading on the wide axis
    assert sum(abs(x) for i, x in enumerate(v) if i != 2) < 0.3
    assert abs(sum(x * x for x in v) - 1.0) < 1e-9  # unit norm
    # eigval ~ n * var along the axis = 200 * 100
    assert eig == pytest.approx(200 * 100, rel=0.35)


def test_power_iteration_is_deterministic(spark):
    df = _planted_df(spark).repartition(7)
    v1, e1 = power_iteration_top(df, dim=8, iters=3)
    v2, e2 = power_iteration_top(df.repartition(3), dim=8, iters=3)
    assert v1 == v2 and e1 == e2  # bit-exact across partitionings


def test_projection_orders_by_axis_coordinate(spark):
    df = _planted_df(spark)
    v, _ = power_iteration_top(df, dim=8, iters=5)
    proj = {r["vec_id"]: r["proj"] for r in project_onto(df, v).collect()}
    coords = {
        r["vec_id"]: r["x"]
        for r in df.select("vec_id", F.col("embedding")[2].alias("x")).collect()
    }
    ids = sorted(coords)
    sign = 1.0 if v[2] > 0 else -1.0
    got = [proj[i] for i in ids]
    want = [sign * coords[i] for i in ids]
    # projection is dominated by the planted axis: rank correlation ~1
    order_got = np.argsort(got)
    order_want = np.argsort(want)
    agree = np.mean(order_got[:20] == order_want[:20])
    assert agree > 0.8


def test_projection_plan_is_map_side_only(spark):
    df = _planted_df(spark)
    plan = project_onto(df, [1.0 / math.sqrt(8)] * 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: one scan, one fold


def test_source_overlap_hand_computed(spark):
    from data_pipeline_csv_spark.operators.dedup import source_overlap_matrix

    rows = [
        (0, "a one two three four", "s1"),
        (1, "one two three five six", "s2"),
        (2, "zz yy xx ww vv", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    out = {
        (r["src_a"], r["src_b"]): r
        for r in source_overlap_matrix(df).collect()
    }
    # s1 shingles: {a one two, one two three, two three four} (3)
    # s2 shingles: {one two three, two three five, three five six} (3)
    # shared = {one two three} -> J = 1/5
    r = out[("s1", "s2")]
    assert r["shared"] == 1 and r["n_a"] == 3 and r["n_b"] == 3
    assert r["jaccard"] == pytest.approx(0.2)
    # s3 shares nothing with anyone -> no row at all
    assert ("s1", "s3") not in out and ("s2", "s3") not in out
