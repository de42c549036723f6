#!/usr/bin/env python
"""Scaling probe for the incremental triangle FOLD at constant average
degree — the companion to tools/scale_spotcheck.py for
graph_triangle_incremental.

Why not probe it through the registry like the others: the registered
query's input graph (exact cosine >= 0.25 pairs) is ~2% DENSE (44,380
edges on 2,000 vectors at sf0.1), so replicating the corpus 10x grows
the edge set ~100x — a 10x-corpus probe would measure that genuine
densification (a property of the similarity threshold, not of the
operator; at production thresholds >= 0.9 the graph is sparse), not
the fold machinery. This probe instead scales a SPARSE graph the way
real sparse graphs scale — node count up, average degree constant —
and times `incremental_triangle_stats` folding a fixed 20% vertex
batch into the standing 80% index at 1x and 10x.

Graph model: n nodes, avg degree ~12, edges from a deterministic
splitmix-style hash (node i -> 6 pseudo-random neighbors), so both
scales come from the same generator and the 10x graph has 10x nodes,
~10x edges, ~10x wedges. Batch = ids % 5 == 0, exactly the registered
query's split discipline. Prints one JSON line; SCALE.md quotes it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_csv_spark.operators.graph import (
    edge_incremental_triangle_stats,
    graph_degrees,
    incremental_triangle_stats,
    triangle_stats,
)
from data_pipeline_csv_spark.session import get_spark

DEG_HALF = 6  # out-stubs per node -> avg degree ~12


def build_graph(spark, n_nodes: int):
    """Deterministic sparse multigraph: node i links to 6 hashed
    neighbors (canonicalized, dedup'd). Same generator at every scale,
    so degree distribution is scale-invariant."""
    nodes = spark.range(n_nodes)
    e = (
        nodes.select(
            F.col("id").alias("u"),
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            F.xxhash64(F.col("id"), F.lit(k)), F.lit(n_nodes)
                        ).alias(f"v{k}")
                        for k in range(DEG_HALF)
                    ]
                )
            ).alias("v"),
        )
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return e


def split(spark, edges):
    new_pred_u = F.col("u") % 5 == 0
    new_pred_v = F.col("v") % 5 == 0
    base = edges.filter(~new_pred_u & ~new_pred_v)
    cross = edges.filter(new_pred_u != new_pred_v).select(
        F.when(new_pred_v, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(new_pred_v, F.col("v")).otherwise(F.col("u")).alias("x"),
    )
    nn = edges.filter(new_pred_u & new_pred_v).select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    return base, cross, nn


def probe(spark, n_nodes: int, tmp: str) -> dict:
    edges = build_graph(spark, n_nodes)
    base, cross, nn = split(spark, edges)
    # standing index: persisted once, exactly like the registered cache
    base.write.mode("overwrite").parquet(f"{tmp}/edges")
    base_rb = spark.read.parquet(f"{tmp}/edges")
    graph_degrees(base_rb).write.mode("overwrite").parquet(f"{tmp}/deg")
    triangle_stats(base_rb).write.mode("overwrite").parquet(f"{tmp}/counts")
    cross = cross.localCheckpoint()
    nn = nn.localCheckpoint()
    args = (
        base_rb,
        spark.read.parquet(f"{tmp}/deg"),
        spark.read.parquet(f"{tmp}/counts"),
        cross,
        nn,
    )
    # warmup then min-of-2 (the spotcheck protocol)
    incremental_triangle_stats(*args).write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        incremental_triangle_stats(*args).write.format("noop").mode(
            "overwrite"
        ).save()
        el = round(time.perf_counter() - t0, 2)
        best = el if best is None or el < best else best
    row = triangle_stats(edges).collect()[0]
    got = incremental_triangle_stats(*args).collect()[0]
    assert got.asDict() == row.asDict(), (got, row)  # fold == one-shot
    return {
        "n_nodes": n_nodes,
        "n_edges": row["n_edges"],
        "n_triangles": row["n_triangles"],
        "fold_sec": best,
    }


def edge_probe(spark, n_nodes: int, tmp: str) -> dict:
    """Same protocol for the EDGE-arrival fold: the graph splits by
    EDGES (pmod(31u + v, 8) == 0, the registered query's discipline),
    the 7/8 base is the persisted standing index, and the 1/8 batch
    folds in via edge_incremental_triangle_stats."""
    edges = build_graph(spark, n_nodes)
    batch_pred = F.pmod(F.col("u") * F.lit(31) + F.col("v"), F.lit(8)) == 0
    edges.filter(~batch_pred).write.mode("overwrite").parquet(f"{tmp}/base")
    base_rb = spark.read.parquet(f"{tmp}/base")
    graph_degrees(base_rb).write.mode("overwrite").parquet(f"{tmp}/deg")
    triangle_stats(base_rb).write.mode("overwrite").parquet(f"{tmp}/counts")
    batch = edges.filter(batch_pred).localCheckpoint()
    args = (
        base_rb,
        spark.read.parquet(f"{tmp}/deg"),
        spark.read.parquet(f"{tmp}/counts"),
        batch,
    )
    edge_incremental_triangle_stats(*args).write.format("noop").mode(
        "overwrite"
    ).save()
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        edge_incremental_triangle_stats(*args).write.format("noop").mode(
            "overwrite"
        ).save()
        el = round(time.perf_counter() - t0, 2)
        best = el if best is None or el < best else best
    row = triangle_stats(edges).collect()[0]
    got = edge_incremental_triangle_stats(*args).collect()[0]
    assert got.asDict() == row.asDict(), (got, row)  # fold == one-shot
    return {
        "n_nodes": n_nodes,
        "n_edges": row["n_edges"],
        "n_triangles": row["n_triangles"],
        "fold_sec": best,
    }


def main() -> None:
    import shutil
    import tempfile

    spark = get_spark(
        app_name="triangle_fold_probe",
        driver_memory=os.environ.get("SPARK_DRIVER_MEMORY", "64g"),
    )
    out = {}
    for label, n in (("1x", 100_000), ("10x", 1_000_000)):
        tmp = tempfile.mkdtemp(prefix="sg_triprobe_")
        try:
            out[label] = probe(spark, n, tmp)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        print(label, out[label], flush=True)
    out["ratio_10x"] = round(out["10x"]["fold_sec"] / out["1x"]["fold_sec"], 2)
    print(json.dumps({"metric": "triangle_fold_probe", **out}))
    eout = {}
    for label, n in (("1x", 100_000), ("10x", 1_000_000)):
        tmp = tempfile.mkdtemp(prefix="sg_triedgeprobe_")
        try:
            eout[label] = edge_probe(spark, n, tmp)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        print("edge", label, eout[label], flush=True)
    eout["ratio_10x"] = round(
        eout["10x"]["fold_sec"] / eout["1x"]["fold_sec"], 2
    )
    print(json.dumps({"metric": "triangle_edge_fold_probe", **eout}))


if __name__ == "__main__":
    main()
