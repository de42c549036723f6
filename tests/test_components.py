"""connected_components vs a driver-side union-find on random graphs."""

from __future__ import annotations

import random

from data_pipeline_csv_spark.operators.components import connected_components


def _uf_components(edges):
    nodes = sorted({x for e in edges for x in e})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    members: dict[int, list[int]] = {}
    for n in nodes:
        members.setdefault(find(n), []).append(n)
    return {n: min(members[find(n)]) for n in nodes}


def _check(spark, edges):
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == _uf_components(edges)


def test_random_graphs_match_union_find(spark):
    rng = random.Random(13)
    for n_nodes, n_edges in [(30, 20), (100, 80), (50, 200), (200, 150)]:
        nodes = rng.sample(range(10_000), n_nodes)
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(n_edges)
        ]
        edges = [(u, v) for u, v in edges if u != v]
        _check(spark, edges)


def test_chain_worst_case_diameter(spark):
    # a pure path graph maximizes rounds needed; star-contraction must
    # still converge (label propagation would need O(n) rounds here)
    chain = sorted(random.Random(5).sample(range(50_000), 80), reverse=True)
    _check(spark, list(zip(chain, chain[1:])))


def test_distributed_star_loop_matches_driver_solve(spark, monkeypatch):
    """r15: small edge sets are solved on the driver (union-find) and
    the distributed star loop only runs past _DRIVER_SOLVE_MAX_EDGES.
    Force BOTH paths over the same graph and require identical labels
    (and both equal to the reference union-find) — the distributed
    loop must not rot while the default tests take the driver path."""
    import data_pipeline_csv_spark.operators.components as C

    rng = random.Random(7)
    nodes = rng.sample(range(100_000), 300)
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(400)]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, ["u", "v"])
    monkeypatch.setattr(C, "_DRIVER_SOLVE_MAX_EDGES", 0)  # force star loop
    dist = {r["node"]: r["component"] for r in C.connected_components(df).collect()}
    monkeypatch.undo()
    drv = {r["node"]: r["component"] for r in C.connected_components(df).collect()}
    assert dist == drv == _uf_components(edges)


def test_self_loops_and_duplicates_tolerated(spark):
    edges = [(1, 2), (2, 1), (1, 1), (2, 3), (2, 3), (9, 8)]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 8: 8, 9: 8}
