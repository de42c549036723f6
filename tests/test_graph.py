"""PageRank operator: pinned against a numpy power-iteration reference
on a literal graph, plus partition-invariance (the fixed-point sum
must make the result independent of layout)."""

from __future__ import annotations

import pytest

import numpy as np

from data_pipeline_csv_spark.operators.graph import pagerank

# a small symmetric graph: two triangles bridged by one edge
_EDGES = [
    (1, 2), (2, 3), (3, 1),
    (4, 5), (5, 6), (6, 4),
    (3, 4),
]


def _sym(edges):
    return [(a, b) for a, b in edges] + [(b, a) for a, b in edges]


def _numpy_pagerank(edges, iters=2, d=0.85):
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for a, _ in edges:
        out[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        for a, b in edges:
            nxt[idx[b]] += d * r[idx[a]] / out[idx[a]]
        r = nxt
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_matches_numpy_reference(spark):
    edges = _sym(_EDGES)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=2).collect()}
    want = _numpy_pagerank(edges, iters=2)
    assert set(got) == set(want)
    for node in want:
        # fixed-point quantization costs < 1e-8 per contribution
        assert abs(got[node] - want[node]) < 1e-6
    # bridge endpoints (3, 4) outrank pure triangle members
    assert got[3] > got[1] and got[4] > got[5]
    # mass conservation up to quantization loss
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_rejects_dangling_nodes(spark):
    """A node with no out-edge (7 below, an in-edge only) would have
    its mass silently dropped; the precondition check must fail fast,
    and the opt-out must preserve the documented truncated semantics."""
    import pytest

    edges = _sym(_EDGES) + [(1, 7)]  # 7 is dangling: in-edge only
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(ValueError, match="dangling"):
        pagerank(df, iterations=2)
    # opt-out still runs (truncated-mass semantics, mass < 1)
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=2, check_dangling=False).collect()}
    assert 7 in got and sum(got.values()) < 1.0


def test_pagerank_partition_invariant(spark):
    edges = _sym(_EDGES)
    one = spark.createDataFrame(edges, "src long, dst long").coalesce(1)
    many = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    res_one = {r["node"]: r["rank"] for r in pagerank(one, iterations=3).collect()}
    res_many = {r["node"]: r["rank"] for r in pagerank(many, iterations=3).collect()}
    assert res_one == res_many  # bit-identical, not approximately


def _numpy_pagerank_dangling(edges, iters=2, d=0.85):
    """Full PageRank with equal dangling-mass redistribution."""
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for a, _ in edges:
        out[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = sum(r[i] for i in range(n) if out[i] == 0)
        nxt = np.full(n, (1.0 - d) / n + d * dangling / n)
        for a, b in edges:
            nxt[idx[b]] += d * r[idx[a]] / out[idx[a]]
        r = nxt
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_dangling_redistribution(spark):
    """redistribute_dangling=True must implement the standard full
    PageRank: dangling mass shared equally, sources retained, total
    mass conserved — pinned against a numpy reference on a graph with
    a sink (7) AND a pure source (8)."""
    edges = _sym(_EDGES) + [(1, 7), (8, 1)]  # 7 sinks, 8 sources
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=2, redistribute_dangling=True).collect()
    }
    want = _numpy_pagerank_dangling(edges, iters=2)
    assert set(got) == set(want)  # source 8 is retained
    for node in want:
        assert abs(got[node] - want[node]) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-6  # mass conserved


def test_pagerank_dangling_partition_invariant(spark):
    edges = _sym(_EDGES) + [(1, 7), (8, 1)]
    one = spark.createDataFrame(edges, "src long, dst long").coalesce(1)
    many = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    a = {r["node"]: r["rank"]
         for r in pagerank(one, iterations=3, redistribute_dangling=True).collect()}
    b = {r["node"]: r["rank"]
         for r in pagerank(many, iterations=3, redistribute_dangling=True).collect()}
    assert a == b  # bit-identical, not approximately


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques bridged by one edge: after 2 rounds every clique
    member carries its clique's minimum id as community label."""
    from data_pipeline_csv_spark.operators.graph import label_propagation

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a != b]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10), (10, 4)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    out = {r["node"]: r for r in label_propagation(df, iterations=2).collect()}
    assert all(out[n]["community"] == 1 for n in (1, 2, 3))
    assert all(out[n]["community"] == 10 for n in (11, 12, 13))
    # sizes are exact and consistent with the labeling
    from collections import Counter

    sizes = Counter(r["community"] for r in out.values())
    assert all(r["community_size"] == sizes[r["community"]] for r in out.values())


def test_label_propagation_deterministic_under_repartition(spark):
    from data_pipeline_csv_spark.operators.graph import label_propagation

    edges = [(a, b) for a in range(1, 8) for b in range(1, 8) if a != b and (a + b) % 3]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    r1 = sorted(map(tuple, label_propagation(df.repartition(5), 2).collect()))
    r2 = sorted(map(tuple, label_propagation(df.repartition(2), 2).collect()))
    assert r1 == r2


def test_triangle_stats_matches_bruteforce(spark):
    """Degree-oriented counting == brute force on seeded random graphs
    (incl. a star hub, the orientation's worst case)."""
    import itertools
    import random

    from data_pipeline_csv_spark.operators.graph import triangle_stats

    rng = random.Random(42)
    cases = []
    n = 40
    cases.append([(u, v) for u in range(n) for v in range(u + 1, n) if rng.random() < 0.15])
    cases.append([(0, v) for v in range(1, 30)] + [(1, 2), (2, 3), (5, 6)])  # star hub
    cases.append([(u, v) for u in range(8) for v in range(u + 1, 8)])  # clique
    for edges in cases:
        eset = set(edges)
        tri = sum(
            1
            for a, b, c in itertools.combinations(sorted({x for e in edges for x in e}), 3)
            if (a, b) in eset and (b, c) in eset and (a, c) in eset
        )
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        wedges = sum(d * (d - 1) // 2 for d in deg.values())
        df = spark.createDataFrame(edges, "u long, v long")
        got = triangle_stats(df).collect()[0]
        assert got["n_edges"] == len(eset)
        assert got["n_wedges"] == wedges
        assert got["n_triangles"] == tri


def test_incremental_triangles_equal_oneshot(spark):
    """incremental_triangle_stats folds a vertex-arrival batch into
    the standing index and must equal triangle_stats on the union
    graph EXACTLY — on a random graph, on a hub graph (one old node
    adjacent to everything), and with an empty batch."""
    import random

    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.graph import (
        graph_degrees,
        incremental_triangle_stats,
        triangle_stats,
    )

    rng = random.Random(7)

    def run(all_edges, new_nodes):
        new = set(new_nodes)
        canon = {(min(a, b), max(a, b)) for a, b in all_edges if a != b}
        base = [(u, v) for u, v in canon if u not in new and v not in new]
        cross = [
            (a, x)
            for u, v in canon
            if (u in new) != (v in new)
            for a, x in [((u, v) if v in new else (v, u))]
        ]
        nn = [(u, v) for u, v in canon if u in new and v in new]
        base_df = spark.createDataFrame(base or [(0, 0)], "u long, v long")
        if not base:
            base_df = base_df.filter(F.lit(False))
        cross_df = spark.createDataFrame(cross or [(0, 0)], "a long, x long")
        if not cross:
            cross_df = cross_df.filter(F.lit(False))
        nn_df = spark.createDataFrame(nn or [(0, 0)], "x long, y long")
        if not nn:
            nn_df = nn_df.filter(F.lit(False))
        union_df = spark.createDataFrame(sorted(canon), "u long, v long")
        got = incremental_triangle_stats(
            base_df,
            graph_degrees(base_df),
            triangle_stats(base_df),
            cross_df,
            nn_df,
        ).collect()[0]
        want = triangle_stats(union_df).collect()[0]
        assert got.asDict() == want.asDict(), (got, want)
        assert want["n_triangles"] > 0 or not canon

    # random graph, 30 nodes, new = ids % 4 == 0
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    run(edges, [n for n in range(30) if n % 4 == 0])

    # hub: old node 0 adjacent to all; batch brings a clique of 4
    hub = [(0, i) for i in range(1, 20)] + [(i, i + 1) for i in range(1, 19)]
    hub += [(a, b) for a in (100, 101, 102, 103) for b in (0, 1, 2)]
    hub += [(100, 101), (100, 102), (100, 103), (101, 102), (101, 103), (102, 103)]
    run(hub, [100, 101, 102, 103])

    # empty batch: counts must pass through unchanged
    run([(1, 2), (2, 3), (3, 1)], [])

    # empty BASE: the very first batch into a brand-new index — the
    # standing counts are all zero (triangle_stats must coalesce its
    # wedge sum, not propagate SUM-over-empty NULL)
    run([(100, 101), (101, 102), (100, 102)], [100, 101, 102])


@pytest.mark.slow
def test_edge_incremental_triangles_equal_oneshot(spark):
    """edge_incremental_triangle_stats folds an edge-arrival batch into
    the standing index and must equal triangle_stats on the union graph
    EXACTLY — edges between existing vertices (the case the vertex
    fold cannot express), a hub graph, batches touching brand-new
    vertices, batches overlapping the base (idempotent arrival),
    duplicate/self-loop arrivals, an empty batch, and an empty base."""
    import random

    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.graph import (
        edge_incremental_triangle_stats,
        graph_degrees,
        triangle_stats,
    )

    rng = random.Random(12)

    def df(pairs, cols="u long, v long"):
        if not pairs:
            return spark.createDataFrame([(0, 0)], cols).filter(F.lit(False))
        return spark.createDataFrame(pairs, cols)

    def run(base_edges, batch_edges):
        canon = lambda es: {(min(a, b), max(a, b)) for a, b in es if a != b}
        base = sorted(canon(base_edges))
        union = sorted(canon(base_edges) | canon(batch_edges))
        base_df = df(base)
        got = edge_incremental_triangle_stats(
            base_df,
            graph_degrees(base_df),
            triangle_stats(base_df),
            df(list(batch_edges)),
        ).collect()[0]
        want = triangle_stats(df(union)).collect()[0]
        assert got.asDict() == want.asDict(), (got, want)

    # random graph, ~40% of edges arrive as the batch (old-old edges)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(150)})
    run(edges[: len(edges) * 3 // 5], edges[len(edges) * 3 // 5 :])

    # hub: node 0 adjacent to everything; batch closes wedges at the hub
    hub_base = [(0, i) for i in range(1, 20)]
    hub_batch = [(i, i + 1) for i in range(1, 19)] + [(1, 5), (2, 9)]
    run(hub_base, hub_batch)

    # batch touches brand-new vertices too (the vertex-arrival special
    # case expressed through the edge fold)
    run([(1, 2), (2, 3), (3, 1)], [(3, 100), (100, 101), (101, 1), (2, 100)])

    # overlap + duplicates + self-loops in the arriving batch
    run(
        [(1, 2), (2, 3), (3, 1), (3, 4)],
        [(1, 2), (2, 1), (4, 1), (4, 1), (5, 5), (2, 4)],
    )

    # empty batch: counts pass through unchanged
    run([(1, 2), (2, 3), (3, 1)], [])

    # empty base: the fold must equal the one-shot on the batch alone
    run([], [(1, 2), (2, 3), (3, 1), (1, 4)])
