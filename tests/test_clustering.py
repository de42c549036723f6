"""K-means: the distributed fixed-point Lloyd's vs a single-box numpy
reference, plus the determinism invariants the oracle relies on."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_csv_spark.operators.clustering import SCALE, kmeans_fit
from data_pipeline_csv_spark.sources.tables import load_table


def _numpy_kmeans(M: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """Independent reference: same fixed-point contract, plain numpy."""
    order = np.argsort(ids)
    init = M[order[:k]]
    C = init.astype(np.float64)
    alive = np.ones(k, dtype=bool)
    sizes = np.zeros(k, dtype=np.int64)
    for _ in range(iters):
        alive_ids = np.flatnonzero(alive)
        D = np.empty((len(M), len(alive_ids)), dtype=np.int64)
        for jj, j in enumerate(alive_ids):
            diff = M - C[j]
            D[:, jj] = np.floor((diff * diff) * SCALE).astype(np.int64).sum(axis=1)
        assign = alive_ids[D.argmin(axis=1)]
        Vfp = np.floor(M * SCALE).astype(np.int64)
        cnt = np.zeros(k, dtype=np.int64)
        S = np.zeros_like(C, dtype=np.int64)
        for j in np.unique(assign):
            sel = assign == j
            cnt[j] = sel.sum()
            S[j] = Vfp[sel].sum(axis=0)
        alive = cnt > 0
        C = np.where(alive[:, None], S.astype(np.float64) / np.maximum(cnt, 1)[:, None] / float(SCALE), C)
        sizes = cnt
    return C, sizes, alive


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def test_kmeans_matches_numpy_reference_bitwise(spark, corpus):
    rows = corpus.collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])

    want_C, want_sizes, want_alive = _numpy_kmeans(M, ids, k=8, iters=2)
    got_C, got_sizes, got_alive = kmeans_fit(corpus, k=8, iters=2)

    assert (got_alive == want_alive).all()
    assert (got_sizes == want_sizes).all()
    # fixed-point contract -> bit equality, not tolerance
    assert (got_C[got_alive] == want_C[want_alive]).all()


def test_kmeans_sizes_partition_corpus(spark, corpus):
    n = corpus.count()
    _, sizes, alive = kmeans_fit(corpus, k=8, iters=2)
    assert sizes.sum() == n
    assert alive.any()


def test_reduce_partials_collects_at_most_k_rows(spark, corpus):
    """The Spark-side groupBy must hand the driver <= k rows per
    iteration — not O(k * n_batches) — regardless of partitioning."""
    from data_pipeline_csv_spark.operators.clustering import _reduce_partials

    rows = corpus.orderBy("vec_id").limit(4).collect()
    C = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    alive = np.ones(len(C), dtype=bool)
    reduced = _reduce_partials(corpus.repartition(13), C, alive)
    assert len(reduced) <= 4
    n = corpus.count()
    assert sum(r["n"] for r in reduced) == n


def test_kmeans_repartition_invariant(spark, corpus):
    """Partial-sum reduce must not depend on batch/partition layout."""
    a = kmeans_fit(corpus, k=4, iters=2)
    b = kmeans_fit(corpus.repartition(13), k=4, iters=2)
    assert (a[1] == b[1]).all()
    assert (a[0][a[2]] == b[0][b[2]]).all()
