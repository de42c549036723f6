"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — brute-force top-k: broadcast the (small) query
  set against the corpus scan; one pass over the corpus computes all
  query dot products (no shuffle until the final per-query top-k,
  which is a window over k*|queries| candidate rows after a
  partition-local prune). Exact-decimal math so the DuckDB oracle
  matches bit-for-bit.

- :func:`ann_ivf_topk` — IVF-style approximate search: a deterministic
  centroid subset partitions the corpus into inverted lists; queries
  probe the ``nprobe`` nearest centroids and re-rank only those lists.
  At 100 TB the corpus is bucketed/partitioned by list id on disk so a
  probe reads only matching partitions; here the pruning join expresses
  the same plan shape.

Scale notes: brute force is O(|corpus| * |queries| * dim) map-side —
the right baseline when |queries| is small and broadcastable. IVF cuts
the scanned fraction to ~nprobe/nlists. Skewed lists are split by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.vector import cosine_from_parts, cosine_fast, norm_sq_exact, dot_exact


def _with_queries(corpus: DataFrame, query_ids: list[int]) -> tuple[DataFrame, DataFrame]:
    queries = corpus.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    return corpus, queries


def cosine_topk(corpus: DataFrame, query_ids: list[int], k: int = 10) -> DataFrame:
    """Exact brute-force cosine top-k of corpus vectors per query vector.

    Excludes the query vector itself; ties broken by vec_id.
    Returns (q_id, vec_id, cosine, rank).
    """
    corpus, queries = _with_queries(corpus, query_ids)
    corpus_n = corpus.select(
        "vec_id", "embedding", norm_sq_exact(F.col("embedding")).alias("nrm")
    )
    queries_n = queries.select(
        "q_id", "q_emb", norm_sq_exact(F.col("q_emb")).alias("q_nrm")
    )
    scored = (
        corpus_n.join(F.broadcast(queries_n), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            cosine_from_parts(
                dot_exact(F.col("q_emb"), F.col("embedding")),
                F.col("q_nrm"),
                F.col("nrm"),
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cosine", "rank")
    )


def ann_ivf_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nlists: int = 16,
    nprobe: int = 4,
    centroid_stride: int | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-bucketed approximate cosine top-k.

    Default centroids are a deterministic corpus subset (every
    ``stride``-th vec_id) — cheap and reproducible; pass
    ``centroids=kmeans_centroids_df(...)`` (operators/clustering.py)
    for trained lists, which tighten the probe/recall trade-off on
    clustered corpora. Each corpus vector joins its nearest centroid
    (broadcast); each query probes its ``nprobe`` nearest lists and
    re-ranks only those lists with the fast double cosine. Returns
    (q_id, vec_id, rank) — approximate by construction.
    """
    corpus = corpus.select("vec_id", "embedding")
    if centroids is None:
        n = corpus.count()
        stride = centroid_stride or max(1, n // nlists)
        centroids = corpus.filter((F.col("vec_id") % stride) == 0).select(
            F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb")
        )

    # assign: nearest centroid per corpus vector (one broadcast join)
    sim_to_c = cosine_fast(F.col("embedding"), F.col("c_emb"))
    w_assign = W.partitionBy("vec_id").orderBy(F.col("_cs").desc(), F.col("c_id").asc())
    assigned = (
        corpus.join(F.broadcast(centroids), how="cross")
        .withColumn("_cs", sim_to_c)
        .withColumn("_rn", F.row_number().over(w_assign))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "embedding", F.col("c_id").alias("list_id"))
    )

    queries = corpus.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    w_probe = W.partitionBy("q_id").orderBy(F.col("_cs").desc(), F.col("c_id").asc())
    probes = (
        queries.join(F.broadcast(centroids), how="cross")
        .withColumn("_cs", cosine_fast(F.col("q_emb"), F.col("c_emb")))
        .withColumn("_rn", F.row_number().over(w_probe))
        .filter(F.col("_rn") <= nprobe)
        .select("q_id", "q_emb", F.col("c_id").alias("list_id"))
    )

    # re-rank only vectors in probed lists (list-pruned join)
    w_rank = W.partitionBy("q_id").orderBy(F.col("_sim").desc(), F.col("vec_id").asc())
    return (
        probes.join(assigned, "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("_sim", cosine_fast(F.col("q_emb"), F.col("embedding")))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank")
    )


def embedding_cosine_neardup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_blocks: int = 8,
    margin: float = 1e-6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (d1 < d2, cosine >= t).

    Blocked all-pairs GEMM. Geometric candidate pruning (IVF/LSH) was
    measured on this corpus and cannot reach recall 1 below ~90% of
    pairs scanned (near-dups at t=0.45 sit against the background with
    no angular gap), so the exact O(n^2) similarity is computed — but
    as BLAS matrix products over block pairs, not per-pair JVM lambdas:

    1. each vector lands in block ``vec_id % B`` and map-side-emits
       the B block-pair groups its block participates in (the
       standard blocked-GEMM replication, factor B; B is chosen so
       one block pair fits executor memory, which bounds per-task
       state at any corpus size);
    2. one Arrow-batched ``applyInPandas`` per block pair computes the
       full cross (or triangular, on the diagonal) cosine matrix with
       a numpy matmul and emits pairs >= threshold - margin. Cross
       groups emit only cross-block pairs, so every pair is produced
       exactly once (no distinct);
    3. survivors — a vanishing fraction — are re-scored JVM-side with
       the exact fixed-point cosine, which alone decides membership:
       double-vs-fixed-point drift is < 1e-9, far inside ``margin``,
       so the prefilter loses nothing and the output is bit-identical
       to the exact all-pairs plan (and the DuckDB oracle).
    """
    import numpy as np
    import pandas as pd

    corpus2 = corpus.select("vec_id", "embedding")
    rows = corpus2.withColumn("blk", F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int"))
    # Each row emits its own block-pair keys (the B groups whose pair
    # includes its block) — a map-side explode, no join needed for the
    # replication step.
    repl = rows.select(
        "vec_id",
        "embedding",
        "blk",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_blocks - 1)),
                lambda x: F.struct(
                    F.least(x, F.col("blk")).alias("ba"),
                    F.greatest(x, F.col("blk")).alias("bb"),
                ),
            )
        ).alias("_bp"),
    ).select("vec_id", "embedding", "blk", "_bp.ba", "_bp.bb")

    cut = threshold - margin

    def _score(key, pdf):
        ba, bb = int(key[0]), int(key[1])
        ids = pdf["vec_id"].to_numpy()
        M = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        if ba == bb:
            S = M @ M.T
            iu = np.triu_indices(len(ids), k=1)
            d1, d2, cs = ids[iu[0]], ids[iu[1]], S[iu]
        else:
            left = pdf["blk"].to_numpy() == ba
            if left.all() or (~left).all():  # one side empty
                return pd.DataFrame({"d1": [], "d2": [], "cos_pre": []}).astype(
                    {"d1": "int64", "d2": "int64", "cos_pre": "float64"}
                )
            S = M[left] @ M[~left].T
            i, j = np.nonzero(S >= cut)
            d1, d2, cs = ids[left][i], ids[~left][j], S[i, j]
        keep = cs >= cut
        d1, d2, cs = d1[keep], d2[keep], cs[keep]
        lo, hi = np.minimum(d1, d2), np.maximum(d1, d2)
        return pd.DataFrame({"d1": lo, "d2": hi, "cos_pre": cs})

    cand = repl.groupBy("ba", "bb").applyInPandas(_score, "d1 long, d2 long, cos_pre double")

    e1 = corpus2.select(F.col("vec_id").alias("d1"), F.col("embedding").alias("e1"))
    e2 = corpus2.select(F.col("vec_id").alias("d2"), F.col("embedding").alias("e2"))
    return (
        cand.join(e1, "d1")
        .join(e2, "d2")
        .select(
            "d1",
            "d2",
            cosine_from_parts(
                dot_exact(F.col("e1"), F.col("e2")),
                norm_sq_exact(F.col("e1")),
                norm_sq_exact(F.col("e2")),
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
