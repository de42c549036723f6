"""K-means query registration: an ITERATIVE algorithm under the full
driver oracle gate.

Iterative ML-style algorithms are normally the canonical "rows-only"
case, but the fixed-point determinism contract in
operators/clustering.py gives fixed-init fixed-iteration k-means a
single bit-exact answer — so the oracle below replays both Lloyd
iterations as SQL CTEs (distance-argmin via window, mean via integer
sums) and the driver can hash-compare an algorithm DuckDB has no
built-in for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.clustering import kmeans_centroids_df, kmeans_flat
from ..sources.tables import balanced, load_table
from .registry import query

_K = 8
_ITERS = 2


def _kmeans_cte_chain(k: int, iters: int) -> str:
    """CTE chain replaying the deterministic trainer: element stream
    ``p``, init, then per-iteration fixed-point distance/argmin/mean
    CTEs ending at centroids ``c{iters}`` — shared by the kmeans query
    oracle and the SemDeDup oracle (which keeps deriving from c{iters})."""
    sql = f"""p AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    init AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster, vec_id
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
    ),
    c0 AS (
      SELECT i.cluster, p.pos, p.v AS c FROM init i JOIN p USING (vec_id)
    )"""
    prev = "c0"
    for t in range(1, iters + 1):
        sql += f""",
    d{t} AS (
      SELECT p.vec_id, c.cluster,
             SUM(CAST(FLOOR((p.v - c.c) * (p.v - c.c) * 1048576) AS BIGINT)) AS dist
      FROM p JOIN {prev} c USING (pos)
      GROUP BY 1, 2
    ),
    a{t} AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
        FROM d{t}
      ) WHERE rn = 1
    ),
    c{t} AS (
      SELECT a.cluster, p.pos,
             CAST(SUM(CAST(FLOOR(p.v * 1048576) AS BIGINT)) AS DOUBLE)
               / (COUNT(*) * 1048576.0) AS c
      FROM a{t} a JOIN p USING (vec_id)
      GROUP BY 1, 2
    )"""
        prev = f"c{t}"
    return sql


def _kmeans_oracle(k: int, iters: int) -> str:
    return f"""
    WITH {_kmeans_cte_chain(k, iters)}
    SELECT c.cluster, CAST(c.pos AS BIGINT) AS pos, c.c AS centroid, s.n_points
    FROM c{iters} c
    JOIN (
      SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_points FROM a{iters} GROUP BY 1
    ) s USING (cluster)
    """


def _semdedup_oracle(k: int, iters: int, eps: float) -> str:
    """Full value oracle for the SemDeDup pass: replay training
    (shared CTE chain), assign every vector to its nearest FINAL
    centroid by the same fixed-point distance, rank within cluster by
    that distance DESC (keep low-centroid-similarity first, the
    paper's rule; ties to lower vec_id), then drop any vector with a
    fixed-point cosine >= eps to a better-ranked clustermate."""
    return f"""
    WITH {{chain}},
    df AS (
      SELECT p.vec_id, c.cluster,
             SUM(CAST(FLOOR((p.v - c.c) * (p.v - c.c) * 1048576) AS BIGINT)) AS dist
      FROM p JOIN c{iters} c USING (pos)
      GROUP BY 1, 2
    ),
    af AS (
      SELECT vec_id, cluster, dist FROM (
        SELECT vec_id, cluster, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
        FROM df
      ) WHERE rn = 1
    ),
    r AS (
      SELECT vec_id, cluster,
             ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY dist DESC, vec_id ASC) AS rnk
      FROM af
    ),
    nrm AS (
      SELECT vec_id, SUM(CAST(floor(v * v * 1e14) AS BIGINT)) AS nrm
      FROM p GROUP BY 1
    ),
    dots AS (
      SELECT x.vec_id AS x_id, y.vec_id AS y_id,
             SUM(CAST(floor(px.v * py.v * 1e14) AS BIGINT)) AS dxy
      FROM r x
      JOIN r y ON x.cluster = y.cluster AND y.rnk < x.rnk
      JOIN p px ON px.vec_id = x.vec_id
      JOIN p py ON py.vec_id = y.vec_id AND py.pos = px.pos
      GROUP BY 1, 2
    ),
    dropped AS (
      SELECT DISTINCT d.x_id AS vec_id
      FROM dots d
      JOIN nrm nx ON d.x_id = nx.vec_id
      JOIN nrm ny ON d.y_id = ny.vec_id
      WHERE CAST(d.dxy AS DOUBLE) / sqrt(CAST(nx.nrm AS DOUBLE) * CAST(ny.nrm AS DOUBLE)) >= {eps}
    )
    SELECT r.vec_id, CAST(r.cluster AS BIGINT) AS cluster,
           (dp.vec_id IS NULL) AS keep
    FROM r LEFT JOIN dropped dp ON r.vec_id = dp.vec_id
    """.format(chain=_kmeans_cte_chain(k, iters))


@query(
    "cluster_kmeans_embeddings",
    oracle=_kmeans_oracle(_K, _ITERS),
    doc="Two Lloyd iterations of k-means (k=8, init = 8 lowest vec_ids) "
    "over the embedding corpus, flattened to (cluster, pos, centroid, "
    "n_points). Distances and means use order-invariant fixed-point "
    "sums (scale 2^20), so the iterative algorithm is bit-reproducible "
    "and the SQL replay in the oracle must match exactly. Per "
    "iteration: one mapInPandas corpus pass emitting k partial sums "
    "per Arrow batch; the driver holds only the k x dim centroid "
    "matrix (MLlib's treeAggregate shape).",
    tags=("clustering", "kmeans", "iterative", "embeddings"),
)
def cluster_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = balanced(spark, load_table(spark, sf_dir, "embeddings"))
    return kmeans_flat(spark, corpus, k=_K, iters=_ITERS)


@query(
    "dedup_semantic_semdedup",
    oracle=_semdedup_oracle(16, 2, 0.45),
    doc="SemDeDup semantic deduplication (Abbas et al., 2023, "
    "arXiv:2303.09540): k-means-cluster the embedding corpus (the "
    "shared deterministic trainer, k=16), assign every vector to its "
    "nearest final centroid by the trainer's fixed-point distance, "
    "and within each cluster drop vectors with cosine >= 0.45 to a "
    "better-ranked clustermate (rank = centroid distance DESC — the "
    "paper keeps LOW-centroid-similarity examples). Catches "
    "paraphrases and re-renderings that share no n-grams, the "
    "embedding-space complement of the text near-dup family. Pairwise "
    "work is sum-over-clusters C(|cell|,2), never corpus-quadratic. "
    "Every step is engine-exact, so this ITERATIVE-ML-derived pipeline "
    "sits under a FULL value oracle: DuckDB replays training, "
    "assignment, ranking and all pairwise verdicts bit-for-bit "
    "(operators/similarity.py semdedup_verdicts / "
    "assign_nearest_centroid_fp).",
    tags=("dedup", "semantic", "clustering", "embeddings", "scale"),
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semdedup_verdicts

    corpus = balanced(spark, load_table(spark, sf_dir, "embeddings"))
    cents = kmeans_centroids_df(
        spark, corpus, k=16, iters=_ITERS, cache_key=(sf_dir, "embeddings")
    )
    return semdedup_verdicts(corpus, cents, eps=0.45)
