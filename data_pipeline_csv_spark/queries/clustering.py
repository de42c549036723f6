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

from ..operators.clustering import kmeans_flat
from ..sources.tables import balanced, load_table
from .registry import query

_K = 8
_ITERS = 2


def _kmeans_oracle(k: int, iters: int) -> str:
    sql = f"""
    WITH p AS (
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
    sql += f"""
    SELECT c.cluster, CAST(c.pos AS BIGINT) AS pos, c.c AS centroid, s.n_points
    FROM c{iters} c
    JOIN (
      SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_points FROM a{iters} GROUP BY 1
    ) s USING (cluster)
    """
    return sql


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
