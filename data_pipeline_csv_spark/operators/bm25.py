"""BM25 ranked retrieval (Robertson & Zaragoza, FnTIR 2009 — the
Okapi BM25 weighting scheme): score documents against a bag-of-terms
query and return the top-k. The retrieval complement of the tf-idf
term profile (queries/text.py text_tfidf_terms); a corpus pipeline
uses this shape for query-targeted quality probes and eval-set
neighborhood checks.

Spark-first shape: one corpus pass builds per-(doc, term) counts for
the QUERY terms only (the isin filter prunes before the aggregate, so
the exchange carries |query terms| · |matching docs| rows, not the
vocab); document frequencies and the corpus length stats are tiny
aggregates broadcast back; the top-k plans as TakeOrderedAndProject.

Cross-engine exactness (the DSIR recipe): every input to the score is
an exact integer (tf, dl, df, N, Σdl) and the per-(doc, term)
contribution is a fixed chain of single IEEE ops — written with
IDENTICAL association in the Spark expression and the DuckDB oracle —
floored to 1e-6 fixed point, so per-doc scores are exact int64 sums
and the oracle replays every score bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BM25_SCALE = 1e6
K1 = 1.2
B = 0.75


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for the bag-of-terms query under BM25
    (k1=1.2, b=0.75): returns (doc_id, score_fp, rank), score_fp in
    1e-6 fixed point, ties broken by doc_id asc."""
    from ..functions.text_funcs import tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("_t")
    ).select("doc_id", F.size("_t").alias("dl"), "_t")
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        toks.select("doc_id", "dl", F.explode("_t").alias("term"))
        .where(F.col("term").isin(*terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    j = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    # association mirrored exactly by the SQL oracle:
    #   avgdl = CAST(sum_dl AS DOUBLE) / n_docs
    #   idf   = ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    #   tfp   = (tf * 2.2) / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl))
    #   contrib_fp = floor(idf * tfp * 1000000.0)
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfp = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf")
        + F.lit(K1) * (F.lit(1.0 - B) + (F.lit(B) * F.col("dl")) / avgdl)
    )
    contrib = F.floor(idf * tfp * F.lit(BM25_SCALE)).cast("bigint")
    scored = j.select("doc_id", contrib.alias("c_fp")).groupBy("doc_id").agg(
        F.sum("c_fp").alias("score_fp")
    )
    from pyspark.sql import Window as W

    sel = scored.orderBy(F.col("score_fp").desc(), F.col("doc_id").asc()).limit(k)
    w = W.orderBy(F.col("score_fp").desc(), F.col("doc_id").asc())
    return sel.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "doc_id", F.col("score_fp").cast("bigint").alias("score_fp"), "rank"
    )


RRF_SCALE = 1_000_000_000_000  # 1/(c+r) in 1e-12 fixed point


def rrf_fuse(ranked: dict, k: int = 20, c: int = 60, id_col: str = "doc_id") -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR
    2009) of named ranked lists — the standard hybrid-retrieval
    combiner (lexical BM25 + embedding ANN in every modern RAG
    stack): score(d) = Σ_lists 1/(c + rank_list(d)), absent lists
    contribute 0. Each contribution is ONE IEEE division of exact
    integers floored to 1e-12 fixed point, so fused scores are exact
    int64 sums any engine replays bit-for-bit — the same determinism
    contract as the BM25 scores themselves.

    Scale shape: the inputs are top-k' lists (tiny by construction),
    so fusion is a union + one hash agg + TakeOrderedAndProject over
    O(Σ k') rows, regardless of corpus size — the expensive parts are
    the upstream retrievers, which keep their own scale paths.
    Returns (doc_id, r_<name>... , rrf_fp, rank).
    """
    from functools import reduce as _reduce

    from pyspark.sql import Window as W

    parts = [
        df.select(
            F.col(id_col).alias("doc_id"),
            F.lit(name).alias("_src"),
            F.col("rank").cast("int").alias("_r"),
            F.floor(
                F.lit(float(RRF_SCALE)) / (F.lit(c) + F.col("rank")).cast("double")
            ).cast("bigint").alias("_c"),
        )
        for name, df in ranked.items()
    ]
    un = _reduce(lambda a, b: a.unionByName(b), parts)
    fused = un.groupBy("doc_id").agg(
        F.sum("_c").alias("rrf_fp"),
        *[
            F.max(F.when(F.col("_src") == name, F.col("_r"))).alias(f"r_{name}")
            for name in ranked
        ],
    )
    sel = fused.orderBy(F.col("rrf_fp").desc(), F.col("doc_id").asc()).limit(k)
    w = W.orderBy(F.col("rrf_fp").desc(), F.col("doc_id").asc())
    return sel.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "doc_id",
        *[f"r_{name}" for name in ranked],
        F.col("rrf_fp").cast("bigint").alias("rrf_fp"),
        "rank",
    )
