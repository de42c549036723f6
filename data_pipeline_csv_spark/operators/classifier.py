"""Hashed bag-of-words linear classifier for corpus filtering — the
fastText shape (Joulin et al., EACL 2017, "Bag of Tricks for Efficient
Text Classification") that production pretraining pipelines use as the
quality / domain / language gate (CCNet, Wenzek et al., LREC 2020,
trains exactly such a linear model to score Common Crawl documents).

Spark-first shape: the model is multinomial Naive Bayes over hashed
unigram buckets, so TRAINING is closed-form — one map-side explode +
partial-agg pass over the labeled split to per-bucket class counts
(n_buckets rows total, nothing iterative), and SCORING is one explode
+ one equi-join of tokens against the n_buckets-row weight table (AQE
broadcasts it) + one per-doc sum. Nothing corpus-quadratic, no driver
collects — the class totals ride 1-row broadcast cross joins.

Cross-engine exactness (the DSIR recipe, operators/sampling.py): bucket
ids come from the first 8 hex chars of md5(token); all counts are exact
integers; each bucket's class log-likelihood ratio and the class prior
are floored to 1e-6-nat fixed point (single libm ops on identical
integer inputs), so per-doc scores are exact int64 sums and the DuckDB
oracle replays training AND scoring bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_funcs import tokens

NB_SCALE = 1e6  # fixed-point nats, same grid as sampling.DSIR_SCALE


def nb_train_score(
    docs: DataFrame,
    label_col,
    holdout_mod: int = 5,
    n_buckets: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train the hashed-NB classifier on the ``doc_id % holdout_mod
    != 0`` split and score the held-out ``== 0`` split; returns one
    row per held-out doc: (doc_id, score_fp, predicted, actual,
    correct) — score_fp is the fixed-point log-odds, predicted is
    ``score_fp > 0``.

    ``label_col`` is a boolean Column (e.g. ``F.col("lang") == "en"``)
    — the supervision a real pipeline gets from a curated positive set.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        label_col.alias("y"),
        tokens(text_col).alias("_toks"),
    )
    train = base.filter(F.col("doc_id") % holdout_mod != 0)
    test = base.filter(F.col("doc_id") % holdout_mod == 0)

    bucket = (
        F.conv(F.substring(F.md5(F.encode(F.col("_w"), "utf-8")), 1, 8), 16, 10)
        .cast("long") % n_buckets
    )
    tr_tok = train.select("y", F.explode("_toks").alias("_w")).select(
        "y", bucket.alias("b")
    )
    # per-bucket class counts over ALL buckets (spark.range keeps the
    # model table dense so scoring is a plain inner join)
    cnt = tr_tok.groupBy("b").agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("c0"),
    )
    spark = docs.sparkSession
    dense = (
        spark.range(n_buckets)
        .select(F.col("id").alias("b"))
        .join(cnt, "b", "left")
        .select(
            "b",
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c0", F.lit(0)).alias("c0"),
        )
    )
    # Class token totals are the column sums of the per-bucket counts
    # (sum of group counts == total count, exact integers) — deriving
    # them from ``cnt`` removes a second full tokenize + explode + md5
    # pass over the train split that the standalone aggregate paid
    # (its global agg has a different exchange shape, so ReuseExchange
    # could not share the feature pipeline with ``cnt``).
    tot = cnt.agg(
        F.coalesce(F.sum("c1"), F.lit(0)).alias("n1"),
        F.coalesce(F.sum("c0"), F.lit(0)).alias("n0"),
    )
    model = dense.crossJoin(F.broadcast(tot)).select(
        "b",
        F.floor(
            (
                F.log((F.col("c1") + F.lit(1)).cast("double"))
                - F.log((F.col("n1") + F.lit(n_buckets)).cast("double"))
                - F.log((F.col("c0") + F.lit(1)).cast("double"))
                + F.log((F.col("n0") + F.lit(n_buckets)).cast("double"))
            )
            * F.lit(NB_SCALE)
        ).cast("bigint").alias("r_fp"),
    )
    prior = train.agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("d0"),
    ).select(
        F.floor(
            (
                F.log((F.col("d1") + F.lit(1)).cast("double"))
                - F.log((F.col("d0") + F.lit(1)).cast("double"))
            )
            * F.lit(NB_SCALE)
        ).cast("bigint").alias("prior_fp")
    )

    te_tok = test.select("doc_id", F.explode("_toks").alias("_w")).select(
        "doc_id", bucket.alias("b")
    )
    per_doc = (
        te_tok.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(model, "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("r_fp")).alias("s_fp"))
    )
    return (
        test.select("doc_id", "y")
        .join(per_doc, "doc_id", "left")
        .crossJoin(F.broadcast(prior))
        .select(
            "doc_id",
            (F.coalesce("s_fp", F.lit(0)) + F.col("prior_fp")).alias("score_fp"),
            "y",
        )
        .select(
            "doc_id",
            "score_fp",
            (F.col("score_fp") > 0).alias("predicted"),
            F.col("y").alias("actual"),
            ((F.col("score_fp") > 0) == F.col("y")).alias("correct"),
        )
    )
