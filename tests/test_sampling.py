"""Weighted reservoir sampling: weight proportionality, determinism,
partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_csv_spark.operators.sampling import weighted_sample_topk
from data_pipeline_csv_spark.sources.tables import load_table


def test_weighted_sample_favors_heavy_rows(spark, sf_dir):
    """Sampling proportional to n_chars must overrepresent long docs:
    the sampled mean weight exceeds the corpus mean weight."""
    docs = load_table(spark, sf_dir, "documents")
    got = weighted_sample_topk(docs, k=20, weight_col="n_chars", stratum_col="lang")
    sampled_mean = got.agg(F.avg("weight")).first()[0]
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    assert sampled_mean > corpus_mean, (sampled_mean, corpus_mean)


def test_weighted_sample_partition_invariant(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {
        (r["lang"], r["doc_id"], r["rank"])
        for r in weighted_sample_topk(docs, k=10, weight_col="n_chars", stratum_col="lang").collect()
    }
    b = {
        (r["lang"], r["doc_id"], r["rank"])
        for r in weighted_sample_topk(
            docs.repartition(13), k=10, weight_col="n_chars", stratum_col="lang"
        ).collect()
    }
    assert a == b


def test_weighted_sample_without_replacement_and_sized(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = weighted_sample_topk(docs, k=15, weight_col="n_chars", stratum_col="lang").collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))  # without replacement
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r["rank"])
    n_docs_per_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang, ranks in per_lang.items():
        want = min(15, n_docs_per_lang[lang])
        assert sorted(ranks) == list(range(1, want + 1)), (lang, ranks)


def test_weighted_sample_global_no_stratum(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = weighted_sample_topk(docs, k=25, weight_col="n_chars").collect()
    assert len(rows) == 25
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(range(1, 26))


def test_split_assign_stable_and_proportional(spark, sf_dir):
    from data_pipeline_csv_spark.operators.sampling import split_assign

    docs = load_table(spark, sf_dir, "documents")
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = {(r["doc_id"], r["split"]) for r in split_assign(docs, w).select("doc_id", "split").collect()}
    b = {
        (r["doc_id"], r["split"])
        for r in split_assign(docs.repartition(13), w).select("doc_id", "split").collect()
    }
    assert a == b  # partition/order invariant
    n = len(a)
    counts = {}
    for _, s in a:
        counts[s] = counts.get(s, 0) + 1
    assert counts["train"] / n > 0.8
    assert 0.005 < counts.get("val", 0) / n < 0.15
    assert 0.005 < counts.get("test", 0) / n < 0.15


def test_shuffle_into_shards_partition_invariant(spark, sf_dir):
    """The deterministic corpus shuffle must be a pure function of the
    ids: identical (doc_id, shard, pos) under any input partitioning
    or row order, shards near-balanced, positions dense per shard."""
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.sampling import shuffle_into_shards
    from data_pipeline_csv_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {(r.doc_id, r.shard, r.pos) for r in shuffle_into_shards(docs, 16).collect()}
    b = {
        (r.doc_id, r.shard, r.pos)
        for r in shuffle_into_shards(
            docs.repartition(7, "source").sortWithinPartitions(F.desc("doc_id")), 16
        ).collect()
    }
    assert a == b
    n = docs.count()
    by_shard = {}
    for _, sh, pos in a:
        by_shard.setdefault(sh, []).append(pos)
    assert len(a) == n
    for sh, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))  # dense
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) <= 3 * max(1, n // 16)  # multinomial balance


def test_dsir_select_prefers_target_like_docs(spark):
    """DSIR must rank raw docs sharing the target domain's vocabulary
    above disjoint-vocabulary docs: weights are positive for
    target-like docs, negative for unrelated ones, and the selection's
    top ranks are all target-like. The global top-k must plan as
    TakeOrderedAndProject (per-partition k + driver merge), not a
    global sort."""
    import contextlib
    import io

    from data_pipeline_csv_spark.operators.sampling import dsir_select

    tvocab = [f"alpha{i}" for i in range(30)]
    uvocab = [f"zeta{i}" for i in range(30)]
    target = spark.createDataFrame(
        [(1000 + d, " ".join(tvocab[(d + i) % 30] for i in range(40))) for d in range(5)],
        "doc_id long, text string",
    )
    rows = []
    for d in range(10):  # target-like raw docs
        rows.append((d, " ".join(tvocab[(d * 3 + i) % 30] for i in range(40))))
    for d in range(10, 20):  # unrelated raw docs
        rows.append((d, " ".join(uvocab[(d + i) % 30] for i in range(40))))
    raw = spark.createDataFrame(rows, "doc_id long, text string")

    sel = dsir_select(raw, target, k=8, n_buckets=256)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sel.explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()

    got = sel.collect()
    assert len(got) == 8
    by_rank = sorted(got, key=lambda r: r.rank)
    # the clear-margin head of the selection is target-like
    assert all(r.doc_id < 10 for r in by_rank[:5])
    weights = {r.doc_id: r.weight_fp for r in got}
    assert all(w > 0 for d, w in weights.items() if d < 10)
    assert all(w < 0 for d, w in weights.items() if d >= 10)


def test_pack_chunks_global_equals_global_window(spark):
    """The distributed two-pass prefix sum must equal the naive
    global-order window assignment exactly on randomized chunk sizes,
    and the plan must not funnel the chunk stream through a
    single-partition sort (only the n_buckets-row offset window may
    be single-partition)."""
    import contextlib
    import io

    import numpy as np

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.sampling import (
        pack_chunks_global,
        uniform_from_id,
    )

    rng = np.random.RandomState(3)
    rows = []
    for d in range(200):
        for c in range(rng.randint(1, 6)):
            rows.append((d, c, int(rng.randint(1, 33))))
    chunks = spark.createDataFrame(rows, "doc_id long, chunk_idx int, n_tokens long")

    out = pack_chunks_global(chunks, seq_len=64, n_buckets=8)
    w = W.orderBy(
        uniform_from_id(F.col("doc_id")).asc(), F.col("doc_id").asc(), F.col("chunk_idx").asc()
    ).rowsBetween(W.unboundedPreceding, 0)
    naive = chunks.select(
        "doc_id", "chunk_idx",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 64.0)
        .cast("bigint").alias("pack_id"),
    )
    got = {(r.doc_id, r.chunk_idx): r.pack_id for r in out.collect()}
    want = {(r.doc_id, r.chunk_idx): r.pack_id for r in naive.collect()}
    assert got == want

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "hashpartitioning(_b" in plan  # bucket-local windows
    assert plan.count("Exchange SinglePartition") <= 1  # offsets only


def test_leakage_safe_split_keeps_clusters_whole(spark, sf_dir):
    """Every near-dup cluster lands entirely inside ONE split, and the
    assignment depends only on cluster ids (stable across re-runs)."""
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.components import connected_components
    from data_pipeline_csv_spark.operators.dedup import ngram_jaccard_pairs
    from data_pipeline_csv_spark.operators.sampling import split_assign
    from data_pipeline_csv_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8).select("d1", "d2")
    cc = connected_components(pairs, src="d1", dst="d2")
    labeled = (
        docs.select("doc_id")
        .join(cc, docs["doc_id"] == cc["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("canonical_id"),
        )
    )
    weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    a1 = split_assign(labeled, weights, id_col="canonical_id")
    per_cluster = a1.groupBy("canonical_id").agg(
        F.countDistinct("split").alias("n_splits"), F.count(F.lit(1)).alias("n")
    )
    rows = per_cluster.collect()
    assert all(r["n_splits"] == 1 for r in rows)
    assert any(r["n"] > 1 for r in rows)  # real multi-doc clusters exist
    # determinism: re-running yields identical assignments
    a2 = {r["doc_id"]: r["split"] for r in split_assign(labeled, weights, id_col="canonical_id").collect()}
    for r in a1.collect():
        assert a2[r["doc_id"]] == r["split"]
