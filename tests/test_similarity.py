"""ANN quality: IVF top-k must recall most of the exact brute-force
top-k (the correctness harness can't check approximate results)."""

from data_pipeline_csv_spark.operators.similarity import ann_ivf_topk, cosine_topk
from data_pipeline_csv_spark.sources.tables import load_table, table_num_rows

QUERY_IDS = [0, 1, 2, 3, 4, 5, 6, 7]


def _stride(sf_dir, nlists=16):
    return max(1, table_num_rows(sf_dir, "embeddings") // nlists)


def test_ivf_recall_at_10(spark, sf_dir):
    corpus = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(corpus, QUERY_IDS, k=10).select("q_id", "vec_id").collect()
    approx = (
        ann_ivf_topk(corpus, QUERY_IDS, k=10, centroid_stride=_stride(sf_dir))
        .select("q_id", "vec_id")
        .collect()
    )
    truth = {(r.q_id, r.vec_id) for r in exact}
    got = {(r.q_id, r.vec_id) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"IVF recall@10 too low: {recall:.2f}"


def test_ivf_with_kmeans_centroids_recall(spark, sf_dir):
    from data_pipeline_csv_spark.operators.clustering import kmeans_centroids_df

    corpus = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids_df(spark, corpus, k=16, iters=2)
    exact = cosine_topk(corpus, QUERY_IDS, k=10).select("q_id", "vec_id").collect()
    approx = (
        ann_ivf_topk(corpus, QUERY_IDS, k=10, nprobe=4, centroids=cents)
        .select("q_id", "vec_id")
        .collect()
    )
    truth = {(r.q_id, r.vec_id) for r in exact}
    got = {(r.q_id, r.vec_id) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"IVF(kmeans) recall@10 too low: {recall:.2f}"


def test_ann_query_construction_runs_no_job(spark, sf_dir):
    """Building the ANN plan (stride derived from parquet footer
    metadata) must trigger no Spark job — the old default ran an eager
    corpus.count() per call."""
    sc = spark.sparkContext
    # Warm the parquet reader: the FIRST read of a path runs one
    # driver-coordinated footer/schema job inside spark.read itself —
    # reader behavior, not query construction. Subsequent reads reuse
    # the relation cache.
    corpus = load_table(spark, sf_dir, "embeddings")
    group = "ann-construction-probe"
    sc.setJobGroup(group, "assert no jobs during query construction")
    try:
        ann_ivf_topk(corpus, QUERY_IDS, k=10, centroid_stride=_stride(sf_dir))
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert sc.statusTracker().getJobIdsForGroup(group) == []


def test_ann_requires_stride_or_centroids(spark, sf_dir):
    import pytest

    corpus = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="centroid_stride"):
        ann_ivf_topk(corpus, QUERY_IDS, k=10)


def test_clustered_neardup_matches_exact_on_corpus(spark, sf_dir):
    """At the registered config (k=16, nprobe=4, t=0.45) the clustered
    mode must reproduce the exact pair set bit-for-bit — that is what
    lets it share the exact mode's full DuckDB oracle."""
    from data_pipeline_csv_spark.operators.clustering import kmeans_centroids_df
    from data_pipeline_csv_spark.operators.similarity import (
        embedding_cosine_neardup,
        embedding_cosine_neardup_clustered,
    )

    corpus = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids_df(spark, corpus, k=16, iters=2)
    exact = {
        (r.d1, r.d2, r.cosine)
        for r in embedding_cosine_neardup(corpus, threshold=0.45).collect()
    }
    got = {
        (r.d1, r.d2, r.cosine)
        for r in embedding_cosine_neardup_clustered(
            corpus, cents, threshold=0.45, nprobe=4
        ).collect()
    }
    assert got == exact


def test_clustered_neardup_high_threshold_recall_and_pruning(spark, sf_dir):
    """The scale story: on a corpus with planted high-similarity dups
    (t=0.9), cell blocking must keep recall >= 0.99 while scanning a
    small fraction of all pairs."""
    import numpy as np

    from data_pipeline_csv_spark.operators.clustering import kmeans_centroids_df
    from data_pipeline_csv_spark.operators.similarity import (
        embedding_cosine_neardup,
        embedding_cosine_neardup_clustered,
    )

    base = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in base])
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in base])
    rng = np.random.RandomState(7)
    dup_src = ids[:: max(1, len(ids) // 40)]  # ~40 planted dups
    rows = [(int(i), [float(x) for x in M[k]]) for k, i in enumerate(ids)]
    off = int(ids.max()) + 1
    for j, src in enumerate(dup_src):
        k = int(np.where(ids == src)[0][0])
        v = M[k] + rng.normal(0, 0.02, size=M.shape[1])  # cosine ~0.99 to source
        rows.append((off + j, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    k_cells, nprobe = 16, 2
    cents = kmeans_centroids_df(spark, corpus, k=k_cells, iters=2)
    truth = {(r.d1, r.d2) for r in embedding_cosine_neardup(corpus, threshold=0.9).collect()}
    got = {
        (r.d1, r.d2)
        for r in embedding_cosine_neardup_clustered(
            corpus, cents, threshold=0.9, nprobe=nprobe
        ).collect()
    }
    assert truth, "planted dups must produce true pairs"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.99, f"clustered recall too low: {recall:.3f}"
    assert got <= truth  # precision 1: exact re-score decides membership

    # pruning: replay the deterministic assignment in numpy and bound
    # the scanned pair fraction
    crows = cents.collect()
    C = np.stack([np.asarray(r["c_emb"], dtype=np.float64) for r in crows])
    call = np.stack([np.asarray(e, dtype=np.float64) for _, e in rows])
    calln = call / np.linalg.norm(call, axis=1, keepdims=True)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    order = np.argsort(-(calln @ Cn.T), axis=1, kind="stable")[:, :nprobe]
    sizes = np.bincount(order.ravel(), minlength=len(C))
    scanned = int((sizes * (sizes - 1) // 2).sum())
    n = len(rows)
    frac = scanned / (n * (n - 1) // 2)
    assert frac < 0.35, f"cell blocking scanned too much: {frac:.2f} of all pairs"

    # the Spark-side assignment (what similarity_neardup_pruned measures
    # under the driver gate) must count exactly the replayed pair work
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.similarity import clustered_cell_assignment

    spark_scanned = (
        clustered_cell_assignment(corpus, cents, nprobe)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("s"))
        .collect()[0]["s"]
    )
    assert int(spark_scanned) == scanned


def test_simhash_near_dups_close(spark, sf_dir):
    """Near-dup docs (exact Jaccard >= 0.8) should have small SimHash
    hamming distance; random pairs should not."""
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.dedup import ngram_jaccard_pairs, simhash

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8).collect()
    assert pairs, "corpus should contain planted near-dups"
    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    near = [bin(sh[r.d1] ^ sh[r.d2]).count("1") for r in pairs]
    ids = sorted(sh)
    random_pairs = [(ids[i], ids[(i * 7 + 13) % len(ids)]) for i in range(100)]
    baseline = [bin(sh[a] ^ sh[b]).count("1") for a, b in random_pairs if a != b]
    near_mean = sum(near) / len(near)
    base_mean = sum(baseline) / len(baseline)
    # docs are short (~18 shingles) so individual pairs are noisy;
    # planted near-dups must still be clearly separated from random.
    assert near_mean < base_mean - 10, f"simhash separation too weak: {near_mean:.1f} vs {base_mean:.1f}"


def test_pq_rerank_finds_planted_twin(spark, sf_dir):
    """A near-identical twin of a query vector must come back rank 1
    from the PQ shortlist -> exact rerank pipeline (the twin encodes to
    the same codes, so ADC scores it at the query's own reconstruction
    ceiling), and pq_encode must be partition-invariant."""
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )
    from data_pipeline_csv_spark.sources.tables import load_table

    corpus = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = corpus.filter(F.col("vec_id") == 0).collect()[0]
    twin_vec = [float(x) + (0.001 if i == 0 else 0.0) for i, x in enumerate(q["embedding"])]
    twin_id = 10_000_000
    planted = corpus.unionByName(
        spark.createDataFrame([(twin_id, twin_vec)], "vec_id long, embedding array<float>")
    )
    books = pq_train(spark, planted, dim=64, m=8, k=16, iters=2)
    codes = pq_encode(planted, books, m=8)
    short = pq_adc_topk(codes, books, [(0, q["embedding"])], k=100)
    top = short.orderBy("rank").limit(1).collect()[0]
    assert top["vec_id"] == twin_id

    # determinism: codes identical under a different partitioning
    a = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    b = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(planted.repartition(7), books, m=8).collect()
    }
    assert a == b


def test_pq_rejects_mismatched_dims(spark, sf_dir):
    """dim % m != 0 must raise at train time (not silently drop the
    trailing coordinates from encoding/ADC), and ADC must reject
    queries whose dim disagrees with the trained codebooks."""
    import pytest

    from data_pipeline_csv_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )
    from data_pipeline_csv_spark.sources.tables import load_table

    corpus = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(spark, corpus, dim=64, m=7)
    books = pq_train(spark, corpus, dim=64, m=8, k=16, iters=1)
    codes = pq_encode(corpus, books, m=8)
    with pytest.raises(ValueError, match="query dim"):
        pq_adc_topk(codes, books, [(0, [0.0] * 32)], k=5)


def test_semdedup_drops_planted_paraphrase(spark):
    """Two near-identical vectors in one cluster: exactly the
    closer-to-centroid one is dropped (the paper keeps LOW
    centroid-similarity examples); a lone vector in another cluster
    is untouched."""
    from data_pipeline_csv_spark.operators.similarity import semdedup_verdicts

    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),        # sits ON centroid 0
            (1, [0.995, 0.09987, 0.0, 0.0]),  # cos(0,1) ~ 0.995
            (2, [0.0, 1.0, 0.0, 0.0]),        # alone near centroid 1
        ],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "c_id long, c_emb array<double>",
    )
    got = {r.vec_id: (r.cluster, r.keep) for r in semdedup_verdicts(corpus, cents, eps=0.9).collect()}
    assert got[1] == (0, True)   # farther from centroid -> kept
    assert got[0] == (0, False)  # its near-twin, closer to centroid -> dropped
    assert got[2] == (1, True)


def test_semdedup_triu_chain_semantics(spark):
    """Chain x1-x2-x3 (cos(x1,x2) and cos(x2,x3) above eps,
    cos(x1,x3) below): x1 (farthest from centroid) is kept, and BOTH
    x2 and x3 are dropped — a better-ranked vector suppresses even
    when it was itself dropped, the released SemDeDup code's
    upper-triangular matrix procedure (NOT connected-components
    keep-one-per-group)."""
    import math

    from data_pipeline_csv_spark.operators.similarity import semdedup_verdicts

    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0, 0.0]

    # centroid at 90 degrees: x1 (0 deg) is farthest -> rank 1
    corpus = spark.createDataFrame(
        [(1, at(0.0)), (2, at(31.8)), (3, at(63.6))],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame([(0, at(90.0))], "c_id long, c_emb array<double>")
    # cos(x1,x2) = cos(x2,x3) ~ 0.850 >= 0.8; cos(x1,x3) ~ 0.445 < 0.8
    got = {r.vec_id: r.keep for r in semdedup_verdicts(corpus, cents, eps=0.8).collect()}
    assert got == {1: True, 2: False, 3: False}


def test_ivf_append_touches_only_appended_lists(spark, sf_dir, tmp_path):
    """Incremental maintenance contract: appending a batch creates
    files ONLY under the appended lists' partition directories; every
    other list's file set is byte-untouched, and the merged index
    serves the union of base + appended vectors."""
    import os

    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.clustering import kmeans_centroids_df
    from data_pipeline_csv_spark.operators.similarity import (
        ivf_append,
        write_ivf_layout,
    )
    from data_pipeline_csv_spark.sources.tables import load_table

    corpus = load_table(spark, sf_dir, "embeddings")
    base = corpus.filter(F.col("vec_id") % 5 != 0)
    new = corpus.filter(F.col("vec_id") % 5 == 0)
    cents = kmeans_centroids_df(
        spark, base, k=8, iters=2, cache_key=(sf_dir, "ivf_append_test")
    )
    layout = str(tmp_path / "layout")
    write_ivf_layout(base, cents, layout)

    def _files():
        out = {}
        for d in os.listdir(layout):
            if not d.startswith("list_id="):
                continue
            out[d] = sorted(
                (f, os.path.getsize(os.path.join(layout, d, f)))
                for f in os.listdir(os.path.join(layout, d))
                if not f.startswith(".")
            )
        return out

    before = _files()
    rep = ivf_append(new, cents, layout)
    after = _files()
    touched = {f"list_id={i}" for i in rep["lists_touched"]}
    assert rep["n_appended"] == new.count() > 0
    for d, files in before.items():
        if d in touched:
            assert set(files) < set(after[d])  # old files intact, new added
        else:
            assert files == after[d]  # byte-untouched
    # merged index serves base + appended
    merged_ids = {r["vec_id"] for r in spark.read.parquet(layout).collect()}
    assert merged_ids == {r["vec_id"] for r in corpus.select("vec_id").collect()}
    assert 0.0 <= rep["drift_ratio"] <= 1.0


def _mini_layout(spark, sf_dir, tmp_path, carry=(), partition_cols=("list_id",)):
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.clustering import kmeans_centroids_df
    from data_pipeline_csv_spark.operators.similarity import write_ivf_layout
    from data_pipeline_csv_spark.sources.tables import load_table

    corpus = load_table(spark, sf_dir, "embeddings")
    base = corpus.filter(F.col("vec_id") % 5 != 0).select(
        "vec_id", "embedding", *carry
    )
    new = corpus.filter(F.col("vec_id") % 5 == 0).select("vec_id", "embedding", *carry)
    cents = kmeans_centroids_df(
        spark, base, k=8, iters=2, cache_key=(sf_dir, "ivf_mini")
    )
    layout = str(tmp_path / "layout")
    write_ivf_layout(base, cents, layout, carry=carry, partition_cols=partition_cols)
    return base, new, cents, layout


def test_ivf_append_replay_short_circuits(spark, sf_dir, tmp_path):
    """Idempotency contract: re-appending a committed batch_id is a
    no-op returning the recorded report — no duplicate vec_ids."""
    from data_pipeline_csv_spark.operators.similarity import ivf_append

    base, new, cents, layout = _mini_layout(spark, sf_dir, tmp_path)
    rep1 = ivf_append(new, cents, layout, batch_id="daily-001")
    ids_after_first = [r["vec_id"] for r in spark.read.parquet(layout).collect()]
    rep2 = ivf_append(new, cents, layout, batch_id="daily-001")
    assert rep2["replayed"] is True
    assert rep2["n_appended"] == rep1["n_appended"]
    assert rep2["lists_touched"] == rep1["lists_touched"]
    ids_after_second = [r["vec_id"] for r in spark.read.parquet(layout).collect()]
    assert sorted(ids_after_second) == sorted(ids_after_first)
    assert len(ids_after_first) == len(set(ids_after_first))


def test_ivf_append_crash_retry_no_duplicates(spark, sf_dir, tmp_path, monkeypatch):
    """Crash-safety contract: a failure AFTER the data-file move but
    BEFORE the sidecar commit (the widest window) leaves the staging
    manifest behind; the retry sweeps the partial move and lands the
    batch exactly once."""
    import data_pipeline_csv_spark.operators.similarity as sim
    from data_pipeline_csv_spark.operators.similarity import ivf_append

    base, new, cents, layout = _mini_layout(spark, sf_dir, tmp_path)
    n_base = spark.read.parquet(layout).count()

    real_commit = sim._commit_ivf_stats
    boom = {"n": 0}

    def crashing_commit(*a, **kw):
        boom["n"] += 1
        raise RuntimeError("simulated crash before sidecar commit")

    monkeypatch.setattr(sim, "_commit_ivf_stats", crashing_commit)
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        ivf_append(new, cents, layout, batch_id="daily-002")
    assert boom["n"] == 1
    monkeypatch.setattr(sim, "_commit_ivf_stats", real_commit)
    rep = ivf_append(new, cents, layout, batch_id="daily-002")
    assert rep["replayed"] is False
    ids = [r["vec_id"] for r in spark.read.parquet(layout).collect()]
    assert len(ids) == len(set(ids)) == n_base + rep["n_appended"]
    # committed: a further retry replays
    assert ivf_append(new, cents, layout, batch_id="daily-002")["replayed"] is True


def test_ivf_append_schema_mismatch_fails_fast(spark, sf_dir, tmp_path):
    """Appending without the layout's carry/partition columns must
    raise, not corrupt the labeled layout (r9 ADVICE)."""
    import pytest as _pytest

    from data_pipeline_csv_spark.operators.similarity import ivf_append

    base, new, cents, layout = _mini_layout(
        spark, sf_dir, tmp_path, carry=("label",), partition_cols=("list_id", "label")
    )
    with _pytest.raises(ValueError, match="partitioned by|schema"):
        ivf_append(new.select("vec_id", "embedding"), cents, layout)
    # and the carry-aware append works
    rep = ivf_append(new, cents, layout, batch_id="lab-1", carry=("label",))
    assert rep["n_appended"] > 0
    cols = set(spark.read.parquet(layout).columns)
    assert {"vec_id", "embedding", "list_id", "label"} <= cols


def test_ivf_retrain_refits_only_drifted_lists(spark, sf_dir, tmp_path):
    """Retrain contract: cells past the drift threshold are refitted
    (distortion non-increasing — Lloyd), every other list's files are
    byte-identical, and the sidecar's drift counters reset."""
    import os

    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.clustering import kmeans_centroids_df
    from data_pipeline_csv_spark.operators.similarity import (
        _read_ivf_stats,
        ivf_append,
        ivf_retrain,
        write_ivf_layout,
    )
    from data_pipeline_csv_spark.sources.tables import load_table

    corpus = load_table(spark, sf_dir, "embeddings")
    base = corpus.filter(F.col("label") < 5).select("vec_id", "embedding")
    new = corpus.filter(F.col("label") >= 5).select("vec_id", "embedding")
    cents = kmeans_centroids_df(
        spark, base, k=8, iters=2, cache_key=(sf_dir, "ivf_retrain_mini")
    )
    layout = str(tmp_path / "layout")
    write_ivf_layout(base, cents, layout)
    ivf_append(new, cents, layout, batch_id="drift-1")

    def _files():
        return {
            d: sorted(
                (f, os.path.getsize(os.path.join(layout, d, f)))
                for f in os.listdir(os.path.join(layout, d))
                if not f.startswith(".")
            )
            for d in os.listdir(layout)
            if d.startswith("list_id=")
        }

    before = _files()
    n_before = spark.read.parquet(layout).count()
    new_cents, rep = ivf_retrain(spark, layout, cents, drift_threshold=0.05, iters=2)
    assert rep["retrained_lists"], "planted drift must trigger refits"
    assert rep["distortion_fp_after"] <= rep["distortion_fp_before"]
    after = _files()
    retrained = {f"list_id={i}" for i in rep["retrained_lists"]}
    for d, files in before.items():
        if d not in retrained:
            assert files == after.get(d), d
    # no vectors lost or duplicated by the partition swaps
    ids = [r["vec_id"] for r in spark.read.parquet(layout).collect()]
    assert len(ids) == len(set(ids)) == n_before
    # drift counters reset on the retrained cells
    stats, _ = _read_ivf_stats(spark, layout)
    for r in stats.collect():
        if int(r["list_id"]) in rep["retrained_lists"]:
            assert int(r["n_drift"]) == 0
    # untouched cells keep their centroids bit-identically
    old = {r["c_id"]: list(r["c_emb"]) for r in cents.collect()}
    newc = {r["c_id"]: list(r["c_emb"]) for r in new_cents.collect()}
    for cid in old:
        if cid not in rep["retrained_lists"]:
            assert old[cid] == newc[cid]


def _drift_layout(spark, sf_dir, tmp_path):
    """Base = tight clusters (label < 5); appends from label >= 5 land
    outside the build-time edges -> planted drift."""
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.clustering import kmeans_centroids_df
    from data_pipeline_csv_spark.operators.similarity import write_ivf_layout
    from data_pipeline_csv_spark.sources.tables import load_table

    corpus = load_table(spark, sf_dir, "embeddings")
    base = corpus.filter(F.col("label") < 5).select("vec_id", "embedding")
    drift = corpus.filter(F.col("label") >= 5).select("vec_id", "embedding")
    cents = kmeans_centroids_df(
        spark, base, k=8, iters=2, cache_key=(sf_dir, "ivf_drift_mini")
    )
    layout = str(tmp_path / "layout")
    write_ivf_layout(base, cents, layout)
    return base, drift, cents, layout


def test_ivf_append_drift_accumulates_across_batches(spark, sf_dir, tmp_path):
    """r10 VERDICT #3: drift is measured against the FROZEN build-time
    edge (build_min_sim), so a second equally-drifted batch keeps
    registering — the old min-merged edge ratcheted down after batch 1
    and muted exactly the sustained-drift signal ivf_retrain needs."""
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.similarity import (
        _read_ivf_stats,
        ivf_append,
    )

    base, drift, cents, layout = _drift_layout(spark, sf_dir, tmp_path)
    edges_at_build = {
        int(r["list_id"]): r["build_min_sim"]
        for r in _read_ivf_stats(spark, layout)[0].collect()
    }
    b1 = drift.filter(F.col("vec_id") % 2 == 0)
    b2 = drift.filter(F.col("vec_id") % 2 == 1)
    rep1 = ivf_append(b1, cents, layout, batch_id="drift-a")
    rep2 = ivf_append(b2, cents, layout, batch_id="drift-b")
    assert rep1["n_drifted"] > 0
    # the second, equally-drifted batch must register comparably — not
    # ~zero against a ratcheted edge
    assert rep2["n_drifted"] > 0
    assert rep2["n_drifted"] >= 0.3 * rep1["n_drifted"]
    stats, _ = _read_ivf_stats(spark, layout)
    rows = stats.collect()
    assert sum(int(r["n_drift"]) for r in rows) == (
        rep1["n_drifted"] + rep2["n_drifted"]
    )
    # the frozen edge survived both merges bit-identically
    for r in rows:
        lid = int(r["list_id"])
        if lid in edges_at_build:
            assert r["build_min_sim"] == edges_at_build[lid], lid
        # while the observed min kept tracking the weakest member
        assert r["min_sim"] <= r["build_min_sim"]


def test_ivf_retrain_crash_mid_swap_recovers(spark, sf_dir, tmp_path, monkeypatch):
    """r10 VERDICT #2: rows move ACROSS lists in the retrain swap, so
    a mid-swap crash must roll the whole swap back (journal present)
    — no row lost or duplicated — and the retry must retrain cleanly
    from the untouched sidecar's drift signal."""
    import os

    import pytest as _pytest

    from data_pipeline_csv_spark.operators.similarity import (
        ivf_append,
        ivf_retrain,
    )

    base, drift, cents, layout = _drift_layout(spark, sf_dir, tmp_path)
    ivf_append(drift, cents, layout, batch_id="drift-1")
    n_before = spark.read.parquet(layout).count()
    ids_before = sorted(
        r["vec_id"] for r in spark.read.parquet(layout).select("vec_id").collect()
    )

    real_rename = os.rename

    def crashing_rename(src, dst):
        if str(dst).endswith(".retired"):
            real_rename(src, dst)  # the retire rename LANDS...
            raise RuntimeError("simulated crash mid-swap")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", crashing_rename)
    with _pytest.raises(RuntimeError):
        ivf_retrain(spark, layout, cents, drift_threshold=0.05, iters=2)
    monkeypatch.setattr(os, "rename", real_rename)

    # stranded: one list retired, journal still present
    assert [d for d in os.listdir(layout) if d.endswith(".retired")]
    st = os.path.join(layout, "_staging")
    assert any(d.startswith("retrain-") for d in os.listdir(st))

    new_cents, rep = ivf_retrain(spark, layout, cents, drift_threshold=0.05, iters=2)
    assert rep["retrained_lists"], "retry must retrain from the same signal"
    assert not [d for d in os.listdir(layout) if d.endswith(".retired")]
    assert not os.path.isdir(st) or not os.listdir(st)
    ids = sorted(
        r["vec_id"] for r in spark.read.parquet(layout).select("vec_id").collect()
    )
    assert len(ids) == len(set(ids)) == n_before
    assert ids == ids_before


def test_ivf_retrain_crash_before_cleanup_rolls_forward(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash AFTER the journal commit rename (swap complete, cleanup
    pending): the next maintenance entry rolls FORWARD — retired dirs
    dropped, no row lost or duplicated."""
    import os
    import shutil

    import pytest as _pytest
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.similarity import (
        ivf_append,
        ivf_retrain,
    )

    base, drift, cents, layout = _drift_layout(spark, sf_dir, tmp_path)
    b1 = drift.filter(F.col("vec_id") % 2 == 0)
    b2 = drift.filter(F.col("vec_id") % 2 == 1)
    ivf_append(b1, cents, layout, batch_id="drift-1")
    n_before = spark.read.parquet(layout).count()

    real_rmtree = shutil.rmtree

    def failing_rmtree(p, *a, **kw):
        if str(p).endswith(".retired"):
            raise RuntimeError("simulated crash before retired cleanup")
        return real_rmtree(p, *a, **kw)

    monkeypatch.setattr(shutil, "rmtree", failing_rmtree)
    with _pytest.raises(RuntimeError):
        ivf_retrain(spark, layout, cents, drift_threshold=0.05, iters=2)
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)
    assert [d for d in os.listdir(layout) if d.endswith(".retired")]

    # the NEXT maintenance op's entry sweep rolls forward
    rep = ivf_append(b2, cents, layout, batch_id="drift-2")
    assert rep["n_appended"] == b2.count()
    assert not [d for d in os.listdir(layout) if d.endswith(".retired")]
    ids = [r["vec_id"] for r in spark.read.parquet(layout).select("vec_id").collect()]
    assert len(ids) == len(set(ids)) == n_before + rep["n_appended"]


def test_ivf_retrain_rolls_back_uncommitted_append(
    spark, sf_dir, tmp_path, monkeypatch
):
    """r10 ADVICE (medium): a retrain between a crashed append and its
    retry would rewrite the drifted partitions and erase the b<tag>-
    retry prefixes — the retry would then double-apply the batch. The
    retrain entry sweep must roll the uncommitted batch back first."""
    import data_pipeline_csv_spark.operators.similarity as sim
    import pytest as _pytest
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.similarity import (
        ivf_append,
        ivf_retrain,
    )

    base, drift, cents, layout = _drift_layout(spark, sf_dir, tmp_path)
    b0 = drift.filter(F.col("vec_id") % 3 == 0)
    b1 = drift.filter(F.col("vec_id") % 3 != 0)
    ivf_append(b0, cents, layout, batch_id="seed-drift")  # committed drift

    real_commit = sim._commit_ivf_stats

    def crashing_commit(*a, **kw):
        raise RuntimeError("simulated crash before sidecar commit")

    monkeypatch.setattr(sim, "_commit_ivf_stats", crashing_commit)
    with _pytest.raises(RuntimeError):
        ivf_append(b1, cents, layout, batch_id="day-9")
    monkeypatch.setattr(sim, "_commit_ivf_stats", real_commit)

    # maintenance between crash and retry: must roll b1 back, then
    # rewrite the drifted lists
    _, rep = ivf_retrain(spark, layout, cents, drift_threshold=0.05, iters=2)
    assert rep["retrained_lists"]
    n_mid = spark.read.parquet(layout).count()
    assert n_mid == base.count() + b0.count()  # b1 fully rolled back

    rep2 = ivf_append(b1, cents, layout, batch_id="day-9")
    assert rep2["replayed"] is False
    ids = [r["vec_id"] for r in spark.read.parquet(layout).select("vec_id").collect()]
    assert len(ids) == len(set(ids)) == n_mid + b1.count()


def test_ivf_serving_read_heals_crashed_retrain_swap(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Heal on read for the IVF layout (r11 VERDICT wrong #3): a
    retrain killed mid-swap leaves a list stranded in
    ``list_id=N.retired`` plus the rollback journal. The SERVING read
    (read_ivf_lists — the primitive under every probe) must resolve
    the journal at entry and return the exact pre-retrain corpus, no
    maintenance op in between; a journal-less retrain staging dir
    (possibly a LIVE writer) must be left untouched."""
    import os

    import pytest as _pytest

    from data_pipeline_csv_spark.operators.similarity import (
        ivf_append,
        ivf_retrain,
        read_ivf_lists,
    )

    base, drift, cents, layout = _drift_layout(spark, sf_dir, tmp_path)
    ivf_append(drift, cents, layout, batch_id="drift-1")
    ids_before = sorted(
        r["vec_id"] for r in spark.read.parquet(layout).select("vec_id").collect()
    )
    lists_all = sorted(
        int(d.split("=")[1])
        for d in os.listdir(layout)
        if d.startswith("list_id=") and not d.endswith(".retired")
    )

    real_rename = os.rename

    def crashing_rename(src, dst):
        if str(dst).endswith(".retired"):
            real_rename(src, dst)  # the retire rename LANDS...
            raise RuntimeError("simulated crash mid-swap")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", crashing_rename)
    with _pytest.raises(RuntimeError):
        ivf_retrain(spark, layout, cents, drift_threshold=0.05, iters=2)
    monkeypatch.setattr(os, "rename", real_rename)
    assert [d for d in os.listdir(layout) if d.endswith(".retired")]

    # a journal-less staging dir alongside: the reader must not touch it
    live_staging = os.path.join(layout, "_staging", "retrain-liveprobe")
    os.makedirs(live_staging, exist_ok=True)

    # immediate serving read: journal rolls the swap back, probe serves
    got = sorted(
        r["vec_id"]
        for r in read_ivf_lists(spark, layout, lists_all).select("vec_id").collect()
    )
    assert got == ids_before
    assert not [d for d in os.listdir(layout) if d.endswith(".retired")]
    assert os.path.isdir(live_staging)  # reader left the live writer alone
    os.rmdir(live_staging)

    # maintenance still works after the read-side heal: the retry
    # retrains cleanly from the untouched sidecar
    _cents2, rep = ivf_retrain(spark, layout, cents, drift_threshold=0.05, iters=2)
    assert rep["retrained_lists"]
    ids = sorted(
        r["vec_id"] for r in spark.read.parquet(layout).select("vec_id").collect()
    )
    assert ids == ids_before


def test_ivf_heal_lock_excludes_and_recovers(spark, sf_dir, tmp_path):
    """r12 review: the heal's retrain rollback is rmtree(live) then
    rename(retired, live) — two concurrent healers interleaving could
    delete both copies of a list, so all sweeps run under _heal.lock.
    (a) a reader finding a FRESH lock (a live healer) must NOT mutate;
    (b) a STALE lock (crashed healer) is taken over and healing runs;
    (c) the lock is released afterwards so maintenance proceeds."""
    import os
    import time

    from data_pipeline_csv_spark.operators.similarity import (
        _recover_ivf_layout,
        read_ivf_lists,
    )

    base, _new, cents, layout = _mini_layout(spark, sf_dir, tmp_path)
    # strand a list manually: live renamed away, as a crashed swap does
    lists = sorted(
        d for d in os.listdir(layout) if d.startswith("list_id=")
    )
    victim = os.path.join(layout, lists[0])
    os.rename(victim, f"{victim}.retired")

    # (a) fresh lock held by "another healer": reader mode waits its
    # grace period and returns WITHOUT touching the stranded dir
    lock = os.path.join(layout, "_heal.lock")
    os.mkdir(lock)
    t0 = time.time()
    _recover_ivf_layout(layout, None)
    assert time.time() - t0 < 20  # bounded wait, no deadlock
    assert os.path.isdir(f"{victim}.retired")  # untouched under the lock
    assert os.path.isdir(lock)  # and the foreign lock was not stolen

    # (b) stale lock: age it past the takeover threshold; healing runs
    old = time.time() - 3600
    os.utime(lock, (old, old))
    _recover_ivf_layout(layout, None)
    assert os.path.isdir(victim)  # restored
    assert not os.path.isdir(f"{victim}.retired")
    # (c) lock released: a serving read heals/serves normally
    assert not os.path.isdir(lock)
    ids = read_ivf_lists(
        spark, layout, [int(d.split("=")[1]) for d in lists]
    ).count()
    assert ids == base.count()

    # (d) r12 ADVICE #1: STALE-LOCK TAKEOVER IS SINGLE-WINNER. The old
    # rmtree-then-mkdir takeover let two entrants interleave so one
    # deleted the lock the other had just recreated (both "holding"
    # it); the rename-first takeover gives the stale dir to exactly
    # one renamer. Race N threads at one stale lock: exactly one may
    # acquire, and the winner's fresh lock must survive the losers.
    import threading

    from data_pipeline_csv_spark.operators.similarity import _try_heal_lock

    os.mkdir(lock)
    os.utime(lock, (old, old))
    got = []
    barrier = threading.Barrier(8)

    def contend():
        barrier.wait()
        got.append(_try_heal_lock(layout))

    threads = [threading.Thread(target=contend) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [g for g in got if g is not None]
    assert len(winners) == 1
    assert os.path.isdir(lock)  # the winner's lock was not destroyed
    os.rmdir(lock)
