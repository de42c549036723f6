"""ANN quality: IVF top-k must recall most of the exact brute-force
top-k (the correctness harness can't check approximate results)."""

from data_pipeline_csv_spark.operators.similarity import ann_ivf_topk, cosine_topk
from data_pipeline_csv_spark.sources.tables import load_table

QUERY_IDS = [0, 1, 2, 3, 4, 5, 6, 7]


def test_ivf_recall_at_10(spark, sf_dir):
    corpus = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(corpus, QUERY_IDS, k=10).select("q_id", "vec_id").collect()
    approx = ann_ivf_topk(corpus, QUERY_IDS, k=10).select("q_id", "vec_id").collect()
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
