"""simhash_neardup_pairs: banding must find exactly the brute-force pairs."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from data_pipeline_csv_spark.operators.dedup import simhash, simhash_neardup_pairs
from data_pipeline_csv_spark.sources.tables import load_table


def test_banding_matches_bruteforce(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fps = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    want = {
        (a, b): bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
        for a, b in combinations(sorted(fps), 2)
        if bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    got = {
        (r["d1"], r["d2"]): r["hamming"]
        for r in simhash_neardup_pairs(docs, max_hamming=3).collect()
    }
    assert got == want  # no candidate missed (pigeonhole), none invented


def test_identical_docs_distance_zero(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    clones = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    pairs = simhash_neardup_pairs(docs.unionByName(clones), max_hamming=0)
    got = {(r["d1"], r["d2"]) for r in pairs.filter("d2 - d1 = 1000000").collect()}
    want = {(r["doc_id"], r["doc_id"] + 1_000_000) for r in docs.select("doc_id").collect()}
    assert want <= got  # every clone pair found at hamming 0
