#!/usr/bin/env python
"""sf1.0 scaling spot-check (round-9 ask #6): measure the sec/SF slope
of the most expensive headline queries between sf0.1 and a 10x-scaled
derivative, converting the 100 TB design claims from plan-shape
argument to measured trend.

The sf1.0 input is DERIVED from the driver's sf0.1 testdata (never
synthesized from scratch): each table is replicated 10x with replica-
offset keys so cardinalities genuinely grow —

- documents: doc_id offset per replica AND every 8th token replaced by
  a replica-salted token. The salting kills cross-replica 3-gram
  similarity (Jaccard ~0.6 << the 0.8 threshold) while preserving
  WITHIN-replica near-dup structure, so the corpus carries the same
  dup RATE at 10x size — the honest scaling scenario for the dedup
  queries. Identical replicas instead would near-duplicate every doc
  9 times and measure an artificial quadratic blowup.
- lineitem: l_suppkey/l_partkey offset by 1e6 per replica (10 disjoint
  supply graphs; stays below the 1e7 part-id offset).
- embeddings: vec_id offset per replica (PCA/ANN cost is row-bound).
- orders: o_orderkey offset per replica (the CDC change-feed source).

Usage: python tools/scale_spotcheck.py  -> prints one JSON line and
writes SCALE_SPOTCHECK_r09.json. The derived data lives in
.scale_sf1/ (gitignored), built once and reused.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_csv_spark.queries import REGISTRY
from data_pipeline_csv_spark.session import get_spark

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(ROOT, ".scale_sf1")
REPLICAS = 10

# Per-round focus: the round's NEW operators (is the fresh machinery
# sublinear?) plus one cross-round anchor (embedding_pca_project — the
# flattest r9 scaler; if IT moves, the host moved). Earlier rounds'
# sets are recorded in SCALE_SPOTCHECK_r09/r10.json. r11: the two
# debuts, plus the two whose cost shape changed (dedup_cc_incremental
# now bills the cached-base fold + exact batch pairing;
# similarity_ivf_append measures drift against the frozen edge).
# r11 session 2 appends its layout debuts: the stats-skipping scan and
# its append twin (expect near-flat — the scan reads the files the box
# covers, not the table). graph_triangle_incremental is deliberately
# NOT probed through the registry here: its input graph (exact cosine
# >= 0.25 pairs, measured ~2% dense — 44,380 edges on 2,000 vectors at
# sf0.1) genuinely densifies ~n^2 with corpus size, so a 10x-corpus
# probe measures graph densification, not the fold machinery; the fold
# itself is probed at CONSTANT average degree by
# tools/triangle_fold_probe.py (recorded in SCALE.md).
# r12 focus: the delete/Hilbert-compact/join-strategy debuts, the two
# changed paths (the estimate entry now builds through the shared
# helper; the IVF append serves through the reader-mode heal), one
# heal-on-read representative (the stats scan: the added listdir is
# O(1) in table size — the layouts keep a fixed file count per corpus
# version), and the PCA anchor. graph_triangle_edge_incremental is,
# like the vertex fold, NOT probed through the registry (the cosine
# graph genuinely densifies ~n^2 with corpus size); the edge fold is
# probed at constant average degree by tools/triangle_fold_probe.py's
# edge mode (recorded in SCALE.md).
# r13 focus: the five debuts (time travel and the evolved scan are the
# commit-log read path at 10x — version resolution is one listdir +
# JSON read, so they should scale like the plain stats scan; the
# concurrent-appends entry races its two writers at BUILD time and
# measures the scan; hilbert3 is the 512-cell covering enumeration at
# 10x rows; the streaming CDC merge is NOT amortized — it drains
# 3 merge epochs over a 10x change feed each call, the honest
# question being whether the manifest-planned rewrite stays
# batch-bound), one protocol representative for the rewritten scans
# (layout_stats_skipping_scan: the old heal listdir is gone, a
# _commits listdir + explicit-schema read replaced it), and the PCA
# anchor (the flattest r9 scaler; if IT moves, the host moved).
# r14 second half: the IVF serving/maintenance entries behind the
# IVF commit-log port (manifest bisection + two nlists-row side-part
# reads replace partition discovery + the heal entry checks — expect
# the flat slopes the serving entries always had, now through the new
# protocol), re-anchored by PCA. Runs MERGE into an existing round
# artifact (the bucket-port first-half rows stay; a re-run anchor
# lands as embedding_pca_project_rerun so both runs' host baselines
# are recorded).
QUERIES = [
    "similarity_ann_ivf_ondisk",
    "similarity_ann_pq_rerank",
    "similarity_ann_filtered",
    "similarity_ivf_append",
    "similarity_ivf_retrain",
    "embedding_pca_project",  # host-baseline anchor, every round
]
# r14 first-half set (recorded in SCALE_SPOTCHECK_r14.json): the six
# bucket/debut/merge entries behind the bucket port —
# layout_zorder_pruned_scan, layout_zorder_compacted_scan,
# layout_hilbert_compacted_scan, layout_hilbert3_pruned_scan,
# layout_stats_retrofit_scan, layout_cdf_incremental_mv,
# layout_stats_merged_scan, + the anchor.


def _build_sf1_events(spark) -> None:
    """events: user_id/event_id offset per replica -> 10x the users
    with the same per-user event shape (the funnel/sessionize cost
    driver is users x events-per-user; this grows the former
    honestly). Guarded separately: the r9/r10 SF1 dirs predate it.
    The nanos-aware loader normalizes ts, so the derived table lands
    as plain micros."""
    if os.path.isdir(os.path.join(SF1, "events.parquet")):
        return
    from data_pipeline_csv_spark.sources.tables import load_table

    rep = spark.range(REPLICAS).select(F.col("id").cast("int").alias("rep"))
    ev = load_table(spark, SF01, "events")
    ev.crossJoin(rep).select(
        (F.col("event_id") + F.col("rep").cast("bigint") * 1_000_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep").cast("bigint") * 1_000_000_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    ).repartition(16).write.mode("overwrite").parquet(f"{SF1}/events.parquet")


def build_sf1(spark) -> None:
    _build_sf1_events(spark)
    if os.path.isdir(os.path.join(SF1, "documents.parquet")):
        return
    os.makedirs(SF1, exist_ok=True)
    rep = spark.range(REPLICAS).select(F.col("id").cast("int").alias("rep"))

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    n_docs = docs.count()
    salted = (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("rep").cast("bigint") * n_docs).alias("doc_id"),
            F.array_join(
                F.zip_with(
                    F.split(F.col("text"), " "),
                    F.sequence(F.lit(0), F.size(F.split(F.col("text"), " ")) - 1),
                    lambda t, i: F.when(
                        i % 8 == 0,
                        F.concat(F.lit("rep"), F.col("rep").cast("string"), F.lit("s"), i.cast("string")),
                    ).otherwise(t),
                ),
                " ",
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    salted.repartition(16).write.mode("overwrite").parquet(f"{SF1}/documents.parquet")

    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    li.crossJoin(rep).select(
        *[c for c in li.columns if c not in ("l_suppkey", "l_partkey")],
        (F.col("l_suppkey") + F.col("rep").cast("bigint") * 1_000_000).alias("l_suppkey"),
        (F.col("l_partkey") + F.col("rep").cast("bigint") * 1_000_000).alias("l_partkey"),
    ).repartition(32).write.mode("overwrite").parquet(f"{SF1}/lineitem.parquet")

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    n_emb = emb.count()
    emb.crossJoin(rep).select(
        (F.col("vec_id") + F.col("rep").cast("bigint") * n_emb).alias("vec_id"),
        "embedding",
        "label",
    ).repartition(16).write.mode("overwrite").parquet(f"{SF1}/embeddings.parquet")

    orders = spark.read.parquet(f"{SF01}/orders.parquet")
    orders.crossJoin(rep).select(
        *[c for c in orders.columns if c != "o_orderkey"],
        (F.col("o_orderkey") + F.col("rep").cast("bigint") * 10_000_000).alias("o_orderkey"),
    ).repartition(16).write.mode("overwrite").parquet(f"{SF1}/orders.parquet")


def main() -> None:
    spark = get_spark(app_name="scale_spotcheck",
                      driver_memory=os.environ.get("SPARK_DRIVER_MEMORY", "64g"))
    build_sf1(spark)
    # one codegen warmup per query at the smallest SF, then ONE timed
    # run per (query, SF) — this is a slope probe, not the bench
    for name in QUERIES:
        REGISTRY[name].fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    out = {}
    for name in QUERIES:
        row = {}
        for label, d in (("sf0.1", SF01), ("sf1.0", SF1)):
            # min-of-2: single runs on this host were measured varying
            # up to 4x (see bench.py's r9 note); the slope needs the
            # engine floor, not the co-tenancy ceiling
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, d).write.format("noop").mode("overwrite").save()
                el = round(time.perf_counter() - t0, 2)
                best = el if best is None or el < best else best
            row[label] = best
        row["ratio_10x"] = round(row["sf1.0"] / row["sf0.1"], 2)
        out[name] = row
        print(name, row, flush=True)
    rec = {"metric": "scale_spotcheck", "replicas": REPLICAS, "queries": out}
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(ROOT, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    n = max(rounds) + 1 if rounds else 0
    path = os.path.join(ROOT, f"SCALE_SPOTCHECK_r{n:02d}.json")
    if os.path.isfile(path):
        # second focus set in the same round: MERGE — earlier rows are
        # a different focus set's record, not stale data; a duplicate
        # anchor reading lands under a _rerun suffix
        with open(path) as f:
            prev = json.load(f)
        merged = dict(prev.get("queries", {}))
        for k, v in out.items():
            merged[f"{k}_rerun" if k in merged else k] = v
        rec = {**prev, "queries": merged}
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
