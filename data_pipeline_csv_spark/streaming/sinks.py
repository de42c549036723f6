"""Streaming sinks: foreachBatch parquet upsert + memory (tests)."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def foreach_batch_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint: str, mode: str = "append"
) -> StreamingQuery:
    """Run a stream into parquet via foreachBatch.

    foreachBatch gives exactly-once-per-epoch batch semantics: the
    epoch id makes the write idempotent on retry (overwrite-by-epoch
    partition), and the batch DataFrame accepts any batch writer —
    the escape hatch for sinks with no native streaming support
    (JDBC, upserts).
    """

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode(mode).parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        stream_df.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def run_to_memory(
    stream_df: DataFrame,
    spark: SparkSession,
    output_mode: str = "update",
    name: str | None = None,
) -> DataFrame:
    """Drain a bounded stream into the memory sink; return the result table.

    Test-only: processAllAvailable blocks until every staged file is
    consumed, then the in-memory table holds the full output. With
    output_mode="update" the table may hold multiple versions of a
    key — callers take the latest by a monotonic column when needed.
    """
    name = name or f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def state_merge_writer(state_root: str, keys, sums, mins=(), maxs=()):
    """foreachBatch writer maintaining an incremental MV (parquet state).

    Each epoch: aggregate the micro-batch into mergeable fixed-point
    state (operators/incremental.py), merge with the current MV state,
    write a new generation dir, and atomically repoint the ``current``
    symlink. State size is |distinct keys| — bounded regardless of
    stream length, which is why this MV needs NO watermark: it is the
    streaming twin of batch incremental_mv_refresh, not a windowed agg.

    Exactly-once across retries: the epoch id is recorded with the
    swap; a replayed epoch (foreachBatch's at-least-once contract)
    short-circuits instead of double-merging. Production systems get
    this from a transactional table format (Delta/Iceberg MERGE);
    the generation-plus-marker dance is the same commit protocol on
    bare parquet.
    """
    import os

    from ..operators.incremental import merge_agg_state, partial_agg_state

    cur = os.path.join(state_root, "current")
    marker = os.path.join(state_root, "last_epoch")

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        if os.path.exists(marker):
            with open(marker) as fh:
                if int(fh.read().strip()) >= epoch_id:
                    return  # epoch replay: already merged
        spark = batch_df.sparkSession
        delta = partial_agg_state(batch_df, keys, sums, dict(mins) or None, dict(maxs) or None)
        if os.path.lexists(cur):
            base = spark.read.parquet(cur)
            merged = merge_agg_state([base, delta], keys, mins=list(mins), maxs=list(maxs))
        else:
            merged = delta
        gen = os.path.join(state_root, f"gen-{epoch_id}")
        merged.write.mode("overwrite").parquet(gen)
        tmp = f"{cur}.tmp-{epoch_id}"
        if os.path.lexists(tmp):
            os.remove(tmp)
        os.symlink(gen, tmp)
        os.replace(tmp, cur)  # atomic repoint
        with open(marker, "w") as fh:
            fh.write(str(epoch_id))

    return write_epoch


def run_incremental_mv(
    stream_df: DataFrame,
    spark: SparkSession,
    state_root: str,
    checkpoint: str,
    keys,
    sums,
    mins=(),
    maxs=(),
) -> DataFrame:
    """Drain a bounded stream through :func:`state_merge_writer`;
    return the raw (un-finalized) MV state DataFrame."""
    import os

    os.makedirs(state_root, exist_ok=True)
    q = (
        stream_df.writeStream.foreachBatch(
            state_merge_writer(state_root, keys, sums, mins, maxs)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(os.path.join(state_root, "current"))


def run_streaming_neardup(
    stream_docs,
    spark,
    state_root: str,
    checkpoint: str,
    threshold: float = 0.8,
):
    """Continuous near-duplicate dedup over an arriving document feed.

    Each foreachBatch epoch (a) finds near-dup pairs WITHIN the batch
    with the full MinHash-LSH pipeline, (b) probes the ACCUMULATED LSH
    index for cross pairs against everything seen so far
    (operators/dedup.py minhash_lsh_incremental — signature work is
    O(batch), the history is touched only through its index and the
    candidate-pruned verification), then (c) appends the batch's band
    entries + docs to the state. Every epoch's writes land in
    batch_id-keyed subdirectories with overwrite semantics, so a
    replayed epoch (foreachBatch's at-least-once contract) rewrites
    identical content — idempotent.

    Because every pair's two sides either share a batch (within) or
    the later side probes the earlier side's index (cross), the
    accumulated pair set after draining the feed equals the one-shot
    batch LSH over the whole corpus — which is what the driver oracle
    checks.

    Long-running feeds: the state accumulates one subdirectory per
    epoch, and partition discovery over thousands of epoch dirs slows
    the per-epoch index read — periodically compact the batch-keyed
    state into a single index table bucketed by (band_id, band_hash)
    (engine.write_bucketed), which also makes the probe join
    shuffle-free on the index side.

    Returns the accumulated (d1, d2, jaccard) pairs DataFrame.
    """
    import os

    from ..operators.dedup import (
        lsh_band_entries,
        minhash_lsh_incremental,
        minhash_lsh_pairs,
    )

    idx_root = os.path.join(state_root, "lsh_index")
    docs_root = os.path.join(state_root, "seen_docs")
    pairs_root = os.path.join(state_root, "pairs")

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = batch_df.select("doc_id", "text")
        pairs = minhash_lsh_pairs(batch, threshold=threshold)
        if os.path.isdir(docs_root) and any(
            d.startswith("batch=") and d != f"batch={epoch_id}"
            for d in os.listdir(docs_root)
        ):
            seen = spark.read.parquet(docs_root).select("doc_id", "text")
            idx = spark.read.parquet(idx_root).select("doc_id", "band_id", "band_hash")
            cross = minhash_lsh_incremental(seen, batch, threshold=threshold, index=idx)
            pairs = pairs.unionByName(cross)
        pairs.write.mode("overwrite").parquet(f"{pairs_root}/batch={epoch_id}")
        lsh_band_entries(batch).write.mode("overwrite").parquet(
            f"{idx_root}/batch={epoch_id}"
        )
        batch.write.mode("overwrite").parquet(f"{docs_root}/batch={epoch_id}")

    (
        stream_docs.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(pairs_root).select("d1", "d2", "jaccard")
