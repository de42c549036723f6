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


def _neardup_paths(state_root: str) -> dict:
    import os

    return {
        "idx": os.path.join(state_root, "lsh_index"),
        "docs": os.path.join(state_root, "seen_docs"),
        "pairs": os.path.join(state_root, "pairs"),
        "cidx": os.path.join(state_root, "compacted_index"),
        "cdocs": os.path.join(state_root, "compacted_docs"),
        "cmark": os.path.join(state_root, "compacted_index_table"),
    }


def _read_neardup_marker(cmark_path: str):
    """(table, docs_dir, folded_upto) from the compaction marker, or
    (None, None, -1) when no compaction has committed yet."""
    import os

    if not os.path.exists(cmark_path):
        return None, None, -1
    with open(cmark_path) as fh:
        table, docs_dir, upto = fh.read().strip().splitlines()
    return table, docs_dir, int(upto)


def _neardup_state(spark, state_root: str, epoch_id: int):
    """(seen_docs, index) DataFrames visible to an epoch, or (None, None).

    Two tiers: the COMPACTED tier (one bucketed index table + one docs
    dir, named by the marker — see :func:`compact_neardup_state`) plus
    the batch-keyed tail. Tail visibility is ``folded_upto < batch !=
    epoch_id``: the marker's watermark excludes batches already folded
    into the compacted tier (so a crash between the marker swap and
    the tail cleanup can never double-read a folded batch), and the
    epoch's own batch={epoch_id} partitions are excluded — a replayed
    epoch's dirs may already exist on disk (failure between the state
    writes and the checkpoint commit), and including them would break
    minhash_lsh_incremental's disjoint-ids precondition and change the
    replayed output.
    """
    import os

    from pyspark.sql import functions as F

    p = _neardup_paths(state_root)
    docs_parts, idx_parts = [], []
    table, docs_dir, folded_upto = _read_neardup_marker(p["cmark"])
    if table is not None:
        idx_parts.append(spark.table(table).select("doc_id", "band_id", "band_hash"))
        docs_parts.append(spark.read.parquet(docs_dir).select("doc_id", "text"))
    if os.path.isdir(p["docs"]) and any(
        d.startswith("batch=")
        and d != f"batch={epoch_id}"
        and int(d.split("=", 1)[1]) > folded_upto
        for d in os.listdir(p["docs"])
    ):
        cond = (F.col("batch") != epoch_id) & (F.col("batch") > folded_upto)
        docs_parts.append(
            spark.read.parquet(p["docs"]).where(cond).select("doc_id", "text")
        )
        idx_parts.append(
            spark.read.parquet(p["idx"])
            .where(cond)
            .select("doc_id", "band_id", "band_hash")
        )
    if not docs_parts:
        return None, None
    seen = docs_parts[0]
    for extra in docs_parts[1:]:
        seen = seen.unionByName(extra)
    idx = idx_parts[0]
    for extra in idx_parts[1:]:
        idx = idx.unionByName(extra)
    return seen, idx


def neardup_epoch_writer(
    spark, state_root: str, threshold: float = 0.8,
    epoch_partitions: int | None = None,
    compact_every: int | None = None,
    index_table: str = "sg_neardup_stream_idx",
):
    """foreachBatch writer for continuous near-dup dedup (module-level
    so replay/compaction behavior is unit-testable without a stream).

    Each epoch (a) finds near-dup pairs WITHIN the batch with the full
    MinHash-LSH pipeline, (b) probes the ACCUMULATED LSH index for
    cross pairs against everything seen so far
    (operators/dedup.py minhash_lsh_incremental — signature work is
    O(batch), the history is touched only through its index and the
    candidate-pruned verification), then (c) appends the batch's band
    entries + docs to the state. Every epoch's writes land in
    batch_id-keyed subdirectories with overwrite semantics, AND the
    state reads exclude the epoch's own batch partition
    (:func:`_neardup_state`) — so a replayed epoch (foreachBatch's
    at-least-once contract) sees exactly the pre-epoch state and
    rewrites identical content — idempotent.

    ``epoch_partitions`` bounds the FILE COUNT of each epoch's state
    writes (coalesce before write). Without it, every epoch inherits
    the session's shuffle-partition count and a small micro-batch
    fans out into that many tiny files per state dir — the small-files
    accretion that slows every later epoch's state read. Size it to
    ~128 MB files for the expected micro-batch volume (None = leave
    the write parallelism alone; compact_neardup_state remains the
    backstop for long feeds either way).

    ``compact_every=N`` compacts IN-STREAM: every Nth epoch first folds
    all committed state into the bucketed ``index_table`` + one docs
    dir (:func:`compact_neardup_state` with ``exclude_epoch`` — see
    there for why this is replay-safe), so the batch-keyed tail never
    exceeds N dirs no matter how long the feed runs — the unbounded
    epoch-dir growth a continuous feed otherwise accretes. After
    compaction the cross-probe's index side is the bucketed table, so
    the probe join is shuffle-free on the corpus side.
    """
    import os

    from pyspark.storagelevel import StorageLevel

    from ..operators.dedup import (
        _verify_candidates,
        lsh_band_entries,
        lsh_bucket_candidates,
        lsh_probe_candidates,
    )

    p = _neardup_paths(state_root)

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if compact_every and epoch_id > 0 and epoch_id % compact_every == 0:
            compact_neardup_state(
                spark, state_root, index_table, exclude_epoch=epoch_id
            )
        batch = batch_df.select("doc_id", "text")
        # The batch's band entries feed THREE consumers (within-batch
        # bucketing, the cross-probe, the index write); sign once and
        # persist for the epoch instead of recomputing the signature
        # pipeline per consumer (measured ~25% off the per-epoch cost).
        entries = lsh_band_entries(batch).persist()
        cand = None
        try:
            # Within-batch and cross-history candidates run through ONE
            # exact-Jaccard verification pass (vs one per candidate
            # source): the candidate sets are disjoint by construction
            # (cross pairs always carry one pre-epoch side), so the
            # union verifies each pair once, halves the per-epoch
            # verification stages, and fetches each candidate doc's
            # shingle set once even when a doc shows up in both sets.
            cand = lsh_bucket_candidates(entries)
            seen, idx = _neardup_state(spark, state_root, epoch_id)
            verify_docs = batch
            if seen is not None:
                # d1 = history doc, d2 = batch doc (lsh_probe_candidates
                # orientation) — same orientation minhash_lsh_incremental
                # emits, so the drained union is unchanged.
                cand = cand.unionByName(lsh_probe_candidates(idx, entries))
                verify_docs = seen.unionByName(batch)
            cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
            pairs = _verify_candidates(verify_docs, cand, threshold)
            # pairs: leave alone — AQE already coalesces the post-shuffle
            # output to few files, and a coalesce here would collapse the
            # verification pipeline's parallelism (coalesce reaches up
            # through the whole stage; measured 28% slower).
            pairs.write.mode("overwrite").parquet(f"{p['pairs']}/batch={epoch_id}")

            def sized(df: DataFrame) -> DataFrame:
                return df.coalesce(epoch_partitions) if epoch_partitions else df

            # entries (cache-backed) and docs (a straight staged-file
            # scan) have no expensive upstream to throttle — capping
            # their file fan-out is pure small-files win.
            sized(entries).write.mode("overwrite").parquet(
                f"{p['idx']}/batch={epoch_id}"
            )
            sized(batch).write.mode("overwrite").parquet(
                f"{p['docs']}/batch={epoch_id}"
            )
        finally:
            entries.unpersist()
            if cand is not None:
                cand.unpersist()

    return write_epoch


def compact_neardup_state(
    spark, state_root: str, index_table: str, n_buckets: int = 16,
    exclude_epoch: int = -1,
) -> None:
    """Fold the batch-keyed epoch state into ONE bucketed index table +
    ONE docs dir — the maintenance job a long-running feed needs.

    Without it, state accumulates a subdirectory per epoch and
    partition discovery over thousands of dirs degrades every epoch's
    index read. After compaction the probe side reads a single catalog
    table bucketed by (band_id, band_hash) — the probe join against it
    is shuffle-free on the index side
    (tests/test_plans.py::test_compacted_lsh_probe_index_side_shuffle_free)
    — plus whatever small batch tail arrived since.

    Safe to run from two places: (a) while the stream is
    stopped/quiescent (after awaitTermination every drained epoch is
    committed) with the default ``exclude_epoch=-1``, folding
    everything; (b) INSIDE epoch N's foreachBatch before N writes its
    own state, passing ``exclude_epoch=N`` — every batch dir < N is
    checkpoint-committed by the time N runs, and excluding N's own
    (possibly replayed-leftover) partitions keeps the replay-
    idempotency argument of :func:`_neardup_state` intact. This is how
    ``compact_every`` in :func:`neardup_epoch_writer` keeps a long
    feed's state dir count bounded without stopping the stream.

    CRASH-SAFE commit protocol (every window leaves a readable,
    never-double-counted state): the fold is written to a NEW
    generation (table ``{index_table}_g{N}`` + docs dir
    ``compacted_docs_g{N}``, N = highest folded batch id), then the
    marker file — (table, docs dir, folded_upto watermark) — is
    swapped in atomically via os.replace, and ONLY THEN is anything
    deleted. A crash before the swap leaves the old marker + full
    tail (the orphaned new generation is garbage-collected by the
    next run); a crash after the swap leaves folded tail dirs on disk
    that readers already ignore via the watermark
    (:func:`_neardup_state` reads only ``batch > folded_upto``), so
    cleanup is resumable. A replayed epoch that re-triggers its
    compaction folds an empty visible tail and regenerates identical
    content.

    At 100 TB scale the rewrite-the-world shape here becomes a tiered
    (LSM-style) fold — compact only the tail into a new generation and
    merge generations geometrically — but the read path (ONE bucketed
    table + small tail) and the probe plan are already the end state.
    """
    import os
    import shutil

    from ..engine import clear_managed_table

    p = _neardup_paths(state_root)
    _old_table, _old_docs, folded_upto = _read_neardup_marker(p["cmark"])
    tail_ids = [
        int(d.split("=", 1)[1])
        for d in (os.listdir(p["docs"]) if os.path.isdir(p["docs"]) else [])
        if d.startswith("batch=")
        and d != f"batch={exclude_epoch}"
        and int(d.split("=", 1)[1]) > folded_upto
    ]
    if _old_table is not None and not tail_ids:
        # nothing new to fold (e.g. a replayed epoch re-triggering its
        # compaction): a re-fold would regenerate identical content —
        # skip it entirely so the committed generation is never dropped
        # and rebuilt in place.
        return
    seen, idx = _neardup_state(spark, state_root, epoch_id=exclude_epoch)
    if seen is None:
        return
    gen = max([folded_upto, *tail_ids])
    new_table = f"{index_table}_g{gen}"
    new_docs = os.path.join(state_root, f"compacted_docs_g{gen}")
    # 1. stage the fold (a crashed prior attempt at this gen is swept)
    staging = os.path.join(state_root, "_compact_staging")
    shutil.rmtree(staging, ignore_errors=True)
    idx.write.mode("overwrite").parquet(os.path.join(staging, "idx"))
    seen.write.mode("overwrite").parquet(os.path.join(staging, "docs"))
    clear_managed_table(spark, new_table)
    (
        spark.read.parquet(os.path.join(staging, "idx"))
        .write.mode("overwrite")
        .bucketBy(n_buckets, "band_id", "band_hash")
        .sortBy("band_id", "band_hash")
        .format("parquet")
        .saveAsTable(new_table)
    )
    shutil.rmtree(new_docs, ignore_errors=True)
    os.rename(os.path.join(staging, "docs"), new_docs)
    # 2. COMMIT: atomic marker swap — readers now see the new tier and
    #    ignore tail batches <= gen
    tmp_mark = f"{p['cmark']}.tmp"
    with open(tmp_mark, "w") as fh:
        fh.write(f"{new_table}\n{new_docs}\n{gen}\n")
    os.replace(tmp_mark, p["cmark"])
    # 3. cleanup, all resumable garbage collection: folded tail dirs,
    #    prior generations (incl. orphans from crashed runs), staging
    for root in (p["idx"], p["docs"]):
        if os.path.isdir(root):
            for d in os.listdir(root):
                if d.startswith("batch=") and int(d.split("=", 1)[1]) <= gen:
                    shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    for d in os.listdir(state_root):
        full = os.path.join(state_root, d)
        if d.startswith("compacted_docs_g") and full != new_docs:
            shutil.rmtree(full, ignore_errors=True)
    for t in spark.catalog.listTables():
        if t.name.startswith(f"{index_table}_g".lower()) and t.name != new_table.lower():
            clear_managed_table(spark, t.name)
    shutil.rmtree(staging, ignore_errors=True)


def run_streaming_neardup(
    stream_docs,
    spark,
    state_root: str,
    checkpoint: str,
    threshold: float = 0.8,
    epoch_partitions: int | None = None,
    compact_every: int | None = None,
    index_table: str = "sg_neardup_stream_idx",
):
    """Continuous near-duplicate dedup over an arriving document feed
    (see :func:`neardup_epoch_writer` for the per-epoch algorithm and
    the idempotency argument).

    Because every pair's two sides either share a batch (within) or
    the later side probes the earlier side's index (cross), the
    accumulated pair set after draining the feed equals the one-shot
    batch LSH over the whole corpus — which is what the driver oracle
    checks. ``compact_every=N`` folds the epoch-keyed state into one
    bucketed index table every Nth epoch IN-STREAM (replay-safe; see
    :func:`compact_neardup_state`), so per-epoch reads stay O(1) dirs
    on long-running feeds; between feeds the same fold can be run
    manually.

    Returns the accumulated (d1, d2, jaccard) pairs DataFrame.
    """
    import os

    (
        stream_docs.writeStream.foreachBatch(
            neardup_epoch_writer(
                spark, state_root, threshold=threshold,
                epoch_partitions=epoch_partitions,
                compact_every=compact_every, index_table=index_table,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(os.path.join(state_root, "pairs")).select(
        "d1", "d2", "jaccard"
    )
