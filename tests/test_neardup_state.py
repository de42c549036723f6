"""Continuous near-dup state machinery: epoch replay idempotency and
index compaction (streaming/sinks.py neardup_epoch_writer /
compact_neardup_state). The writer is driven directly — no stream
needed — so the at-least-once replay path is exercised exactly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_pipeline_csv_spark.operators.dedup import minhash_lsh_pairs
from data_pipeline_csv_spark.sources.tables import load_table
from data_pipeline_csv_spark.streaming import (
    compact_neardup_state,
    neardup_epoch_writer,
)


# Cross pairs are oriented (old id, new id); the %-split batches used
# here mix id order (unlike the id-ordered staged feed the registered
# query drains), so compare pairs orientation-normalized.
def _pairs(spark, state_root):
    return {
        (min(r.d1, r.d2), max(r.d1, r.d2), r.jaccard)
        for r in spark.read.parquet(os.path.join(state_root, "pairs"))
        .select("d1", "d2", "jaccard")
        .collect()
    }


def _oneshot(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return {
        (min(r.d1, r.d2), max(r.d1, r.d2), r.jaccard)
        for r in minhash_lsh_pairs(docs, threshold=0.8).collect()
    }


def test_epoch_replay_rewrites_identical_state(spark, sf_dir, tmp_path):
    """A replayed epoch (at-least-once: its state dirs already exist on
    disk but the checkpoint never committed) must see only the
    pre-epoch state and recompute bit-identical pairs — NOT read its
    own docs back as history."""
    docs = load_table(spark, sf_dir, "documents")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    state = str(tmp_path / "state")
    w = neardup_epoch_writer(spark, state, threshold=0.8)
    w(b0, 0)
    w(b1, 1)
    first = _pairs(spark, state)
    assert first == _oneshot(spark, sf_dir)
    w(b1, 1)  # replay epoch 1 on top of its own leftover state
    assert _pairs(spark, state) == first


def test_compaction_folds_epochs_and_preserves_equivalence(spark, sf_dir, tmp_path):
    """compact_neardup_state folds the batch-keyed tail into one
    bucketed index table + one docs dir; epochs written after it probe
    the compacted tier and the drained pair set still equals the
    one-shot LSH. Re-compaction (compacted tier + new tail) also works."""
    docs = load_table(spark, sf_dir, "documents")
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    state = str(tmp_path / "state")
    w = neardup_epoch_writer(spark, state, threshold=0.8)
    try:
        from data_pipeline_csv_spark.streaming.sinks import _read_neardup_marker

        mark = os.path.join(state, "compacted_index_table")
        w(batches[0], 0)
        w(batches[1], 1)
        compact_neardup_state(spark, state, "t_nd_idx_compact_test")
        # epoch-keyed tail is gone; compacted tier is in place
        for sub in ("lsh_index", "seen_docs"):
            root = os.path.join(state, sub)
            assert not [d for d in os.listdir(root) if d.startswith("batch=")]
        tbl, docs_dir, upto = _read_neardup_marker(mark)
        assert upto == 1 and os.path.isdir(docs_dir)
        assert spark.table(tbl).count() > 0

        w(batches[2], 2)  # probes compacted tier
        assert _pairs(spark, state) == _oneshot(spark, sf_dir)

        # fold the new tail into a second generation; the first
        # generation is garbage-collected after the marker swap
        compact_neardup_state(spark, state, "t_nd_idx_compact_test")
        tbl2, docs_dir2, upto2 = _read_neardup_marker(mark)
        assert upto2 == 2 and tbl2 != tbl and docs_dir2 != docs_dir
        assert not os.path.isdir(docs_dir)
        assert not spark.catalog.tableExists(tbl)
        assert spark.read.parquet(docs_dir2).count() == docs.count()
        assert _pairs(spark, state) == _oneshot(spark, sf_dir)
    finally:
        for t in spark.catalog.listTables():
            if t.name.startswith("t_nd_idx_compact_test"):
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")


def test_in_stream_auto_compaction_bounds_tail_and_preserves_pairs(
    spark, sf_dir, tmp_path
):
    """compact_every=2 compacts INSIDE the feed (at epochs 2 and 4):
    the batch-keyed tail stays bounded, the drained pair set still
    equals the one-shot LSH, and replaying the compaction-triggering
    epoch (leftover state dirs, re-triggered compaction) is a no-op."""
    docs = load_table(spark, sf_dir, "documents")
    batches = [docs.filter(F.col("doc_id") % 5 == i) for i in range(5)]
    state = str(tmp_path / "state")
    w = neardup_epoch_writer(
        spark, state, threshold=0.8, compact_every=2,
        index_table="t_nd_idx_auto_compact_test",
    )
    try:
        for i, b in enumerate(batches):
            w(b, i)
            tail = [
                d
                for d in os.listdir(os.path.join(state, "lsh_index"))
                if d.startswith("batch=")
            ]
            assert len(tail) <= 2, f"tail unbounded at epoch {i}: {tail}"
        drained = _pairs(spark, state)
        assert drained == _oneshot(spark, sf_dir)
        # replay epoch 4 (the last compaction trigger): its own leftover
        # dirs exist, the compaction re-fires over an empty tail, and
        # the rewritten state must leave the drained pairs unchanged
        w(batches[4], 4)
        assert _pairs(spark, state) == drained
    finally:
        from data_pipeline_csv_spark.engine import clear_managed_table

        for t in spark.catalog.listTables():
            if t.name.startswith("t_nd_idx_auto_compact_test"):
                clear_managed_table(spark, t.name)


def test_compaction_watermark_ignores_resurrected_folded_tail(
    spark, sf_dir, tmp_path
):
    """The crash window AFTER the marker swap and BEFORE tail cleanup
    leaves folded batch dirs on disk; the marker's folded_upto
    watermark must make readers ignore them (no double-counted docs),
    and the next compaction must garbage-collect them."""
    import shutil

    from data_pipeline_csv_spark.streaming.sinks import (
        _neardup_state,
        _read_neardup_marker,
    )

    docs = load_table(spark, sf_dir, "documents")
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    state = str(tmp_path / "state")
    w = neardup_epoch_writer(spark, state, threshold=0.8)
    try:
        w(batches[0], 0)
        w(batches[1], 1)
        # preserve copies of the tail dirs, then compact (which folds
        # and deletes them)
        saved = str(tmp_path / "saved")
        for sub in ("lsh_index", "seen_docs"):
            shutil.copytree(os.path.join(state, sub), os.path.join(saved, sub))
        compact_neardup_state(spark, state, "t_nd_idx_wm_test")
        n_state_docs = _neardup_state(spark, state, epoch_id=-1)[0].count()
        # simulate the crash window: folded batch dirs reappear on disk
        for sub in ("lsh_index", "seen_docs"):
            for d in os.listdir(os.path.join(saved, sub)):
                shutil.copytree(
                    os.path.join(saved, sub, d), os.path.join(state, sub, d)
                )
        seen, idx = _neardup_state(spark, state, epoch_id=-1)
        assert seen.count() == n_state_docs  # not double-counted
        assert seen.select("doc_id").distinct().count() == n_state_docs
        # next epoch + compaction still converge and GC the stale dirs
        w(batches[2], 2)
        compact_neardup_state(spark, state, "t_nd_idx_wm_test")
        assert _pairs(spark, state) == _oneshot(spark, sf_dir)
        _tbl, _dir, upto = _read_neardup_marker(
            os.path.join(state, "compacted_index_table")
        )
        assert upto == 2
        for sub in ("lsh_index", "seen_docs"):
            assert not [
                d
                for d in os.listdir(os.path.join(state, sub))
                if d.startswith("batch=")
            ]
    finally:
        for t in spark.catalog.listTables():
            if t.name.startswith("t_nd_idx_wm_test"):
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")
