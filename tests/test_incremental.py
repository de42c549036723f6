"""Incremental MV state merge on literal frames: mergeability is the
contract — any split of the input, merged in any grouping, must be
bit-identical to the single-pass aggregate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipeline_csv_spark.operators.incremental import (
    finalize_state,
    merge_agg_state,
    partial_agg_state,
)

SCALE = 100


def _rows(spark):
    data = [
        ("a", 1.25), ("a", 2.50), ("a", -0.75),
        ("b", 10.00), ("b", 0.01),
        ("c", 3.33),
    ]
    return spark.createDataFrame(data, "k string, x double")


def _finish(states):
    merged = merge_agg_state(states, ["k"], mins=["min_x"], maxs=["max_x"])
    out = finalize_state(merged, sums={"sum_x": SCALE}, avgs={"avg_x": "sum_x"})
    return {
        (r["k"], r["n_rows"], r["sum_x"], r["avg_x"], r["min_x"], r["max_x"])
        for r in out.collect()
    }


def test_state_merge_equals_single_pass(spark):
    df = _rows(spark)
    spec = dict(
        sums={"sum_x": (F.col("x"), SCALE)},
        mins={"min_x": F.col("x")},
        maxs={"max_x": F.col("x")},
    )
    whole = _finish([partial_agg_state(df, ["k"], **spec)])

    # two-way split on an arbitrary predicate
    two = _finish(
        [
            partial_agg_state(df.filter(F.col("x") > 1), ["k"], **spec),
            partial_agg_state(df.filter(~(F.col("x") > 1)), ["k"], **spec),
        ]
    )
    # three-way split, merged pairwise then with the straggler
    # (associativity: merge of merged state is still valid state)
    a = partial_agg_state(df.filter(F.col("x") < 0), ["k"], **spec)
    b = partial_agg_state(df.filter(F.col("x").between(0, 3)), ["k"], **spec)
    c = partial_agg_state(df.filter(F.col("x") > 3), ["k"], **spec)
    ab = merge_agg_state([a, b], ["k"], mins=["min_x"], maxs=["max_x"])
    three = _finish([ab, c])

    assert whole == two == three
    assert ("a", 3, 3.0, 1.0, -0.75, 2.5) in whole


def test_empty_delta_is_identity(spark):
    df = _rows(spark)
    spec = dict(
        sums={"sum_x": (F.col("x"), SCALE)},
        mins={"min_x": F.col("x")},
        maxs={"max_x": F.col("x")},
    )
    base = partial_agg_state(df, ["k"], **spec)
    empty = partial_agg_state(df.filter(F.lit(False)), ["k"], **spec)
    assert _finish([base, empty]) == _finish([base])


def test_streaming_state_merge_epoch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once per epoch: a replayed epoch must
    NOT double-merge into the MV state."""
    from data_pipeline_csv_spark.operators.incremental import finalize_state
    from data_pipeline_csv_spark.streaming.sinks import state_merge_writer

    root = str(tmp_path / "mv")
    import os

    os.makedirs(root)
    writer = state_merge_writer(
        root, ["k"], {"sum_x": (F.col("x"), SCALE)}
    )
    b0 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, x double")
    b1 = spark.createDataFrame([("a", 0.5)], "k string, x double")
    writer(b0, 0)
    writer(b1, 1)
    writer(b1, 1)  # replayed epoch: must be a no-op
    state = spark.read.parquet(os.path.join(root, "current"))
    out = finalize_state(state, sums={"sum_x": SCALE})
    got = {(r["k"], r["n_rows"], r["sum_x"]) for r in out.collect()}
    assert got == {("a", 2, 1.5), ("b", 1, 2.0)}


@pytest.mark.slow
def test_incremental_components_equals_oneshot(spark, sf_dir):
    """Contraction-based incremental CC == one-shot CC over the union
    graph, for several batch splits — labels (min ids) compose."""
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.components import (
        connected_components,
        incremental_components,
    )
    from data_pipeline_csv_spark.operators.dedup import ngram_jaccard_pairs
    from data_pipeline_csv_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    all_pairs = ngram_jaccard_pairs(docs, threshold=0.8).select("d1", "d2").persist()
    want = {
        (r["node"], r["component"])
        for r in connected_components(all_pairs, src="d1", dst="d2").collect()
    }
    for mod in (5, 3):
        # batch pairs = everything touching batch docs; base = the rest
        touches_batch = (F.col("d1") % mod == 0) | (F.col("d2") % mod == 0)
        new_pairs = all_pairs.filter(touches_batch)
        base_pairs = all_pairs.filter(~touches_batch)
        labels = connected_components(base_pairs, src="d1", dst="d2")
        got = {
            (r["node"], r["component"])
            for r in incremental_components(
                labels, new_pairs, src="d1", dst="d2"
            ).collect()
        }
        assert got == want
    # empty batch: labeling unchanged
    empty = all_pairs.filter(F.lit(False))
    labels = connected_components(all_pairs, src="d1", dst="d2")
    got = {
        (r["node"], r["component"])
        for r in incremental_components(labels, empty, src="d1", dst="d2").collect()
    }
    assert got == want
    all_pairs.unpersist()
