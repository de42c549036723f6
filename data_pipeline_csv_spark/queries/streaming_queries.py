"""Structured Streaming pipelines registered in the driver contract.

Each query stages the events table as a ts-ordered file feed, runs the
UNBOUNDED pipeline (watermarks, windowed state, incremental triggers)
to exhaustion, and returns the final result — so the driver's oracle
literally checks that incremental streaming execution converges to the
batch-SQL answer on the same data. n_users_approx (HLL state) is the
one column excluded: approximate by construction.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..streaming import (
    hourly_rollup_stream,
    read_events_stream,
    run_to_memory,
    stage_events_dir,
    stream_dedup_within_watermark,
)
from .registry import query


def _staged_run(spark: SparkSession, sf_dir: str, build, output_mode: str) -> DataFrame:
    staged = tempfile.mkdtemp(prefix="sg_stream_")
    try:
        stage_events_dir(spark, sf_dir, staged, n_files=4)
        stream = build(read_events_stream(spark, staged))
        out = run_to_memory(stream, spark, output_mode=output_mode)
        # memory sink tables are session-scoped; materialize before the
        # staging dir disappears.
        out.persist().count()
        return out
    finally:
        shutil.rmtree(staged, ignore_errors=True)


@query(
    "streaming_hourly_rollup",
    oracle="""
    SELECT
      date_trunc('hour', ts) AS bucket,
      event_type,
      COUNT(*) AS n_events,
      SUM(CAST(value AS DECIMAL(18,6))) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Watermarked tumbling-window streaming aggregation drained to its "
    "final state — incremental execution must converge to the batch "
    "GROUP BY (streaming/pipelines.py hourly_rollup_stream).",
    tags=("streaming", "window", "watermark"),
)
def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _staged_run(spark, sf_dir, hourly_rollup_stream, "update")
    w = W.partitionBy("bucket", "event_type").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("bucket", "event_type", "n_events", "sum_value")
    )


@query(
    "streaming_dedup_event_ids",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props FROM events
    """,
    doc="dropDuplicatesWithinWatermark over the event feed: event_id is "
    "unique in this data, so bounded-state streaming dedup must return "
    "every row exactly once.",
    tags=("streaming", "dedup", "watermark"),
)
def streaming_dedup_event_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _staged_run(spark, sf_dir, stream_dedup_within_watermark, "append")
    return out.select("event_id", "ts", "user_id", "event_type", "value", "props")
