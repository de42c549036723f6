"""Structured Streaming surface (SURVEY.md §7 phase 3).

The reference has no streaming at all (SURVEY.md §2.2: zero streaming
constructs); this module is the scale-out extension: the batch event
queries in ``queries/events.py`` re-expressed as unbounded pipelines
with watermarks, window/session aggregation, stateful dedup, and an
``applyInPandasWithState`` custom operator.

Design notes for cluster scale:

- Every aggregation declares a watermark so state is bounded — an
  unbounded ``groupBy`` over a stream would accumulate state forever
  on a 1000-executor cluster.
- State lives in the state store keyed by the grouping columns; the
  shuffle that routes rows to their state partition is the same hash
  shuffle the batch twin performs, so ``spark.sql.shuffle.partitions``
  sizes both.
- Sinks are ``foreachBatch`` (idempotent parquet upsert per epoch) or
  memory (tests only).
"""

from .pipelines import (
    attribution_join_stream,
    enriched_rollup_stream,
    hourly_rollup_stream,
    session_window_stream,
    sliding_counts_stream,
    stream_dedup_within_watermark,
    user_running_totals_stream,
)
from .sinks import (
    cdc_stats_merge_writer,
    cdc_upsert_writer,
    run_streaming_cdc_stats_merge,
    run_streaming_cdc_merge,
    ivf_ingest_writer,
    run_streaming_ivf_ingest,
    run_streaming_stats_ingest,
    stats_ingest_writer,
    compact_neardup_state,
    foreach_batch_parquet,
    kmv_state_writer,
    neardup_epoch_writer,
    run_streaming_kmv,
    run_streaming_neardup,
    run_to_memory,
)
from .sources import (
    read_docs_stream,
    read_events_stream,
    stage_changes_dir,
    stage_docs_dir,
    stage_events_dir,
)

__all__ = [
    "attribution_join_stream",
    "enriched_rollup_stream",
    "hourly_rollup_stream",
    "session_window_stream",
    "sliding_counts_stream",
    "stream_dedup_within_watermark",
    "user_running_totals_stream",
    "foreach_batch_parquet",
    "run_to_memory",
    "read_events_stream",
    "stage_events_dir",
    "stage_docs_dir",
    "stage_changes_dir",
    "run_streaming_cdc_merge",
    "cdc_upsert_writer",
    "ivf_ingest_writer",
    "run_streaming_ivf_ingest",
    "run_streaming_stats_ingest",
    "stats_ingest_writer",
    "run_streaming_cdc_stats_merge",
    "cdc_stats_merge_writer",
    "read_docs_stream",
    "run_streaming_kmv",
    "kmv_state_writer",
    "run_streaming_neardup",
    "neardup_epoch_writer",
    "compact_neardup_state",
]
