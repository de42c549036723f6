"""Streaming pipelines: the batch event queries as unbounded plans.

Each function takes an (unbounded) events DataFrame — from
``read_events_stream`` or ``rate_events_stream`` — and returns the
transformed streaming DataFrame; the caller picks the sink. All
aggregations are watermarked so the state store stays bounded.

Batch twins (same semantics, DuckDB-checked): queries/events.py.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h window per event_type: count + exact decimal sum.

    Streaming twin of ``events_hourly_rollup``. COUNT(DISTINCT) is not
    available under incremental execution, so the user-count becomes
    ``approx_count_distinct`` (HLL mergeable state) — the documented
    divergence from the batch twin.
    """
    # sum_value uses the canonical fixed-point recipe (queries/canon.py):
    # int64 partial sums are mergeable streaming state, and the final
    # int->double conversion is bit-stable across engines.
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
            F.sum(F.floor(F.col("value") * 1_000_000).cast("bigint")).alias("_sum_fp"),
        )
        .select(
            F.col("bucket.start").alias("bucket"),
            "event_type",
            "n_events",
            "n_users_approx",
            (F.col("_sum_fp").cast("double") / 1_000_000.0).alias("sum_value"),
        )
    )


def sliding_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event counts: each event lands in window/slide buckets."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_window_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session aggregation via the native session_window node.

    Streaming twin of ``events_sessionize``: a session closes when a
    user is idle for ``gap``; merging of overlapping candidate sessions
    happens in the state store, emission when the watermark passes the
    session end.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def enriched_rollup_stream(
    events: DataFrame, dim: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-static join + keyed aggregation (the enrichment pattern).

    Each micro-batch joins the unbounded events against the STATIC
    dimension — no state is kept for the join side; Spark re-resolves
    the static relation per batch, and the broadcast hint keeps the
    join shuffle-free at any stream rate (the dim is the small side by
    construction). Downstream, a keyed aggregation maintains exact
    fixed-point sums per (segment, event_type).
    """
    joined = events.withWatermark("ts", watermark).join(
        F.broadcast(dim.select("c_custkey", "c_mktsegment")),
        events["user_id"] == F.col("c_custkey"),
    )
    return (
        joined.groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1_000_000).cast("bigint")).alias("_sum_fp"),
        )
        .select(
            "c_mktsegment",
            "event_type",
            "n_events",
            (F.col("_sum_fp").cast("double") / 1_000_000.0).alias("sum_value"),
        )
    )


def attribution_join_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: purchases ← clicks within ``horizon``.

    Both inputs are unbounded; the equi-key (user) plus the two-sided
    time bound make the join state evictable. Spark derives, from the
    watermarks and the interval condition, how long each side's rows
    must be buffered (a click can only match purchases up to
    ``horizon`` later, a purchase only clicks up to ``horizon``
    earlier), so the state store holds a sliding band of each stream
    instead of its full history — the property that lets this run
    forever on a 1000-executor cluster. The join itself is the same
    hash shuffle on user as the batch twin; no broadcast (both sides
    unbounded).
    """
    c = clicks.select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("purchase_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    return p.join(
        c,
        F.expr(
            f"""
            purchase_user = click_user
            AND click_ts <= purchase_ts
            AND click_ts >= purchase_ts - INTERVAL '{horizon}'
            """
        ),
        "inner",
    )


def stream_dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Keep the first arrival per event_id, state bounded by watermark.

    ``dropDuplicatesWithinWatermark`` keeps a key's first-seen row and
    expires its state once the watermark passes — the streaming
    equivalent of exact dedup that never grows unbounded state.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


_RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("last_ts", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_STATE_SCHEMA = "n LONG, total DOUBLE"


def _make_update_user_totals(state_ttl_ms: int):
    def _update_user_totals(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        """Per-user running (count, sum) accumulator with idle timeout.

        State is one (n, total) pair per user — O(distinct users)
        across the cluster, partitioned by the groupBy hash. The
        timeout closes out users idle past watermark+ttl so state
        can't leak on an unbounded key space.
        """
        if state.hasTimedOut:
            state.remove()
            return
        (n, total) = state.get if state.exists else (0, 0.0)
        last_ts = None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            ts_max = pdf["ts"].max()
            last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
        state.update((n, total))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + state_ttl_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "last_ts": [last_ts],
                "n_events": [n],
                "total_value": [total],
            }
        )

    return _update_user_totals


def user_running_totals_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    state_ttl_ms: int = 30 * 24 * 3_600_000,
) -> DataFrame:
    """Custom stateful operator: per-user running totals via applyInPandasWithState.

    ``state_ttl_ms`` is how far past the watermark a user may stay idle
    before their accumulator is evicted; size it to the business
    definition of "inactive user", not to memory — state is hash
    partitioned across the cluster and the store spills via RocksDB.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_user_totals(state_ttl_ms),
            outputStructType=_RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
