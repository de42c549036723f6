"""Gap-based sessionization operator.

Classic composition: per-user lag -> new-session flag -> running sum
(prefix count) assigns a session sequence number, then a per-session
rollup. One shuffle on ``user_id``; the two window functions and the
final groupBy all reuse the same hash partitioning, so Catalyst plans
a single exchange (verified via .explain — no extra shuffle between
the windows and the aggregate).

At 100 TB scale: partition count follows spark.sql.shuffle.partitions
/ AQE; a single user's events must fit in one task's memory (true for
any realistic user; a pathological hot user is handled by AQE skew
splitting only between stages, so extreme skew would need a salted
two-level variant — not required here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign gap-based sessions and roll up one row per session."""
    w = W.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
    prev_us = F.unix_micros(F.lag(ts_col).over(w))
    cur_us = F.unix_micros(F.col(ts_col))
    new_session = F.when(
        prev_us.isNull() | ((cur_us - prev_us) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    w_run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        events.withColumn("new_session", new_session)
        .withColumn("session_seq", F.sum("new_session").over(w_run))
        .groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )
