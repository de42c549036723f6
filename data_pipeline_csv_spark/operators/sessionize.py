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


def assign_sessions(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Events with a gap-based ``session_seq`` column appended — the
    lag -> flag -> prefix-sum composition shared by the session rollup
    (:func:`sessionize`), the co-occurrence PMI query and the funnel
    (:func:`funnel_counts`). Both windows and any downstream
    session-keyed aggregate reuse one user_id exchange."""
    w = W.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
    prev_us = F.unix_micros(F.lag(ts_col).over(w))
    cur_us = F.unix_micros(F.col(ts_col))
    new_session = F.when(
        prev_us.isNull() | ((cur_us - prev_us) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    w_run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return events.withColumn("new_session", new_session).withColumn(
        "session_seq", F.sum("new_session").over(w_run)
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign gap-based sessions and roll up one row per session."""
    return (
        assign_sessions(events, gap_seconds, user_col, ts_col, order_tiebreak)
        .groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def funnel_counts(
    sessions: DataFrame,
    steps: tuple,
    key_cols: tuple = ("user_id", "session_seq"),
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """ORDERED funnel over session-assigned events — the
    MATCH_RECOGNIZE-shaped product-analytics staple ("how many
    sessions viewed, then clicked, then purchased, in that order"):
    step k is reached iff an event of its type occurs STRICTLY AFTER
    the earliest completion of step k-1 within the same session (and,
    when ``within_seconds`` is set, no more than that long after it —
    the ATTRIBUTION-WINDOW funnel: "clicked within 24 h of the first
    view"). With ``key_cols=("user_id",)`` the funnel runs user-level
    over all time instead of per session.

    Spark-first shape: no UDF, no per-session collect_list — step k's
    frontier is ``min(ts) of type_k after the step-(k-1) frontier``,
    computed as one session-keyed join + aggregate per step. All k
    joins and aggregates share the session-key partitioning (one
    exchange lineage), and each step's frontier frame shrinks
    monotonically, so the funnel costs k passes over an
    ever-smaller keyed frame — never a per-session sort or state
    machine. Earliest-completion semantics is the standard GREEDY
    funnel. Without an attribution window, greedy equals the
    existential semantics (the earliest frontier maximizes what can
    follow); with ``within_seconds`` set it does NOT (r10 ADVICE):
    with steps A,B,C and window 10, events A@0 B@5 A@50 B@55 C@60
    complete existentially via A@50->B@55->C@60, but the greedy
    frontier (A@0->B@5) finds no C within its window. Greedy is what
    most product-analytics funnels ship; the existential variant is
    :func:`funnel_counts_existential`.

    Returns ONE row: (n_sessions, n_step_1 .. n_step_k) — bigint
    session counts, exactly replayable in SQL.
    """
    keys = list(key_cols)
    total = (
        sessions.select(*keys)
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
    )
    out = total
    frontier = (
        sessions.filter(F.col(type_col) == steps[0])
        .groupBy(*keys)
        .agg(F.min(ts_col).alias("_t"))
    )
    for i, step in enumerate(steps[1:], start=2):
        out = out.crossJoin(
            F.broadcast(
                frontier.agg(
                    F.count(F.lit(1)).cast("bigint").alias(f"n_step_{i - 1}")
                )
            )
        )
        cond = F.col(ts_col) > F.col("_t")
        if within_seconds is not None:
            cond = cond & (
                F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("_t"))
                <= within_seconds * 1_000_000
            )
        frontier = (
            sessions.filter(F.col(type_col) == step)
            .join(frontier, keys)
            .filter(cond)
            .groupBy(*keys)
            .agg(F.min(ts_col).alias("_t"))
        )
    return out.crossJoin(
        F.broadcast(
            frontier.agg(
                F.count(F.lit(1)).cast("bigint").alias(f"n_step_{len(steps)}")
            )
        )
    )


def funnel_counts_existential(
    sessions: DataFrame,
    steps: tuple,
    key_cols: tuple = ("user_id", "session_seq"),
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """EXISTENTIAL ordered funnel: step k counts iff ANY chain
    e_1 < e_2 < ... < e_k of the step types exists with every
    consecutive gap inside the attribution window — the
    MATCH_RECOGNIZE-equivalent semantics :func:`funnel_counts`'s
    greedy frontier under-counts when ``within_seconds`` binds (a
    session whose earliest step-(k-1) completion is stale but a later
    one is in-window IS counted here; identical without a window).

    Spark-first DP, no UDF and no per-session state machine: the set
    of FEASIBLE step-k completion times per session is built in one
    pass per step. An event of type_k at time t is feasible iff some
    feasible step-(k-1) time lies in (t - w, t) — equivalently iff the
    LATEST feasible step-(k-1) time strictly before t is >= t - w. That
    latest-before is a running max over the UNION of the feasible
    step-(k-1) rows and the step-k events, ordered by time inside each
    session (``rangeBetween(unboundedPreceding, -1)`` keeps the
    predecessor strictly earlier, matching the greedy variant's
    ``ts > frontier``). Every pass is one session-keyed window on the
    same partitioning; feasible frames only shrink, so cost mirrors
    the greedy funnel's k join+agg passes.

    Returns ONE row: (n_sessions, n_step_1 .. n_step_k) — bigint
    counts of sessions with at least one feasible completion per step.
    """
    keys = list(key_cols)
    out = (
        sessions.select(*keys)
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
    )
    us = F.unix_micros(F.col(ts_col))
    feas = (
        sessions.filter(F.col(type_col) == steps[0])
        .select(*keys, us.alias("_t"))
        .distinct()
    )
    for i, step in enumerate(steps[1:], start=2):
        out = out.crossJoin(
            F.broadcast(
                feas.select(*keys)
                .distinct()
                .agg(F.count(F.lit(1)).cast("bigint").alias(f"n_step_{i - 1}"))
            )
        )
        u = feas.withColumn("_p", F.lit(1)).unionByName(
            sessions.filter(F.col(type_col) == step)
            .select(*keys, us.alias("_t"))
            .distinct()
            .withColumn("_p", F.lit(0))
        )
        w = (
            W.partitionBy(*keys)
            .orderBy("_t")
            .rangeBetween(W.unboundedPreceding, -1)
        )
        last_prev = F.max(F.when(F.col("_p") == 1, F.col("_t"))).over(w)
        cond = F.col("_lp").isNotNull()
        if within_seconds is not None:
            cond = cond & (
                F.col("_lp") >= F.col("_t") - within_seconds * 1_000_000
            )
        feas = (
            u.withColumn("_lp", last_prev)
            .filter((F.col("_p") == 0) & cond)
            .select(*keys, "_t")
        )
    return out.crossJoin(
        F.broadcast(
            feas.select(*keys)
            .distinct()
            .agg(F.count(F.lit(1)).cast("bigint").alias(f"n_step_{len(steps)}"))
        )
    )
