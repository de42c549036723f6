"""Ordered-funnel operator: greedy-earliest semantics vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_csv_spark.operators.sessionize import assign_sessions, funnel_counts
from data_pipeline_csv_spark.sources.tables import load_table


def _replay(rows, steps, within=None):
    """Driver-side greedy funnel replay over (key -> [(ts, type)])."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, ts, et in rows:
        by_key[k].append((ts, et))
    counts = [0] * len(steps)
    for evs in by_key.values():
        evs.sort()
        frontier = None
        for i, step in enumerate(steps):
            nxt = None
            for ts, et in evs:
                if et != step:
                    continue
                if i == 0 or (
                    ts > frontier
                    and (within is None or (ts - frontier).total_seconds() <= within)
                ):
                    nxt = ts
                    break
            if nxt is None:
                break
            frontier = nxt
            counts[i] += 1
    return counts


def test_funnel_user_level_matches_bruteforce(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    steps = ("view", "click", "purchase")
    got = funnel_counts(
        ev, steps=steps, key_cols=("user_id",), within_seconds=86400
    ).collect()[0]
    rows = [(r["user_id"], r["ts"], r["event_type"]) for r in ev.collect()]
    want = _replay(rows, steps, within=86400)
    assert [got["n_step_1"], got["n_step_2"], got["n_step_3"]] == want
    assert got["n_sessions"] == len({k for k, _, _ in rows})
    # the funnel is a real gradient, not degenerate
    assert got["n_step_1"] >= got["n_step_2"] >= got["n_step_3"]
    assert got["n_step_3"] > 0


def test_funnel_session_level_matches_bruteforce(spark, sf_dir):
    """The per-session variant (no attribution window) against the
    same replay keyed by (user, session)."""
    ev = assign_sessions(
        load_table(spark, sf_dir, "events"), gap_seconds=1800
    ).select("user_id", "session_seq", "ts", "event_type")
    steps = ("view", "click")
    got = funnel_counts(ev, steps=steps).collect()[0]
    rows = [
        ((r["user_id"], r["session_seq"]), r["ts"], r["event_type"])
        for r in ev.collect()
    ]
    want = _replay(rows, steps)
    assert [got["n_step_1"], got["n_step_2"]] == want


def _replay_existential(rows, steps, within=None):
    """Driver-side EXISTENTIAL funnel replay: per session, the set of
    feasible completion times per step, by definition (any in-window
    strict predecessor)."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, ts, et in rows:
        by_key[k].append((ts, et))
    counts = [0] * len(steps)
    for evs in by_key.values():
        evs.sort()
        feas = [ts for ts, et in evs if et == steps[0]]
        if feas:
            counts[0] += 1
        for i, step in enumerate(steps[1:], start=1):
            feas = [
                ts
                for ts, et in evs
                if et == step
                and any(
                    p < ts
                    and (within is None or (ts - p).total_seconds() <= within)
                    for p in feas
                )
            ]
            if not feas:
                break
            counts[i] += 1
    return counts


def test_existential_catches_what_greedy_misses(spark):
    """The r10 ADVICE counterexample: steps A,B,C, window 10 s, events
    A@0 B@5 A@50 B@55 C@60 — existentially complete via A@50->B@55->
    C@60, but the greedy-earliest frontier (A@0->B@5) finds no C in
    window. Also: without a window the two variants agree."""
    from datetime import datetime, timedelta

    from data_pipeline_csv_spark.operators.sessionize import (
        funnel_counts_existential,
    )

    t0 = datetime(2020, 1, 1)
    rows = [
        (1, t0 + timedelta(seconds=s), t)
        for s, t in [(0, "A"), (5, "B"), (50, "A"), (55, "B"), (60, "C")]
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    kw = dict(steps=("A", "B", "C"), key_cols=("user_id",))
    g = funnel_counts(df, within_seconds=10, **kw).collect()[0]
    e = funnel_counts_existential(df, within_seconds=10, **kw).collect()[0]
    assert (g["n_step_1"], g["n_step_2"], g["n_step_3"]) == (1, 1, 0)
    assert (e["n_step_1"], e["n_step_2"], e["n_step_3"]) == (1, 1, 1)
    # no window -> greedy == existential (the docstring's true claim)
    g0 = funnel_counts(df, **kw).collect()[0]
    e0 = funnel_counts_existential(df, **kw).collect()[0]
    assert g0.asDict() == e0.asDict()


def test_funnel_existential_matches_bruteforce(spark, sf_dir):
    from data_pipeline_csv_spark.operators.sessionize import (
        funnel_counts_existential,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    steps = ("view", "click", "purchase")
    rows = [(r["user_id"], r["ts"], r["event_type"]) for r in ev.collect()]
    for within in (86400, 3600, None):
        got = funnel_counts_existential(
            ev, steps=steps, key_cols=("user_id",), within_seconds=within
        ).collect()[0]
        want = _replay_existential(rows, steps, within=within)
        assert [got["n_step_1"], got["n_step_2"], got["n_step_3"]] == want, within


def test_audio_incremental_equals_oneshot(spark, sf_dir):
    """Audio probe == one-shot pairing restricted to batch pairs."""
    from data_pipeline_csv_spark.multimodal import (
        audio_fingerprint,
        synthetic_audio_with_variants,
    )
    from data_pipeline_csv_spark.operators.dedup import (
        hamming_neardup_pairs,
        hamming_probe_pairs,
    )

    fp = audio_fingerprint(synthetic_audio_with_variants(spark, sf_dir)).persist()
    for split in (F.col("asset_id") >= 10_000_000, F.col("asset_id") % 3 == 0):
        new = fp.filter(split)
        old = fp.filter(~split)
        new_ids = {r["asset_id"] for r in new.select("asset_id").collect()}
        got = {
            (r["d1"], r["d2"], r["hamming"])
            for r in hamming_probe_pairs(
                old, new, max_hamming=7, hash_col="afp"
            ).collect()
        }
        want = {
            (r["d1"], r["d2"], r["hamming"])
            for r in hamming_neardup_pairs(fp, max_hamming=7, hash_col="afp").collect()
            if r["d1"] in new_ids or r["d2"] in new_ids
        }
        assert got == want
    fp.unpersist()
