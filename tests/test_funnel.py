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
