"""asof_join_backward edge semantics on tiny literal frames."""

from __future__ import annotations

import datetime as dt

from data_pipeline_csv_spark.operators.asof import asof_join_backward


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00"), "p1"),   # before any right row -> null
            (1, _ts("2024-01-01 12:00"), "p2"),   # exact tie with right at 12:00 -> inclusive
            (1, _ts("2024-01-01 15:00"), "p3"),   # latest prior right = 14:00
            (2, _ts("2024-01-01 09:00"), "p4"),   # key with no right rows at all
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 11:00"), 100),
            (1, _ts("2024-01-01 12:00"), 200),
            (1, _ts("2024-01-01 12:00"), 201),    # tie at same ts -> larger tiebreak wins
            (1, _ts("2024-01-01 14:00"), 300),
        ],
        "user_id long, ts timestamp, rid long",
    )
    out = {
        r["tag"]: (r["asof_ts"], r["asof_rid"])
        for r in asof_join_backward(
            left, right, on="user_id", right_cols=("rid",), tiebreak="rid"
        ).collect()
    }
    assert out["p1"] == (None, None)
    assert out["p2"] == (_ts("2024-01-01 12:00"), 201)
    assert out["p3"] == (_ts("2024-01-01 14:00"), 300)
    assert out["p4"] == (None, None)


def test_asof_one_shuffle_plan(spark):
    """The composition must cost one exchange (plus sort), not a join blowup."""
    import contextlib
    import io

    left = spark.range(100).selectExpr("id % 5 AS k", "timestamp_micros(CAST(id * 1000000 AS LONG)) AS ts", "id AS lv")
    right = spark.range(50).selectExpr("id % 5 AS k", "timestamp_micros(CAST(id * 2000000 AS LONG)) AS ts", "id AS rv")
    plan_buf = io.StringIO()
    with contextlib.redirect_stdout(plan_buf):
        asof_join_backward(left, right, on="k", right_cols=("rv",)).explain("formatted")
    plan = plan_buf.getvalue()
    assert "Join" not in plan  # no pairwise join anywhere
    # formatted explain prints each node twice (tree + detail); count
    # tree entries only: a single hash shuffle on the key.
    assert plan.count("Exchange (") == 1


def test_asof_matches_pandas_merge_asof(spark):
    """Property test: random (key, ts) frames must agree with pandas merge_asof."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    for trial in range(5):
        nl, nr = rng.integers(5, 80, size=2)
        lpdf = pd.DataFrame({
            "k": rng.integers(0, 4, size=nl),
            "ts": pd.to_datetime(rng.integers(0, 10_000, size=nl), unit="s"),
            "lv": np.arange(nl),
        })
        rpdf = pd.DataFrame({
            "k": rng.integers(0, 4, size=nr),
            "ts": pd.to_datetime(rng.integers(0, 10_000, size=nr), unit="s"),
            "rv": np.arange(nr).astype("int64"),
        })
        # merge_asof demands unique right (k, ts); keep max rv like the operator's tiebreak
        rdedup = rpdf.sort_values(["k", "ts", "rv"]).groupby(["k", "ts"], as_index=False).last()
        want = pd.merge_asof(
            lpdf.sort_values("ts", kind="stable"),
            rdedup.sort_values("ts", kind="stable"),
            on="ts", by="k", direction="backward", suffixes=("", "_r"),
        )
        want_map = {int(r.lv): (None if pd.isna(r.rv) else int(r.rv)) for r in want.itertuples()}

        got = asof_join_backward(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rdedup),
            on="k", right_cols=("rv",), tiebreak="rv",
        ).collect()
        got_map = {int(r["lv"]): (None if r["asof_rv"] is None else int(r["asof_rv"])) for r in got}
        assert got_map == want_map, f"trial {trial} diverged"
