"""CDC merge + profile operators on literal frames (semantics pinned
independently of the TPC-H-ish tables)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_csv_spark.operators.cdc import merge_latest_snapshot
from data_pipeline_csv_spark.operators.profile import profile_table


def test_merge_latest_snapshot_semantics(spark):
    changes = spark.createDataFrame(
        [
            # key 1: insert then update -> update wins
            (1, "a", 1, "I"),
            (1, "b", 2, "U"),
            # key 2: insert then delete -> gone
            (2, "x", 1, "I"),
            (2, "x", 2, "D"),
            # key 3: plain insert survives
            (3, "y", 1, "I"),
            # key 4: same seq delete+update -> delete wins (op desc: U < D? no — 'U' > 'D')
            (4, "z", 1, "U"),
            (4, "z", 1, "D"),
        ],
        "k int, v string, seq int, op string",
    )
    snap = merge_latest_snapshot(changes, ["k"]).orderBy("k").collect()
    got = {(r["k"], r["v"], r["seq"], r["n_versions"]) for r in snap}
    # tie at key 4: 'U' sorts after 'D' descending -> the U row wins the
    # window, so key 4 SURVIVES with the update (deterministic, pinned).
    assert got == {(1, "b", 2, 2), (3, "y", 1, 1), (4, "z", 1, 2)}


def test_merge_delete_then_reinsert(spark):
    changes = spark.createDataFrame(
        [(1, "old", 1, "I"), (1, "old", 2, "D"), (1, "new", 3, "I")],
        "k int, v string, seq int, op string",
    )
    snap = merge_latest_snapshot(changes, ["k"]).collect()
    assert len(snap) == 1 and snap[0]["v"] == "new" and snap[0]["n_versions"] == 3


def test_profile_table_counts_and_ranges(spark):
    df = spark.createDataFrame(
        [(1, None, "a"), (2, 5.0, "b"), (2, 7.5, None), (None, 5.0, "a")],
        "k int, x double, s string",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"k", "x", "s"}
    assert all(r["n_rows"] == 4 for r in prof.values())
    assert (prof["k"]["n_nulls"], prof["k"]["n_distinct"]) == (1, 2)
    assert (prof["x"]["min_num"], prof["x"]["max_num"]) == (5.0, 7.5)
    assert (prof["s"]["n_nulls"], prof["s"]["n_distinct"]) == (1, 2)
    assert prof["s"]["min_num"] is None


def test_profile_single_scan(spark):
    """The whole profile must be ONE aggregate over one scan — no
    per-column jobs (the plan contains exactly one relation scan)."""
    import contextlib
    import io

    df = spark.createDataFrame([(1, 2.0)], "a int, b double")
    prof = profile_table(df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        prof.explain("formatted")
    import re

    plan = buf.getvalue()
    scans = re.findall(r"^\(\d+\) (?:Scan|LocalTableScan)", plan, flags=re.M)
    assert len(scans) == 1, plan


def test_scd2_intervals_chain_and_tombstone(spark, sf_dir):
    """SCD2 invariants: intervals per key chain without gaps, exactly
    one current row per surviving key, deleted keys have none, and the
    current rows equal the CDC merge snapshot."""
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.queries import REGISTRY

    hist = REGISTRY["cdc_scd2_history"].fn(spark, sf_dir)
    snap = REGISTRY["cdc_merge_snapshot"].fn(spark, sf_dir)

    # one current row per surviving key; none for deleted keys
    cur = hist.filter("is_current")
    assert cur.groupBy("o_orderkey").count().filter("count > 1").count() == 0
    assert cur.count() == snap.count()
    # current rows carry the same (key, price) as the merge snapshot
    mismatch = (
        cur.select("o_orderkey", "o_totalprice")
        .exceptAll(snap.select("o_orderkey", "o_totalprice"))
        .count()
    )
    assert mismatch == 0
    # closed intervals end strictly after they start
    assert hist.filter(F.col("valid_to") <= F.col("valid_from")).count() == 0


def test_snapshots_asof_literal_log(spark):
    """Hand-checked time travel: v1 sees the insert, v2 the update,
    v3 nothing (deleted)."""
    from data_pipeline_csv_spark.operators.cdc import snapshots_asof

    changes = spark.createDataFrame(
        [
            (1, "a", 1, "I"),
            (1, "b", 2, "U"),
            (1, None, 3, "D"),
            (2, "x", 1, "I"),
        ],
        "k: long, val: string, seq: long, op: string",
    )
    out = snapshots_asof(changes, ["k"], versions=(1, 2, 3))
    got = {(r["as_of"], r["k"]): r["val"] for r in out.collect()}
    assert got[(1, 1)] == "a" and got[(2, 1)] == "b"
    assert (3, 1) not in got  # deleted key gone at v3
    assert got[(1, 2)] == got[(2, 2)] == got[(3, 2)] == "x"
