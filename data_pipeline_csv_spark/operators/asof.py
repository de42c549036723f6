"""As-of (point-in-time) join — an operator Spark has no built-in for.

Strategy: the scalable union+window composition, not a per-key loop —

1. tag both inputs and ``unionByName`` them (no join, no N×M blowup);
2. one hash shuffle on the key partitions the merged stream;
3. a running ``last(value, ignorenulls=True)`` window ordered by
   (ts, side, tiebreak) carries the most recent right-side row forward
   onto every left row;
4. filter back to left rows.

Cost at scale: exactly ONE shuffle of |L|+|R| rows and one sort within
partitions — the same lower bound a native merge-asof would pay.
Skewed keys are handled by AQE the same as any window shuffle. This
beats a range-join formulation (L ⋈ R on key AND r.ts <= l.ts plus a
max-per-row reduction), which explodes to the full match count before
reducing.

Semantics: backward as-of with inclusive bound (right.ts <= left.ts),
ties between right rows at equal ts resolved to the largest tiebreak —
matching DuckDB's ``ASOF JOIN`` after a (key, ts)-level dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with ts <= left ts.

    ``right_cols`` are right-side payload columns carried onto the left
    (each emitted as ``asof_<name>``); ``right_ts`` is always carried
    as ``asof_ts``. ``tiebreak`` (a right column) orders right rows
    sharing (on, ts) — the largest wins, making results deterministic.
    """
    passthrough = [c for c in left.columns if c not in (on, left_ts)]
    payload = list(right_cols)

    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
        *(
            [F.col(tiebreak).alias("__tie")]
            if tiebreak is not None
            else [F.lit(0).alias("__tie")]
        ),
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in passthrough],
    )

    merged = l.unionByName(r, allowMissingColumns=True)
    w = (
        W.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tie").asc_nulls_last())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )

    carried = merged.withColumn(
        "asof_ts", F.last(F.when(F.col("__side") == 0, F.col("__t")), ignorenulls=True).over(w)
    )
    for c in payload:
        carried = carried.withColumn(
            f"asof_{c}",
            F.last(F.when(F.col("__side") == 0, F.col(f"__p_{c}")), ignorenulls=True).over(w),
        )

    return carried.filter(F.col("__side") == 1).select(
        F.col("__k").alias(on),
        F.col("__t").alias(left_ts),
        *[F.col(c) for c in passthrough],
        "asof_ts",
        *[F.col(f"asof_{c}") for c in payload],
    )
