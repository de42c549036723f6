"""Change-data-capture merge: a keyed change log (insert/update/delete
rows with a monotone sequence) folded into its latest snapshot — the
batch core of Delta/Iceberg's MERGE INTO, expressed as one window.

Scale shape: a single hash shuffle on the merge key routes every
version of a key to one task; ``row_number`` picks the winner and a
same-window ``count`` rides the identical partitioning (no second
exchange — tests/test_plans.py pins one-Exchange plans elsewhere, same
idea). Skewed hot keys are bounded by version count, not corpus size,
so the window state stays small. At 100 TB the change log is
partitioned by ingest date and the merge runs per partition; the
operator itself is unchanged.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def merge_latest_snapshot(
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Latest surviving row per key from an I/U/D change log.

    The highest ``seq_col`` per key wins (ties broken by ``op_col``
    descending, making delete-vs-update collisions deterministic);
    keys whose winner is a delete vanish from the snapshot. Adds
    ``n_versions``, the change-log depth per key.
    """
    w = W.partitionBy(*keys).orderBy(F.col(seq_col).desc(), F.col(op_col).desc())
    wc = W.partitionBy(*keys)
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_versions", F.count(F.lit(1)).over(wc))
        .filter(F.col("_rn") == 1)
        .filter(F.col(op_col) != delete_op)
        .drop("_rn")
    )
