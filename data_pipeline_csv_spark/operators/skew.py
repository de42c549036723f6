"""Skew mitigation: salted joins for hot keys.

AQE's skew-join handling (on by default in session.py) splits
oversized shuffle partitions at runtime and covers most cases. Manual
salting remains necessary where AQE can't act: stream-static joins,
full-outer joins, or when one logical key is so hot that even a split
partition overwhelms a task. The classic rewrite:

- BIG side: add ``salt = pmod(hash(<whole row key spread>), n)`` —
  deterministic, no RNG, so retried tasks produce identical output.
- SMALL side: explode each row into n copies, one per salt value.
- Join on (key, salt): the hot key's rows now spread over n tasks.

Cost: small side inflates n×. Use n ~ (hot-key rows / target rows per
task); 8-32 is typical. The result is IDENTICAL to the plain join —
registered query ``skew_salted_join_priority`` proves it against a
plain-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Join big⋈small on ``on`` with the hot-key salting rewrite.

    ``salt_source`` is the expression salted on the big side; default
    spreads by a hash of all big-side columns (deterministic across
    retries). Supported ``how``: inner / left (the small side is the
    replicated one, so right/full would need the mirror rewrite).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    src = salt_source if salt_source is not None else F.hash(*[F.col(c) for c in big.columns])
    big_s = big.withColumn("__salt", F.pmod(src, F.lit(n_salts)).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")


def diagnose_skew(df: DataFrame, keys: list[str], top: int = 10) -> DataFrame:
    """Per-key load report: the pre-flight check before sizing salts.

    Emits the ``top`` heaviest key groups with row count, share of the
    table, and skew ratio (count / mean-count-per-key). One key
    shuffle for the count; every later step runs on the derived
    per-key frame (|distinct keys| rows), and the two scalar
    aggregates (total, key count) broadcast back via crossJoin — no
    global window, no driver round-trip. The skew_ratio column is
    what the salting rewrite's ``n_salts`` should be sized from
    (``salted_join`` above).
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            F.col("n_rows").cast("bigint").alias("n_rows"),
            (F.col("n_rows").cast("double") / F.col("_total").cast("double")).alias("share"),
            (
                F.col("n_rows").cast("double")
                / (F.col("_total").cast("double") / F.col("_n_keys").cast("double"))
            ).alias("skew_ratio"),
        )
        .orderBy(F.col("n_rows").desc(), *[F.col(k).asc() for k in keys])
        .limit(top)
    )
