"""Incremental materialized-view maintenance: partial-aggregate state
merge.

The 100 TB primitive behind every "refresh the daily rollup" job: the
historical fact table is NEVER rescanned. The MV is stored as a small
per-key STATE table (mergeable accumulators, not finished values); a
new delta partition is aggregated alone (map-side partial agg over
just the delta), then the two state frames are unioned and folded with
one tiny shuffle over |keys| + |delta keys| rows. Finishing (avg =
sum/count, fixed-point -> double) happens only at read time.

Mergeability is the design constraint: every stored accumulator must
be a commutative monoid (int64 fixed-point SUM, COUNT, MIN, MAX —
avg is derived, never stored). Fixed-point sums (queries/canon.py)
keep the merged result bit-identical to a from-scratch recompute, so
the oracle for the incremental path IS the full-table GROUP BY.

No single operator in the reference does this; it is the composition
of its load-append + aggregate stages (reference src/load.py:5,
flows/pipeline.py:20) made restartable. Extension surface, same
pattern as Spark Structured Streaming's stateful agg — but expressed
in batch so any engine (or the driver's DuckDB oracle) can replay it.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partial_agg_state(
    df: DataFrame,
    keys: Sequence[str],
    sums: Mapping[str, tuple[Column, int]],
    mins: Mapping[str, Column] | None = None,
    maxs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Aggregate ``df`` into mergeable per-key state.

    ``sums`` maps output name -> (double term, fixed-point scale); the
    state column ``<name>__fp`` holds the exact int64 fixed-point sum.
    ``n_rows`` (COUNT(*)) is always included. MIN/MAX accumulators are
    stored under their final names (min/max are their own merge).
    """
    # runtime import: queries.canon lives under the queries package,
    # whose __init__ imports query modules that use this operator
    from ..queries.canon import fp_sum

    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for name, (term, scale) in sums.items():
        aggs.append(fp_sum(term, scale).alias(f"{name}__fp"))
    for name, col in (mins or {}).items():
        aggs.append(F.min(col).alias(name))
    for name, col in (maxs or {}).items():
        aggs.append(F.max(col).alias(name))
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_state(
    states: Sequence[DataFrame],
    keys: Sequence[str],
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
) -> DataFrame:
    """Fold state frames from :func:`partial_agg_state` into one.

    Union + one shuffle over state rows only (the base fact data behind
    each state is never touched). Associative/commutative, so states
    can arrive in any order and any grouping — per-day deltas, per-file
    micro-batches, or a stored base snapshot.
    """
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    fp_cols = [c for c in merged.columns if c.endswith("__fp")]
    aggs = [F.sum("n_rows").alias("n_rows")]
    aggs += [F.sum(c).alias(c) for c in fp_cols]
    aggs += [F.min(c).alias(c) for c in mins]
    aggs += [F.max(c).alias(c) for c in maxs]
    return merged.groupBy(*keys).agg(*aggs)


def finalize_state(
    state: DataFrame,
    sums: Mapping[str, int],
    avgs: Mapping[str, str] | None = None,
) -> DataFrame:
    """Finish state into user-facing values.

    ``sums`` maps state name -> scale: emits ``<name>`` as the
    canonical double (one int64->double cast, one divide — the
    engine-portable recipe from queries/canon.py). ``avgs`` maps
    output name -> sum name: ``sum_double / n_rows``.
    """
    out = state
    for name, scale in sums.items():
        out = out.withColumn(
            name, F.col(f"{name}__fp").cast("double") / float(scale)
        )
    for out_name, sum_name in (avgs or {}).items():
        out = out.withColumn(out_name, F.col(sum_name) / F.col("n_rows"))
    return out.drop(*[f"{n}__fp" for n in sums])
