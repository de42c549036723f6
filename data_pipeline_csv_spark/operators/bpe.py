"""BPE merge training over the corpus vocabulary (Sennrich, Haddow &
Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units", ACL — the classic subword-tokenizer trainer).

Spark-first shape: classic BPE never touches the corpus after one
word-frequency pass — training runs on the WORD TABLE (vocab-sized:
millions of rows at 100 TB, not trillions), so each merge round is a
small vocab-keyed job and the driver holds exactly ONE row per round
(the argmax pair), the same O(rounds) driver-traffic contract as the
k-means trainer. Per round: adjacent-pair counts weighted by word
frequency (map-side explode + partial agg), a deterministic argmax
(ties by pair lexicographically), and a segmentation rewrite applied
as a single fold expression inside whole-stage codegen — the fold is
the canonical greedy left-to-right merge pass (a just-merged symbol
cannot re-merge in the same pass), reproduced verbatim by DuckDB's
list_reduce so the whole ITERATIVE trainer sits under a full value
oracle (queries/text.py text_bpe_merges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_funcs import tokens


def _merge_pass(a: str, b: str):
    """Column expr: one greedy left-to-right merge pass of pair (a, b)
    over a space-separated segmentation column ``seg``.

    Fold with a string accumulator: merge iff the accumulator's LAST
    SYMBOL is exactly ``a`` (boundary-aware: equal, or ends with
    ' '+a) and the next symbol is ``b`` — appending ``b`` without a
    separator IS the merge. A merged symbol ends the accumulator as
    a+b, so it can never left-match ``a`` again within the pass:
    exactly canonical BPE's non-overlapping leftmost-first behavior
    (a run of 2k identical symbols becomes k merged pairs).
    """
    sy = F.split("seg", " ")
    return F.aggregate(
        F.slice(sy, 2, F.size(sy) - 1),
        F.element_at(sy, 1),
        lambda acc, x: F.when(
            (x == F.lit(b)) & ((acc == F.lit(a)) | acc.endswith(F.lit(" " + a))),
            F.concat(acc, F.lit(b)),
        ).otherwise(F.concat(acc, F.lit(" "), x)),
    )


def bpe_train_merges(
    spark,
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train ``n_merges`` BPE merges on the corpus; returns the merge
    table (rank, left, right, merged, freq) — ``freq`` is the merged
    pair's corpus-weighted count at the time of its selection.

    Lineage per round is truncated with an eager localCheckpoint of
    the (vocab-sized) segmentation table, so round N's plan never
    re-derives rounds 1..N-1 — same per-round materialization the
    iterative graph/components operators use.
    """
    words = (
        docs.select(tokens(text_col).alias("_toks"))
        .select(F.explode("_toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    cur = words.select(
        F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("seg"), "freq"
    ).localCheckpoint()
    merges = []
    for r in range(1, n_merges + 1):
        sy = F.split("seg", " ")
        pairs = (
            cur.select(
                F.posexplode(F.slice(sy, 1, F.size(sy) - 1)).alias("_i", "left"),
                sy.alias("_s"),
                "freq",
            )
            .select(
                "left",
                F.element_at("_s", F.col("_i") + 2).alias("right"),
                "freq",
            )
            .groupBy("left", "right")
            .agg(F.sum("freq").alias("pfreq"))
            .orderBy(F.col("pfreq").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        a, b, pf = pairs[0]["left"], pairs[0]["right"], pairs[0]["pfreq"]
        merges.append((r, a, b, a + b, int(pf)))
        cur = cur.select(_merge_pass(a, b).alias("seg"), "freq").localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, freq bigint"
    )
