"""Weighted sampling without replacement — Efraimidis–Spirakis top-k.

The training-data mixture primitive: draw k items per stratum with
probability proportional to a weight column (quality score, token
count, domain multiplier) WITHOUT replacement, in one distributed
pass. Each row gets key = ln(u) / w for a uniform u; the k largest
keys per stratum are exactly a weight-proportional sample (Efraimidis
& Spirakis 2006, "Weighted random sampling with a reservoir" — ranking
by u^(1/w) == ranking by ln(u)/w since ln is monotone).

Scale shape: the key is a pure map-side expression; the per-stratum
top-k is one window whose rank<=k filter pushes a WindowGroupLimit
below the exchange, so every task forwards at most k candidate rows
per stratum — no full sort, no global shuffle of the corpus (same
plan family as topk_expensive_orders, asserted in tests/test_plans.py).

Determinism (the oracle contract): u comes from a 32-bit
multiplicative mixer on the id column — plain BIGINT multiply/mod
arithmetic that never exceeds int64 (max intermediate ~8.6e18), so
Spark SQL and DuckDB evaluate it identically; ln() and the divide are
single IEEE-double libm ops on identical inputs. Rank flips would need
two keys within 1 ulp — distinct ids differ by >= 2^-32 in u, so the
sample is reproducible across engines, partitionings and runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# 32-bit Knuth multiplicative hash + one remix round. Constants chosen
# so every intermediate stays under int64 max for any 32-bit-ish id
# domain: id * 2654435761 <= ~1e10 * 2.7e9 is the only caller-bounded
# product (ids must stay below ~3.4e9; parquet testdata ids are dense
# small ints), then values are reduced mod 2^32 before the second
# multiply (4.29e9 * 2.0e9 = 8.6e18 < 9.22e18).
_M32 = 4294967296  # 2^32
_C1 = 2654435761  # Knuth's 2^32 / phi
_C2 = 2654435769  # golden-ratio increment
_C3 = 2000000011  # odd multiplier < 2^31 (keeps the remix in int64)


def uniform_from_id(id_col: Column) -> Column:
    """Deterministic u in (0, 1) from an integer id — identical SQL
    arithmetic in Spark and DuckDB (no engine RNG, no xxhash).
    Domain: ids must be integers in [0, ~3.4e9]; beyond that the first
    product exceeds int64 (see module constants) and the result is
    silently wrong."""
    h1 = (id_col.cast("bigint") * F.lit(_C1)) % F.lit(_M32)
    h2 = ((h1 + F.lit(_C2)) % F.lit(_M32) * F.lit(_C3)) % F.lit(_M32)
    return (h2 + F.lit(0.5)) / F.lit(float(_M32))


def uniform_from_id_sql(id_expr: str) -> str:
    """The DuckDB-side rendering of :func:`uniform_from_id`."""
    return (
        f"((((({id_expr} * {_C1}) % {_M32}) + {_C2}) % {_M32}) * {_C3} % {_M32}"
        f" + 0.5) / {float(_M32)}"
    )


def split_assign(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in the
    split whose cumulative weight interval contains its hash-uniform
    u — the standard production split (stable across re-runs, shuffles
    and corpus growth: a row's split depends only on its own id, never
    on partitioning or row order). Pure map-side expression, no
    shuffle, no RNG state."""
    u = uniform_from_id(F.col(id_col))
    total = sum(weights.values())
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def split_assign_sql_case(weights: dict[str, float], id_expr: str) -> str:
    """DuckDB rendering of :func:`split_assign`'s CASE expression."""
    u = uniform_from_id_sql(id_expr)
    total = sum(weights.values())
    names = list(weights)
    parts, acc = [], 0.0
    for name in names[:-1]:
        acc += weights[name] / total
        parts.append(f"WHEN ({u}) < {acc!r} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def shuffle_into_shards(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic global corpus shuffle + sharding — the
    training-order step every pre-training pipeline runs before
    writing shards: each row gets a hash-uniform shuffle key from its
    OWN id (:func:`uniform_from_id` — stable across re-runs, input
    partitioning, and corpus growth), lands in shard
    floor(u * n_shards), and takes its within-shard position from the
    (u, id) order. Returns (id, shard, pos) plus any ``carry`` payload
    columns passed through unchanged (so the shard WRITER can ride the
    same single shuffle instead of joining the assignment back to the
    payload — see :func:`write_training_shards`).

    Scale shape: the key and shard are a pure map-side projection; the
    only wide stage is the per-shard position window — ONE sorting
    task per output shard, which is exactly the writer-per-shard
    topology a sharded training-data write has anyway (size n_shards
    so a shard's rows fit a task; at 100 TB that means thousands of
    shards, not 16). No global sort, no driver-side state, and the
    whole shuffle is replayable by any engine from the id arithmetic
    alone (no engine RNG) — the DuckDB oracle recomputes every
    position bit-for-bit.
    """
    u = uniform_from_id(F.col(id_col))
    shard = F.least(
        F.floor(u * F.lit(n_shards)), F.lit(n_shards - 1)
    ).cast("int")
    keyed = df.select(
        F.col(id_col), u.alias("_u"), shard.alias("shard"), *carry
    )
    w = W.partitionBy("shard").orderBy(F.col("_u").asc(), F.col(id_col).asc())
    return keyed.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
        *carry,
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    payload_cols: tuple[str, ...] = ("text",),
) -> None:
    """MATERIALIZE the deterministic corpus shuffle as training shard
    FILES — the last meter of the pre-training pipeline that
    :func:`shuffle_into_shards` computes the (doc, shard, pos)
    assignment for: one Hive directory per shard
    (``out_dir/shard=N/``), exactly one parquet file per shard, rows
    physically ordered by ``pos`` inside the file. A trainer streams
    ``shard=N`` front to back and sees the global shuffle order.

    Physical plan (one wide stage, the writer-per-shard topology):
    the assignment window already hash-partitions on ``shard`` — every
    shard's rows land wholly in one task — so the write needs NO
    further exchange, only a task-local sort on (shard, pos) to pin
    file order (the window's (u, id) output order is the same order,
    but pos is row_number over it and Catalyst cannot prove the
    equality, so the explicit sort documents and guarantees it; it is
    a cheap in-task re-sort of already-ordered runs). ``partitionBy``
    then splits a task holding several shard keys into one file per
    directory. At 100 TB: thousands of shards, each sized to a task
    (~1 GB), same topology — the shuffle IS the write.

    Verified by the read-back oracle in queries/pipeline.py
    corpus_write_shards (physical file order reconstructed from
    ``_metadata.row_index`` must match the arithmetic shuffle
    bit-for-bit) and the one-file-per-shard + order assertions in
    tests/test_scale_ops.py.
    """
    assigned = shuffle_into_shards(
        df, n_shards=n_shards, id_col=id_col, carry=tuple(payload_cols)
    )
    (
        assigned.sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


def pack_chunks_global(
    chunks: DataFrame,
    seq_len: int = 64,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tok_col: str = "n_tokens",
) -> DataFrame:
    """GLOBAL concat-and-chunk sequence packing: lay every chunk of the
    whole corpus on one deterministic token tape (order = the RNG-free
    doc shuffle key, then doc, then chunk index) and cut it into
    ``seq_len``-token packs — the GPT-style pretraining layout that
    wastes no per-doc tail, vs per-doc packing
    (queries/pipeline.corpus_pack_sequences) which pads at every doc
    boundary. Emits (id, chunk idx, n_tokens, pack_id).

    The global running token sum is a DISTRIBUTED TWO-PASS PREFIX SUM,
    not a global-order window (which would sort the corpus in one
    task): docs hash into ``n_buckets`` contiguous key ranges of the
    tape (the shuffle key is uniform, so buckets are balanced), each
    bucket computes its LOCAL running sum — one task per bucket, the
    writer-per-bucket topology a sharded write has anyway — and the
    per-bucket totals (n_buckets rows) turn into bucket start offsets
    with one tiny window. global_prefix = bucket offset + local
    running sum, exactly; pack_id = floor(start / seq_len). All
    integer arithmetic, so the DuckDB oracle can replay the same
    assignment with a plain global-order window and match bit-for-bit
    (the bucket decomposition is invisible in the result).
    """
    u = uniform_from_id(F.col(id_col))
    bucket = F.least(F.floor(u * F.lit(n_buckets)), F.lit(n_buckets - 1)).cast("int")
    keyed = chunks.select(
        F.col(id_col), F.col(idx_col), F.col(tok_col),
        u.alias("_u"), bucket.alias("_b"),
    )
    w_local = W.partitionBy("_b").orderBy(
        F.col("_u").asc(), F.col(id_col).asc(), F.col(idx_col).asc()
    ).rowsBetween(W.unboundedPreceding, 0)
    local = keyed.withColumn("_cum", F.sum(tok_col).over(w_local))
    totals = keyed.groupBy("_b").agg(F.sum(tok_col).alias("_tot"))
    w_off = W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_b")
        .select(
            id_col,
            idx_col,
            tok_col,
            F.floor(
                (F.col("_off") + F.col("_cum") - F.col(tok_col))
                / F.lit(float(seq_len))
            ).cast("bigint").alias("pack_id"),
        )
    )


DSIR_SCALE = 1e6  # fixed-point nats for bucket log-ratios (see dsir_select)


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int = 50,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023, arXiv:2302.03169): pick the ``k`` raw-corpus docs
    whose hashed-n-gram distribution looks most like a small TARGET
    domain, by importance weight under bag-of-hashed-ngrams bigram
    models. The standard pretraining-data selection pass: fit
    p_target and p_raw over ``n_buckets`` hashed unigram+bigram
    buckets (add-one smoothing), score each raw doc with
    log w = sum over its ngrams of log(p_target[b]/p_raw[b]), then
    Gumbel-top-k (log w - ln(-ln u), u from the RNG-free id mixer) —
    a without-replacement sample proportional to w.

    Cross-engine exactness: bucket ids come from the first 8 hex
    chars of md5(ngram) (both engines agree on md5); all counts are
    exact integers; each bucket's log-ratio is floored to
    ``DSIR_SCALE`` fixed-point nats — single libm ops on identical
    integer inputs, with the 1e-6-nat grid making a cross-engine ulp
    flip of the floor astronomically unlikely — so per-doc weights
    are exact int64 sums (order-invariant) and the DuckDB oracle
    replays every weight bit-for-bit. The returned columns
    (id, weight_fp, rank) are all integers.

    Scale shape: two feature passes (map-side explode + partial-agg
    to bucket counts, n_buckets rows total), one bucket-keyed join of
    per-doc bucket counts against the n_buckets-row score table (AQE
    broadcasts it), and a global top-k that plans as
    TakeOrderedAndProject (per-partition k + driver merge of k per
    task) — no global sort, nothing corpus-quadratic. The two scalar
    totals ride 1-row cross joins, not driver collects.
    """
    from ..functions.text_funcs import tokens, word_shingles

    def feats(df: DataFrame) -> DataFrame:
        toks = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks"))
        bigrams = F.when(
            F.size("_toks") >= 2, word_shingles(F.col("_toks"), 2)
        ).otherwise(F.array().cast("array<string>"))
        return toks.select(
            "doc_id",
            F.explode(
                F.concat(word_shingles(F.col("_toks"), 1), bigrams)
            ).alias("_ng"),
        )

    bucket = (
        F.conv(F.substring(F.md5(F.encode(F.col("_ng"), "utf-8")), 1, 8), 16, 10)
        .cast("long") % n_buckets
    )
    t_b = feats(target).select(bucket.alias("b"))
    r_f = feats(raw).select("doc_id", bucket.alias("b"))
    # One (doc_id, b) pre-aggregation feeds BOTH the raw bucket model
    # and the per-doc scoring: the two consumers share the identical
    # exchange subtree, so ReuseExchange runs the tokenize + explode +
    # md5 feature pass over the raw corpus ONCE per job (it used to
    # run three times: r_cnt, nr, per_doc — each a different first
    # exchange over the same map-side pipeline). The corpus totals
    # are exact integer sums of the bucket counts (sum of group
    # counts == total count), so nr/nt stop paying a full feature
    # pass each — identical values, 5 corpus passes -> 2.
    r_pre = r_f.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    t_cnt = t_b.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    r_cnt = r_pre.groupBy("b").agg(F.sum("c").alias("cr"))
    nt = t_cnt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
    nr = r_cnt.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("nr"))
    scores = (
        r_cnt.join(t_cnt, "b", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select(
            "b",
            F.floor(
                (
                    F.log((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).cast("double"))
                    - F.log((F.col("nt") + F.lit(n_buckets)).cast("double"))
                    - F.log((F.col("cr") + F.lit(1)).cast("double"))
                    + F.log((F.col("nr") + F.lit(n_buckets)).cast("double"))
                )
                * F.lit(DSIR_SCALE)
            ).cast("bigint").alias("r_fp"),
        )
    )
    per_doc = (
        r_pre.join(scores, "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("r_fp")).alias("w_fp"))
    )
    docs = (
        raw.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select("doc_id", F.coalesce("w_fp", F.lit(0)).alias("weight_fp"))
    )
    u = uniform_from_id(F.col("doc_id"))
    key = F.col("weight_fp").cast("double") / F.lit(DSIR_SCALE) - F.log(-F.log(u))
    sel = (
        docs.select("doc_id", "weight_fp", key.alias("_key"))
        .orderBy(F.col("_key").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    w = W.orderBy(F.col("_key").desc(), F.col("doc_id").asc())
    return (
        sel.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("doc_id", "weight_fp", "rank")
    )


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    stratum_col: str | None = None,
) -> DataFrame:
    """k-item weight-proportional sample without replacement (per
    stratum when ``stratum_col`` is given). Returns the stratum (if
    any), id, weight and 1-based rank.

    API contract (not just implementation detail):

    - Weights are EFFECTIVELY ``max(weight, 1.0)``: every weight below
      1 — including zero and negative — is clamped UP to 1, so
      "proportional to weight" holds only on the >= 1 domain (the
      intended inputs are counts/scores like token counts). Rows with
      zero weight therefore remain sampleable at weight 1; filter them
      out beforehand if they must be excluded. The clamp is part of
      the cross-engine oracle contract (the DuckDB replay computes the
      same ``greatest``), so it cannot silently change.
    - ``id_col`` must be integers in [0, ~3.4e9] (see the module
      mixer-constant comment): larger ids overflow the int64
      intermediate product and negative ids produce ln() of a
      non-(0,1) value — both yield NaN/garbage keys with no error.
      Dense non-negative ids (the parquet testdata shape) are safe.
    """
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    key = F.ln(uniform_from_id(F.col(id_col))) / w
    parts = [stratum_col] if stratum_col else []
    win = W.partitionBy(*parts).orderBy(F.col("_key").desc(), F.col(id_col).asc())
    out_cols = ([stratum_col] if stratum_col else []) + [
        id_col,
        F.col("_w").cast("bigint").alias("weight"),
        F.col("rank"),
    ]
    return (
        df.select(*(parts or []), id_col, w.alias("_w"), key.alias("_key"))
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(*out_cols)
    )
