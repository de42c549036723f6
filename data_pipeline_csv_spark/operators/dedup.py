"""Deduplication operators over a document corpus.

Seven families, all shuffle-aware compositions of built-in DataFrame
ops (Python only in the Bloom bit test, Arrow-batched):

- exact:      hash-groupBy on (normalized) content, keep min id.
- n-gram Jaccard: exact similarity join — explode distinct shingles,
              self-join on shingle (only pairs sharing >=1 shingle can
              have J>0), count shared, filter by threshold.
- containment: the subsumption/quotation variant (|A∩B|/min), with
              exact, r=1-banded LSH, and LSH-Ensemble size-stratified
              candidate stages (the last for extreme size ratios:
              a paragraph quoted inside a book).
- MinHash+LSH: k minhashes per doc -> band buckets -> candidate pairs
              from bucket self-join -> exact-Jaccard verification.
              At scale this replaces the quadratic shingle self-join
              with bucket-local joins; verification touches only
              candidates (and carries NO forced broadcast — the
              candidate doc set grows with the corpus).
- SimHash:    64-bit sign fingerprint of hashed shingles; near-dups
              differ in few bits (hamming distance banding).
- duplicated spans: corpus-wide exact-substring signals below any
              pairwise threshold — per-doc duplicated n-gram counts
              (dup_span_profile) and merged-interval token coverage
              (dup_span_coverage).
- decontamination: training docs overlapping a fixed eval set —
              broadcast eval shingles (one benchmark) or a flat-size
              Bloom bitset prefilter (many benchmarks), exact overlap
              verification either way.

Scale notes (100 TB): the shingle explode is map-side only; the LSH
band join shuffles on (band_id, band_hash) whose cardinality grows
with the corpus, so buckets stay small unless the corpus is
pathologically self-similar; a bucket-size cap guards the quadratic
pair expansion. MinHash values use xxhash64 (JVM codegen).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text_funcs import normalize_text, token_count, tokens, word_shingles


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct normalized text: (canonical id, n_copies)."""
    return (
        df.select(F.col(id_col), normalize_text(text_col).alias("_norm"))
        .groupBy("_norm")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def shingle_sets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct (id, shingle) pairs of word n-grams.

    The token array MUST be materialized in its own projection before
    shingling: ``word_shingles`` accesses the array 3n times per
    shingle, and passing ``tokens(text)`` inline would re-run the full
    regex normalization on every access (measured 45x slower at sf0.1).
    A column reference makes each access an O(1) array lookup.
    """
    toks = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks"))
    return (
        toks.select("doc_id", F.explode(word_shingles(F.col("_toks"), n)).alias("shingle"))
        .distinct()
    )


def with_shingle_set(
    df: DataFrame, text_col: str = "text", n: int = 3, out_col: str = "shset"
) -> DataFrame:
    """``df`` plus a per-doc DISTINCT shingle ARRAY column.

    The stored-state form of :func:`shingle_sets` (array per doc, not
    exploded rows): exactly ``array_distinct(word_shingles(tokens(text)))``
    — the same expression :func:`_verify_candidates` evaluates — so a
    verification that reads a persisted ``out_col`` instead of
    re-tokenizing is bit-identical by construction. Two projections for
    the same reason as :func:`shingle_sets` (word_shingles reads the
    token array 3n times; CollapseProject keeps the split because the
    reference is non-cheap and multiply used).
    """
    toks = df.withColumn("_toks", tokens(text_col))
    return toks.withColumn(
        out_col, F.array_distinct(word_shingles(F.col("_toks"), n))
    ).drop("_toks")


def _jaccard_for_pairs(shingles: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate (d1, d2) pairs given (doc_id, shingle)."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    shared = (
        pairs.join(a, pairs.d1 == F.col("a.doc_id"))
        .join(b, (pairs.d2 == F.col("b.doc_id")) & (F.col("a.shingle") == F.col("b.shingle")))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(sizes.alias("s1"), shared.d1 == F.col("s1.doc_id"))
        .join(sizes.alias("s2"), shared.d2 == F.col("s2.doc_id"))
        .select(
            "d1",
            "d2",
            (
                F.col("shared").cast("double")
                / (F.col("s1.n_sh") + F.col("s2.n_sh") - F.col("shared"))
            ).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact near-dup pairs by word-n-gram Jaccard >= threshold.

    Any pair with J > 0 shares a shingle, so the shingle self-join is
    exact (no candidates missed). Quadratic in bucket size per
    shingle — use :func:`minhash_lsh_pairs` beyond modest corpora.
    """
    sh = shingle_sets(df, text_col, id_col, n)
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    return (
        pairs.join(sizes.alias("s1"), pairs.d1 == F.col("s1.doc_id"))
        .join(sizes.alias("s2"), pairs.d2 == F.col("s2.doc_id"))
        .select(
            "d1",
            "d2",
            (
                F.col("shared").cast("double")
                / (F.col("s1.n_sh") + F.col("s2.n_sh") - F.col("shared"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Pairs where the SMALLER document's shingles are >= threshold
    contained in the other: containment C = |A∩B| / min(|A|,|B|).

    The subsumption/quotation detector Jaccard misses: a short doc
    fully quoted inside a long one has tiny Jaccard (union is the big
    doc) but containment ~1 — exactly the boilerplate-inclusion and
    doc-embedding case a pretraining dedup pass must catch. Same
    exact shingle self-join as :func:`ngram_jaccard_pairs` (any pair
    with C > 0 shares a shingle, so no candidates are missed); at
    corpus scale, swap the candidate stage for
    :func:`containment_lsh_pairs`, which replaces the quadratic
    self-join with one-row-per-minhash band buckets.
    """
    sh = shingle_sets(df, text_col, id_col, n)
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    return (
        pairs.join(sizes.alias("s1"), pairs.d1 == F.col("s1.doc_id"))
        .join(sizes.alias("s2"), pairs.d2 == F.col("s2.doc_id"))
        .select(
            "d1",
            "d2",
            (
                F.col("shared").cast("double")
                / F.least(F.col("s1.n_sh"), F.col("s2.n_sh"))
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def containment_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    num_hashes: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_bucket: int = 1000,
    drop_observation=None,
) -> DataFrame:
    """Containment pairs (C = |A∩B| / min >= threshold) with an LSH
    candidate stage — the corpus-scale path :func:`containment_pairs`'
    quadratic shingle self-join cannot walk.

    Banding is ONE ROW PER BAND (r=1, b=num_hashes): a pair collides
    in a band with probability J per band, so the candidate-miss
    probability is (1-J)^b even when the JACCARD of a high-containment
    pair is small. For C >= 0.9 and size ratio rho = max/min set size,
    J = C / (1 + rho - C); with b=32 the miss probability is ~1e-24 at
    rho=1, ~2e-5 at rho=3, ~5% at rho=10 — so the envelope covers
    quotation/subsumption up to an order-of-magnitude size gap.
    Extreme-ratio containment search (a paragraph inside a book) needs
    LSH-Ensemble-style size-stratified banding — the same bucket
    machinery with a per-stratum band budget: see
    :func:`containment_lsh_ensemble_pairs`.

    Cost shape: identical exchanges to :func:`minhash_lsh_pairs` (one
    narrow row per doc into the signature agg, 32 band rows per doc
    into the bucket groupBy, candidates verified by exact containment
    after a semi-join prune) — nothing quadratic in the corpus. r=1
    buckets are hotter than r=2 (a single shared min-shingle anchors a
    bucket), so the ``max_bucket`` cap + ``drop_observation``
    observability matter more here; capped buckets are boilerplate
    better handled by exact_dedup first. Precision is structurally 1
    (exact containment decides membership); recall is the band bound
    above, audited corpus-wide by queries/dedup.py
    dedup_containment_lsh under the driver gate.
    """
    entries = lsh_band_entries(
        df, num_hashes=num_hashes, rows_per_band=1,
        text_col=text_col, id_col=id_col, n=n,
    )
    # r15: no persist — the verification's two references to the
    # candidate set share its trailing distinct exchange via
    # ReuseExchange WITHIN the one job, and a plan-keyed cache entry
    # (never unpersisted) would leak across calls in one session,
    # turning the bench's min-of-3 into a cache-read measurement.
    candidates = lsh_bucket_candidates(
        entries, max_bucket=max_bucket, drop_observation=drop_observation
    )
    return _verify_candidates(
        df, candidates, threshold, text_col, id_col, n, score="containment"
    )


def containment_lsh_ensemble_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    num_hashes: int = 256,
    miss_target: float = 0.02,
    strata_base: float = 2.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_bucket: int = 1000,
    drop_observation=None,
) -> DataFrame:
    """Containment pairs (C = |A∩B| / min >= threshold) with
    LSH-Ensemble-style SIZE-STRATIFIED banding (Zhu et al., "LSH
    Ensemble: Internet-Scale Domain Search", VLDB 2016) — the
    extreme-ratio path :func:`containment_lsh_pairs`' flat r=1/b=32
    banding cannot walk: a paragraph quoted inside a book (size ratio
    rho >= 50) has Jaccard J = C/(1+rho-C) ~ 0.02, where 32 bands miss
    >50% of pairs.

    Stratification: each doc's stratum is floor(log_base(|shingles|)).
    For a pair whose smaller side sits in stratum i and larger in j,
    the worst-case ratio is bounded by rho(i,j) = base^(j+1-i), so
    J >= threshold/(1+rho(i,j)-threshold) and b(i,j) =
    ceil(ln(miss_target)/ln(1-J)) bands of one row each (r=1 — in the
    low-J regime every extra row per band costs more recall than a
    band buys) guarantee candidate-miss probability <= miss_target,
    capped at ``num_hashes``. Each doc emits bands 0..B(s)-1 of ONE
    shared minhash signature, where B(s) = max over its possible
    partner strata of b(.,.) — both sides of any (i,j) pair therefore
    emit at least b(i,j) common bands, so the per-pair envelope holds
    while same-size strata pay only b(rho=base^2) rows (7 at t=0.9,
    base=2) instead of all ``num_hashes``. The adaptive budget is the
    whole point: a narrow-size corpus pays ~flat-b32 cost, and only
    corpora that actually contain extreme-ratio pairs pay for them.

    Envelope at the default (t=0.9, 256 hashes, 2% target): the full
    miss_target guarantee holds up to stratum-bound rho ~ 59; beyond
    the cap a C=1 pair at TRUE ratio 50 still collides with prob
    1-(1-0.02)^256 ~ 99.4% (the stratum bound rho(i,j) overestimates
    the true ratio by at most base^2, so capped strata degrade
    gracefully). Cost shape: identical exchange structure to
    :func:`minhash_lsh_pairs` — one narrow row per doc into the
    signature agg, <= num_hashes band rows per doc into the bucket
    groupBy (vs a flat 32: the price of the extreme-ratio envelope),
    exact-containment verification (precision structurally 1), nothing
    quadratic in the corpus. The signature width is ADAPTIVE (r8): the
    observed stratum range is fetched first (one narrow count agg over
    the hashed shingle table, 2 values to the driver — the fetch the
    budget needed anyway) and the signature agg computes only
    eff = max_s B(s) minhashes, so a narrow-size corpus pays near
    flat-LSH cost and only corpora whose size spread actually allows
    extreme-ratio pairs pay toward the num_hashes cap; the emitted
    band entries (hence recall and results) are bit-identical to the
    fixed-width construction.
    Recall is audited corpus-wide by queries/dedup.py
    dedup_containment_lsh_ensemble under the driver gate.
    """
    import math

    def _stratum(c):
        return F.floor(F.log(float(strata_base), c.cast("double"))).cast("int")

    # ADAPTIVE signature width (r8): the per-stratum band budget B(s)
    # is capped by the worst ratio the OBSERVED stratum range [lo, hi]
    # allows, so only eff = max_s B(s) minhashes can ever be sliced
    # into a band — computing the full num_hashes-wide signature was
    # pure waste on narrow-size corpora. The range pre-pass counts
    # each doc's distinct shingles off the persisted hashed shingle
    # table (one narrow map-combined groupBy + a 2-value global
    # min/max reduce — the same 2-value fetch the budget already
    # needed, just moved BEFORE the signature agg). A map-side
    # size(array_distinct(shingles)) variant that avoids the shuffle
    # was measured 30x SLOWER at sf0.1 (58 s vs 1.9 s: the nested
    # array expression leaves codegen and is quadratic in doc length)
    # — the narrow shuffle is the cheap path, not the enemy. The
    # emitted band entries are bit-identical to the fixed-width
    # version — the budget map never sliced past eff — so recall
    # bounds, the audit oracle, and the plan shape are untouched; a
    # narrow-size corpus just stops paying for hashes no pair can
    # need (hi-lo=3 at t=0.9 needs 64, not 256).
    sh = shingle_sets(df, text_col, id_col, n)
    base = F.xxhash64(F.col("shingle")).bitwiseAND(F.lit((1 << 32) - 1))
    # r15: localCheckpoint, not persist — the hashed shingle table is
    # referenced from TWO JOBS (the stratum-range pre-pass collect and
    # the signature job), which a persist also covered, but the r8-era
    # entry was never unpersisted: the plan-keyed cache leaked across
    # calls in one session and the bench's later iterations read
    # iteration 1's cache. A call-local checkpoint materializes once
    # per call and is honestly recomputed by every fresh call.
    based = sh.select("doc_id", base.alias("_h32")).localCheckpoint()
    rng = (
        based.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
        .agg(
            F.min(_stratum(F.col("n_sh"))).alias("lo"),
            F.max(_stratum(F.col("n_sh"))).alias("hi"),
        )
        .first()
    )
    lo, hi = rng["lo"], rng["hi"]
    if lo is None:
        empty = df.select(
            F.col(id_col).alias("d1"), F.col(id_col).alias("d2")
        ).limit(0)
        return _verify_candidates(
            df, empty, threshold, text_col, id_col, n, score="containment"
        )

    def _bands(rho: float) -> int:
        j = threshold / (1.0 + rho - threshold)
        if j >= 1.0:
            return 1
        return max(1, min(num_hashes, math.ceil(math.log(miss_target) / math.log(1.0 - j))))

    # B(s): enough bands for this stratum's worst partner in EITHER
    # direction (smaller side vs the largest stratum, larger side vs
    # the smallest) — monotone in the bound, so it dominates b(i,j)
    # for every feasible pair
    budget = {
        s: max(
            _bands(strata_base ** (hi + 1 - s)),
            _bands(strata_base ** (s + 1 - lo)),
        )
        for s in range(lo, hi + 1)
    }
    eff = max(budget.values())

    # one aggregation: all eff minhashes AND the stratum key (distinct-
    # shingle count) — the shuffle carries one narrow row per doc.
    # With eff up to 256, hashing every shingle that many times would
    # dominate the whole operator (measured 2.5 of 3.5 s at sf0.1 for
    # the fixed 256), so the family here is ONE 32-bit base hash per
    # shingle + k Carter-Wegman affine transforms (a_i*x + b_i mod
    # 2^32, a_i odd < 2^31 so every product stays in int64 under ANSI
    # arithmetic) — the classic cheap-minhash construction (Broder
    # 1997 resemblance sketches use random linear maps of one
    # fingerprint). The flat-banding operators keep the salted-
    # xxhash64 family: their k=32 cost is negligible and the streaming
    # index format depends on it.
    def _affine(i: int) -> tuple[int, int]:
        x = (i * 0x9E3779B97F4A7C15 + 0xD1B54A32D192ED03) % (1 << 64)
        return ((x >> 33) | 1) % (1 << 31), (x % (1 << 31))

    mins = []
    for i in range(eff):
        a_i, b_i = _affine(i)
        mins.append(
            F.min((F.lit(a_i) * F.col("_h32") + F.lit(b_i)) % F.lit(1 << 32)).alias(f"h{i}")
        )
    # r15: sig's persist dropped — it has exactly ONE consumer
    # (entries), so the cache bought nothing within a call and its
    # never-unpersisted entry leaked across calls (see `based` above).
    sig = (
        based.groupBy("doc_id")
        .agg(*mins, F.count(F.lit(1)).alias("n_sh"))
        .select(
            "doc_id",
            F.array(*[f"h{i}" for i in range(eff)]).alias("sig"),
            _stratum(F.col("n_sh")).alias("_s"),
        )
    )
    budget_map = F.create_map(
        *[F.lit(x) for kv in budget.items() for x in kv]
    )
    entries = sig.select(
        "doc_id",
        F.posexplode(F.slice("sig", 1, budget_map[F.col("_s")])).alias(
            "band_id", "band_hash"
        ),
    )
    # no persist: the verification's two references share the
    # candidates' trailing distinct exchange (ReuseExchange) within
    # the one job — same reasoning as containment_lsh_pairs above
    candidates = lsh_bucket_candidates(
        entries, max_bucket=max_bucket, drop_observation=drop_observation
    )
    return _verify_candidates(
        df, candidates, threshold, text_col, id_col, n, score="containment"
    )


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 32
) -> DataFrame:
    """(doc_id, sig: array<bigint>) — k independent minhashes per doc.

    Hash family: xxhash64(salt_i, shingle); one aggregation computes
    all k mins map-side (partial aggregation), so the shuffle carries
    one row per doc.
    """
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = shingles.groupBy("doc_id").agg(*mins)
    return sig.select("doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 32,
    rows_per_band: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_bucket: int = 1000,
    drop_observation=None,
    band_entries: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash-LSH candidates + exact verification.

    ``band_entries``: precomputed (and ideally persisted)
    :func:`lsh_band_entries` for ``df`` — callers that also probe an
    index or write the entries out (the streaming epoch writer) pass
    them once instead of re-signing the batch per consumer.

    bands = num_hashes / rows_per_band; a pair lands in the same bucket
    of band j iff its signatures agree on that band's rows. With
    b=16, r=2 the miss probability at J=0.8 is (1-0.8^2)^16 ~ 6e-15,
    and exact verification removes all false positives — so the output
    equals the exact all-pairs result with overwhelming probability.

    ``max_bucket`` drops degenerate buckets (e.g. boilerplate-heavy
    corpora) to bound the quadratic pair expansion; dropped buckets are
    all-identical content better handled by exact_dedup first. The
    drop is OBSERVABLE: pass ``drop_observation`` (a
    ``pyspark.sql.Observation``) and, once the returned plan has run an
    action, ``observation.get`` holds ``dropped_buckets`` (buckets over
    the cap) and ``dropped_doc_slots`` (sum of their sizes) — an
    accumulator-style metric collected during the normal pass, no extra
    job. A boilerplate-heavy corpus silently losing near-dup pairs to
    the cap is now countable by the caller.

    Plan shape (the 100 TB budget): the signature stage's only
    exchange carries ONE narrow row per doc (minhash is multiplicity-
    invariant, so the exploded shingles feed groupBy(min) directly
    with map-side partial aggregation — no distinct shuffle); the only
    other full-corpus exchange is the (band_id, band_hash) groupBy of
    16 narrow rows per doc, whose buckets the size cap bounds.
    Exact-Jaccard verification semi-joins the corpus down to candidate
    docs BEFORE tokenization, so the explode+distinct set pipeline
    runs over candidates only. The broadcast of candidate ids assumes
    near-dup candidates << corpus; a corpus where candidates approach
    the corpus size has degenerated into exact-dup territory and
    should run exact_dedup first.
    """
    if band_entries is None:
        band_entries = lsh_band_entries(df, num_hashes, rows_per_band, text_col, id_col, n)

    # One shuffle on (band_id, band_hash) builds the bucket arrays;
    # the exact-Jaccard verification runs only over candidate docs:
    # the semi-join in _verify_candidates prunes the corpus BEFORE
    # tokenization, so the shingle-set work touches candidate docs
    # only. r15: the r8-era `.persist()` of the candidates is gone —
    # the verification's two references share the candidates' trailing
    # distinct exchange via ReuseExchange WITHIN the job (plan-
    # verified: one signature pipeline in the final plan), while the
    # never-unpersisted cache entry leaked across calls in one session
    # and let the bench's later iterations read iteration 1's cache.
    candidates = lsh_bucket_candidates(
        band_entries, max_bucket=max_bucket, drop_observation=drop_observation
    )
    return _verify_candidates(df, candidates, threshold, text_col, id_col, n)


def lsh_bucket_candidates(
    band_entries: DataFrame,
    max_bucket: int = 1000,
    drop_observation=None,
) -> DataFrame:
    """Within-corpus candidate (d1 < d2) pairs from band entries.

    One shuffle on (band_id, band_hash) builds the bucket arrays; the
    size cap and the pairwise expansion are then map-side array ops —
    this replaces the window-count + bucket self-join (two passes over
    the band shuffle) of the earlier design. Each doc_id appears at
    most once per bucket (one signature per doc), and array_sort
    guarantees d1 < d2 without a post-filter. See
    :func:`minhash_lsh_pairs` for the cap/drop-observation contract.
    """
    buckets = (
        band_entries.groupBy("band_id", "band_hash")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if drop_observation is not None:
        over = F.size("ids") > max_bucket
        # coalesce: SUM over zero observed rows (no bucket of size >= 2
        # anywhere) is NULL, and callers doing arithmetic on the metric
        # contract ("drops are countable") expect 0.
        buckets = buckets.observe(
            drop_observation,
            F.coalesce(F.sum(over.cast("long")), F.lit(0)).alias("dropped_buckets"),
            F.coalesce(
                F.sum(F.when(over, F.size("ids")).otherwise(0)), F.lit(0)
            ).alias("dropped_doc_slots"),
        )
    buckets = buckets.filter(F.size("ids") <= max_bucket)
    pair_expr = (
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> named_struct('d1', x, 'd2', y))))"
    )
    return (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.d1", "p.d2")
        .distinct()
    )


def lsh_band_entries(
    df: DataFrame,
    num_hashes: int = 32,
    rows_per_band: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    shingle_col: str | None = None,
) -> DataFrame:
    """(doc_id, band_id, band_hash) — the LSH index rows for a corpus.

    ``shingle_col``: a column already holding each doc's distinct
    shingle array (:func:`with_shingle_set`) — skips the tokenize
    pass. Identical signatures: minhash is multiplicity-invariant, so
    min over the distinct set equals min over the raw shingle stream.

    This is the persistable index: write it once per corpus version
    (ideally bucketed by (band_id, band_hash)) and every later batch
    probes it with an equi-join instead of re-signing the corpus.

    Signatures without the distinct shuffle: minhash is invariant to
    shingle multiplicity, so the exploded shingles feed groupBy(min)
    directly. min is algebraic, so map-side partial aggregation
    collapses each doc to ONE row before the exchange — the only
    full-corpus data movement in the signature stage is one narrow
    row per doc. (A transform/array_min formulation with no shuffle
    at all was measured 12x SLOWER: CollapseProject inlines the
    shingle-array expression into all k transforms, recomputing it
    k times per row; explode evaluates it exactly once.)
    """
    bands = num_hashes // rows_per_band
    if shingle_col is not None:
        sh_all = df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.col(shingle_col)).alias("shingle"),
        )
    else:
        toks = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks"))
        sh_all = toks.select("doc_id", F.explode(word_shingles(F.col("_toks"), n)).alias("shingle"))
    sig = sh_all.groupBy("doc_id").agg(
        *[F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}") for i in range(num_hashes)]
    )
    return sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band_id"),
                    F.xxhash64(*[F.col(f"h{j * rows_per_band + r}") for r in range(rows_per_band)]).alias("band_hash"),
                )
                for j in range(bands)
            ])
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")


def _verify_candidates(
    docs: DataFrame,
    candidates: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    score: str = "jaccard",
    shingle_col: str | None = None,
) -> DataFrame:
    """Exact verification of candidate (d1, d2) pairs against ``docs``
    (which must contain both sides' documents) — ``score`` picks the
    set measure: "jaccard" (|A∩B|/|A∪B|) or "containment"
    (|A∩B|/min(|A|,|B|)); the exact value alone decides membership, so
    the output has no false positives regardless of candidate source.

    ``shingle_col``: name of a column of ``docs`` that ALREADY holds
    each doc's distinct shingle array (:func:`with_shingle_set`). When
    set, the tokenize+shingle pass is skipped entirely — the state-
    backed streaming path stores shingle sets once at ingest so
    history docs are never re-tokenized per epoch (guide §2.3/§4) —
    and ``text_col`` is not read at all (column-pruned at the scan).

    Scores each pair with array_intersect over per-doc DISTINCT
    shingle arrays — a map-side projection plus two joins of
    (candidate pairs) x (candidate docs). NO join here carries a
    forced broadcast hint: in the corpora dedup exists for, duplicates
    are a large constant fraction, so cand_docs (the distinct doc ids
    appearing in any candidate pair) grows ~linearly with the corpus —
    a pinned broadcast of it is an executor OOM at 100 TB and disables
    AQE's fail-over to a skew-splittable shuffle join. AQE broadcasts
    all three joins at small scale on measured sizes; the no-hint
    shape is pinned by tests/test_plans.py::
    test_dedup_verification_does_not_force_broadcasts. This replaces
    the explode/distinct/self-join verification (7 wide stages) with
    2 joins. The _toks projection must stay separate: word_shingles
    reads the token array 3n times per shingle (see shingle_sets
    docstring).
    """
    cand_docs = (
        candidates.select(F.explode(F.array("d1", "d2")).alias("_cid")).distinct()
    )
    cand_df = docs.join(
        cand_docs, F.col(id_col) == F.col("_cid"), "leftsemi"
    )
    if shingle_col is not None:
        cand_sh = cand_df.select(
            F.col(id_col).alias("doc_id"), F.col(shingle_col).alias("shset")
        )
    else:
        cand_toks = cand_df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks"))
        cand_sh = cand_toks.select(
            "doc_id", F.array_distinct(word_shingles(F.col("_toks"), n)).alias("shset")
        )
    scored = (
        candidates.join(
            cand_sh.select(F.col("doc_id").alias("d1"), F.col("shset").alias("s1")), "d1"
        )
        .join(cand_sh.select(F.col("doc_id").alias("d2"), F.col("shset").alias("s2")), "d2")
        .select(
            "d1",
            "d2",
            F.size(F.array_intersect("s1", "s2")).alias("_shared"),
            F.size("s1").alias("_n1"),
            F.size("s2").alias("_n2"),
        )
    )
    if score == "containment":
        measure = F.col("_shared").cast("double") / F.least("_n1", "_n2")
    else:
        measure = F.col("_shared").cast("double") / (
            F.col("_n1") + F.col("_n2") - F.col("_shared")
        )
    return scored.select("d1", "d2", measure.alias(score)).filter(
        F.col(score) >= threshold
    )


def lsh_probe_candidates(
    index: DataFrame, probe: DataFrame, broadcast_probe: bool = True
) -> DataFrame:
    """Candidate (d1=index doc, d2=probe doc) pairs from an equi-join of
    probe band entries against an LSH index on (band_id, band_hash).

    ``broadcast_probe=True`` is the small-batch path (one map-side pass
    over the index, no shuffle anywhere). With ``False`` the join runs
    as a sort-merge join on the band key — the path for LARGE probe
    batches against an index stored as a table bucketed by
    (band_id, band_hash) (compact_neardup_state / engine.write_bucketed):
    the bucketed side needs NO exchange, only the probe shuffles, so
    probing a 100 TB corpus index moves O(|batch|) rows
    (tests/test_plans.py::test_compacted_lsh_probe_index_side_shuffle_free).
    """
    p = F.broadcast(probe) if broadcast_probe else probe
    return (
        index.alias("o")
        .join(
            p.alias("p"),
            (F.col("o.band_id") == F.col("p.band_id"))
            & (F.col("o.band_hash") == F.col("p.band_hash"))
            & (F.col("o.doc_id") != F.col("p.doc_id")),
        )
        .select(F.col("o.doc_id").alias("d1"), F.col("p.doc_id").alias("d2"))
        .distinct()
    )


def minhash_lsh_incremental(
    old_docs: DataFrame,
    new_docs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 32,
    rows_per_band: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    index: DataFrame | None = None,
    broadcast_probe: bool = True,
    probe_entries: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs BETWEEN a new batch and an existing corpus — the
    daily-increment dedup workflow. Returns (d1=old id, d2=new id,
    jaccard >= threshold).

    Cost shape at 100 TB: signature work is O(|new batch|) only; the
    corpus side is touched through its PRE-BUILT index
    (:func:`lsh_band_entries`, pass ``index=``; stored bucketed by
    (band_id, band_hash) the probe join is shuffle-free on the index
    side) plus the candidate-pruned verification reads. Nothing
    quadratic in the corpus ever runs — re-running all-pairs dedup per
    batch is exactly what this avoids. The new batch's band entries
    are broadcast when ``broadcast_probe`` (a daily batch is small by
    definition); pass ``broadcast_probe=False`` for a large batch
    probing a BUCKETED index table, where the sort-merge join leaves
    the index side shuffle-free (:func:`lsh_probe_candidates`).
    Candidates then verify with the same exact-Jaccard stage as the
    full-corpus LSH, so false positives are removed and misses have
    the same ~1e-11 band-miss probability. ``old_docs`` and
    ``new_docs`` must have disjoint ids (a batch re-containing an
    existing id belongs to CDC merge, not dedup).
    """
    idx = (
        index
        if index is not None
        else lsh_band_entries(old_docs, num_hashes, rows_per_band, text_col, id_col, n)
    )
    probe = (
        probe_entries
        if probe_entries is not None
        else lsh_band_entries(new_docs, num_hashes, rows_per_band, text_col, id_col, n)
    )
    candidates = lsh_probe_candidates(idx, probe, broadcast_probe=broadcast_probe)
    all_docs = old_docs.select(F.col(id_col), F.col(text_col)).unionByName(
        new_docs.select(F.col(id_col), F.col(text_col))
    )
    return _verify_candidates(all_docs, candidates, threshold, text_col, id_col, n)


def _prefix_entries(sh: DataFrame, freq: DataFrame, threshold: float) -> DataFrame:
    """Rarest-first PREFIX of each doc's shingle set — the exact
    set-similarity-join candidate filter (Chaudhuri et al. ICDE'06
    SSJoin; Bayardo et al. WWW'07 all-pairs; Xiao et al. WWW'08
    PPJoin; implementation original on the DataFrame API): order all
    shingles by a GLOBAL (document-frequency asc, shingle asc) total
    order; any pair with Jaccard >= t and sizes n1, n2 shares its
    order-smallest common shingle, and that shingle must sit within
    the first n - ceil(t*n) + 1 shingles of EACH side (were it later
    on side x, the <= ceil(t*n_x) - 1 shingles after it could not hold
    the >= ceil(t*n_x) common shingles). So a prefix-prefix equi-join
    generates a complete candidate set while hot (frequent) shingles
    — the quadratic buckets of the naive shared-shingle join — fall
    out of every prefix. ``floor(t*n)`` is used for the subtracted
    term (floor <= ceil: at worst one extra prefix element, never a
    missed pair). ``freq`` must be computed over the UNION of all
    sides being joined, so both sides rank by the same global order.

    Each entry carries its set size ``_n_sh`` and its rank ``_rn`` in
    the global order so the candidate joins can stack PPJoin's two
    further EXACT filters on top of the prefix filter (Xiao et al.
    WWW'08 — both are necessary conditions of Jaccard >= t, so
    pruning by them never drops a true pair; the exact verification
    step still alone decides membership):

    - LENGTH: J >= t forces |intersection| >= t * max(n1, n2) and
      |intersection| <= min(n1, n2), so min(n1, n2) >= t * max(n1, n2).
    - POSITIONAL: at a shared prefix shingle ranked (i, j) on the two
      sides, only the match itself plus the suffixes after it can
      intersect, so overlap <= 1 + min(n1 - i, n2 - j); a true pair
      needs overlap >= t * (n1 + n2) / (1 + t) (from J = o / (n1 +
      n2 - o) >= t). The pair's ORDER-SMALLEST shared shingle always
      satisfies the bound for a true pair, so keeping any candidate
      occurrence that passes (the filter runs per-occurrence, BEFORE
      the distinct) is complete.

    Both comparisons subtract a 1e-9 slack so double rounding of the
    t * n products can only make the filter more permissive, never
    drop a boundary pair (sizes are integers; the true condition holds
    in real arithmetic).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.col("_df").asc(), F.col("shingle").asc())
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n_sh"))
    return (
        sh.join(freq, "shingle")
        .withColumn("_rn", F.row_number().over(w))
        .join(sizes, "doc_id")
        .filter(
            F.col("_rn")
            <= F.col("_n_sh") - F.floor(F.lit(threshold) * F.col("_n_sh")) + 1
        )
        .select("doc_id", "shingle", "_rn", "_n_sh")
    )


def _length_filter(n1: Column, n2: Column, threshold: float) -> Column:
    """PPJoin length filter min(n1, n2) >= t * max(n1, n2), with the
    1e-9 exact-conservative slack — the single definition shared by
    the two-sided prefix join and the one-sided probe (derivation in
    :func:`_prefix_entries`)."""
    return F.least(n1, n2).cast("double") >= (
        F.lit(threshold) * F.greatest(n1, n2).cast("double") - F.lit(1e-9)
    )


def _ppjoin_filters(threshold: float) -> Column:
    """PPJoin length + positional candidate predicate over an aliased
    prefix-prefix join (sides ``a``/``b`` from :func:`_prefix_entries`).
    Exact-conservative: see the derivation in :func:`_prefix_entries`."""
    n1, n2 = F.col("a._n_sh"), F.col("b._n_sh")
    ubound = F.lit(1) + F.least(n1 - F.col("a._rn"), n2 - F.col("b._rn"))
    positional_ok = ubound.cast("double") >= (
        F.lit(threshold) * (n1 + n2).cast("double") / F.lit(1.0 + threshold)
        - F.lit(1e-9)
    )
    return _length_filter(n1, n2, threshold) & positional_ok


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    sh: DataFrame | None = None,
) -> DataFrame:
    """EXACT word-n-gram Jaccard pairs via prefix filtering — the
    same result as :func:`ngram_jaccard_pairs` (deterministic, no
    probabilistic misses) with the quadratic hot-shingle buckets
    removed: candidates come from a prefix-prefix equi-join (see
    :func:`_prefix_entries`), then exact Jaccard over the FULL shingle
    sets decides membership. This is what an exact-similarity self-join
    runs at corpus scale; equality with the naive shared-shingle join
    is pinned by tests/test_scale_ops.py::test_prefix_filtered_pairs_equal_naive.

    The shingle table is materialized ONCE (``localCheckpoint``) — the
    prefix plan references it ~6 times (frequency order, prefix
    ranking, sizes, both verify sides), and re-running the regex
    tokenization per reference costs more than the filter saves
    (measured 6x at sf0.1). A deployed pipeline keeps the shingle
    table as a real artifact; this is that materialization.
    """
    if sh is None:
        sh = shingle_sets(df, text_col, id_col, n).localCheckpoint()
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    p = _prefix_entries(sh, freq, threshold)
    a, b = p.alias("a"), p.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & _ppjoin_filters(threshold),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    return _jaccard_for_pairs(sh, cand).filter(F.col("jaccard") >= threshold)


def jaccard_prefix_index(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> tuple:
    """(full shingle table, prefix entries) for a STANDING corpus —
    the build-once artifacts of the one-sided prefix probe
    (:func:`ngram_jaccard_probe_pairs`). The prefix order is the
    corpus's own (document-frequency asc, shingle asc); one-sided
    completeness needs no cross-corpus order agreement (see the probe
    docstring), so the index never has to be re-ranked as batches
    arrive."""
    sh = shingle_sets(docs, text_col, id_col, n)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    return sh, _prefix_entries(sh, freq, threshold)


def ngram_jaccard_probe_pairs(
    sh_corpus: DataFrame,
    prefix_corpus: DataFrame,
    new_docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    sh_new: DataFrame | None = None,
) -> DataFrame:
    """EXACT cross pairs between a STANDING corpus and an arriving
    batch via a ONE-SIDED prefix probe: candidates are
    ``prefix_corpus ⋈ sh_new`` on shingle — the corpus side ships its
    prebuilt rarest-first prefix (:func:`jaccard_prefix_index`), the
    batch side probes with its FULL shingle set. Complete for any
    Jaccard >= t pair by the suffix-counting argument applied to the
    CORPUS side alone: the order-smallest shared shingle must sit in
    the corpus doc's prefix, whatever the batch side looks like — so
    one-sided filtering is exact, needs no window over the batch, and
    the corpus's hot shingles (the quadratic buckets) never generate a
    candidate. The PPJoin LENGTH filter stacks on top (sizes are known
    on both sides: the corpus prefix carries ``_n_sh``, the batch side
    aggregates its full shingle table) — the positional filter does
    not apply one-sided, since the batch probes with its FULL set and
    a match position within it bounds nothing. Per-batch cost: one
    shingle pass over the batch + the pruned probe join + exact
    verification of candidates. Returns (d1=corpus id, d2=batch id,
    jaccard)."""
    if sh_new is None:
        sh_new = shingle_sets(new_docs, text_col, id_col, n).localCheckpoint()
    new_sizes = sh_new.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n_new"))
    probe = sh_new.join(new_sizes, "doc_id")
    length_ok = _length_filter(F.col("a._n_sh"), F.col("b._n_new"), threshold)
    cand = (
        prefix_corpus.alias("a")
        .join(probe.alias("b"), (F.col("a.shingle") == F.col("b.shingle")) & length_ok)
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    return _jaccard_for_pairs(sh_corpus.unionByName(sh_new), cand).filter(
        F.col("jaccard") >= threshold
    )


def ngram_jaccard_cross_pairs(
    old_docs: DataFrame,
    new_docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """EXACT word-n-gram Jaccard pairs BETWEEN an old corpus and a new
    batch — the batch-touching restriction of
    :func:`ngram_jaccard_pairs`, computed incrementally: only the NEW
    side's shingles probe the shared-shingle join, so the work is
    O(|batch shingles| x their bucket occupancy), never the corpus
    self-join. Returns (d1=old id, d2=new id, jaccard >= threshold).

    This is the DETERMINISTIC sibling of
    :func:`minhash_lsh_incremental` (r10 ADVICE: LSH's ~1e-11/pair
    band-miss probability is fine for the serving path, but a
    downstream consumer that must equal an exact one-shot computation
    — the incremental connected-components fold, whose incremental ≡
    one-shot guarantee holds only when the batch pair set is COMPLETE
    — needs the exact pairing). Candidates come from a PREFIX-PREFIX
    equi-join (:func:`_prefix_entries`, the SSJoin/all-pairs/PPJoin
    filter — exact, and the hot shingles whose buckets would make a
    raw shared-shingle join quadratic fall out of every prefix; the
    r11 scale spot-check measured the raw join at 13.4x on 10x data,
    the prefix-filtered one sublinear), then exact Jaccard over the
    FULL shingle sets decides membership. The frequency order is
    computed over old ∪ new so both prefixes rank identically. Both
    shingle tables are materialized once (``localCheckpoint``) — see
    :func:`ngram_jaccard_pairs_prefix`."""
    sh_old = shingle_sets(old_docs, text_col, id_col, n).localCheckpoint()
    sh_new = shingle_sets(new_docs, text_col, id_col, n).localCheckpoint()
    sh_all = sh_old.unionByName(sh_new)
    freq = sh_all.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    a = _prefix_entries(sh_old, freq, threshold).alias("a")
    b = _prefix_entries(sh_new, freq, threshold).alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle")) & _ppjoin_filters(threshold),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    return _jaccard_for_pairs(sh_all, cand).filter(F.col("jaccard") >= threshold)


def simhash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Pigeonhole banding: split the 60-bit fingerprint into
    (max_hamming + 1) bands — any pair within distance k must agree
    EXACTLY on at least one band, so an equi-join per band finds every
    candidate (no misses), and ``bit_count(xor)`` verifies the exact
    distance. At scale each band join shuffles on a 15-bit-band value
    whose buckets are tiny unless the corpus is near-identical —
    the same cost shape as MinHash-LSH banding.
    """
    bands = max_hamming + 1
    width = SIMHASH_BITS // bands
    # signed-long-safe band mask; width==64 (max_hamming=0) is all bits
    mask = F.lit(-1).cast("long") if width >= 64 else F.lit((1 << width) - 1).cast("long")
    fp = simhash(df, text_col, id_col, SIMHASH_BITS, n)
    banded = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band_id"),
                    # unsigned band extraction: shift then mask
                    ((F.shiftrightunsigned(F.col("simhash"), j * width))
                     .bitwiseAND(mask)).alias("band_val"),
                )
                for j in range(bands)
            ])
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band_id", "b.band_val")
    a, bnd = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            bnd,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.simhash").alias("h1"),
            F.col("b.simhash").alias("h2"),
        )
        .distinct()
    )
    return cands.select(
        "d1",
        "d2",
        F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).cast("int").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def _hamming_band_entries(
    fp: DataFrame, bands: int, width: int, id_col: str, hash_col: str
) -> DataFrame:
    """(_id, _h, band_id, band_val) pigeonhole band entries of an
    integer-fingerprint frame — the index/probe unit shared by
    :func:`hamming_neardup_pairs` (full corpus) and
    :func:`hamming_probe_pairs` (incremental batch-vs-index)."""
    mask = F.lit(-1).cast("long") if width >= 64 else F.lit((1 << width) - 1).cast("long")
    return fp.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_h"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band_id"),
                    ((F.shiftrightunsigned(F.col(hash_col), j * width))
                     .bitwiseAND(mask)).alias("band_val"),
                )
                for j in range(bands)
            ])
        ).alias("b"),
    ).select("_id", "_h", "b.band_id", "b.band_val")


def hamming_probe_pairs(
    index_fp: DataFrame,
    new_fp: DataFrame,
    max_hamming: int = 3,
    bits: int = 64,
    id_col: str = "asset_id",
    hash_col: str = "dhash",
    broadcast_probe: bool = True,
) -> DataFrame:
    """INCREMENTAL hamming near-dup: pair an arriving fingerprint
    batch against the existing corpus AND within itself, without
    re-pairing the corpus — the perceptual twin of the MinHash
    ``incremental_neardup_pairs`` shape. Cross candidates come from
    one band equi-join of the (in production, materialized and
    bucketed) index entries against the batch's entries — broadcast
    when the batch is small (``broadcast_probe``, the daily-ingest
    case: the corpus side never shuffles), sort-merge against a
    bucketed index table otherwise; within-batch pairs reuse
    :func:`hamming_neardup_pairs` on the O(batch) side only. Same
    pigeonhole guarantee, so incremental union batch-internal equals
    the one-shot pairing restricted to pairs touching the batch.
    ``index_fp`` and ``new_fp`` must have disjoint ids. Emits
    (d1, d2, hamming), d1 < d2.
    """
    bands = max_hamming + 1
    width = bits // bands
    idx = _hamming_band_entries(index_fp, bands, width, id_col, hash_col)
    probe = _hamming_band_entries(new_fp, bands, width, id_col, hash_col)
    if broadcast_probe:
        probe = F.broadcast(probe)
    cross = (
        idx.alias("a")
        .join(
            probe.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val")),
        )
        .select(
            F.least("a._id", "b._id").alias("d1"),
            F.greatest("a._id", "b._id").alias("d2"),
            F.col("a._h").alias("h1"),
            F.col("b._h").alias("h2"),
        )
        .distinct()
        .select(
            "d1",
            "d2",
            F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    within = hamming_neardup_pairs(new_fp, max_hamming, bits, id_col, hash_col)
    return cross.unionByName(within)


def hamming_neardup_pairs(
    fp: DataFrame,
    max_hamming: int = 3,
    bits: int = 64,
    id_col: str = "asset_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """Generic hamming-distance near-dup pairing over precomputed
    integer fingerprints — the pigeonhole bander behind
    :func:`simhash_neardup_pairs`, factored over ANY fingerprint
    column (SimHash, perceptual dHash/pHash, audio chromaprints):
    split the ``bits``-bit value into ``max_hamming + 1`` bands; any
    pair within distance k agrees EXACTLY on >= 1 band (pigeonhole —
    no misses), so candidate generation is (max_hamming + 1) equi-
    joins on tiny band values, never all-pairs, and ``bit_count(xor)``
    verifies the exact distance. Emits (d1, d2, hamming), d1 < d2.
    """
    bands = max_hamming + 1
    width = bits // bands
    banded = _hamming_band_entries(fp, bands, width, id_col, hash_col)
    a, bnd = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            bnd,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("d1"),
            F.col("b._id").alias("d2"),
            F.col("a._h").alias("h1"),
            F.col("b._h").alias("h2"),
        )
        .distinct()
    )
    return cands.select(
        "d1",
        "d2",
        F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).cast("int").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def _frame_band_entries(
    frames: DataFrame,
    max_hamming: int,
    bits: int,
    id_col: str,
    frame_col: str,
    hash_col: str,
) -> DataFrame:
    """(_vid, _f, _h, band_id, band_val) pigeonhole band entries of a
    per-frame fingerprint frame — the index/probe unit shared by
    :func:`frameset_containment_pairs` (full corpus) and
    :func:`frameset_containment_probe` (incremental batch-vs-index)."""
    bands = max_hamming + 1
    width = bits // bands
    mask = (
        F.lit(-1).cast("long") if width >= 64 else F.lit((1 << width) - 1).cast("long")
    )
    return frames.select(
        F.col(id_col).alias("_vid"),
        F.col(frame_col).alias("_f"),
        F.col(hash_col).alias("_h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_id"),
                        (
                            F.shiftrightunsigned(F.col(hash_col), j * width)
                        ).bitwiseAND(mask).alias("band_val"),
                    )
                    for j in range(bands)
                ]
            )
        ).alias("b"),
    ).select("_vid", "_f", "_h", "b.band_id", "b.band_val")


def frameset_containment_pairs(
    frames: DataFrame,
    max_hamming: int = 3,
    bits: int = 64,
    tau_num: int = 1,
    tau_den: int = 2,
    id_col: str = "asset_id",
    frame_col: str = "frame_no",
    hash_col: str = "fhash",
) -> DataFrame:
    """Multi-frame VIDEO near-dup: frame-level hamming matches banded
    with the same pigeonhole guarantee as
    :func:`hamming_neardup_pairs`, then a FRAME-SET CONTAINMENT VOTE
    per video pair — the ``containment_pairs`` shape applied to frame
    fingerprints instead of n-grams. A trimmed re-encode's frames are
    a (perceptually damaged) subset of the original's, so it pairs
    even though no single designated frame (first, middle, ...) hash
    survives the trim.

    Stages, all equi-join shaped (never all-frame-pairs):
    1. each sampled frame's ``bits``-bit dHash splits into
       ``max_hamming + 1`` bands; candidate frame matches come from
       band equi-joins across DIFFERENT videos (pigeonhole: no pair
       within the distance is missed);
    2. ``bit_count(xor)`` verifies the exact per-frame distance;
    3. per video pair, count DISTINCT matched frames on each side and
       vote: pair iff matched/|frames| >= tau on EITHER side (the
       containment direction makes a short clip inside a long video
       pair too). The vote compares integers
       (``tau_den * matched >= tau_num * n_frames``) — no float
       division, so the DuckDB oracle replays it exactly.

    Emits (d1, d2, n1, n2, m1, m2), d1 < d2: frame counts and distinct
    matched-frame counts per side — integers only, fully
    value-hashable.
    """
    banded = _frame_band_entries(
        frames, max_hamming, bits, id_col, frame_col, hash_col
    )
    a, b = banded.alias("a"), banded.alias("b")
    matches = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a._vid") < F.col("b._vid")),
        )
        .select(
            F.col("a._vid").alias("d1"),
            F.col("b._vid").alias("d2"),
            F.col("a._f").alias("f1"),
            F.col("b._f").alias("f2"),
            F.col("a._h").alias("h1"),
            F.col("b._h").alias("h2"),
        )
        .distinct()
        .filter(
            F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))) <= max_hamming
        )
    )
    nf = frames.groupBy(F.col(id_col).alias("_vid")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_nf")
    )
    return _frameset_vote(matches, nf, tau_num, tau_den)


def _frameset_vote(
    matches: DataFrame, nf: DataFrame, tau_num: int, tau_den: int
) -> DataFrame:
    """Per-video-pair containment vote over verified frame matches
    (d1, d2, f1, f2): count DISTINCT matched frames per side, join the
    per-video frame counts, keep pairs where matched/|frames| >= tau
    on EITHER side — integer cross-multiplied, exactly replayable."""
    per_pair = matches.groupBy("d1", "d2").agg(
        F.countDistinct("f1").cast("bigint").alias("m1"),
        F.countDistinct("f2").cast("bigint").alias("m2"),
    )
    return (
        per_pair.join(nf.withColumnRenamed("_vid", "d1"), "d1")
        .withColumnRenamed("_nf", "n1")
        .join(nf.withColumnRenamed("_vid", "d2"), "d2")
        .withColumnRenamed("_nf", "n2")
        .filter(
            (F.lit(tau_den) * F.col("m1") >= F.lit(tau_num) * F.col("n1"))
            | (F.lit(tau_den) * F.col("m2") >= F.lit(tau_num) * F.col("n2"))
        )
        .select("d1", "d2", "n1", "n2", "m1", "m2")
    )


def frameset_containment_probe(
    corpus_frames: DataFrame,
    new_frames: DataFrame,
    max_hamming: int = 3,
    bits: int = 64,
    tau_num: int = 1,
    tau_den: int = 2,
    id_col: str = "asset_id",
    frame_col: str = "frame_no",
    hash_col: str = "fhash",
    broadcast_probe: bool = True,
) -> DataFrame:
    """INCREMENTAL multi-frame video near-dup: vote an arriving video
    batch against the existing corpus AND within itself, without
    re-pairing the corpus — the video member of the
    :func:`hamming_probe_pairs` / ``incremental_neardup_pairs`` family.

    Cross frame matches come from ONE band equi-join of the corpus's
    per-frame band entries (in production, the materialized index)
    against the batch's — broadcast when the batch is small, so the
    corpus side never shuffles; the containment vote then needs only
    the per-video FRAME COUNTS, which in production live beside the
    index (one bigint per video, written at index build) and are
    recomputed here with a single count agg (no frame content moves).
    Within-batch pairs reuse :func:`frameset_containment_pairs` on the
    O(batch) side only. Pigeonhole banding is lossless, so incremental
    union within-batch equals the one-shot voting restricted to pairs
    touching the batch (pinned by tests/test_multimodal.py::
    test_video_incremental_equals_oneshot). ``corpus_frames`` and
    ``new_frames`` must have disjoint video ids. Emits
    (d1, d2, n1, n2, m1, m2), d1 < d2.
    """
    idx = _frame_band_entries(
        corpus_frames, max_hamming, bits, id_col, frame_col, hash_col
    )
    probe = _frame_band_entries(
        new_frames, max_hamming, bits, id_col, frame_col, hash_col
    )
    if broadcast_probe:
        probe = F.broadcast(probe)
    swap = F.col("a._vid") > F.col("b._vid")
    cross = (
        idx.alias("a")
        .join(
            probe.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val")),
        )
        .select(
            F.least("a._vid", "b._vid").alias("d1"),
            F.greatest("a._vid", "b._vid").alias("d2"),
            F.when(swap, F.col("b._f")).otherwise(F.col("a._f")).alias("f1"),
            F.when(swap, F.col("a._f")).otherwise(F.col("b._f")).alias("f2"),
            F.col("a._h").alias("h1"),
            F.col("b._h").alias("h2"),
        )
        .distinct()
        .filter(F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))) <= max_hamming)
    )
    nf = (
        corpus_frames.select(F.col(id_col).alias("_vid"))
        .unionByName(new_frames.select(F.col(id_col).alias("_vid")))
        .groupBy("_vid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_nf"))
    )
    cross_votes = _frameset_vote(cross, nf, tau_num, tau_den)
    within = frameset_containment_pairs(
        new_frames, max_hamming, bits, tau_num, tau_den, id_col, frame_col, hash_col
    )
    return cross_votes.unionByName(within)


# 60-bit shingle hash from the top 15 hex nibbles of md5. md5 is
# available with identical output in Spark AND DuckDB, and the nibble
# parse is plain integer arithmetic (max value 16^15-1 ~ 1.15e18,
# inside int64) — so unlike xxhash64, the whole SimHash pipeline is
# replayable by the SQL oracle. 60 well-mixed bits lose nothing
# relevant vs 64 for near-dup detection.
SIMHASH_BITS = 60


def _md5_hash60_sql(col: str) -> str:
    """Spark-SQL expression: 60-bit integer from md5(col)'s first 15
    hex chars. ``instr`` is 1-based; a hex digit's value is its
    position in '0123456789abcdef' minus 1."""
    terms = " + ".join(
        f"(instr('0123456789abcdef', substring(md5(encode({col}, 'utf-8')), {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (14 - i)} AS BIGINT)"
        for i in range(15)
    )
    return f"({terms})"


def md5_hash60_duckdb_sql(col: str) -> str:
    """The DuckDB twin of :func:`_md5_hash60_sql` (strpos == instr)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({col}), {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (14 - i)} AS BIGINT)"
        for i in range(15)
    )
    return f"({terms})"


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
    n: int = 3,
) -> DataFrame:
    """SimHash fingerprint per document (60-bit md5-derived hash).

    Each shingle votes +-1 on every bit of its hash; the fingerprint
    takes the sign (ties -> 0). Near-duplicate docs land within a few
    bits of hamming distance. All arithmetic is JVM bit-ops: the
    per-shingle bit vote explodes to (doc, bit) rows, one shuffle on
    doc_id. The hash is md5-derived (not xxhash64) so the DuckDB
    oracle replays fingerprints exactly — see queries/dedup.py.
    """
    sh = shingle_sets(df, text_col, id_col, n).withColumn(
        "h", F.expr(_md5_hash60_sql("shingle"))
    )
    votes = sh.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
    ).select(
        "doc_id",
        "bit",
        F.expr("CASE WHEN (shiftright(h, bit) & 1) = 1 THEN 1 ELSE -1 END").alias("vote"),
    )
    return (
        votes.groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("v"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.expr("CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), bit) ELSE CAST(0 AS BIGINT) END")
            ).alias("simhash")
        )
    )


def remove_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """The REMOVAL transform behind :func:`dup_span_coverage`: rebuild
    each document's text with every token inside a duplicated
    word-n-gram span (merged to maximal islands, same gaps-and-islands
    pass) deleted — the surgical alternative to dropping a whole doc
    when only its boilerplate passages are shared. Emits
    (doc_id, clean_text, n_tokens, n_removed).

    Scale shape: identical to dup_span_coverage up to the island
    extents (one gram pipeline + three key-partitioned window passes);
    the rebuild is then a map-side array filter — per-doc interval
    lists ride a doc_id join, each token index tests membership with
    an EXISTS over that (tiny) list inside whole-stage codegen, and
    clean text is one concat_ws. Nothing new shuffles; no UDF.
    """
    from pyspark.sql import Window as W

    toks = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks"))
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.when(F.size("_toks") >= n, word_shingles(F.col("_toks"), n))
            .otherwise(F.array().cast("array<string>"))
        ).alias("pos", "ngram"),
    )
    wg = W.partitionBy("ngram")
    dup = (
        grams.withColumn("_mn", F.min("doc_id").over(wg))
        .withColumn("_mx", F.max("doc_id").over(wg))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("doc_id", "pos", (F.col("pos") + F.lit(n - 1)).alias("end"))
    )
    wp = W.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("end").over(wp.rowsBetween(W.unboundedPreceding, -1))
    iv = (
        dup.withColumn(
            "_new", (F.col("pos") > F.coalesce(prev_end, F.lit(-1))).cast("bigint")
        )
        .withColumn("island", F.sum("_new").over(wp))
        .groupBy("doc_id", "island")
        .agg(F.min("pos").alias("s"), F.max("end").alias("e"))
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e")).alias("_ivs"))
    )
    ivs = F.coalesce(
        F.col("_ivs"), F.array().cast("array<struct<s:bigint,e:bigint>>")
    )
    kept = F.filter(
        F.col("_toks"),
        lambda x, i: ~F.exists(ivs, lambda v: (i >= v["s"]) & (i <= v["e"])),
    )
    return (
        toks.join(iv, "doc_id", "left")
        .select(
            "doc_id",
            F.concat_ws(" ", kept).alias("clean_text"),
            F.size("_toks").cast("bigint").alias("n_tokens"),
            (F.size("_toks") - F.size(kept)).cast("bigint").alias("n_removed"),
        )
    )


def cross_corpus_overlap(
    train: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Contamination pairs: training docs overlapping an eval set.

    For every (train doc, eval doc) pair with word-n-gram Jaccard >=
    threshold, emit (train_id, eval_id, jaccard) — the decontamination
    primitive for pre-training corpora (find and drop training docs
    that leak benchmark content).

    Scale shape: the eval set is tiny relative to the corpus, so its
    exploded shingle set is BROADCAST — the candidate join is one
    map-side pass over the training corpus's shingles (no corpus
    shuffle); only matching (train, eval) shingle hits shuffle into
    the pair aggregation, and per-doc set sizes join in after the
    pair counts are already small.
    """
    t_sh = shingle_sets(train, text_col, id_col, n)
    e_sh = shingle_sets(eval_set, text_col, id_col, n)
    t_sizes = t_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("t_n"))
    e_sizes = e_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("e_n"))
    shared = (
        t_sh.alias("t")
        .join(
            F.broadcast(e_sh.alias("e")),
            F.col("t.shingle") == F.col("e.shingle"),
        )
        .groupBy(
            F.col("t.doc_id").alias("train_id"), F.col("e.doc_id").alias("eval_id")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(t_sizes.alias("ts"), F.col("train_id") == F.col("ts.doc_id"))
        .join(F.broadcast(e_sizes.alias("es")), F.col("eval_id") == F.col("es.doc_id"))
        .select(
            "train_id",
            "eval_id",
            (
                F.col("shared").cast("double")
                / (F.col("t_n") + F.col("e_n") - F.col("shared"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _bloom_positions(shingle_col, num_hashes: int, m_bits: int):
    """array<long> of ``num_hashes`` bit positions for one shingle —
    the classic k-salted-hash Bloom mapping, computed ENTIRELY
    JVM-side (xxhash64 + pmod inside whole-stage codegen); Python only
    ever tests bits."""
    return F.array(*[
        F.pmod(F.xxhash64(F.lit(1000 + i), shingle_col), F.lit(m_bits))
        for i in range(num_hashes)
    ])


_BLOOM_BITSET_CACHE: dict = {}


def bloom_candidate_docs(
    train: DataFrame,
    eval_set: DataFrame,
    m_bits: int = 1 << 20,
    num_hashes: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    cache_key=None,
) -> DataFrame:
    """Train doc ids that MIGHT share a word-n-gram shingle with the
    eval set, tested against a broadcast BLOOM FILTER of the eval
    shingles (Bloom 1970) — the 100 TB prefilter for benchmark
    decontamination.

    Scale story: :func:`cross_corpus_overlap` broadcasts the eval
    side's exploded SHINGLE STRINGS; fine for one benchmark, but a
    real decontamination pass screens against many benchmarks at once
    and the string set grows into gigabytes. The Bloom bitset is
    ``m_bits/8`` bytes FLAT (128 KiB at the default) regardless of
    shingle length, with zero false negatives — so it can prune the
    corpus down to candidate docs before any join runs, and only the
    candidates (a vanishing fraction) enter the exact-overlap
    verification. False positives (rate ~(1-e^{-kn/m})^k; ~1% at 10
    bits/shingle, k=7) cost only wasted verification work, never a
    wrong answer.

    Plan shape: shingle -> k bit positions via salted xxhash64 + pmod
    (JVM-side, whole-stage codegen); the eval side's set bits are ONE
    driver collect bounded by m_bits values (the same order as the
    bitset itself); membership is a vectorized Arrow-batched
    pandas_udf AND-of-bits against the numpy bitset broadcast once per
    executor; a doc survives iff ANY of its shingles hits. One narrow
    aggregation per train doc — no train/eval join of any kind before
    the prune.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    spark = train.sparkSession
    # the bitset is the build-once artifact of a decontamination pass
    # (the benchmark set is fixed per corpus version) — memoized per
    # cache_key like pq_train / ivf_layout_cached so repeated serving
    # calls skip the eval-side scan + position collect
    key = (cache_key, m_bits, num_hashes, n) if cache_key is not None else None
    bc = _BLOOM_BITSET_CACHE.get(key) if key is not None else None
    if bc is None:
        e_pos = (
            shingle_sets(eval_set, text_col, id_col, n)
            .select(F.explode(_bloom_positions(F.col("shingle"), num_hashes, m_bits)).alias("p"))
            .distinct()
        )
        bitset = np.zeros(m_bits // 8 + 1, dtype=np.uint8)
        pos = np.array([r["p"] for r in e_pos.collect()], dtype=np.int64)
        if pos.size:
            np.bitwise_or.at(bitset, pos // 8, np.uint8(1) << (pos % 8).astype(np.uint8))
        bc = spark.sparkContext.broadcast(bitset)
        if key is not None:
            _BLOOM_BITSET_CACHE[key] = bc

    @pandas_udf("boolean")
    def _hits(positions: pd.Series) -> pd.Series:
        if len(positions) == 0:
            return pd.Series([], dtype=bool)
        bs = bc.value
        P = np.stack(positions.to_numpy())  # (rows, k)
        hit = (bs[P // 8] & (np.uint8(1) << (P % 8).astype(np.uint8))) != 0
        return pd.Series(hit.all(axis=1))

    t_sh = shingle_sets(train, text_col, id_col, n)
    return (
        t_sh.select(
            "doc_id",
            _hits(_bloom_positions(F.col("shingle"), num_hashes, m_bits)).alias("_hit"),
        )
        .groupBy("doc_id")
        .agg(F.max("_hit").alias("_any"))
        .filter(F.col("_any"))
        .select("doc_id")
    )


def cross_corpus_overlap_bloom(
    train: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.5,
    m_bits: int = 1 << 20,
    num_hashes: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    cache_key=None,
) -> DataFrame:
    """:func:`cross_corpus_overlap` behind the Bloom prefilter —
    BIT-IDENTICAL output (same exact Jaccard over full shingle sets
    decides membership; the Bloom has no false negatives, and a train
    doc with no shingle in the eval set can never reach a positive
    threshold, so pruning the non-candidates changes nothing), with
    the training-corpus side reduced to candidate docs before the
    overlap join runs. Audited by queries/pipeline.py
    corpus_decontaminate_bloom under the SAME full SQL oracle as the
    broadcast-join path."""
    cand = bloom_candidate_docs(
        train, eval_set, m_bits, num_hashes, text_col, id_col, n,
        cache_key=cache_key,
    )
    pruned = train.join(
        cand.withColumnRenamed("doc_id", "_cid"),
        F.col(id_col) == F.col("_cid"),
        "leftsemi",
    )
    return cross_corpus_overlap(pruned, eval_set, threshold, text_col, id_col, n)


def dup_span_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
    drop_frac: float = 0.3,
) -> DataFrame:
    """Per-doc duplicated-span profile (exact-substring dedup signal).

    A SPAN is one word-n-gram occurrence; a span is DUPLICATED when its
    n-gram appears in >= ``min_docs`` distinct documents corpus-wide.
    For every input doc emit (doc_id, n_spans, n_dup_spans, dup_frac,
    keep) where keep = dup_frac < ``drop_frac`` — the "how much of this
    document is boilerplate that exists elsewhere" filter (exact
    n-gram-match dedup a la training-data substring dedup; pairwise
    Jaccard ops here catch whole-doc twins, this catches the long tail
    of shared passages below any pairwise threshold).

    Scale shape (100 TB): ONE pass over the exploded grams and three
    key-partitioned shuffles — (1) span occurrences partial-agg to
    (ngram, doc_id), (2) that reduced set re-keyed on ngram, where a
    count over the ngram window attaches each n-gram's document
    frequency in place (no second gram pipeline: a groupBy+join
    formulation of the df-flag recomputes tokenize/explode/shuffle
    from the scan — measured 1.7x slower at sf0.1 because exchange
    reuse does not survive the join's pushed null filters), (3) the
    per-doc rollup to doc_id. A boilerplate-hot n-gram makes one
    straggler group in (2), same as any agg keyed on ngram;
    WindowExec's group buffer spills, so degenerate corpora degrade
    to disk, not OOM — and a corpus that hot is exact-dup territory
    first. n-grams shuffle as strings for oracle-exactness; at 100 TB
    key on xxhash64(ngram) instead (64-bit keys, collision odds
    ~n^2 / 2^64 merge two n-grams' doc counts, which can only
    over-count dup flags).
    """
    from pyspark.sql import Window as W

    toks = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks"))
    # word_shingles assumes size >= n (its index arithmetic walks off
    # the array below that); guard short docs to "no spans".
    grams = toks.select(
        "doc_id",
        F.explode(
            F.when(F.size("_toks") >= n, word_shingles(F.col("_toks"), n))
            .otherwise(F.array().cast("array<string>"))
        ).alias("ngram"),
    )
    occ = grams.groupBy("ngram", "doc_id").agg(F.count(F.lit(1)).alias("occ"))
    # rows per ngram group == its document frequency (occ is one row
    # per (ngram, doc)), so the window count IS the df-flag input.
    flagged = occ.withColumn(
        "_n_docs", F.count(F.lit(1)).over(W.partitionBy("ngram"))
    )
    per = flagged.groupBy("doc_id").agg(
        F.sum("occ").alias("n_spans"),
        F.sum(
            F.when(F.col("_n_docs") >= min_docs, F.col("occ")).otherwise(F.lit(0))
        ).alias("n_dup_spans"),
    )
    out = (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0).cast("bigint")).alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0).cast("bigint")).alias("n_dup_spans"),
        )
    )
    dup_frac = F.when(F.col("n_spans") == 0, F.lit(0.0)).otherwise(
        F.col("n_dup_spans").cast("double") / F.col("n_spans").cast("double")
    )
    return out.select(
        "doc_id",
        "n_spans",
        "n_dup_spans",
        dup_frac.alias("dup_frac"),
        (dup_frac < F.lit(drop_frac)).alias("keep"),
    )


def dup_span_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    drop_coverage: float = 0.5,
) -> DataFrame:
    """Per-doc TOKEN COVERAGE of duplicated spans — the fraction of a
    document's tokens lying inside at least one word-n-gram that also
    occurs in another document (the exact-substring dedup removal
    metric; :func:`dup_span_profile` counts duplicated span
    occurrences, this measures how much TEXT they cover once overlaps
    merge, which is what span REMOVAL would actually delete).

    Emits (doc_id, n_tokens, n_covered, coverage, keep) with
    keep = coverage < ``drop_coverage``. All-integer interval
    arithmetic -> bit-identical across engines.

    Scale shape (100 TB): one gram pipeline with positions, then three
    window passes over key-partitioned shuffles — (1) duplicated-ness
    per occurrence via min!=max of doc_id over the ngram window
    (equivalent to distinct-docs >= 2, avoids the unsupported
    count-distinct-over-window AND a second gram pipeline), (2)
    gaps-and-islands over (doc, pos) to merge overlapping spans
    (running max of interval ends, island id = running sum of gap
    flags), (3) island extents summed per doc. Hot boilerplate
    n-grams behave as in dup_span_profile (spilling straggler, not
    OOM).
    """
    from pyspark.sql import Window as W

    toks = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks"))
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.when(F.size("_toks") >= n, word_shingles(F.col("_toks"), n))
            .otherwise(F.array().cast("array<string>"))
        ).alias("pos", "ngram"),
    )
    wg = W.partitionBy("ngram")
    dup = (
        grams.withColumn("_mn", F.min("doc_id").over(wg))
        .withColumn("_mx", F.max("doc_id").over(wg))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("doc_id", "pos", (F.col("pos") + F.lit(n - 1)).alias("end"))
    )
    wp = W.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("end").over(wp.rowsBetween(W.unboundedPreceding, -1))
    islands = (
        dup.withColumn(
            "_new", (F.col("pos") > F.coalesce(prev_end, F.lit(-1))).cast("bigint")
        )
        .withColumn("island", F.sum("_new").over(wp))
        .groupBy("doc_id", "island")
        .agg((F.max("end") - F.min("pos") + F.lit(1)).alias("_len"))
        .groupBy("doc_id")
        .agg(F.sum("_len").alias("n_covered"))
    )
    out = (
        df.select(
            F.col(id_col).alias("doc_id"),
            token_count(text_col).alias("n_tokens"),
        )
        .join(islands, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_covered", F.lit(0).cast("bigint")).alias("n_covered"),
        )
    )
    coverage = F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
        F.col("n_covered").cast("double") / F.col("n_tokens").cast("double")
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "n_covered",
        coverage.alias("coverage"),
        (coverage < F.lit(drop_coverage)).alias("keep"),
    )


def source_overlap_matrix(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    n: int = 3,
) -> DataFrame:
    """Pairwise word-n-gram Jaccard between every pair of SOURCES —
    the data-mixing diagnostic (which corpora in the mixture overlap,
    and how much) run before weights are assigned.

    Shape — ONE pass over the corpus: distinct (source, shingle) ->
    one shuffle keyed on the shingle -> per-shingle sorted source set
    (bounded by the number of sources, a catalog-sized dimension) ->
    map-side expansion of every ordered pair INCLUDING the self-pair
    (x, x) per member -> one count agg. The self-pair rows make the
    per-source shingle-set sizes fall out of the same aggregate
    ((a, a) count = |shingles of a|), so the corpus is scanned and
    shingled exactly once — no second sizes branch re-reading it.
    Nothing is ever corpus-quadratic: candidate work is keyed by
    shingle like ngram_jaccard_pairs, but the group key space is
    sources, so the aggregate output is a tiny C(n,2)+n matrix at any
    corpus size. The sizes are then attached by two WINDOW maxes over
    that matrix rather than self-joins: a filtered self-join would
    push its filters below the aggregate's exchange and defeat
    exchange reuse — the corpus would be scanned and shingled once
    per consumer (measured: 3 scans in the join formulation, 1 here).
    """
    from pyspark.sql import Window as W

    toks = df.select(F.col(source_col).alias("source"), tokens(text_col).alias("_toks"))
    sh = (
        toks.select("source", F.explode(word_shingles(F.col("_toks"), n)).alias("shingle"))
        .distinct()
    )
    srcs = sh.groupBy("shingle").agg(F.sort_array(F.collect_set("source")).alias("_srcs"))
    pairs = srcs.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("_srcs"),
                    lambda x, i: F.transform(
                        F.slice(F.col("_srcs"), i + F.lit(1), F.size(F.col("_srcs"))),
                        lambda y: F.struct(x.alias("src_a"), y.alias("src_b")),
                    ),
                )
            )
        ).alias("_p")
    ).select("_p.src_a", "_p.src_b")
    counts = pairs.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("shared")
    )
    self_count = F.max(
        F.when(F.col("src_a") == F.col("src_b"), F.col("shared"))
    )
    sized = counts.select(
        "src_a",
        "src_b",
        "shared",
        self_count.over(W.partitionBy("src_a")).alias("n_a"),
        self_count.over(W.partitionBy("src_b")).alias("n_b"),
    )
    return sized.filter(F.col("src_a") != F.col("src_b")).select(
        "src_a",
        "src_b",
        "shared",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        (
            F.col("shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double")
        ).alias("jaccard"),
    )
