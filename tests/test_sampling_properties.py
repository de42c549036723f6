"""Property tests for the deterministic sampling/layout primitives.

Same philosophy as test_canon_properties.py: these primitives promise
cross-engine determinism via plain integer arithmetic, so hypothesis
drives the arithmetic contracts directly (pure python twin vs both
engines' SQL evaluation) and bulk numpy checks pin the structural
properties (injectivity, roundtrip) at scale.
"""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings, strategies as st

from data_pipeline_csv_spark.operators.sampling import (
    _C1,
    _C2,
    _C3,
    _M32,
    uniform_from_id_sql,
)


def _u_python(i: int) -> float:
    """Pure-python twin of uniform_from_id / uniform_from_id_sql."""
    h1 = (i * _C1) % _M32
    h2 = ((h1 + _C2) % _M32 * _C3) % _M32
    return (h2 + 0.5) / float(_M32)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_mixer_duckdb_matches_python(i):
    got = duckdb.sql(f"SELECT {uniform_from_id_sql(str(i))} AS u").fetchone()[0]
    assert got == _u_python(i)


def test_mixer_spark_matches_python_bulk(spark):
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.sampling import uniform_from_id

    ids = list(range(2000)) + [2**20 + 7, 2**30 - 1, 123_456_789]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    rows = df.select("id", uniform_from_id(F.col("id")).alias("u")).collect()
    for r in rows:
        assert r["u"] == _u_python(r["id"])


def test_mixer_injective_and_bounded_bulk():
    ids = np.arange(200_000, dtype=np.int64)
    h1 = (ids * _C1) % _M32
    h2 = ((h1 + _C2) % _M32 * _C3) % _M32
    u = (h2 + 0.5) / float(_M32)
    assert ((u > 0) & (u < 1)).all()
    # both mixing stages are bijections on Z_2^32 (odd multipliers),
    # so distinct ids below 2^32 map to distinct u
    assert len(np.unique(h2)) == len(ids)


def test_zorder_interleave_roundtrip_bulk(spark):
    """z = interleave(x, y) must be a bijection on 16-bit pairs: numpy
    de-interleave of Spark's z recovers (x, y) exactly."""
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.engine import PipelineEngine

    rng = np.random.RandomState(11)
    xs = rng.randint(0, 1 << 16, size=4000).astype(np.int64)
    ys = rng.randint(0, 1 << 16, size=4000).astype(np.int64)
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(xs, ys)], "x long, y long"
    )
    rows = df.select(
        "x", "y", PipelineEngine.zorder_value(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in rows:
        z = r["z"]
        x = y = 0
        for i in range(16):
            x |= ((z >> (2 * i + 1)) & 1) << i
            y |= ((z >> (2 * i)) & 1) << i
        assert (x, y) == (r["x"], r["y"])


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="abcdefghij ", min_size=1, max_size=40))
def test_simhash_hash60_duckdb_matches_spec(s):
    """The 60-bit md5-nibble hash must equal the reference computation
    (int of the first 15 hex chars) in DuckDB for arbitrary shingle
    text — the arithmetic the simhash oracles rely on."""
    import hashlib

    from data_pipeline_csv_spark.operators.dedup import md5_hash60_duckdb_sql

    want = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    got = duckdb.sql(
        f"SELECT {md5_hash60_duckdb_sql('s')} AS h FROM (SELECT ? AS s)",
        params=[s],
    ).fetchone()[0]
    assert got == want


def test_bloom_never_misses_shared_shingles(spark):
    """Bloom prefilter structural property, hypothesis-style over
    randomized corpora: for ANY train/eval pair, every train doc that
    shares at least one 3-gram shingle with the eval set MUST be among
    the Bloom candidates (zero false negatives — the property the
    bit-identical decontamination output rests on). Randomness is
    seeded numpy, bulk-checked in one Spark pass per round."""
    import numpy as np

    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.operators.dedup import (
        bloom_candidate_docs,
        shingle_sets,
    )

    rng = np.random.RandomState(11)
    for round_i in range(3):
        vocab = [f"w{round_i}x{v}" for v in range(80)]
        docs = []
        for d in range(60):
            n = rng.randint(5, 25)
            docs.append((d, " ".join(vocab[j] for j in rng.randint(0, 80, size=n))))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        train = df.filter(F.col("doc_id") >= 10)
        eval_set = df.filter(F.col("doc_id") < 10)
        # ground truth: train docs sharing >= 1 shingle with eval
        t_sh = shingle_sets(train)
        e_sh = shingle_sets(eval_set).select(F.col("shingle").alias("_es")).distinct()
        truth = {
            r.doc_id
            for r in t_sh.join(e_sh, t_sh.shingle == F.col("_es"), "leftsemi")
            .select("doc_id").distinct().collect()
        }
        # tiny bitset to force heavy false-positive pressure — false
        # NEGATIVES must still be structurally impossible
        cand = {
            r.doc_id
            for r in bloom_candidate_docs(train, eval_set, m_bits=1 << 10).collect()
        }
        assert truth <= cand, f"round {round_i}: missed {truth - cand}"


def test_shuffle_shards_is_a_permutation_bulk(spark):
    """shuffle_into_shards on an arbitrary id set is a bijection onto
    shard-local dense positions, and the induced global order is the
    mixer-key order (numpy replay) — no id lost, none duplicated, no
    position collision, for ids across the full supported domain."""
    import numpy as np

    from data_pipeline_csv_spark.operators.sampling import (
        _C1, _C2, _C3, _M32, shuffle_into_shards,
    )

    rng = np.random.RandomState(5)
    ids = np.unique(rng.randint(0, 3_000_000_000, size=2000, dtype=np.int64))
    df = spark.createDataFrame([(int(i),) for i in ids], "doc_id long")
    out = shuffle_into_shards(df, n_shards=8).collect()
    assert len(out) == len(ids)
    assert {r.doc_id for r in out} == set(ids.tolist())
    # numpy twin of the mixer
    h1 = (ids * _C1) % _M32
    u = (((h1 + _C2) % _M32 * _C3) % _M32 + 0.5) / float(_M32)
    shard = np.minimum(np.floor(u * 8), 7).astype(int)
    want = {}
    for sh in range(8):
        members = ids[shard == sh]
        order = members[np.lexsort((members, u[shard == sh]))]
        for pos, i in enumerate(order, start=1):
            want[int(i)] = (sh, pos)
    got = {r.doc_id: (r.shard, r.pos) for r in out}
    assert got == want
