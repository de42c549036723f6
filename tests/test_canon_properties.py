"""Property tests for the canonical fixed-point aggregate recipe.

The contract (queries/canon.py) is cross-engine DETERMINISM, not
decimal exactness. These pin the two halves:

1. The floor-quantized term never deviates from the true decimal
   value by a full quantum, so an aggregate of n terms is within
   n/scale of the mathematical sum (error bound, pure python).
2. Spark's evaluation of the canonical expression equals DuckDB's
   evaluation of the SQL twin bit-for-bit on random money inputs
   (the determinism property itself, end-to-end through both
   engines — stronger than the corpus parity sweep because
   hypothesis explores adversarial values).
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from data_pipeline_csv_spark.queries.canon import REV_SCALE, fp_sql

money = st.integers(min_value=1, max_value=9_999_999)  # cents: 0.01 .. 99,999.99
disc = st.integers(min_value=0, max_value=99)  # percent


@given(st.lists(st.tuples(money, disc), min_size=1, max_size=50))
def test_fixed_point_error_bounded_by_one_quantum_per_term(rows):
    fp_total = 0
    exact_total = Decimal(0)
    for cents, d in rows:
        price, discount = cents / 100.0, d / 100.0
        term = price * (1 - discount)
        fp_total += math.floor(term * REV_SCALE)
        exact_total += Decimal(cents) * (100 - d)  # term * REV_SCALE exactly
    err = abs(Decimal(fp_total) - exact_total)
    assert err <= len(rows)  # at most one quantum (1/REV_SCALE) per term


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(money, disc), min_size=1, max_size=30))
def test_spark_and_duckdb_agree_bitwise(spark, duck, rows):
    from pyspark.sql import functions as F

    from data_pipeline_csv_spark.queries.canon import fp_money

    df = spark.createDataFrame(
        [(c / 100.0, d / 100.0) for c, d in rows], "l_extendedprice double, l_discount double"
    )
    got = df.agg(
        fp_money(F.col("l_extendedprice") * (1 - F.col("l_discount")), REV_SCALE).alias("s")
    ).collect()[0]["s"]

    duck.execute("CREATE OR REPLACE TABLE t (l_extendedprice DOUBLE, l_discount DOUBLE)")
    duck.executemany("INSERT INTO t VALUES (?, ?)", [(c / 100.0, d / 100.0) for c, d in rows])
    want = duck.execute(
        f"SELECT {fp_sql('l_extendedprice * (1 - l_discount)', REV_SCALE)} FROM t"
    ).fetchone()[0]
    assert got == want and math.copysign(1, got) == math.copysign(1, want)
