"""Replica of the driver's t2 gate: every registered query vs its
DuckDB oracle at a small scale factor, exact-compared."""

import pytest

from data_pipeline_csv_spark.queries import REGISTRY
from data_pipeline_csv_spark.testing.oracle import compare_query, duck_connection

NAMES = sorted(REGISTRY)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = REGISTRY[name]
    if spec.oracle is None:
        df = spec.fn(spark, sf_dir)
        assert df.count() >= 0  # rows-only smoke for non-SQL-expressible ops
        return
    report = compare_query(spark, sf_dir, spec.fn, spec.oracle, con=duck)
    assert report["ok"], f"{name}: {report}"
