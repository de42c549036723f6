"""JSONL/parquet ingestion + join-strategy plan checks."""

from __future__ import annotations

import contextlib
import io
import json

import pytest
from pyspark.sql import functions as F

from data_pipeline_csv_spark.engine import PipelineEngine
from data_pipeline_csv_spark.sources.formats import read_jsonl, write_jsonl


def test_jsonl_roundtrip_and_dispatch(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    rows = [{"id": i, "text": f"doc {i}", "score": i * 0.5} for i in range(20)]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    eng = PipelineEngine(spark, str(tmp_path / "wh"))
    df = eng.ingest(str(p))
    assert df.count() == 20
    assert {f.name for f in df.schema.fields} == {"id", "text", "score"}
    out = tmp_path / "out_jsonl"
    write_jsonl(df, str(out))
    assert spark.read.json(str(out)).count() == 20


def test_jsonl_permissive_dead_letters(spark, tmp_path):
    p = tmp_path / "ragged.jsonl"
    p.write_text('{"id": 1, "v": "ok"}\nNOT JSON AT ALL\n{"id": 2, "v": "fine"}')
    df = read_jsonl(spark, str(p))
    rows = df.collect()
    assert len(rows) == 3  # malformed row kept as _corrupt_record, scan survives
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1 and "NOT JSON" in corrupt[0]["_corrupt_record"]


def test_jsonl_validates_suffix(spark, tmp_path):
    p = tmp_path / "data.txt"
    p.write_text("{}")
    with pytest.raises(ValueError, match="Unexpected file type"):
        read_jsonl(spark, str(p))
    with pytest.raises(FileNotFoundError):
        read_jsonl(spark, str(tmp_path / "missing.jsonl"))


def test_star_join_broadcasts_dims(spark, sf_dir):
    """q5-style star join: every dimension side must be a broadcast hash
    join — a shuffled dim join at 100 TB would be a planning bug."""
    from data_pipeline_csv_spark.queries import REGISTRY

    df = REGISTRY["q5_local_supplier_volume"].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "PushedFilters: [IsNotNull" in plan  # predicates reached the scans


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from data_pipeline_csv_spark.sources.formats import read_orc, write_orc

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = tmp_path / "orders_orc"
    write_orc(orders.select("o_orderkey", "o_orderstatus", "o_totalprice"), str(out))
    back = read_orc(spark, str(out))
    assert back.count() == orders.count()
    # filter must reach the ORC scan (pushed filters in the plan)
    plan = io.StringIO()
    with contextlib.redirect_stdout(plan):
        back.filter(F.col("o_orderstatus") == "F").explain("formatted")
    assert "PushedFilters: [" in plan.getvalue()
    assert "o_orderstatus" in plan.getvalue()
