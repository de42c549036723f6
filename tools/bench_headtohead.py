#!/usr/bin/env python
"""Single-node head-to-head: the reference's eager-pandas pipeline shape
vs this engine, on the SAME synthetic CSV at a size where the work is
real (default 5M rows, ~12 product-ish columns, ~350 MB).

The reference pipeline (reference src/ingest.py:16, src/transform.py:6,
flows/pipeline.py:34-43) is three pandas calls — ``read_csv`` ->
``dropna()`` -> count/len — executed eagerly in one process. That exact
semantics is re-expressed here with the same public pandas API (no
reference code imported) and timed against the Spark engine's parity
path (PipelineEngine.ingest -> clean -> count), which runs the SAME
logical pipeline as one lazy distributed plan.

Prints one JSON line:
  {"rows": N, "pandas_sec": ..., "spark_sec": ..., "speedup": ...}

Expected shape of the result (recorded in BASELINE.md): at the
reference's shipped size (2.2 MB) pandas wins on fixed overhead; at
real single-node sizes (hundreds of MB and beyond, still far below the
100 TB design point) the Spark pipeline's parallel CSV scan overtakes
single-threaded pandas.
"""

from __future__ import annotations

import csv
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_csv(path: str, rows: int) -> None:
    """Products-shaped CSV: 12 columns, deterministic content, a sparse
    nullable column so dropna does real work (the reference's shipped
    file nulls out an entire column, which drops every row — that
    degenerate case is preserved as a parity test, not benchmarked)."""
    cats = ["alpha", "beta", "gamma"]
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(
            ["id", "name", "price", "category", "in_stock", "qty", "rating",
             "vendor", "sku", "weight", "added", "note"]
        )
        for i in range(rows):
            w.writerow(
                [i, f"prod-{i}", round((i % 9973) * 0.37, 2), cats[i % 3],
                 i % 2 == 0, i % 100, (i % 50) / 10.0, f"v{i % 257}",
                 f"sku-{i:09d}", (i % 1000) / 7.0, f"2024-{1 + i % 12:02d}-01",
                 "" if i % 1000 == 0 else f"note-{i}"]
            )


def main() -> None:
    rows = int(os.environ.get("H2H_ROWS", "5000000"))
    workdir = os.environ.get("H2H_DIR", "/tmp/sg_h2h")
    os.makedirs(workdir, exist_ok=True)
    path = os.path.join(workdir, f"products_{rows}.csv")
    if not os.path.exists(path):
        gen_csv(path, rows)

    import pandas as pd

    t0 = time.perf_counter()
    pdf = pd.read_csv(path)          # reference src/ingest.py:16
    pdf = pdf.dropna()               # reference src/transform.py:6
    n_pandas = len(pdf)              # reference flows/pipeline.py count
    pandas_sec = time.perf_counter() - t0
    del pdf

    from data_pipeline_csv_spark.engine import PipelineEngine
    from data_pipeline_csv_spark.session import get_spark

    spark = get_spark(app_name="h2h")
    spark.sparkContext.setLogLevel("ERROR")
    eng = PipelineEngine(spark, os.path.join(workdir, "warehouse"))
    # warm the JVM/codegen on a small slice so the timed run measures
    # pipeline throughput, not one-time class loading (bench.py policy)
    small = os.path.join(workdir, "warm.csv")
    if not os.path.exists(small):
        gen_csv(small, 1000)
    eng.clean(eng.ingest(small)).count()

    t0 = time.perf_counter()
    n_spark = eng.clean(eng.ingest(path)).count()
    spark_sec = time.perf_counter() - t0

    assert n_spark == n_pandas, (n_spark, n_pandas)
    print(json.dumps({
        "rows": rows,
        "surviving": n_spark,
        "pandas_sec": round(pandas_sec, 3),
        "spark_sec": round(spark_sec, 3),
        "speedup": round(pandas_sec / spark_sec, 2),
    }))


if __name__ == "__main__":
    main()
