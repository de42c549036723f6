#!/usr/bin/env python
"""Optimization-round inner loop: time a subset of registry/headline
queries with EXACTLY the bench methodology (same session factory, same
warmup at sf0.001, same noop sink, min-of-3 + median) and optionally
dump .explain("formatted") to a file per query.

Usage:
  python tools/opt_probe.py q1_pricing_summary corpus_split_leakage_safe
  python tools/opt_probe.py --explain-dir plans/r14 --suffix before q5_local_supplier_volume
  python tools/opt_probe.py --iters 1 streaming_dedup_neardup

This is a developer tool; the round-over-round artifact stays bench.py
(unchanged methodology). Numbers printed here are comparable to
BENCH_DETAIL entries because the protocol is identical.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_csv_spark.queries import REGISTRY  # noqa: E402
from data_pipeline_csv_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="probe")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="opt_probe",
        driver_memory=os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
    )

    missing = [n for n in args.names if n not in REGISTRY]
    if missing:
        raise SystemExit(f"not registered: {missing}")

    warm_dir = "/root/testdata/sf0.001"
    if not args.no_warmup and os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in args.names:
            REGISTRY[name].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    out: dict[str, dict] = {}
    for name in args.names:
        fn = REGISTRY[name].fn
        samples = []
        for _ in range(args.iters):
            spark.sparkContext.setJobDescription(f"opt_probe:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
        out[name] = {
            "min": min(samples),
            "median": statistics.median(samples),
            "samples": samples,
        }
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
