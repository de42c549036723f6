#!/usr/bin/env python
"""Local pre-submit gate: run EVERY registered query against its DuckDB
oracle at sf0.01 through the driver-faithful comparison path
(testing/oracle.py). Exit nonzero on any mismatch.

Usage: python tools/verify_queries.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_csv_spark.queries import REGISTRY  # noqa: E402
from data_pipeline_csv_spark.session import get_spark  # noqa: E402
from data_pipeline_csv_spark.testing.oracle import (  # noqa: E402
    compare_query,
    duck_connection,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="verify")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    fails: list[str] = []
    t0 = time.time()
    for i, (name, spec) in enumerate(REGISTRY.items()):
        if spec.oracle is None:
            n = spec.fn(spark, sf_dir).count()
            print(f"[{i + 1:2}/{len(REGISTRY)}] rows-only {name}: {n}")
            continue
        rep = compare_query(spark, sf_dir, spec.fn, spec.oracle, con=con)
        tag = "ok " if rep["ok"] else "FAIL"
        print(f"[{i + 1:2}/{len(REGISTRY)}] {tag} {name}" + ("" if rep["ok"] else f" {rep['mismatches']}"))
        if not rep["ok"]:
            fails.append(name)
    print(f"\n{len(REGISTRY) - len(fails)}/{len(REGISTRY)} pass in {time.time() - t0:.0f}s")
    if fails:
        print("FAILING:", ", ".join(fails))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
