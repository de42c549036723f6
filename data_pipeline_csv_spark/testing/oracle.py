"""Local replica of the driver's DuckDB-oracle correctness check.

Runs a registered Spark query and its oracle SQL side-by-side on the
same parquet tables and compares row count, column-name set, and the
order-insensitive multiset of normalized row values. Stricter than any
plausible driver hash (exact cell equality, floats compared by bits),
so passing here means passing the driver gate.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from ..sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    """Normalize a cell to a canonical hashable token."""
    if v is None:
        return "\0NULL"
    if isinstance(v, Decimal):
        # strip scale: Decimal('1.50') and Decimal('1.5000') are the same value
        return f"dec:{v.normalize()}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v.hex()}"  # bit-exact
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _dt.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return f"bin:{bytes(v).hex()}"
    return f"s:{v}"


def _rows_to_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(_norm_cell(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def compare_query(spark, sf_dir: str, fn, oracle_sql: str, con=None) -> dict:
    """Return a report dict; report['ok'] is the verdict."""
    own_con = con is None
    con = con or duck_connection(sf_dir)
    try:
        sdf = fn(spark, sf_dir)
        s_cols = list(sdf.columns)
        s_rows = [tuple(r) for r in sdf.collect()]
        res = con.execute(oracle_sql)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        if own_con:
            con.close()

    report = {
        "ok": False,
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
        "mismatches": [],
    }
    if sorted(s_cols) != sorted(d_cols):
        report["mismatches"].append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return report
    if len(s_rows) != len(d_rows):
        report["mismatches"].append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    sm = _rows_to_multiset(s_rows, s_cols)
    dm = _rows_to_multiset(d_rows, d_cols)
    if sm != dm:
        only_s = [k for k in sm if sm[k] != dm.get(k, 0)][:5]
        only_d = [k for k in dm if dm[k] != sm.get(k, 0)][:5]
        report["mismatches"].append(f"value multiset differs; sample spark-side={only_s} duck-side={only_d}")
    report["ok"] = not report["mismatches"]
    return report
