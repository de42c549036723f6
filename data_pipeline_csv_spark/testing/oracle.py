"""Local replica of the driver's DuckDB-oracle correctness check.

Faithful to the driver's comparison PATH, not just its verdict: the
driver fetches the oracle result via DuckDB's pandas bridge (where
``SUM(DECIMAL)`` / ``SUM(BIGINT)`` become float64) and the Spark result
via ``toPandas()`` (where decimals stay ``decimal.Decimal`` objects and
longs stay int64), then sorts/stringifies. Round 1 proved that a
``fetchall()``-based replica (which preserves DuckDB Decimals) passes
17 queries the driver fails — so this replica now:

- pulls the oracle frame with ``con.execute(sql).df()`` (pandas dtypes,
  exactly the driver's divergence surface);
- pulls the Spark frame with ``toPandas()``;
- canonicalizes with TYPE-SENSITIVE cell tokens: a ``Decimal`` and a
  float of equal value get DIFFERENT tokens (that is precisely the
  mismatch the driver's hash sees), ints unify across widths, floats
  compare by exact repr (round-trippable, so bit-exact), timestamps by
  isoformat;
- REFUSES array/ndarray cells: the driver's pandas canonicalizer
  raises ``unhashable type: 'list'`` on them, so this replica fails
  loudly instead of silently tolerating what the driver cannot hash.

Passing here now predicts passing the driver gate.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from ..sources.tables import TABLES


class DriverIncompatibleValue(ValueError):
    """A cell value the driver's canonicalizer would crash on."""


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    """Canonical hashable token per cell; type-sensitive like the driver.

    Token classes intentionally DIFFER between Decimal and float even at
    equal numeric value — the driver stringifies whatever object pandas
    hands it, so ``Decimal('5.2500000000')`` and ``5.25`` hash apart.
    """
    if v is None or v is pd.NaT:
        return "\0NULL"
    if isinstance(v, (list, tuple, np.ndarray)):
        raise DriverIncompatibleValue(
            f"array-typed cell {type(v).__name__} would crash the driver canonicalizer "
            "(unhashable type in pandas sort) — flatten the output column"
        )
    if isinstance(v, Decimal):
        return f"dec:{v}"  # scale-preserving, like str() in the driver
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "f:nan"
        return f"f:{f!r}"  # repr round-trips: equal tokens <=> equal bits
    if isinstance(v, _dt.datetime):  # covers pd.Timestamp
        # pandas stringifies midnight timestamps date-only, so the driver
        # treats DATE and midnight TIMESTAMP as equal — mirror that
        # (CORRECTNESS_r01: date_functions/events_daily_pivot passed with
        # Spark date vs DuckDB timestamp columns).
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0) and getattr(v, "nanosecond", 0) == 0:
            return f"d:{v.date().isoformat()}"
        return f"ts:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"bin:{bytes(v).hex()}"
    if isinstance(v, str):
        return f"s:{v}"
    # pandas NA / numpy nan disguised as object
    try:
        if pd.isna(v):
            return "\0NULL"
    except (TypeError, ValueError):
        pass
    return f"o:{type(v).__name__}:{v}"


def canon_multiset(pdf: pd.DataFrame) -> dict:
    """Column-name-sorted, row-order-insensitive token multiset."""
    pdf = pdf[sorted(pdf.columns)]
    out: dict = {}
    for row in pdf.itertuples(index=False, name=None):
        key = tuple(_norm_cell(v) for v in row)
        out[key] = out.get(key, 0) + 1
    return out


def compare_query(spark, sf_dir: str, fn, oracle_sql: str, con=None) -> dict:
    """Return a report dict; report['ok'] is the verdict."""
    own_con = con is None
    con = con or duck_connection(sf_dir)
    try:
        spdf = fn(spark, sf_dir).toPandas()
        dpdf = con.execute(oracle_sql).df()
    finally:
        if own_con:
            con.close()

    report = {
        "ok": False,
        "spark_rows": len(spdf),
        "duck_rows": len(dpdf),
        "spark_cols": sorted(spdf.columns),
        "duck_cols": sorted(dpdf.columns),
        "mismatches": [],
    }
    if sorted(spdf.columns) != sorted(dpdf.columns):
        report["mismatches"].append(
            f"columns differ: spark={sorted(spdf.columns)} duck={sorted(dpdf.columns)}"
        )
        return report
    if len(spdf) != len(dpdf):
        report["mismatches"].append(f"row count differs: spark={len(spdf)} duck={len(dpdf)}")
    try:
        sm = canon_multiset(spdf)
        dm = canon_multiset(dpdf)
    except DriverIncompatibleValue as e:
        report["mismatches"].append(f"driver-incompatible cell: {e}")
        return report
    if sm != dm:
        only_s = [k for k in sm if sm[k] != dm.get(k, 0)][:5]
        only_d = [k for k in dm if dm[k] != sm.get(k, 0)][:5]
        report["mismatches"].append(
            f"value multiset differs; sample spark-side={only_s} duck-side={only_d}"
        )
    report["ok"] = not report["mismatches"]
    return report


def smoke_rows_only(spark, sf_dir: str, fn) -> dict:
    """Rows-only check for oracle-less queries — STILL canonicalizes,
    because the driver canonicalizes even rows-only results (and crashes
    on array columns)."""
    pdf = fn(spark, sf_dir).toPandas()
    report = {"ok": False, "spark_rows": len(pdf), "mismatches": []}
    try:
        canon_multiset(pdf)
    except DriverIncompatibleValue as e:
        report["mismatches"].append(f"driver-incompatible cell: {e}")
        return report
    report["ok"] = True
    return report
