"""Engine-portable canonical aggregates (the determinism contract).

Fixed-point BIGINT accumulation: the per-row term is computed in IEEE
double (bit-identical in any engine), quantized with ``floor(term *
10^k)`` (floor on identical doubles is identical), summed as exact
int64 (order-insensitive — no float accumulation-order divergence),
then converted with ONE int->double cast (an exact IEEE conversion for
any int64) and ONE divide by the power-of-ten scale (correctly rounded
on identical inputs). Every step is deterministic across engines, so
Spark and DuckDB produce bit-identical doubles.

Why not DECIMAL sums + a final CAST AS DOUBLE? Measured at sf0.01:
DuckDB's DECIMAL(38,10) -> DOUBLE conversion is up to 1 ulp off the
correctly-rounded double Spark's BigDecimal.doubleValue() produces
(147871209.4257 vs ...42569998), and the driver's stringified hash
sees every ulp. int64 -> double has no such ambiguity.

Scales are chosen to cover the column's true decimal width (TPC-H
money/discount/tax columns carry 2 decimals, so their products carry
4/6). NOTE the quantization is NOT always exact: the double product
can land one ulp below the true decimal value, and floor then loses
one quantum (measured on the 2-decimal money grid: ~22% of terms are
one low; e.g. 0.01 * 0.93 floors to 92/10^4, true value 93/10^4).
That is fine for the contract, which is DETERMINISM, not decimal
exactness: both engines compute the identical double, so the
identical floor — and the aggregate differs from the true decimal sum
by at most n_terms/scale, pinned by tests/test_canon_properties.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

REV_SCALE = 10_000        # price(2dp) * (1-disc)(2dp) -> 4 decimals
CHARGE_SCALE = 1_000_000  # * (1+tax)(2dp) -> 6 decimals
CENT_SCALE = 100          # 2dp money / quantity columns
VALUE_SCALE = 1_000_000   # events.value quantized at 1e-6

REV_TERM_SQL = "l_extendedprice * (1 - l_discount)"


def fp_sum(term: Column, scale: int) -> Column:
    """Exact int64 fixed-point sum of a double term."""
    return F.sum(F.floor(term * scale).cast("bigint"))


def fp_money(term: Column, scale: int) -> Column:
    """Canonical double money aggregate (engine-portable bit-for-bit)."""
    return fp_sum(term, scale).cast("double") / float(scale)


def fp_money_window(term: Column, scale: int, window) -> Column:
    """Windowed variant of :func:`fp_money`."""
    return (
        F.sum(F.floor(term * scale).cast("bigint")).over(window).cast("double")
        / float(scale)
    )


def fp_sql(expr: str, scale: int) -> str:
    """DuckDB twin of :func:`fp_money` (also valid as a window body)."""
    return f"CAST(SUM(CAST(floor(({expr}) * {scale}) AS BIGINT)) AS DOUBLE) / {scale}.0"


def rev_term() -> Column:
    """Per-row revenue term in IEEE double (pair of REV_TERM_SQL)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))
