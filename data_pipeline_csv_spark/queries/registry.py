"""Query registry: every engine operator the driver verifies.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) ->
DataFrame`` with (when SQL-expressible) an equivalent ANSI-SQL oracle
string that DuckDB runs on the same parquet tables. The driver compares
row-count + schema + order-insensitive value-hash, so:

- every computed column is aliased IDENTICALLY on both sides;
- floating-point aggregates are made bit-deterministic by summing
  DECIMAL-cast terms (exact, order-insensitive) instead of raw doubles
  (whose accumulation order differs between engines), then any derived
  ratio is a single IEEE double op on identical inputs;
- top-k queries always carry a total tie-break order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # None => not SQL-expressible; rows-only check
    doc: str = ""
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a query + its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tuple(tags))
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}
