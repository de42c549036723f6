"""Shared 1-row audit scaffolding for approximate-operator queries.

Several registered queries audit an approximate operator against its
exact twin by emitting ONE row of scalar metrics (counts + a recall
flag). The metric inputs are single-row aggregates, and the canonical
composition is a chain of cross joins — the scalar-subquery pattern:
each side is a 1-row plan, so every cross join broadcasts one row and
the whole audit tail stays a driver-free, constant-size plan no
matter how large the audited operator's inputs are. This module
centralizes that chain so the sites (queries/dedup.py
_containment_audit, queries/similarity.py's clustered-neardup and
PQ-rerank audits) stop hand-rolling identical scaffolding; the
emitted plans are byte-identical to the previous inline versions
(pinned by tests/test_plans.py::test_containment_audit_plan_unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scalar_audit(*one_row_aggs: DataFrame) -> DataFrame:
    """Cross-join a sequence of single-row aggregates left to right.

    Each input MUST be a 1-row plan (a global aggregate); the result
    is the 1-row frame carrying every metric column, ready for the
    site's final ``select`` of named/derived audit columns.
    """
    out = one_row_aggs[0]
    for d in one_row_aggs[1:]:
        out = out.crossJoin(d)
    return out
