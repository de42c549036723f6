"""Query library. Importing this package registers every query module."""

from . import advanced, dedup, events, multimodal, relational, similarity, sketches, streaming_queries, text, tpch_extra, windows  # noqa: F401  (registration side effect)
from .registry import REGISTRY, QuerySpec, oracles, queries

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracles"]
