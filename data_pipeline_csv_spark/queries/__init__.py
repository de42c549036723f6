"""Query library. Importing this package registers every query module."""

from . import dedup, events, multimodal, relational, similarity, text, windows  # noqa: F401  (registration side effect)
from .registry import REGISTRY, QuerySpec, oracles, queries

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracles"]
