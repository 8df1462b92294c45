"""Query registry: every operator from SURVEY.md §2 exposed as a named
(spark, sf_dir) -> DataFrame program, with (where SQL-expressible) a
matching DuckDB oracle SQL string.

Importing this package populates the registry.
"""

from . import (  # noqa: F401  (imported for registration side effects)
    queries_reference,
    queries_relational,
    queries_llm,
    queries_events,
    queries_multimodal,
    queries_temporal,
)
from .registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
