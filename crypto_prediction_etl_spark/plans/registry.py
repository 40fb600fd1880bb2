"""Query catalog registry.

Every operator family from SURVEY.md §2 is exposed as a named query:
a Spark builder ``fn(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent DuckDB oracle SQL string over the same
parquet tables. The driver's correctness gate runs both and compares
row-count + schema + order-insensitive value hash.

Conventions (both sides MUST follow them identically):
- Alias every computed column; the compare is by column NAME.
- Round every float output: cross-engine float drift (different
  accumulation order) breaks value hashes, so each query picks a
  rounding grid several orders of magnitude above expected fp error
  (price-scale -> 2 decimals, ratios/percent -> 4-6 decimals).
- Cast timestamps to DATE or STRING in outputs (timezone-free compare).
- Deterministic LIMIT: always ORDER BY with a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every plan module so its @query decorators run."""
    from . import (  # noqa: F401
        dataprep_q,
        dedup,
        events_q,
        indicators_q,
        mart,
        multimodal_q,
        relational,
        relational_ext,
        similarity_q,
        streaming_q,
        text_q,
        textprep_q,
    )
