"""Declared-query registry — the engine's testable surface.

Every capability row in SURVEY.md §2B is exposed as a named query: a
PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are SQL-expressible) an equivalent ANSI-SQL oracle string for
DuckDB. The driver hash-compares the two at sf0.01; `tests/test_oracle.py`
does the same locally at sf0.001.

Canonicalization contract for every registered query (FIXTURES.md §3):
- every output column explicitly aliased, identically on both sides;
- timestamps surfaced as formatted strings or DATE, never raw ns;
- DOUBLE aggregates rounded on both sides (sums→2dp, avgs→4dp,
  ratios→6dp) so cross-engine float-summation order can't flip a hash;
- DuckDB integer SUMs cast to BIGINT (DuckDB defaults to HUGEINT);
- any LIMIT/top-k carries a unique total-order tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, Query] = {}


def query(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a declared query under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import all query modules (side-effect registration) and return the registry."""
    from unity_to_bigquery_spark import queries  # noqa: F401  (triggers imports)

    return REGISTRY
