"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` exposes every
declared query from SURVEY.md §2B (one per implemented operator);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible query. Backed by
:mod:`unity_to_bigquery_spark.registry`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from unity_to_bigquery_spark.registry import all_queries  # noqa: E402

FLAGSHIP = "q01_pricing_summary"
_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()[FLAGSHIP].spark(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query; queries
    without an entry here get the driver's weaker rows-only check."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
