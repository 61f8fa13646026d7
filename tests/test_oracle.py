"""t2-style correctness: every registered query with an oracle is run on
Spark and DuckDB at sf0.001 and hash-compared (same check the driver
runs at sf0.01). Queries without an oracle get a rows-run smoke check.
"""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_match
from unity_to_bigquery_spark.registry import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = QUERIES[name]
    df = q.spark(spark, sf_dir)
    if q.oracle is None:
        # rows-only check (mirrors the driver's weaker path)
        n = df.count()
        assert n >= 0
        return
    assert_match(df, duck.sql(q.oracle), name=name)
