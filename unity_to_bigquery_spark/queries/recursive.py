"""Recursive-CTE declared queries (Spark 4.1 WITH RECURSIVE — iterative
dataflow expressed declaratively, the SQL-frontend counterpart of the
hand-rolled loop in llm/clusters.py).

Scale note: each recursion round is a self-join + union planned like
any other Spark job; rounds = recursion depth, so this is for bounded-
depth hierarchies (org trees, BOM explosions, digit-chains). Unbounded
diameters stay with the explicit-loop operator (connected_components),
which controls persistence and convergence checks per round.
"""

from __future__ import annotations

from unity_to_bigquery_spark.catalog import register_views
from unity_to_bigquery_spark.registry import query


@query(
    "r_recursive_ancestors",
    oracle="""
    WITH RECURSIVE anc(custkey, anc_key, depth) AS (
      SELECT c_custkey, c_custkey // 10, 1
      FROM customer WHERE c_custkey % 17 = 0
      UNION ALL
      SELECT custkey, anc_key // 10, depth + 1
      FROM anc WHERE anc_key > 0
    )
    SELECT custkey,
           CAST(MAX(depth) AS BIGINT)   AS chain_len,
           CAST(SUM(anc_key) AS BIGINT) AS anc_checksum
    FROM anc GROUP BY custkey
    """,
    doc=(
        "Recursive CTE (Spark 4.1): walk the synthetic base-10 ancestor "
        "chain of each customer key to the root, returning chain length "
        "and an ancestor checksum — the declarative form of a bounded "
        "hierarchy traversal (org chart / BOM explosion shape)."
    ),
    tags=("recursive", "sql"),
)
def r_recursive_ancestors(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE anc(custkey, anc_key, depth) AS (
          SELECT c_custkey, c_custkey div 10, 1
          FROM customer WHERE c_custkey % 17 = 0
          UNION ALL
          SELECT custkey, anc_key div 10, depth + 1
          FROM anc WHERE anc_key > 0
        )
        SELECT custkey,
               CAST(MAX(depth) AS BIGINT)   AS chain_len,
               CAST(SUM(anc_key) AS BIGINT) AS anc_checksum
        FROM anc GROUP BY custkey
        """
    )
