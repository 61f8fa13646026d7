"""Approximate string joins (record linkage) and lateral-join queries.

Record linkage generalizes the reference's routing-dimension matching
(Unity_to_BigQuery.py:143-150 maps ids to display names by exact key);
real catalogs need fuzzy matching. The scale discipline: collapse to
DISTINCT names first (vocabulary-sized), block on a cheap key, and run
the quadratic edit-distance verify only inside blocks — never on the
row-level table.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from unity_to_bigquery_spark.catalog import load_table
from unity_to_bigquery_spark.registry import query


@query(
    "j_fuzzy_part_match",
    oracle="""
    WITH names AS (
      SELECT p_name, COUNT(*) AS n_rows
      FROM part GROUP BY p_name
    ), blocked AS (
      SELECT p_name, n_rows, string_split(p_name, ' ')[1] AS blk
      FROM names
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS lev,
           CAST(a.n_rows * b.n_rows AS BIGINT) AS n_row_pairs
    FROM blocked a JOIN blocked b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
    """,
    doc=(
        "Blocked fuzzy record linkage on part names: DISTINCT-name "
        "collapse first (vocab-sized), block on the first token, "
        "levenshtein verify only inside blocks, then fan the match "
        "count back out arithmetically (n_a x n_b row pairs) instead "
        "of joining row-level tables. Edit distance is exact integer "
        "semantics in both engines, so the whole approximate-join "
        "pipeline is oracle-checked."
    ),
    tags=("join", "linkage", "fuzzy"),
)
def j_fuzzy_part_match(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_rows"))
    blocked = names.withColumn("blk", F.split("p_name", " ").getItem(0))
    a, b = blocked.alias("a"), blocked.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            lev.alias("lev"),
            (F.col("a.n_rows") * F.col("b.n_rows")).cast("long").alias("n_row_pairs"),
        )
        .filter(F.col("lev").between(1, 3))
    )


@query(
    "j_lateral_topk_nation",
    oracle="""
    SELECT n.n_name, t.c_custkey, t.c_acctbal2
    FROM nation n, LATERAL (
      SELECT c_custkey,
             CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS c_acctbal2
      FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 3
    ) t
    """,
    doc=(
        "Correlated LATERAL subquery: top-3 customers by balance per "
        "nation, written as a lateral join in BOTH engines (Spark >=3.2 "
        "lateral subquery support; Catalyst decorrelates it into the "
        "same window/top-k shape as the composite top-k-per-group "
        "operator). Unique tiebreak on c_custkey."
    ),
    tags=("join", "lateral", "topk"),
)
def j_lateral_topk_nation(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    nation.createOrReplaceTempView("_lat_nation")
    customer.createOrReplaceTempView("_lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal2
        FROM _lat_nation n, LATERAL (
          SELECT c_custkey,
                 CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS c_acctbal2
          FROM _lat_customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 3
        ) t
        """
    )
