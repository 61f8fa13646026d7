"""Advanced relational shapes (TPC-H Q7/Q14/Q15/Q17/Q18/Q19/Q22-like),
adapted to the fixture star schema: correlated aggregate subqueries,
IN + HAVING, scalar subqueries, disjunctive pushdown, CASE-ratio
aggregates, NOT EXISTS with an average subquery.

Spark-first notes: correlated subqueries are expressed as join-against-
aggregate (what Catalyst decorrelates them to anyway — explicit form
keeps the shuffle strategy visible); scalar subqueries via crossJoin of
a 1-row aggregate (broadcast).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from unity_to_bigquery_spark.catalog import load_table
from unity_to_bigquery_spark.functions.canonical import dsum, sql_dsum
from unity_to_bigquery_spark.registry import query

_SQL_REV = "l_extendedprice * (1 - l_discount)"


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q07_volume_shipping",
    oracle=f"""
    SELECT n_name, year(o_orderdate) AS o_year, {sql_dsum(_SQL_REV)} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2')
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name, year(o_orderdate)
    """,
    doc="TPC-H Q7 shape — nation-filtered revenue by year.",
    tags=("join", "aggregate"),
)
def q07_volume_shipping(spark, sf_dir):
    li, orders, cust, nation = (
        load_table(spark, sf_dir, t) for t in ("lineitem", "orders", "customer", "nation")
    )
    orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    nation = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(_rev()).alias("revenue"))
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT
      CAST(SUM(CASE WHEN p_type = 'PROMO'
               THEN CAST(FLOOR({_SQL_REV} * 10000.0 + 0.5) AS BIGINT) ELSE 0 END) AS DOUBLE)
        / 10000.0 AS promo_revenue,
      {sql_dsum(_SQL_REV)} AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape — conditional (CASE) aggregate ratio components.",
    tags=("join", "aggregate", "conditional"),
)
def q14_promo_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    scaled = F.floor(_rev() * 10000.0 + 0.5).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", scaled).otherwise(F.lit(0))).cast(
                    "double"
                )
                / 10000.0
            ).alias("promo_revenue"),
            dsum(_rev()).alias("total_revenue"),
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH srev AS (
      SELECT l_suppkey, {sql_dsum(_SQL_REV)} AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN srev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM srev)
    """,
    doc="TPC-H Q15 shape — scalar subquery against a derived aggregate.",
    tags=("join", "subquery"),
)
def q15_top_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    srev = li.groupBy("l_suppkey").agg(dsum(_rev()).alias("total_rev"))
    max_rev = srev.agg(F.max("total_rev").alias("__max_rev"))
    return (
        supp.join(srev, supp.s_suppkey == srev.l_suppkey)
        .join(F.broadcast(max_rev), F.col("total_rev") == F.col("__max_rev"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q17_small_quantity_parts",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice')} AS total_price, COUNT(*) AS n
    FROM lineitem JOIN (
      SELECT l_partkey AS pk, AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) pa ON l_partkey = pk
    WHERE l_quantity < 0.5 * avg_qty
    """,
    doc=(
        "TPC-H Q17 shape — correlated aggregate subquery decorrelated to "
        "a self-join against per-key averages."
    ),
    tags=("join", "subquery", "aggregate"),
)
def q17_small_quantity_parts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # avg_qty compares only (no output) → raw avg is safe: both engines
    # compute the same doubles and the < predicate sees identical values
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(pa, li.l_partkey == pa.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(dsum("l_extendedprice").alias("total_price"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, {sql_dsum('l_quantity')} AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
    )
    GROUP BY c_custkey, c_name, o_orderkey
    """,
    doc="TPC-H Q18 shape — IN over a HAVING aggregate (semi-join plan).",
    tags=("join", "subquery", "having"),
)
def q18_large_volume_customers(spark, sf_dir):
    cust, orders, li = (
        load_table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sq"))
        .filter(F.col("sq") > 300)
        .select("l_orderkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "__bk"), F.col("o_orderkey") == F.col("__bk"), "left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {sql_dsum(_SQL_REV)} AS revenue, COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
       OR (p_type  = 'PROMO'   AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
    doc="TPC-H Q19 shape — OR-of-ANDs disjunctive join predicate.",
    tags=("join", "filter"),
)
def q19_disjunctive_predicates(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 40))
        | ((F.col("p_type") == "PROMO") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    return j.filter(cond).agg(
        dsum(_rev()).alias("revenue"), F.count(F.lit(1)).alias("n")
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT substring(c_name, 10, 2) AS cust_group,
           COUNT(*) AS n_custs,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS total_bal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY substring(c_name, 10, 2)
    """,
    doc=(
        "TPC-H Q22 shape — scalar AVG subquery + NOT EXISTS anti-join + "
        "substring grouping."
    ),
    tags=("join", "subquery", "anti"),
)
def q22_global_sales_opportunity(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 10, 2).alias("cust_group"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            (F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long")).cast("double") / 100).alias("total_bal"),
        )
    )
