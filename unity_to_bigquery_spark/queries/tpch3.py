"""Remaining hard TPC-H shapes (Q8/Q9/Q13/Q16/Q21 analogues, adapted to
the fixture schema): market-share ratio components, profit expressions
through a dim join, outer-join distribution (custdist), NOT-IN +
count-distinct, and the double-correlated EXISTS/NOT-EXISTS chain.
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
    "q08_market_share",
    oracle=f"""
    SELECT year(o_orderdate) AS o_year,
           CAST(SUM(CASE WHEN n_name = 'NATION_3'
                    THEN CAST(FLOOR({_SQL_REV} * 10000.0 + 0.5) AS BIGINT)
                    ELSE 0 END) AS DOUBLE) / 10000.0 AS nation_rev,
           {sql_dsum(_SQL_REV)} AS total_rev
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY year(o_orderdate)
    """,
    doc="TPC-H Q8 shape — market-share numerator/denominator per year.",
    tags=("join", "aggregate", "conditional"),
)
def q08_market_share(spark, sf_dir):
    li, orders, cust, nation, region = (
        load_table(spark, sf_dir, t)
        for t in ("lineitem", "orders", "customer", "nation", "region")
    )
    region = region.filter(F.col("r_name") == "ASIA")
    scaled = F.floor(_rev() * 10000.0 + 0.5).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("n_name") == "NATION_3", scaled).otherwise(F.lit(0))).cast("double")
                / 10000.0
            ).alias("nation_rev"),
            dsum(_rev()).alias("total_rev"),
        )
    )


@query(
    "q09_product_profit",
    oracle=f"""
    SELECT n_name, year(o_orderdate) AS o_year,
           {sql_dsum(f"{_SQL_REV} - 0.5 * p_retailprice * l_quantity", 2)} AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_type = 'PROMO'
    GROUP BY n_name, year(o_orderdate)
    """,
    doc="TPC-H Q9 shape — profit expression across part/supplier dims (cost proxy: retailprice).",
    tags=("join", "aggregate"),
)
def q09_product_profit(spark, sf_dir):
    li, part, supp, nation, orders = (
        load_table(spark, sf_dir, t)
        for t in ("lineitem", "part", "supplier", "nation", "orders")
    )
    part = part.filter(F.col("p_type") == "PROMO")
    profit = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit, scale=2).alias("profit"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
    doc="TPC-H Q13 shape — outer-join order-count distribution (two-level agg).",
    tags=("join", "outer", "aggregate"),
)
def q13_customer_distribution(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 14, 23, 36, 45, 49)
    GROUP BY p_brand, p_type
    """,
    doc="TPC-H Q16 shape — NOT IN + size IN-list + count distinct through a join.",
    tags=("join", "filter", "aggregate"),
)
def q16_supplier_part_counts(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").filter(
        ~F.col("p_brand").isin("Brand#1", "Brand#2")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 23, 36, 45, 49)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      WHERE l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
    ), any_supp AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    )
    SELECT s_name, COUNT(*) AS numwait FROM (
      SELECT la.l_orderkey, la.l_suppkey
      FROM late la
      WHERE EXISTS (SELECT 1 FROM any_supp o
                    WHERE o.l_orderkey = la.l_orderkey AND o.l_suppkey <> la.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM late l2
                        WHERE l2.l_orderkey = la.l_orderkey AND l2.l_suppkey <> la.l_suppkey)
    ) w
    JOIN supplier ON w.l_suppkey = s_suppkey
    GROUP BY s_name
    """,
    doc=(
        "TPC-H Q21 shape — the sole-blame pattern: per order, suppliers "
        "late where other suppliers participated but none of THEM were "
        "late (EXISTS + NOT EXISTS, both correlated on two columns)."
    ),
    tags=("join", "semi", "anti", "subquery"),
)
def q21_waiting_suppliers(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    late = (
        li.filter(F.col("l_shipdate") > F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    any_supp = li.select("l_orderkey", "l_suppkey").distinct()

    others = any_supp.select(
        F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk")
    )
    la = late.join(
        others,
        (late.l_orderkey == others.o_ok) & (late.l_suppkey != others.o_sk),
        "left_semi",
    )
    other_late = late.select(
        F.col("l_orderkey").alias("x_ok"), F.col("l_suppkey").alias("x_sk")
    )
    sole = la.join(
        other_late,
        (la.l_orderkey == other_late.x_ok) & (la.l_suppkey != other_late.x_sk),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(supp), sole.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
