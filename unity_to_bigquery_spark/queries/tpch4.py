"""Final TPC-H shapes (Q2/Q11/Q12/Q20 analogues) completing all 22.

The fixtures have no ``partsupp`` table, so the supply relation is the
distinct ``(l_partkey, l_suppkey)`` pairs observed in ``lineitem`` with a
unit-price cost proxy — same adaptation ``q09_product_profit`` uses for
its cost expression. Shapes preserved:

- Q2: correlated scalar MIN subquery (min-cost supplier per part within a
  region); the oracle keeps the correlated form, Spark decorrelates to a
  window MIN — the classic decorrelation Catalyst itself performs.
- Q11: group + HAVING against a global scalar aggregate (fraction-of-total).
- Q12: CASE-sum priority classification per category over a date window.
- Q20: nested IN chain (suppliers → qualifying pairs → name-filtered parts).

Reference provenance: the reference has no joins/aggregations at all
(SURVEY.md §2A: relational work delegated to Postgres/BigQuery,
Unity_to_BigQuery.py:88-100 is its only filter+sort); these rows derive
from §2B's join/subquery inventory.

Scale notes (100 TB): the pair aggregation shuffles lineitem once on
(l_partkey, l_suppkey); every dimension side (supplier⋈nation⋈region,
part subset, the scalar total) is broadcast. Q2's window MIN reuses the
pair-agg partitioning (partkey ⊂ grouping keys → no extra exchange
needed by AQE; worst case one narrow shuffle on partkey).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from unity_to_bigquery_spark.catalog import load_table
from unity_to_bigquery_spark.registry import query

_SCALED_PRICE = "CAST(FLOOR(l_extendedprice * 10000.0 + 0.5) AS BIGINT)"


def _asia_suppliers(spark, sf_dir):
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )


@query(
    "q02_min_cost_supplier",
    oracle="""
    WITH pair AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    asia AS (
      SELECT s_suppkey, s_name, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    )
    SELECT p_partkey, p_name, s_name, n_name, unit_cost
    FROM pair
    JOIN asia ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 10
      AND unit_cost = (
        SELECT MIN(p2.unit_cost)
        FROM pair p2 JOIN asia a2 ON p2.l_suppkey = a2.s_suppkey
        WHERE p2.l_partkey = pair.l_partkey
      )
    """,
    doc=(
        "TPC-H Q2 shape — min-cost supplier per small part within a region; "
        "correlated scalar MIN subquery, decorrelated to a window MIN in Spark. "
        "unit_cost = MIN(l_extendedprice/l_quantity) is a per-row IEEE divide "
        "+ MIN: bit-identical across engines (no summation-order hazard)."
    ),
    tags=("join", "subquery", "window"),
)
def q02_min_cost_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    asia = _asia_suppliers(spark, sf_dir)
    j = pair.join(F.broadcast(asia), pair.l_suppkey == asia.s_suppkey)
    w = Window.partitionBy("l_partkey")
    return (
        j.withColumn("__min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("__min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
    )


@query(
    "q11_important_supply_value",
    oracle=f"""
    WITH v AS (
      SELECT l_partkey, SUM({_SCALED_PRICE}) AS ps
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, CAST(ps AS DOUBLE) / 10000.0 AS supply_value
    FROM v
    WHERE CAST(ps AS DOUBLE) > 0.001 * (SELECT CAST(SUM(ps) AS DOUBLE) FROM v)
    """,
    doc=(
        "TPC-H Q11 shape — per-part supply value for one nation's suppliers, "
        "HAVING > fraction of the global total (scalar subquery in HAVING). "
        "Fixed-point scaled longs on both sides; the fraction compare happens "
        "on exact-long-derived doubles."
    ),
    tags=("join", "subquery", "aggregate"),
)
def q11_important_supply_value(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_supp = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey).select(
        "s_suppkey"
    )
    scaled = F.floor(F.col("l_extendedprice") * 10000.0 + F.lit(0.5)).cast("long")
    v = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == nat_supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(scaled).alias("ps"))
    )
    total = v.agg(F.sum("ps").alias("__total"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("ps").cast("double") > 0.001 * F.col("__total").cast("double"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("ps").cast("double") / 10000.0).alias("supply_value"),
        )
    )


@query(
    "q12_priority_by_returnflag",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    doc=(
        "TPC-H Q12 shape — urgent/non-urgent CASE counts per category over a "
        "ship-date window (returnflag stands in for the absent l_shipmode)."
    ),
    tags=("join", "aggregate", "conditional"),
)
def q12_priority_by_returnflag(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q20_bulk_small_part_suppliers",
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 100
      )
    """,
    doc=(
        "TPC-H Q20 shape — nested IN chain: region suppliers having some "
        "name-filtered part shipped in bulk (> 100 units for one pair). "
        "l_quantity is integer-valued (1..50) so SUM(double) is exact and "
        "order-independent here."
    ),
    tags=("join", "subquery", "semi"),
)
def q20_bulk_small_part_suppliers(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part_ids = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    bulk_pairs = (
        li.join(F.broadcast(part_ids), li.l_partkey == part_ids.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("pair_qty"))
        .filter(F.col("pair_qty") > 100)
        .select("l_suppkey")
        .distinct()
    )
    return _asia_suppliers(spark, sf_dir).join(
        bulk_pairs, F.col("s_suppkey") == bulk_pairs.l_suppkey, "left_semi"
    )
