"""Join-family declared queries (SURVEY.md §2B Joins).

Covers: inner/left/right/full outer, semi, anti, cross, theta (non-equi),
as-of (union carry-forward operator), and equi+range interval joins.
Broadcast variants live in tpch.py (q05) and events.py (routing).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from unity_to_bigquery_spark.catalog import load_table
from unity_to_bigquery_spark.functions.canonical import dsum, sql_dsum
from unity_to_bigquery_spark.operators.joins import asof_join, interval_join
from unity_to_bigquery_spark.registry import query


@query(
    "j_inner_segment_revenue",
    oracle=f"""
    SELECT c_mktsegment, COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Inner equi-join (shuffle hash/SMJ — Catalyst picks) + agg.",
    tags=("join",),
)
def j_inner_segment_revenue(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total"))
    )


@query(
    "j_left_outer_order_counts",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 400000
    GROUP BY c_custkey
    """,
    doc="Left outer join keeping customers with zero matches.",
    tags=("join", "outer"),
)
def j_left_outer_order_counts(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_totalprice > 400000),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_big_orders"))
    )


@query(
    "j_right_outer_parts",
    oracle="""
    SELECT p_brand, COUNT(l_orderkey) AS n_lineitems
    FROM (SELECT * FROM lineitem WHERE l_quantity >= 49) li
    RIGHT JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="Right outer join: all parts kept, sparse lineitem matches.",
    tags=("join", "outer"),
)
def j_right_outer_parts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey, "right")
        .groupBy("p_brand")
        .agg(F.count("l_orderkey").alias("n_lineitems"))
    )


@query(
    "j_full_outer_rich_vs_big",
    oracle="""
    SELECT COALESCE(c.c_custkey, o.o_custkey)       AS custkey,
           COUNT(c.c_custkey)                       AS has_rich,
           COUNT(o.o_orderkey)                      AS n_big
    FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
    FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
      ON c.c_custkey = o.o_custkey
    GROUP BY COALESCE(c.c_custkey, o.o_custkey)
    """,
    doc="Full outer join with null-producing rows on both sides.",
    tags=("join", "outer"),
)
def j_full_outer_rich_vs_big(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer")
        .groupBy(F.coalesce(cust.c_custkey, orders.o_custkey).alias("custkey"))
        .agg(
            F.count(cust.c_custkey).alias("has_rich"),
            F.count(orders.o_orderkey).alias("n_big"),
        )
    )


@query(
    "j_semi_urgent_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    doc="Left semi join (EXISTS): customers with ≥1 urgent order.",
    tags=("join", "semi"),
)
def j_semi_urgent_customers(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "j_anti_parts_never_ordered",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_unsold
    FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    GROUP BY p_brand
    """,
    doc="Left anti join (NOT EXISTS): parts with no lineitem.",
    tags=("join", "anti"),
)
def j_anti_parts_never_ordered(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_unsold"))
    )


@query(
    "j_cross_region_segment",
    oracle="""
    SELECT r_name, seg.c_mktsegment,
           r_name || '/' || seg.c_mktsegment AS bucket
    FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
    """,
    doc="Cross join of two bounded dims (mirrors reference fan-out A14).",
    tags=("join", "cross"),
)
def j_cross_region_segment(spark, sf_dir):
    region = load_table(spark, sf_dir, "region")
    seg = load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()
    return region.crossJoin(seg).select(
        "r_name",
        "c_mktsegment",
        F.concat_ws("/", "r_name", "c_mktsegment").alias("bucket"),
    )


@query(
    "j_theta_supplier_pecking",
    oracle="""
    SELECT a.s_suppkey, COUNT(b.s_suppkey) AS n_richer
    FROM supplier a LEFT JOIN supplier b ON b.s_acctbal > a.s_acctbal
    GROUP BY a.s_suppkey
    """,
    doc="Theta (non-equi) self-join: richer-supplier counts (BNLJ).",
    tags=("join", "theta"),
)
def j_theta_supplier_pecking(spark, sf_dir):
    a = load_table(spark, sf_dir, "supplier").alias("a")
    b = load_table(spark, sf_dir, "supplier").alias("b")
    return (
        a.join(b, F.col("b.s_acctbal") > F.col("a.s_acctbal"), "left")
        .groupBy(F.col("a.s_suppkey").alias("s_suppkey"))
        .agg(F.count(F.col("b.s_suppkey")).alias("n_richer"))
    )


@query(
    "j_asof_last_order_before_event",
    oracle="""
    SELECT e.event_id, e.user_id, strftime(o.o_orderdate, '%Y-%m-%d') AS last_orderdate
    FROM events e
    ASOF JOIN orders o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    doc=(
        "As-of join via union carry-forward (one shuffle, no blowup): "
        "latest order at or before each event. Generalizes the reference "
        "checkpoint lookup (Unity_to_BigQuery.py:88-100)."
    ),
    tags=("join", "asof", "composite"),
)
def j_asof_last_order_before_event(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    joined = asof_join(
        events,
        orders,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderdate"],
        how="inner",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_orderdate"),
    )


@query(
    "j_interval_ships_within_30d",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_prompt
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
    GROUP BY o_orderpriority
    """,
    doc="Interval join: equi-key + ts-in-[start,end] range predicate.",
    tags=("join", "interval"),
)
def j_interval_ships_within_30d(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "ship_deadline", F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    joined = interval_join(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        li,
        on=["l_orderkey"],
        right_ts="l_shipdate",
        left_start="o_orderdate",
        left_end="ship_deadline",
    )
    return joined.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_prompt"))


@query(
    "j_null_safe_join",
    oracle="""
    WITH a AS (
      SELECT event_id,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_id % 7 END AS k
      FROM events WHERE event_id % 2 = 0
    ),
    b AS (
      SELECT CASE WHEN g % 3 = 0 THEN NULL ELSE g END AS k,
             'grp' || CAST(g AS VARCHAR) AS label
      FROM generate_series(0, 6) t(g)
    )
    SELECT COALESCE(CAST(a.k AS VARCHAR), 'NULL') AS k_str,
           b.label, COUNT(*) AS n
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.k, b.label
    """,
    doc=(
        "Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys "
        "match each other instead of vanishing — the semantics SCD "
        "merges and checksum diffs need. Still a hash join on the "
        "null-safe key, so it shuffles/broadcasts like any equi-join."
    ),
    tags=("join", "null-safe"),
)
def j_null_safe_join(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 2 == 0)
    a = events.select(
        "event_id",
        F.when(F.col("event_id") % 5 == 0, None)
        .otherwise(F.col("event_id") % 7)
        .alias("k"),
    )
    b = spark.range(0, 7).select(
        F.when(F.col("id") % 3 == 0, None).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("grp"), F.col("id").cast("string")).alias("label"),
    )
    return (
        a.join(b, a.k.eqNullSafe(b.k))
        .groupBy(a.k.alias("__k"), "label")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("__k").cast("string"), F.lit("NULL")).alias("k_str"),
            "label",
            "n",
        )
    )


@query(
    "j_salted_skew_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev2
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc=(
        "Salt-replicated equi-join (operators/skew.replicated_salt_join): "
        "the large side gets a deterministic salt from a high-cardinality "
        "column and the small side is replicated across all salt values, "
        "spreading any hot join key over n_salt reducers while keeping "
        "exact inner-join semantics — the explicit fallback when one key "
        "dominates a shuffle and AQE's skew split cannot help (e.g. a "
        "broadcast-too-big dimension with one mega-customer)."
    ),
    tags=("join", "skew"),
)
def j_salted_skew_join(spark, sf_dir):
    from unity_to_bigquery_spark.operators.skew import replicated_salt_join

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "__p2", F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
    )
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    joined = replicated_salt_join(
        li, orders, key="l_orderkey", salt_col="l_partkey", n_salt=8
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("__p2").alias("rev2"),
    )
