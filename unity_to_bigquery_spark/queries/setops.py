"""Set-operation declared queries (SURVEY.md §2B Set operations) plus
global sorts/limits.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from unity_to_bigquery_spark.catalog import load_table
from unity_to_bigquery_spark.registry import query


def _jan(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    )


def _feb(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-02-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-03-01 00:00:00").cast("timestamp"))
    )


_JAN_SQL = "SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-02-01 00:00:00'"
_FEB_SQL = "SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1996-02-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-03-01 00:00:00'"


@query(
    "set_union_all_counts",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n FROM (
      SELECT o_orderstatus FROM ({_JAN_SQL})
      UNION ALL
      SELECT o_orderstatus FROM ({_FEB_SQL})
    ) GROUP BY o_orderstatus
    """,
    doc="UNION ALL preserving duplicates.",
    tags=("setop",),
)
def set_union_all_counts(spark, sf_dir):
    u = _jan(spark, sf_dir).select("o_orderstatus").unionAll(
        _feb(spark, sf_dir).select("o_orderstatus")
    )
    return u.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_union_distinct_customers",
    oracle=f"""
    SELECT COUNT(*) AS n_customers FROM (
      SELECT o_custkey FROM ({_JAN_SQL})
      UNION
      SELECT o_custkey FROM ({_FEB_SQL})
    )
    """,
    doc="UNION DISTINCT (union + dedup).",
    tags=("setop", "distinct"),
)
def set_union_distinct_customers(spark, sf_dir):
    u = (
        _jan(spark, sf_dir).select("o_custkey")
        .union(_feb(spark, sf_dir).select("o_custkey"))
        .distinct()
    )
    return u.agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "set_intersect_customers",
    oracle=f"""
    SELECT o_custkey FROM ({_JAN_SQL})
    INTERSECT
    SELECT o_custkey FROM ({_FEB_SQL})
    """,
    doc="INTERSECT (distinct semantics).",
    tags=("setop",),
)
def set_intersect_customers(spark, sf_dir):
    return _jan(spark, sf_dir).select("o_custkey").intersect(
        _feb(spark, sf_dir).select("o_custkey")
    )


@query(
    "set_except_customers",
    oracle=f"""
    SELECT o_custkey FROM ({_JAN_SQL})
    EXCEPT
    SELECT o_custkey FROM ({_FEB_SQL})
    """,
    doc="EXCEPT (distinct semantics).",
    tags=("setop",),
)
def set_except_customers(spark, sf_dir):
    # subtract() is EXCEPT DISTINCT. exceptAll().distinct() is NOT: a
    # key present in both sides with higher left multiplicity survives
    # the multiset difference and the distinct, but EXCEPT removes it
    # (18 such custkeys exist at sf0.1).
    return _jan(spark, sf_dir).select("o_custkey").subtract(
        _feb(spark, sf_dir).select("o_custkey")
    )


@query(
    "set_except_all_priorities",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n FROM (
      SELECT o_orderpriority FROM ({_JAN_SQL})
      EXCEPT ALL
      SELECT o_orderpriority FROM ({_FEB_SQL})
    ) GROUP BY o_orderpriority
    """,
    doc="EXCEPT ALL multiset difference, then aggregated.",
    tags=("setop", "multiset"),
)
def set_except_all_priorities(spark, sf_dir):
    d = _jan(spark, sf_dir).select("o_orderpriority").exceptAll(
        _feb(spark, sf_dir).select("o_orderpriority")
    )
    return d.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_intersect_all_priorities",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n FROM (
      SELECT o_orderpriority FROM ({_JAN_SQL})
      INTERSECT ALL
      SELECT o_orderpriority FROM ({_FEB_SQL})
    ) GROUP BY o_orderpriority
    """,
    doc="INTERSECT ALL multiset intersection, then aggregated.",
    tags=("setop", "multiset"),
)
def set_intersect_all_priorities(spark, sf_dir):
    d = _jan(spark, sf_dir).select("o_orderpriority").intersectAll(
        _feb(spark, sf_dir).select("o_orderpriority")
    )
    return d.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_distinct_flag_status",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="DISTINCT projection (exact dedup of the key space).",
    tags=("setop", "distinct"),
)
def set_distinct_flag_status(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


@query(
    "s_global_sort_top100",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    doc=(
        "Global multi-key sort + limit — Catalyst plans TakeOrderedAndProject "
        "(no full global sort materialization)."
    ),
    tags=("sort", "limit"),
)
def s_global_sort_top100(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(F.asc("o_orderstatus"), F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "s_top1_latest_event_per_type",
    oracle="""
    SELECT event_type, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM (
      SELECT event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc=(
        "Latest-row-per-key (the reference's checkpoint fetchone, "
        "Unity_to_BigQuery.py:88-100, as a set-based top-1)."
    ),
    tags=("sort", "limit", "window"),
)
def s_top1_latest_event_per_type(spark, sf_dir):
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
    )
