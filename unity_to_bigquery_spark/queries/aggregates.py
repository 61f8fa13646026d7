"""Aggregation-family declared queries (SURVEY.md §2B Aggregations).

Covers: count distinct (+approx as property-checked), rollup, cube,
GROUPING SETS (SQL surface), collect_list/collect_set (order-normalized),
moment statistics (both an exactly-portable manual formulation and the
builtins), exact percentiles, and pivot.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from unity_to_bigquery_spark.catalog import load_table, register_views
from unity_to_bigquery_spark.functions.canonical import dsum, sql_dsum
from unity_to_bigquery_spark.registry import query


@query(
    "a_count_distinct_customers",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*)                  AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    doc="COUNT(DISTINCT) per group (Spark plans expand+two-phase agg).",
    tags=("aggregate",),
)
def a_count_distinct_customers(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "a_approx_count_distinct",
    oracle=None,  # HLL sketch is engine-specific; bounds property-tested in tests/test_properties.py
    doc="approx_count_distinct (HyperLogLog++) — scale path for 100 TB distincts.",
    tags=("aggregate", "approx"),
)
def a_approx_count_distinct(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )


@query(
    "a_rollup_revenue",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n, {sql_dsum('l_extendedprice')} AS total_price
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="ROLLUP with grouping_id disambiguating subtotal levels.",
    tags=("aggregate", "rollup"),
)
def a_rollup_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice").alias("total_price"),
    )


@query(
    "a_cube_quantities",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    doc="CUBE over two dims incl. cross-marginals.",
    tags=("aggregate", "cube"),
)
def a_cube_quantities(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        dsum("l_quantity").alias("sum_qty"),
    )


@query(
    "a_grouping_sets_sql",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS through the engine's SQL surface.",
    tags=("aggregate", "sql"),
)
def a_grouping_sets_sql(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping_id(o_orderstatus, o_orderpriority) AS gid,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "a_collect_suppliers_per_nation",
    oracle="""
    SELECT n_name,
           array_to_string(list_sort(list(s_name)), '|')          AS suppliers,
           array_to_string(list_sort(list(DISTINCT s_nationkey)), '|') AS natkeys
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="collect_list/collect_set order-normalized via array_sort→string.",
    tags=("aggregate", "collect"),
)
def a_collect_suppliers_per_nation(spark, sf_dir):
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), "|").alias("suppliers"),
            F.array_join(F.array_sort(F.collect_set("s_nationkey")), "|").alias("natkeys"),
        )
    )


@query(
    "a_stats_exact_moments",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)                    AS sum_q,
           CAST(SUM(CAST(l_quantity * l_quantity AS BIGINT)) AS DOUBLE)       AS sum_q2,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100          AS sum_p,
           CAST(SUM(CAST(FLOOR(l_extendedprice * l_extendedprice + 0.5) AS BIGINT)) AS DOUBLE)    AS sum_p2,
           CAST(SUM(CAST(FLOOR(l_quantity * l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_qp
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "Exactly-portable raw moments (fixed-point sums) from which "
        "variance/stddev/corr derive deterministically on any engine."
    ),
    tags=("aggregate", "stats"),
)
def a_stats_exact_moments(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q.cast("long")).cast("double").alias("sum_q"),
        F.sum((q * q).cast("long")).cast("double").alias("sum_q2"),
        (F.sum(F.floor(p * 100 + 0.5).cast("long")).cast("double") / 100).alias("sum_p"),
        F.sum(F.floor(p * p + 0.5).cast("long")).cast("double").alias("sum_p2"),
        (F.sum(F.floor(q * p * 100 + 0.5).cast("long")).cast("double") / 100).alias("sum_qp"),
    )


@query(
    "a_stats_builtin",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
           ROUND(var_samp(l_quantity), 6)    AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6)      AS corr_qp,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Builtin moment aggregates (verified value-stable at sf0.01).",
    tags=("aggregate", "stats"),
)
def a_stats_builtin(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qp"),
    )


@query(
    "a_regr_ols",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           ROUND(regr_avgx(l_extendedprice, l_quantity), 6) AS avgx,
           ROUND(regr_avgy(l_extendedprice, l_quantity), 4) AS avgy
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "ANSI OLS regression aggregates (regr_count/slope/intercept/"
        "r2/avgx/avgy — the in-SQL linear-fit family BI layers "
        "generate): price-vs-quantity per returnflag, rounded per the "
        "a_stats_builtin float discipline. One hash-agg shuffle; at "
        "100 TB it partial-aggregates map-side like any moment "
        "aggregate (sums of x, y, xx, xy fold associatively)."
    ),
    tags=("aggregate", "stats"),
)
def a_regr_ols(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).cast("long").alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avgx"),
        F.round(F.regr_avgy(y, x), 4).alias("avgy"),
    )


@query(
    "a_percentiles_exact",
    oracle="""
    SELECT l_linestatus,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5)  AS q50,
           quantile_cont(l_quantity, 0.75) AS q75
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="Exact interpolated percentiles (integral data → portable).",
    tags=("aggregate", "percentile"),
)
def a_percentiles_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.percentile("l_quantity", 0.25).alias("q25"),
        F.percentile("l_quantity", 0.5).alias("q50"),
        F.percentile("l_quantity", 0.75).alias("q75"),
    )


_SOURCES = [f"src{i}" for i in range(20)]


@query(
    "a_pivot_docs",
    oracle="SELECT lang, "
    + ", ".join(
        f"COUNT(CASE WHEN source = '{s}' THEN 1 END) AS {s}" for s in _SOURCES
    )
    + " FROM documents GROUP BY lang",
    doc="Pivot lang×source counts (fixed pivot-value list → no extra scan).",
    tags=("aggregate", "pivot"),
)
def a_pivot_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .pivot("source", _SOURCES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _SOURCES)
    )


@query(
    "a_countmin_sketch",
    oracle="""
    WITH coords AS (
      SELECT event_type AS k, t.i AS hash_row,
             ('0x' || substring(md5(event_type || '#' || t.i), 1, 15))::BIGINT % 64 AS bucket
      FROM events, generate_series(0, 3) t(i)
    ), sketch AS (
      SELECT hash_row, bucket, COUNT(*) AS cnt FROM coords GROUP BY hash_row, bucket
    ), probes AS (
      SELECT DISTINCT e.event_type, t.i AS hash_row,
             ('0x' || substring(md5(e.event_type || '#' || t.i), 1, 15))::BIGINT % 64 AS bucket
      FROM events e, generate_series(0, 3) t(i)
    ), est AS (
      SELECT p.event_type, MIN(COALESCE(s.cnt, 0)) AS cms_estimate
      FROM probes p LEFT JOIN sketch s ON p.hash_row = s.hash_row AND p.bucket = s.bucket
      GROUP BY p.event_type
    )
    SELECT e.event_type, t.true_count, e.cms_estimate
    FROM est e JOIN (SELECT event_type, COUNT(*) AS true_count
                     FROM events GROUP BY event_type) t
      ON e.event_type = t.event_type
    """,
    doc=(
        "Count-Min Sketch as pure relational dataflow (portable md5 "
        "hash family; d=4, w=64): sublinear frequency summary whose "
        "construction AND estimates are oracle-verified. Estimates "
        "over-count only (CMS guarantee), exact here since 5 keys "
        "collide with nothing."
    ),
    tags=("aggregate", "sketch"),
)
def a_countmin_sketch(spark, sf_dir):
    from unity_to_bigquery_spark.operators.sketches import cms_build, cms_estimate

    events = load_table(spark, sf_dir, "events")
    sketch = cms_build(events, "event_type")
    keys = events.select("event_type").distinct()
    est = cms_estimate(sketch, keys, "event_type")
    truth = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("true_count"))
    return est.join(truth, on="event_type").select(
        "event_type", "true_count", "cms_estimate"
    )


@query(
    "a_unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric,
           CAST(FLOOR(val * 100 + 0.5) AS BIGINT) AS cents
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
      FROM lineitem WHERE l_orderkey % 151 = 0
    ) UNPIVOT (val FOR metric IN (l_quantity, l_discount, l_tax))
    """,
    doc=(
        "Unpivot/melt (inverse of a_pivot_docs): wide measure columns "
        "to (metric, value) rows — pure projection+generate, no "
        "shuffle; values fixed-pointed for cross-engine hashing."
    ),
    tags=("aggregate", "unpivot"),
)
def a_unpivot_measures(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 151 == 0)
    melted = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return melted.select(
        "l_orderkey",
        "l_linenumber",
        "metric",
        F.floor(F.col("val") * 100 + 0.5).cast("long").alias("cents"),
    )


@query(
    "a_listagg_ordered",
    oracle="""
    SELECT n_name,
           string_agg(s_name, '|' ORDER BY s_acctbal DESC, s_name) AS top_names
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc=(
        "Ordered LISTAGG ... WITHIN GROUP (Spark 4): aggregate-internal "
        "ordering (by balance desc, name tiebreak) — deterministic "
        "without post-sorting the array, unlike a_collect_*'s "
        "order-normalization."
    ),
    tags=("aggregate", "listagg"),
)
def a_listagg_ordered(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name,
               listagg(s_name, '|')
                 WITHIN GROUP (ORDER BY s_acctbal DESC, s_name) AS top_names
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


@query(
    "a_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
           CAST(COALESCE(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                         FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT)
             AS cents_f
    FROM orders GROUP BY o_orderpriority
    """,
    doc=(
        "Aggregate FILTER clause: per-aggregate predicates in one pass "
        "over the data (the declarative form of conditional CASE-WHEN "
        "aggregation) — still a single hash aggregate."
    ),
    tags=("aggregate", "filter"),
)
def a_filter_clause(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
               CAST(COALESCE(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                             FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT)
                 AS cents_f
        FROM orders GROUP BY o_orderpriority
        """
    )


@query(
    "a_argmin_argmax",
    oracle="""
    SELECT n_name,
           arg_max(s_name, CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) * 10000000 + s_suppkey) AS richest,
           arg_min(s_name, CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) * 10000000 + s_suppkey) AS poorest,
           CAST(FLOOR(MAX(s_acctbal) * 100 + 0.5) AS BIGINT)       AS top_bal_c2
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc=(
        "argmin/argmax aggregates (min_by/max_by): the value of one "
        "column at another's extremum, in ONE aggregate pass — no "
        "self-join or window needed. The (cents, suppkey) composite is "
        "packed into one BIGINT so the extremum is unique and both "
        "engines agree on ties."
    ),
    tags=("aggregate", "argminmax"),
)
def a_argmin_argmax(spark, sf_dir):
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    key = (
        F.floor(F.col("s_acctbal") * 100 + 0.5).cast("long") * 10000000
        + F.col("s_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("s_name", key).alias("richest"),
            F.min_by("s_name", key).alias("poorest"),
            F.floor(F.max("s_acctbal") * 100 + 0.5).cast("long").alias("top_bal_c2"),
        )
    )


@query(
    "a_bool_aggs",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 0)   AS all_positive,
           bool_or(l_discount > 0.09) AS any_deep_discount,
           bool_and(l_extendedprice >= l_quantity) AS price_dominates
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Boolean aggregates (bool_and/bool_or): data-quality assertions as a one-pass aggregate.",
    tags=("aggregate", "bool"),
)
def a_bool_aggs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.bool_and(F.col("l_extendedprice") >= F.col("l_quantity")).alias("price_dominates"),
    )


@query(
    "a_salted_hotkey_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_qty4
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "Two-phase salted aggregation (operators/skew.salted_aggregate): "
        "3 hot grouping keys spread across (key, salt) partials so no "
        "reducer sees a whole key — the explicit fix for hot-key skew "
        "that AQE cannot split inside a single group. Exactly equal to "
        "the direct GROUP BY (algebraic aggregates only); sums use the "
        "fixed-point scheme so both phases stay in exact BIGINT."
    ),
    tags=("aggregate", "skew"),
)
def a_salted_hotkey_agg(spark, sf_dir):
    from unity_to_bigquery_spark.operators.skew import salted_aggregate

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "__q4", F.floor(F.col("l_quantity") * 10000.0 + 0.5).cast("long")
    )
    return salted_aggregate(
        li,
        keys=["l_returnflag"],
        sum_cols={"sum_qty4": "__q4"},
        salt_col="l_orderkey",
        n_salt=16,
    )


@query(
    "a_basket_pairs",
    oracle="""
    WITH baskets AS (
      SELECT l_orderkey, list_distinct(list(l_partkey)) AS items
      FROM lineitem GROUP BY l_orderkey
    ), ex AS (
      SELECT l_orderkey, unnest(items) AS p FROM baskets
    )
    SELECT a.p AS part_a, b.p AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_baskets
    FROM ex a JOIN ex b
      ON a.l_orderkey = b.l_orderkey AND a.p < b.p
    GROUP BY a.p, b.p
    HAVING COUNT(*) >= 3
    """,
    doc=(
        "Market-basket pair mining: part pairs co-ordered in >= 3 "
        "orders. Distinct items per basket first (bounded basket "
        "width), in-basket self-join keyed on the order — work is "
        "sum(|basket|^2), never a corpus cross product — then one "
        "hash aggregate on the pair. tests/test_llm.py proves "
        "pyspark.ml FPGrowth's size-2 itemsets reproduce exactly "
        "this relation at the equivalent support threshold."
    ),
    tags=("aggregate", "basket", "fpm"),
)
def a_basket_pairs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    ex = (
        li.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("items"))
        .select("l_orderkey", F.explode("items").alias("p"))
    )
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p") < F.col("b.p")),
        )
        .groupBy(F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
        .filter(F.col("n_baskets") >= 3)
    )


@query(
    "a_pareto_skyline",
    oracle="""
    SELECT p.p_partkey, p.p_name,
           CAST(FLOOR(p.p_retailprice * 100.0 + 0.5) AS BIGINT) AS price2,
           CAST(p.p_size AS BIGINT) AS p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
    )
    """,
    doc=(
        "Skyline / Pareto frontier (SKYLINE OF, Borzsonyi ICDE'01 — "
        "no relational primitive exists): parts not dominated on "
        "(retail price, size), both minimized. Two-phase distributed "
        "operator (operators/skyline.py): lossless per-batch local "
        "skylines via mapInPandas, then the exact frontier over the "
        "frontier-sized union via a single grouped-map. The oracle is "
        "the NOT EXISTS strict-domination definition itself."
    ),
    tags=("aggregate", "skyline", "pareto"),
)
def a_pareto_skyline(spark, sf_dir):
    from unity_to_bigquery_spark.operators.skyline import skyline

    part = load_table(spark, sf_dir, "part")
    sky = skyline(
        part.select("p_partkey", "p_name", "p_retailprice", "p_size"),
        dims=["p_retailprice", "p_size"],
    )
    return sky.select(
        "p_partkey",
        "p_name",
        F.floor(F.col("p_retailprice") * 100.0 + 0.5).cast("long").alias("price2"),
        F.col("p_size").cast("long").alias("p_size"),
    )


@query(
    "a_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS p,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice, l_orderkey, l_linenumber)
               AS cum,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tot
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(FLOOR(MIN(p) FILTER (WHERE cum >= tot / 2.0) * 100.0 + 0.5) AS BIGINT)
             AS wmedian2
    FROM w GROUP BY l_returnflag
    """,
    doc=(
        "Exact weighted median (quantity-weighted price per return "
        "flag): the smallest price whose cumulative weight reaches "
        "half the group total, under a unique total order — one "
        "partitioned window pass + one aggregate, no sort-collect. "
        "The cumulative float sums add in the identical order in both "
        "engines (same ORDER BY), so the comparison is cross-engine "
        "safe."
    ),
    tags=("aggregate", "statistics", "median"),
)
def a_weighted_median(spark, sf_dir):
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("l_returnflag")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("p"),
        F.sum("l_quantity").over(wc).alias("cum"),
        F.sum("l_quantity").over(wt).alias("tot"),
    )
    return w.groupBy("l_returnflag").agg(
        F.floor(
            F.min(F.when(F.col("cum") >= F.col("tot") / 2.0, F.col("p"))) * 100.0
            + 0.5
        )
        .cast("long")
        .alias("wmedian2")
    )
