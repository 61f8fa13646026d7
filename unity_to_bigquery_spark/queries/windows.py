"""Window-function declared queries (SURVEY.md §2B Windows).

Covers ranking (row_number/rank/dense_rank/ntile), analytic (lag/lead/
first/last), frame specs (running sums, moving averages), top-k per
group, and gap-based sessionization — each with a total order inside
every partition (unique tiebreak) so results are engine-portable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from unity_to_bigquery_spark.catalog import load_table
from unity_to_bigquery_spark.operators.windows import sessionize, topk_per_group
from unity_to_bigquery_spark.registry import query


@query(
    "w_rank_orders_per_customer",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER()  OVER w AS rn,
             RANK()        OVER w AS rnk,
             DENSE_RANK()  OVER w AS drnk,
             NTILE(4)      OVER w AS quartile
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
    doc="Ranking family over a per-customer total order.",
    tags=("window", "rank"),
)
def w_rank_orders_per_customer(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "w_lag_lead_event_gaps",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - LAG(epoch_us(ts))  OVER w AS gap_us,
           LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS next_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag/lead inter-event gaps in exact integer microseconds.",
    tags=("window", "analytic"),
)
def w_lag_lead_event_gaps(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("next_us"),
    )


@query(
    "w_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
             AS running_total
    FROM orders
    """,
    doc="Running sum (rows frame) with portable fixed-point accumulation.",
    tags=("window", "frame"),
)
def w_running_revenue(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scaled = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(scaled).over(w).cast("double") / 100).alias("running_total"),
    )


@query(
    "w_moving_avg_events",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / (1000000.0 * COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
             AS avg7
    FROM events
    """,
    doc="7-row moving average (bounded rows frame), fixed-point portable.",
    tags=("window", "frame"),
)
def w_moving_avg_events(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    scaled = F.floor(F.col("value") * 1000000.0 + 0.5).cast("long")
    return events.select(
        "event_id",
        "user_id",
        (
            F.sum(scaled).over(w).cast("double")
            / (F.lit(1000000.0) * F.count(F.lit(1)).over(w))
        ).alias("avg7"),
    )


@query(
    "w_first_last_per_user",
    oracle="""
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type)  OVER w AS last_type,
           FIRST_VALUE(event_id)   OVER w AS first_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first/last value over an unbounded frame.",
    tags=("window", "analytic"),
)
def w_first_last_per_user(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return events.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.first("event_id").over(w).alias("first_event"),
    ).distinct()


@query(
    "w_topk_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part
    ) WHERE rn <= 2
    """,
    doc="Top-k-per-group via the topk_per_group operator.",
    tags=("window", "topk", "composite"),
)
def w_topk_parts_per_brand(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return topk_per_group(
        part.select("p_brand", "p_partkey", "p_retailprice"),
        group_cols=["p_brand"],
        order_cols=[F.desc("p_retailprice"), F.asc("p_partkey")],
        k=2,
    )


@query(
    "w_sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR date_diff('microsecond', LAG(ts) OVER w, ts) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sessions GROUP BY user_id, session_id
    """,
    doc=(
        "Gap-based sessionization (30 min) via the sessionize operator — "
        "lag + cumulative start-flags, one shuffle by user."
    ),
    tags=("window", "session", "composite"),
)
def w_sessionize_events(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    sessed = sessionize(events, key="user_id", ts="ts", gap_seconds=1800)
    return sessed.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


@query(
    "w_range_frame_price_band",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY FLOOR(o_totalprice * 100 + 0.5)
                      RANGE BETWEEN 5000000 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
             AS band_total,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY FLOOR(o_totalprice * 100 + 0.5)
                          RANGE BETWEEN 5000000 PRECEDING AND CURRENT ROW)
             AS band_n
    FROM orders
    """,
    doc=(
        "RANGE frame (value-based window): per customer, total of orders "
        "priced within 50k below the current order. Ordering key is the "
        "fixed-point cents value so both engines see identical longs; "
        "RANGE frames include peers, which ROWS frames would split."
    ),
    tags=("window", "frame", "range"),
)
def w_range_frame_price_band(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(cents)
        .rangeBetween(-5000000, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents).over(w).cast("double") / 100).alias("band_total"),
        F.count(F.lit(1)).over(w).alias("band_n"),
    )


@query(
    "w_percent_rank_cume_dist",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(FLOOR(percent_rank() OVER w * 1000000.0 + 0.5) AS BIGINT) AS pct_rank6,
           CAST(FLOOR(cume_dist()    OVER w * 1000000.0 + 0.5) AS BIGINT) AS cume6
    FROM orders WHERE o_custkey % 50 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
    doc=(
        "Relative-position window functions (percent_rank, cume_dist), "
        "fixed-point for cross-engine hashing. percent_rank is exact "
        "rational arithmetic in both engines: (rank-1)/(n-1)."
    ),
    tags=("window",),
)
def w_percent_rank_cume_dist(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.floor(F.percent_rank().over(w) * 1000000.0 + 0.5).cast("long").alias("pct_rank6"),
        F.floor(F.cume_dist().over(w) * 1000000.0 + 0.5).cast("long").alias("cume6"),
    )


@query(
    "w_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           nth_value(o_orderkey, 2) OVER w AS second_order,
           strftime(nth_value(o_orderdate, 2) OVER w, '%Y-%m-%d') AS second_date
    FROM orders WHERE o_custkey % 50 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc=(
        "nth_value window function over the full partition frame: the "
        "'second event per entity' lookup (e.g. second purchase date "
        "for conversion-lag analytics)."
    ),
    tags=("window",),
)
def w_nth_value(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.date_format(F.nth_value("o_orderdate", 2).over(w), "yyyy-MM-dd").alias(
            "second_date"
        ),
    )


@query(
    "w_scd2_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           epoch_us(ts) AS valid_from_us,
           LEAD(epoch_us(ts)) OVER w2 AS valid_to_us,
           (LEAD(epoch_us(ts)) OVER w2 IS NULL) AS is_current,
           CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc=(
        "SCD Type-2 dimension build from an event log: per-user "
        "event_type change points become versioned validity intervals "
        "[valid_from, valid_to) with an is_current flag — the "
        "slowly-changing-dimension construction every warehouse "
        "needs, as two window passes over one user_id partitioning "
        "(Catalyst plans a single exchange). Unique (ts, event_id) "
        "tiebreak; timestamps surfaced as exact integer micros."
    ),
    tags=("window", "scd2"),
)
def w_scd2_intervals(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w2)).alias("valid_to_us"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


@query(
    "w_scd2_asof_lookup",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    ), states AS (
      SELECT user_id, event_type, event_id, ts AS vf,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
      FROM changes
    ), probes AS (
      SELECT event_id, user_id, ts + INTERVAL 1 HOUR AS t FROM events
    )
    SELECT p.event_id, p.user_id,
           s.event_type AS state_1h,
           epoch_us(s.vf) AS since_us
    FROM probes p JOIN states s
      ON s.user_id = p.user_id AND s.vf <= p.t AND (s.vt IS NULL OR p.t < s.vt)
    """,
    doc=(
        "Temporal dimension lookup: for every event, the user's SCD2 "
        "state one hour later — the fact-to-versioned-dim join every "
        "warehouse does against slowly-changing dimensions. Runs as "
        "the single-shuffle union-carry-forward as-of join "
        "(operators/joins.asof_join), NOT a range nested-loop; the "
        "oracle expresses the identical semantics as interval "
        "containment over the lead()-closed intervals."
    ),
    tags=("window", "scd2", "asof"),
)
def w_scd2_asof_lookup(spark, sf_dir):
    from unity_to_bigquery_spark.operators.joins import asof_join

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("event_id").alias("change_id"),
            F.col("event_type").alias("state_1h"),
            F.col("ts").alias("cts"),
        )
    )
    probes = events.select(
        "event_id", "user_id", (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t")
    )
    joined = asof_join(
        probes,
        changes,
        on=["user_id"],
        left_ts="t",
        right_ts="cts",
        payload=["change_id", "state_1h"],
    )
    # since_us: recover the matched change's timestamp via change_id
    cts = changes.select("change_id", F.unix_micros("cts").alias("since_us"))
    return joined.join(cts, "change_id").select(
        "event_id", "user_id", "state_1h", "since_us"
    )


@query(
    "w_locf_imputation",
    oracle="""
    WITH sparse AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id, user_id,
           CAST(FLOOR(COALESCE(
             LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             0.0) * 100.0 + 0.5) AS BIGINT) AS locf2
    FROM sparse
    """,
    doc=(
        "Last-observation-carried-forward imputation: a "
        "deterministically sparsified measure (every third event "
        "NULLed) repaired by last_value IGNORE NULLS over the per-user "
        "timeline — the standard sensor/telemetry gap repair, one "
        "partitioned window pass. Users whose first readings are NULL "
        "fall back to 0."
    ),
    tags=("window", "imputation"),
)
def w_locf_imputation(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    sparse = events.withColumn(
        "v", F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(F.col("value"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return sparse.select(
        "event_id",
        "user_id",
        F.floor(
            F.coalesce(F.last("v", ignorenulls=True).over(w), F.lit(0.0)) * 100.0
            + 0.5
        )
        .cast("long")
        .alias("locf2"),
    )


@query(
    "w_linear_interp",
    oracle="""
    WITH sparse AS (
      SELECT user_id, ts, event_id, epoch_us(ts) AS x,
             CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
      FROM events
    ), ctx AS (
      SELECT event_id, user_id, x, v,
             LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS px,
             FIRST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
      FROM sparse
    )
    SELECT event_id, user_id,
           CAST(FLOOR(
             CASE
               WHEN v IS NOT NULL THEN v
               WHEN pv IS NULL AND nv IS NULL THEN 0.0
               WHEN pv IS NULL THEN nv
               WHEN nv IS NULL THEN pv
               WHEN nx = px THEN pv
               ELSE pv + (nv - pv) * (CAST(x - px AS DOUBLE)
                                      / CAST(nx - px AS DOUBLE))
             END * 100.0 + 0.5) AS BIGINT) AS interp2
    FROM ctx
    """,
    doc=(
        "LINEAR time-weighted interpolation (the other half of the "
        "gap-repair pair with w_locf_imputation): every third reading "
        "is NULLed, then repaired as pv + (nv-pv)*(t-tp)/(tn-tp) with "
        "exact integer microsecond x-coordinates on both engines "
        "(unix_micros / epoch_us — identical IEEE expression trees, "
        "so the fixed-point floor cannot diverge). Edge policy: "
        "leading gaps take the next reading, trailing gaps carry the "
        "previous, all-null users 0. Two window passes over one "
        "partitioned sort — no extra shuffle beyond the user_id "
        "exchange at 100 TB."
    ),
    tags=("window", "imputation"),
)
def w_linear_interp(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    sparse = events.select(
        "event_id",
        "user_id",
        "ts",
        F.unix_micros(F.col("ts")).alias("x"),
        F.when(F.col("event_id") % 3 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    xk = F.when(F.col("v").isNotNull(), F.col("x"))
    ctx = sparse.select(
        "event_id",
        "user_id",
        "x",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(xk, ignorenulls=True).over(wp).alias("px"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(xk, ignorenulls=True).over(wn).alias("nx"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull() & F.col("nv").isNull(), F.lit(0.0))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .when(F.col("nx") == F.col("px"), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                (F.col("x") - F.col("px")).cast("double")
                / (F.col("nx") - F.col("px")).cast("double")
            )
        )
    )
    return ctx.select(
        "event_id",
        "user_id",
        F.floor(interp * 100.0 + 0.5).cast("long").alias("interp2"),
    )


@query(
    "w_ewma_exact",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT user_id, CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS x6,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events
    ), ew AS (
      SELECT user_id, rn, x6 AS e6 FROM base WHERE rn = 1
      UNION ALL
      SELECT b.user_id, b.rn,
             CAST(FLOOR((12 * ew.e6 + 4 * b.x6) / 16.0) AS BIGINT)
      FROM ew JOIN base b ON b.user_id = ew.user_id AND b.rn = ew.rn + 1
    ), last AS (
      SELECT user_id, MAX(rn) AS n FROM base GROUP BY user_id
    )
    SELECT l.user_id, CAST(l.n AS BIGINT) AS n_events, ew.e6 AS ewma6
    FROM last l JOIN ew ON ew.user_id = l.user_id AND ew.rn = l.n
    """,
    doc=(
        "EXACT per-user EWMA over the event stream (operators/windows."
        "ewma_exact, alpha = 4/16): the sequential-state operator no "
        "window frame expresses — each step depends on the previous "
        "OUTPUT — run as one applyInPandas stage (sequential within a "
        "user, parallel across users). The recurrence is pure integer "
        "fixed-point, so the DuckDB oracle replays the state machine "
        "with a RECURSIVE CTE and the final per-user state must match "
        "bit-for-bit (the codec suite's rule-16 oracle discipline "
        "applied to relational time-series state)."
    ),
    tags=("window", "stateful", "udf"),
)
def w_ewma_exact(spark, sf_dir):
    from unity_to_bigquery_spark.operators.windows import ewma_exact

    events = load_table(spark, sf_dir, "events")
    return ewma_exact(events)
