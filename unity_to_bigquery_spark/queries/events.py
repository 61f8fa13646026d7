"""Event-stream declared queries — the batch-equivalent faces of the
streaming surface (SURVEY.md §2B Streaming): tumbling/sliding/session
windows, routing through a broadcast dimension (reference A9), and
watermark-based incremental continuation (reference A12). The true
``readStream`` flavors are differentially tested in
``tests/test_streaming.py``; these batch twins are the oracle-checkable
semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from unity_to_bigquery_spark.catalog import load_table
from unity_to_bigquery_spark.functions.canonical import dsum, sql_dsum
from unity_to_bigquery_spark.registry import query


@query(
    "e_tumbling_hour",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n, {sql_dsum('value')} AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour window aggregate (streaming groupBy(window) twin).",
    tags=("events", "window-agg"),
)
def e_tumbling_hour(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "e_sliding_hour_30m",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '30 minutes', ts) - (k * INTERVAL 30 MINUTE),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n
    FROM events CROSS JOIN (VALUES (0), (1)) AS offs(k)
    GROUP BY 1
    """,
    doc="Sliding window (1h length, 30m slide): each event lands in 2 windows.",
    tags=("events", "window-agg"),
)
def e_sliding_hour_30m(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
        )
    )


@query(
    "e_session_window_builtin",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             -- strict > : Spark's session_window MERGES an event that
             -- lands exactly gap after its predecessor (verified
             -- empirically; tests/test_edge_semantics.py)
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
    doc="Builtin session_window (30 min gap) — streaming-native sessionization.",
    tags=("events", "session"),
)
def e_session_window_builtin(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


@query(
    "e_routing_dim",
    oracle=f"""
    SELECT COALESCE(d.dataset, 'misc_events') AS dataset,
           COUNT(*) AS n, {sql_dsum('e.value')} AS total_value
    FROM events e
    LEFT JOIN (VALUES ('purchase', 'revenue_events'),
                      ('signup',   'growth_events'),
                      ('error',    'ops_events')) AS d(event_type, dataset)
      ON e.event_type = d.event_type
    GROUP BY 1
    """,
    doc=(
        "Per-key sink routing through a broadcast dimension with fallback — "
        "the reference's project→dataset dispatch (Unity_to_BigQuery.py:143-150) "
        "as a join instead of if/elif."
    ),
    tags=("events", "routing", "broadcast"),
)
def e_routing_dim(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("purchase", "revenue_events"), ("signup", "growth_events"), ("error", "ops_events")],
        ["event_type", "dataset"],
    )
    return (
        events.join(F.broadcast(dim), on="event_type", how="left")
        .groupBy(F.coalesce("dataset", F.lit("misc_events")).alias("dataset"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
    )


@query(
    "e_incremental_after_watermark",
    oracle="""
    WITH wm AS (
      SELECT event_type, MAX(ts) AS watermark
      FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
      GROUP BY event_type
    )
    SELECT e.event_type,
           strftime(wm.watermark, '%Y-%m-%d %H:%M:%S') AS watermark,
           COUNT(*) AS n_new
    FROM events e JOIN wm ON e.event_type = wm.event_type
    WHERE e.ts > wm.watermark
    GROUP BY e.event_type, strftime(wm.watermark, '%Y-%m-%d %H:%M:%S')
    """,
    doc=(
        "Incremental continuation: process only rows past the stored "
        "watermark (reference A12 continueFrom semantics, "
        "Unity_to_BigQuery.py:63-66,155-160)."
    ),
    tags=("events", "incremental"),
)
def e_incremental_after_watermark(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    wm = (
        events.filter(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("watermark"))
    )
    return (
        events.join(F.broadcast(wm), on="event_type")
        .filter(F.col("ts") > F.col("watermark"))
        .groupBy(
            "event_type",
            F.date_format("watermark", "yyyy-MM-dd HH:mm:ss").alias("watermark"),
        )
        .agg(F.count(F.lit(1)).alias("n_new"))
    )


@query(
    "e_rollup_cascade",
    oracle=f"""
    WITH minute AS (
      SELECT time_bucket(INTERVAL '1 minute', ts) AS bucket, event_type,
             COUNT(*) AS n,
             SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS sum_v6,
             MIN(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS min_v6,
             MAX(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS max_v6
      FROM events GROUP BY 1, 2
    ), hour AS (
      SELECT time_bucket(INTERVAL '1 hour', bucket) AS bucket, event_type,
             CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(sum_v6) AS BIGINT) AS sum_v6,
             MIN(min_v6) AS min_v6, MAX(max_v6) AS max_v6
      FROM minute GROUP BY 1, 2
    )
    SELECT strftime(bucket, '%Y-%m-%d %H:%M:%S') AS day_start, event_type,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(sum_v6) AS DOUBLE) / 1000000.0 AS total_value,
           CAST(MIN(min_v6) AS DOUBLE) / 1000000.0 AS min_value,
           CAST(MAX(max_v6) AS DOUBLE) / 1000000.0 AS max_value
    FROM (SELECT time_bucket(INTERVAL '1 day', bucket) AS bucket, event_type,
                 n, sum_v6, min_v6, max_v6 FROM hour) x
    GROUP BY 1, 2
    """,
    doc=(
        "Hypertable rollup cascade: raw events aggregate ONCE at minute "
        "grain; hour and day levels derive by merging partials (the "
        "continuous-aggregate pattern — coarse windows never rescan raw "
        "data at 100 TB). Oracle mirrors the full cascade."
    ),
    tags=("events", "rollup", "composite"),
)
def e_rollup_cascade(spark, sf_dir):
    from unity_to_bigquery_spark.operators.rollups import rollup_coarser, rollup_finest

    events = load_table(spark, sf_dir, "events")
    minute = rollup_finest(events, window="1 minute")
    hour = rollup_coarser(minute, "1 hour")
    day = rollup_coarser(hour, "1 day")
    return day.select(
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("day_start"),
        "event_type",
        "n",
        (F.col("sum_v6").cast("double") / 1000000.0).alias("total_value"),
        (F.col("min_v6").cast("double") / 1000000.0).alias("min_value"),
        (F.col("max_v6").cast("double") / 1000000.0).alias("max_value"),
    )


@query(
    "e_funnel_conversion",
    oracle="""
    WITH signups AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      SELECT s.user_id,
             MIN(e.ts) AS first_purchase_ts
      FROM signups s
      JOIN events e ON e.user_id = s.user_id
        AND e.event_type = 'purchase'
        AND e.ts > s.signup_ts
        AND e.ts <= s.signup_ts + INTERVAL 7 DAY
      GROUP BY s.user_id
    )
    SELECT COUNT(*) AS n_signup_users,
           COUNT(c.user_id) AS n_converted,
           CAST(FLOOR(COUNT(c.user_id) * 1000000.0 / COUNT(*) + 0.5) AS BIGINT)
             AS conversion6
    FROM signups s LEFT JOIN conv c ON s.user_id = c.user_id
    """,
    doc=(
        "Funnel conversion: users whose first signup is followed by a "
        "purchase within 7 days — the sequential-pattern analytics shape "
        "(two aggregates + one interval join, all shuffled on user_id; "
        "at scale the signups side is the small one and broadcasts)."
    ),
    tags=("events", "funnel"),
)
def e_funnel_conversion(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    signups = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    conv = (
        signups.join(
            events.filter(F.col("event_type") == "purchase").select(
                F.col("user_id"), F.col("ts").alias("p_ts")
            ),
            on="user_id",
        )
        .filter(
            (F.col("p_ts") > F.col("signup_ts"))
            & (F.col("p_ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
    )
    joined = signups.join(conv.select("user_id", "first_purchase_ts"), "user_id", "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_signup_users"),
        F.count("first_purchase_ts").alias("n_converted"),
        F.floor(
            F.count("first_purchase_ts") * 1000000.0 / F.count(F.lit(1)) + 0.5
        ).cast("long").alias("conversion6"),
    )


@query(
    "e_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             f.cohort_week,
             date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           week_offset,
           COUNT(*) AS n_active_users
    FROM activity
    WHERE week_offset <= 4
    GROUP BY cohort_week, week_offset
    """,
    doc=(
        "Cohort retention: users grouped by first-seen week, counted "
        "active at week offsets 0-4 — the standard retention triangle "
        "(first-touch aggregate + distinct activity join, both shuffled "
        "on user_id so they co-partition)."
    ),
    tags=("events", "cohort"),
)
def e_cohort_retention(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            ).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("week_offset") <= 4)
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@query(
    "e_gapfill_hours",
    oracle="""
    WITH bounds AS (
      SELECT time_bucket(INTERVAL '1 hour', MIN(ts)) AS lo,
             time_bucket(INTERVAL '1 hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS h FROM bounds
    ),
    agg AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1
    )
    SELECT strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           COALESCE(a.n, 0) AS n
    FROM spine s LEFT JOIN agg a ON s.h = a.h
    """,
    doc=(
        "Time-spine gap filling (densification): an hourly spine from "
        "min to max via sequence()+explode, left-joined against the "
        "hourly counts so silent hours surface as explicit zeros — what "
        "dashboards and anomaly detectors need from an event store. "
        "Spine generation is O(hours) on the driver-free generate path; "
        "the join broadcasts the (tiny) spine."
    ),
    tags=("events", "gapfill"),
)
def e_gapfill_hours(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    agg = events.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        F.broadcast(spine)
        .join(agg, "h", "left")
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


@query(
    "e_dau_wau",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d FROM events
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS d, user_id FROM events GROUP BY 1, 2
    )
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           COUNT(DISTINCT CASE WHEN daily.d = days.d THEN daily.user_id END) AS dau,
           COUNT(DISTINCT daily.user_id) AS wau
    FROM days
    JOIN daily ON daily.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
    GROUP BY days.d
    """,
    doc=(
        "DAU / trailing-7-day WAU: rolling DISTINCT users can't ride a "
        "window frame, so the scale shape is day-level pre-aggregation "
        "(events collapse to (day, user) first — the big reduction) "
        "followed by a 7-day range self-join over the tiny day-level "
        "relation."
    ),
    tags=("events", "engagement"),
)
def e_dau_wau(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    daily = events.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    days = daily.select("d").distinct().withColumnRenamed("d", "day_d")
    joined = days.join(
        daily,
        (F.col("d") >= F.date_sub(F.col("day_d"), 6)) & (F.col("d") <= F.col("day_d")),
    )
    return joined.groupBy("day_d").agg(
        F.countDistinct(
            F.when(F.col("d") == F.col("day_d"), F.col("user_id"))
        ).alias("dau"),
        F.countDistinct("user_id").alias("wau"),
    ).select(F.date_format("day_d", "yyyy-MM-dd").alias("day"), "dau", "wau")


@query(
    "e_anomaly_zscore",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT d, event_type, n,
             CAST(SUM(n) OVER w AS BIGINT)     AS s,
             CAST(SUM(n * n) OVER w AS BIGINT) AS sq,
             COUNT(*) OVER w                    AS k
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, event_type, n,
           CASE WHEN sq * k > s * s
                THEN CAST(FLOOR((n * k - s) / sqrt(CAST(sq * k - s * s AS DOUBLE))
                                * 1000000.0 + 0.5) AS BIGINT)
                ELSE 0 END AS z6
    FROM stats
    """,
    doc=(
        "Windowed z-score anomaly signal over daily event volumes: "
        "trailing-7-day mean/std from EXACT integer window sums "
        "(k*n - s over sqrt(k*sq - s^2) — no float accumulation, so "
        "the score is bit-identical across engines). The per-key "
        "volume-anomaly monitor an ingest pipeline alerts on."
    ),
    tags=("events", "anomaly"),
)
def e_anomaly_zscore(spark, sf_dir):
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.col("ts").cast("date").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    stats = daily.select(
        "d",
        "event_type",
        "n",
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("sq"),
        F.count(F.lit(1)).over(w).alias("k"),
    )
    var_num = F.col("sq") * F.col("k") - F.col("s") * F.col("s")
    z6 = F.floor(
        (F.col("n") * F.col("k") - F.col("s"))
        / F.sqrt(var_num.cast("double"))
        * 1000000.0
        + 0.5
    ).cast("long")
    return stats.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n",
        F.when(var_num > 0, z6).otherwise(F.lit(0)).alias("z6"),
    )


@query(
    "e_hll_mergeable_rollup",
    oracle=None,  # HLL estimates are engine-specific; property-tested
    doc=(
        "Mergeable-sketch rollup: per-day HLL sketches of user_id "
        "(hll_sketch_agg), then week-level distinct-user estimates by "
        "UNIONING the day sketches (hll_union_agg) — never re-touching "
        "the raw events. This is THE distinct-count pattern at 100 TB: "
        "the expensive pass happens once at the finest grain, every "
        "coarser rollup is a cheap sketch merge (re-aggregatable, "
        "unlike COUNT DISTINCT which must rescan). Property test bounds "
        "the estimate against exact per-week distincts."
    ),
    tags=("events", "sketch", "rollup"),
)
def e_hll_mergeable_rollup(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(F.date_trunc("DAY", "ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    )
    return (
        daily.groupBy(F.date_format(F.date_trunc("WEEK", "day"), "yyyy-MM-dd").alias("week"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count(F.lit(1)).alias("n_day_sketches"),
        )
    )


@query(
    "e_kll_mergeable_quantiles",
    oracle=None,  # sketch estimates are rank-error-bounded, not exact;
    # property test bounds the estimated quantiles' true ranks
    doc=(
        "Mergeable QUANTILE-sketch rollup (Apache DataSketches KLL, "
        "Spark 4.1 kll_sketch_agg_double): per-day KLL sketches of "
        "event value, merged to week grain with kll_merge_agg_double, "
        "then p50/p90/p99 read off the merged sketch — the quantile "
        "twin of e_hll_mergeable_rollup. At 100 TB this is how "
        "latency/size percentiles roll up across time grains without "
        "rescanning raw data: one fine-grain sketch pass, cheap "
        "re-aggregatable merges above it (exact percentiles cannot "
        "merge; percentile_approx cannot re-aggregate its results)."
    ),
    tags=("events", "sketch", "rollup", "quantiles"),
)
def e_kll_mergeable_quantiles(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(F.date_trunc("DAY", "ts").alias("day"), "value")
        .groupBy("day")
        .agg(F.kll_sketch_agg_double("value").alias("sk"))
    )
    merged = daily.groupBy(
        F.date_format(F.date_trunc("WEEK", "day"), "yyyy-MM-dd").alias("week")
    ).agg(
        F.kll_merge_agg_double("sk").alias("wk"),
        F.count(F.lit(1)).alias("n_day_sketches"),
    )
    return merged.select(
        "week",
        "n_day_sketches",
        F.kll_sketch_get_n_double("wk").alias("n_values"),
        F.kll_sketch_get_quantile_double("wk", F.lit(0.5)).alias("p50_est"),
        F.kll_sketch_get_quantile_double("wk", F.lit(0.9)).alias("p90_est"),
        F.kll_sketch_get_quantile_double("wk", F.lit(0.99)).alias("p99_est"),
    )


@query(
    "e_theta_audience_overlap",
    oracle=None,  # sketch estimates; property-tested against exact overlap
    doc=(
        "Theta-sketch set algebra (Apache DataSketches, Spark 4.1): "
        "per-event-type sketches of user_id, then audience "
        "INTERSECTION and DIFFERENCE estimates across types — "
        "purchase AND error, purchase MINUS error — without touching "
        "raw data twice. HLL can only union; theta sketches are the "
        "100 TB answer to overlap/retention questions (how many users "
        "who did X also did Y) as mergeable state."
    ),
    tags=("events", "sketch", "setops"),
)
def e_theta_audience_overlap(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    sk = (
        events.groupBy("event_type")
        .agg(F.theta_sketch_agg("user_id").alias("sk"))
        .persist()  # tiny (one sketch per type); referenced twice below
    )
    a = sk.filter(F.col("event_type") == "purchase").select(F.col("sk").alias("a"))
    b = sk.filter(F.col("event_type") == "error").select(F.col("sk").alias("b"))
    both = a.crossJoin(b)
    return both.select(
        F.theta_sketch_estimate(F.col("a")).cast("long").alias("purchase_users"),
        F.theta_sketch_estimate(F.col("b")).cast("long").alias("error_users"),
        F.theta_sketch_estimate(F.theta_intersection("a", "b"))
        .cast("long")
        .alias("both_users"),
        F.theta_sketch_estimate(F.theta_difference("a", "b"))
        .cast("long")
        .alias("purchase_only_users"),
    )


@query(
    "e_trend_forecast",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 - 19700 AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT)    AS n,
             CAST(SUM(x) AS BIGINT)      AS sx,
             CAST(SUM(y) AS BIGINT)      AS sy,
             CAST(SUM(x * x) AS BIGINT)  AS sxx,
             CAST(SUM(x * y) AS BIGINT)  AS sxy,
             CAST(MAX(x) AS BIGINT)      AS max_x
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(FLOOR(
             (CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx))
             * 1000000.0 + 0.5) AS BIGINT) AS slope6,
           CAST(FLOOR(
             ((CAST(sy AS DOUBLE)
               - (CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)) * sx) / n
              + (CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)) * (max_x + 1))
             * 1000000.0 + 0.5) AS BIGINT) AS forecast_next6
    FROM s
    """,
    doc=(
        "Per-type linear trend + next-day forecast over daily event "
        "counts. Least-squares slope/intercept are computed from EXACT "
        "integer sums (n, Σx, Σy, Σx², Σxy — all BIGINT, "
        "order-independent) with one final double division, instead of "
        "the engines' regr_slope aggregates whose double partial sums "
        "are accumulation-order-dependent and hash-unstable across "
        "engines. Two cascaded hash aggregates; x is days-since-2024 "
        "epoch to keep products in exact-double range."
    ),
    tags=("events", "forecast", "regression"),
)
def e_trend_forecast(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        (
            F.floor(F.unix_timestamp(F.date_trunc("DAY", "ts")) / F.lit(86400))
            - F.lit(19700)
        )
        .cast("long")
        .alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.max("x").cast("long").alias("max_x"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    intercept = (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n")
    fcast = intercept + slope * (F.col("max_x") + F.lit(1))
    return s.select(
        "event_type",
        "n",
        F.floor(slope * 1000000.0 + F.lit(0.5)).cast("long").alias("slope6"),
        F.floor(fcast * 1000000.0 + F.lit(0.5)).cast("long").alias("forecast_next6"),
    )


@query(
    "e_path_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM ordered WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    ORDER BY n DESC, prev_type, next_type LIMIT 20
    """,
    doc=(
        "User path analysis: top event-type transition bigrams "
        "(prev → next per user session ordering, unique (ts, event_id) "
        "tiebreak). One window shuffle on user_id, one hash aggregate, "
        "TakeOrderedAndProject top-20 with a total-order tiebreak."
    ),
    tags=("events", "paths", "window"),
)
def e_path_transitions(spark, sf_dir):
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        ordered.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "prev_type", "next_type")
        .limit(20)
    )


@query(
    "e_seq_pairs",
    oracle="""
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
    GROUP BY a.event_type, b.event_type
    HAVING COUNT(DISTINCT a.user_id) >= 3
    """,
    doc=(
        "Sequential-pattern pair mining: (A then B) event-type "
        "patterns supported by >= 3 users. Support is decided WITHOUT "
        "touching row pairs: a user supports (A,B) iff their FIRST A "
        "precedes their LAST B under the (ts, event_id) total order — "
        "equivalent to 'exists i<j' by a two-line argument, but "
        "computed from one (user, type)-grain min/max aggregate, so "
        "work is linear in events plus |types|^2 per user instead of "
        "|timeline|^2 per user (the naive self-join measured 9.8x "
        "wall at 10x data as timelines lengthened; this form is "
        "flat). tests/test_llm.py proves pyspark.ml PrefixSpan's "
        "length-2 singleton patterns reproduce exactly this relation "
        "at the equivalent support."
    ),
    tags=("events", "sequence", "fpm"),
)
def e_seq_pairs(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    typed = events.select(
        "user_id",
        "event_type",
        F.struct(F.col("ts"), F.col("event_id")).alias("k"),
    )
    agg = typed.groupBy("user_id", "event_type").agg(
        F.min("k").alias("first_k"), F.max("k").alias("last_k")
    )
    a = agg.select(
        "user_id", F.col("event_type").alias("type_a"), "first_k"
    )
    b = agg.select(
        "user_id", F.col("event_type").alias("type_b"), "last_k"
    )
    pairs = a.join(b, "user_id").filter(F.col("first_k") < F.col("last_k"))
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .filter(F.col("n_users") >= 3)
    )


@query(
    "e_chi2_independence",
    oracle="""
    WITH obs AS (
      SELECT event_type, CAST(user_id % 4 AS BIGINT) AS cohort,
             COUNT(*) AS o
      FROM events GROUP BY event_type, cohort
    ), margins AS (
      SELECT event_type, cohort, o,
             SUM(o) OVER (PARTITION BY event_type) AS row_tot,
             SUM(o) OVER (PARTITION BY cohort)     AS col_tot,
             SUM(o) OVER ()                        AS n
      FROM obs
    )
    SELECT event_type, cohort, CAST(o AS BIGINT) AS observed,
           CAST(FLOOR(row_tot * col_tot / CAST(n AS DOUBLE) * 1000000.0 + 0.5)
                AS BIGINT) AS expected6,
           CAST(FLOOR(
             (o - row_tot * col_tot / CAST(n AS DOUBLE))
             * (o - row_tot * col_tot / CAST(n AS DOUBLE))
             / (row_tot * col_tot / CAST(n AS DOUBLE)) * 1000000.0 + 0.5)
                AS BIGINT) AS chi2_contrib6
    FROM margins
    """,
    doc=(
        "Chi-square independence audit: observed vs expected counts "
        "for the event_type x cohort contingency table, with each "
        "cell's chi2 contribution — the data-drift / A-B "
        "sample-ratio-mismatch test over exact integer margins "
        "(window sums share one pass; expected values derive from "
        "the same double arithmetic in both engines, floored to "
        "1e-6)."
    ),
    tags=("events", "statistics"),
)
def e_chi2_independence(spark, sf_dir):
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    obs = (
        events.select("event_type", (F.col("user_id") % 4).cast("long").alias("cohort"))
        .groupBy("event_type", "cohort")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("cohort")
    wall = Window.partitionBy()
    m = (
        obs.withColumn("row_tot", F.sum("o").over(wr))
        .withColumn("col_tot", F.sum("o").over(wc))
        .withColumn("n", F.sum("o").over(wall))
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n").cast("double")
    return m.select(
        "event_type",
        "cohort",
        F.col("o").cast("long").alias("observed"),
        F.floor(e * 1000000.0 + 0.5).cast("long").alias("expected6"),
        F.floor((F.col("o") - e) * (F.col("o") - e) / e * 1000000.0 + 0.5)
        .cast("long")
        .alias("chi2_contrib6"),
    )
