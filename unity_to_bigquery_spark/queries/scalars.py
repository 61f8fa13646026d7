"""Scalar-function declared queries (SURVEY.md §2B Scalar functions):
string / date-time / math / conditional / array / higher-order / map /
JSON families, each exercised over fixture columns with portable
outputs (transcendental results fixed-point-floored; dates formatted).

Row-level sampling uses deterministic key-modulo filters so outputs
stay bounded at any scale factor while still covering value diversity.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from unity_to_bigquery_spark.catalog import load_table, register_views
from unity_to_bigquery_spark.registry import query


@query(
    "f_string_ops",
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS cust_num,
           upper(c_mktsegment)                    AS seg_upper,
           lower(c_name)                          AS name_lower,
           length(c_name)                         AS name_len,
           substring(c_name, 1, 8)                AS name_prefix,
           c_mktsegment || ':' || c_name          AS tagged,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           replace(c_name, 'Customer', 'C')       AS short_name,
           split_part(c_name, '#', 2)             AS after_hash,
           CASE WHEN c_name LIKE 'Customer#%' THEN 1 ELSE 0 END AS is_std
    FROM customer WHERE c_custkey % 7 = 0
    """,
    doc="String family: regexp_extract, case, length, substring, concat, pad, replace, split_part, LIKE.",
    tags=("scalar", "string"),
)
def f_string_ops(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 7 == 0)
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).cast("long").alias("cust_num"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("tagged"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.regexp_replace("c_name", "Customer", "C").alias("short_name"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("after_hash"),
        F.when(F.col("c_name").like("Customer#%"), 1).otherwise(0).alias("is_std"),
    )


@query(
    "f_date_ops",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                                   AS y,
           month(o_orderdate)                                  AS m,
           day(o_orderdate)                                    AS d,
           quarter(o_orderdate)                                AS q,
           isodow(o_orderdate)                                 AS dow_iso,
           CAST(epoch(o_orderdate) AS BIGINT)                  AS epoch_s,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(last_day(o_orderdate), '%Y-%m-%d')         AS month_end,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95
    FROM orders WHERE o_orderkey % 97 = 0
    """,
    doc="Date/time family (generalizes reference date arithmetic, Unity_to_BigQuery.py:52-53,157).",
    tags=("scalar", "datetime"),
)
def f_date_ops(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        (F.weekday("o_orderdate") + 1).alias("dow_iso"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days_since_95"),
    )


@query(
    "f_math_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25)                                   AS abs_dev,
           CAST(pow(l_quantity, 2) AS DOUBLE)                     AS qty_sq,
           CAST(FLOOR(sqrt(l_extendedprice) * 1000000.0 + 0.5) AS BIGINT) AS sqrt_p6,
           CAST(FLOOR(ln(l_extendedprice)   * 1000000.0 + 0.5) AS BIGINT) AS ln_p6,
           CAST(FLOOR(log10(l_extendedprice)* 1000000.0 + 0.5) AS BIGINT) AS log10_p6,
           l_orderkey % 7                                         AS mod7,
           sign(l_discount - 0.05)                                AS disc_sign,
           CAST(FLOOR(l_quantity - 25.5) AS BIGINT)               AS flr,
           CAST(CEIL(l_quantity - 25.5)  AS BIGINT)               AS cl,
           CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)     AS price_cents,
           l_orderkey // 100                                      AS okey_div
    FROM lineitem WHERE l_orderkey % 101 = 0
    """,
    doc="Math family; transcendentals fixed-point-floored for portability.",
    tags=("scalar", "math"),
)
def f_math_ops(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    p = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("abs_dev"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.floor(F.sqrt(p) * 1000000.0 + 0.5).alias("sqrt_p6"),
        F.floor(F.log(p) * 1000000.0 + 0.5).alias("ln_p6"),
        F.floor(F.log10(p) * 1000000.0 + 0.5).alias("log10_p6"),
        F.pmod("l_orderkey", F.lit(7)).alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.floor(F.col("l_quantity") - 25.5).alias("flr"),
        F.ceil(F.col("l_quantity") - 25.5).alias("cl"),
        F.floor(p * 100 + 0.5).alias("price_cents"),
        F.expr("l_orderkey div 100").alias("okey_div"),
    )


@query(
    "f_conditional_buckets",
    oracle="""
    SELECT CASE WHEN value < 10 THEN 'low'
                WHEN value < 100 THEN 'mid'
                ELSE 'high' END AS value_bucket,
           CASE WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
                WHEN event_type = 'error' THEN 'problem'
                ELSE 'engagement' END AS funnel,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
    doc="Conditional expressions (reference routing A9 analogue).",
    tags=("scalar", "conditional"),
)
def f_conditional_buckets(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            F.when(F.col("value") < 10, "low")
            .when(F.col("value") < 100, "mid")
            .otherwise("high")
            .alias("value_bucket"),
            F.when(F.col("event_type").isin("purchase", "signup"), "conversion")
            .when(F.col("event_type") == "error", "problem")
            .otherwise("engagement")
            .alias("funnel"),
        )
        .groupBy("value_bucket", "funnel")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "f_array_ops",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                          AS n_words,
           len(list_distinct(string_split(text, ' ')))          AS n_distinct,
           array_to_string((list_sort(list_distinct(string_split(text, ' '))))[1:3], ',') AS first3,
           CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 1 ELSE 0 END AS has_the
    FROM documents WHERE doc_id % 11 = 0
    """,
    doc="Array family: split, size, distinct, sort, slice, contains.",
    tags=("scalar", "array"),
)
def f_array_ops(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(words)), 1, 3), ",").alias("first3"),
        F.when(F.array_contains(words, "the"), 1).otherwise(0).alias("has_the"),
    )


@query(
    "f_hof_embeddings",
    oracle="""
    SELECT vec_id,
           CAST(FLOOR(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS sumsq6,
           CAST(FLOOR(list_sum(list_transform(list_zip(embedding, list_reverse(embedding)),
                                              s -> s[1]::DOUBLE * s[2]::DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS revdot6,
           CAST(FLOOR(embedding[1]::DOUBLE * 1000000.0 + 0.5) AS BIGINT) AS first6,
           len(list_filter(embedding, x -> x > 0)) AS n_pos
    FROM embeddings WHERE vec_id % 13 = 0
    """,
    doc=(
        "Higher-order array functions (transform/aggregate/zip_with/"
        "filter) — the JVM-side vector math used by similarity search."
    ),
    tags=("scalar", "array", "hof"),
)
def f_hof_embeddings(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 13 == 0)
    e = F.col("embedding")
    dbl = lambda x: x.cast("double")  # noqa: E731
    sumsq = F.aggregate(
        F.transform(e, lambda x: dbl(x) * dbl(x)), F.lit(0.0), lambda a, x: a + x
    )
    revdot = F.aggregate(
        F.zip_with(e, F.reverse(e), lambda a, b: dbl(a) * dbl(b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.floor(sumsq * 1000000.0 + 0.5).alias("sumsq6"),
        F.floor(revdot * 1000000.0 + 0.5).alias("revdot6"),
        F.floor(dbl(F.element_at(e, 1)) * 1000000.0 + 0.5).alias("first6"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
    )


@query(
    "f_map_json_ops",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',')  AS keys_str,
           CAST(json_extract(props, '$.k') AS BIGINT)         AS k_val,
           json_extract_string(props, '$.k')                  AS k_str,
           CAST(to_json(struct_pack(t := event_type, k := CAST(json_extract(props, '$.k') AS BIGINT))) AS VARCHAR) AS repacked
    FROM events WHERE event_id % 53 = 0
    """,
    doc=(
        "Map + JSON families over the opaque event payloads (mirrors the "
        "reference's NDJSON passthrough, Unity_to_BigQuery.py:136-141)."
    ),
    tags=("scalar", "map", "json"),
)
def f_map_json_ops(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 53 == 0)
    m = F.from_json(F.col("props"), "map<string,bigint>")
    k_val = F.get_json_object(F.col("props"), "$.k").cast("long")
    return events.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_str"),
        k_val.alias("k_val"),
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
        F.to_json(F.struct(F.col("event_type").alias("t"), k_val.alias("k"))).alias("repacked"),
    )


@query(
    "f_null_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_discount, 0.0), -1.0)       AS disc_or_flag,
           CASE WHEN NULLIF(l_tax, 0.0) IS NULL THEN 1 ELSE 0 END AS tax_was_zero,
           GREATEST(l_quantity, l_tax * 100)              AS biggest,
           LEAST(l_quantity, l_extendedprice / 1000)      AS smallest,
           IFNULL(NULLIF(l_returnflag, 'N'), 'neutral')   AS flag_label
    FROM lineitem WHERE l_orderkey % 103 = 0
    """,
    doc="Null-handling family: coalesce/nullif/ifnull/greatest/least.",
    tags=("scalar", "null"),
)
def f_null_ops(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 103 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif("l_discount", F.lit(0.0)), F.lit(-1.0)).alias("disc_or_flag"),
        F.when(F.nullif("l_tax", F.lit(0.0)).isNull(), 1).otherwise(0).alias("tax_was_zero"),
        F.greatest("l_quantity", F.col("l_tax") * 100).alias("biggest"),
        F.least("l_quantity", F.col("l_extendedprice") / 1000).alias("smallest"),
        F.ifnull(F.nullif("l_returnflag", F.lit("N")), F.lit("neutral")).alias("flag_label"),
    )


@query(
    "f_sql_frontend_q01",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc=(
        "SQL-frontend parity: the flagship aggregation submitted as SQL "
        "text through spark.sql over registered views — same Catalyst "
        "plan as the DataFrame form."
    ),
    tags=("sql",),
)
def f_sql_frontend_q01(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )


@query(
    "f_sql_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
    doc=(
        "SQL PIPE SYNTAX (Spark 4 |> operators — the linear query "
        "notation): FROM |> WHERE |> AGGREGATE ... GROUP BY, parsed "
        "by the engine's own frontend into the identical plan the "
        "nested form produces; the oracle is the classic form in "
        "DuckDB, so the hash proves semantic equivalence of the two "
        "notations, not just that the syntax parses."
    ),
    tags=("scalar", "sql-frontend"),
)
def f_sql_pipe_syntax(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5)
                                   AS BIGINT)) AS BIGINT) AS total_cents
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n_orders, total_cents
        """
    )


@query(
    "f_explode_variants",
    oracle="""
    SELECT doc_id, pos, word FROM (
      SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             unnest(string_split(text, ' ')) AS word
      FROM documents
    ) WHERE doc_id % 83 = 0 AND pos < 4
    """,
    doc="posexplode (table-generating projection) with position output.",
    tags=("scalar", "generator"),
)
def f_explode_variants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 83 == 0)
    return (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .filter(F.col("pos") < 4)
    )


@query(
    "f_sample_deterministic",
    oracle=None,  # Bernoulli sampling is engine-specific; bounds checked here
    doc="Seeded Bernoulli sample — rows-only + sanity bounds (10% ±5pp).",
    tags=("scalar", "sample"),
)
def f_sample_deterministic(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    sampled = li.sample(fraction=0.1, seed=42)
    return sampled.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.floor(F.count(F.lit(1)) * 10).alias("approx_total"),
    )


@query(
    "f_url_ops",
    oracle="""
    SELECT doc_id,
           regexp_extract(url, 'https?://([^/]+)', 1)            AS host,
           regexp_extract(url, 'https?://[^/]+(/[^?#]*)', 1)     AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1)            AS lang_param,
           regexp_extract(regexp_extract(url, 'https?://([^/]+)', 1),
                          '([^.]+\\.[^.]+)$', 1)                  AS reg_domain
    FROM (
      SELECT doc_id,
             'https://www.' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&v=2' AS url
      FROM documents WHERE doc_id % 11 = 0
    ) u
    """,
    doc=(
        "URL parsing for corpus domain filtering: host/path/query-param "
        "extraction (Spark parse_url, JVM-side) plus registrable-domain "
        "suffix — the key of every domain-level quality/spam filter."
    ),
    tags=("scalar", "url", "training"),
)
def f_url_ops(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    host = F.parse_url(url, F.lit("HOST"))
    return docs.select(
        "doc_id",
        host.alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("reg_domain"),
    )


@query(
    "f_bitwise_ops",
    oracle="""
    SELECT p_partkey,
           p_partkey & 255                          AS low_byte,
           p_partkey | 4096                         AS with_flag,
           xor(p_partkey, 1431655765)               AS toggled,
           p_partkey << 3                           AS shl3,
           p_partkey >> 2                           AS shr2,
           bit_count(p_partkey)                     AS popcount
    FROM part WHERE p_partkey % 13 = 0
    """,
    doc="Bitwise family: AND/OR/XOR, shifts, popcount over keys.",
    tags=("scalar", "bitwise"),
)
def f_bitwise_ops(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 13 == 0)
    k = F.col("p_partkey")
    return part.select(
        "p_partkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(1431655765)).alias("toggled"),
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        F.bit_count(k).cast("long").alias("popcount"),
    )


@query(
    "f_variant_ops",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT)  AS k_val,
           json_extract_string(props, '$.absent')      AS absent_val,
           json_extract(props, '$')::VARCHAR           AS normalized,
           CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 50
                THEN 'high' ELSE 'low' END             AS k_bucket
    FROM events WHERE event_id % 29 = 0
    """,
    doc=(
        "VariantType (Spark 4) over the opaque event payloads: "
        "parse_json -> variant, typed variant_get extraction, "
        "try_variant_get on a missing path (NULL, no error), and "
        "canonical JSON re-serialization. The variant binary encoding "
        "is the scale path for semi-structured scans: parse once at "
        "ingest, shredded typed access afterward (vs re-parsing JSON "
        "text per predicate, as f_map_json_ops does)."
    ),
    tags=("scalar", "variant", "json"),
)
def f_variant_ops(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 29 == 0)
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "bigint")
    return events.select(
        "event_id",
        k.alias("k_val"),
        F.try_variant_get(v, "$.absent", "string").alias("absent_val"),
        F.to_json(v).alias("normalized"),
        F.when(k >= 50, "high").otherwise("low").alias("k_bucket"),
    )


@query(
    "f_try_ops",
    oracle="""
    SELECT doc_id,
           try_cast(s AS BIGINT) AS maybe_num,
           CAST(FLOOR(COALESCE(n_chars / NULLIF(doc_id % 7, 0), -1.0) * 100 + 0.5) AS BIGINT)
             AS ratio_c2,
           try_cast('2024-' || lpad(CAST(doc_id % 15 AS VARCHAR), 2, '0') || '-01' AS DATE)
             IS NOT NULL AS valid_month
    FROM (
      SELECT doc_id, n_chars,
             CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id AS VARCHAR)
                  ELSE 'n' || CAST(doc_id AS VARCHAR) END AS s
      FROM documents WHERE doc_id % 13 = 0
    )
    """,
    doc=(
        "Error-safe function family (try_cast / try_divide): malformed "
        "numerics, zero denominators, and invalid dates degrade to NULL "
        "instead of failing the job — at 100 TB a single poisoned row "
        "must never kill the pipeline (the ANSI-safe analogue of the "
        "malformed-record quarantine on the scan side)."
    ),
    tags=("scalar", "try"),
)
def f_try_ops(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 0)
    s = F.when(
        F.col("doc_id") % 3 == 0, F.col("doc_id").cast("string")
    ).otherwise(F.concat(F.lit("n"), F.col("doc_id").cast("string")))
    date_str = F.concat(
        F.lit("2024-"),
        F.lpad((F.col("doc_id") % 15).cast("string"), 2, "0"),
        F.lit("-01"),
    )
    return docs.select(
        "doc_id",
        s.try_cast("bigint").alias("maybe_num"),
        F.floor(
            F.coalesce(
                F.try_divide(F.col("n_chars"), F.col("doc_id") % 7), F.lit(-1.0)
            )
            * 100
            + 0.5
        ).cast("long").alias("ratio_c2"),
        date_str.try_cast("date").isNotNull().alias("valid_month"),
    )


@query(
    "a_histogram_bins",
    oracle="""
    SELECT LEAST(GREATEST(CAST(FLOOR(value / 25.0) AS BIGINT), 0), 7) AS bin,
           COUNT(*) AS n,
           CAST(FLOOR(MIN(value) * 100 + 0.5) AS BIGINT) AS min_c2,
           CAST(FLOOR(MAX(value) * 100 + 0.5) AS BIGINT) AS max_c2
    FROM events GROUP BY bin
    """,
    doc=(
        "Equi-width histogram (8 bins of 25 over value, clamped): the "
        "single-pass binning aggregate behind every profiling/quality "
        "dashboard — floor arithmetic, portable across engines."
    ),
    tags=("aggregate", "histogram"),
)
def a_histogram_bins(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    bin_ = F.least(
        F.greatest(F.floor(F.col("value") / 25.0).cast("long"), F.lit(0)), F.lit(7)
    )
    return events.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.min("value") * 100 + 0.5).cast("long").alias("min_c2"),
        F.floor(F.max("value") * 100 + 0.5).cast("long").alias("max_c2"),
    )


@query(
    "f_xml_ops",
    oracle="""
    SELECT doc_id,
           CAST(regexp_extract(x, '<chars>([0-9]+)</chars>', 1) AS BIGINT) AS chars_val,
           regexp_extract(x, '<src>([a-z0-9]+)</src>', 1)                  AS src_val,
           regexp_extract(x, '<lang code="([a-z]+)"', 1)                   AS lang_attr
    FROM (
      SELECT doc_id,
             '<doc><chars>' || CAST(n_chars AS VARCHAR) || '</chars><src>' || source
               || '</src><lang code="' || lang || '"/></doc>' AS x
      FROM documents WHERE doc_id % 23 = 0
    )
    """,
    doc=(
        "XML extraction (Spark 4): from_xml to a typed struct plus "
        "xpath attribute access over synthesized per-row XML payloads "
        "(semi-structured ingest the reference would pass opaque, like "
        "its NDJSON). Oracle mirrors via regexp (DuckDB has no XML)."
    ),
    tags=("scalar", "xml"),
)
def f_xml_ops(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 23 == 0)
    x = F.concat(
        F.lit("<doc><chars>"),
        F.col("n_chars").cast("string"),
        F.lit("</chars><src>"),
        F.col("source"),
        F.lit('</src><lang code="'),
        F.col("lang"),
        F.lit('"/></doc>'),
    )
    parsed = F.from_xml(x, "chars BIGINT, src STRING")
    return docs.select(
        "doc_id",
        parsed.getField("chars").alias("chars_val"),
        parsed.getField("src").alias("src_val"),
        F.xpath_string(x, F.lit("/doc/lang/@code")).alias("lang_attr"),
    )


@query(
    "f_sql_udf",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
                         AS BIGINT)) AS BIGINT) AS disc_cents
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "SQL-defined scalar UDF (Spark 4 CREATE FUNCTION ... RETURN "
        "expr): the discounted-price function declared IN SQL, then "
        "used inside an aggregate. Catalyst inlines the body into the "
        "plan — full codegen, no Python boundary — which is exactly "
        "why SQL UDFs are the scale-safe default over F.udf. Oracle "
        "inlines the same expression."
    ),
    tags=("function", "sql-udf"),
)
def f_sql_udf(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_sqludf_lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_cents(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN CAST(FLOOR(p * (1.0 - d) * 100.0 + 0.5) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(disc_cents(l_extendedprice, l_discount)) AS BIGINT)
                 AS disc_cents
        FROM _sqludf_lineitem GROUP BY l_returnflag
        """
    )


@query(
    "f_collation_ci",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                  ELSE lower(c_mktsegment) END AS seg
      FROM customer
    )
    SELECT MIN(seg) AS rep, CAST(COUNT(*) AS BIGINT) AS n
    FROM mixed GROUP BY lower(seg)
    """,
    doc=(
        "Case-insensitive string collation (Spark 4 COLLATE "
        "UNICODE_CI): a deterministically case-mangled segment column "
        "grouped under the CI collation — upper/lower variants land "
        "in one group without materializing a normalized key. The "
        "group representative is the binary MIN of the original "
        "strings (deterministic in both engines); the oracle models "
        "the same partition with lower()."
    ),
    tags=("function", "collation"),
)
def f_collation_ci(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    mixed = cust.select(
        F.when(F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment"))
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg")
    )
    return (
        mixed.groupBy(F.expr("seg COLLATE UNICODE_CI").alias("__g"))
        .agg(
            F.min(F.col("seg")).alias("rep"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select("rep", "n")
    )


@query(
    "f_execute_immediate",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 1000.0
    GROUP BY n_name
    """,
    doc=(
        "Dynamic SQL (Spark 4 EXECUTE IMMEDIATE ... USING): the query "
        "text assembled at runtime with a positional parameter bound "
        "server-side — the injection-safe alternative to string "
        "concatenation the reference's config-driven dispatch would "
        "want. Catalyst plans the inner statement normally "
        "(broadcast nation, pushed filter)."
    ),
    tags=("function", "dynamic-sql"),
)
def f_execute_immediate(spark, sf_dir):
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_ei_customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_ei_nation")
    return spark.sql(
        "EXECUTE IMMEDIATE "
        "'SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers "
        "FROM _ei_customer JOIN _ei_nation ON c_nationkey = n_nationkey "
        "WHERE c_acctbal > ? GROUP BY n_name' "
        "USING 1000.0"
    )
