"""Training-data-pipeline declared queries (BASELINE.json north star,
beyond the reference's surface): the corpus-preparation operators a
large-scale LLM training pipeline runs between raw ingest (the
reference's A1-A12 landing zone) and the trainer.

All six are pure JVM-side dataflow (no Python UDFs) with DuckDB
oracles. Scale notes per query; the common theme is that each is a
scan + one shuffle (or zero, for the per-row filters), so they
pipeline with the ingest job at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from unity_to_bigquery_spark.catalog import load_table
from unity_to_bigquery_spark.llm.dedup import with_shingles
from unity_to_bigquery_spark.registry import query


def _portable_hash(c):
    """First 15 hex chars of md5 as a non-negative BIGINT — the repo's
    engine-portable hash family (same scheme as llm/dedup.py)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


@query(
    "t_repetition_filter",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    c AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
    s AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
             COUNT(*) AS n_distinct, MAX(c) AS top_c
      FROM c GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(FLOOR((n_words - n_distinct) * 1000000.0 / n_words + 0.5) AS BIGINT)
             AS repeated_frac6,
           CAST(FLOOR(top_c * 1000000.0 / n_words + 0.5) AS BIGINT)
             AS top_word_frac6,
           ((n_words - n_distinct) * 1000000.0 / n_words < 800000.0
            AND top_c * 1000000.0 / n_words < 300000.0) AS keep
    FROM s
    """,
    doc=(
        "Gopher-style repetition filter: repeated-word fraction and "
        "top-word fraction per document, plus the keep/drop verdict. "
        "Scale: explode + two hash aggregates keyed by doc_id — "
        "map-side combine collapses the fan-out before the one shuffle."
    ),
    tags=("llm", "training", "quality"),
)
def t_repetition_filter(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    c = w.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    s = c.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    rep = (F.col("n_words") - F.col("n_distinct")) * 1000000.0 / F.col("n_words")
    top = F.col("top_c") * 1000000.0 / F.col("n_words")
    return s.select(
        "doc_id",
        F.floor(rep + 0.5).cast("long").alias("repeated_frac6"),
        F.floor(top + 0.5).cast("long").alias("top_word_frac6"),
        ((rep < 800000.0) & (top < 300000.0)).alias("keep"),
    )


@query(
    "p_train_test_split",
    oracle="""
    SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'valid'
                ELSE 'test' END AS split,
           source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT source, n_chars,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
      FROM documents
    ) GROUP BY split, source
    """,
    doc=(
        "Deterministic 90/5/5 train/valid/test split by content-stable "
        "hash of doc_id — the standard leakage-proof split (no RNG, "
        "reproducible across runs and engines). Scale: per-row hash in "
        "codegen, one shuffle for the count rollup."
    ),
    tags=("llm", "training", "split"),
)
def p_train_test_split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    b = _portable_hash(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(b < 90, "train").when(b < 95, "valid").otherwise("test").alias("split")
    )
    return (
        docs.select(split, "source", "n_chars")
        .groupBy("split", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@query(
    "t_decontaminate",
    oracle="""
    WITH sh AS (
      SELECT doc_id, unnest(
        CASE WHEN len(ws) >= 3
             THEN list_distinct(list_transform(generate_series(1, len(ws) - 2),
                                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
             ELSE [] END) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
    flag AS (
      SELECT DISTINCT sh.doc_id FROM sh JOIN bench USING (s)
      WHERE sh.doc_id % 97 <> 0
    )
    SELECT d.source, COUNT(*) AS n_train,
           COUNT(f.doc_id) AS n_contaminated
    FROM documents d LEFT JOIN flag f ON d.doc_id = f.doc_id
    WHERE d.doc_id % 97 <> 0
    GROUP BY d.source
    """,
    doc=(
        "Benchmark decontamination: flag training documents sharing any "
        "3-gram shingle with the held-out set (docs with doc_id%97==0 "
        "stand in for the benchmark). Scale: the benchmark shingle set "
        "is small by construction -> broadcast semi-join against the "
        "training shingle stream; no full shuffle of the corpus."
    ),
    tags=("llm", "training", "decontamination"),
)
def t_decontaminate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sh = with_shingles(docs, n=3).select("doc_id", F.explode("sh").alias("s"))
    is_bench = F.col("doc_id") % 97 == 0
    bench = sh.filter(is_bench).select("s").distinct()
    flagged = (
        sh.filter(~is_bench)
        .join(F.broadcast(bench), "s", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        docs.filter(~is_bench)
        .join(flagged, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.count("hit").alias("n_contaminated"),
        )
    )


@query(
    "t_pii_scrub",
    oracle="""
    WITH synth AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example or x' || CAST(doc_id AS VARCHAR)
                  || '@corp.example tel 555-0199' AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9.]+')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '\\d{3}-\\d{4}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '[a-z0-9._]+@[a-z0-9.]+',
                                             '<EMAIL>', 'g'),
                              '\\d{3}-\\d{4}', '<PHONE>', 'g')) AS redacted_md5
    FROM synth
    """,
    doc=(
        "PII scrubbing: count and redact email/phone patterns (a "
        "deterministic synthetic PII suffix is appended so the fixture "
        "corpus actually exercises the regexes; both engines see the "
        "same bytes). Scale: per-row regex in codegen, zero shuffles."
    ),
    tags=("llm", "training", "pii"),
)
def t_pii_scrub(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example or x"),
        F.col("doc_id").cast("string"),
        F.lit("@corp.example tel 555-0199"),
    )
    email = r"[a-z0-9._]+@[a-z0-9.]+"
    phone = r"\d{3}-\d{4}"
    redacted = F.regexp_replace(
        F.regexp_replace(t, email, "<EMAIL>"), phone, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(email)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(phone)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


@query(
    "p_sequence_packing",
    oracle="""
    WITH t AS (
      SELECT source, doc_id, len(string_split(text, ' ')) AS tokens
      FROM documents
    ),
    r AS (
      SELECT source, doc_id, tokens,
             CAST(SUM(tokens) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS running
      FROM t
    )
    SELECT source, CAST(FLOOR((running - 1) / 2048.0) AS BIGINT) AS chunk,
           COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS chunk_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM r GROUP BY source, chunk
    """,
    doc=(
        "Sequence packing (concat-then-chunk): documents are laid out in "
        "stable doc_id order per source and cut into 2048-token chunks "
        "by running token count — the standard way training examples are "
        "packed from variable-length documents. Scale: one shuffle to "
        "sort within source partitions (running-sum window), then a "
        "partition-local rollup."
    ),
    tags=("llm", "training", "packing"),
)
def p_sequence_packing(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = t.withColumn("running", F.sum("tokens").over(w))
    return (
        r.withColumn("chunk", F.floor((F.col("running") - 1) / 2048.0).cast("long"))
        .groupBy("source", "chunk")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").alias("chunk_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "p_stratified_sample",
    oracle="""
    SELECT source, COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM (
      SELECT source, n_chars
      FROM documents
      WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#' || source), 1, 15))::BIGINT
            % 1000 < 100
    ) GROUP BY source
    """,
    doc=(
        "Stratified 10% sample, deterministic per (doc_id, source) "
        "stratum hash — reproducible downsampling for ablation corpora "
        "(contrast f_sample_deterministic's Bernoulli RNG sampler). "
        "Scale: per-row hash filter in codegen before any shuffle."
    ),
    tags=("llm", "training", "sampling"),
)
def p_stratified_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    h = _portable_hash(F.concat(F.col("doc_id").cast("string"), F.lit("#"), F.col("source")))
    return (
        docs.filter(h % 1000 < 100)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.sum("n_chars").alias("kept_chars"))
    )


@query(
    "p_corpus_pipeline",
    oracle="""
    WITH feat AS (
      SELECT doc_id, source, text, n_chars,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents
    ),
    kept AS (
      SELECT * FROM feat
      WHERE n_chars >= 50 AND n_words >= 10
        AND n_distinct * 1000000.0 / n_words > 200000.0
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    ),
    split AS (
      SELECT source, n_words,
             CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 95
                  THEN 'train' ELSE 'heldout' END AS split
      FROM deduped
    )
    SELECT split, source, COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_tokens
    FROM split GROUP BY split, source
    """,
    doc=(
        "End-to-end corpus preparation in ONE dataflow: quality gate "
        "(length + lexical-diversity thresholds) -> exact dedup "
        "(min-id survivor) -> deterministic 95/5 split -> per-(split, "
        "source) doc/token totals. One window shuffle + one agg "
        "shuffle; filters run in the scan. The composition the "
        "individual t_*/d_*/p_* operators exist to serve."
    ),
    tags=("llm", "training", "pipeline"),
)
def p_corpus_pipeline(spark, sf_dir):
    from pyspark.sql import Window

    # filter on the STORED n_chars column (== length(text) by fixture
    # contract) so the length gate pushes into the parquet scan and
    # row-group stats can skip — recomputing length(text) would hide
    # the predicate behind a projection
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    feat = docs.select(
        "doc_id",
        "source",
        "text",
        "n_chars",
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
    )
    kept = feat.filter(
        (F.col("n_chars") >= 50)
        & (F.col("n_words") >= 10)
        & (F.col("n_distinct") * 1000000.0 / F.col("n_words") > 200000.0)
    )
    deduped = (
        kept.withColumn(
            "rn", F.row_number().over(Window.partitionBy("text").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
    )
    split = F.when(
        _portable_hash(F.col("doc_id").cast("string")) % 100 < 95, "train"
    ).otherwise("heldout")
    return (
        deduped.select(split.alias("split"), "source", "n_words")
        .groupBy("split", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_words").alias("total_tokens"))
    )


@query(
    "p_corpus_shuffle",
    oracle="""
    SELECT ROW_NUMBER() OVER (ORDER BY md5('42#' || CAST(doc_id AS VARCHAR)), doc_id)
             AS position,
           doc_id, source
    FROM documents
    """,
    doc=(
        "Deterministic global corpus shuffle: training-example order is "
        "the sort of a seeded content hash — reproducible across runs/"
        "engines (same seed -> same curriculum), yet uncorrelated with "
        "ingest order. Positions come from operators/enumerate."
        "global_enumerate: range-partitioned sort + per-partition "
        "offsets, NOT a single-partition global window — the window "
        "form is the classic scale cliff. Changing the epoch seed "
        "reshuffles without rewriting data; doc_id tiebreak keeps the "
        "total order unique."
    ),
    tags=("llm", "training", "shuffle"),
)
def p_corpus_shuffle(spark, sf_dir):
    from unity_to_bigquery_spark.operators.enumerate import global_enumerate

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.withColumn(
        "__shuffle_key", F.md5(F.concat(F.lit("42#"), F.col("doc_id").cast("string")))
    )
    return global_enumerate(keyed, ["__shuffle_key", "doc_id"]).select(
        "position", "doc_id", "source"
    )


@query(
    "t_lm_score",
    oracle="""
    WITH grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ws) - 1),
                                   i -> ws[i] || '#' || ws[i+1])) AS bg,
             unnest(list_transform(generate_series(1, len(ws) - 1),
                                   i -> ws[i])) AS w1
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    bg_counts AS (SELECT bg, COUNT(*) AS c_bg FROM grams GROUP BY bg),
    w1_counts AS (SELECT w1, COUNT(*) AS c_w1 FROM grams GROUP BY w1),
    scored AS (
      SELECT g.doc_id,
             -ln(b.c_bg::DOUBLE / u.c_w1::DOUBLE) AS nll
      FROM grams g
      JOIN bg_counts b ON g.bg = b.bg
      JOIN w1_counts u ON g.w1 = u.w1
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CAST(FLOOR(nll * 1000000.0 + 0.5) AS BIGINT)) // COUNT(*) AS BIGINT)
             AS avg_nll6
    FROM scored GROUP BY doc_id
    """,
    doc=(
        "LM-based quality score (CCNet-style): per-document average "
        "negative log-likelihood under the corpus's own bigram model "
        "P(w2|w1) = c(w1 w2)/c(w1 *). High avg_nll = improbable text "
        "(gibberish/boilerplate) -> filter candidate. Scale: two count "
        "aggregates over the bigram stream + two joins back keyed on "
        "the bigram/unigram (the model tables are the small sides -> "
        "broadcast at real scale); fixed-point NLL so the sum is "
        "order-independent across engines."
    ),
    tags=("llm", "training", "quality", "lm"),
)
def t_lm_score(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").withColumn("ws", F.split("text", " "))
    grams = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.concat_ws("#", F.element_at("ws", i), F.element_at("ws", i + 1)).alias("bg"),
                    F.element_at("ws", i).alias("w1"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", "g.bg", "g.w1")
    bg_counts = grams.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    w1_counts = grams.groupBy("w1").agg(F.count(F.lit(1)).alias("c_w1"))
    nll = -F.log(F.col("c_bg").cast("double") / F.col("c_w1").cast("double"))
    scored = (
        grams.join(bg_counts, "bg")
        .join(w1_counts, "w1")
        .select("doc_id", F.floor(nll * 1000000.0 + 0.5).cast("long").alias("nll6"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.floor(F.sum("nll6") / F.count(F.lit(1))).cast("long").alias("avg_nll6"),
    )


@query(
    "p_incremental_dedup",
    oracle="""
    WITH existing AS (
      SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 3 <> 0
    ),
    incoming AS (
      SELECT doc_id, source, md5(text) AS h FROM documents WHERE doc_id % 3 = 0
    )
    SELECT i.source,
           COUNT(*) AS n_incoming,
           COUNT(CASE WHEN e.h IS NULL THEN 1 END) AS n_new
    FROM incoming i LEFT JOIN existing e ON i.h = e.h
    GROUP BY i.source
    """,
    doc=(
        "Incremental-ingest dedup: an incoming batch anti-joined (by "
        "content hash) against the already-ingested corpus — the "
        "steady-state form of dedup once the corpus exists (full-corpus "
        "passes are a bootstrap-only event). Scale: the corpus side "
        "reduces to distinct 16-byte hashes before the join; at 100 TB "
        "that hash index is the thing you keep hot."
    ),
    tags=("llm", "training", "dedup", "incremental"),
)
def p_incremental_dedup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    existing = (
        docs.filter(F.col("doc_id") % 3 != 0)
        .select(F.md5("text").alias("h"))
        .distinct()
        .withColumn("seen", F.lit(1))
    )
    incoming = docs.filter(F.col("doc_id") % 3 == 0).select(
        "source", F.md5("text").alias("h")
    )
    return (
        incoming.join(existing, "h", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_incoming"),
            F.count(F.when(F.col("seen").isNull(), 1)).alias("n_new"),
        )
    )


@query(
    "p_exact_quota_split",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('q#' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rnk,
             COUNT(*) OVER (PARTITION BY source) AS n_total
      FROM documents
    )
    SELECT source,
           COUNT(CASE WHEN rnk * 10 <= n_total THEN 1 END) AS n_heldout,
           COUNT(CASE WHEN rnk * 10 >  n_total THEN 1 END) AS n_train,
           CAST(SUM(CASE WHEN rnk * 10 <= n_total THEN n_chars ELSE 0 END) AS BIGINT)
             AS heldout_chars
    FROM ranked GROUP BY source
    """,
    doc=(
        "Exact-quota stratified split: rank documents per stratum by a "
        "seeded content hash and take exactly floor(10%) into the "
        "held-out set — guaranteed split sizes, unlike threshold "
        "sampling (p_stratified_sample) whose proportions only hold in "
        "expectation. One window shuffle per stratum; deterministic "
        "across engines."
    ),
    tags=("llm", "training", "split"),
)
def p_exact_quota_split(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("q#"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(key, "doc_id")
    wc = Window.partitionBy("source")
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(wc).alias("n_total"),
    )
    heldout = F.col("rnk") * 10 <= F.col("n_total")
    return ranked.groupBy("source").agg(
        F.count(F.when(heldout, 1)).alias("n_heldout"),
        F.count(F.when(~heldout, 1)).alias("n_train"),
        F.sum(F.when(heldout, F.col("n_chars")).otherwise(0)).alias("heldout_chars"),
    )


@query(
    "p_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             ln((('0x' || substring(md5('ws7#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
                / 1152921504606846977.0)
               / CAST(n_chars AS DOUBLE) AS es_key
      FROM documents
    )
    SELECT ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id) AS position,
           doc_id, source, n_chars
    FROM keyed
    ORDER BY es_key DESC, doc_id
    LIMIT 50
    """,
    doc=(
        "Deterministic weighted sample (Efraimidis-Spirakis A-ES): "
        "priority ln(u)/w with u a seeded md5-derived uniform and "
        "w = n_chars, take the global top-50 by priority. One pass, "
        "no replacement bookkeeping, order-independent — the "
        "distributed-safe weighted sampler (each partition's top-50 "
        "merge via TakeOrderedAndProject; at 100 TB this is a "
        "map-side top-k, never a global sort). Seeded + doc_id "
        "tiebreak -> reproducible across engines; weight by stored "
        "n_chars (not length(text)) keeps the predicate on a stored "
        "column."
    ),
    tags=("llm", "training", "sampling"),
)
def p_weighted_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # u in (0, 1]: (h+1) / (2^60 + 1); es_key = ln(u)/w, larger is better
    h = _portable_hash(F.concat(F.lit("ws7#"), F.col("doc_id").cast("string")))
    u = (h + F.lit(1)).cast("double") / F.lit(1152921504606846977.0)
    keyed = docs.select(
        "doc_id",
        "source",
        "n_chars",
        (F.log(u) / F.col("n_chars").cast("double")).alias("es_key"),
    )
    from unity_to_bigquery_spark.operators.enumerate import global_enumerate

    top = keyed.orderBy(F.desc("es_key"), "doc_id").limit(50)
    return global_enumerate(top, [F.desc("es_key"), F.col("doc_id")]).select(
        "position", "doc_id", "source", "n_chars"
    )


@query(
    "p_curriculum_order",
    oracle="""
    WITH ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r,
             (SELECT COUNT(*) FROM documents) AS n
      FROM documents
    ), deciled AS (
      SELECT doc_id, CAST(((r - 1) * 10) // n AS BIGINT) AS decile FROM ranked
    )
    SELECT ROW_NUMBER() OVER (ORDER BY decile,
                              md5('cur42#' || CAST(doc_id AS VARCHAR)),
                              doc_id) AS position,
           doc_id, decile
    FROM deciled
    """,
    doc=(
        "Curriculum ordering: rank docs by a difficulty proxy (stored "
        "n_chars, longest first), cut into 10 equal-count deciles via "
        "rank arithmetic (floor((r-1)*10/N) — NOT ntile, whose "
        "remainder placement differs across engines), then order "
        "decile-by-decile with a seeded shuffle inside each. Both "
        "enumerations run through operators/enumerate."
        "global_enumerate (range sort + offsets), never a "
        "single-partition global window."
    ),
    tags=("llm", "training", "curriculum"),
)
def p_curriculum_order(spark, sf_dir):
    from unity_to_bigquery_spark.operators.enumerate import global_enumerate

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    ranked = global_enumerate(
        docs.select("doc_id", "n_chars"),
        [F.desc("n_chars"), F.col("doc_id")],
        position_col="__r",
    )
    deciled = ranked.select(
        "doc_id",
        # Integer `div`, not double `/` + cast('long'): rules 2/11 forbid
        # relying on double->BIGINT truncation semantics in oracled output.
        F.expr(f"((__r - 1) * 10) div {int(n)}").alias("decile"),
        F.md5(F.concat(F.lit("cur42#"), F.col("doc_id").cast("string"))).alias("__k"),
    )
    return global_enumerate(
        deciled, [F.col("decile"), F.col("__k"), F.col("doc_id")]
    ).select("position", "doc_id", "decile")


@query(
    "p_k_anonymity",
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
      FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
           CAST(n AS BIGINT) AS n,
           (n < 5) AS suppress
    FROM g
    """,
    doc=(
        "k-anonymity audit (k=5) over the (nation, segment) "
        "quasi-identifier: equivalence-class sizes with a suppression "
        "flag for classes an aggregate release would have to withhold "
        "— the census-style disclosure-control complement to the "
        "Laplace release (p_dp_noisy_counts). One hash aggregate."
    ),
    tags=("llm", "training", "privacy"),
)
def p_k_anonymity(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            F.col("c_nationkey").cast("long").alias("c_nationkey"), "c_mktsegment"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("suppress", F.col("n") < 5)
    )


@query(
    "p_sequence_packing_global",
    oracle="""
    WITH c AS (
      SELECT doc_id, n_chars,
             SUM(n_chars) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM documents
    )
    SELECT CAST(FLOOR((cum - n_chars) / 4096.0) AS BIGINT) AS window_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(SUM(CASE WHEN FLOOR((cum - 1) / 4096.0)
                              > FLOOR((cum - n_chars) / 4096.0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_cross
    FROM c GROUP BY 1
    """,
    doc=(
        "GLOBAL sequence packing (round 12 — the single-stream twin of "
        "p_sequence_packing's per-source layout): ALL documents "
        "concatenate in a deterministic total order and cut into "
        "fixed 4096-char context windows; per window the packer "
        "reports how many documents START there, the character mass, "
        "and how many documents CROSS the window boundary (the "
        "attention-mask / document-leakage accounting every packing "
        "pipeline audits). The global prefix sum runs through "
        "operators/enumerate.global_cumsum — per-partition running "
        "sums plus a partition-count-sized broadcast offset table, "
        "NEVER a single-task global window (rule 9's scale cliff), so "
        "the plan survives a 100-TB corpus; the oracle's single-node "
        "window is the exact semantic twin."
    ),
    tags=("training", "packing", "llm"),
)
def p_sequence_packing_global(spark, sf_dir):
    from unity_to_bigquery_spark.operators.enumerate import global_cumsum

    L = 4096.0
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    c = global_cumsum(docs, ["doc_id"], "n_chars", "cum")
    first_w = F.floor((F.col("cum") - F.col("n_chars")) / F.lit(L))
    last_w = F.floor((F.col("cum") - 1) / F.lit(L))
    return (
        c.select(
            first_w.alias("window_id"),
            F.col("n_chars"),
            F.when(last_w > first_w, F.lit(1)).otherwise(F.lit(0)).alias("__x"),
        )
        .groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars"),
            F.sum("__x").alias("n_cross"),
        )
    )
