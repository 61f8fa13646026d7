"""Corpus-preparation declared queries, round 3: chunk-level exact
dedup (MassiveText/Falcon line-dedup analogue), domain-mixture
resampling to target weights, and tokenizer-vocabulary construction.

North-star additions beyond the reference surface (/root/reference is
ETL only — no corpus ops); these are the remaining standard stages of
a production LLM training-data pipeline that SURVEY §2B's LLM rows and
queries/training.py did not yet cover.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from unity_to_bigquery_spark.catalog import load_table
from unity_to_bigquery_spark.llm.text import BPE_ISH_PATTERN
from unity_to_bigquery_spark.operators.enumerate import global_enumerate
from unity_to_bigquery_spark.registry import query

CHUNK_WORDS = 20


@query(
    "d_chunk_dedup",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
      WHERE source IN ('src0', 'src1')
    ),
    ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
    ch AS (
      SELECT doc_id, i AS chunk_idx,
             array_to_string(w[(i*{CHUNK_WORDS}+1):(i*{CHUNK_WORDS}+{CHUNK_WORDS})], ' ') AS chunk
      FROM ws, UNNEST(generate_series(0, CAST(FLOOR((len(w) - 1) / {CHUNK_WORDS}.0) AS BIGINT))) AS t(i)
    ),
    ranked AS (
      SELECT doc_id, chunk_idx, chunk,
             ROW_NUMBER() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, chunk_idx) AS rn
      FROM ch
    ),
    kept AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             md5(string_agg(chunk, ' ' ORDER BY chunk_idx)) AS clean_md5
      FROM ranked WHERE rn = 1 GROUP BY doc_id
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM ch GROUP BY doc_id)
    SELECT t.doc_id AS doc_id, t.n_chunks AS n_chunks,
           COALESCE(k.n_kept, 0) AS n_kept,
           COALESCE(k.clean_md5, '') AS clean_md5
    FROM tot t LEFT JOIN kept k ON t.doc_id = k.doc_id
    """,
    doc=(
        "Chunk-level exact dedup (MassiveText/Falcon line-dedup "
        "analogue over 20-word chunks): first occurrence of each "
        "chunk survives (min doc_id, chunk_idx order), documents are "
        "reassembled from their surviving chunks. The corpus is the "
        "documents table plus a re-crawl clone of two sources (ids "
        "offset +1e6) so the removal path is genuinely exercised — "
        "clones dedup to 0 kept chunks. One exchange keyed on the "
        "chunk md5, one per-doc reassembly aggregate."
    ),
    tags=("llm", "dedup", "corpus"),
)
def d_chunk_dedup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionAll(
        docs.filter(F.col("source").isin("src0", "src1")).select(
            (F.col("doc_id") + F.lit(1000000)).alias("doc_id"), "text"
        )
    )
    ws = corpus.select("doc_id", F.split("text", " ").alias("w"))
    n_chunks = F.floor((F.size("w") - F.lit(1)) / F.lit(float(CHUNK_WORDS)))
    ch = ws.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks.cast("int")),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("w"), i * CHUNK_WORDS + 1, CHUNK_WORDS)
                ),
            )
        ).alias("chunk_idx", "chunk"),
    )
    rn = F.row_number().over(
        Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "chunk_idx")
    )
    ranked = ch.withColumn("rn", rn)
    kept = (
        ranked.filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("chunk_idx", "chunk"))
                        ),
                        lambda x: x["chunk"],
                    ),
                )
            ).alias("clean_md5"),
        )
    )
    tot = ch.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    return tot.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("clean_md5", F.lit("")).alias("clean_md5"),
    )


@query(
    "p_domain_mixture",
    oracle="""
    WITH wts AS (
      SELECT 'src' || CAST(i AS VARCHAR) AS source, (i % 4 + 1) / 50.0 AS wt
      FROM (SELECT unnest(generate_series(0, 19)) AS i)
    ),
    cnts AS (SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source),
    t AS (
      SELECT CAST(MIN(FLOOR(cnt / wt)) AS BIGINT) AS total
      FROM cnts JOIN wts ON cnts.source = wts.source
    ),
    quota AS (
      SELECT wts.source AS source, CAST(FLOOR(total * wt) AS BIGINT) AS q
      FROM wts CROSS JOIN t
    ),
    ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT r.doc_id AS doc_id, r.source AS source, r.rn AS mix_rank
    FROM ranked r JOIN quota ON r.source = quota.source
    WHERE r.rn <= quota.q
    """,
    doc=(
        "Domain-mixture resampling: given target weights per source "
        "(here (i%4+1)/50 over src0..src19), solve the largest "
        "feasible corpus T = min_i floor(count_i / w_i), take "
        "quota_i = floor(T*w_i) docs per source, selected "
        "deterministically by md5(doc_id) rank — the data-mixing "
        "stage of corpus assembly (DoReMi/Pile-style weighting), "
        "reproducible across runs and engines. One window partitioned "
        "by source; quotas are a broadcast dim."
    ),
    tags=("llm", "training", "sampling"),
)
def p_domain_mixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    wts = spark.range(0, 20).select(
        F.concat(F.lit("src"), F.col("id").cast("string")).alias("source"),
        ((F.col("id") % 4 + 1) / F.lit(50.0)).alias("wt"),
    )
    cnts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    t = (
        cnts.join(wts, "source")
        .agg(F.min(F.floor(F.col("cnt") / F.col("wt"))).cast("long").alias("total"))
    )
    quota = wts.crossJoin(F.broadcast(t)).select(
        "source", F.floor(F.col("total") * F.col("wt")).cast("long").alias("q")
    )
    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        )
        .alias("rn"),
    )
    return (
        ranked.join(F.broadcast(quota), "source")
        .filter(F.col("rn") <= F.col("q"))
        .select("doc_id", "source", F.col("rn").alias("mix_rank"))
    )


@query(
    "t_vocab_topk",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS token
      FROM documents
    ),
    cnt AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
    top AS (SELECT token, n FROM cnt ORDER BY n DESC, token LIMIT 500)
    SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS vocab_id
    FROM top
    """,
    doc=(
        "Tokenizer-vocabulary construction: BPE-ish pre-tokenization, "
        "global frequency count, top-500 tokens assigned contiguous "
        "vocab ids by (freq desc, token) rank. The heavy side is one "
        "explode + hash aggregate; the candidate set is bounded (500) "
        "before id assignment, which itself avoids the single-"
        "partition global window (operators/enumerate)."
    ),
    tags=("llm", "tokens", "vocab"),
)
def t_vocab_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), 0)).alias("token")
    )
    cnt = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    top = cnt.orderBy(F.desc("n"), "token").limit(500).withColumn(
        "neg_n", -F.col("n")
    )
    return (
        global_enumerate(top, ["neg_n", "token"], position_col="vocab_id")
        .select("token", "n", F.col("vocab_id").cast("long").alias("vocab_id"))
    )


@query(
    "t_feature_hash_embed",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             ('0x' || substring(md5(w), 1, 8))::BIGINT % 16        AS dim,
             CASE WHEN (('0x' || substring(md5(w), 1, 8))::BIGINT // 16) % 2 = 1
                  THEN 1 ELSE -1 END                               AS sgn
      FROM words
    ),
    dims AS (
      SELECT doc_id, dim, CAST(SUM(sgn) AS BIGINT) AS v
      FROM hashed GROUP BY doc_id, dim
    )
    SELECT doc_id,
           CAST(COALESCE(SUM(CASE WHEN dim = 0 THEN v END), 0) AS BIGINT) AS d0,
           CAST(COALESCE(SUM(CASE WHEN dim = 1 THEN v END), 0) AS BIGINT) AS d1,
           CAST(COALESCE(SUM(CASE WHEN dim = 2 THEN v END), 0) AS BIGINT) AS d2,
           CAST(COALESCE(SUM(CASE WHEN dim = 3 THEN v END), 0) AS BIGINT) AS d3,
           CAST(FLOOR(sqrt(SUM(v * v)) * 1000000.0 + 0.5) AS BIGINT)      AS norm6
    FROM dims GROUP BY doc_id
    """,
    doc=(
        "In-engine text embeddings via the hashing trick (feature "
        "hashing, Weinberger et al. 2009): each word hashes to one of "
        "16 signed dimensions (md5-derived, engine-portable), per-doc "
        "dimension sums form the embedding. Exact integer arithmetic "
        "until the final norm (sqrt of an exact integer is "
        "bit-identical across engines, then fixed-point floored) — a "
        "fully oracle-verifiable embedding generator, and the cheap "
        "JVM-side stand-in where a model-based encoder is not worth "
        "its Python round-trip."
    ),
    tags=("llm", "embeddings", "hashing"),
)
def t_feature_hash_embed(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    h = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
    hashed = words.select(
        "doc_id",
        (h % 16).alias("dim"),
        F.when((F.floor(h / 16) % 2) == 1, F.lit(1)).otherwise(F.lit(-1)).alias("sgn"),
    )
    dims = hashed.groupBy("doc_id", "dim").agg(F.sum("sgn").cast("long").alias("v"))
    return dims.groupBy("doc_id").agg(
        *[
            F.coalesce(F.sum(F.when(F.col("dim") == i, F.col("v"))), F.lit(0))
            .cast("long")
            .alias(f"d{i}")
            for i in range(4)
        ],
        F.floor(F.sqrt(F.sum(F.col("v") * F.col("v"))) * 1000000.0 + F.lit(0.5))
        .cast("long")
        .alias("norm6"),
    )


@query(
    "t_quality_logit",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents
    )
    SELECT doc_id, n_words,
           CAST(FLOOR(
             1.0 / (1.0 + exp(-(-3.0 + 0.01 * n_words
                                + 2.0 * (CAST(n_distinct AS DOUBLE) / n_words))))
             * 1000000.0 + 0.5) AS BIGINT) AS quality6,
           CASE WHEN 1.0 / (1.0 + exp(-(-3.0 + 0.01 * n_words
                                + 2.0 * (CAST(n_distinct AS DOUBLE) / n_words)))) >= 0.5
                THEN TRUE ELSE FALSE END AS keep
    FROM feats
    """,
    doc=(
        "Model-based quality filtering (fastText-classifier shape, "
        "public technique): a fixed-weight logistic score over cheap "
        "lexical features (length, type-token ratio), thresholded "
        "into a keep/drop decision — the linear-model stage of a "
        "CCNet/fastText quality pipeline, computed entirely JVM-side. "
        "Weights are public constants; swapping in trained weights "
        "changes no plan shape."
    ),
    tags=("llm", "quality", "model"),
)
def t_quality_logit(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    feats = docs.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        F.size(F.array_distinct(ws)).alias("n_distinct"),
    )
    z = (
        F.lit(-3.0)
        + F.lit(0.01) * F.col("n_words")
        + F.lit(2.0) * (F.col("n_distinct").cast("double") / F.col("n_words"))
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(
        "doc_id",
        "n_words",
        F.floor(score * 1000000.0 + F.lit(0.5)).cast("long").alias("quality6"),
        (score >= F.lit(0.5)).alias("keep"),
    )


@query(
    "p_dp_noisy_counts",
    oracle="""
    WITH cnts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source
    ),
    u AS (
      SELECT source, n,
             (('0x' || substring(md5('dp#' || source), 1, 8))::BIGINT + 0.5)
               / 4294967296.0 AS u01
      FROM cnts
    )
    SELECT source, n,
           CAST(FLOOR(
             (n + (CASE WHEN u01 >= 0.5 THEN -2.0 ELSE 2.0 END)
                  * ln(1.0 - 2.0 * abs(u01 - 0.5)))
             * 1000000.0 + 0.5) AS BIGINT) AS noisy6
    FROM u
    """,
    doc=(
        "Differentially-private aggregate release (Laplace mechanism, "
        "eps=0.5, sensitivity 1 -> scale b=2): per-source counts plus "
        "Laplace noise drawn by inverse-CDF from a SEEDED md5-uniform "
        "(u in (0,1) strictly, so ln's argument is strictly positive) "
        "- the privacy-preserving stats-release stage of a data "
        "pipeline, deterministic across engines and runs. Production "
        "would draw fresh randomness per release; the mechanism, "
        "plan shape, and fixed-point release format are identical."
    ),
    tags=("llm", "privacy", "dp"),
)
def p_dp_noisy_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cnts = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    u01 = (
        F.conv(F.substring(F.md5(F.concat(F.lit("dp#"), F.col("source"))), 1, 8), 16, 10)
        .cast("long")
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    noise = (
        F.when(u01 >= 0.5, F.lit(-2.0)).otherwise(F.lit(2.0))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u01 - F.lit(0.5)))
    )
    return cnts.select(
        "source",
        "n",
        F.floor((F.col("n") + noise) * 1000000.0 + F.lit(0.5))
        .cast("long")
        .alias("noisy6"),
    )
