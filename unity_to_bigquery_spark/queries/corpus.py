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
