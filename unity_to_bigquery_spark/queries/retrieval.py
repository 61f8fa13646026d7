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
