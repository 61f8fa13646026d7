"""Corpus retrieval operators: inverted index statistics and BM25
ranked keyword search over the ``documents`` table.

Provenance: the reference (``/root/reference/Unity_to_BigQuery.py``)
has no search surface — these extend the BASELINE.json north star
("text analysis" over a training corpus) with the retrieval ops a
training-data pipeline actually runs: term→document statistics for
corpus inspection, and BM25 top-k for quality probes / decontamination
lookups ("which training docs score highest for this benchmark
query?").

Scale design (100 TB):
- postings are ONE explode + ONE hash aggregate keyed on
  (doc_id, term) — map-side partial aggregation applies, no
  countDistinct expand anywhere.
- the per-query-term document frequencies and the 1-row corpus stats
  are tiny by construction (bounded by the query's term count) and are
  broadcast back; the only wide exchange is the postings aggregate.
- BM25 scores are fixed-point (FLOOR at 1e-6) per (doc, term) BEFORE
  the per-document sum, so the sum is a long aggregate —
  order-independent across engines and cheaper than a double sum
  (functions/canonical.py discipline).
- top-k is orderBy+limit → Catalyst TakeOrderedAndProject (per-
  partition heaps + driver merge), never a global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def exploded_terms(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, dl, term) stream: whitespace tokenization, one row per
    token occurrence, with the document's token count carried along."""
    ws = F.split(F.col(text), " ")
    return docs.select(F.col(id_col), F.size(ws).alias("dl"), F.explode(ws).alias("term"))


def postings(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Term postings: (term, id, tf, dl). One exchange, keyed on the
    (id, term) pair; dl rides in the grouping key (constant per doc)."""
    ex = exploded_terms(docs, text=text, id_col=id_col)
    return ex.groupBy(id_col, "dl", "term").agg(F.count(F.lit(1)).alias("tf"))


def inverted_index(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-level index statistics per term: document frequency
    ``df`` and corpus frequency ``cf``. Two cascaded hash aggregates —
    the (id, term) pre-aggregate makes ``df`` a plain COUNT(*) instead
    of a COUNT(DISTINCT) expand."""
    tp = postings(docs, text=text, id_col=id_col)
    return tp.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k documents for a bag-of-terms query.

    score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
    with the Lucene-style non-negative idf(t) = ln(1 + (N−df+0.5)/(df+0.5)).

    Every double subexpression is written in the exact shape the DuckDB
    oracle uses (same literals, same associativity) and floored to
    1e-6 fixed point per (doc, term) before the long sum — see module
    docstring. Returns (id, bm25_6, n_terms_hit) with a doc-id
    tiebreak on the top-k.
    """
    ex = exploded_terms(docs, text=text, id_col=id_col)
    # Repartition the (tiny, post-filter) matching-token stream by the
    # DOC id before the (id, dl, term) aggregate: HashPartitioning(id)
    # satisfies the clustered distribution of BOTH this aggregate AND
    # the final per-document sum in bm25_score_topk, so the whole
    # score path runs with ONE wide exchange instead of two (2
    # Exchange -> 1; optimization round r13, guide §2.4). The id key is
    # skew-free (each doc contributes at most its own matching-token
    # count), unlike a term key.
    qp = (
        ex.filter(F.col("term").isin(list(terms)))
        .repartition(F.col(id_col))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = qp.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col(text), " "))).alias("sum_dl"),
    )
    return bm25_score_topk(qp, dfs, stats, k=k, k1=k1, b=b, id_col=id_col)


def bm25_score_topk(
    qp: DataFrame,
    dfs: DataFrame,
    stats: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """The shared BM25 scoring tail: (id, dl, term, tf) postings ×
    broadcast (term, df) × broadcast 1-row (n_docs, sum_dl) → top-k.
    Factored out (round 13) so the one-shot :func:`bm25_topk` and the
    persisted ``BM25Index`` serve path score through the SAME
    expression tree — identical doubles, identical fold, bit-identical
    fixed-point results on an equal corpus."""
    # ONE broadcast build instead of two (optimization round r13): the
    # per-term df rows and the 1-row corpus stats merge into a single
    # tiny broadcast relation (n_query_terms rows), halving the
    # broadcast-exchange jobs on the serve path. Join output rows and
    # every scoring expression are unchanged — bit-identical scores.
    scored = qp.join(F.broadcast(dfs.crossJoin(stats)), "term")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
    s6 = F.floor(idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom * F.lit(1000000.0) + F.lit(0.5)).cast(
        "long"
    )
    return (
        scored.select(F.col(id_col), s6.alias("s6"))
        .groupBy(id_col)
        .agg(
            F.sum("s6").cast("long").alias("bm25_6"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25_6"), F.col(id_col))
        .limit(k)
    )


def textrank_keywords(
    docs: DataFrame,
    text: str = "text",
    damping: float = 0.85,
    iters: int = 10,
    topk: int = 20,
    min_edge_count: int = 2,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004, public
    paper): weighted PageRank over the word co-occurrence graph built
    from adjacent-word bigrams. Returns the top ``topk`` words by rank
    with 1e-6 fixed-point scores (word tiebreak).

    Spark shape: the graph is two hash aggregates (bigram counts ->
    symmetric weighted edges); each PageRank round is one join
    (edges x ranks, shuffled on the node key) + one sum aggregate.
    Static relations (edges, out-weights) are persisted once; rank
    generations are persisted per round and lineage is cut with
    localCheckpoint mid-loop (same discipline as
    llm/clusters.connected_components — rule: iterative loops must not
    replay round 1..N-1 upstream work each round). Rounds are a fixed
    ``iters`` (no convergence action), so the whole loop is ~2*iters
    narrow-keyed shuffles over node-sized relations: vocabulary-sized,
    NOT corpus-sized — this is why TextRank scales to any corpus whose
    vocabulary fits a shuffle, independent of document count.

    Approximate by construction (float fixed-point iteration):
    property-tested against an exact NumPy power iteration, not
    DuckDB-oracled.
    """
    from unity_to_bigquery_spark.llm.text import words_col

    ws = docs.select(words_col(text).alias("ws")).filter(F.size("ws") >= 2)
    bigrams = ws.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at("ws", i).alias("u"),
                    F.element_at("ws", i + 1).alias("v"),
                ),
            )
        ).alias("e")
    ).select("e.u", "e.v").filter(F.col("u") != F.col("v"))
    counts = bigrams.groupBy("u", "v").agg(F.count(F.lit(1)).alias("w"))
    sym = (
        counts.unionAll(
            counts.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
        )
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .filter(F.col("w") >= min_edge_count)
        .persist()
    )
    # NOTE (round-5 measurement): pre-normalizing w/outw into one
    # persisted edge relation to drop a per-round join was TRIED and
    # was a net loss at sf0.1 (draws 5.8/6.4 s vs 4.5-5.5 s for this
    # shape) — the extra eager materialization + distinct(nodes) jobs
    # and the wider cache cost more than the removed broadcast-sized
    # join saved. Keep the two-relation shape.
    outw = sym.groupBy("u").agg(F.sum("w").alias("outw")).persist()
    nodes = outw.select("u")
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("u", F.lit(1.0 / n_nodes).alias("r")).persist()
    for it in range(iters):
        contrib = (
            sym.join(outw, "u")
            .join(ranks, "u")
            .select(
                F.col("v").alias("u2"),
                (F.col("r") * F.col("w") / F.col("outw")).alias("c"),
            )
        )
        agg = contrib.groupBy("u2").agg(F.sum("c").alias("in_sum"))
        new_ranks = (
            nodes.join(agg, nodes.u == F.col("u2"), "left")
            .select(
                "u",
                (F.lit(base) + F.lit(damping) * F.coalesce("in_sum", F.lit(0.0))).alias(
                    "r"
                ),
            )
            .persist()
        )
        if (it + 1) % 5 == 0:
            # Unpersist the pre-checkpoint frame: rebinding to the
            # localCheckpoint result would otherwise leave the persisted
            # original orphaned (next round's unpersist releases only the
            # checkpointed frame) — the in-sweep GC trap of rule 13.
            pre_ckpt = new_ranks
            new_ranks = pre_ckpt.localCheckpoint(eager=True)
            pre_ckpt.unpersist()
        old = ranks
        ranks = new_ranks
        old.unpersist()
    if iters and iters % 5 == 0:
        # the final ranks frame was localCheckpoint'ed this round, so
        # its lineage no longer references the static relations — their
        # caches can drop NOW instead of lingering until clearCache
        # (rule 13: dead blocks tax later queries' GC)
        sym.unpersist()
        outw.unpersist()
    scored = ranks.select(
        F.col("u").alias("word"),
        F.floor(F.col("r") * 1000000.0 + 0.5).cast("long").alias("rank6"),
    )
    return scored.orderBy(F.desc("rank6"), "word").limit(topk)


def rrf_fuse(
    ranked: Sequence[tuple[str, DataFrame, str]],
    id_col: str = "doc_id",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """HYBRID-RETRIEVAL fusion by RECIPROCAL RANK FUSION (round 13):
    ``ranked`` is a sequence of ``(name, df, score_col)`` result lists
    (each df: one row per id, higher score = better); the fused score
    is the classic  Σ_lists 1/(c + rank)  [Cormack et al., the BM25+
    dense-retrieval fusion every RAG stack runs], kept cross-engine
    exact as INTEGER arithmetic: each list contributes
    ``1000000 DIV (c + rank)`` (exact integer floor division — no
    float division anywhere), an id missing from a list contributes 0.

    Ranks come from :func:`operators.enumerate.global_enumerate` over
    (score DESC, id ASC) — dense contiguous 1-based ranks with the
    unique-id tiebreak, never a single-task global window, so fusing
    two CORPUS-SIZED score lists scales (the lists a 100-TB hybrid
    stack fuses are top-k'd upstream, but nothing here requires it).
    The lists land on a full outer join keyed on id (ids appear once
    per list, so the join fans nothing out); output is top-``k`` by
    (rrf6 DESC, id ASC) with per-list ranks exposed (0 = missing).
    """
    from functools import reduce

    from unity_to_bigquery_spark.operators.enumerate import global_enumerate

    sides = []
    for name, df, score_col in ranked:
        sides.append(
            global_enumerate(
                df.select(id_col, score_col),
                [F.col(score_col).desc(), F.col(id_col).asc()],
                position_col=f"rank_{name}",
            ).select(id_col, f"rank_{name}")
        )
    fused = reduce(lambda a, b: a.join(b, id_col, "full"), sides)
    contribs = [
        F.coalesce(
            F.expr(f"CAST(1000000 DIV ({int(c)} + rank_{name}) AS BIGINT)"),
            F.lit(0).cast("long"),
        )
        for name, _df, _s in ranked
    ]
    rrf = reduce(lambda a, b: a + b, contribs)
    return (
        fused.withColumn("rrf6", rrf.cast("long"))
        .select(
            id_col,
            "rrf6",
            *(
                F.coalesce(F.col(f"rank_{name}"), F.lit(0))
                .cast("long")
                .alias(f"rank_{name}")
                for name, _df, _s in ranked
            ),
        )
        .orderBy(F.desc("rrf6"), F.asc(id_col))
        .limit(k)
    )
