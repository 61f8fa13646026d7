"""Persisted BM25 RANKED-RETRIEVAL index with incremental CDC refresh —
the derived-state family member keyword search was missing (VERDICT r12
#3): ``t_bm25_topk`` re-scans the corpus per query; at 100 TB you build
the postings ONCE and refresh ∝ delta.

Derived-state-over-VersionedTable pattern (GramIndex/AnnIndex/
ContinuousAggregate family):

    ix = BM25Index(spark, root, source_docs)
    ix.build()                    # once, over the current snapshot
    ix.topk(["hash", "join"])     # == bm25_topk on the same corpus
    ...source_docs.commit_append(batch)...
    ix.refresh()                  # cost ∝ appended docs ONLY
    ...source_docs.delete_where(...)...
    ix.refresh()                  # retraction-aware, ∝ the net delta

Three pieces of state, each exactly-once bookmarked via the
txnAppId/txnVersion protocol:

- ``postings`` — one row per (doc, distinct term): (term, doc_id, tf,
  dl, bucket), bucket-partitioned by a term hash. Posting rows are
  IMMUTABLE facts about a live document (same argument as GramIndex
  gram rows), so append pages are a PURE APPEND of the delta's
  postings; delete/rewrite pages fold ``changes_final_state`` into ONE
  atomic ``commit_replace_keys`` keyed on doc_id (stale postings die
  merge-on-read). No existing state file is rewritten on append.
- ``docstats`` — one row per doc: (doc_id, dl_d, grp, bucket) — the
  doc-length relation, maintained with the same protocol.
- two ContinuousAggregates, maintained INCREMENTALLY from the state
  tables' own CDC (the two-level-IVM shape of p_ivm_pipeline):
  ``term_stats`` (key=term over postings: n == document frequency df —
  this is "df/idf maintained incrementally": a refresh folds only the
  delta's signed postings, never rescans the vocabulary) and
  ``corpus_stats`` (constant key over docstats: n == N_docs,
  sum_dl == Σ dl as an exact fp6 long).

Serving ``topk(terms)`` touches: the query terms' BUCKET files only
(driver-side bucket recompute + manifest distinct-stat pruning — scan
∝ corpus/n_buckets × distinct query buckets, not the corpus), the
vocabulary-sized term_stats filtered to the query terms (broadcast),
and the 1-row corpus_stats — then scores through the SAME expression
tree as the one-shot ``bm25_topk`` (``retrieval.bm25_score_topk``), so
results on an equal corpus are bit-identical.

Scale notes (100 TB): state bytes ≈ one (term, id, 3 ints) row per
distinct (doc, term) — the classic positional-free impact index;
n_buckets sizes the serve scan unit (use 4k+ at corpus scale). The
corpus_stats fp6 sum overflows past Σdl ≈ 9e12 tokens — swap the
measure to a plain long fold before indexing a full 100-TB corpus in
ONE index (shard by corpus partition, the standard move).
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from unity_to_bigquery_spark.plans.incremental_agg import ContinuousAggregate
from unity_to_bigquery_spark.plans.versioned import VersionedTable

_APP = "bm25-index"


class BM25Index:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        source: VersionedTable,
        n_buckets: int = 16,
        id_col: str = "doc_id",
        text_col: str = "text",
        auto_compact: bool = True,
    ):
        self.spark = spark
        self.source = source
        self.n_buckets = n_buckets
        self.id_col = id_col
        self.text_col = text_col
        self.auto_compact = auto_compact
        self.postings = VersionedTable(
            spark,
            os.path.join(root, "postings"),
            partition_col="bucket",
            distinct_index_cols=("bucket",),
        )
        self.docstats = VersionedTable(spark, os.path.join(root, "docstats"))
        self.term_stats = ContinuousAggregate(
            spark,
            self.postings,
            os.path.join(root, "term_stats"),
            key="term",
            measures={},
            handle_deletes=True,
        )
        self.corpus_stats = ContinuousAggregate(
            spark,
            self.docstats,
            os.path.join(root, "corpus_stats"),
            key="grp",
            measures={"sum_dl": "dl_d"},
            handle_deletes=True,
        )

    # ---- bookkeeping -----------------------------------------------------
    def indexed_version(self) -> int:
        """Source version the index reflects (0 = never built)."""
        return self.postings.manifest().get("txns", {}).get(_APP, 0)

    def _bucket_py(self, term: str) -> int:
        return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:4], 16) % self.n_buckets

    # ---- extraction --------------------------------------------------------
    def _posting_rows(self, docs: DataFrame) -> DataFrame:
        """(term, doc_id, tf, dl, bucket) — the EXACT tokenizer and
        grouping of retrieval.postings (whitespace split, dl carried in
        the key), plus the serve-pruning bucket. The bucket expression
        is the Spark twin of ``_bucket_py`` (md5 prefix, base-16)."""
        ws = F.split(F.col(self.text_col), " ")
        ex = docs.select(
            F.col(self.id_col), F.size(ws).alias("dl"), F.explode(ws).alias("term")
        )
        return (
            ex.groupBy(self.id_col, "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .select(
                "term",
                self.id_col,
                F.col("tf").cast("long"),
                F.col("dl").cast("long"),
                F.expr(
                    f"CAST(conv(substring(md5(term), 1, 4), 16, 10) AS BIGINT) "
                    f"% {self.n_buckets}"
                ).alias("bucket"),
            )
        )

    def _docstat_rows(self, docs: DataFrame) -> DataFrame:
        return docs.select(
            F.col(self.id_col),
            F.size(F.split(F.col(self.text_col), " "))
            .cast("double")
            .alias("dl_d"),
            F.lit("all").alias("grp"),
        )

    # ---- build / retrain ---------------------------------------------------
    def build(self) -> int:
        """Index the CURRENT source snapshot; atomic overwrites +
        bookmarks, then fold the rollups. A rebuild at an already-
        bookmarked version bypasses the txn no-op check (rule 17)."""
        v = self.source.latest_version()
        if v == 0:
            raise ValueError("BM25Index.build: source table is empty")
        docs = self.source.read(v)
        rebuilding = self.indexed_version() >= v
        self.postings.commit_overwrite(
            self._posting_rows(docs), txn=None if rebuilding else (_APP, v)
        )
        self.docstats.commit_overwrite(
            self._docstat_rows(docs), txn=None if rebuilding else (_APP, v)
        )
        self.term_stats.refresh()
        self.corpus_stats.refresh()
        return v

    # ---- incremental refresh -------------------------------------------
    def refresh(
        self, max_commits: int | None = None, to_version: int | None = None
    ) -> int:
        """Fold source commits since the bookmark (GramIndex protocol):
        append-only pages append the delta's postings/docstats;
        delete/rewrite pages fold ``changes_final_state`` into one
        ``commit_replace_keys`` per state table — then the rollups
        fold the state tables' OWN change feeds (term df moves only for
        terms the delta touched). ``to_version`` pins a CDC-stream
        batch boundary; an old boundary is an exactly-once no-op."""
        page = VersionedTable.CDC_MAX_COMMITS if max_commits is None else max_commits
        if page < 1:
            raise ValueError(f"max_commits must be >= 1, got {page}")
        last = self.indexed_version()
        if last == 0:
            raise ValueError("BM25Index.refresh: build() the index first")
        now = self.source.latest_version() if to_version is None else to_version
        if to_version is not None and to_version <= last:
            return last
        while last < now:
            upto = min(last + page, now)
            if self.source.window_is_append_only(last, upto):
                delta = self.source.changes(last, upto)
                self.postings.commit_append(
                    self._posting_rows(delta), txn=(_APP, upto)
                )
                self.docstats.commit_append(
                    self._docstat_rows(delta), txn=(_APP, upto)
                )
            else:
                final = self.source.changes_final_state(
                    self.id_col, last, upto
                ).persist()
                ups = final.filter(
                    F.col(VersionedTable.CDC_TYPE_COL) == "upsert"
                ).drop(
                    VersionedTable.CDC_TYPE_COL, VersionedTable.CDC_VERSION_COL
                )
                keys = final.select(self.id_col)
                self.postings.commit_replace_keys(
                    self._posting_rows(ups), keys, self.id_col, txn=(_APP, upto)
                )
                self.docstats.commit_replace_keys(
                    self._docstat_rows(ups), keys, self.id_col, txn=(_APP, upto)
                )
                final.unpersist()
            last = upto
        self.term_stats.refresh()
        self.corpus_stats.refresh()
        if self.auto_compact:
            self.postings.auto_compact()
            self.docstats.auto_compact()
        return last

    # ---- serving ---------------------------------------------------------
    def topk(
        self,
        terms: Sequence[str],
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        """BM25 top-k over the indexed corpus — identical output
        contract (and bit-identical scores on an equal corpus) to
        ``retrieval.bm25_topk``: (id, bm25_6, n_terms_hit) with the
        doc-id tiebreak. Reads ONLY the query terms' bucket files."""
        from unity_to_bigquery_spark.llm.retrieval import bm25_score_topk

        terms = list(terms)
        buckets = sorted({self._bucket_py(t) for t in terms})
        m = self.postings.manifest()
        files, _ = self.postings._prune_eq(m, "bucket", buckets)
        qp = (
            self.postings._scan_live(m, files)
            .filter(F.col("term").isin(terms))
            .select(self.id_col, "dl", "term", "tf")
        )
        dfs = (
            self.term_stats.read()
            .filter(F.col("term").isin(terms))
            .select("term", F.col("n").alias("df"))
        )
        stats = self.corpus_stats.read().select(
            F.col("n").alias("n_docs"),
            F.expr("CAST(sum_dl DIV 1000000 AS BIGINT)").alias("sum_dl"),
        )
        return bm25_score_topk(qp, dfs, stats, k=k, k1=k1, b=b, id_col=self.id_col)

    def term_df(self, terms: Sequence[str]) -> DataFrame:
        """(term, df) from the incrementally-maintained rollup."""
        return (
            self.term_stats.read()
            .filter(F.col("term").isin(list(terms)))
            .select("term", F.col("n").cast("long").alias("df"))
        )

    # ---- maintenance -----------------------------------------------------
    def compact(self) -> None:
        self.postings.compact()
        self.docstats.compact()
