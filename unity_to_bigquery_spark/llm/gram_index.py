"""Persisted exact-substring GRAM INDEX with incremental CDC refresh —
the production form of Lee et al. 2022 exact-substring dedup
(llm/dedup.exact_substring_spans is the one-shot batch form).

Derived-state-over-VersionedTable pattern (the AnnIndex/PqIndex/
ContinuousAggregate family): the index stores one row per
(document, distinct 32-char-window hash) in a bucket-partitioned
VersionedTable, bookmarked to the source documents table via the
Delta txnAppId/txnVersion protocol. Protocol:

    gi = GramIndex(spark, root, source_docs)
    gi.build()                      # once, over the current snapshot
    gi.dup_report()                 # == batch exact_substring_spans
    ...source_docs.commit_append(new_batch)...
    gi.refresh()                    # cost ∝ appended docs ONLY
    gi.dup_against_history(decide)  # which NEW docs duplicate corpus

Why refresh is cheap: gram rows are IMMUTABLE facts about a document
(a (doc_id, gram) row never changes while the doc lives), so append
pages are a PURE APPEND of the delta's gram rows — no merge, no
rewrite of existing state files, unlike aggregated (gram → count)
state which would touch every hash-uniform file on every batch.
Delete/rewrite pages (round 8) retract by key: one atomic
commit_replace_keys drops the changed docs' gram rows merge-on-read
and appends the survivors' — cost ∝ the net delta. Dup counts are
aggregated AT SERVE TIME over the bucket-partitioned state; the
trade-off (write-optimal log vs read-time aggregation) is the LSM
choice every ingest-heavy dedup system makes, and compact() bounds
the file count between refreshes.

Scale (100 TB): window text never persists — state rows are
(doc_id, 16-byte-hash-hex, small ints), ~1/4 the corpus bytes at the
default k=32/stride=1 and ∝ 1/stride beyond; serving shuffles hash
keys (uniform, skew-free). Reference scope: corpus-prep dedup over
the documents table (SURVEY §2D), re-expressed Spark-first.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from unity_to_bigquery_spark.plans.versioned import VersionedTable

_APP = "gram-index"


class GramIndex:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        source: VersionedTable,
        k: int = 32,
        stride: int = 1,
        n_buckets: int = 16,
        id_col: str = "doc_id",
        text_col: str = "text",
        len_col: str = "n_chars",
        auto_compact: bool = True,
    ):
        self.spark = spark
        self.source = source
        self.k = k
        self.stride = stride
        self.n_buckets = n_buckets
        self.id_col = id_col
        self.text_col = text_col
        self.len_col = len_col
        # threshold auto-OPTIMIZE after refresh (VERDICT r7 #4): keeps
        # state file count ∝ buckets and merge-on-read delete debt
        # bounded across arbitrarily many refreshes
        self.auto_compact = auto_compact
        # bucket-partitioned: serve-time aggregation shuffles within
        # hash-range partitions; compact() keeps file count ∝ buckets
        self.state = VersionedTable(
            spark,
            os.path.join(root, "grams"),
            partition_col="bucket",
            distinct_index_cols=("bucket",),
        )

    # ---- bookkeeping -----------------------------------------------------
    def indexed_version(self) -> int:
        """Source version the index reflects (0 = never built)."""
        return self.state.manifest().get("txns", {}).get(_APP, 0)

    # ---- gram extraction -------------------------------------------------
    def _gram_rows(self, docs: DataFrame, v: int) -> DataFrame:
        """One row per (document, DISTINCT window hash): doc_id, gh,
        n_occ, bucket, src_version. The hash happens in the cutting
        projection — window text never reaches an exchange."""
        k, stride = self.k, self.stride
        # Repartition by doc BEFORE the window explode (CLAUDE.md rule
        # 5 / r13-opt): build/refresh inputs are often one or two
        # parquet files (the demo sources commit coalesce(1) for
        # positional determinism), so without this the md5-per-window
        # extraction — the index's dominant compute — runs on 1-2
        # cores. The exchange is a net WIN, not an extra one:
        # hash(doc_id) satisfies the groupBy(doc_id, gh) clustered
        # distribution (subset rule), so the post-explode aggregation
        # exchange disappears and the one shuffle left carries raw
        # text bytes instead of the wider exploded gram-row stream.
        n_part = int(
            self.spark.conf.get("spark.sql.shuffle.partitions")
        )
        grams = (
            docs.filter(F.col(self.len_col) >= k)
            .repartition(n_part, self.id_col)
            .select(
                self.id_col,
                self.text_col,
                F.explode(
                    F.sequence(F.lit(0), F.col(self.len_col) - k, F.lit(stride))
                ).alias("p"),
            )
            .select(
                self.id_col,
                F.md5(F.expr(f"substring({self.text_col}, p + 1, {k})")).alias("gh"),
            )
        )
        return (
            grams.groupBy(self.id_col, "gh")
            .agg(F.count("*").alias("n_occ"))
            .select(
                F.col(self.id_col),
                F.col("gh"),
                F.col("n_occ").cast("long"),
                F.expr(
                    f"CAST(conv(substring(gh, 1, 4), 16, 10) AS BIGINT) "
                    f"% {self.n_buckets}"
                ).alias("bucket"),
                F.lit(v).cast("long").alias("src_version"),
            )
        )

    # ---- build / retrain -------------------------------------------------
    def build(self) -> int:
        """Extract grams from the CURRENT source snapshot; atomic
        overwrite + bookmark. Also the retrain path — a rebuild at an
        already-bookmarked version bypasses the txn no-op check (the
        overwrite would silently skip otherwise; CLAUDE.md rule 17)."""
        v = self.source.latest_version()
        if v == 0:
            raise ValueError("GramIndex.build: source table is empty")
        rows = self._gram_rows(self.source.read(v), v)
        if self.indexed_version() >= v:
            self.state.commit_overwrite(rows)
        else:
            self.state.commit_overwrite(rows, txn=(_APP, v))
        return v

    # ---- incremental refresh ---------------------------------------------
    def refresh(
        self, max_commits: int | None = None, to_version: int | None = None
    ) -> int:
        """Fold all source commits since the bookmark. Pure-append
        pages stay a PURE APPEND of the delta's gram rows (cost ∝
        appended docs; no existing state file is touched). Pages
        containing deletes/rewrites are RETRACTION-AWARE (round 8,
        VERDICT r7 #1): the net per-key effect
        (``changes_final_state`` — equality deletes, positional
        deletes, merge updates) folds into ONE atomic
        ``commit_replace_keys``: changed docs' stale gram rows die
        merge-on-read, surviving final states re-extract, removed docs
        get nothing. Cost ∝ the net delta. Pages long backlogs at
        ``max_commits`` (default CDC_MAX_COMMITS), one idempotent
        txn-bookmarked commit per page, crash-resumable between
        pages. ``to_version`` pins the refresh to a CDC-stream batch
        boundary (see :meth:`AnnIndex.refresh`); an old boundary is an
        exactly-once no-op."""
        page = VersionedTable.CDC_MAX_COMMITS if max_commits is None else max_commits
        if page < 1:
            raise ValueError(f"max_commits must be >= 1, got {page}")
        last = self.indexed_version()
        if last == 0:
            raise ValueError("GramIndex.refresh: build() the index first")
        now = (
            self.source.latest_version() if to_version is None else to_version
        )
        if to_version is not None and to_version <= last:
            return last  # replayed/old boundary: exactly-once no-op
        while last < now:
            upto = min(last + page, now)
            if self.source.window_is_append_only(last, upto):
                delta = self.source.changes(last, upto)
                self.state.commit_append(
                    self._gram_rows(delta, upto), txn=(_APP, upto)
                )
            else:
                final = self.source.changes_final_state(
                    self.id_col, last, upto
                ).persist()
                ups = final.filter(
                    F.col(VersionedTable.CDC_TYPE_COL) == "upsert"
                ).drop(VersionedTable.CDC_TYPE_COL, VersionedTable.CDC_VERSION_COL)
                self.state.commit_replace_keys(
                    self._gram_rows(ups, upto),
                    final.select(self.id_col),
                    self.id_col,
                    txn=(_APP, upto),
                )
                final.unpersist()
            last = upto
        if self.auto_compact:
            self.state.auto_compact()
        return last

    # ---- serving ---------------------------------------------------------
    def dup_report(self) -> DataFrame:
        """Per-document duplicated-span report over the WHOLE indexed
        corpus, computed from state alone (no re-hash of any text):
        identical output contract to llm/dedup.exact_substring_spans
        on the same corpus — (doc_id, n_grams, n_dup_grams,
        dup_frac_fp6). Grams are re-aggregated at serve time; a gram
        is duplicated when it appears in >1 document."""
        rows = self.state.read().select(self.id_col, "gh", "n_occ")
        shared = (
            rows.groupBy("gh")
            .agg(F.count("*").alias("nd"))
            .filter(F.col("nd") > 1)
            .select("gh")
        )
        per_doc = (
            rows.join(shared, "gh")
            .groupBy(self.id_col)
            .agg(F.sum("n_occ").alias("n_dup_grams"))
        )
        k, stride = self.k, self.stride
        docs = self.source.read(self.indexed_version()).select(
            self.id_col, self.len_col
        )
        n_windows = F.expr(
            f"CAST(({self.len_col} - {k}) DIV {stride} + 1 AS BIGINT)"
        )
        return docs.join(per_doc, self.id_col, "left").select(
            self.id_col,
            F.when(F.col(self.len_col) >= k, n_windows)
            .otherwise(0)
            .cast("long")
            .alias("n_grams"),
            F.coalesce(F.col("n_dup_grams"), F.lit(0)).cast("long").alias(
                "n_dup_grams"
            ),
            F.when(
                F.col(self.len_col) >= k,
                F.expr(
                    f"coalesce(n_dup_grams, 0) * 1000000 "
                    f"div (({self.len_col} - {k}) div {stride} + 1)"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("dup_frac_fp6"),
        )

    def dup_against_history(self, docs: DataFrame) -> DataFrame:
        """Admission-control serve: for CANDIDATE documents (not yet
        ingested), which windows already exist in the indexed corpus —
        (doc_id, n_grams, n_hist_dup_grams). The candidates' grams are
        hashed fresh (∝ candidate bytes) and joined against stored
        hashes; the historical corpus is never re-read or re-hashed."""
        cand = self._gram_rows(docs, 0).select(
            F.col(self.id_col).alias("__cand_id"), "gh", "n_occ"
        )
        hist = self.state.read().select("gh").distinct()
        hits = (
            cand.join(hist, "gh")
            .groupBy("__cand_id")
            .agg(F.sum("n_occ").alias("n_hist_dup_grams"))
        )
        k, stride = self.k, self.stride
        n_windows = F.expr(
            f"CAST(({self.len_col} - {k}) DIV {stride} + 1 AS BIGINT)"
        )
        return (
            docs.select(self.id_col, self.len_col)
            .join(hits, F.col(self.id_col) == F.col("__cand_id"), "left")
            .select(
                self.id_col,
                F.when(F.col(self.len_col) >= k, n_windows)
                .otherwise(0)
                .cast("long")
                .alias("n_grams"),
                F.coalesce(F.col("n_hist_dup_grams"), F.lit(0))
                .cast("long")
                .alias("n_hist_dup_grams"),
            )
        )

    # ---- maintenance -----------------------------------------------------
    def compact(self) -> None:
        """Fold refresh-accrued small files (one per touched bucket per
        page) back to ∝ buckets; content-identical rows, bookmark
        carried forward by the overwrite's txn map."""
        self.state.compact()
