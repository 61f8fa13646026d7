"""Persisted ANN index with incremental refresh — the amortization
layer over llm/similarity.py's IVF machinery (VERDICT r6 #1).

Every ``sim_*`` query so far TRAINS its index in-query; a production
pipeline builds the index ONCE, serves many top-k queries from it, and
refreshes it incrementally as the corpus grows. :class:`AnnIndex`
composes the engine's existing pieces to do exactly that:

- **storage**: two :class:`~unity_to_bigquery_spark.plans.versioned.
  VersionedTable`\\ s under one root — ``centroids`` (cell_id +
  centroid vector; always broadcast-sized) and ``assignments``
  (vec_id, cell_id, sim6, src_version, + the vector itself), the
  FAISS inverted-list layout on a lakehouse table: DENORMALIZED and
  cell-partitioned so serving never joins back to the source and the
  manifest's per-file stats prune the scan to the probed cells.
- **build** (:meth:`build`): seeded k-means over the source snapshot
  (``kmeans_centroids`` — bounded hash-mod sample), whole-corpus
  assignment via the codegen position-join scorer (``ivf_best_cells``),
  one ``commit_overwrite`` per table. The assignments commit carries a
  Delta-style txn bookmark ``(app, source_version)`` — the index
  REMEMBERS which source version it reflects.
- **refresh** (:meth:`refresh`): assigns ONLY the vectors appended
  since the bookmark, read through the manifest-log CDC
  (``source.changes`` — an explicit added-file scan, never a rescan),
  folded in one atomic idempotent ``merge_upsert`` per page (same
  paging protocol as ``plans/incremental_agg.ContinuousAggregate``:
  backlogs longer than CDC_MAX_COMMITS page, each page crash-resumable
  from its own txn). Refresh cost is proportional to the DELTA
  (|new vectors| × C scoring + touched-file rewrite), independent of
  corpus size — measured in BASELINE.md §ann-index.
- **serve** (:meth:`topk`): probe cells for the query batch against
  the broadcast centroid table, prune the assignments scan to the
  probed cells (bounded ``|Q| × nprobe`` cell-id collect, then
  manifest-stats file skipping), and run the SAME
  ``similarity.ivf_search`` probe plan the in-query path uses — which
  is what makes index-served ≡ in-query-trained an exact identity
  under equal centroids (tests/test_llm.py pins it).
- **drift** (:meth:`drift_stats` / :meth:`should_retrain`): every
  stored assignment carries ``sim6`` (cosine to its centroid) and the
  refresh epoch that wrote it, so "do the centroids still fit the
  data?" is one aggregate over the index itself: retrain when the
  newest epoch's mean assignment quality falls ``drop6`` below the
  build epoch's. Retraining is :meth:`build` again — deterministic,
  atomic per table, and the txns map keeps refresh exactly-once
  across it.

Scale notes (100 TB):
- C = √N cells by default: assignment is O(N·√C·dim) position-join
  rows (see ``ivf_best_cells``); at 1e9+ vectors swap the scorer for
  the two-level descent (``ivf2_topk``'s) — the storage/refresh/serve
  protocol here is scorer-agnostic.
- Serving reads ≈ nprobe/C of the corpus thanks to cell-clustered
  files; the per-query-batch driver work is one centroid-table probe
  (centroid-sized) and one bounded cell-id collect.
- DELETES: the add-only ``changes()`` feed carries no retractions, so
  a source delete leaves stale rows in the assignments table. They
  stop being SERVED the next :meth:`refresh` only if the consumer
  rebuilds; by default this index is for append-only embedding logs
  (the common corpus-ingest shape) and ``refresh`` RAISES on
  delete/rewrite commits it cannot represent, exactly like the
  streaming source's append-only contract — no silent wrong answers.

Reference parity: the reference pipeline has no ANN at all
(Unity_to_BigQuery.py is 216 LoC of sequential export ETL); this is
north-star LLM-pipeline capability per the build brief.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from unity_to_bigquery_spark.llm.similarity import (
    cosine6,
    ivf_best_cells,
    ivf_search,
    kmeans_centroids,
)
from unity_to_bigquery_spark.plans.versioned import VersionedTable

_APP = "ann-index"


class AnnIndex:
    """Persisted IVF index over an append-only VersionedTable of
    embeddings. See module docstring for the protocol; the short form:

        idx = AnnIndex(spark, root, source)
        idx.build()                  # once
        idx.topk(queries, k=5)       # many
        ...source.commit_append(new_vectors)...
        idx.refresh()                # cost ∝ appended vectors
        if idx.should_retrain(): idx.build()
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        source: VersionedTable,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        ncells: int | None = None,
        seed: int = 7,
    ):
        self.spark = spark
        self.source = source
        self.id_col = id_col
        self.vec_col = vec_col
        self.ncells = ncells
        self.seed = seed
        self.centroids = VersionedTable(spark, os.path.join(root, "centroids"))
        # cell-partitioned + distinct-set-indexed: probed-cell serving
        # skips whole files via the manifest, no data IO for cold cells
        self.assignments = VersionedTable(
            spark,
            os.path.join(root, "assignments"),
            partition_col="cell_id",
            distinct_index_cols=("cell_id",),
        )

    # ---- bookkeeping -------------------------------------------------
    def indexed_version(self) -> int:
        """Source version the index reflects (0 = never built) — the
        Delta txn bookmark on the assignments table."""
        return self.assignments.manifest().get("txns", {}).get(_APP, 0)

    def centroid_frame(self) -> DataFrame:
        """Stored centroids in the (id_col, vec_col) shape the
        similarity kernels consume."""
        return self.centroids.read().select(
            F.col("cell_id").alias(self.id_col),
            F.col("centroid").alias(self.vec_col),
        )

    def _assignment_rows(self, vecs: DataFrame, cents: DataFrame, v: int) -> DataFrame:
        best = ivf_best_cells(vecs, cents, self.id_col, self.vec_col, nassign=1)
        return (
            vecs.select(self.id_col, self.vec_col)
            .join(best, on=self.id_col)
            .select(
                F.col(self.id_col),
                F.col("cell_id"),
                F.col("sim6"),
                F.lit(v).cast("long").alias("src_version"),
                F.col(self.vec_col),
            )
        )

    # ---- build / retrain ----------------------------------------------
    def build(self) -> int:
        """Train centroids on the CURRENT source snapshot and assign
        every vector; returns the indexed source version. Also the
        RETRAIN path: both tables are atomically overwritten, the
        refresh bookmark advances (or is preserved on a same-version
        retrain), and a crash between the two commits is repaired by
        re-running build (training is seed-deterministic)."""
        v = self.source.latest_version()
        if v == 0:
            raise ValueError("AnnIndex.build: source table is empty")
        snap = self.source.read(v)
        n = snap.count()
        ncells = self.ncells or max(16, int(n**0.5))
        cents = kmeans_centroids(
            snap, ncells, id_col=self.id_col, vec_col=self.vec_col,
            seed=self.seed, corpus_count=n,
        )
        self.centroids.commit_overwrite(
            cents.select(
                F.col(self.id_col).alias("cell_id"),
                F.col(self.vec_col).alias("centroid"),
            )
        )
        rows = self._assignment_rows(snap, cents, v)
        if self.indexed_version() >= v:
            # retrain at an already-indexed version: force the rewrite —
            # the bookmark is already correct and carries forward
            self.assignments.commit_overwrite(rows)
        else:
            self.assignments.commit_overwrite(rows, txn=(_APP, v))
        return v

    # ---- incremental refresh -------------------------------------------
    def refresh(self, max_commits: int | None = None) -> int:
        """Assign all vectors appended since the bookmark against the
        STORED centroids and fold them in; returns the source version
        now reflected. No-op when current. Backlogs page at
        ``max_commits`` (default CDC_MAX_COMMITS) — one atomic
        idempotent merge per page, crash-resumable between pages.

        Append-only contract: a delete/rewrite commit in the window is
        rejected loudly (the add-only CDC feed would silently leave
        stale index rows serving retracted vectors) — retrain via
        :meth:`build` to absorb destructive source history."""
        page = VersionedTable.CDC_MAX_COMMITS if max_commits is None else max_commits
        if page < 1:
            raise ValueError(f"max_commits must be >= 1, got {page}")
        last = self.indexed_version()
        if last == 0:
            raise ValueError("AnnIndex.refresh: build() the index first")
        now = self.source.latest_version()
        if last < now:
            self._check_append_only(last, now)
        cents = self.centroid_frame()
        while last < now:
            upto = min(last + page, now)
            delta = self.source.changes(last, upto)
            rows = self._assignment_rows(delta, cents, upto)
            self.assignments.merge_upsert(rows, self.id_col, txn=(_APP, upto))
            last = upto
        return last

    def _check_append_only(self, last: int, now: int) -> None:
        ok_ops = ("append",)
        for v in range(last + 1, now + 1):
            m = self.source.manifest(v)
            op = m.get("op", "")
            if op.startswith("set_partitioning") or op in ok_ops:
                continue
            raise ValueError(
                f"AnnIndex.refresh: source commit v{v} is '{op}' — the "
                "add-only CDC feed cannot retract index rows for "
                "delete/rewrite commits; retrain with build() instead"
            )

    # ---- serving ---------------------------------------------------------
    def topk(
        self, queries: DataFrame, k: int = 5, nprobe: int = 4,
        query_id: str = "query_id",
    ) -> DataFrame:
        """Serve approximate top-k from the STORED index — no training,
        no corpus-wide assignment, no join back to the source. Probes
        are planned against the broadcast centroid table; the
        assignments scan is pruned to the probed cells via manifest
        stats (the bounded driver step is one |Q|×nprobe cell-id
        collect); scoring is the shared ``ivf_search`` plan, so results
        are bit-identical to ``ivf_topk`` under the same centroids."""
        cents = self.centroid_frame()
        q = queries.select(
            F.col(self.id_col).alias(query_id), F.col(self.vec_col).alias("__qvec")
        )
        c = cents.select(
            F.col(self.id_col).alias("cell_id"), F.col(self.vec_col).alias("__cvec")
        )
        qcells = q.crossJoin(F.broadcast(c)).withColumn(
            "__sim", cosine6(F.col("__qvec"), F.col("__cvec"))
        )
        wq = Window.partitionBy(query_id).orderBy(F.desc("__sim"), F.asc("cell_id"))
        probed_ids = [
            r.cell_id
            for r in qcells.withColumn("__rn", F.row_number().over(wq))
            .filter(F.col("__rn") <= nprobe)
            .select("cell_id")
            .distinct()
            .collect()  # bounded: <= |Q| * nprobe cell ids
        ]
        assigned = self.assignments.read_pruned_eq("cell_id", probed_ids).select(
            self.id_col, self.vec_col, "cell_id"
        )
        return ivf_search(
            assigned, queries, cents, k=k, nprobe=nprobe,
            id_col=self.id_col, vec_col=self.vec_col, query_id=query_id,
        )

    # ---- drift / retrain policy ------------------------------------------
    def drift_stats(self) -> DataFrame:
        """Assignment quality per refresh epoch, straight off the
        stored index: (src_version, n, mean_sim6) — mean cosine of each
        epoch's vectors to their assigned centroid, 1e-6 fixed point.
        The build epoch is the smallest src_version present (a retrain
        rewrites every row to its own epoch)."""
        return (
            self.assignments.read()
            .groupBy("src_version")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.floor(F.avg("sim6")).cast("long").alias("mean_sim6"),
            )
        )

    def should_retrain(self, drop6: int = 50_000, min_new: int = 50) -> bool:
        """Retrain trigger: True when the NEWEST refresh epoch's mean
        assignment quality fell more than ``drop6`` (1e-6 cosine units,
        default 0.05) below the FIRST refresh epoch's — i.e. incoming
        data no longer matches the trained cell structure.

        The baseline is deliberately the first REFRESH epoch, not the
        build epoch: build-epoch quality is in-sample (the centroids
        were trained on those vectors) while refresh epochs are
        out-of-sample, and the train/held-out gap would read as "drift"
        on day one (measured ~0.11 on the near-random fixture). Drift
        is out-of-sample quality DEGRADING over time — apples to
        apples. With fewer than two qualifying refresh epochs there is
        no signal yet and the answer is False. Epochs smaller than
        ``min_new`` vectors are ignored (a handful of outliers is not
        drift). The stats read is epoch-count-sized, not corpus-sized
        (hash agg over the index, one row per epoch)."""
        rows = sorted(
            self.drift_stats().collect(), key=lambda r: r.src_version
        )  # bounded: one row per refresh epoch
        refreshes = [r for r in rows[1:] if r.n >= min_new]
        if len(refreshes) < 2:
            return False
        return refreshes[-1].mean_sim6 < refreshes[0].mean_sim6 - drop6
