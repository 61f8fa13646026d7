"""Continuous aggregates: a materialized per-key rollup maintained
incrementally from a VersionedTable's CDC reads — TimescaleDB
continuous aggregates / materialized-view maintenance, built on the
manifest log instead of a full rescan.

Generalizes the reference's incremental-continuation idea
(``Unity_to_BigQuery.py:63-66,155`` — resume from the last processed
job) from "which files have I ingested" to "which source VERSION has
my aggregate folded in".

Scale: each refresh touches (a) the delta files added since the last
refresh (``changes()`` — an explicit-file-list scan, never the whole
table) and (b) the aggregate-table files holding the touched keys
(``merge_upsert`` prunes by key-range stats). Neither cost grows with
total source size. Sums are stored as 1e-6 fixed-point longs so
partial aggregates merge exactly (order-independent, cross-engine —
functions/canonical.py discipline).

Exactly-once: the refresh folds the delta and records the source
version in ONE atomic commit (``merge_upsert(txn=...)``), so a crash
between publish and anything else re-runs as a no-op; double-counting
a delta is impossible.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from unity_to_bigquery_spark.plans.versioned import VersionedTable

_APP = "contagg-refresh"


class ContinuousAggregate:
    """Maintains ``root`` as a rollup of ``source``: one row per value
    of ``key`` with ``n`` (row count) and a 1e-6 fixed-point long sum
    per entry of ``measures`` ({out_col: source_double_col}).

    With the default ``handle_deletes=False`` the source must be
    append-only (``changes()`` is add-only CDC). ``handle_deletes=True``
    switches the refresh to the full change feed
    (``changes_with_type()``) and folds retraction rows as NEGATIVE
    deltas — delete_where / rewrite commits then keep the rollup exact.
    A key whose count reaches zero persists as an ``n=0`` tombstone in
    storage (one atomic merge commit keeps exactly-once; a separate
    delete commit would break it) and ``read()`` filters tombstones out,
    so the rollup always equals a full groupBy of the live snapshot.
    """

    def __init__(
        self,
        spark: SparkSession,
        source: VersionedTable,
        root: str,
        key: str,
        measures: dict[str, str],
        handle_deletes: bool = False,
    ):
        self.spark = spark
        self.source = source
        self.key = key
        self.measures = dict(measures)
        self.handle_deletes = handle_deletes
        self.table = VersionedTable(spark, root)

    def last_refreshed(self) -> int:
        """Source version already folded into the aggregate (0 = none)."""
        return self.table.manifest().get("txns", {}).get(_APP, 0)

    def _delta_agg(self, delta: DataFrame) -> DataFrame:
        sums = [
            F.sum(F.floor(F.col(src) * 1000000.0 + F.lit(0.5)).cast("long")).alias(out)
            for out, src in self.measures.items()
        ]
        return delta.groupBy(self.key).agg(F.count(F.lit(1)).alias("n"), *sums)

    def _delta_agg_signed(self, feed: DataFrame) -> DataFrame:
        """Signed fold of a change feed: retraction rows contribute -1
        to the count and subtract their fixed-point measure — the
        standard materialized-view delta rule (insert +r, delete -r)."""
        ct = VersionedTable.CDC_TYPE_COL
        sign = F.when(F.col(ct) == F.lit("delete"), F.lit(-1)).otherwise(F.lit(1))
        sums = [
            F.sum(
                sign * F.floor(F.col(src) * 1000000.0 + F.lit(0.5)).cast("long")
            ).alias(out)
            for out, src in self.measures.items()
        ]
        return feed.groupBy(self.key).agg(F.sum(sign).alias("n"), *sums)

    def refresh(self, max_commits: int | None = None) -> int:
        """Fold all source commits since the last refresh into the
        rollup; returns the source version now reflected. No-op when
        already current (and when called twice — txn idempotency).

        A catch-up longer than ``max_commits`` (default
        ``VersionedTable.CDC_MAX_COMMITS``) is PAGED: each page folds
        ≤max_commits commits in its own atomic merge commit, so the
        long-idle scenario never hits the CDC window cap and a crash
        between pages resumes from the last committed page (folds over
        consecutive pages compose exactly — the CDC-level composition
        is unit-tested in test_cdc_retractions)."""
        page = (
            VersionedTable.CDC_MAX_COMMITS if max_commits is None else max_commits
        )
        if page < 1:
            raise ValueError(f"max_commits must be >= 1, got {page}")
        last = self.last_refreshed()
        now = self.source.latest_version()
        while last < now:
            last = self._refresh_window(last, min(last + page, now))
        return last

    def _refresh_window(self, last: int, now: int) -> int:
        """Fold source commits in ``(last, now]`` as one atomic merge
        commit stamped txn=(app, now)."""
        if self.handle_deletes:
            d = self._delta_agg_signed(
                self.source.changes_with_type(last, now, max_commits=now - last)
            )
        else:
            d = self._delta_agg(self.source.changes(last, now))
        cols = [self.key, "n", *self.measures.keys()]
        if self.table.manifest()["files"]:
            cur = self.table.read()
            merged = d.alias("d").join(
                cur.alias("c"), on=self.key, how="left"
            ).select(
                F.col(f"d.{self.key}").alias(self.key),
                (F.coalesce(F.col("c.n"), F.lit(0)) + F.col("d.n")).alias("n"),
                *[
                    (F.coalesce(F.col(f"c.{m}"), F.lit(0)) + F.col(f"d.{m}")).alias(m)
                    for m in self.measures
                ],
            )
            updates = merged.select(*cols)
        else:
            updates = d.select(*cols)
        # merge_upsert executes this updates plan twice (key-bounds agg
        # for file pruning, then the file write). A persist() of
        # updates was tried to dedupe that (r6) and measured SLOWER at
        # sf0.1 (min-of-3 2.65 s vs 1.9-2.0 s unpersisted, alternating
        # A/B in one session): the delta is toy-sized here, so the
        # extra cache stage per refresh costs more than the re-scan
        # saves. At real scale the delta fold is aggregate-sized (one
        # row per touched key) either way — revisit persist only if a
        # wide-key workload shows the double execution in job timings.
        self.table.merge_upsert(updates, self.key, txn=(_APP, now))
        return now

    def read(self) -> DataFrame:
        df = self.table.read()
        if self.handle_deletes:
            # tombstones (fully-retracted keys) are storage detail,
            # never a result row — filtered here so the rollup equals a
            # full groupBy of the live snapshot
            df = df.filter(F.col("n") != 0)
        return df
