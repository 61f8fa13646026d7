"""Structured Streaming flavor of the incremental pipeline
(SURVEY.md §2B Streaming): file-source micro-batches over the landing
dir with Trigger.AvailableNow (the reference's poll-until-complete loop
A2 + continueFrom A12 become engine-managed checkpoints), watermarked
window aggregates, streaming dedup, arbitrary stateful processing, and
an idempotent foreachBatch sink (A11 exactly-once).

Everything here is differentially tested against the batch twins in
tests/test_streaming.py — the streaming result on a closed input must
equal the batch result.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

EVENTS_STREAM_DDL = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """File-source micro-batch stream over a landing directory of
    parquet event files (schema pinned — streaming requires it).
    """
    return spark.readStream.schema(EVENTS_STREAM_DDL).parquet(path)


def tumbling_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event type. The watermark
    bounds state: rows later than it are dropped, state for closed
    windows is evicted — the knob that keeps 100 TB streams finite.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def dedup_within_watermark(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup by event_id, state bounded by the watermark
    (dropDuplicatesWithinWatermark — late replays beyond the watermark
    age out of state instead of accumulating forever).
    """
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def _running_count_fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update fn: running event count per user."""
    (user_id,) = key
    count = state.get[0] if state.exists else 0
    for pdf in pdf_iter:
        count += len(pdf)
    state.update((count,))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [count]})


def running_counts_stateful(stream: DataFrame) -> DataFrame:
    """Arbitrary stateful op (applyInPandasWithState): per-user running
    counts maintained across micro-batches in keyed state.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        _running_count_fn,
        outputStructType="user_id BIGINT, n_events BIGINT",
        stateStructType="n BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stateful(stream: DataFrame, gap_seconds: int = 1800, watermark: str = "10 minutes") -> DataFrame:
    """Custom gap-based sessionizer via applyInPandasWithState with an
    EVENT-TIME TIMEOUT: per-user open-session state (start, end, count)
    is extended by each micro-batch; when the watermark passes
    session_end + gap the group times out, the CLOSED session is
    emitted exactly once, and its state is freed.

    This is the arbitrary-stateful analogue of the built-in
    session_window aggregate (e_session_window_builtin) — the shape to
    reach for when the per-session logic outgrows an aggregate (e.g.
    carrying arbitrary accumulators). Gap splits are detected inside
    the update function (so sessions close correctly even when the
    closing evidence and the next session arrive in the same
    micro-batch); the event-time timeout closes sessions that simply
    go idle. State size: one (long,long,long) row per OPEN session;
    the timeout is what bounds it on an unbounded 100 TB stream.

    Timestamps are surfaced as epoch millis (engine-portable; hard
    rule: no raw TIMESTAMP outputs).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = gap_seconds * 1000

    def session_fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def frame(sessions):
            return pd.DataFrame(
                {
                    "user_id": [user_id] * len(sessions),
                    "session_start_ms": [s[0] for s in sessions],
                    "session_end_ms": [s[1] for s in sessions],
                    "n_events": [s[2] for s in sessions],
                }
            )

        if state.hasTimedOut:
            start_ms, end_ms, n = state.get
            state.remove()
            yield frame([(start_ms, end_ms, n)])
            return
        cur = list(state.get) if state.exists else None
        ts_all = []
        for pdf in pdf_iter:
            if len(pdf):
                ts_all.append(pdf["ts"].astype("int64") // 1_000_000)
        closed: list[tuple[int, int, int]] = []
        if ts_all:
            for t in sorted(int(t) for t in pd.concat(ts_all)):
                if cur is None:
                    cur = [t, t, 1]
                elif t - cur[1] > gap_ms:
                    closed.append(tuple(cur))
                    cur = [t, t, 1]
                else:
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
        if cur is not None:
            state.update(tuple(cur))
            state.setTimeoutTimestamp(cur[1] + gap_ms)
        if closed:
            yield frame(closed)

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            session_fn,
            outputStructType=(
                "user_id BIGINT, session_start_ms BIGINT, "
                "session_end_ms BIGINT, n_events BIGINT"
            ),
            stateStructType="start_ms BIGINT, end_ms BIGINT, n BIGINT",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_available_now(
    query_df: DataFrame,
    checkpoint_dir: str,
    sink_table: str,
    output_mode: str | None = None,
) -> None:
    """Drain everything currently available (Trigger.AvailableNow) into
    an in-memory sink table, then stop — the hermetic test harness for
    incremental semantics (replaces the reference's 5 s poll loop,
    Unity_to_BigQuery.py:166-171). ``output_mode`` defaults to
    ``complete`` for aggregating plans, ``append`` otherwise; stateful
    update-mode operators must pass ``"update"``.
    """
    if output_mode is None:
        output_mode = "complete" if _has_agg(query_df) else "append"
    q = (
        query_df.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _has_agg(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()


def run_foreach_batch_idempotent(
    stream: DataFrame, checkpoint_dir: str, sink_root: str
) -> None:
    """Exactly-once sink via idempotent-by-batch-id writes: each
    micro-batch lands in its own directory keyed by batch id with
    overwrite mode, so a replayed batch (post-crash re-delivery)
    overwrites its previous attempt instead of duplicating (the A11
    checkpoint-after-sink contract)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{sink_root}/batch_id={batch_id}")

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def versioned_sink(table, app_id: str):
    """foreachBatch function writing a stream into a
    ``plans.versioned.VersionedTable`` with EXACTLY-ONCE delivery: each
    micro-batch commits via ``commit_append(txn=(app_id, batch_id))``,
    so a replayed batch (crash between sink write and checkpoint
    advance — the reference's §3.3 double-load window, A11) is a no-op
    instead of a duplicate. This is Delta's txnAppId/txnVersion
    idempotent-writer protocol on the manifest log; unlike the
    directory-overwrite sink above, the target stays a queryable,
    time-travelable table while the stream runs.

    Usage::

        q = (stream.writeStream
             .foreachBatch(versioned_sink(table, "events-ingest"))
             .option("checkpointLocation", ckpt).start())
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        table.commit_append(batch_df, txn=(app_id, batch_id))

    return write_batch


def dml_sink(table, app_id: str, stmt_fn):
    """foreachBatch function applying SQL DML per micro-batch with
    EXACTLY-ONCE semantics (round 12 — composes the SQL front doors
    with the txn protocol): ``stmt_fn(batch_df, batch_id)`` returns
    ONE DML statement string (UPDATE / DELETE / INSERT, or MERGE — the
    batch DataFrame is then the USING source), executed via
    ``execute_dml(txn=(app_id, batch_id))``. A replayed batch is a
    no-op even when new rows matching a DELETE/UPDATE predicate landed
    between the attempts — the exact window natural idempotence can't
    close (VERDICT r11 #6). Returning None skips the batch (still
    exactly-once: the next batch's txn id supersedes).

    The canonical GDPR-deleter shape::

        q = (erasure_requests.writeStream.foreachBatch(
                dml_sink(t, "gdpr", lambda b, i:
                    "DELETE FROM t WHERE user_id IN (%s)" % ", ".join(
                        str(r.user_id) for r in b.collect()))
             ).option("checkpointLocation", ckpt).start())
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        stmt = stmt_fn(batch_df, batch_id)
        if stmt is None or not str(stmt).strip():
            # blank statement == None: skip the batch rather than die
            # with an opaque IndexError on the split (ADVICE r12)
            return
        kw = stmt.lstrip().split(None, 1)[0].upper()
        if kw == "MERGE":
            table.execute_dml(stmt, source=batch_df, txn=(app_id, batch_id))
        else:
            table.execute_dml(stmt, txn=(app_id, batch_id))

    return write_batch


def user_stats_tws(stream: DataFrame) -> DataFrame:
    """Per-user running (count, value-cents-total) via the Spark 4
    transformWithStateInPandas API — the typed-state successor to
    applyInPandasWithState: named state variables (ValueState here;
    List/MapState and timers available on the same handle) live in the
    state store per key and survive across micro-batches and restarts.

    Cents use the repo's portable fixed-point scheme (FLOOR(x*100+0.5))
    so the streaming result is bit-comparable with the batch twin.

    Runtime dependency: google.protobuf (the TWS state-server wire
    format ships outside pyspark). Absent protobuf this raises at
    stream start; the applyInPandasWithState operators above cover the
    same semantics without it.
    """
    import numpy as np
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class UserStatsProcessor(StatefulProcessor):
        def init(self, handle):
            self._agg = handle.getValueState("agg", "n BIGINT, cents BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            n, cents = 0, 0
            if self._agg.exists():
                n, cents = tuple(self._agg.get())
            for pdf in rows:
                if not len(pdf):
                    continue
                n += len(pdf)
                cents += int(
                    np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).astype("int64").sum()
                )
            self._agg.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStatsProcessor(),
        outputStructType="user_id BIGINT, n_events BIGINT, total_cents BIGINT",
        outputMode="Update",
        timeMode="None",
    )


def dedup_ingest_sink(table, app_id: str, text_col: str = "text", id_col: str = "doc_id"):
    """foreachBatch function for STREAMING INCREMENTAL DEDUP into a
    ``plans.versioned.VersionedTable``: each micro-batch keeps the
    min-id survivor per content hash within the batch, anti-joins the
    survivors against the hashes already committed to the corpus, and
    appends only genuinely new documents — the streaming twin of the
    batch ``p_incremental_dedup`` (anti-join vs corpus hash index),
    with the corpus table itself as the index.

    Exactly-once: the append commits with ``txn=(app_id, batch_id)``
    (Delta txnAppId/txnVersion protocol) so a replayed micro-batch is
    a no-op — without it, a crash between sink write and checkpoint
    advance would re-deliver the batch and re-insert its documents
    (the reference's §3.3 at-most-once bug class, inverted).

    Scale: the corpus probe reads ONLY ``content_md5`` (column pruning
    drops the document bytes from the index scan); the in-batch window
    and the anti-join both key on the 32-byte hash, never the text.
    At 100 TB the anti-join is a shuffle on hash — or, with the corpus
    bucketed by hash, a co-located join with no corpus-side shuffle.
    """
    from pyspark.sql import Window

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        h = batch_df.withColumn("content_md5", F.md5(F.col(text_col)))
        w = Window.partitionBy("content_md5").orderBy(id_col)
        firsts = (
            h.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if table.manifest()["files"]:
            existing = table.read().select("content_md5").distinct()
            firsts = firsts.join(existing, "content_md5", "left_anti")
        # the anti-join moves its key first; pin the commit schema order
        table.commit_append(
            firsts.select(*batch_df.columns, "content_md5"), txn=(app_id, batch_id)
        )

    return write_batch


def neardup_ingest_sink(
    docs_table,
    index_table,
    app_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    tau6: int = 500000,
):
    """foreachBatch STREAMING NEAR-DUP dedup: the fuzzy twin of
    ``dedup_ingest_sink``. Each micro-batch computes MinHash signatures
    (portable md5-seeded family, llm/dedup.py), looks up candidate
    near-duplicates by LSH band key — against BOTH the accumulated
    signature index and the batch itself — verifies candidates by
    signature agreement (estimated Jaccard ≥ tau), and admits only
    genuinely novel documents: survivors land in ``docs_table``, their
    (band, key, sig) rows in ``index_table``.

    Scale shape: the index probe is an equi-join on the 32-byte band
    key (at 100 TB: bucket the index table by key for a co-located
    probe); signature verification runs only on band-collision
    candidates; the index stores k longs × bands rows per doc, never
    shingles or text. Exactly-once: both commits are txn-stamped per
    batch (docs first, then index) — a crash between them replays the
    batch, the docs commit no-ops, and the index commit completes,
    converging to the consistent state.
    """
    from unity_to_bigquery_spark.llm.dedup import (
        band_key_rows,
        minhash_signature_df,
        sig_agreement6,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        sig = minhash_signature_df(batch_df, id_col=id_col, text=text_col, k=k)
        keys = band_key_rows(sig, id_col=id_col, k=k, bands=bands).persist()

        # in-batch: higher id dies when it collides with a lower id
        a, b = keys.alias("a"), keys.alias("b")
        in_batch = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col(f"a.{id_col}") > F.col(f"b.{id_col}")),
            )
            .filter(sig_agreement6(F.col("a.sig"), F.col("b.sig")) >= tau6)
            .select(F.col(f"a.{id_col}").alias(id_col))
        )
        dropped = in_batch
        if index_table.manifest()["files"]:
            idx = index_table.read()
            vs_index = (
                keys.alias("n")
                .join(
                    idx.alias("i"),
                    (F.col("n.band") == F.col("i.band"))
                    & (F.col("n.key") == F.col("i.key")),
                )
                .filter(sig_agreement6(F.col("n.sig"), F.col("i.sig")) >= tau6)
                .select(F.col(f"n.{id_col}").alias(id_col))
            )
            dropped = dropped.unionByName(vs_index)
        dropped = dropped.distinct()

        keep_docs = batch_df.join(dropped, id_col, "left_anti")
        docs_table.commit_append(
            keep_docs.select(*batch_df.columns), txn=(app_id, batch_id)
        )
        keep_keys = keys.join(dropped, id_col, "left_anti")
        index_table.commit_append(
            keep_keys.select(id_col, "band", "key", "sig"),
            txn=(f"{app_id}#index", batch_id),
        )
        keys.unpersist()

    return write_batch


def continuous_aggregate_stream(agg, checkpoint_dir: str):
    """LIVE materialized view: drive ``ContinuousAggregate.refresh()``
    from a Structured Streaming query over the source table's manifest
    log (the versioned_table stream source) with
    ``Trigger.AvailableNow`` — commit-to-rollup maintenance without a
    scheduler.

    The micro-batch ROWS are only the trigger: ``refresh()`` re-reads
    the delta by SOURCE VERSION (``changes(last, now)``) and folds it
    under a version-keyed txn commit, so exactly-once stays anchored
    to the manifest log, not to Spark batch ids — a replayed batch
    after checkpoint loss re-runs refresh() as a no-op rather than
    double-counting. Returns the started query; callers await it.
    """
    from unity_to_bigquery_spark.sources import versioned_stream

    versioned_stream.register(agg.spark)
    reader = agg.spark.readStream.format("versioned_table").option(
        "path", agg.source.root
    )
    if getattr(agg, "handle_deletes", False):
        # delete commits must flow (as retraction rows) instead of
        # failing the stream — refresh() folds them with signed weights
        reader = reader.option("emit_change_types", "true")
    stream = reader.load()

    def fold(_df, _batch_id):
        agg.refresh()

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def scd2_dim_sink(dim_table, app_id: str):
    """foreachBatch sink maintaining a TYPE-2 dimension incrementally
    from an event stream: rows
    (dim_key, user_id, state, valid_from_us, valid_to_us, is_current).

    Per micro-batch (events must arrive per-user in event-time order —
    pair with a watermark + dropLate upstream, same contract as any
    append-only SCD2 loader):

    1. join the batch's users to their OPEN interval in the dim;
    2. change-point detection inside the batch with the open state
       seeding the first lag (so a batch whose events all match the
       open state writes NOTHING);
    3. emit: the closed version of the open interval (same dim_key →
       update) plus the batch's new intervals, the last one open.

    All set-based (windows + joins, no collects); the single
    ``merge_upsert(txn=(app_id, batch_id))`` makes replays no-ops —
    crash-safe exactly-once, same protocol as the continuous
    aggregate. Work per batch: the batch itself + the OPEN rows of the
    touched users (stats-pruned merge) — never the dim's history.
    """
    from pyspark.sql import Window

    def write_batch(batch_df, batch_id: int):
        evs = batch_df.select("user_id", "event_type", "ts", "event_id")
        if not evs.take(1):
            return
        have_dim = bool(dim_table.manifest()["files"])
        if have_dim:
            open_iv = (
                dim_table.read()
                .filter(F.col("is_current"))
                .join(evs.select("user_id").distinct(), "user_id", "left_semi")
                .select(
                    "user_id",
                    F.col("state").alias("__open_state"),
                    F.col("valid_from_us").alias("__open_from"),
                )
            )
        else:
            open_iv = None
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        seeded = evs.withColumn("__prev", F.lag("event_type").over(w))
        if open_iv is not None:
            seeded = seeded.join(open_iv, "user_id", "left").withColumn(
                "__prev", F.coalesce("__prev", "__open_state")
            )
        else:
            seeded = seeded.withColumn(
                "__open_state", F.lit(None).cast("string")
            ).withColumn("__open_from", F.lit(None).cast("long"))
        changes = seeded.filter(
            F.col("__prev").isNull() | (F.col("__prev") != F.col("event_type"))
        )
        wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
        new_iv = changes.select(
            "user_id",
            F.col("event_type").alias("state"),
            F.unix_micros("ts").alias("valid_from_us"),
            F.unix_micros(F.lead("ts").over(wc)).alias("valid_to_us"),
            F.lead("ts").over(wc).isNull().alias("is_current"),
            "__open_from",
        )
        # close the touched users' open intervals at their first change
        wfirst = Window.partitionBy("user_id").orderBy("valid_from_us")
        first_change = (
            new_iv.withColumn("__rn", F.row_number().over(wfirst))
            .filter((F.col("__rn") == 1) & F.col("__open_from").isNotNull())
            .select(
                "user_id",
                F.col("__open_from").alias("valid_from_us"),
                F.col("valid_from_us").alias("__close_at"),
            )
        )
        closed = None
        if open_iv is not None:
            closed = (
                dim_table.read()
                .filter(F.col("is_current"))
                .join(first_change, ["user_id", "valid_from_us"])
                .select(
                    "user_id",
                    "state",
                    "valid_from_us",
                    F.col("__close_at").alias("valid_to_us"),
                    F.lit(False).alias("is_current"),
                )
            )
        out = new_iv.select(
            "user_id", "state", "valid_from_us", "valid_to_us", "is_current"
        )
        if closed is not None:
            out = out.unionByName(closed)
        out = out.withColumn(
            "dim_key",
            F.concat_ws("#", F.col("user_id").cast("string"),
                        F.col("valid_from_us").cast("string")),
        ).select(
            "dim_key", "user_id", "state", "valid_from_us", "valid_to_us",
            "is_current",
        )
        dim_table.merge_upsert(out, "dim_key", txn=(app_id, int(batch_id)))

    return write_batch


def scd2_rebuild_intervals(evs: DataFrame) -> DataFrame:
    """Batch SCD2 interval build keyed for the dim table — the same
    two-window construction as queries/windows.w_scd2_intervals, with
    the sink's dim_key/state column shape. Cost: one exchange on
    user_id for events of the REBUILT users only."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        evs.withColumn("__prev", F.lag("event_type").over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("event_type")))
        .select("user_id", "event_type", "ts", "event_id")
    )
    iv = changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )
    return iv.select(
        F.concat_ws(
            "#", F.col("user_id").cast("string"),
            F.col("valid_from_us").cast("string"),
        ).alias("dim_key"),
        "user_id", "state", "valid_from_us", "valid_to_us", "is_current",
    )


def scd2_dim_sink_cdc(dim_table, source_table, app_id: str):
    """Change-feed-aware SCD2 maintenance (VERDICT r3 #8): pair with a
    ``versioned_table`` stream reading ``source_table`` with
    ``emit_change_types=true``.

    - An insert-only micro-batch maintains the dimension incrementally —
      exactly ``scd2_dim_sink``'s plan (open-interval close + append).
    - A batch carrying ``_change_type='delete'`` retractions (a
      late-arriving deletion of events already folded into the
      dimension) triggers a LOCALIZED REBUILD: every user present in
      the batch has their slice recomputed from the source's live
      events — intervals around the removed events merge/close/re-open
      as the data dictates, including vanishing entirely when a user
      has no events left — and swapped in with ONE atomic
      ``commit_replace_keys`` (drop the user's old slice + append the
      recomputed one in the same manifest publish, txn-stamped).

    Scale: repair work is bounded by the touched users' event history
    (semi-join pushdown on user_id), never the dimension or the corpus;
    the common insert-only path stays delta-sized. Crash between
    nothing: both paths are single atomic commits with the same
    (app_id, batch_id) txn, so replays are no-ops.
    """
    incremental = scd2_dim_sink(dim_table, app_id)
    ct = "_change_type"

    def write_batch(batch_df, batch_id: int):
        if not batch_df.take(1):
            return
        if not batch_df.filter(F.col(ct) == "delete").take(1):
            incremental(batch_df.drop(ct, "_commit_version"), batch_id)
            return
        users = batch_df.select("user_id").distinct()
        # pin the rebuild to the BATCH's end version, not the live
        # snapshot: source commits landing between offset planning and
        # this foreachBatch call would otherwise get baked into the
        # rebuilt slice, then redelivered as inserts next batch — the
        # incremental re-fold against the already-advanced open interval
        # yields a spurious change point, a backwards valid_to, and
        # duplicate dim_key rows. (Bounded collect: one scalar.)
        end_v = batch_df.agg(F.max("_commit_version")).first()[0]
        live = (
            source_table.read(version=int(end_v))
            .join(users, "user_id", "left_semi")
            .select("user_id", "event_type", "ts", "event_id")
        )
        rebuilt = scd2_rebuild_intervals(live)
        dim_table.commit_replace_keys(
            rebuilt, users, "user_id", txn=(app_id, int(batch_id))
        )

    return write_batch


def ann_index_ingest_sink(index, app_id: str):
    """foreachBatch function for STREAMING ANN-INDEX MAINTENANCE: each
    micro-batch appends its embeddings to the index's SOURCE
    VersionedTable exactly-once (txn protocol, like versioned_sink)
    and incrementally refreshes the index — per-batch assignment cost
    ∝ batch size (llm/ann_index refresh), so the index tracks the
    stream head within one commit and similarity queries served from
    it (AnnIndex.topk / PqIndex.topk) see new vectors as they land.

    First-batch bootstrap: an unbuilt index is built() on the first
    micro-batch (centroids/codebooks train on that batch). A
    deployment with history should batch-backfill, build(), and hand
    the stream off via ``sources.versioned_stream.bounded_bootstrap``
    instead — the sink then only ever refreshes.

    Exactly-once across replays: the source append carries
    ``txn=(app_id, batch_id)`` (a replayed micro-batch no-ops) and the
    refresh carries the index's own source-version bookmark, so a
    crash anywhere between append, refresh, and checkpoint advance
    re-runs as no-ops. Works with any derived-state index honoring the
    build/refresh/indexed_version/source contract — AnnIndex, PqIndex,
    and the exact-substring GramIndex (llm/gram_index.py) all do, so
    one sink maintains vector AND dedup state from the same stream."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        index.source.commit_append(batch_df, txn=(app_id, batch_id))
        if index.indexed_version() == 0:
            index.build()
        else:
            index.refresh()

    return write_batch


def index_cdc_maintenance_sink(index):
    """foreachBatch for STREAMING RETRACTION MAINTENANCE of a derived
    index (round 9 — VERDICT r8 #1, the headline asymmetry): pair with
    a ``versioned_table`` stream over the INDEX'S SOURCE table with
    ``emit_change_types=true``. Until now the streaming index sinks
    only consumed append commits — a delete commit mid-stream either
    failed the stream or was skipped, forcing an out-of-band batch
    refresh. This sink closes that: a delete/rewrite/restore commit
    arriving mid-stream retracts through EXACTLY the batch machinery.

    How it stays exact with zero sink-side state: CDC-stream
    micro-batches are commit-aligned (offsets are manifest versions — a
    commit never splits across batches), so the batch's max
    ``_commit_version`` IS a source version boundary. The sink refreshes
    the index to precisely that boundary (``refresh(to_version=...)``),
    which reads the manifest log's typed feed directly — pure-append
    windows take the cheap merge path, windows with retractions fold
    ``changes_final_state`` into one atomic ``commit_replace_keys`` per
    page, byte-identical to a batch refresh over the same window.

    Exactly-once across crashes and replays: the refresh bookmark is a
    txn in the index table's own manifest, so a replayed micro-batch
    (same or older boundary) no-ops; a crash between the refresh and
    the checkpoint advance replays as a no-op too. Works with any index
    honoring the build/refresh(to_version)/indexed_version/source
    contract — AnnIndex, PqIndex, GramIndex, LshIndex.

    Differential invariant (tests/test_streaming.py): drained stream
    over interleaved append+delete commits leaves index state ≡ a
    batch build+refresh of the final corpus.
    """
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        head = batch_df.agg(F.max("_commit_version")).first()[0]
        if head is None:
            return  # empty batch: nothing delivered, nothing to fold
        end_v = int(head)
        if index.indexed_version() == 0:
            # bootstrap: train on the live snapshot (>= this batch's
            # boundary); later batches at or below it no-op via the
            # bookmark, exactly like ann_index_ingest_sink's bootstrap
            index.build()
        else:
            index.refresh(to_version=end_v)

    return write_batch


def join_view_cdc_maintenance_sink(view, side: str):
    """foreachBatch for streaming maintenance of an
    ``IncrementalJoinView`` (round 10): pair ONE sink per side with a
    ``versioned_table`` CDC stream (``emit_change_types=true``) over
    that side's source table. Each micro-batch is commit-aligned, so
    its max ``_commit_version`` is a version boundary on that side; the
    sink folds exactly that window (``refresh(to_a=...)`` /
    ``refresh(to_b=...)``) while the OTHER side folds to its current
    head — the view's per-side txn bookmarks make a replayed or
    crashed-and-restarted batch a no-op on the pinned side and an
    idempotent exact fold on the other. Zero sink-side state; two
    independent streams (one per side) drain to the identical state a
    batch refresh of the final snapshots produces
    (tests/test_streaming.py differential). Both sinks must share ONE
    view instance: refresh() serializes concurrent per-side batches on
    the view's internal lock (ADVICE r10 — commit staging runs through
    mutable handle state), so live processingTime streams on both
    sides are safe."""
    if side not in ("a", "b"):
        raise ValueError(f"side must be 'a' or 'b', got {side!r}")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        head = batch_df.agg(F.max("_commit_version")).first()[0]
        if head is None:
            return  # empty batch: nothing delivered, nothing to fold
        end_v = int(head)
        if side == "a":
            view.refresh(to_a=end_v)
        else:
            view.refresh(to_b=end_v)

    return write_batch


def catalog_txn_sink(
    catalog,
    app_id: str,
    writes: dict,
    fault_injection=None,
):
    """foreachBatch for a MULTI-TABLE STREAMING TRANSACTION (round 11,
    VERDICT r10 #8): every micro-batch lands on >= 2 catalog tables
    through ONE ``CatalogTransaction`` — one catalog CAS per batch, so
    a catalog reader flips between batch-consistent cross-table worlds
    and never sees half a batch. ``writes`` maps table name →
    ``fn(batch_df) -> DataFrame`` (the rows to append to that table).

    Exactly-once across crashes, composing the two existing protocols:

    - each staged append carries ``txn=(app_id, batch_id)``, which
      publish carries onto main (the r9 txn-through-publish rule);
    - the sink opens every batch with ``catalog.recover()`` — a crash
      INSIDE a previous batch's commit (intent written, some publishes
      done) is finished before anything else, exactly like a fresh
      catalog client would;
    - the batch is then SKIPPED if every member table's main log
      already records ``batch_id`` (the replayed-batch no-op). A crash
      BEFORE the intent leaves only orphaned txn branches (never
      published, invisible, vacuumable) and the replay stages a fresh
      transaction — still exactly once.

    ``fault_injection(tx, batch_id)`` is a TEST hook invoked after
    staging, in place of ``tx.commit()`` when it raises — the streamed
    crash gauntlet uses it to die between publishes the way the batch
    twin (p_catalog_multi_table_txn) does."""
    if len(writes) < 2:
        raise ValueError("catalog_txn_sink needs >= 2 member tables")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        catalog.recover()
        if all(
            catalog.table(n).manifest().get("txns", {}).get(app_id, -1)
            >= batch_id
            for n in writes
        ):
            return  # replayed batch: already landed + catalog-visible
        if batch_df.isEmpty():
            return
        tx = catalog.transaction()
        for name, fn in writes.items():
            tx.write(name).commit_append(
                fn(batch_df), txn=(app_id, int(batch_id))
            )
        if fault_injection is not None:
            fault_injection(tx, int(batch_id))
        tx.commit()

    return write_batch


CRAWL_PAGE_DDL = (
    "content_key STRING, title STRING, n_text_chars BIGINT, "
    "n_words BIGINT, n_links INT, site STRING"
)
CRAWL_CORPUS_DDL = (
    "doc_id BIGINT, content_key STRING, title STRING, text STRING, "
    "n_chars BIGINT, n_text_chars BIGINT, n_words BIGINT, n_links INT, "
    "site STRING"
)


def _crawl_extract(records: DataFrame) -> DataFrame:
    """WARC response records → one row per page occurrence through the
    real WHATWG tokenizer (llm/html.extract_html), plus the content
    identity key (md5 of the raw body) and the raw markup retained for
    downstream index maintenance. One Arrow stage; shared by the
    streaming sink and its batch differential twin."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from unity_to_bigquery_spark.llm.html import extract_html

        for pdf in it:
            rows = []
            for body in pdf["body"]:
                raw = bytes(body)
                # errors='replace': a real crawl landing zone routinely
                # carries non-UTF-8 bodies; a strict decode would raise
                # inside the Arrow stage and wedge the streaming query
                # on every replay of that batch (ADVICE r8). Content
                # identity stays the md5 of the RAW bytes, so dedup is
                # unaffected by replacement characters.
                html = raw.decode("utf-8", errors="replace")
                m = extract_html(html)
                digest = hashlib.md5(raw).digest()
                rows.append(
                    (
                        digest.hex(),
                        int.from_bytes(digest[:8], "big") % (1 << 62),
                        m["title"], html, len(html), m["n_text_chars"],
                        m["n_words"], m["n_links"], m["first_link_host"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "content_key", "doc_id", "title", "text", "n_chars",
                    "n_text_chars", "n_words", "n_links", "site",
                ],
            )

    return records.filter(F.col("warc_type") == "response").select(
        "body"
    ).mapInPandas(
        batches,
        "content_key STRING, doc_id BIGINT, title STRING, text STRING, "
        "n_chars BIGINT, n_text_chars BIGINT, n_words BIGINT, "
        "n_links INT, site STRING",
    )


def crawl_corpus_sink(pages, corpus, app_id: str, index=None):
    """foreachBatch for the STREAMING crawl→corpus pipeline (VERDICT
    r7 #6) — the composition of the streaming WARC source, the HTML
    extractor, dedup-against-corpus admission, exactly-once corpus
    commits, and derived-index maintenance, in ONE checkpointed query:

        WARC stream → extract (real tokenizer, one Arrow stage)
                    → append the occurrence log (``pages``)
                    → anti-join ADMISSION against the corpus state
                      (only content keys never seen before land)
                    → commit admitted pages to ``corpus``
                    → ``index.refresh()`` (any build/refresh/
                      indexed_version/source-contract index whose
                      source IS the corpus — e.g. GramIndex for
                      exact-substring dedup state over the markup)

    Exactly-once across replays and crashes: both table commits carry
    ``txn=(app_id(+suffix), batch_id)``; a micro-batch replayed after
    a crash anywhere between the two commits, the index refresh, and
    the checkpoint advance re-runs every step as a no-op (the
    admission anti-join recomputes the same admitted set because the
    corpus state it reads is exactly what the crashed attempt left).
    Commit order is pages-then-corpus so the occurrence log is never
    behind the corpus it explains.

    Scale: extraction is ∝ batch bytes; the admission anti-join
    shuffles the BATCH's distinct keys against the corpus key column
    (column-pruned scan); nothing rescans corpus content. Serve the
    batch-equivalent report with :func:`crawl_corpus_report`."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        ext = _crawl_extract(batch_df).persist()
        try:
            occurrences = ext.select(
                "content_key", "title", "n_text_chars", "n_words",
                "n_links", "site",
            )
            pages.commit_append(occurrences, txn=(app_id + ".pages", batch_id))
            cand = ext.select(
                "doc_id", "content_key", "title", "text", "n_chars",
                "n_text_chars", "n_words", "n_links", "site",
            ).dropDuplicates(["content_key"])
            if corpus.latest_version() == 0:  # never written: all admit
                admitted = cand
            else:
                seen = corpus.read().select("content_key")
                admitted = cand.join(seen, "content_key", "left_anti")
            admitted = admitted.select(
                "doc_id", "content_key", "title", "text", "n_chars",
                "n_text_chars", "n_words", "n_links", "site",
            )
            # all-duplicate batches commit nothing; replay-safe because
            # the admission recomputation is deterministic (the txn map
            # tolerates gaps — its check is >=, not ==)
            if not admitted.isEmpty():
                corpus.commit_append(
                    admitted, txn=(app_id + ".corpus", batch_id)
                )
        finally:
            ext.unpersist()
        if index is not None:
            if index.indexed_version() == 0:
                index.build()
            else:
                index.refresh()

    return write_batch


def crawl_corpus_report(pages, corpus) -> DataFrame:
    """The corpus-side report (title, n_copies, n_text_chars, n_words,
    n_links, site) from the streamed state — serve-time aggregation
    over the occurrence log joined to the deduped corpus, the same
    output contract as the batch ``p_crawl_corpus`` capstone (the
    drain≡batch differential in tests/test_streaming.py)."""
    counts = pages.read().groupBy("content_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_copies")
    )
    return corpus.read().join(counts, "content_key").select(
        "title", "n_copies", "n_text_chars", "n_words", "n_links", "site"
    )
