"""A15/A16/A17 behavioral tests: config validation names missing keys,
path expansion applies, error hook records and re-raises."""

from __future__ import annotations

import json

import pytest

from unity_to_bigquery_spark.plans.ops_support import (
    ConfigError,
    ErrorNotifier,
    load_config,
    run_with_notification,
)


def _write(tmp_path, cfg):
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg))
    return str(p)


GOOD = {
    "postgres_username": "u",
    "postgres_pass": "p",
    "postgres_host": "h",
    "unity_project_id": ["proj-1"],
    "local_collection_path": "~/data",
}


def test_load_config_expands_and_validates(tmp_path):
    cfg = load_config(_write(tmp_path, GOOD))
    assert not cfg["local_collection_path"].startswith("~")


def test_load_config_names_missing_keys(tmp_path):
    bad = dict(GOOD, postgres_host="", unity_project_id=[])
    with pytest.raises(ConfigError) as ei:
        load_config(_write(tmp_path, bad))
    assert "postgres_host" in str(ei.value)
    assert "unity_project_id" in str(ei.value)


def test_error_notifier_records_and_reraises():
    outbox = []
    n = ErrorNotifier(sink=lambda ch, msg: outbox.append((ch, msg)))

    def boom():
        raise RuntimeError("export job failed")

    with pytest.raises(RuntimeError):
        run_with_notification(n, boom)
    assert n.sent == [("#analytics_feed", "RuntimeError: export job failed")]
    assert outbox == n.sent

    assert run_with_notification(n, lambda: 42) == 42
    assert len(n.sent) == 1  # success path notifies nothing


def test_observe_quality_single_pass_metrics(spark, sf_dir):
    """Observation metrics arrive with the action itself — no extra
    scan — and match independently-computed values."""
    import pyspark.sql.functions as F

    from unity_to_bigquery_spark.catalog import load_table
    from unity_to_bigquery_spark.plans.ops_support import observe_quality

    events = load_table(spark, sf_dir, "events")
    df, obs = observe_quality(
        events,
        rows=F.count(F.lit(1)),
        null_props=F.sum(F.col("props").isNull().cast("long")),
        max_value_cents=F.max(F.floor(F.col("value") * 100 + 0.5).cast("long")),
    )
    n = df.count()  # the only job
    got = obs.get
    assert got["rows"] == n
    assert got["null_props"] == events.filter(F.col("props").isNull()).count()
    assert got["max_value_cents"] == events.select(
        F.max(F.floor(F.col("value") * 100 + 0.5).cast("long"))
    ).first()[0]


def test_streaming_error_listener_notifies_on_failure(spark, tmp_path):
    """A15, streaming flavor: a query that dies mid-batch lands in the
    ErrorNotifier via the listener; a clean query notifies nothing."""
    import time

    import pyspark.sql.functions as F

    from unity_to_bigquery_spark.plans.ops_support import (
        ErrorNotifier,
        streaming_error_listener,
    )

    notifier = ErrorNotifier(channel="#ops")
    listener = streaming_error_listener(spark, notifier)
    try:
        src = str(tmp_path / "src")
        spark.range(10).selectExpr("id AS event_id").write.parquet(src)
        stream = spark.readStream.schema("event_id BIGINT").parquet(src)

        def explode_batch(batch_df, batch_id):
            raise RuntimeError("poisoned batch")

        q = (
            stream.writeStream.foreachBatch(explode_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt1"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        except Exception:
            pass
        # listener events are delivered asynchronously
        for _ in range(40):
            if notifier.sent:
                break
            time.sleep(0.25)
        assert notifier.sent and "poisoned batch" in notifier.sent[0][1]
        n_after_failure = len(notifier.sent)

        ok = (
            stream.writeStream.format("memory")
            .queryName("listener_ok_sink")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        ok.awaitTermination()
        time.sleep(1.0)
        assert len(notifier.sent) == n_after_failure  # clean run: no noise
    finally:
        spark.streams.removeListener(listener)


def test_plan_backfill_windows_covers_range_exactly():
    from datetime import date

    from unity_to_bigquery_spark.plans.ops_support import plan_backfill_windows

    w = plan_backfill_windows(date(2025, 1, 1), date(2025, 3, 15), max_days=30)
    # contiguous, non-overlapping, exact cover, all within the cap
    assert w[0][0] == date(2025, 1, 1) and w[-1][1] == date(2025, 3, 15)
    for (s1, e1), (s2, e2) in zip(w, w[1:]):
        assert e1 == s2
    assert all((e - s).days <= 30 and (e - s).days >= 1 for s, e in w)
    assert sum((e - s).days for s, e in w) == (date(2025, 3, 15) - date(2025, 1, 1)).days
    # degenerate cases
    assert plan_backfill_windows(date(2025, 1, 1), date(2025, 1, 1)) == []
    assert plan_backfill_windows(date(2025, 1, 2), date(2025, 1, 1)) == []
    one = plan_backfill_windows(date(2025, 1, 1), date(2025, 1, 2))
    assert one == [(date(2025, 1, 1), date(2025, 1, 2))]
    import pytest

    with pytest.raises(ValueError):
        plan_backfill_windows(date(2025, 1, 1), date(2025, 2, 1), max_days=0)


def test_backfill_windows_checkpointed_resume(spark, tmp_path):
    """End-to-end backfill orchestration: the window planner + the
    checkpoint table give crash-safe resume — each window is recorded
    once, a re-run after a mid-backfill crash processes only the
    remaining windows, and a full re-run processes nothing."""
    from datetime import date

    from unity_to_bigquery_spark.plans.ops_support import plan_backfill_windows
    from unity_to_bigquery_spark.plans.pipeline import CheckpointTable

    windows = plan_backfill_windows(date(2025, 1, 1), date(2025, 4, 1), max_days=30)
    assert len(windows) >= 3
    ckpt = CheckpointTable(spark, str(tmp_path / "ckpt"))
    processed = []

    def run_backfill(crash_after: int | None = None) -> int:
        """Process un-checkpointed windows oldest-first; optionally
        crash after N windows. Returns windows processed this run."""
        done = {r.batch_id for r in ckpt.read().collect()}
        n = 0
        for ws, we in windows:
            wid = f"{ws.isoformat()}_{we.isoformat()}"
            if wid in done:
                continue
            processed.append(wid)  # the export/ingest would run here
            ckpt.append(
                spark.createDataFrame(
                    [(wid, "p1", "backfill")],
                    "batch_id STRING, project_id STRING, report_type STRING",
                )
            )
            n += 1
            if crash_after is not None and n >= crash_after:
                raise RuntimeError("simulated crash")
        return n

    import pytest

    with pytest.raises(RuntimeError):
        run_backfill(crash_after=1)
    assert len(processed) == 1
    # resume: remaining windows only, no re-processing of window 1
    assert run_backfill() == len(windows) - 1
    assert processed == [f"{a.isoformat()}_{b.isoformat()}" for a, b in windows]
    # idempotent: nothing left
    assert run_backfill() == 0
