"""Pipeline-semantics tests (SURVEY.md §5 item 3): incremental
checkpoint/continuation over a synthetic landing zone, including the
exactly-once ordering fix for the reference's at-most-once sink bug
(SURVEY.md §3.3).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from unity_to_bigquery_spark.catalog import load_table
from unity_to_bigquery_spark.plans.pipeline import CheckpointTable, run_incremental_job
from unity_to_bigquery_spark.sources.landing import read_landing_events

PROJECTS = ["proj_a", "proj_b"]
REPORTS = ["appStart", "transaction"]


def _write_batch(spark, sf_dir, root: str, project: str, report: str, batch: str, lo: int, hi: int):
    """Lay out one landing batch: <root>/<project>/<report>/<batch>/*.json.gz
    (directory scheme from Unity_to_BigQuery.py:106)."""
    events = (
        load_table(spark, sf_dir, "events")
        .filter((F.col("event_id") % 100 >= lo) & (F.col("event_id") % 100 < hi))
        .withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    )
    path = os.path.join(root, project, report, batch)
    events.coalesce(1).write.mode("overwrite").option("compression", "gzip").json(path)


@pytest.fixture()
def landing(tmp_path, spark, sf_dir):
    root = str(tmp_path / "landing")
    for p in PROJECTS:
        for r in REPORTS:
            _write_batch(spark, sf_dir, root, p, r, "2024-01-01_job1", 0, 50)
    return root


def test_landing_scan_recovers_partitions(spark, sf_dir, landing):
    df = read_landing_events(spark, landing)
    combos = {
        (r.project_id, r.report_type)
        for r in df.select("project_id", "report_type").distinct().collect()
    }
    assert combos == {(p, r) for p in PROJECTS for r in REPORTS}
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.count() > 0


def test_incremental_job_processes_only_new_batches(spark, sf_dir, landing, tmp_path):
    sink = str(tmp_path / "sink")
    ckpt = CheckpointTable(spark, str(tmp_path / "ckpt"))

    n1 = run_incremental_job(spark, landing, sink, ckpt)
    assert n1 == 4  # 2 projects × 2 reports
    count1 = spark.read.parquet(sink).count()

    # Re-run with no new files → zero batches, sink unchanged (A12 semantics)
    assert run_incremental_job(spark, landing, sink, ckpt) == 0
    assert spark.read.parquet(sink).count() == count1

    # Drop one new batch → only it is processed (continueFrom analogue)
    _write_batch(spark, sf_dir, landing, "proj_a", "appStart", "2024-01-02_job2", 50, 60)
    assert run_incremental_job(spark, landing, sink, ckpt) == 1
    sunk = spark.read.parquet(sink)
    assert sunk.count() > count1
    assert sunk.filter(F.col("batch_id") == "2024-01-02_job2").count() > 0


def test_checkpoint_latest_lookup(spark, sf_dir, landing, tmp_path):
    ckpt = CheckpointTable(spark, str(tmp_path / "ckpt"))
    assert ckpt.latest("proj_a", "appStart") is None  # A18: empty bootstrap
    run_incremental_job(spark, landing, str(tmp_path / "sink"), ckpt)
    assert ckpt.latest("proj_a", "appStart") == "2024-01-01_job1"
    assert ckpt.latest("nope", "appStart") is None


def test_no_checkpoint_on_sink_failure(spark, sf_dir, landing, tmp_path, monkeypatch):
    """The §3.3 fix: if the sink write throws, nothing is checkpointed,
    so the batch is retried next run (the reference would have recorded
    it as done and lost the data)."""
    ckpt = CheckpointTable(spark, str(tmp_path / "ckpt"))

    from pyspark.sql.readwriter import DataFrameWriter

    real_parquet = DataFrameWriter.parquet

    def exploding_parquet(self, path, **kw):
        if "sink_fail" in path:
            raise RuntimeError("simulated sink outage")
        return real_parquet(self, path, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", exploding_parquet)
    with pytest.raises(RuntimeError, match="simulated sink outage"):
        run_incremental_job(spark, landing, str(tmp_path / "sink_fail"), ckpt)
    assert ckpt.read().count() == 0  # nothing marked done

    monkeypatch.setattr(DataFrameWriter, "parquet", real_parquet)
    # Retry after outage processes everything
    assert run_incremental_job(spark, landing, str(tmp_path / "sink_ok"), ckpt) == 4


def test_routing_dim_applied(spark, sf_dir, landing, tmp_path):
    dim = spark.createDataFrame(
        [("proj_a", "Hammer_Jump")], ["project_id", "dataset"]
    )
    sink = str(tmp_path / "sink")
    ckpt = CheckpointTable(spark, str(tmp_path / "ckpt"))
    run_incremental_job(spark, landing, sink, ckpt, routing_dim=dim)
    out = spark.read.parquet(sink)
    ds = {
        (r.project_id, r.dataset)
        for r in out.select("project_id", "dataset").distinct().collect()
    }
    assert ds == {("proj_a", "Hammer_Jump"), ("proj_b", "misc")}


def test_unity_export_source_partitions_and_determinism(spark):
    """Python Data Source (A1/A2/A5 as an engine source): one partition
    per exported file, deterministic rows, reference report-type domain."""
    from unity_to_bigquery_spark.sources.unity_export import REPORT_TYPES, register

    register(spark)

    def read(jobs):
        return (
            spark.read.format("unity_export")
            .option("project_id", "projX")
            .option("num_jobs", str(jobs))
            .option("rows_per_job", "50")
            .load()
        )

    df = read(6)
    assert df.rdd.getNumPartitions() == 6  # parallel "downloads"
    rows1 = sorted(tuple(r) for r in df.collect())
    rows2 = sorted(tuple(r) for r in read(6).collect())
    assert rows1 == rows2 and len(rows1) == 300
    assert {r[4] for r in rows1} <= set(REPORT_TYPES)
    # event ids are dense per (job, row) — the checkpointable key space
    assert {r[2] for r in rows1} == set(range(300))


def test_ndjson_malformed_record_policies(spark, tmp_path):
    """Malformed landing lines: PERMISSIVE quarantines them in
    _corrupt_record, DROPMALFORMED skips them, FAILFAST raises."""
    import pytest

    from unity_to_bigquery_spark.sources.landing import read_ndjson_with_quarantine

    p = tmp_path / "landing.json"
    good = ['{"event_id": 1, "value": 2.5}', '{"event_id": 2, "value": 0.5}']
    bad = ['{"event_id": 3, "value": ', "not json at all"]
    p.write_text("\n".join([good[0], bad[0], good[1], bad[1]]) + "\n")
    ddl = "event_id BIGINT, value DOUBLE"

    perm = read_ndjson_with_quarantine(spark, str(p), ddl).collect()
    assert len(perm) == 4
    quarantined = [r for r in perm if r._corrupt_record is not None]
    assert len(quarantined) == 2
    assert {r._corrupt_record for r in quarantined} == set(bad)
    assert {r.event_id for r in perm if r._corrupt_record is None} == {1, 2}

    dropped = read_ndjson_with_quarantine(spark, str(p), ddl, mode="DROPMALFORMED")
    assert {r.event_id for r in dropped.collect()} == {1, 2}

    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_ndjson_with_quarantine(spark, str(p), ddl, mode="FAILFAST").collect()


def test_unity_export_streaming_source(spark, tmp_path):
    """The export source as a STREAMING source: one micro-batch per
    export job via SimpleDataSourceStreamReader; the offset is the
    reference's continueFrom checkpoint, so a second drain with the
    same checkpoint delivers nothing new."""
    from unity_to_bigquery_spark.sources.unity_export import register

    register(spark)
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def drain():
        stream = (
            spark.readStream.format("unity_export")
            .option("project_id", "projS")
            .option("max_jobs", "3")
            .option("rows_per_job", "40")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir)

    out1 = drain()
    assert out1.count() == 120
    assert out1.select("job_id").distinct().count() == 3
    # batch flavor of the same source must agree row-for-row
    batch = (
        spark.read.format("unity_export")
        .option("project_id", "projS")
        .option("num_jobs", "3")
        .option("rows_per_job", "40")
        .load()
    )
    assert {tuple(r) for r in out1.collect()} == {tuple(r) for r in batch.collect()}
    # resume from checkpoint: backlog already drained -> no new rows
    out2 = drain()
    assert out2.count() == 120


def test_ignore_corrupt_files_skips_garbage(spark, sf_dir, tmp_path):
    """A landing dir with a truncated/garbage file: default read fails,
    ignoreCorruptFiles reads every healthy row — triage the bad file
    offline instead of stalling the 100 TB job."""
    import pytest

    from unity_to_bigquery_spark.catalog import load_table

    out = str(tmp_path / "landing")
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    n = events.count()
    events.write.parquet(out)
    with open(f"{out}/part-99999-garbage.parquet", "wb") as f:
        f.write(b"PAR1 this is not really parquet \x00\x01\x02")

    with pytest.raises(Exception):
        spark.read.parquet(out).count()

    healthy = (
        spark.read.option("ignoreCorruptFiles", "true").parquet(out).count()
    )
    assert healthy == n


def test_bigquery_sink_degrades_to_staging_parquet(spark, sf_dir, tmp_path):
    """A10 sink: without the spark-bigquery-connector on the classpath
    the sink stages Hive-layout parquet (what `bq load` consumes);
    rows survive byte-identically and appends accumulate."""
    from unity_to_bigquery_spark.catalog import load_table
    from unity_to_bigquery_spark.sinks.bigquery import connector_available, write_events

    assert not connector_available(spark)  # sandbox: no connector jar
    events = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    sink = write_events(events, "analytics", "appStart", str(tmp_path / "bq"))
    assert sink.startswith("staging-parquet:")
    path = sink.split(":", 1)[1]
    assert spark.read.parquet(path).count() == events.count()
    write_events(events, "analytics", "appStart", str(tmp_path / "bq"))
    assert spark.read.parquet(path).count() == 2 * events.count()


def test_bigquery_connector_branch_writer_calls(spark, sf_dir, monkeypatch):
    """A10 connector branch: with the connector 'present' (stubbed —
    the jar needs network + GCP creds this sandbox lacks), write_events
    must drive the DataFrameWriter with format=bigquery, the pinned
    connector options, and the caller's mode, then save(). A fake
    writer records the chain; connector_write_options is additionally
    pinned as data so a drive-by edit can't silently change the sink
    contract."""
    import unity_to_bigquery_spark.sinks.bigquery as bq
    from unity_to_bigquery_spark.catalog import load_table

    assert bq.connector_write_options("analytics", "appStart") == {
        "table": "analytics.appStart",
        "writeMethod": "direct",
    }

    calls: dict = {}

    class FakeWriter:
        def format(self, fmt):
            calls["format"] = fmt
            return self

        def options(self, **kw):
            calls.setdefault("options", {}).update(kw)
            return self

        def mode(self, m):
            calls["mode"] = m
            return self

        def save(self):
            calls["saved"] = True

        def parquet(self, path):
            calls["parquet"] = path

    monkeypatch.setattr(bq, "connector_available", lambda s: True)
    events = load_table(spark, sf_dir, "events").select("event_id")
    # patch the CONCRETE DataFrame class (pyspark 4 classic vs base)
    monkeypatch.setattr(
        type(events), "write", property(lambda self: FakeWriter())
    )
    sink = bq.write_events(events, "analytics", "appStart", "/unused", mode="overwrite")
    assert sink == "bigquery:analytics.appStart"
    assert calls == {
        "format": "bigquery",
        "options": {"table": "analytics.appStart", "writeMethod": "direct"},
        "mode": "overwrite",
        "saved": True,
    }


def test_ndjson_gz_python_datasource_writer_roundtrip(spark, sf_dir, tmp_path):
    """Write-side Python Data Source: df.write.format('ndjson_gz')
    stages per-partition gz shards under temp names and publishes them
    atomically on commit (two-phase committer contract); the engine's
    own landing scan reads the result back byte-equal."""
    import os

    from unity_to_bigquery_spark.catalog import load_table
    from unity_to_bigquery_spark.sinks.ndjson_gz import register
    from unity_to_bigquery_spark.sources.landing import read_ndjson

    register(spark)
    out = str(tmp_path / "landing_out")
    df = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .repartition(3)
    )
    df.write.format("ndjson_gz").mode("append").option("path", out).save()

    files = sorted(os.listdir(out))
    assert "_SUCCESS" in files
    shards = [f for f in files if f.endswith(".json.gz")]
    assert len(shards) == 3 and not any(f.startswith("_tmp-") for f in shards)

    back = read_ndjson(spark, out, schema="doc_id BIGINT, source STRING, text STRING")
    got = sorted((r.doc_id, r.source, r.text) for r in back.collect())
    want = sorted((r.doc_id, r.source, r.text) for r in df.collect())
    assert got == want

    # overwrite mode replaces previous shards instead of accumulating
    df.limit(5).repartition(1).write.format("ndjson_gz").mode("overwrite").option(
        "path", out
    ).save()
    again = read_ndjson(spark, out, schema="doc_id BIGINT, source STRING, text STRING")
    assert again.count() == 5
