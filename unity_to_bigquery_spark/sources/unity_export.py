"""Unity Raw Data Export source as a Spark Python Data Source
(pyspark.sql.datasource, Spark 4 API).

The reference drives this ingestion on the driver: request an export
job (Unity_to_BigQuery.py:56-75, A1), poll until complete (:78-86 +
:166-171, A2), then iterate the returned fileList and download each
file (:129-133, A5). Here the same surface is an engine-native SOURCE:
one InputPartition per exported file, so the "downloads" happen in
parallel on executors instead of the reference's sequential driver
loop, and the rows land directly in a DataFrame with a declared
schema.

The sandbox has no network, so the "export service" is simulated
deterministically: every row is derived from md5(project#job#row) —
the same bytes Python's hashlib and any SQL engine's md5() produce —
which makes even this custom source DuckDB-oracle-verifiable
end-to-end (see queries/pipeline.p_unity_export_source). Swapping the
generator for real HTTP GETs per file keeps the partitioning, schema,
and parallelism contract identical.

The real request/poll/download client for this protocol lives in
sources/unity_http.py (UnityExportClient, injectable transport,
unit-tested against a fake): it LANDS gunzipped NDJSON files which the
declarative landing scan (sources/landing.py) then reads — the
driver-side control plane and this executor-side data plane meet at
the filesystem, exactly the reference's split.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# The reference's five report types (Unity_to_BigQuery.py:191).
REPORT_TYPES = ["appStart", "appRunning", "deviceInfo", "custom", "transaction"]

SCHEMA = (
    "project_id STRING, job_id INT, event_id BIGINT, user_id BIGINT, "
    "report_type STRING, value_cents BIGINT"
)


def _h(seed: str) -> int:
    """First 8 hex chars of md5 as an int — portable to SQL engines as
    ('0x' || substring(md5(seed), 1, 8))::BIGINT."""
    return int(hashlib.md5(seed.encode()).hexdigest()[:8], 16)


def export_row(project: str, job: int, i: int, rows_per_job: int):
    h = _h(f"{project}#{job}#{i}")
    return (
        project,
        job,
        job * rows_per_job + i,
        h % 1000,
        REPORT_TYPES[h % 5],
        h % 10000,
    )


class UnityExportReader(DataSourceReader):
    def __init__(self, options):
        self.project = options.get("project_id", "proj0")
        self.num_jobs = int(options.get("num_jobs", "4"))
        self.rows_per_job = int(options.get("rows_per_job", "100"))

    def partitions(self):
        # one partition per exported file (the reference's fileList
        # loop, :129-133) — downloads parallelize across executors
        return [InputPartition(j) for j in range(self.num_jobs)]

    def read(self, partition):
        j = partition.value
        for i in range(self.rows_per_job):
            yield export_row(self.project, j, i, self.rows_per_job)


class UnityExportDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "unity_export"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return UnityExportReader(self.options)

    def simpleStreamReader(self, schema):
        return UnityExportStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source with a session."""
    try:
        spark.dataSource.register(UnityExportDataSource)
    except Exception:
        pass  # already registered in this session


class UnityExportStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor: each ``read()`` delivers every export job
    completed since the last offset (the reference's poll loop,
    Unity_to_BigQuery.py:166-171, inverted — the engine asks for the
    completed backlog instead of the driver sleeping on it). The
    offset dict carries the next-undelivered job id: exactly the
    reference's ``continueFrom`` checkpoint (A12), but managed by the
    streaming checkpoint instead of a Postgres row.

    ``max_jobs`` bounds the simulated backlog so AvailableNow drains
    terminate; a live source would return an empty batch at the head
    until the export service finishes another job.
    """

    def __init__(self, options):
        self.project = options.get("project_id", "proj0")
        self.rows_per_job = int(options.get("rows_per_job", "100"))
        self.max_jobs = int(options.get("max_jobs", "4"))

    def initialOffset(self) -> dict:
        return {"next_job": 0}

    def read(self, start: dict):
        j = start["next_job"]
        if j >= self.max_jobs:
            return iter([]), start
        # a LIST, not a generator: the runner's prefetch cache
        # copy.copy()s the iterator between planning and execution
        rows = [
            export_row(self.project, job, i, self.rows_per_job)
            for job in range(j, self.max_jobs)
            for i in range(self.rows_per_job)
        ]
        return iter(rows), {"next_job": self.max_jobs}

    def readBetweenOffsets(self, start: dict, end: dict):
        for j in range(start["next_job"], end["next_job"]):
            for i in range(self.rows_per_job):
                yield export_row(self.project, j, i, self.rows_per_job)

    def commit(self, end: dict) -> None:
        pass  # checkpoint-managed; nothing external to acknowledge
