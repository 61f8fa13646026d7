"""Gzipped-NDJSON landing-zone SINK as a Spark Python Data Source
writer — the write-side completion of the Data Source API surface
(sources/unity_export.py covers batch+streaming READS).

The reference PRODUCES exactly this format: gunzipped NDJSON files in
a landing directory (Unity_to_BigQuery.py:136-141 writes NDJSON;
upstream Unity ships it gzipped). This sink emits what the engine's
own landing scan (sources/landing.read_ndjson) consumes, closing the
loop: any DataFrame can be staged as a reference-shaped landing batch.

Protocol (the part worth demonstrating): each task writes its shard to
a TEMP name and returns the path in its WriterCommitMessage; only the
driver-side commit() renames shards into place and stamps _SUCCESS —
task retries/speculation leave only orphan temp files, never partial
visible data. abort() removes the temp files. This is the standard
two-phase Hadoop-committer contract, here over the Python API.

Scale: one gzip stream per partition, executor-side, no driver
funnel; shard count = partition count, so the writer inherits
whatever repartitioning the caller chose.
"""

from __future__ import annotations

import gzip
import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class _ShardCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


class NdjsonGzWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        # executor-side: stream rows into one gz shard per partition
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex[:12]}.json.gz")
        n = 0
        with gzip.open(tmp, "wt", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _ShardCommit(tmp, n)

    def commit(self, messages):
        # driver-side finalize: visible names + _SUCCESS, atomic-ish
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".json.gz") and not f.startswith("_tmp-"):
                    os.remove(os.path.join(self.path, f))
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}.json.gz")
            os.replace(m.tmp_path, final)
            total += m.rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(json.dumps({"rows": total, "shards": len(messages)}))

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except OSError:
                pass


class NdjsonGzStreamWriter(DataSourceStreamWriter):
    """Streaming flavor: shard names are DETERMINISTIC per
    (batch_id, partition index), so a replayed micro-batch (crash
    between sink commit and checkpoint advance) overwrites its own
    previous attempt instead of duplicating — idempotent-by-batch-id,
    the same exactly-once contract as
    streaming.stream.run_foreach_batch_idempotent, here spoken through
    the engine's native streaming-sink protocol."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex[:12]}.json.gz")
        n = 0
        with gzip.open(tmp, "wt", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _ShardCommit(tmp, n)

    def commit(self, messages, batchId: int):
        for i, m in enumerate(messages):
            final = os.path.join(
                self.path, f"batch-{batchId:05d}-part-{i:05d}.json.gz"
            )
            os.replace(m.tmp_path, final)

    def abort(self, messages, batchId: int):
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except OSError:
                pass


class NdjsonGzDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ndjson_gz"

    def writer(self, schema, overwrite: bool):
        return NdjsonGzWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return NdjsonGzStreamWriter(self.options)


def register(spark) -> None:
    """Idempotently register the sink with a session."""
    try:
        spark.dataSource.register(NdjsonGzDataSource)
    except Exception:
        pass  # already registered in this session
