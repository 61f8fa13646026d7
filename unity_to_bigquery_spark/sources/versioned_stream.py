"""VersionedTable as a Structured Streaming SOURCE (Spark 4 Python
Data Source API) — the Delta/Iceberg streaming-read analogue: offsets
are manifest VERSIONS, each micro-batch delivers exactly the rows of
the files committed in (start, end], and the streaming checkpoint
replaces hand-rolled consumer bookkeeping (the engine-managed form of
the reference's ``continueFrom`` protocol, Unity_to_BigQuery.py:63-66).

Scale/design notes:
- ``partitions(start, end)`` is manifest arithmetic only (file-list
  set difference on the driver — same as ``VersionedTable.changes``);
  one InputPartition per added data file, so file reads parallelize
  across executors.
- ``read()`` executes executor-side via pyarrow. Rows cross the
  Python→JVM boundary (the Data Source API's contract) — fine for
  incremental tails, which are delta-sized by definition; a bulk
  backfill should use the batch ``changes()``/``read()`` path, which
  scans parquet natively in the JVM.
- Append-only contract, like Delta's streaming source without
  ``skipChangeCommits``: a delete_where commit inside a consumed range
  raises rather than silently replaying rows the batch API would have
  filtered — at-least-once delivery of retracted rows is corruption,
  not a degraded mode.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class VersionedTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def schema(self) -> str:
        from unity_to_bigquery_spark.plans.versioned import VersionedTable

        # runs in the planner's Python worker: NO SparkSession exists, so
        # no StructType.fromDDL — return the manifest's DDL string and
        # let the JVM parse it
        root = self.options["path"]
        t = VersionedTable.__new__(VersionedTable)
        t.root = root
        m = t.manifest()
        if not m.get("schema"):
            raise ValueError(
                f"versioned_table at {root} is empty/schemaless — commit data "
                "before streaming from it"
            )
        return m["schema"]

    def streamReader(self, schema):
        return VersionedTableStreamReader(self.options)


def _ddl_field_names(ddl: str) -> list[str]:
    """Top-level field names of a ``struct<a:bigint,b:array<int>>``
    simpleString — parsed without a SparkSession (depth-0 comma split)."""
    inner = ddl.strip()
    if inner.startswith("struct<") and inner.endswith(">"):
        inner = inner[len("struct<"):-1]
    names, depth, tok = [], 0, []
    for ch in inner:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            names.append("".join(tok))
            tok = []
            continue
        tok.append(ch)
    if tok:
        names.append("".join(tok))
    return [t.split(":", 1)[0].strip() for t in names if t.strip()]


class _FilePartition(InputPartition):
    def __init__(self, path: str, fields: list[str]):
        self.path = path
        self.fields = fields


class VersionedTableStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.root = options["path"]
        # Delta's skipChangeCommits analogue: deliver added files and
        # IGNORE delete commits in range (consumer accepts that rows
        # retracted after delivery are not re-retracted) instead of
        # failing the stream.
        self.skip_deletes = (
            str(options.get("skip_delete_commits", "false")).lower() == "true"
        )
        # manifest access without a SparkSession (driver-side JSON IO)
        from unity_to_bigquery_spark.plans.versioned import VersionedTable

        self._t = VersionedTable.__new__(VersionedTable)
        self._t.root = self.root

    # ---- offsets are manifest versions ------------------------------
    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        return {"version": self._t.latest_version()}

    def partitions(self, start: dict, end: dict):
        import os

        from unity_to_bigquery_spark.plans.versioned import DATA_DIR

        lo, hi = start["version"], end["version"]
        m_end = self._t.manifest(hi)
        if not self.skip_deletes:
            for h in self._t.history():
                if lo < h["version"] <= hi and h["op"] == "delete_where":
                    raise ValueError(
                        f"version {h['version']} is a delete_where commit: the "
                        "streaming source is append-only (re-bootstrap "
                        "consumers after deletes, consume via the batch "
                        "changes() API, or opt in to "
                        "skip_delete_commits=true)"
                    )
        base = set(self._t.manifest(lo)["files"]) if lo else set()
        fields = _ddl_field_names(m_end["schema"])
        return [
            _FilePartition(os.path.join(self.root, DATA_DIR, f), fields)
            for f in m_end["files"]
            if f not in base
        ]

    def read(self, partition: _FilePartition):
        # executor-side parquet read; column order pinned to the schema
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        for row in table.to_pylist():
            yield tuple(row[f] for f in partition.fields)

    def commit(self, end: dict) -> None:
        pass  # the streaming checkpoint is the consumer's bookkeeping


def register(spark) -> None:
    """Idempotently register the source with a session."""
    try:
        spark.dataSource.register(VersionedTableDataSource)
    except Exception:
        pass  # already registered in this session
