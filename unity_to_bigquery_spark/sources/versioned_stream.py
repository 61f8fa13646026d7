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
        # Delta's maxFilesPerTrigger analogue at commit granularity:
        # bound how many source VERSIONS one micro-batch may consume, so
        # a long-idle consumer catching up on a large backlog paces its
        # batches instead of materializing the whole backlog at once.
        self.max_versions = int(options.get("max_versions_per_batch", "0"))
        # manifest access without a SparkSession (driver-side JSON IO)
        from unity_to_bigquery_spark.plans.versioned import VersionedTable

        self._t = VersionedTable.__new__(VersionedTable)
        self._t.root = self.root

    # ---- offsets are manifest versions ------------------------------
    def initialOffset(self) -> dict:
        self._consumed = 0
        return {"version": 0}

    def latestOffset(self) -> dict:
        latest = self._t.latest_version()
        if self.max_versions > 0:
            # pace against the last planned/committed offset. The engine
            # asks for latestOffset once BEFORE initialOffset (observed
            # call order, Spark 4.1) and Trigger.AvailableNow captures a
            # single target up front (no admission control in the Python
            # source API yet), so pacing is a STEADY-STATE property:
            # the first micro-batch of a run is unpaced; every
            # subsequent batch consumes at most max_versions commits.
            floor = getattr(self, "_consumed", None)
            if floor is not None:
                latest = min(latest, floor + self.max_versions)
        return {"version": latest}

    def partitions(self, start: dict, end: dict):
        import os

        from unity_to_bigquery_spark.plans.versioned import DATA_DIR

        lo, hi = start["version"], end["version"]
        # the engine's planned start is authoritative — feed the pacing
        # floor (covers checkpoint restarts, where initialOffset is
        # never called)
        self._consumed = max(getattr(self, "_consumed", 0) or 0, lo)
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
        # the streaming checkpoint owns durability; remembering the
        # committed offset here only feeds the pacing computation
        self._consumed = end["version"]


def register(spark) -> None:
    """Idempotently register the source with a session."""
    try:
        spark.dataSource.register(VersionedTableDataSource)
    except Exception:
        pass  # already registered in this session
