"""The reference's end-to-end job, restated Spark-first: incremental
landing-zone ingestion → routing → partitioned sink → checkpoint.

Reference trace (SURVEY.md §3.2, Unity_to_BigQuery.py:152-186):
  1. checkpoint lookup (A3)    → latest-processed batch per (project, report)
  2. export request/poll (A1/A2) → driver-side, out of the data plane
  3. download+gunzip+load (A4/A5/A10) → one declarative scan + sink
  4. checkpoint insert (A11)   → append AFTER the sink commits

The reference checkpoints even when the BigQuery load failed
(bq_uploader.py:37-38 swallows the exception → at-most-once,
SURVEY.md §3.3). Here the checkpoint append happens strictly after the
sink write returns, and replaying an already-checkpointed batch is a
no-op (idempotent by batch_id) → effectively-once.

Scale notes: the checkpoint table stays tiny (one row per batch) and is
broadcast into the anti-join; the data sink is an append of only the
new batches, partitioned by (project_id, report_type) so downstream
readers get partition pruning (reference A8's directory layout).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from unity_to_bigquery_spark.sources.landing import read_landing_events

CHECKPOINT_SCHEMA = (
    "batch_id STRING, project_id STRING, report_type STRING, ts TIMESTAMP"
)


class CheckpointTable:
    """The ``ua_completed_reports`` analogue (Unity_to_BigQuery.py:36-42)
    as an append-only parquet table of completed batch ids.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        from pyspark.errors.exceptions.captured import AnalysisException

        try:
            return self.spark.read.schema(CHECKPOINT_SCHEMA).parquet(self.path)
        except AnalysisException as exc:
            # ONLY a missing table means "first run" (A18 bootstrap). A
            # corrupted/unreadable checkpoint must fail loudly — treating
            # it as empty would silently reprocess every batch.
            if "PATH_NOT_FOUND" in str(exc):
                return self.spark.createDataFrame([], CHECKPOINT_SCHEMA)
            raise

    def latest(self, project_id: str, report_type: str):
        """Latest completed batch for one (project, report) — the A3
        lookup (filter + sort + top-1), set-based.
        """
        rows = (
            self.read()
            .filter(
                (F.col("project_id") == project_id)
                & (F.col("report_type") == report_type)
            )
            .orderBy(F.desc("ts"), F.desc("batch_id"))
            .limit(1)
            .collect()
        )
        return rows[0].batch_id if rows else None

    def append(self, batches: DataFrame) -> None:
        """A11: record completed batches — called only after sink success."""
        batches.select(
            "batch_id",
            "project_id",
            "report_type",
            F.current_timestamp().alias("ts"),
        ).write.mode("append").parquet(self.path)


def run_incremental_job(
    spark: SparkSession,
    landing_root: str,
    sink_path: str,
    checkpoint: CheckpointTable,
    routing_dim: DataFrame | None = None,
) -> int:
    """One micro-batch of the reference pipeline: ingest every
    not-yet-checkpointed landing batch, route, append to the partitioned
    sink, then checkpoint. Returns the number of NEW batches processed.

    Empty increment → no sink write and no checkpoint append (mirrors
    the reference's is_files guard, Unity_to_BigQuery.py:124-127,182-184);
    an absent/empty landing tree is likewise a clean zero-batch run.
    """
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        events = read_landing_events(spark, landing_root)
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc):
            return 0
        raise
    done = checkpoint.read().select("batch_id").distinct()
    new_events = events.join(F.broadcast(done), on="batch_id", how="left_anti")

    if routing_dim is not None:
        new_events = new_events.join(
            F.broadcast(routing_dim), on="project_id", how="left"
        ).withColumn("dataset", F.coalesce("dataset", F.lit("misc")))

    new_batches = new_events.select("batch_id", "project_id", "report_type").distinct()
    batch_rows = new_batches.collect()  # bounded: one row per landing batch
    if not batch_rows:
        return 0

    # Pin the batch set BEFORE writing: the landing scan is lazy, and a
    # batch arriving between this collect and the write would otherwise
    # be sunk without being checkpointed (then re-sunk next run —
    # duplicates). Filtering on the collected ids makes the write and
    # the checkpoint describe exactly the same batches.
    pinned_ids = [r.batch_id for r in batch_rows]
    pinned_events = new_events.filter(F.col("batch_id").isin(pinned_ids))

    # Sink FIRST (idempotent append partitioned by batch provenance)…
    pinned_events.write.mode("append").partitionBy("project_id", "report_type").parquet(
        sink_path
    )
    # …checkpoint ONLY after the sink commit returned (fixes §3.3).
    checkpoint.append(spark.createDataFrame(batch_rows, new_batches.schema))
    return len(batch_rows)
