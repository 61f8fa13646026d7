"""Table-maintenance operations on partitioned parquet sinks: keyed
upsert (MERGE semantics), small-file compaction, and schema-evolving
reads — the operational triad that keeps a 100 TB table healthy.

Without a transactional format, correctness comes from partition-scoped
rewrites: dynamic partition overwrite touches ONLY the partitions
present in the incoming batch, so an upsert over 3 dates rewrites 3
directories of a 10-year table, not the table. (With Delta/Iceberg
these become MERGE INTO / OPTIMIZE; the call sites are the same.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _with_dynamic_overwrite(spark: SparkSession):
    class _Ctx:
        def __enter__(self):
            self.prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

        def __exit__(self, *exc):
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", self.prev)

    return _Ctx()


def upsert_partitioned(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> None:
    """MERGE semantics onto a partitioned parquet table: rows in
    ``updates`` replace same-key rows; new keys append. Only the
    partitions present in ``updates`` are rewritten (dynamic overwrite).

    The read of affected partitions is pruned by an IN-filter on the
    partition values (bounded: distinct partitions of one batch).
    """
    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if not parts:
        return  # empty batch: nothing to merge, nothing to rewrite
    current = spark.read.parquet(table_path).filter(F.col(partition_col).isin(parts))
    survivors = current.join(
        F.broadcast(updates.select(*key_cols).distinct()), on=key_cols, how="left_anti"
    )
    # MATERIALIZE before overwriting: the merged plan reads the very
    # files the write is about to replace (read-overwrite
    # self-dependency → FileNotFound mid-scan otherwise). With a
    # transactional format the snapshot isolation does this for free.
    merged = survivors.unionByName(updates).localCheckpoint(eager=True)
    with _with_dynamic_overwrite(spark):
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(table_path)
    # Evict cached file listings: later reads in this session would
    # otherwise reference the replaced files.
    spark.catalog.refreshByPath(table_path)


def compact_partitions(
    spark: SparkSession,
    table_path: str,
    partition_col: str,
    target_files_per_partition: int = 1,
    partitions: list | None = None,
) -> None:
    """Small-file compaction: rewrite (selected or all) partitions with
    ``coalesce`` so each holds ``target_files_per_partition`` files.
    Data is byte-identical; only layout changes. The 100 TB version
    selects partitions whose file-count/size ratio crosses a threshold
    and runs rolling compaction — the selection hook is ``partitions``.
    """
    df = spark.read.parquet(table_path)
    if partitions is not None:
        df = df.filter(F.col(partition_col).isin(partitions))
    # same read-overwrite self-dependency as upsert: materialize first
    df = df.repartition(target_files_per_partition, partition_col).localCheckpoint(
        eager=True
    )
    with _with_dynamic_overwrite(spark):
        df.write.mode("overwrite").partitionBy(partition_col).parquet(table_path)
    spark.catalog.refreshByPath(table_path)


def read_with_schema_evolution(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolving scan: mergeSchema unions the columns of every
    file footer (late batches may carry new columns; old rows read as
    null). At 100 TB pin the expected superset schema instead — footer
    merging lists every file."""
    return spark.read.option("mergeSchema", True).parquet(path)
