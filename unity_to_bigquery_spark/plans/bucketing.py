"""Bucketed (co-located) joins: pre-shuffle both fact tables into the
same bucket layout on the join key so repeated joins pay ZERO shuffle.

At 100 TB this is the difference between re-shuffling 100 TB per join
and a metadata-only co-located merge: bucket files pair up 1:1 and each
task joins one bucket pair. ``sortBy`` within buckets additionally
yields sort-merge joins with no sort step.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table.
    Drops any previous table AND its warehouse directory first — an
    orphaned location (metastore wiped, files left) otherwise fails the
    write with LOCATION_ALREADY_EXISTS.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(
        f"{warehouse.removeprefix('file:')}/{table_name.lower()}", ignore_errors=True
    )
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort:
        writer = writer.sortBy(bucket_key)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_l: str, key_r: str
) -> DataFrame:
    """Join two identically-bucketed tables — Catalyst sees compatible
    output partitionings and elides both Exchanges (verified in
    tests/test_bucketing.py by plan inspection).
    """
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[key_l] == rt[key_r])
