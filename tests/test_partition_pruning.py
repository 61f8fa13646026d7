"""Partition pruning over the reference's directory layout (A8): a
dt-partitioned events sink must serve date-filtered reads from only the
matching partitions — plan-verified, not inferred.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from unity_to_bigquery_spark.catalog import load_table


@pytest.fixture(scope="module")
def partitioned_events(tmp_path_factory, spark, sf_dir):
    path = str(tmp_path_factory.mktemp("events_by_dt"))
    events = load_table(spark, sf_dir, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    events.write.mode("overwrite").partitionBy("dt").parquet(path)
    return path


def test_partition_filter_reaches_scan(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(F.col("dt") == "2024-01-05")
    _, fmt = df._jdf.queryExecution(), None
    fmt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in fmt
    assert "2024-01-05" in fmt.split("PartitionFilters", 1)[1].split("\n", 1)[0]


def test_pruned_read_is_correct(spark, sf_dir, partitioned_events):
    pruned = (
        spark.read.parquet(partitioned_events)
        .filter(F.col("dt") == "2024-01-05")
        .count()
    )
    full = (
        load_table(spark, sf_dir, "events")
        .filter(F.date_format("ts", "yyyy-MM-dd") == "2024-01-05")
        .count()
    )
    assert pruned == full > 0
