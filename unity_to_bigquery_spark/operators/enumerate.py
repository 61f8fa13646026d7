"""Scalable global enumeration: assign contiguous 1-based positions in
a total order WITHOUT the single-partition global window.

``row_number() OVER (ORDER BY key)`` funnels every row through one
task — the classic scale cliff. The scalable shape is:

1. range-repartition + sort within partitions on the total-order key
   (globally sorted data in partition-id order, all parallel);
2. per-partition row counts (tiny: one row per partition);
3. cumulative offsets over partition ids (a window over N_partition
   rows, trivially small);
4. position = partition offset + intra-partition row_number (window
   partitioned by partition id — parallel again).

No collect, no single-partition stage; the only narrow data is the
N-partition offset table, broadcast back onto the sorted rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def global_enumerate(
    df: DataFrame,
    order_cols: list,
    position_col: str = "position",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach 1-based ``position_col`` reflecting the total order of
    ``order_cols`` (must be a unique total order for determinism).
    """
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    s = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    s = s.withColumn("__pid", F.spark_partition_id())
    counts = s.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__offset", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
    ).select("__pid", "__offset")
    w_in = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        s.withColumn("__rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(position_col, (F.col("__offset") + F.col("__rn")))
        .drop("__pid", "__rn", "__offset")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach the INCLUSIVE running sum of ``value_col`` in the total
    order of ``order_cols`` (a unique total order for determinism) —
    the prefix-sum sibling of :func:`global_enumerate`, same
    no-global-window shape: per-partition running sums in parallel,
    a partition-count-sized offset table of partition SUMS, broadcast
    back. The classic scale cliff this avoids is
    ``SUM(x) OVER (ORDER BY key)`` funneling every row through one
    task."""
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    s = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    s = s.withColumn("__pid", F.spark_partition_id())
    sums = s.groupBy("__pid").agg(F.sum(value_col).alias("__psum"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.withColumn(
        "__offset", F.coalesce(F.sum("__psum").over(w_off), F.lit(0))
    ).select("__pid", "__offset")
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        s.withColumn("__run", F.sum(value_col).over(w_in))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__offset") + F.col("__run"))
        .drop("__pid", "__run", "__offset")
    )
