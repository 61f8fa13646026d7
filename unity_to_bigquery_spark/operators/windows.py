"""Window-function composites: top-k per group, gap-based sessionization.

Sessionization is the classic lag+cumulative-flag build: a session
starts where the gap to the previous event (per user) exceeds the
threshold; session ids are running sums of start flags. One shuffle by
user_id; both window passes reuse that partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group. ``order_cols`` must define a total order
    within each group (callers append a unique tiebreak column) so the
    selected set is deterministic.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per ``key``: a new session starts
    when the time since the previous event exceeds ``gap_seconds``.
    Session ids are 1-based per key, deterministic given unique ``ts``
    per key (fixture events are ns-unique).
    """
    w = Window.partitionBy(key).orderBy(ts)
    gap = F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(ts).over(w))
    is_new = F.when(
        gap.isNull() | (gap > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("__new", is_new).withColumn(
        session_col,
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new")
