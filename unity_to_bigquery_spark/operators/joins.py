"""Join composites Spark lacks as single operators.

As-of join generalizes the reference's checkpoint lookup
(``Unity_to_BigQuery.py:88-100``: latest completed job per (job_type,
app_id) — a SELECT … ORDER BY ts DESC + fetchone), turned into a
set-based operator: for EVERY left row, the latest right row at or
before the left timestamp.

Scale notes (100 TB): the implementation is join-then-rank. The equi-key
join shuffles both sides by key once; the ``row_number`` reuses the same
hash partitioning (no second shuffle — Catalyst sees compatible
distributions). Skewed keys are handled by AQE skew-join splitting. For
bounded time-skew, pre-bucketing both sides by (key, time_bucket) turns
this into a co-located join; that variant is unnecessary at test scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the single latest right row with
    ``right.right_ts <= left.left_ts``, matching on equi-keys ``on``.

    Right columns keep their names; callers should pre-select/alias to
    avoid collisions. ``how='left'`` keeps unmatched left rows.
    """
    left = left.withColumn("__asof_lid", F.monotonically_increasing_id())
    joined = left.join(
        right,
        on=[left[k] == right[k] for k in on] + [right[right_ts] <= left[left_ts]],
        how="left" if how == "left" else "inner",
    )
    for k in on:
        joined = joined.drop(right[k])
    w = Window.partitionBy("__asof_lid").orderBy(F.desc(right_ts))
    return (
        joined.withColumn("__asof_rn", F.row_number().over(w))
        .filter(F.col("__asof_rn") == 1)
        .drop("__asof_rn", "__asof_lid")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    right_ts: str,
    left_start: str,
    left_end: str,
) -> DataFrame:
    """Match right rows whose ``right_ts`` falls in the left row's
    [left_start, left_end] interval (equi-keys ``on`` first, so the
    range predicate evaluates post-shuffle on co-located partitions).
    """
    cond = [left[k] == right[k] for k in on] + [
        right[right_ts] >= left[left_start],
        right[right_ts] <= left[left_end],
    ]
    out = left.join(right, on=cond, how="inner")
    for k in on:
        out = out.drop(right[k])
    return out
