"""Join composites Spark lacks as single operators.

As-of join generalizes the reference's checkpoint lookup
(``Unity_to_BigQuery.py:88-100``: latest completed job per (job_type,
app_id) — a SELECT … ORDER BY ts DESC + fetchone), turned into a
set-based operator: for EVERY left row, the latest right row at or
before the left timestamp.

Scale design: the naive formulation (equi-join on key + range predicate
+ row_number) materializes |left_rows_per_key| × |right_rows_per_key|
intermediate rows — quadratic in key hotness, lethal at 100 TB. The
implementation here is the union/carry-forward algorithm instead:
union both sides tagged, sort within key by (ts, side), and carry the
last-seen right payload forward with ``last(..., ignorenulls=True)``.
Cost: ONE shuffle + sort of |left|+|right| rows, zero blowup,
AQE-skew-splittable. This is the same plan shape DuckDB/Pandas asof
merge use, expressed as a Catalyst window.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_SIDE = "__asof_side"
_TS = "__asof_ts"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach ``payload`` columns from the single
    latest right row with ``right.right_ts <= left.left_ts``, matching
    on equi-keys ``on``.

    ``payload`` names must not collide with left column names. On ties
    in ``right_ts`` within a key, the row with the greatest payload
    struct (field order = [right_ts, *payload]) wins — deterministic
    given any unique payload column. ``how='left'`` keeps unmatched
    left rows with null payload; ``'inner'`` drops them.
    """
    lhs = left.withColumn(_SIDE, F.lit(1)).withColumn(_TS, F.col(left_ts))
    rhs = (
        right.select(
            *on,
            F.lit(0).alias(_SIDE),
            F.col(right_ts).alias(_TS),
            F.struct(F.col(right_ts).alias("__rts"), *[F.col(c) for c in payload]).alias(
                _PAYLOAD
            ),
        )
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_PAYLOAD).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
    out = carried.filter(F.col(_SIDE) == 1)
    if how == "inner":
        out = out.filter(F.col(_PAYLOAD).isNotNull())
    for c in payload:
        out = out.withColumn(c, F.col(f"{_PAYLOAD}.{c}"))
    return out.drop(_SIDE, _TS, _PAYLOAD)


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
