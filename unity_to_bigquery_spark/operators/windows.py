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


def ewma_exact(
    df,
    key: str = "user_id",
    order: str = "event_id",
    value: str = "value",
    a_num: int = 4,
    a_den: int = 16,
):
    """Per-entity EXACT fixed-point EWMA — the sequential-state
    time-series operator no window frame can express (each step
    depends on the previous OUTPUT, not a fixed frame of inputs):

        x6[i] = floor(value * 1e6 + 0.5)              (rule-2 quantize)
        e6[0] = x6[0]
        e6[i] = floor(((a_den - a_num)·e6[i-1] + a_num·x6[i]) / a_den)

    Pure integer recurrence, so it is ORACLE-EXACT: a DuckDB recursive
    CTE replays the state machine bit-for-bit (the rule-16 discipline
    on relational data; floor(x / den.0) is the portable floor-division
    — DuckDB's ``//`` truncates toward zero on negatives, Python's
    floors). EXACTNESS BOUND (ADVICE r8): the oracle computes
    FLOOR(((a_den-a_num)·e6 + a_num·x6) / a_den.0) in DOUBLES, so the
    identity holds only while |(a_den-a_num)·e6 + a_num·x6| < 2^53 —
    with the default 12/4/16 weights that is |value| < 2^53/(16·1e6)
    ≈ 5.6e8. Larger-magnitude value columns need a smaller fixed-point
    scale (and the power-of-two divisor argument the Goertzel query
    spells out still applies: a_den=16 divides exactly in binary, so
    UNDER the bound the double FLOOR is bit-identical to integer floor
    division). Distribution: one applyInPandas stage keyed on the
    entity — sequential WITHIN a key (irreducible: it's a recurrence),
    parallel ACROSS keys, which is the honest 100 TB shape for
    per-entity state (same argument as applyInPandasWithState).
    Returns (key, n_events, ewma6)."""
    import pandas as pd

    b = a_den - a_num

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        pdf = pdf.sort_values(order)
        e = None
        for v in pdf[value]:
            x6 = math.floor(v * 1000000.0 + 0.5)
            e = x6 if e is None else (b * e + a_num * x6) // a_den
        return pd.DataFrame(
            {key: [pdf[key].iloc[0]], "n_events": [len(pdf)], "ewma6": [e]}
        )

    return df.select(key, order, value).groupBy(key).applyInPandas(
        fold, f"{key} LONG, n_events LONG, ewma6 LONG"
    )
