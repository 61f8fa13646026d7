"""Hypertable-style cascading time rollups (continuous aggregates):
pre-aggregate events at the finest resolution once, then derive every
coarser resolution by MERGING partials — never by rescanning raw data.

This is the TimescaleDB/Druid continuous-aggregate pattern, and the
only sane shape at 100 TB: the minute-level rollup is ~1e4× smaller
than raw events, so hour/day/month aggregates cost re-aggregation of
partials, not scans. Correctness rests on the aggregates being
algebraic: count/sum merge by sum; min/max by min/max; avg is derived
sum/count at read time (never averaged across levels).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# merge rules: every column here is mergeable by the named function
_MERGES = {"n": F.sum, "sum_v6": F.sum, "min_v6": F.min, "max_v6": F.max}


def rollup_finest(
    events: DataFrame, ts: str = "ts", key: str = "event_type", window: str = "1 minute"
) -> DataFrame:
    """The single raw-data scan: finest-grain partial aggregates.
    Values carried as ×1e6 fixed-point longs so every level is exact
    and engine-portable.
    """
    v6 = F.floor(F.col("value") * 1000000.0 + 0.5).cast("long")
    return (
        events.groupBy(F.window(ts, window).alias("w"), key)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v6).alias("sum_v6"),
            F.min(v6).alias("min_v6"),
            F.max(v6).alias("max_v6"),
        )
        .select(F.col("w.start").alias("bucket"), key, *(_MERGES.keys()))
    )


def rollup_coarser(finer: DataFrame, window: str, key: str = "event_type") -> DataFrame:
    """Derive a coarser rollup purely from a finer one (partial-merge —
    no raw-data access). ``finer.bucket`` timestamps re-bucket into the
    coarser window; algebraic columns merge per _MERGES.
    """
    return (
        finer.groupBy(F.window("bucket", window).alias("w"), key)
        .agg(*[fn(c).alias(c) for c, fn in _MERGES.items()])
        .select(F.col("w.start").alias("bucket"), key, *(_MERGES.keys()))
    )
