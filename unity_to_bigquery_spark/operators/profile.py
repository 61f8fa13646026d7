"""ONE-PASS table profiling (ANALYZE TABLE / data-profiling primitive):
per-column row count, null count, exact distinct count, min/max, and a
type-appropriate magnitude aggregate — the first query every data team
runs against a new 100 TB table, and the stats layer quality monitors
diff across loads.

Shape: TWO ``agg`` passes over the table — one codegen scan computes
every column's plain statistics (count/nulls/min/max/sum) at once, a
second computes every column's exact NDV through the standard per-gid
Expand (profiling N columns costs two table reads, not N). They are
deliberately NOT one ``agg``: Spark plans count(DISTINCT …) mixed
with regular aggregates as an Expand whose partial hash aggregate
keys on (gid × every distinct column), re-evaluating the plain
aggregates over the replicated input — measured 8× slower at sf0.1
(optimization round r13). No per-column jobs, no sampling.

Cross-engine portability (CLAUDE.md rule 2): doubles surface as
1e-6 fixed-point longs (min6/max6/sum6), timestamps as formatted
strings, so the DuckDB oracle hash-matches exactly. Exact NDV via
count(DISTINCT …) — at a real 100 TB deployment swap
``approx_count_distinct`` per column for one-pass HLL; the exact form
is what an oracle can verify.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PROFILE_SCHEMA = (
    "col_name STRING, kind STRING, n_rows BIGINT, n_nulls BIGINT, "
    "n_distinct BIGINT, min_repr STRING, max_repr STRING, sum6 BIGINT"
)


def _fp6(c):
    return F.floor(c * 1000000.0 + F.lit(0.5)).cast("long")


def profile_table(df: DataFrame, specs: list[tuple[str, str]]) -> DataFrame:
    """Profile ``specs`` = [(column, kind)] with kind in
    {'int', 'float', 'str', 'ts'}; returns one row per column
    (PROFILE_SCHEMA). 'ts' columns are profiled on their
    ``yyyy-MM-dd HH:mm:ss`` rendering; 'float' min/max/sum are 1e-6
    fixed point rendered/stored as longs."""
    # The exact-NDV aggregates run in their OWN aggregation, separate
    # from the plain min/max/sum/null-count pass (optimization round
    # r13, measured 8x at sf0.1): Spark plans N count(DISTINCT …)
    # MIXED with regular aggregates as one Expand whose partial hash
    # aggregate keys on (gid × every distinct column) — the regular
    # aggregates are then re-evaluated across the N+1-fold replicated
    # input under that wide key and the partial map holds millions of
    # entries. Split, the plain pass is one codegen scan and the
    # distinct pass is the standard narrow per-gid Expand. Same scan,
    # same aggregate values, two bounded 1-row actions instead of one.
    exprs = [F.count(F.lit(1)).alias("__n")]
    nd_exprs = []
    for col, kind in specs:
        c = F.col(col)
        if kind == "ts":
            c = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
        exprs.append(F.count(F.when(c.isNull(), 1)).alias(f"nn_{col}"))
        nd_exprs.append(F.countDistinct(c).alias(f"nd_{col}"))
        if kind == "float":
            exprs.append(_fp6(F.min(c)).cast("string").alias(f"mn_{col}"))
            exprs.append(_fp6(F.max(c)).cast("string").alias(f"mx_{col}"))
            exprs.append(F.sum(_fp6(c)).alias(f"s6_{col}"))
        else:
            exprs.append(F.min(c).cast("string").alias(f"mn_{col}"))
            exprs.append(F.max(c).cast("string").alias(f"mx_{col}"))
            if kind == "int":
                exprs.append(F.sum(c).cast("long").alias(f"s6_{col}"))
            else:
                exprs.append(F.lit(None).cast("long").alias(f"s6_{col}"))
    row = df.agg(*exprs).first()  # bounded: ONE row, 3 cells per column
    nd_row = df.agg(*nd_exprs).first()  # bounded: ONE row, 1 cell per column
    out = [
        (
            col, kind, row["__n"], row[f"nn_{col}"], nd_row[f"nd_{col}"],
            row[f"mn_{col}"], row[f"mx_{col}"], row[f"s6_{col}"],
        )
        for col, kind in specs
    ]
    return df.sparkSession.createDataFrame(out, PROFILE_SCHEMA)
