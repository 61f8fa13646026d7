"""Skyline (Pareto-frontier) operator: the rows not dominated by any
other row, minimizing every listed dimension — multi-objective top-k
the relational algebra has no primitive for (Börzsönyi et al., ICDE
2001 introduced SKYLINE OF; Spark has no built-in).

Distributed shape (the standard two-phase construction): a LOCAL
skyline per Arrow batch (mapInPandas — any globally non-dominated row
is non-dominated in its partition, so local pruning is lossless),
then the final skyline over the union of local survivors on one small
partition. Phase-1 output is tiny in practice (skyline size grows
~log^{d-1} n on independent dimensions), so the phase-2 coalesce(1)
handles a frontier-sized relation, not the corpus. Worst-case
(anti-correlated dimensions, frontier ~ n) degrades to the inherent
output size — no algorithm beats its own output.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _local_skyline(pdf: pd.DataFrame, dims: list[str]) -> pd.DataFrame:
    """Quadratic in-batch skyline — fine for Arrow-batch-sized inputs;
    strict domination in at least one dimension, <= in all."""
    vals = pdf[dims].to_numpy()
    n = len(vals)
    keep = []
    for i in range(n):
        dominated = False
        for j in range(n):
            if j == i:
                continue
            if (vals[j] <= vals[i]).all() and (vals[j] < vals[i]).any():
                dominated = True
                break
        if not dominated:
            keep.append(i)
    return pdf.iloc[keep]


def skyline(df: DataFrame, dims: list[str]) -> DataFrame:
    """Rows of ``df`` not dominated on ``dims`` (all minimized).
    Duplicate points on the frontier all survive (consistent with the
    NOT EXISTS strict-domination definition)."""
    schema = df.schema

    def phase(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                yield _local_skyline(pdf, dims)

    local = df.mapInPandas(phase, schema)
    # phase 2 must see ALL survivors in one pandas frame (mapInPandas
    # would re-batch a large frontier at maxRecordsPerBatch and merge
    # per batch, silently keeping dominated rows) — grouped-map with a
    # constant key delivers the whole frontier-sized relation at once.
    return (
        local.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(
            lambda pdf: _local_skyline(pdf.drop(columns="__g"), dims), schema
        )
    )
