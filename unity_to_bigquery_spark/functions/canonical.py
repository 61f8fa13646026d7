"""Cross-engine-deterministic aggregate expressions.

Two hazards make naive double aggregates hash-differently between Spark
and the DuckDB oracle (both observed at sf0.01):

1. ``SUM(double)`` is order-dependent; the engines accumulate partials
   in different orders and can land on opposite sides of any rounding
   boundary (saw 378060.51 vs 378060.52 after ROUND(...,2)).
2. ``CAST(double AS DECIMAL(18,4))`` is NOT portable: Spark rounds the
   shortest decimal representation (java BigDecimal.valueOf, HALF_UP)
   while DuckDB rounds the exact binary value — 447/60k lineitem rows
   differed by 1 ulp of 1e-4.

The portable scheme used here is explicit fixed-point: the raw per-row
doubles are bit-identical across engines (verified), IEEE ``x * 10^s +
0.5`` is then also bit-identical, and ``FLOOR`` is exact on the binary
value in both engines — no string representations, no rounding-mode
choices. The scaled longs sum exactly (order-independent), and the
final divide by the same power of ten yields the identical double.

SQL oracle mirrors (see ``sql_dsum`` / ``sql_davg``):
    ``CAST(SUM(CAST(FLOOR(x * 1e4 + 0.5) AS BIGINT)) AS DOUBLE) / 1e4``

Overflow headroom: |x| ≤ 1e9 at scale 4 → scaled |x| ≤ 1e13 (exact in
double, < 2^53); 1e6 rows of those sum to 1e19 — near BIGINT range, so
callers with larger inputs drop ``scale``. At the driver's sf0.01-0.1
everything is ≤ 6e17.

Scale note: this is a plain hash aggregate over longs — Tungsten
codegen, map-side partial aggregation, one shuffle. Cheaper than the
double path if anything.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _scaled(c: Column, scale: int) -> Column:
    return F.floor(c * F.lit(float(10**scale)) + F.lit(0.5)).cast("long")


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent, engine-portable SUM for double metrics."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_scaled(c, scale)) / F.lit(float(10**scale))


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent, engine-portable AVG for double metrics."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_scaled(c, scale)) / (F.lit(float(10**scale)) * F.count(c))


def sql_dsum(expr: str, scale: int = 4) -> str:
    k = float(10**scale)
    return f"CAST(SUM(CAST(FLOOR(({expr}) * {k} + 0.5) AS BIGINT)) AS DOUBLE) / {k}"


def sql_davg(expr: str, scale: int = 6) -> str:
    k = float(10**scale)
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {k} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / ({k} * COUNT({expr}))"
    )
