"""Materialized-view AUTOMATIC QUERY REWRITE over continuous
aggregates (round 13) — the BigQuery-materialized-view / Oracle
query-rewrite role: a catalog of :class:`ContinuousAggregate` rollups
per source table, and an ``answer_sql`` front door that routes a
matching ``SELECT key, aggs FROM t GROUP BY key`` to the rollup —
served REAL-TIME (``read_realtime``: stored state + the unfolded CDC
window folded at read, so the answer equals a fresh full groupBy of
the live table) — and transparently falls back to a direct scan when
no view covers the shape. The caller gets the same answer either way;
only the cost differs (rollup-sized + delta vs table-sized).

Generalizes the reference's "precomputed destination table" idea
(``Unity_to_BigQuery.py:142-166`` materializes query results into BQ
tables that downstream queries then read instead of re-scanning) into
an automatic, freshness-exact rewrite.

Derivability rules (classic MV matching, restricted to what the
rollup stores exactly):

- ``COUNT(*)``            -> ``n``
- ``SUM(x)``              -> a measure with source ``x``
- ``MIN(x)`` / ``MAX(x)`` -> a min_/max_measure with source ``x``
- ``AVG(x)``              -> ``FLOOR(sum_fx / n)`` when ``SUM(x)`` is
  stored (fixed-point integer mean — exact, order-independent)

All aggregate outputs are in the rollup's 1e-6 FIXED-POINT LONG space
(``floor(x * 1e6 + 0.5)`` per row, summed/min'd/max'd as longs —
functions/canonical.py discipline), and the direct-scan fallback
computes the identical fixed-point expressions, so rewrite vs
fallback is bit-identical and DuckDB-oracle-able.

Scale: the rewrite turns a 100-TB table scan into a read of the
rollup (one row per key) plus a fold of the commits since the last
refresh — the same ∝-delta cost a refresh pays.  The matcher is pure
metadata (no data touched deciding the route).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from unity_to_bigquery_spark.plans.incremental_agg import (
    ContinuousAggregate,
    _fx,
)
from unity_to_bigquery_spark.plans.versioned import VersionedTable

_AGG_RE = re.compile(
    r"(?is)^(?P<fn>COUNT|SUM|MIN|MAX|AVG)\s*\(\s*(?P<arg>\*|\w+)\s*\)"
    r"\s+AS\s+(?P<alias>\w+)$"
)
_SQL_RE = re.compile(
    r"(?is)^\s*SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<table>\w+)"
    r"\s+GROUP\s+BY\s+(?P<group>\w+)\s*;?\s*$"
)


class MaterializedViewCatalog:
    """Registry of versioned tables and their continuous-aggregate
    rollups; ``answer_sql`` is the rewrite front door."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, VersionedTable] = {}
        self._views: list[tuple[str, str, ContinuousAggregate]] = []

    def register_table(self, name: str, table: VersionedTable) -> None:
        self._tables[name] = table

    def register_view(
        self, name: str, table_name: str, agg: ContinuousAggregate
    ) -> None:
        if table_name not in self._tables:
            raise ValueError(f"unknown table {table_name!r}")
        if agg.source.root != self._tables[table_name].root:
            raise ValueError(
                f"view {name!r} aggregates {agg.source.root}, not the "
                f"registered table {table_name!r}"
            )
        self._views.append((name, table_name, agg))

    # ---- matching ----------------------------------------------------------

    @staticmethod
    def _parse(sql: str) -> tuple[str, str, list[tuple[str, str, str]]]:
        """-> (table, group_col, [(fn, arg, alias), ...]); the group
        column must be selected bare. Raises on anything outside the
        canonical rewrite shape (WHERE/HAVING/JOIN/expressions)."""
        m = _SQL_RE.match(sql)
        if m is None:
            raise ValueError(
                f"not a rewritable aggregate shape: {sql!r} — grammar: "
                "SELECT <key>, AGG(col) AS alias[, ...] FROM <table> "
                "GROUP BY <key> with AGG in COUNT/SUM/MIN/MAX/AVG"
            )
        table, group = m["table"], m["group"]
        aggs: list[tuple[str, str, str]] = []
        saw_key = False
        for item in (s.strip() for s in _split_commas(m["items"])):
            if item == group:
                saw_key = True
                continue
            am = _AGG_RE.match(item)
            if am is None:
                raise ValueError(
                    f"unsupported select item {item!r} (only the bare "
                    "group key and aliased COUNT/SUM/MIN/MAX/AVG)"
                )
            fn = am["fn"].upper()
            if (fn == "COUNT") != (am["arg"] == "*"):
                raise ValueError(
                    f"{item!r}: COUNT takes only '*', other aggregates "
                    "take a bare column"
                )
            aggs.append((fn, am["arg"], am["alias"]))
        if not saw_key:
            raise ValueError(f"group key {group!r} must be selected bare")
        return table, group, aggs

    def _match(
        self, table: str, group: str, aggs: list[tuple[str, str, str]]
    ) -> ContinuousAggregate | None:
        for _name, tname, mv in self._views:
            if tname != table or mv.key != group:
                continue
            sums = {src: out for out, src in mv.measures.items()}
            mins = {src: out for out, src in mv.min_measures.items()}
            maxs = {src: out for out, src in mv.max_measures.items()}
            ok = all(
                (fn == "COUNT")
                or (fn in ("SUM", "AVG") and arg in sums)
                or (fn == "MIN" and arg in mins)
                or (fn == "MAX" and arg in maxs)
                for fn, arg, _ in aggs
            )
            if ok:
                return mv
        return None

    # ---- serving -----------------------------------------------------------

    def answer_sql(
        self, sql: str, realtime: bool = True
    ) -> tuple[DataFrame, bool]:
        """Answer the aggregate; returns ``(df, used_view)``. When a
        registered rollup covers the shape, the answer is served from
        it (real-time by default — exact w.r.t. the LIVE source even
        with unfolded commits); otherwise the identical fixed-point
        aggregate runs directly over the table's snapshot read."""
        table, group, aggs = self._parse(sql)
        if table not in self._tables:
            raise ValueError(f"unknown table {table!r}")
        mv = self._match(table, group, aggs)
        if mv is not None:
            state = mv.read_realtime() if realtime else mv.read()
            sums = {src: out for out, src in mv.measures.items()}
            mins = {src: out for out, src in mv.min_measures.items()}
            maxs = {src: out for out, src in mv.max_measures.items()}
            cols = [F.col(group)]
            for fn, arg, alias in aggs:
                if fn == "COUNT":
                    cols.append(F.col("n").alias(alias))
                elif fn == "SUM":
                    cols.append(F.col(sums[arg]).alias(alias))
                elif fn == "AVG":
                    cols.append(
                        F.floor(F.col(sums[arg]) / F.col("n"))
                        .cast("long").alias(alias)
                    )
                elif fn == "MIN":
                    cols.append(F.col(mins[arg]).alias(alias))
                else:
                    cols.append(F.col(maxs[arg]).alias(alias))
            return state.select(*cols), True
        # fallback: same fixed-point semantics straight off the table
        exprs = []
        for fn, arg, alias in aggs:
            if fn == "COUNT":
                exprs.append(F.count(F.lit(1)).alias(alias))
            elif fn == "SUM":
                exprs.append(F.sum(_fx(arg)).alias(alias))
            elif fn == "AVG":
                exprs.append(
                    F.floor(F.sum(_fx(arg)) / F.count(F.lit(1)))
                    .cast("long").alias(alias)
                )
            elif fn == "MIN":
                exprs.append(F.min(_fx(arg)).alias(alias))
            else:
                exprs.append(F.max(_fx(arg)).alias(alias))
        return (
            self._tables[table].read().groupBy(group).agg(*exprs),
            False,
        )


def _split_commas(s: str) -> list[str]:
    """Split select items on top-level commas (parens tracked — an
    ``AGG(a, b)`` never splits; no string literals appear in the
    rewrite grammar)."""
    parts, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts
