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
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"\s+GROUP\s+BY\s+(?P<group>\w+(?:\s*,\s*\w+)*)"
    r"(?:\s+HAVING\s+(?P<having>.+?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<order>\w+(?:\s+(?:ASC|DESC))?"
    r"(?:\s*,\s*\w+(?:\s+(?:ASC|DESC))?)*))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?\s*;?\s*$"
)
_CONJ_COL_RE = re.compile(
    r"(?is)^\s*(\w+)\s*(?:=|!=|<>|<=|>=|<|>|\bIN\b|\bBETWEEN\b)"
)


def _split_and(cond: str) -> list[str] | None:
    """Split a predicate on top-level ANDs (quote/paren-aware).
    Returns None when the predicate contains a top-level OR/NOT —
    those can't be checked conjunct-by-conjunct, so the caller treats
    the query as not view-servable (fallback, never wrong answers)."""
    parts, start, depth, i, n = [], 0, 0, 0, len(cond)
    bad = False
    while i < n:
        c = cond[i]
        if c == "'":
            i += 1
            while i < n and cond[i] != "'":
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif (
            depth == 0
            and c.isalpha()
            and (i == 0 or not (cond[i - 1].isalnum() or cond[i - 1] == "_"))
        ):
            wm = re.match(r"[A-Za-z_]+", cond[i:])
            w = wm.group(0).upper()
            if w == "AND":
                parts.append(cond[start:i])
                start = i + 3
            elif w in ("OR", "NOT"):
                bad = True
            i += len(wm.group(0)) - 1
        i += 1
    parts.append(cond[start:])
    return None if bad else [p.strip() for p in parts if p.strip()]


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
    def _parse(
        sql: str,
    ) -> tuple[str, list[str], list[tuple[str, str, str]], str | None, dict]:
        """-> (table, group_cols, [(fn, arg, alias), ...], where, post)
        where ``post`` carries the HAVING/ORDER BY/LIMIT tail. Every
        group column must be selected bare. Raises on anything outside
        the canonical rewrite shape (JOIN/expressions)."""
        m = _SQL_RE.match(sql)
        if m is None:
            raise ValueError(
                f"not a rewritable aggregate shape: {sql!r} — grammar: "
                "SELECT <keys...>, AGG(col) AS alias[, ...] FROM <table> "
                "GROUP BY <keys...> with AGG in COUNT/SUM/MIN/MAX/AVG"
            )
        table = m["table"]
        group = [g.strip() for g in m["group"].split(",")]
        aggs: list[tuple[str, str, str]] = []
        seen_keys: set[str] = set()
        for item in (s.strip() for s in _split_commas(m["items"])):
            if item in group:
                seen_keys.add(item)
                continue
            am = _AGG_RE.match(item)
            if am is None:
                raise ValueError(
                    f"unsupported select item {item!r} (only bare "
                    "group keys and aliased COUNT/SUM/MIN/MAX/AVG)"
                )
            fn = am["fn"].upper()
            if (fn == "COUNT") != (am["arg"] == "*"):
                raise ValueError(
                    f"{item!r}: COUNT takes only '*', other aggregates "
                    "take a bare column"
                )
            aggs.append((fn, am["arg"], am["alias"]))
        if seen_keys != set(group):
            raise ValueError(
                f"every group key {group} must be selected bare "
                f"(missing: {sorted(set(group) - seen_keys)})"
            )
        post = {
            "having": m["having"],
            "order": m["order"],
            "limit": int(m["limit"]) if m["limit"] else None,
        }
        return table, group, aggs, m["where"], post

    def _match(
        self,
        table: str,
        group: list[str],
        aggs: list[tuple[str, str, str]],
        filter_cols: set[str] = frozenset(),
    ) -> ContinuousAggregate | None:
        """A view covers the query when the query's group columns AND
        every WHERE-filtered column are a SUBSET of the view's dims
        (equal group set -> direct serve; strict subset -> the classic
        rollup re-aggregation: COUNT = SUM(n), SUM = SUM, MIN/MAX of
        the per-tuple extrema — still rollup-sized work; dim filters
        apply to the rollup rows, exact because the dims partition the
        base rows) and every aggregate is derivable."""
        for _name, tname, mv in self._views:
            if tname != table or not set(group) | set(filter_cols) <= set(mv.keys):
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

    @staticmethod
    def _post(df: DataFrame, group: list[str], post: dict) -> DataFrame:
        """HAVING / ORDER BY / LIMIT tail, applied IDENTICALLY on the
        view-serve and direct-scan paths (they share the output schema,
        so equality is preserved by construction). HAVING references
        output aliases or group columns; ORDER BY gets the group
        columns appended as the unique total-order tiebreak, so a
        LIMIT is deterministic cross-engine."""
        if post.get("having"):
            df = df.filter(F.expr(post["having"]))
        order = post.get("order")
        limit = post.get("limit")
        if order:
            cols = []
            named = set()
            for item in order.split(","):
                toks = item.split()
                named.add(toks[0])
                cols.append(
                    F.col(toks[0]).desc()
                    if len(toks) > 1 and toks[1].upper() == "DESC"
                    else F.col(toks[0]).asc()
                )
            cols.extend(F.col(g).asc() for g in group if g not in named)
            df = df.orderBy(*cols)
        if limit is not None:
            if not order:
                raise ValueError("LIMIT requires ORDER BY (total order)")
            df = df.limit(limit)
        return df

    # ---- serving -----------------------------------------------------------

    def answer_sql(
        self, sql: str, realtime: bool = True, version: int | None = None
    ) -> tuple[DataFrame, bool]:
        """Answer the aggregate; returns ``(df, used_view)``. When a
        registered rollup covers the shape, the answer is served from
        it (real-time by default — exact w.r.t. the LIVE source even
        with unfolded commits); otherwise the identical fixed-point
        aggregate runs directly over the table's snapshot read.

        ``version`` pins BOTH paths to that source snapshot (the
        TableCatalog's snapshot-consistent integration): the view
        serves via ``read_realtime(to_version=version)`` and is
        skipped when its bookmark is already past the pin; the
        fallback reads the pinned snapshot."""
        table, group, aggs, where, post = self._parse(sql)
        if table not in self._tables:
            raise ValueError(f"unknown table {table!r}")
        mv = None
        if where is None:
            mv = self._match(table, group, aggs)
        else:
            # a WHERE is view-servable iff it is a pure AND of
            # per-dim conjuncts (each naming one view dim) — then
            # filtering the rollup rows ≡ filtering the base rows
            conj = _split_and(where)
            if conj is not None:
                cols = [_CONJ_COL_RE.match(c) for c in conj]
                if all(cols):
                    mv = self._match(
                        table, group, aggs,
                        {m.group(1) for m in cols},
                    )
        if mv is not None and version is not None and (
            mv.last_refreshed() > version
        ):
            mv = None  # rollup folded past the pin: cannot unfold
        if mv is not None:
            state = (
                mv.read_realtime(to_version=version)
                if realtime or version is not None
                else mv.read()
            )
            if where is not None:
                state = state.filter(F.expr(where))
            sums = {src: out for out, src in mv.measures.items()}
            mins = {src: out for out, src in mv.min_measures.items()}
            maxs = {src: out for out, src in mv.max_measures.items()}
            if set(group) == set(mv.keys):
                cols = [*(F.col(g) for g in group)]
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
                return self._post(state.select(*cols), group, post), True
            # STRICT SUBSET of the view's dims: re-aggregate the rollup
            # (SUM of partial counts/sums, MIN/MAX of partial extrema —
            # exact because the partials partition the rows; still
            # rollup-sized input, never the base table)
            exprs = []
            for fn, arg, alias in aggs:
                if fn == "COUNT":
                    exprs.append(F.sum("n").alias(alias))
                elif fn == "SUM":
                    exprs.append(F.sum(sums[arg]).alias(alias))
                elif fn == "AVG":
                    exprs.append(
                        F.floor(F.sum(sums[arg]) / F.sum("n"))
                        .cast("long").alias(alias)
                    )
                elif fn == "MIN":
                    exprs.append(F.min(mins[arg]).alias(alias))
                else:
                    exprs.append(F.max(maxs[arg]).alias(alias))
            return (
                self._post(state.groupBy(*group).agg(*exprs), group, post),
                True,
            )
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
        base = self._tables[table].read(version)
        if where is not None:
            base = base.filter(F.expr(where))
        return (
            self._post(base.groupBy(*group).agg(*exprs), group, post),
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
