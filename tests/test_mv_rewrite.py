"""Real-time continuous-aggregate serving (read_realtime) and the
materialized-view automatic query rewrite catalog (round 13).

Core invariant, exercised throughout: with UNFOLDED source commits
(appends, deletes, extremum kills), ``read_realtime()`` equals a full
fixed-point groupBy of the live source — and the rewrite front door
returns the identical rows whether it routes to the view or falls back
to the direct scan."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from unity_to_bigquery_spark.plans.incremental_agg import ContinuousAggregate
from unity_to_bigquery_spark.plans.mv_rewrite import MaterializedViewCatalog
from unity_to_bigquery_spark.plans.versioned import VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k STRING, x DOUBLE")


def _fx_groupby(t):
    """The ground truth: full fixed-point groupBy of the live table."""
    fx = F.floor(F.col("x") * 1000000.0 + F.lit(0.5)).cast("long")
    return sorted(
        tuple(r)
        for r in t.read()
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(fx).alias("s"),
            F.min(fx).alias("lo"),
            F.max(fx).alias("hi"),
        )
        .collect()
    )


def _realtime_rows(agg):
    return sorted(
        tuple(r) for r in agg.read_realtime().select(
            "k", "n", "s", "lo", "hi"
        ).collect()
    )


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "t")


def _make(spark, root):
    t = VersionedTable(spark, root + "_src")
    agg = ContinuousAggregate(
        spark, t, root + "_agg", "k",
        measures={"s": "x"},
        min_measures={"lo": "x"},
        max_measures={"hi": "x"},
        handle_deletes=True,
    )
    return t, agg


def test_realtime_equals_recompute_through_lifecycle(spark, root):
    t, agg = _make(spark, root)
    # never refreshed, never committed state: fold-from-zero
    t.commit_append(_df(spark, [("a", 1.5), ("a", 2.5), ("b", 9.0)]))
    assert _realtime_rows(agg) == _fx_groupby(t)
    # refresh, then pile on unfolded commits of every shape
    agg.refresh()
    assert _realtime_rows(agg) == _fx_groupby(t)  # no-lag degenerates
    t.commit_append(_df(spark, [("a", 7.0), ("c", 3.25)]))
    assert _realtime_rows(agg) == _fx_groupby(t)
    # delete the stored maximum of 'a' (9.0 is b's; a's max is 7.0,
    # committed AFTER the refresh) and the stored max of 'b' (9.0,
    # folded state) — exercises both provisional and rescan paths
    t.delete_rows_where("x = 7.0 OR x = 9.0")
    assert _realtime_rows(agg) == _fx_groupby(t)
    # full retraction of a key in the unfolded window -> invisible
    t.delete_rows_where("k = 'c'")
    assert {r[0] for r in _realtime_rows(agg)} == {"a"}
    assert _realtime_rows(agg) == _fx_groupby(t)
    # and the same answer survives an interleaved refresh (state moved
    # from "mostly unfolded" to "fully folded")
    before = _realtime_rows(agg)
    agg.refresh()
    assert _realtime_rows(agg) == before


def test_realtime_does_not_commit(spark, root):
    t, agg = _make(spark, root)
    t.commit_append(_df(spark, [("a", 1.0)]))
    agg.refresh()
    v = agg.table.latest_version()
    t.commit_append(_df(spark, [("a", 2.0), ("z", 5.0)]))
    _ = _realtime_rows(agg)
    assert agg.table.latest_version() == v  # pure read
    assert agg.last_refreshed() < t.latest_version()


def test_rewrite_routes_and_matches_fallback(spark, root):
    t, agg = _make(spark, root)
    t.commit_append(_df(spark, [("a", 1.5), ("b", 2.0), ("a", 4.5)]))
    agg.refresh()
    t.commit_append(_df(spark, [("b", 8.0)]))  # unfolded on purpose
    cat = MaterializedViewCatalog(spark)
    cat.register_table("tt", t)
    cat.register_view("tt_by_k", "tt", agg)
    sql = (
        "SELECT k, COUNT(*) AS n, SUM(x) AS s, AVG(x) AS m, "
        "MIN(x) AS lo, MAX(x) AS hi FROM tt GROUP BY k"
    )
    served, used = cat.answer_sql(sql)
    assert used is True
    direct, used2 = MaterializedViewCatalog(spark), None
    direct.register_table("tt", t)  # no view registered -> fallback
    fell, used2 = direct.answer_sql(sql)
    assert used2 is False
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, fell.collect())
    )
    # a shape the view can't cover falls back in the SAME catalog:
    # group key is not the view key
    _, used3 = cat.answer_sql("SELECT x, COUNT(*) AS n FROM tt GROUP BY x")
    assert used3 is False
    # stale serving (realtime=False) reflects only the folded state
    stale, used4 = cat.answer_sql(sql, realtime=False)
    assert used4 is True
    assert {r.k: r.n for r in stale.collect()} == {"a": 2, "b": 1}


def test_rewrite_grammar_rejections(spark, root):
    t, _ = _make(spark, root)
    cat = MaterializedViewCatalog(spark)
    cat.register_table("tt", t)
    for bad in (
        "SELECT k, COUNT(*) AS n FROM tt",                      # no GROUP BY
        "SELECT k, SUM(x) AS s FROM tt WHERE x > 0 GROUP BY k",  # WHERE
        "SELECT k, SUM(x + 1) AS s FROM tt GROUP BY k",          # expression
        "SELECT k, COUNT(x) AS n FROM tt GROUP BY k",            # COUNT(col)
        "SELECT COUNT(*) AS n FROM tt GROUP BY k",               # key not selected
    ):
        with pytest.raises(ValueError):
            cat.answer_sql(bad)
    with pytest.raises(ValueError, match="unknown table"):
        cat.answer_sql("SELECT k, COUNT(*) AS n FROM nope GROUP BY k")


def test_register_view_validates_source(spark, root):
    t, agg = _make(spark, root)
    other = VersionedTable(spark, root + "_other")
    cat = MaterializedViewCatalog(spark)
    cat.register_table("other", other)
    with pytest.raises(ValueError, match="aggregates"):
        cat.register_view("v", "other", agg)
