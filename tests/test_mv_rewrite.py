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
        "SELECT k, SUM(x + 1) AS s FROM tt GROUP BY k",          # expression
        "SELECT k, COUNT(x) AS n FROM tt GROUP BY k",            # COUNT(col)
        "SELECT COUNT(*) AS n FROM tt GROUP BY k",               # key not selected
    ):
        with pytest.raises(ValueError):
            cat.answer_sql(bad)
    with pytest.raises(ValueError, match="unknown table"):
        cat.answer_sql("SELECT k, COUNT(*) AS n FROM nope GROUP BY k")


def test_where_on_dims_serves_from_view(spark, root):
    t, agg = _make2(spark, root)
    t.commit_append(
        _df2(spark, [("p", "u", 1.0), ("p", "v", 5.0), ("q", "u", 2.0)])
    )
    agg.refresh()
    t.commit_append(_df2(spark, [("q", "v", 10.0)]))  # unfolded
    cat = MaterializedViewCatalog(spark)
    cat.register_table("tt", t)
    cat.register_view("tt_ab", "tt", agg)
    fb = MaterializedViewCatalog(spark)
    fb.register_table("tt", t)
    # dim-only WHERE (incl. one filter col OUTSIDE the group cols)
    sql = (
        "SELECT a, COUNT(*) AS n, SUM(x) AS s FROM tt "
        "WHERE b = 'u' AND a != 'zz' GROUP BY a"
    )
    served, used = cat.answer_sql(sql)
    direct, used_fb = fb.answer_sql(sql)
    assert used is True and used_fb is False
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, direct.collect())
    ) == [("p", 1, 1000000), ("q", 1, 2000000)]
    # measure-column WHERE, OR, and NOT all fall back (never wrong)
    for fb_sql in (
        "SELECT a, COUNT(*) AS n FROM tt WHERE x > 1.5 GROUP BY a",
        "SELECT a, COUNT(*) AS n FROM tt WHERE b = 'u' OR b = 'v' GROUP BY a",
        "SELECT a, COUNT(*) AS n FROM tt WHERE NOT b = 'u' GROUP BY a",
    ):
        _, u = cat.answer_sql(fb_sql)
        assert u is False, fb_sql
    # an AND inside a string literal must not split the conjunct
    served2, used2 = cat.answer_sql(
        "SELECT a, COUNT(*) AS n FROM tt WHERE b = 'u AND v' GROUP BY a"
    )
    assert used2 is True and served2.count() == 0


def test_register_view_validates_source(spark, root):
    t, agg = _make(spark, root)
    other = VersionedTable(spark, root + "_other")
    cat = MaterializedViewCatalog(spark)
    cat.register_table("other", other)
    with pytest.raises(ValueError, match="aggregates"):
        cat.register_view("v", "other", agg)


# ---- composite keys + dim-subset rewrite (round 13) --------------------------


def _df2(spark, rows):
    return spark.createDataFrame(rows, "a STRING, b STRING, x DOUBLE")


def _fx2_groupby(t, *dims):
    fx = F.floor(F.col("x") * 1000000.0 + F.lit(0.5)).cast("long")
    return sorted(
        tuple(r)
        for r in t.read()
        .groupBy(*dims)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(fx).alias("s"),
            F.min(fx).alias("lo"),
            F.max(fx).alias("hi"),
        )
        .collect()
    )


def _make2(spark, root):
    t = VersionedTable(spark, root + "_src")
    agg = ContinuousAggregate(
        spark, t, root + "_agg", ["a", "b"],
        measures={"s": "x"},
        min_measures={"lo": "x"},
        max_measures={"hi": "x"},
        handle_deletes=True,
    )
    return t, agg


def test_composite_key_lifecycle_equals_recompute(spark, root):
    t, agg = _make2(spark, root)
    t.commit_append(
        _df2(spark, [("p", "u", 1.5), ("p", "v", 2.5), ("q", "u", 9.0)])
    )
    agg.refresh()
    rows = sorted(
        tuple(r)
        for r in agg.read().select("a", "b", "n", "s", "lo", "hi").collect()
    )
    assert rows == _fx2_groupby(t, "a", "b")
    # synthesized merge key never leaks into reads
    assert ContinuousAggregate.CKEY not in agg.read().columns
    assert ContinuousAggregate.CKEY not in agg.read_realtime().columns
    # unfolded append + extremum-killing delete, realtime
    t.commit_append(_df2(spark, [("p", "u", 7.0), ("r", "w", 3.0)]))
    t.delete_rows_where("x = 9.0 OR x = 7.0")
    rt = sorted(
        tuple(r)
        for r in agg.read_realtime()
        .select("a", "b", "n", "s", "lo", "hi")
        .collect()
    )
    assert rt == _fx2_groupby(t, "a", "b")
    # interleaved refresh converges to the same state
    agg.refresh()
    assert sorted(
        tuple(r)
        for r in agg.read().select("a", "b", "n", "s", "lo", "hi").collect()
    ) == rt


def test_composite_null_dims_do_not_collide(spark, root):
    t, agg = _make2(spark, root)
    t.commit_append(
        _df2(spark, [("p", None, 1.0), ("p", "", 2.0), (None, "p", 4.0)])
    )
    agg.refresh()
    fx = F.floor(F.col("x") * 1000000.0 + F.lit(0.5)).cast("long")
    want = {
        tuple(r)
        for r in t.read()
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(fx).alias("s"),
            F.min(fx).alias("lo"),
            F.max(fx).alias("hi"),
        )
        .collect()
    }
    got = {
        tuple(r)
        for r in agg.read().select("a", "b", "n", "s", "lo", "hi").collect()
    }
    assert got == want
    assert agg.read().count() == 3  # NULL, '' and swapped dims all distinct


def test_subset_rewrite_reaggregates_from_rollup(spark, root):
    t, agg = _make2(spark, root)
    t.commit_append(
        _df2(spark, [("p", "u", 1.0), ("p", "v", 5.0), ("q", "u", 2.0)])
    )
    agg.refresh()
    t.commit_append(_df2(spark, [("p", "u", 10.0)]))  # unfolded
    cat = MaterializedViewCatalog(spark)
    cat.register_table("tt", t)
    cat.register_view("tt_ab", "tt", agg)
    # exact-set match (order permuted) serves directly
    d0, used0 = cat.answer_sql(
        "SELECT b, a, COUNT(*) AS n FROM tt GROUP BY b, a"
    )
    assert used0 and d0.count() == 3
    # strict subset: re-aggregated from the rollup, still realtime
    sql = (
        "SELECT a, COUNT(*) AS n, SUM(x) AS s, AVG(x) AS m, "
        "MIN(x) AS lo, MAX(x) AS hi FROM tt GROUP BY a"
    )
    served, used = cat.answer_sql(sql)
    assert used is True
    direct = MaterializedViewCatalog(spark)
    direct.register_table("tt", t)
    fell, used_fb = direct.answer_sql(sql)
    assert used_fb is False
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, fell.collect())
    )
    # a group col OUTSIDE the view's dims falls back
    _, used2 = cat.answer_sql("SELECT x, COUNT(*) AS n FROM tt GROUP BY x")
    assert used2 is False


def test_having_order_limit_tail(spark, root):
    t, agg = _make(spark, root)
    t.commit_append(
        _df(spark, [("a", 1.0), ("a", 2.0), ("b", 9.0), ("c", 4.0), ("c", 1.0)])
    )
    agg.refresh()
    t.commit_append(_df(spark, [("b", 1.0)]))  # unfolded
    cat = MaterializedViewCatalog(spark)
    cat.register_table("tt", t)
    cat.register_view("tt_k", "tt", agg)
    fb = MaterializedViewCatalog(spark)
    fb.register_table("tt", t)
    sql = (
        "SELECT k, COUNT(*) AS n, SUM(x) AS s FROM tt GROUP BY k "
        "HAVING n >= 2 ORDER BY s DESC LIMIT 2"
    )
    served, used = cat.answer_sql(sql)
    direct, used_fb = fb.answer_sql(sql)
    assert used is True and used_fb is False
    got = [tuple(r) for r in served.collect()]
    assert got == [tuple(r) for r in direct.collect()]
    # a=3.0, b=10.0, c=5.0 all have n>=2; top-2 by s desc = b, c
    assert got == [("b", 2, 10000000), ("c", 2, 5000000)]
    # LIMIT without ORDER BY has no total order -> refused
    with pytest.raises(ValueError, match="ORDER BY"):
        cat.answer_sql("SELECT k, COUNT(*) AS n FROM tt GROUP BY k LIMIT 1")
    # ORDER BY ties broken by the appended group-key tiebreak
    tie, _ = cat.answer_sql(
        "SELECT k, COUNT(*) AS n FROM tt GROUP BY k ORDER BY n DESC LIMIT 2"
    )
    assert [r.k for r in tie.collect()] == ["a", "b"]


def test_read_realtime_to_version_pin(spark, root):
    t, agg = _make(spark, root)
    t.commit_append(_df(spark, [("a", 1.0)]))
    agg.refresh()
    v1 = t.latest_version()
    t.commit_append(_df(spark, [("a", 2.0)]))
    v2 = t.latest_version()
    t.commit_append(_df(spark, [("a", 4.0)]))
    # pin mid-history: fold stops exactly at v2
    got = {(r.k, r.n, r.s) for r in agg.read_realtime(to_version=v2).collect()}
    assert got == {("a", 2, 3000000)}
    # pin at the bookmark degenerates to the stored state
    assert {(r.k, r.n) for r in agg.read_realtime(to_version=v1).collect()} == {
        ("a", 1)
    }
    # bookmark past the pin refuses
    agg.refresh()
    with pytest.raises(ValueError, match="cannot serve as of"):
        agg.read_realtime(to_version=v1)
    # answer_sql with version= skips the too-fresh view but still
    # answers from the pinned snapshot
    cat = MaterializedViewCatalog(spark)
    cat.register_table("tt", t)
    cat.register_view("tt_k", "tt", agg)
    df, used = cat.answer_sql(
        "SELECT k, COUNT(*) AS n FROM tt GROUP BY k", version=v1
    )
    assert used is False and df.first().n == 1


def test_streamed_maintenance_composite_key(spark, root, tmp_path):
    """The live-MV streaming sink drives a COMPOSITE-key rollup:
    drained state ≡ the batch-refresh twin, realtime serving stays
    exact mid-stream shapes included (append + delete commits)."""
    from unity_to_bigquery_spark.streaming.stream import (
        continuous_aggregate_stream,
    )

    t, agg = _make2(spark, root)
    t.commit_append(
        _df2(spark, [("p", "u", 1.0), ("p", "v", 2.0), ("q", "u", 3.0)])
    )
    t.delete_rows_where("x = 2.0")
    t.commit_append(_df2(spark, [("p", "u", 7.0)]))
    q = continuous_aggregate_stream(agg, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert agg.last_refreshed() == t.latest_version()
    got = {
        (r.a, r.b, r.n, r.s)
        for r in agg.read().select("a", "b", "n", "s").collect()
    }
    assert got == {("p", "u", 2, 8000000), ("q", "u", 1, 3000000)}
    # the drained state equals a from-scratch batch twin
    twin = ContinuousAggregate(
        spark, t, str(tmp_path / "twin"), ["a", "b"],
        measures={"s": "x"},
        min_measures={"lo": "x"},
        max_measures={"hi": "x"},
        handle_deletes=True,
    )
    twin.refresh()
    assert got == {
        (r.a, r.b, r.n, r.s)
        for r in twin.read().select("a", "b", "n", "s").collect()
    }
