"""Round-12 optimistic conflict resolution (VERDICT r11 #1):
merge/update_where/delete_rows_where/compact no longer abort on ANY
concurrent commit — interleaved commits that are provably disjoint from
the op's read/write set (by manifest stats) REBASE the staged files
onto the new head with zero recompute, Delta's commit-protocol conflict
classes re-expressed over the manifest log. Overlapping commits still
abort loudly (data wins).
"""

from __future__ import annotations

import pytest

from unity_to_bigquery_spark.plans.versioned import (
    ConcurrentWriteError,
    VersionedTable,
    when_matched_update,
    when_not_matched_insert,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, pairs, schema="k INT, v STRING"):
    # one FILE per append: the conflict tests reason about which exact
    # file a concurrent writer touched
    return spark.createDataFrame(pairs, schema).coalesce(1)


def _rows(t):
    return sorted((r.k, r.v) for r in t.read().collect())


def _race(monkeypatch, t, action, times=1):
    """Arrange for ``action()`` (a concurrent writer) to land between
    this handle's staging write and its publish."""
    orig = t._write_files
    state = {"left": times}

    def write_then_race(df, **kw):
        staged = orig(df, **kw)
        if state["left"] > 0:
            state["left"] -= 1
            action()
        return staged

    monkeypatch.setattr(t, "_write_files", write_then_race)


# ---- merge -------------------------------------------------------------------


def test_merge_rebases_over_disjoint_append(spark, root, monkeypatch):
    """The headline: an append of OTHER keys during a merge lands BOTH
    effects — no abort, no recompute."""
    t = VersionedTable(spark, root)
    t.commit_append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    _race(monkeypatch, t, lambda: VersionedTable(spark, root).commit_append(
        _df(spark, [(100, "racer")])
    ))
    t.merge(_df(spark, [(2, "B"), (5, "e")]), "k",
            [when_matched_update(), when_not_matched_insert()])
    assert _rows(t) == [(1, "a"), (2, "B"), (3, "c"), (5, "e"), (100, "racer")]
    assert t.manifest()["op"] == "merge"


def test_merge_aborts_on_overlapping_append(spark, root, monkeypatch):
    """An append whose key range intersects the merge source bounds
    must still abort (the merge should have seen those rows)."""
    t = VersionedTable(spark, root)
    t.commit_append(_df(spark, [(1, "a"), (2, "b")]))
    _race(monkeypatch, t, lambda: VersionedTable(spark, root).commit_append(
        _df(spark, [(3, "overlap")])
    ))
    with pytest.raises(ConcurrentWriteError, match="overlap the merge source"):
        t.merge(_df(spark, [(2, "B"), (5, "e")]), "k",
                [when_matched_update(), when_not_matched_insert()])
    # the racer's commit survives; the merge left nothing behind
    assert _rows(VersionedTable(spark, root)) == [(1, "a"), (2, "b"), (3, "overlap")]


def test_merge_aborts_when_touched_file_rewritten(spark, root, monkeypatch):
    t = VersionedTable(spark, root)
    t.commit_append(_df(spark, [(1, "a"), (2, "b")]))

    def concurrent_rewrite():
        VersionedTable(spark, root).update_where({"v": "'X'"}, "k = 1")

    _race(monkeypatch, t, concurrent_rewrite)
    with pytest.raises(ConcurrentWriteError, match="rewritten concurrently"):
        t.merge(_df(spark, [(2, "B")]), "k", [when_matched_update()])
    assert _rows(VersionedTable(spark, root)) == [(1, "X"), (2, "b")]


def test_merge_rebases_over_disjoint_eq_delete(spark, root, monkeypatch):
    """A concurrent equality delete whose keys can't hit the merge's
    touched files rebases; one whose keys overlap aborts."""
    t = VersionedTable(spark, root)
    t.commit_append(_df(spark, [(1, "a"), (2, "b")]))      # file A: k 1..2
    t.commit_append(_df(spark, [(100, "x"), (101, "y")]))  # file B: k 100..101
    _race(monkeypatch, t, lambda: VersionedTable(spark, root).commit_delete_where(
        spark.createDataFrame([(101,)], "k INT"), "k"
    ))
    t.merge(_df(spark, [(1, "A")]), "k", [when_matched_update()])
    assert _rows(t) == [(1, "A"), (2, "b"), (100, "x")]

    t2root = root + "_overlap"
    t2 = VersionedTable(spark, t2root)
    t2.commit_append(_df(spark, [(1, "a"), (2, "b")]))
    _race(monkeypatch, t2, lambda: VersionedTable(spark, t2root).commit_delete_where(
        spark.createDataFrame([(2,)], "k INT"), "k"
    ))
    with pytest.raises(ConcurrentWriteError, match="equality delete"):
        t2.merge(_df(spark, [(1, "A")]), "k", [when_matched_update()])


def test_merge_cdc_exact_across_rebase(spark, root, monkeypatch):
    """Sequencing/CDC across a rebase: the racer's commit and the
    rebased merge each emit exactly their own diff, in order."""
    t = VersionedTable(spark, root)
    t.commit_append(_df(spark, [(1, "a"), (2, "b")]))  # v1
    _race(monkeypatch, t, lambda: VersionedTable(spark, root).commit_append(
        _df(spark, [(100, "racer")])
    ))
    t.merge(_df(spark, [(2, "B"), (5, "e")]), "k",
            [when_matched_update(), when_not_matched_insert()])
    h = VersionedTable(spark, root)
    assert h.latest_version() == 3  # v2 = racer append, v3 = merge
    racer_feed = [(r.k, r._change_type)
                  for r in h.changes_with_type(1, 2).collect()]
    assert racer_feed == [(100, "insert")]
    merge_feed = sorted(
        (r.k, r._change_type) for r in h.changes_with_type(2, 3).collect()
    )
    # file A rewrote: 1 carries as delete+insert of equal value is NOT
    # emitted (rewrite diff) — expect update pair for 2 and insert 5
    ks = {k for k, _ in merge_feed}
    assert 100 not in ks and 5 in ks and 2 in ks
    # final state folds exactly
    assert _rows(h) == [(1, "a"), (2, "B"), (5, "e"), (100, "racer")]


def test_merge_insert_only_rebases_and_checks_keys(spark, root, monkeypatch):
    """Insert-only merges rewrite nothing; a disjoint concurrent append
    rebases, an overlapping one aborts (duplicate-insert risk)."""
    t = VersionedTable(spark, root)
    t.commit_append(_df(spark, [(1, "a")]))
    _race(monkeypatch, t, lambda: VersionedTable(spark, root).commit_append(
        _df(spark, [(100, "racer")])
    ))
    t.merge(_df(spark, [(5, "e")]), "k", [when_not_matched_insert()])
    assert _rows(t) == [(1, "a"), (5, "e"), (100, "racer")]
    _race(monkeypatch, t, lambda: VersionedTable(spark, root).commit_append(
        _df(spark, [(6, "dup-risk")])
    ))
    with pytest.raises(ConcurrentWriteError):
        t.merge(_df(spark, [(6, "f")]), "k", [when_not_matched_insert()])


# ---- update_where / delete_rows_where ----------------------------------------


def test_update_where_rebases_over_disjoint_append(spark, root, monkeypatch):
    t = VersionedTable(spark, root)
    t.commit_append(_df(spark, [(1, "a"), (2, "b")]))
    _race(monkeypatch, t, lambda: VersionedTable(spark, root).commit_append(
        _df(spark, [(100, "racer")])
    ))
    t.update_where({"v": "upper(v)"}, "k <= 2")
    assert _rows(t) == [(1, "A"), (2, "B"), (100, "racer")]


def test_update_where_aborts_on_possibly_matching_append(spark, root, monkeypatch):
    t = VersionedTable(spark, root)
    t.commit_append(_df(spark, [(1, "a"), (2, "b")]))
    # overlapping key range
    _race(monkeypatch, t, lambda: VersionedTable(spark, root).commit_append(
        _df(spark, [(0, "in-range")])
    ))
    with pytest.raises(ConcurrentWriteError, match="may match"):
        t.update_where({"v": "upper(v)"}, "k <= 2")
    # unprunable predicate: ANY append conflicts (conservative)
    t2 = VersionedTable(spark, root + "_u")
    t2.commit_append(_df(spark, [(1, "a"), (2, "b")]))
    _race(monkeypatch, t2, lambda: VersionedTable(spark, root + "_u").commit_append(
        _df(spark, [(100, "racer")])
    ))
    with pytest.raises(ConcurrentWriteError, match="may match"):
        t2.update_where({"v": "upper(v)"}, "k % 2 = 0")


def test_delete_rows_where_rebases_over_disjoint_append(spark, root, monkeypatch):
    t = VersionedTable(spark, root)
    t.commit_append(_df(spark, [(i, "x") for i in range(10)]))
    _race(monkeypatch, t, lambda: VersionedTable(spark, root).commit_append(
        _df(spark, [(100, "racer")])
    ))
    t.delete_rows_where("k <= 4", mode="rewrite")
    assert {r.k for r in t.read().collect()} == {5, 6, 7, 8, 9, 100}


def test_update_where_aborts_on_metadata_move(spark, root, monkeypatch):
    t = VersionedTable(spark, root)
    t.commit_append(_df(spark, [(1, "a"), (2, "b")]))
    _race(monkeypatch, t, lambda: VersionedTable(spark, root).add_constraint(
        "c1", "k >= 0"
    ))
    with pytest.raises(ConcurrentWriteError, match="metadata"):
        t.update_where({"v": "upper(v)"}, "k <= 2")


# ---- compact ------------------------------------------------------------------


def test_compact_rebases_over_append(spark, root, monkeypatch):
    """OPTIMIZE no longer loses to appends: the racer's file rides
    through the rebase untouched, the compacted files replace the rest."""
    t = VersionedTable(spark, root)
    t.commit_append(_df(spark, [(1, "a")]))
    t.commit_append(_df(spark, [(2, "b")]))
    t.commit_append(_df(spark, [(3, "c")]))
    _race(monkeypatch, t, lambda: VersionedTable(spark, root).commit_append(
        _df(spark, [(100, "racer")])
    ))
    t.compact(target_files=1)
    h = VersionedTable(spark, root)
    assert _rows(h) == [(1, "a"), (2, "b"), (3, "c"), (100, "racer")]
    assert h.manifest()["op"] == "compact"
    # racer's file carried verbatim + 1 compacted file
    assert len(h.manifest()["files"]) == 2


def test_compact_aborts_on_concurrent_delete(spark, root, monkeypatch):
    """A MoR delete landing mid-compaction would silently miss the
    compacted rows (their file version postdates the delete) — abort."""
    t = VersionedTable(spark, root)
    t.commit_append(_df(spark, [(1, "a"), (2, "b")]))
    _race(monkeypatch, t, lambda: VersionedTable(spark, root).commit_delete_where(
        spark.createDataFrame([(2,)], "k INT"), "k"
    ))
    with pytest.raises(ConcurrentWriteError, match="equality delete"):
        t.compact(target_files=1)
    assert _rows(VersionedTable(spark, root)) == [(1, "a")]


def test_compact_aborts_on_concurrent_pos_delete(spark, root, monkeypatch):
    t = VersionedTable(spark, root)
    t.commit_append(_df(spark, [(1, "a"), (2, "b")]))

    def pos_delete():
        VersionedTable(spark, root).delete_rows_where("k = 2", mode="mor")

    _race(monkeypatch, t, pos_delete)
    with pytest.raises(ConcurrentWriteError, match="positional delete"):
        t.compact(target_files=1)
    assert _rows(VersionedTable(spark, root)) == [(1, "a")]


def test_rebase_chain_two_racers(spark, root, monkeypatch):
    """Two interleaved disjoint commits analyze and rebase in one
    pass; the result folds all three writers."""
    t = VersionedTable(spark, root)
    t.commit_append(_df(spark, [(1, "a"), (2, "b")]))

    def two_appends():
        h = VersionedTable(spark, root)
        h.commit_append(_df(spark, [(100, "r1")]))
        h.commit_append(_df(spark, [(200, "r2")]))

    _race(monkeypatch, t, two_appends)
    t.update_where({"v": "upper(v)"}, "k <= 2")
    assert _rows(t) == [(1, "A"), (2, "B"), (100, "r1"), (200, "r2")]


def test_live_concurrent_writers_all_land(spark, tmp_path):
    """LIVE thread concurrency (no staged race harness): disjoint
    updaters on separate key-range files plus blind appenders, all
    racing real CAS publishes — every writer's effect lands, none
    aborts, final state exact. The bounded-retry path (_MAX_REBASE)
    absorbs chained interleavings."""
    from concurrent.futures import ThreadPoolExecutor

    root = str(tmp_path / "tbl")
    t0 = VersionedTable(spark, root)
    # 4 disjoint key-range files
    for lo in (0, 100, 200, 300):
        t0.commit_append(_df(spark, [(lo + i, "x") for i in range(10)]))

    def updater(lo):
        VersionedTable(spark, root).update_where(
            {"v": f"'U{lo}'"}, f"k >= {lo} AND k <= {lo + 9}"
        )
        return lo

    def appender(i):
        VersionedTable(spark, root).commit_append(
            _df(spark, [(1000 + i, f"a{i}")])
        )
        return i

    with ThreadPoolExecutor(max_workers=6) as ex:
        futs = [ex.submit(updater, lo) for lo in (0, 100, 200, 300)]
        futs += [ex.submit(appender, i) for i in (1, 2)]
        for f in futs:
            f.result(timeout=300)  # raises if any writer aborted

    h = VersionedTable(spark, root)
    rows = {(r.k, r.v) for r in h.read().collect()}
    assert len(rows) == 42
    for lo in (0, 100, 200, 300):
        assert all((lo + i, f"U{lo}") in rows for i in range(10)), lo
    assert (1001, "a1") in rows and (1002, "a2") in rows
    assert h.latest_version() == 10  # 4 ingests + 4 updates + 2 appends


def test_big_eq_delete_key_set_uses_spark_range_check(spark, tmp_path, monkeypatch):
    """Key sets past the driver-read cap analyze via the one-job Spark
    range join instead of conflicting wholesale: disjoint big deletes
    rebase, overlapping ones abort."""
    root = str(tmp_path / "tbl")
    t = VersionedTable(spark, root)
    t.commit_append(_df(spark, [(1, "a"), (2, "b")]))      # low file
    t.commit_append(_df(spark, [(5000, "x"), (5001, "y")]))  # high file
    monkeypatch.setattr(VersionedTable, "_REBASE_EQ_KEY_CAP", 10)
    # concurrent mass delete (100 keys > cap) entirely in the HIGH range
    def racer():
        VersionedTable(spark, root).commit_delete_where(
            spark.createDataFrame([(5000 + i,) for i in range(100)], "k INT"),
            "k",
        )
    _race(monkeypatch, t, racer)
    t.update_where({"v": "upper(v)"}, "k <= 2")  # touches the LOW file only
    assert _rows(t) == [(1, "A"), (2, "B")]
    # overlapping big delete aborts
    t2root = root + "_ov"
    t2 = VersionedTable(spark, t2root)
    t2.commit_append(_df(spark, [(1, "a"), (2, "b")]))
    def racer2():
        VersionedTable(spark, t2root).commit_delete_where(
            spark.createDataFrame([(i,) for i in range(100)], "k INT"), "k"
        )
    _race(monkeypatch, t2, racer2)
    with pytest.raises(ConcurrentWriteError, match="equality delete"):
        t2.update_where({"v": "upper(v)"}, "k <= 2")


def test_dv_sidecar_vacuum_lifecycle(spark, tmp_path):
    """DV sidecars are vacuum-protected while their entry lives and
    GC'd (ungraced) once compaction sheds the entry."""
    import os as _os

    root = str(tmp_path / "tbl")
    t = VersionedTable(spark, root)
    t.commit_append(_df(spark, [(i, "x") for i in range(10)]))
    t.delete_rows_where("k IN (1, 2)")
    side = t.manifest()["pos_deletes"][0]["file"]
    path = _os.path.join(root, "data", side)
    assert _os.path.exists(path)
    t.commit_append(_df(spark, [(100, "y")]))
    t.vacuum(keep_last=1, orphan_grace_sec=0)
    assert _os.path.exists(path)  # entry live: protected
    t.compact(target_files=1)     # materializes + sheds the entry
    t.vacuum(keep_last=1, orphan_grace_sec=0)
    assert not _os.path.exists(path)
    assert sorted(r.k for r in t.read().collect()) == [0] + list(range(3, 10)) + [100]
