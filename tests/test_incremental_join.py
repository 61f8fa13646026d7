"""Round-10 incremental JOIN-view maintenance
(plans/incremental_join.IncrementalJoinView): a materialized A ⋈ B
kept exact under both sides' mutations via per-side net-CDC folds and
atomic key-scoped replaces — differential against a recomputed join
after every refresh, plus the multi-source exactly-once /
crash-between-steps contracts.
"""

from __future__ import annotations

import pytest

from unity_to_bigquery_spark.plans.incremental_join import IncrementalJoinView
from unity_to_bigquery_spark.plans.versioned import VersionedTable


@pytest.fixture()
def roots(tmp_path):
    return (str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "v"))


def _orders(spark, rows):
    return spark.createDataFrame(rows, "ok INT, cust INT, amt INT")


def _cust(spark, rows):
    return spark.createDataFrame(rows, "ck INT, seg STRING")


def _mk(spark, roots):
    a = VersionedTable(spark, roots[0])
    b = VersionedTable(spark, roots[1])
    v = IncrementalJoinView(
        spark, a, "ok", b, "ck", on=("cust", "ck"), root=roots[2]
    )
    return a, b, v


def _assert_view_exact(v):
    """view ≡ recomputed inner join of the two live snapshots."""
    da, db = v.a.read(), v.b.read()
    want = da.join(db, da["cust"] == db["ck"]).select(
        "ok", "cust", "amt", "ck", "seg"
    )
    got = v.read().select("ok", "cust", "amt", "ck", "seg")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_two_sided_gauntlet_matches_recompute(spark, roots):
    a, b, v = _mk(spark, roots)
    a.commit_append(_orders(spark, [(1, 10, 5), (2, 20, 7), (3, 10, 9)]))
    b.commit_append(_cust(spark, [(10, "x"), (20, "y"), (30, "z")]))
    v.refresh()
    _assert_view_exact(v)
    # A-side append + update (merge)
    a.merge_upsert(_orders(spark, [(2, 30, 8), (4, 20, 1)]), "ok")
    v.refresh()
    _assert_view_exact(v)
    # B-side update touches every order of that customer
    b.merge_upsert(_cust(spark, [(10, "VIP")]), "ck")
    v.refresh()
    _assert_view_exact(v)
    # deletes on both sides
    a.commit_delete_where(
        spark.createDataFrame([(1,)], "ok INT"), "ok"
    )
    b.commit_delete_where(
        spark.createDataFrame([(20,)], "ck INT"), "ck"
    )
    v.refresh()
    _assert_view_exact(v)
    # dangling A row (cust 30 deleted? no — cust 20): order 4 must be gone
    assert v.read().filter("ok = 4").count() == 0


def test_n_to_m_join(spark, roots):
    """View identity is the key PAIR — duplicate join values on both
    sides produce the full cross slice and retract it exactly. B's key
    is ck but the join runs on the non-unique grp column."""
    a = VersionedTable(spark, roots[0])
    a.commit_append(_orders(spark, [(1, 10, 1), (2, 10, 2)]))
    b2 = VersionedTable(spark, roots[1])
    b2.commit_append(
        spark.createDataFrame(
            [(100, 10, "p"), (101, 10, "q")], "ck INT, grp INT, seg STRING"
        )
    )
    vb = IncrementalJoinView(
        spark, a, "ok", b2, "ck", on=("cust", "grp"), root=roots[2]
    )
    vb.refresh()
    assert vb.read().count() == 4  # 2 orders × 2 matching customers
    # retract one B row: exactly its two pairs disappear
    b2.commit_delete_where(spark.createDataFrame([(101,)], "ck INT"), "ck")
    vb.refresh()
    rows = {(r.ok, r.ck) for r in vb.read().collect()}
    assert rows == {(1, 100), (2, 100)}


def test_crash_between_steps_is_consistent(spark, roots):
    """After folding only side A, the view equals A@new ⋈ B@bookmark —
    a real (older-on-one-side) state; the next refresh completes."""
    a, b, v = _mk(spark, roots)
    a.commit_append(_orders(spark, [(1, 10, 5)]))
    b.commit_append(_cust(spark, [(10, "x")]))
    v.refresh()
    a.commit_append(_orders(spark, [(2, 20, 6)]))
    b.commit_append(_cust(spark, [(20, "y")]))
    # simulate the crash: fold ONLY the A step
    last_a, last_b = v.last_refreshed()
    v._fold_side(
        a, "ok", last_a, a.latest_version(),
        pinned=v._snapshot(b, last_b), a_side=True,
        txn=("ivjoin-a", a.latest_version()),
    )
    mid = {(r.ok, r.ck) for r in v.read().collect()}
    assert mid == {(1, 10)}  # order 2 joined against B@v1: no partner yet
    va, vb_ = v.last_refreshed()
    assert va == a.latest_version() and vb_ == last_b
    v.refresh()  # completes side B
    assert {(r.ok, r.ck) for r in v.read().collect()} == {(1, 10), (2, 20)}


def test_replay_and_noop(spark, roots):
    a, b, v = _mk(spark, roots)
    a.commit_append(_orders(spark, [(1, 10, 5)]))
    b.commit_append(_cust(spark, [(10, "x")]))
    v.refresh()
    ver = v.view.latest_version()
    v.refresh()
    v.refresh()
    assert v.view.latest_version() == ver  # no-op refreshes commit nothing
    assert v.last_refreshed() == (1, 1)


def test_pure_delete_page(spark, roots):
    a, b, v = _mk(spark, roots)
    a.commit_append(_orders(spark, [(1, 10, 5), (2, 10, 6)]))
    b.commit_append(_cust(spark, [(10, "x")]))
    v.refresh()
    a.commit_delete_where(spark.createDataFrame([(1,), (2,)], "ok INT"), "ok")
    v.refresh()
    assert v.read().count() == 0
    _assert_view_exact(v)


def test_paged_backlog(spark, roots):
    a, b, v = _mk(spark, roots)
    b.commit_append(_cust(spark, [(10, "x"), (20, "y")]))
    for i in range(1, 6):
        a.commit_append(_orders(spark, [(i, 10 if i % 2 else 20, i)]))
    a.commit_delete_where(spark.createDataFrame([(3,)], "ok INT"), "ok")
    v.refresh(max_commits=2)  # 6 A-commits fold in 3 pages
    _assert_view_exact(v)
    assert v.last_refreshed() == (6, 1)


def test_disjoint_columns_enforced(spark, roots):
    a = VersionedTable(spark, roots[0])
    b = VersionedTable(spark, roots[1])
    a.commit_append(spark.createDataFrame([(1, 2, "dup")], "ok INT, cust INT, seg STRING"))
    b.commit_append(_cust(spark, [(2, "x")]))
    v = IncrementalJoinView(
        spark, a, "ok", b, "ck", on=("cust", "ck"), root=roots[2]
    )
    with pytest.raises(ValueError, match="disjoint"):
        v.refresh()


def test_join_view_streaming_maintenance_equals_batch(spark, tmp_path):
    """Round-10 streaming twin: one CDC stream per side drives
    join_view_cdc_maintenance_sink; interleaved appends, a merge, and
    deletes on both sides arriving across two drains leave the view
    identical to a recomputed join of the final snapshots — and a
    replayed stale batch no-ops."""
    from unity_to_bigquery_spark.sources.versioned_stream import register
    from unity_to_bigquery_spark.streaming.stream import (
        join_view_cdc_maintenance_sink,
    )

    register(spark)
    a = VersionedTable(spark, str(tmp_path / "a"))
    b = VersionedTable(spark, str(tmp_path / "b"))
    v = IncrementalJoinView(
        spark, a, "ok", b, "ck", on=("cust", "ck"), root=str(tmp_path / "v")
    )
    sink_a = join_view_cdc_maintenance_sink(v, "a")
    sink_b = join_view_cdc_maintenance_sink(v, "b")

    def drain(t, sink, ckpt):
        q = (
            spark.readStream.format("versioned_table")
            .option("path", t.root)
            .option("emit_change_types", "true")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    a.commit_append(_orders(spark, [(1, 10, 5), (2, 20, 7)]))
    b.commit_append(_cust(spark, [(10, "x"), (20, "y")]))
    drain(a, sink_a, "ck_a")
    drain(b, sink_b, "ck_b")
    _assert_view_exact(v)

    # mid-stream mutations on both sides, delivered by a second drain
    a.merge_upsert(_orders(spark, [(2, 10, 8), (3, 20, 9)]), "ok")
    b.commit_delete_where(spark.createDataFrame([(20,)], "ck INT"), "ck")
    drain(a, sink_a, "ck_a")
    drain(b, sink_b, "ck_b")
    _assert_view_exact(v)
    assert v.last_refreshed() == (a.latest_version(), b.latest_version())

    # replayed stale batch (already-folded window) must no-op
    ver = v.view.latest_version()
    stale = a.changes_with_type(0, 1)
    sink_a(stale, 99)
    assert v.view.latest_version() == ver


def test_refresh_defers_fold_until_other_side_exists(spark, roots):
    """One side streams commits before the other has EVER committed (a
    legitimate startup order for two per-side CDC streams): refresh()
    must defer that side's fold — bookmark unchanged, no crash on the
    schemaless opposite manifest — then catch up once the other side
    commits (ADVICE r10)."""
    a, b, v = _mk(spark, roots)
    a.commit_append(_orders(spark, [(1, 10, 5), (2, 20, 7)]))
    assert v.refresh() == (0, 0)  # deferred, not crashed
    assert v.last_refreshed() == (0, 0)
    # same through the streaming-sink pin path
    assert v.refresh(to_a=1) == (0, 0)
    b.commit_append(_cust(spark, [(10, "x")]))
    assert v.refresh() == (1, 1)
    _assert_view_exact(v)
    got = v.read().select("ok", "cust", "amt", "ck", "seg").collect()
    assert len(got) == 1 and got[0].ok == 1


def test_join_view_concurrent_two_stream_maintenance(spark, tmp_path):
    """ADVICE r10 #2 closed FOR REAL: BOTH per-side CDC streams run
    LIVE SIMULTANEOUSLY (processingTime triggers), so two foreachBatch
    threads invoke refresh() on the shared view concurrently — the
    instance lock must serialize commit staging; the drained view must
    equal a recomputed join (no torn per-file stats, no lost folds)."""
    import time

    from unity_to_bigquery_spark.sources.versioned_stream import register
    from unity_to_bigquery_spark.streaming.stream import (
        join_view_cdc_maintenance_sink,
    )

    register(spark)
    a = VersionedTable(spark, str(tmp_path / "a"))
    b = VersionedTable(spark, str(tmp_path / "b"))
    v = IncrementalJoinView(
        spark, a, "ok", b, "ck", on=("cust", "ck"), root=str(tmp_path / "v")
    )

    def start(t, side, ckpt):
        return (
            spark.readStream.format("versioned_table")
            .option("path", t.root)
            .option("emit_change_types", "true")
            .option("max_versions_per_batch", "1")  # many small batches
            .load()
            .writeStream.foreachBatch(join_view_cdc_maintenance_sink(v, side))
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(processingTime="1 second")
            .start()
        )

    # seed so the empty-side deferral doesn't serialize the start
    a.commit_append(_orders(spark, [(1, 10, 5)]))
    b.commit_append(_cust(spark, [(10, "x")]))
    qa = start(a, "a", "ck_a")
    qb = start(b, "b", "ck_b")
    try:
        # interleaved mutation waves on both sides WHILE both run
        for i in range(3):
            a.commit_append(_orders(spark, [(10 + i, 10, i), (20 + i, 20, i)]))
            b.merge_upsert(_cust(spark, [(20, f"seg{i}")]), "ck")
            a.commit_delete_where(
                spark.createDataFrame([(10 + i,)], "ok INT"), "ok"
            )
            time.sleep(1.5)
        b.commit_append(_cust(spark, [(30, "z")]))
        # wait until both streams drain their backlogs
        deadline = time.time() + 120
        while time.time() < deadline:
            if v.last_refreshed() == (a.latest_version(), b.latest_version()):
                break
            time.sleep(1.0)
    finally:
        qa.stop()
        qb.stop()
    assert v.last_refreshed() == (a.latest_version(), b.latest_version())
    _assert_view_exact(v)
    # manifest stats must be coherent (the race ADVICE flagged attached
    # WRONG per-file stats): every view file's recorded __nrows equals
    # its real parquet row count
    import os

    import pyarrow.parquet as pq

    m = v.view.manifest()
    for f in m["files"]:
        real = pq.ParquetFile(
            os.path.join(v.view.root, "data", f)
        ).metadata.num_rows
        assert m["stats"][f]["__nrows"] == real, f
