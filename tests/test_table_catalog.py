"""Round-10 multi-table transactional catalog
(plans/table_catalog.TableCatalog): atomic commits spanning tables via
WAP branches + an intent log + one catalog CAS; snapshot-consistent
cross-table reads; crash recovery; abort; conflict surfacing.
"""

from __future__ import annotations

import json
import os

import pytest

from unity_to_bigquery_spark.plans.table_catalog import (
    CatalogError,
    TableCatalog,
)


def _df(spark, pairs, schema="k INT, v STRING"):
    return spark.createDataFrame(pairs, schema)


@pytest.fixture()
def cat(spark, tmp_path):
    return TableCatalog(spark, str(tmp_path / "cat"))


def _counts(cat, ver=None):
    return (
        cat.read("t1", ver).count(),
        cat.read("t2", ver).count(),
    )


def test_two_table_commit_is_atomic_through_catalog(spark, cat):
    cat.create_table("t1")
    cat.create_table("t2")
    tx = cat.transaction()
    tx.write("t1").commit_append(_df(spark, [(1, "a"), (2, "b")]))
    tx.write("t2").commit_append(_df(spark, [(9, "z")]))
    # catalog readers see NOTHING before the commit point
    with pytest.raises(CatalogError, match="empty"):
        cat.read("t1")
    v = tx.commit()
    assert v == cat.latest_version()
    assert _counts(cat) == (2, 1)
    # time travel to the pre-txn catalog version still refuses (empty)
    with pytest.raises(CatalogError, match="empty"):
        cat.read("t1", v - 1)


def test_second_txn_and_catalog_time_travel(spark, cat):
    cat.create_table("t1")
    cat.create_table("t2")
    tx = cat.transaction()
    tx.write("t1").commit_append(_df(spark, [(1, "a"), (2, "b")]))
    tx.write("t2").commit_append(_df(spark, [(9, "z")]))
    v1 = tx.commit()
    tx2 = cat.transaction()
    tx2.write("t1").commit_delete_where(_df(spark, [(1, "")]) .select("k"), "k")
    tx2.write("t2").commit_append(_df(spark, [(8, "y")]))
    v2 = tx2.commit()
    assert _counts(cat, v1) == (2, 1)  # old consistent world intact
    assert _counts(cat, v2) == (1, 2)  # new consistent world
    assert cat.entry(v2)["txn_id"] == tx2.txn_id


def test_abort_leaves_nothing(spark, cat):
    cat.create_table("t1")
    tx = cat.transaction()
    tx.write("t1").commit_append(_df(spark, [(1, "a")]))
    tx.abort()
    assert cat.table("t1").latest_version() == 0
    assert cat.table("t1").branches() == {}
    with pytest.raises(CatalogError):
        tx.write("t1")


def test_crash_between_publishes_recovers(spark, cat):
    """Crash simulated mid-commit: intent written, ONE of two tables
    published. Catalog readers still see the pre-txn world; recover()
    completes the publish + catalog CAS; a second recover no-ops."""
    cat.create_table("t1")
    cat.create_table("t2")
    tx = cat.transaction()
    tx.write("t1").commit_append(_df(spark, [(1, "a")]))
    tx.write("t2").commit_append(_df(spark, [(9, "z")]))
    v1 = tx.commit()
    tx2 = cat.transaction()
    tx2.write("t1").commit_append(_df(spark, [(3, "c")]))
    tx2.write("t2").commit_append(_df(spark, [(7, "x")]))
    # ---- replay commit() by hand, crashing after the first publish
    ip = cat._intent_path(tx2.txn_id)
    with open(ip, "x") as fh:
        json.dump({"txn_id": tx2.txn_id, "tables": tx2._staged}, fh)
    first = sorted(tx2._staged)[0]
    cat.table(first).publish_branch(tx2._staged[first])
    # ---- catalog view: still the v1 world on BOTH tables
    assert _counts(cat) == (1, 1)
    done = cat.recover()
    assert done == [tx2.txn_id]
    assert _counts(cat) == (2, 2)
    assert cat.entry()["txn_id"] == tx2.txn_id
    assert not os.path.exists(ip)
    assert cat.recover() == []  # idempotent
    assert _counts(cat, v1) == (1, 1)


def test_crash_after_catalog_cas_recovers(spark, cat):
    """Crash between the catalog CAS and intent removal: recover()
    sees the txn id already landed and only GCs the intent."""
    cat.create_table("t1")
    tx = cat.transaction()
    tx.write("t1").commit_append(_df(spark, [(1, "a")]))
    v = tx.commit()
    # resurrect the intent as if the removal was lost
    with open(cat._intent_path(tx.txn_id), "x") as fh:
        json.dump({"txn_id": tx.txn_id, "tables": {"t1": "txn-" + tx.txn_id}}, fh)
    assert cat.recover() == [tx.txn_id]
    assert cat.latest_version() == v  # no double catalog commit
    assert cat.read("t1").count() == 1


def test_sync_adopts_direct_writes(spark, cat):
    cat.create_table("t1")
    cat.table("t1").commit_append(_df(spark, [(1, "a")]))
    with pytest.raises(CatalogError, match="empty"):
        cat.read("t1")  # direct write not catalog-visible
    cat.sync("t1")
    assert cat.read("t1").count() == 1


def test_conflicting_rewrite_surfaces_loudly(spark, cat):
    """A non-append txn racing a moved main raises instead of landing
    a torn state silently."""
    from unity_to_bigquery_spark.plans.versioned import ConcurrentWriteError

    cat.create_table("t1")
    cat.table("t1").commit_append(_df(spark, [(1, "a"), (2, "b")]))
    cat.sync()
    tx = cat.transaction()
    tx.write("t1").commit_delete_where(_df(spark, [(1, "")]).select("k"), "k")
    # main moves AFTER the fork, before the commit
    cat.table("t1").commit_delete_where(_df(spark, [(2, "")]).select("k"), "k")
    with pytest.raises(ConcurrentWriteError):
        tx.commit()
    # the intent keeps the txn visible for ops; abort-and-rebase path:
    os.remove(cat._intent_path(tx.txn_id))
    tx._done = False
    tx.abort()
    assert cat.table("t1").branches() == {}


def test_unknown_and_bad_names(spark, cat):
    with pytest.raises(CatalogError, match="unknown"):
        cat.table("nope")
    with pytest.raises(CatalogError, match="bad table name"):
        cat.create_table("../evil")
    tx = cat.transaction()
    with pytest.raises(CatalogError, match="empty transaction"):
        tx.commit()


def test_transaction_aligned_cdc(spark, cat):
    """catalog.changes(name, cv1, cv2) returns exactly the committed
    transactions' deltas per table — never a half-transaction, empty
    for a table untouched in the window."""
    cat.create_table("t1")
    cat.create_table("t2")
    tx = cat.transaction()
    tx.write("t1").commit_append(_df(spark, [(1, "a"), (2, "b")]))
    tx.write("t2").commit_append(_df(spark, [(9, "z")]))
    v1 = tx.commit()
    tx2 = cat.transaction()
    tx2.write("t1").commit_delete_where(_df(spark, [(1, "")]).select("k"), "k")
    v2 = tx2.commit()
    # window (0, v1]: the ingest deltas
    assert cat.changes("t1", 0, v1).count() == 2
    assert cat.changes("t2", 0, v1).count() == 1
    # window (v1, v2]: t1 retracts one row; t2 untouched -> empty
    feed = cat.changes("t1", v1, v2, with_type=True).collect()
    assert [(r.k, r._change_type) for r in feed] == [(1, "delete")]
    assert cat.changes("t2", v1, v2, with_type=True).count() == 0
    # a direct (uncataloged) write is NOT in any catalog window
    cat.table("t2").commit_append(_df(spark, [(7, "w")]))
    assert cat.changes("t2", 0, cat.latest_version()).count() == 1


def test_catalog_entry_write_is_atomic_and_tmp_tolerant(spark, cat):
    """Catalog entries land via write-temp + os.link (ADVICE r10): a
    stray temp file from a crashed commit must be invisible to
    latest_version()/entry()/recover(), and committed entries are
    always complete JSON."""
    import json as _json
    import os as _os

    cat.create_table("t1")
    tx = cat.transaction()
    tx.write("t1").commit_append(spark.createDataFrame([(1,)], "k INT"))
    tx.commit()
    v = cat.latest_version()
    # simulate a crash that left a temp payload behind
    log_dir = _os.path.join(cat.root, "catalog-log")
    stray = _os.path.join(log_dir, f"{v + 1:020d}.json.tmp-dead-beef")
    with open(stray, "w") as fh:
        fh.write('{"version":')  # truncated JSON
    assert cat.latest_version() == v
    e = cat.entry()
    assert e["version"] == v and "t1" in e["tables"]
    cat.recover()  # must not trip over the stray
    # every committed entry parses
    for n in _os.listdir(log_dir):
        if n.endswith(".json"):
            with open(_os.path.join(log_dir, n)) as fh:
                _json.load(fh)


def test_catalog_txn_sink_replay_noop_and_recover(spark, cat, tmp_path):
    """catalog_txn_sink unit semantics without a real stream: a batch
    lands both tables + one catalog CAS; re-invoking with the same
    batch_id no-ops; a crash between publishes is finished by the next
    batch's recover-first step and the replay skips."""
    import json as _json

    import pyspark.sql.functions as F

    from unity_to_bigquery_spark.streaming.stream import catalog_txn_sink

    cat.create_table("ev")
    cat.create_table("od")
    writes = {
        "ev": lambda b: b.filter(F.col("k") % 2 == 0),
        "od": lambda b: b.filter(F.col("k") % 2 == 1),
    }
    sink = catalog_txn_sink(cat, "app", writes)
    b0 = spark.createDataFrame([(i, f"v{i}") for i in range(6)], "k INT, v STRING")
    sink(b0, 0)
    v1 = cat.latest_version()
    assert cat.read("ev").count() == 3 and cat.read("od").count() == 3
    sink(b0, 0)  # replay: no new catalog version, no double rows
    assert cat.latest_version() == v1
    assert cat.read("ev").count() == 3
    # crash between publishes on batch 1
    def injector(tx, batch_id):
        with open(cat._intent_path(tx.txn_id), "x") as fh:
            _json.dump({"txn_id": tx.txn_id, "tables": tx._staged}, fh)
        first = next(iter(tx._staged))
        cat.table(first).publish_branch(tx._staged[first])
        raise RuntimeError("boom")

    faulty = catalog_txn_sink(cat, "app", writes, fault_injection=injector)
    b1 = spark.createDataFrame([(10, "x"), (11, "y")], "k INT, v STRING")
    with pytest.raises(RuntimeError, match="boom"):
        faulty(b1, 1)
    assert cat.latest_version() == v1  # torn state catalog-invisible
    # replayed batch: recover-first completes the txn, then skips
    sink(b1, 1)
    assert cat.read("ev").count() == 4 and cat.read("od").count() == 4
    v2 = cat.latest_version()
    sink(b1, 1)  # and a second replay is a pure no-op
    assert cat.latest_version() == v2
    # validation
    with pytest.raises(ValueError, match=">= 2 member tables"):
        catalog_txn_sink(cat, "app", {"ev": lambda b: b})


def test_tables_drop_and_expire_entries(spark, cat):
    cat.create_table("t1")
    cat.create_table("t2")
    tx = cat.transaction()
    tx.write("t1").commit_append(_df(spark, [(1, "a")]))
    tx.write("t2").commit_append(_df(spark, [(2, "b")]))
    v = tx.commit()
    assert cat.tables() == ["t1", "t2"]
    # drop: pin removed, files remain, old versions still travel
    cat.drop_table("t2")
    assert cat.tables() == ["t1"]
    with pytest.raises(CatalogError, match="not in catalog"):
        cat.read("t2")
    assert cat.tables(v) == ["t1", "t2"]  # time travel pre-drop
    assert cat.read("t2", v).count() == 1
    with pytest.raises(CatalogError, match="unknown"):
        cat.drop_table("t2")
    # re-register after drop works
    cat.create_table("t2")
    assert cat.tables() == ["t1", "t2"]
    # expiration: old entries gone, latest + horizon survive
    for i in range(4):
        cat.sync("t1")
    latest = cat.latest_version()
    dropped = cat.expire_entries(keep_last=2)
    assert dropped and latest not in dropped
    assert cat.entry()["version"] == latest
    assert cat.tables() == ["t1", "t2"]
    with pytest.raises(CatalogError, match="no catalog version"):
        cat.entry(dropped[0])
    with pytest.raises(ValueError, match=">= 1"):
        cat.expire_entries(0)


def test_recover_skips_dropped_table_intents(spark, cat):
    """ADVICE r11: a pending intent naming a since-dropped table must
    not wedge recover() (catalog_txn_sink calls it every micro-batch).
    The dropped member is skipped, surviving members still publish, the
    txn id still lands (replay-skip intact), the intent file clears."""
    cat.create_table("t1")
    cat.create_table("t2")
    tx = cat.transaction()
    tx.write("t1").commit_append(_df(spark, [(1, "a")]))
    tx.write("t2").commit_append(_df(spark, [(9, "z")]))
    tx.commit()
    # crash mid-commit: intent written, nothing published yet
    tx2 = cat.transaction()
    tx2.write("t1").commit_append(_df(spark, [(3, "c")]))
    tx2.write("t2").commit_append(_df(spark, [(7, "x")]))
    ip = cat._intent_path(tx2.txn_id)
    with open(ip, "x") as fh:
        json.dump({"txn_id": tx2.txn_id, "tables": tx2._staged}, fh)
    cat.drop_table("t2")
    done = cat.recover()  # pre-fix: raised CatalogError forever
    assert done == [tx2.txn_id]
    assert not os.path.exists(ip)
    assert cat.entry()["txn_id"] == tx2.txn_id  # replay-skip preserved
    assert cat.read("t1").count() == 2  # surviving member published
    assert cat.tables() == ["t1"]
    assert cat.recover() == []  # idempotent, still no wedge

    # all-members-dropped intent: empty-pins CAS still records the txn
    cat.create_table("t3")
    cat.create_table("t4")
    tx3 = cat.transaction()
    tx3.write("t3").commit_append(_df(spark, [(5, "e")]))
    tx3.write("t4").commit_append(_df(spark, [(6, "f")]))
    ip3 = cat._intent_path(tx3.txn_id)
    with open(ip3, "x") as fh:
        json.dump({"txn_id": tx3.txn_id, "tables": tx3._staged}, fh)
    cat.drop_table("t3")
    cat.drop_table("t4")
    assert cat.recover() == [tx3.txn_id]
    assert cat.entry()["txn_id"] == tx3.txn_id
    assert not os.path.exists(ip3)


# ---- round 13: catalog SQL front door (VERDICT r12 #6) -----------------------


def _sql_cat(spark, tmp_path):
    from unity_to_bigquery_spark.plans.table_catalog import TableCatalog

    cat = TableCatalog(spark, str(tmp_path / "sqlcat"))
    cat.execute_sql("CREATE TABLE users")
    cat.table("users").commit_append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "uid INT, name STRING"
        )
    )
    cat.sync("users")
    return cat


def test_catalog_sql_ctas_and_dml(spark, tmp_path):
    from unity_to_bigquery_spark.plans.table_catalog import CatalogError

    cat = _sql_cat(spark, tmp_path)
    cat.execute_sql("CREATE TABLE vips AS SELECT uid, name FROM users WHERE uid >= 2")
    assert sorted((r.uid, r.name) for r in cat.read("vips").collect()) == [
        (2, "b"), (3, "c"),
    ]
    cat.execute_sql("INSERT INTO vips SELECT uid, 'x' AS name FROM users WHERE uid = 1")
    cat.execute_sql("UPDATE vips SET name = upper(name) WHERE uid = 2")
    cat.execute_sql("DELETE FROM vips WHERE uid = 3")
    assert sorted((r.uid, r.name) for r in cat.read("vips").collect()) == [
        (1, "x"), (2, "B"),
    ]
    # MERGE resolves USING from the catalog; unaliased names reference
    cat.execute_sql(
        "MERGE INTO vips USING users ON vips.uid = users.uid "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert cat.read("vips").count() == 3
    # SELECT front door + grammar rejections
    assert cat.execute_sql("SELECT COUNT(*) AS n FROM vips").first().n == 3
    with pytest.raises(CatalogError, match="already exists"):
        cat.execute_sql("CREATE TABLE users")
    cat.execute_sql("CREATE TABLE IF NOT EXISTS users")  # idempotent form
    with pytest.raises(CatalogError, match="unknown table"):
        cat.execute_sql("DROP TABLE nope")
    cat.execute_sql("DROP TABLE IF EXISTS nope")  # no-op form
    cat.execute_sql("DROP TABLE vips")
    assert "vips" not in cat.tables()


def test_catalog_sql_ctas_snapshot_consistency(spark, tmp_path):
    """CTAS reads the catalog PINS — a direct (unsynced) write is
    invisible to it, exactly the snapshot-consistent-read contract."""
    cat = _sql_cat(spark, tmp_path)
    cat.table("users").commit_append(
        spark.createDataFrame([(99, "direct")], "uid INT, name STRING")
    )  # no sync: catalog still pins the 3-row version
    cat.execute_sql("CREATE TABLE snap AS SELECT uid FROM users")
    assert cat.read("snap").count() == 3
    cat.sync("users")
    cat.execute_sql("CREATE TABLE snap2 AS SELECT uid FROM users")
    assert cat.read("snap2").count() == 4


def test_catalog_sql_script_txn(spark, tmp_path):
    from unity_to_bigquery_spark.plans.table_catalog import CatalogError

    cat = _sql_cat(spark, tmp_path)
    cat.execute_sql("CREATE TABLE audit AS SELECT uid FROM users WHERE uid = 1")
    v0 = cat.latest_version()
    res = cat.execute_script(
        "BEGIN; DELETE FROM users WHERE uid = 2; "
        "INSERT INTO audit (uid) VALUES (2); COMMIT"
    )
    # one catalog commit for the whole transaction
    assert cat.latest_version() == v0 + 1 and res[-1] == v0 + 1
    assert cat.read("users").count() == 2 and cat.read("audit").count() == 2
    # rollback leaves nothing
    cat.execute_script("BEGIN; DELETE FROM users WHERE uid >= 0; ROLLBACK")
    assert cat.read("users").count() == 2
    # unterminated transaction aborts loudly
    with pytest.raises(CatalogError, match="open transaction"):
        cat.execute_script("BEGIN; DELETE FROM users WHERE uid = 1")
    assert cat.read("users").count() == 2
    with pytest.raises(CatalogError, match="COMMIT without BEGIN"):
        cat.execute_script("COMMIT")
    # a ';' inside a string literal never splits
    cat.execute_sql("CREATE TABLE notes AS SELECT uid, 'x' AS s FROM users")
    cat.execute_script("UPDATE notes SET s = 'a;b' WHERE uid = 1")
    assert cat.read("notes").filter("uid = 1").first().s == "a;b"


# ---- round 13: MV serving through the catalog SELECT front door --------------


def test_catalog_select_serves_from_attached_view(spark, tmp_path):
    import pyspark.sql.functions as F

    from unity_to_bigquery_spark.plans.incremental_agg import (
        ContinuousAggregate,
    )
    from unity_to_bigquery_spark.plans.table_catalog import TableCatalog

    cat = TableCatalog(spark, str(tmp_path / "cat"))
    cat.create_table("ev")
    t = cat.table("ev")
    t.commit_append(
        spark.createDataFrame(
            [("a", 1.0), ("b", 2.0), ("a", 3.0)], "k STRING, x DOUBLE"
        )
    )
    cat.sync("ev")
    agg = ContinuousAggregate(
        spark, t, str(tmp_path / "agg"), "k",
        measures={"s": "x"}, handle_deletes=True,
    )
    agg.refresh()
    cat.attach_view("ev_by_k", "ev", agg)
    sql = "SELECT k, COUNT(*) AS n, SUM(x) AS s FROM ev GROUP BY k"
    served = cat.execute_sql(sql)
    assert {(r.k, r.n, r.s) for r in served.collect()} == {
        ("a", 2, 4000000), ("b", 1, 2000000)
    }
    # head moves PAST the pin: the served answer stays AT THE PIN
    # (snapshot consistency), not at the live head
    t.commit_append(spark.createDataFrame([("a", 9.0)], "k STRING, x DOUBLE"))
    pinned = {(r.k, r.n) for r in cat.execute_sql(sql).collect()}
    assert pinned == {("a", 2), ("b", 1)}  # unsynced commit invisible
    cat.sync("ev")
    fresh = {(r.k, r.n) for r in cat.execute_sql(sql).collect()}
    assert fresh == {("a", 3), ("b", 1)}  # pin advanced, fold catches up
    # view bookmark PAST the pin -> falls back to the pinned scan with
    # the same answer (never wrong, only slower)
    t.commit_append(spark.createDataFrame([("c", 1.0)], "k STRING, x DOUBLE"))
    agg.refresh()  # bookmark now ahead of the catalog pin
    assert agg.last_refreshed() > cat.entry()["tables"]["ev"]
    again = {(r.k, r.n) for r in cat.execute_sql(sql).collect()}
    assert again == fresh
    # non-matching shape still runs over pinned views
    assert cat.execute_sql("SELECT COUNT(*) AS n FROM ev").first().n == 4


def test_catalog_show_and_describe(spark, tmp_path):
    from unity_to_bigquery_spark.plans.table_catalog import (
        CatalogError,
        TableCatalog,
    )

    cat = _sql_cat(spark, tmp_path)
    rows = cat.execute_sql("SHOW TABLES").collect()
    assert [(r.table_name,) for r in rows] == [("users",)]
    assert rows[0].pinned_version >= 1
    sch = {
        (r.col_name, r.data_type)
        for r in cat.execute_sql("DESCRIBE users").collect()
    }
    assert sch == {("uid", "int"), ("name", "string")}
    hist = cat.execute_sql("DESCRIBE HISTORY users").collect()
    assert [r.version for r in hist][-1] == 1 and hist[-1].op == "append"
    # never-written tables describe as empty, not an error
    cat.execute_sql("CREATE TABLE empty_t")
    assert cat.execute_sql("DESCRIBE empty_t").count() == 0
    with pytest.raises(CatalogError, match="unknown table"):
        cat.execute_sql("DESCRIBE nope")
    with pytest.raises(CatalogError, match="SHOW TABLES"):
        cat.execute_sql("SHOW PARTITIONS users")
