"""Persisted ANN index (llm/ann_index.AnnIndex — VERDICT r6 #1):
index-served ≡ in-query-trained under equal centroids, incremental
refresh ≡ full assignment, paging/idempotency/append-only contracts,
probed-cell file pruning, and the centroid-drift retrain policy.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from unity_to_bigquery_spark.catalog import load_table
from unity_to_bigquery_spark.llm.ann_index import AnnIndex
from unity_to_bigquery_spark.llm.similarity import ivf_best_cells, ivf_topk
from unity_to_bigquery_spark.plans.versioned import VersionedTable


def _build_split_index(spark, sf_dir, tmp_path, ncells=16):
    emb = load_table(spark, sf_dir, "embeddings")
    src = VersionedTable(spark, str(tmp_path / "source"))
    src.commit_append(emb.filter(F.col("vec_id") % 10 != 0))
    idx = AnnIndex(spark, str(tmp_path / "index"), src, ncells=ncells)
    idx.build()
    src.commit_append(emb.filter(F.col("vec_id") % 10 == 0))
    idx.refresh()
    return emb, src, idx


def test_index_served_equals_in_query_trained(spark, sf_dir, tmp_path):
    """THE differential the index is graded on: after build + refresh,
    serving from storage must be bit-identical to the in-query-trained
    ivf_topk under the same centroids — same probe plan, same
    assignment rule, zero training at serve time."""
    emb, _src, idx = _build_split_index(spark, sf_dir, tmp_path)
    queries = emb.filter(F.col("vec_id") < 5)
    served = sorted(map(tuple, idx.topk(queries, k=5, nprobe=4).collect()))
    fresh = sorted(
        map(
            tuple,
            ivf_topk(emb, queries, idx.centroid_frame(), k=5, nprobe=4).collect(),
        )
    )
    assert served == fresh
    assert len(served) == 5 * queries.count()


def test_refresh_equals_full_assignment_and_pages(spark, sf_dir, tmp_path):
    """Incremental refresh ≡ assigning the full corpus in one shot
    (given the fixed stored centroids) — including when the backlog is
    paged one commit at a time. src_version records each page's
    epoch."""
    emb = load_table(spark, sf_dir, "embeddings")
    src = VersionedTable(spark, str(tmp_path / "source"))
    src.commit_append(emb.filter(F.col("vec_id") % 4 == 0))
    idx = AnnIndex(spark, str(tmp_path / "index"), src, ncells=8)
    idx.build()
    for m in (1, 2, 3):
        src.commit_append(emb.filter(F.col("vec_id") % 4 == m))
    assert idx.refresh(max_commits=1) == 4  # 3 pages of 1 commit each
    got = sorted(
        (r[0], r[1], r[2])
        for r in idx.assignments.read().select("vec_id", "cell_id", "sim6").collect()
    )
    want = sorted(
        map(tuple, ivf_best_cells(emb, idx.centroid_frame()).collect())
    )
    assert got == want
    epochs = {
        r.src_version for r in idx.assignments.read().select("src_version").distinct().collect()
    }
    assert epochs == {1, 2, 3, 4}


def test_refresh_idempotent_and_contracts(spark, tmp_path):
    """Double refresh is a no-op (txn protocol); refresh before build
    and build on an empty source fail loudly; a destructive source
    commit is rejected with a retrain hint instead of silently serving
    retracted vectors."""
    src = VersionedTable(spark, str(tmp_path / "source"))
    idx = AnnIndex(spark, str(tmp_path / "index"), src, ncells=4)
    with pytest.raises(ValueError, match="empty"):
        idx.build()
    with pytest.raises(ValueError, match="build"):
        idx.refresh()
    vecs = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(40)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    src.commit_append(vecs)
    idx.build()
    assert idx.indexed_version() == 1
    assert idx.refresh() == 1  # current → no-op
    n0 = idx.assignments.read().count()
    assert idx.refresh() == 1
    assert idx.assignments.read().count() == n0 == 40

    # destructive commit now FOLDS into refresh (round 8): the stale
    # assignment row is retracted merge-on-read, no rebuild needed
    src.commit_delete_where(
        spark.createDataFrame([(3,)], "vec_id BIGINT"), "vec_id"
    )
    assert idx.refresh() == 2
    assert idx.assignments.read().count() == 39
    assert idx.assignments.read().filter(F.col("vec_id") == 3).count() == 0
    # replayed refresh is still a txn no-op
    n_commits = idx.assignments.latest_version()
    assert idx.refresh() == 2
    assert idx.assignments.latest_version() == n_commits
    # rebuild lands on the same content
    idx.build()
    assert idx.indexed_version() == 2
    assert idx.assignments.read().count() == 39


def test_topk_prunes_unprobed_cell_files(spark, sf_dir, tmp_path):
    """The 100 TB property of serving: the assignments table is
    cell-partitioned with a distinct-set index, so a probe of p cells
    must SKIP the other cells' files at the manifest — scan cost ∝
    probed cells, not corpus."""
    emb, _src, idx = _build_split_index(spark, sf_dir, tmp_path)
    total_files = len(idx.assignments.manifest()["files"])
    probed = [0, 1]  # any 2 cells of 16
    kept, skipped = idx.assignments.prune_files_eq("cell_id", probed)
    assert skipped > 0
    assert len(kept) + skipped == total_files
    assert len(kept) < total_files / 2  # 2/16 cells keeps a small slice
    # and the pruned read returns exactly those cells' rows
    got = idx.assignments.read_pruned_eq("cell_id", probed)
    assert got.filter(~F.col("cell_id").isin(probed)).count() == 0


def _clustered(spark, ids, center, spread=0.05):
    """Deterministic vectors near a center: center + small per-id
    perturbation (no RNG — perturbations derive from the id)."""
    rows = []
    for i in ids:
        v = [
            c + spread * (((i * 31 + j * 17) % 11) - 5) / 5.0
            for j, c in enumerate(center)
        ]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")


def test_drift_policy_triggers_on_distribution_shift(spark, tmp_path):
    """should_retrain compares out-of-sample epochs against each other:
    a refresh that matches the trained clusters keeps quality flat (no
    retrain), a refresh of vectors orthogonal to every centroid drops
    mean sim6 far below the first refresh epoch → retrain. Retraining
    resets the epochs and clears the trigger."""
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    shifted = [0.0, 0.0, 0.0, 1.0]
    src = VersionedTable(spark, str(tmp_path / "source"))
    src.commit_append(
        _clustered(spark, range(0, 100), a).unionByName(
            _clustered(spark, range(100, 200), b)
        )
    )
    idx = AnnIndex(spark, str(tmp_path / "index"), src, ncells=4)
    idx.build()
    assert not idx.should_retrain(min_new=50)  # no refresh epoch yet

    # refresh 1: same distribution → healthy out-of-sample baseline
    src.commit_append(
        _clustered(spark, range(200, 260), a).unionByName(
            _clustered(spark, range(260, 320), b)
        )
    )
    idx.refresh()
    assert not idx.should_retrain(min_new=50)  # single epoch: no signal

    # refresh 2: orthogonal vectors → quality collapses vs epoch 1
    src.commit_append(_clustered(spark, range(320, 440), shifted))
    idx.refresh()
    assert idx.should_retrain(min_new=50)
    # epochs below min_new never trigger by themselves
    assert not idx.should_retrain(min_new=500)

    # retrain absorbs the new distribution: epochs reset, trigger clears
    idx.build()
    epochs = idx.drift_stats().collect()
    assert len(epochs) == 1 and epochs[0].n == 440
    assert not idx.should_retrain(min_new=50)
    # and serving still matches the in-query plan on the new centroids
    emb = src.read()
    queries = emb.filter(F.col("vec_id").isin([0, 150, 400]))
    served = sorted(map(tuple, idx.topk(queries, k=3, nprobe=2).collect()))
    fresh = sorted(
        map(
            tuple,
            ivf_topk(emb, queries, idx.centroid_frame(), k=3, nprobe=2).collect(),
        )
    )
    assert served == fresh


def test_registered_query_runs(spark, sf_dir):
    """sim_index_topk (the declared-surface entry) returns k rows per
    query with the declared schema."""
    from unity_to_bigquery_spark.registry import all_queries

    df = all_queries()["sim_index_topk"].spark(spark, sf_dir)
    rows = df.collect()
    assert df.columns == ["query_id", "vec_id", "cos6", "rank"]
    assert len(rows) == 25
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_pq_index_served_equals_fresh_encode_under_stored_books(spark, sf_dir, tmp_path):
    """PqIndex differential: after build(90%) + refresh(10%), serving
    from STORED codes must be bit-identical to pq_adc_search over a
    fresh full-corpus encode under the SAME stored codebooks — i.e.
    incremental refresh ≡ full re-encode given fixed codebooks, and
    the serve plan is shared verbatim."""
    import pyspark.sql.functions as F

    from unity_to_bigquery_spark.llm.ann_index import PqIndex
    from unity_to_bigquery_spark.llm.similarity import (
        pq_adc_search,
        pq_encode,
        unit_vectors,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    src = VersionedTable(spark, str(tmp_path / "source"))
    src.commit_append(emb.filter(F.col("vec_id") % 10 != 0))
    idx = PqIndex(spark, str(tmp_path / "pq"), src, m=4, ksub=16)
    idx.build()
    src.commit_append(emb.filter(F.col("vec_id") % 10 == 0))
    assert idx.refresh() == 2
    assert idx.refresh() == 2  # idempotent no-op

    queries = emb.filter(F.col("vec_id") < 5)
    served = sorted(map(tuple, idx.topk(queries, k=5, shortlist=20).collect()))

    books = idx.codebooks.read()
    un = unit_vectors(emb).select("vec_id", F.col("__unit").alias("embedding"))
    fresh_codes = pq_encode(un, books, m=4)
    dim = emb.select(F.size("embedding")).first()[0]
    fresh = sorted(
        map(
            tuple,
            pq_adc_search(
                fresh_codes, books, emb.select("vec_id", "embedding"),
                queries, dim, k=5, m=4, shortlist=20,
            ).collect(),
        )
    )
    assert served == fresh
    assert len(served) == 25
    # codes table carries m rows per vector with the drift column
    n_vecs = emb.count()
    assert idx.codes.read().count() == 4 * n_vecs
    assert idx.codes.read().filter(F.col("err6") < 0).count() == 0


def test_pq_index_contracts_and_drift(spark, tmp_path):
    """Build/refresh contracts mirror AnnIndex; quantization-error
    drift: codebooks trained on two tight clusters quantize similar
    refreshes with flat error and orthogonal refreshes with a large
    rise -> retrain; rebuilding resets the epochs."""
    import pyspark.sql.functions as F

    from unity_to_bigquery_spark.llm.ann_index import PqIndex

    src = VersionedTable(spark, str(tmp_path / "source"))
    idx = PqIndex(spark, str(tmp_path / "pq"), src, m=4, ksub=8)
    with pytest.raises(ValueError, match="empty"):
        idx.build()
    with pytest.raises(ValueError, match="build"):
        idx.refresh()

    a = [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0]
    shifted = [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
    src.commit_append(
        _clustered(spark, range(0, 100), a).unionByName(
            _clustered(spark, range(100, 200), b)
        )
    )
    idx.build()
    assert idx.indexed_version() == 1

    src.commit_append(
        _clustered(spark, range(200, 260), a).unionByName(
            _clustered(spark, range(260, 320), b)
        )
    )
    idx.refresh()
    assert not idx.should_retrain(min_new=50)  # single refresh epoch

    src.commit_append(_clustered(spark, range(320, 440), shifted))
    idx.refresh()
    assert idx.should_retrain(min_new=50)
    assert not idx.should_retrain(min_new=500)

    # destructive commit now FOLDS into refresh (round 8): the key's m
    # stale subspace rows die merge-on-read
    src.commit_delete_where(
        spark.createDataFrame([(3,)], "vec_id BIGINT"), "vec_id"
    )
    idx.refresh()
    assert idx.codes.read().filter(F.col("vec_id") == 3).count() == 0
    assert idx.codes.read().select("vec_id").distinct().count() == 439
    idx.build()
    epochs = idx.drift_stats().collect()
    assert len(epochs) == 1 and epochs[0].n == 439
    assert not idx.should_retrain(min_new=50)


def test_streaming_index_maintenance_equals_batch(spark, sf_dir, tmp_path):
    """ann_index_ingest_sink: draining an embedding stream through the
    sink leaves the index AT the stream head with assignments equal to
    a full batch assignment under the stored centroids, and serving
    equals the in-query plan; a second drain (no new data) changes
    nothing (txn replay protection)."""
    from unity_to_bigquery_spark.llm.ann_index import AnnIndex
    from unity_to_bigquery_spark.streaming.stream import ann_index_ingest_sink

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = emb.collect()
    landing = str(tmp_path / "landing")
    for lo, hi in ((0, 200), (200, 350), (350, 500)):
        spark.createDataFrame(rows[lo:hi], emb.schema).coalesce(1).write.mode(
            "append"
        ).json(landing)

    src = VersionedTable(spark, str(tmp_path / "source"))
    idx = AnnIndex(spark, str(tmp_path / "index"), src, ncells=8)

    def drain():
        q = (
            spark.readStream.schema("vec_id BIGINT, embedding ARRAY<DOUBLE>")
            .option("maxFilesPerTrigger", "1")
            .json(landing)
            .writeStream.foreachBatch(ann_index_ingest_sink(idx, "ann-ingest"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert idx.indexed_version() == src.latest_version() >= 2
    assert src.read().count() == 500

    got = sorted(
        (r[0], r[1], r[2])
        for r in idx.assignments.read().select("vec_id", "cell_id", "sim6").collect()
    )
    want = sorted(
        map(tuple, ivf_best_cells(src.read(), idx.centroid_frame()).collect())
    )
    assert got == want

    v0 = idx.indexed_version()
    n0 = idx.assignments.read().count()
    drain()  # replay: nothing new
    assert idx.indexed_version() == v0
    assert idx.assignments.read().count() == n0 == 500

    queries = emb.filter(F.col("vec_id") < 3)
    served = sorted(map(tuple, idx.topk(queries, k=5, nprobe=3).collect()))
    fresh = sorted(
        map(
            tuple,
            ivf_topk(src.read(), queries, idx.centroid_frame(), k=5, nprobe=3).collect(),
        )
    )
    assert served == fresh


def test_compact_shrinks_files_and_preserves_serving(spark, sf_dir, tmp_path):
    """Index maintenance: compact() collapses the per-refresh file
    accrual (one file per touched cell per page) while serving stays
    bit-identical and the refresh bookmark survives (compact is a
    regular commit; the txns map carries forward)."""
    emb, src, idx = _build_split_index(spark, sf_dir, tmp_path)
    # monotone-id appends (the realistic ingest shape): the merge
    # touches zero existing files, so each refresh ADDS files per
    # touched cell — the accrual compact() exists to collapse
    base = emb.count()
    for i in range(3):
        src.commit_append(
            emb.select(
                (F.col("vec_id") + base * (i + 1)).alias("vec_id"),
                *[c for c in emb.columns if c != "vec_id"],
            ).limit(100)
        )
        idx.refresh()
    queries = emb.filter(F.col("vec_id") < 5)
    before_files = len(idx.assignments.manifest()["files"])
    before = sorted(map(tuple, idx.topk(queries, k=5, nprobe=4).collect()))
    v = idx.indexed_version()
    idx.compact()
    after_files = len(idx.assignments.manifest()["files"])
    assert after_files < before_files / 2, (before_files, after_files)
    assert idx.indexed_version() == v  # bookmark carried through compact
    after = sorted(map(tuple, idx.topk(queries, k=5, nprobe=4).collect()))
    assert after == before
    assert idx.refresh() == v  # still a no-op, not a re-fold


def test_filtered_topk_pushdown_identity_and_predicate(spark, sf_dir, tmp_path):
    """FILTERED serving (meta_cols denormalization): (1) the pruned +
    pushed-down path is bit-identical to filtering a FULL assignments
    read through the same ivf_search plan; (2) every returned neighbor
    satisfies the predicate; (3) an unfiltered serve on the same
    meta_cols index matches the plain-index differential (meta columns
    are payload, not semantics)."""
    from unity_to_bigquery_spark.llm.similarity import ivf_search, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    src = VersionedTable(spark, str(tmp_path / "source"))
    src.commit_append(emb.filter(F.col("vec_id") % 10 != 0))
    idx = AnnIndex(
        spark, str(tmp_path / "index"), src, ncells=16, meta_cols=("label",)
    )
    idx.build()
    src.commit_append(emb.filter(F.col("vec_id") % 10 == 0))
    idx.refresh()

    queries = emb.filter(F.col("vec_id") < 5)
    served = idx.topk(queries, k=5, nprobe=6, where="label % 3 = 0")
    rows = served.collect()

    # (1) identity vs an UNPRUNED full read filtered before the same plan
    full = (
        idx.assignments.read()
        .select("vec_id", "embedding", "cell_id", "label")
        .filter("label % 3 = 0")
    )
    fresh = ivf_search(full, queries, idx.centroid_frame(), k=5, nprobe=6)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, fresh.collect()))

    # (2) predicate holds on every returned neighbor
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    assert rows and all(labels[r.vec_id] % 3 == 0 for r in rows)

    # (3) unfiltered serve from the meta_cols index == plain differential
    served_all = sorted(map(tuple, idx.topk(queries, k=5, nprobe=4).collect()))
    fresh_all = sorted(
        map(
            tuple,
            ivf_topk(emb, queries, idx.centroid_frame(), k=5, nprobe=4).collect(),
        )
    )
    assert served_all == fresh_all


def test_retraction_refresh_equals_full_assignment(spark, sf_dir, tmp_path):
    """VERDICT r7 #1 done-criterion: after a window mixing equality
    deletes, positional deletes, merge updates and appends, a paged
    incremental refresh must land on EXACTLY the state a full
    assignment of the live snapshot under the stored centroids would —
    and serving is identical to the in-query path on the live corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    src = VersionedTable(spark, str(tmp_path / "source"))
    src.commit_append(emb.filter(F.col("vec_id") % 4 != 3))
    idx = AnnIndex(spark, str(tmp_path / "index"), src, ncells=8)
    idx.build()

    # a single sorted file so positional targets are deterministic
    tail = emb.filter(F.col("vec_id") % 4 == 3)
    src.commit_append(tail.orderBy("vec_id").coalesce(1))
    f_tail = [
        f for f in src.manifest()["files"]
        if f in src.manifest()["file_versions"]
        and src.manifest()["file_versions"][f] == src.latest_version()
    ]
    # equality-delete some keys, pos-delete two rows of the tail file,
    # update (merge) a few vectors to NEW embeddings, append more
    src.commit_delete_where(
        emb.filter(F.col("vec_id") % 10 == 7).select("vec_id"), "vec_id"
    )
    src.commit_delete_positions(
        spark.createDataFrame(
            [(f_tail[0], 0), (f_tail[0], 2)], "file STRING, pos BIGINT"
        )
    )
    moved = emb.filter(F.col("vec_id") < 3).withColumn(
        "embedding", F.expr("transform(embedding, x -> CAST(-x AS FLOAT))")
    )
    src.merge_upsert(moved.select(*emb.columns), "vec_id")

    # paged refresh, one commit per page, mixing append and retraction
    idx.refresh(max_commits=1)
    assert idx.indexed_version() == src.latest_version()

    got = sorted(
        (r[0], r[1], r[2])
        for r in idx.assignments.read().select("vec_id", "cell_id", "sim6").collect()
    )
    live = src.read()
    want = sorted(
        map(tuple, ivf_best_cells(live, idx.centroid_frame()).collect())
    )
    assert got == want

    # serve identity on the LIVE corpus
    queries = emb.filter(F.col("vec_id").between(5, 8))
    served = sorted(map(tuple, idx.topk(queries, k=3, nprobe=8).collect()))
    fresh = sorted(
        map(
            tuple,
            ivf_topk(live, queries, idx.centroid_frame(), k=3, nprobe=8).collect(),
        )
    )
    assert served == fresh

    # replayed refresh: txn no-op
    v_state = idx.assignments.latest_version()
    idx.refresh()
    assert idx.assignments.latest_version() == v_state


def test_auto_compact_bounds_files_over_many_refreshes(spark, tmp_path):
    """VERDICT r7 #4 (ANN side): 20 refresh pages with interleaved
    retractions keep the cell-partitioned assignments' file count ∝
    cells under the default auto_compact policy, with serving still
    equal to a full assignment of the live corpus."""
    src = VersionedTable(spark, str(tmp_path / "source"))

    def batch(lo, hi):
        return spark.createDataFrame(
            [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(4)])
             for i in range(lo, hi)],
            "vec_id BIGINT, embedding ARRAY<DOUBLE>",
        )

    src.commit_append(batch(0, 60))
    idx = AnnIndex(spark, str(tmp_path / "index"), src, ncells=4)
    idx.build()
    bound = 4 * 4  # max_files_per_partition * ncells
    for i in range(20):
        if i % 5 == 4:
            src.commit_delete_where(
                spark.range(i, i + 2).select(F.col("id").alias("vec_id")),
                "vec_id",
            )
        else:
            src.commit_append(batch(100 + i * 5, 100 + i * 5 + 5))
        idx.refresh()
        m = idx.assignments.manifest()
        assert len(m["files"]) <= bound, f"round {i}: {len(m['files'])} files"
        assert len(m.get("deletes", [])) <= 8
    got = sorted(
        (r[0], r[1], r[2])
        for r in idx.assignments.read().select("vec_id", "cell_id", "sim6").collect()
    )
    want = sorted(
        map(tuple, ivf_best_cells(src.read(), idx.centroid_frame()).collect())
    )
    assert got == want


def test_ivf2_scorer_identity_refresh_and_retraction(spark, sf_dir, tmp_path):
    """VERDICT r7 #3: AnnIndex(scorer='ivf2') builds/refreshes/serves
    through the same VersionedTables with the two-level descent — and
    under equal training (same corpus, seed, √N cells) serving is
    bit-identical to the in-query ivf2_topk. Refresh (append AND
    retraction pages) lands on exactly the descent assignment of the
    live corpus under the STORED structure."""
    from unity_to_bigquery_spark.llm.similarity import ivf2_descend, ivf2_topk

    emb = load_table(spark, sf_dir, "embeddings")
    src = VersionedTable(spark, str(tmp_path / "source"))
    src.commit_append(emb)
    idx = AnnIndex(spark, str(tmp_path / "index"), src, scorer="ivf2", seed=7)
    idx.build()

    queries = emb.filter(F.col("vec_id") < 5)
    served = sorted(map(tuple, idx.topk(queries, k=5, nprobe=8).collect()))
    fresh = sorted(
        map(tuple, ivf2_topk(emb, queries, k=5, nprobe=8, wprobe=3, seed=7).collect())
    )
    assert served == fresh
    assert len(served) == 5 * queries.count()

    # the stored structure really is two-level
    assert "coarse_id" in idx.centroids.read().columns
    n_coarse = idx.coarse.read().count()
    n_fine = idx.centroids.read().count()
    assert 4 <= n_coarse < n_fine

    # append + refresh: descent assignment of the delta under STORED
    # structures ≡ descending the whole live corpus
    src.commit_append(
        emb.select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            "embedding", *[c for c in emb.columns if c not in ("vec_id", "embedding")]
        ).limit(50)
    )
    idx.refresh()
    st = idx._scorer_state()

    def full_assign():
        return sorted(
            map(
                tuple,
                ivf2_descend(src.read(), st["coarse"], st["fine_vecs"], 3, 1)
                .select("vec_id", "cell_id", "sim6")
                .collect(),
            )
        )

    def stored():
        return sorted(
            (r[0], r[1], r[2])
            for r in idx.assignments.read()
            .select("vec_id", "cell_id", "sim6")
            .collect()
        )

    assert stored() == full_assign()

    # retraction page: equality-delete a slice, refresh folds it
    src.commit_delete_where(
        emb.filter(F.col("vec_id") % 9 == 2).select("vec_id"), "vec_id"
    )
    idx.refresh()
    assert stored() == full_assign()
    assert idx.assignments.read().filter("vec_id % 9 = 2 AND vec_id < 1000000").count() == 0


def test_ivfpq_index_nprobe_all_equals_pq_adc_rerank(spark, sf_dir, tmp_path):
    """IVF-PQ composition (round 9, VERDICT r8 #4) — THE differential:
    with nprobe == ncells the probed-cell restriction vanishes, so
    index-served IvfPq must equal the in-query pq_adc_rerank_topk
    under equal training (same seed/m/ksub, codebooks trained on the
    same normalized corpus) exactly."""
    from unity_to_bigquery_spark.llm.ann_index import IvfPqIndex
    from unity_to_bigquery_spark.llm.similarity import pq_adc_rerank_topk

    emb = load_table(spark, sf_dir, "embeddings")
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.commit_append(emb)
    idx = IvfPqIndex(spark, str(tmp_path / "ix"), src, ncells=8, m=4, ksub=16)
    idx.build()
    queries = emb.filter(F.col("vec_id") < 5)
    served = sorted(
        map(tuple, idx.topk(queries, k=5, nprobe=8, shortlist=20).collect())
    )
    fresh = sorted(
        map(
            tuple,
            pq_adc_rerank_topk(
                emb, queries, k=5, m=4, ksub=16, shortlist=20, seed=7
            ).collect(),
        )
    )
    assert served == fresh
    assert len(served) == 5 * queries.count()


def test_ivfpq_refresh_retraction_and_recall(spark, sf_dir, tmp_path):
    """IvfPq protocol: append refresh ≡ build-at-final under stored
    training; a delete commit folds (removed ids stop ranking); and
    nprobe < ncells recall vs exact cosine stays above the pinned
    floor (the approximation property)."""
    from unity_to_bigquery_spark.llm.ann_index import IvfPqIndex
    from unity_to_bigquery_spark.llm.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.commit_append(emb.filter(F.col("vec_id") % 10 != 0))
    idx = IvfPqIndex(spark, str(tmp_path / "ix"), src, ncells=8)
    idx.build()
    src.commit_append(emb.filter(F.col("vec_id") % 10 == 0))
    idx.refresh()
    assert idx.indexed_version() == src.latest_version()
    # every id coded exactly once per subspace after refresh
    per = idx.codes.read().groupBy("vec_id").count().select("count").distinct()
    assert [r["count"] for r in per.collect()] == [idx.m]
    # retraction: equality-delete a slice, refresh folds it
    src.commit_delete_where(
        emb.filter(F.col("vec_id") % 7 == 0).select("vec_id"), "vec_id"
    )
    idx.refresh()
    queries = emb.filter(F.col("vec_id").between(5, 9))
    got = idx.topk(queries, k=5, nprobe=8, shortlist=2000)
    assert got.filter(F.col("vec_id") % 7 == 0).count() == 0
    # with all cells probed + shortlist >= corpus the rerank is EXACT:
    # equals brute-force cosine top-k over the live corpus
    exact = brute_force_topk(src.read(), queries, k=5)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, exact.collect())
    )
    # recall property at nprobe=4 of 8 (the fixture embeddings are
    # near-random, so probing half the cells bounds recall near the
    # probed fraction): deterministic under the fixed seed
    approx = idx.topk(queries, k=5, nprobe=4, shortlist=50)
    hits = approx.join(
        exact.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi"
    ).count()
    # floor: probed fraction (4/8) minus margin — on clustered real
    # embeddings recall would exceed this; random data IS the bound
    assert hits / exact.count() >= 0.4


def test_ivfpq_probed_bytes_much_less_than_raw(spark, sf_dir, tmp_path):
    """The 1e9-vector memory story, measured: serving a query batch at
    nprobe=2/16 reads probed-cell CODE files whose on-disk bytes are a
    small fraction of the raw float vectors' — the index never reads
    raw vectors outside the |Q|x shortlist rerank set."""
    import os as _os

    from unity_to_bigquery_spark.llm.ann_index import IvfPqIndex

    emb = load_table(spark, sf_dir, "embeddings")
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.commit_append(emb)
    idx = IvfPqIndex(spark, str(tmp_path / "ix"), src, ncells=16)
    idx.build()
    queries = emb.filter(F.col("vec_id") < 5)
    kept, skipped = idx.probed_code_files(queries, nprobe=2)
    assert skipped > 0  # cold cells skipped entirely
    code_dir = _os.path.join(idx.codes.root, "data")
    probed_bytes = sum(
        _os.path.getsize(_os.path.join(code_dir, f)) for f in kept
    )
    src_dir = _os.path.join(src.root, "data")
    raw_bytes = sum(
        _os.path.getsize(_os.path.join(src_dir, f))
        for f in src.manifest()["files"]
    )
    # codes are m small ints/vector vs dim floats, AND only probed
    # cells are read: at dim=64, m=4 this is a >5x reduction even on
    # toy parquet (dictionary+metadata overhead included)
    assert probed_bytes * 5 < raw_bytes, (probed_bytes, raw_bytes)


def test_ivfpq_ivf2_scorer_identity_and_refresh(spark, sf_dir, tmp_path):
    """IvfPq with the O(sqrt C) ivf2 descent: probing every coarse and
    fine cell degenerates to the same pq_adc_rerank_topk identity as
    the flat scorer; append + retraction refresh honor the contract."""
    from unity_to_bigquery_spark.llm.ann_index import IvfPqIndex
    from unity_to_bigquery_spark.llm.similarity import pq_adc_rerank_topk

    emb = load_table(spark, sf_dir, "embeddings")
    src = VersionedTable(spark, str(tmp_path / "src"))
    # identity requires EQUAL TRAINING: build on the full corpus (the
    # split-build/refresh protocol is covered by the flat-scorer test)
    src.commit_append(emb)
    idx = IvfPqIndex(
        spark, str(tmp_path / "ix"), src, ncells=8, scorer="ivf2", wprobe=16
    )
    idx.build()
    assert idx.indexed_version() == src.latest_version()
    queries = emb.filter(F.col("vec_id") < 5)
    served = sorted(
        map(tuple, idx.topk(queries, k=5, nprobe=8, shortlist=20).collect())
    )
    fresh = sorted(
        map(
            tuple,
            pq_adc_rerank_topk(
                emb, queries, k=5, m=4, ksub=16, shortlist=20, seed=7
            ).collect(),
        )
    )
    assert served == fresh
    # append + retraction refresh through the descent scorer
    extra = emb.filter(F.col("vec_id") < 3).withColumn(
        "vec_id", F.col("vec_id") + F.lit(100000).cast("bigint")
    )
    src.commit_append(extra.select(*emb.columns))
    src.commit_delete_where(
        emb.filter(F.col("vec_id") % 9 == 0).select("vec_id"), "vec_id"
    )
    idx.refresh()
    assert idx.indexed_version() == src.latest_version()
    per = idx.codes.read().groupBy("vec_id").count().select("count").distinct()
    assert [r["count"] for r in per.collect()] == [idx.m]
    got = idx.topk(queries, k=5, nprobe=8, shortlist=2000)
    assert got.filter((F.col("vec_id") % 9 == 0) & (F.col("vec_id") < 100000)).count() == 0


def test_topk_bulk_identity_and_distributed_plan(spark, sf_dir, tmp_path):
    """Round 10 (VERDICT r9 #6): the bulk serve path is bit-identical
    to the driver-bounded serving path on the same queries, keeps the
    probe set distributed (no collect by construction — the plan shows
    a real join against the assignments scan, not a LocalTableScan of
    materialized probe rows), and handles |Q| = corpus (kNN join)."""
    emb, _src, idx = _build_split_index(spark, sf_dir, tmp_path)
    queries = emb.filter(F.col("vec_id") < 8)
    served = sorted(map(tuple, idx.topk(queries, k=3, nprobe=4).collect()))
    bulk_df = idx.topk_bulk(queries, k=3, nprobe=4)
    bulk = sorted(map(tuple, bulk_df.collect()))
    assert bulk == served
    # plan assertion: the serving path materializes probe rows on the
    # driver (createDataFrame -> Scan ExistingRDD / LocalTableScan);
    # the bulk path must NOT (distributed end to end)
    plan = bulk_df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan and "Scan ExistingRDD" not in plan
    serve_plan = (
        idx.topk(queries, k=3, nprobe=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert (
        "Scan ExistingRDD" in serve_plan or "LocalTableScan" in serve_plan
    )  # the contrast the test pins
    # |Q| = corpus: every vector against the index, one row group check
    n = emb.count()
    knn = idx.topk_bulk(emb, k=1, nprobe=2)
    rows = knn.groupBy().agg(F.count(F.lit(1)).alias("n")).first()
    assert rows.n == n  # exactly one nearest neighbor per corpus vector
    # filtered bulk (pre-filter semantics shared with topk)
    f_served = sorted(map(tuple, idx.topk(
        queries, k=3, nprobe=4, where="vec_id % 2 = 0"
    ).collect()))
    f_bulk = sorted(map(tuple, idx.topk_bulk(
        queries, k=3, nprobe=4, where="vec_id % 2 = 0"
    ).collect()))
    assert f_bulk == f_served


def test_ivfpq_topk_bulk_identity(spark, sf_dir, tmp_path):
    """Round 10: IvfPqIndex.topk_bulk (fully distributed ADC +
    rerank) is bit-identical to the bounded serving path, with no
    driver-materialized probe rows in the plan."""
    from unity_to_bigquery_spark.llm.ann_index import IvfPqIndex

    emb = load_table(spark, sf_dir, "embeddings")
    src = VersionedTable(spark, str(tmp_path / "src"))
    src.commit_append(emb)
    idx = IvfPqIndex(spark, str(tmp_path / "pq"), src, ncells=8, m=8)
    idx.build()
    queries = emb.filter(F.col("vec_id") < 6)
    served = sorted(map(tuple, idx.topk(queries, k=3, nprobe=4).collect()))
    bulk_df = idx.topk_bulk(queries, k=3, nprobe=4)
    assert sorted(map(tuple, bulk_df.collect())) == served
    plan = bulk_df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan and "LocalTableScan" not in plan
