"""Persisted BM25 index (llm/bm25_index.BM25Index): serve identity vs
the one-shot operator, retraction-aware incremental refresh,
incrementally-maintained df/corpus rollups, bucket-pruned serving,
streamed maintenance via index_cdc_maintenance_sink, rebuild bypass,
and paging/replay idempotency."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from unity_to_bigquery_spark.llm.bm25_index import BM25Index
from unity_to_bigquery_spark.llm.retrieval import bm25_topk
from unity_to_bigquery_spark.plans.versioned import VersionedTable

VOCAB = ["hash", "join", "scan", "sort", "merge", "spark", "tree", "leaf"]
TERMS = ["hash", "join", "scan"]


def _docs(spark, lo, hi, seed=7):
    rng = random.Random(seed + lo)
    return spark.createDataFrame(
        [
            (i, " ".join(rng.choices(VOCAB, k=rng.randint(3, 25))))
            for i in range(lo, hi)
        ],
        "doc_id BIGINT, text STRING",
    ).coalesce(1)


def _topk(ix_or_df, terms=TERMS):
    if isinstance(ix_or_df, BM25Index):
        return [tuple(r) for r in ix_or_df.topk(terms, k=10).collect()]
    return [tuple(r) for r in bm25_topk(ix_or_df, terms, k=10).collect()]


def test_build_serve_identity_and_bucket_pruning(spark, tmp_path):
    src = VersionedTable(spark, str(tmp_path / "docs"))
    src.commit_append(_docs(spark, 0, 150))
    ix = BM25Index(spark, str(tmp_path / "ix"), src, n_buckets=16)
    ix.build()
    assert _topk(ix) == _topk(src.read())
    # serving reads only the query buckets' files
    m = ix.postings.manifest()
    buckets = sorted({ix._bucket_py(t) for t in TERMS})
    pruned, skipped = ix.postings._prune_eq(m, "bucket", buckets)
    assert skipped > 0 and len(pruned) < len(m["files"])
    with pytest.raises(ValueError, match="build"):
        BM25Index(spark, str(tmp_path / "ix2"), src).refresh()


def test_refresh_appends_and_retractions(spark, tmp_path):
    """Append pages PURE-APPEND postings; a delete commit retracts —
    serve and the df/corpus rollups all equal a fresh computation on
    the final live corpus."""
    src = VersionedTable(spark, str(tmp_path / "docs"))
    src.commit_append(_docs(spark, 0, 100))
    ix = BM25Index(spark, str(tmp_path / "ix"), src, n_buckets=8)
    ix.build()
    files0 = set(ix.postings.manifest()["files"])
    src.commit_append(_docs(spark, 100, 140))
    ix.refresh()
    m = ix.postings.manifest()
    assert files0 <= set(m["files"]) and m["op"] in ("append", "compact")
    assert _topk(ix) == _topk(src.read())
    # retraction
    src.commit_delete_where(
        spark.createDataFrame([(i,) for i in range(0, 140, 3)], "doc_id BIGINT"),
        "doc_id",
    )
    ix.refresh()
    assert _topk(ix) == _topk(src.read())
    # df rollup == recompute on live corpus
    got = {r.term: r.df for r in ix.term_df(TERMS).collect()}
    want = {
        r.term: r.df
        for r in src.read()
        .select(F.explode(F.split("text", " ")).alias("term"), "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .filter(F.col("term").isin(TERMS))
        .collect()
    }
    assert got == want
    # corpus rollup == live N / sum_dl
    cs = ix.corpus_stats.read().first()
    live = src.read().select(
        F.count("*").alias("n"),
        F.sum(F.size(F.split("text", " "))).alias("s"),
    ).first()
    assert cs.n == live.n and cs.sum_dl == live.s * 1_000_000
    # replayed/old boundary: exactly-once no-op
    v = ix.indexed_version()
    assert ix.refresh(to_version=v) == v
    assert ix.refresh(to_version=1) == v


def test_rebuild_bypasses_txn_noop(spark, tmp_path):
    """Rule 17: a rebuild at an already-bookmarked version must not be
    silently skipped by the txn idempotency check."""
    src = VersionedTable(spark, str(tmp_path / "docs"))
    src.commit_append(_docs(spark, 0, 50))
    ix = BM25Index(spark, str(tmp_path / "ix"), src)
    ix.build()
    v0 = ix.postings.latest_version()
    ix.build()  # same source version: must still overwrite
    assert ix.postings.latest_version() > v0
    assert _topk(ix) == _topk(src.read())


def test_streamed_maintenance_equals_batch(spark, tmp_path):
    """BM25Index honors the build/refresh(to_version)/indexed_version/
    source contract, so index_cdc_maintenance_sink maintains it from a
    CDC stream: drained serve state ≡ the one-shot operator on the
    final corpus; a second drain no-ops."""
    from unity_to_bigquery_spark.sources.versioned_stream import register
    from unity_to_bigquery_spark.streaming.stream import (
        index_cdc_maintenance_sink,
    )

    register(spark)
    src = VersionedTable(spark, str(tmp_path / "docs"))
    src.commit_append(_docs(spark, 0, 80))
    ix = BM25Index(spark, str(tmp_path / "ix"), src, n_buckets=8)
    ix.build()
    src.commit_append(_docs(spark, 80, 120))
    src.commit_delete_where(
        spark.createDataFrame([(i,) for i in range(0, 80, 4)], "doc_id BIGINT"),
        "doc_id",
    )
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("versioned_table")
            .option("path", src.root)
            .option("emit_change_types", "true")
            .option("starting_version", "1")
            .load()
            .writeStream.foreachBatch(index_cdc_maintenance_sink(ix))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert ix.indexed_version() == src.latest_version()
    assert _topk(ix) == _topk(src.read())
    v0 = ix.postings.latest_version()
    drain()  # replay: txn no-op
    assert ix.postings.latest_version() == v0
