"""rrf_fuse: reciprocal-rank fusion edges — integer contributions,
missing-list ids, tie ordering, >2 lists."""

from __future__ import annotations

from unity_to_bigquery_spark.llm.retrieval import rrf_fuse


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, s BIGINT")


def test_rrf_fuse_contributions_and_missing(spark):
    a = _df(spark, [(1, 100), (2, 90), (3, 80)])
    b = _df(spark, [(2, 50), (4, 40)])
    out = rrf_fuse([("a", a, "s"), ("b", b, "s")], k=10).collect()
    got = {r.doc_id: (r.rrf6, r.rank_a, r.rank_b) for r in out}
    # 1000000 DIV (60 + rank); absent list -> 0 contribution, rank 0
    assert got[1] == (1000000 // 61, 1, 0)
    assert got[2] == (1000000 // 62 + 1000000 // 61, 2, 1)
    assert got[3] == (1000000 // 63, 3, 0)
    assert got[4] == (1000000 // 62, 0, 2)
    # doc 2 (in both lists) outranks every single-list doc
    assert [r.doc_id for r in out][0] == 2


def test_rrf_fuse_tiebreak_and_k(spark):
    # same score -> rank by id asc; equal rrf6 -> id asc in the top-k
    a = _df(spark, [(5, 10), (3, 10), (9, 10)])
    out = rrf_fuse([("a", a, "s")], k=2).collect()
    assert [(r.doc_id, r.rank_a) for r in out] == [(3, 1), (5, 2)]


def test_rrf_fuse_three_lists(spark):
    a = _df(spark, [(1, 9)])
    b = _df(spark, [(1, 9), (2, 8)])
    c = _df(spark, [(2, 7)])
    out = rrf_fuse(
        [("x", a, "s"), ("y", b, "s"), ("z", c, "s")], k=10
    ).collect()
    got = {r.doc_id: r.rrf6 for r in out}
    assert got[1] == 2 * (1000000 // 61)
    assert got[2] == 1000000 // 62 + 1000000 // 61
