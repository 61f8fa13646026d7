"""Connected-components properties: edge endpoints share labels, labels
are cluster minima, singletons self-label, chains converge."""

from __future__ import annotations

import pyspark.sql.functions as F

from unity_to_bigquery_spark.llm.clusters import connected_components, dedup_survivors


def test_chain_and_clique_components(spark):
    ids = spark.createDataFrame([(i,) for i in range(10)], "id BIGINT")
    edges = spark.createDataFrame(
        # chain 0-1-2-3 (diameter 3), clique 5-6-7, singleton 4, pair 8-9
        [(0, 1), (1, 2), (2, 3), (5, 6), (6, 7), (5, 7), (8, 9)],
        "id_a BIGINT, id_b BIGINT",
    )
    comp = {r.id: r.component for r in connected_components(ids, edges).collect()}
    assert comp[0] == comp[1] == comp[2] == comp[3] == 0
    assert comp[5] == comp[6] == comp[7] == 5
    assert comp[4] == 4
    assert comp[8] == comp[9] == 8


def test_survivors_over_minhash_pairs(spark, sf_dir):
    from unity_to_bigquery_spark.catalog import load_table
    from unity_to_bigquery_spark.llm.dedup import minhash_lsh_pairs_df

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs_df(docs).filter(F.col("jaccard6") >= 500000)
    surv = dedup_survivors(docs.select("doc_id"), pairs)
    rows = surv.collect()
    n_docs = docs.count()
    # partition property: cluster sizes sum to the doc count
    assert sum(r.cluster_size for r in rows) == n_docs
    # every edge's endpoints are in the same cluster: survivors joined
    # through pairs must agree
    comp = connected_components(docs.select("doc_id"), pairs, id_col="doc_id")
    joined = (
        pairs.join(comp.withColumnRenamed("doc_id", "id_a").withColumnRenamed("component", "ca"), "id_a")
        .join(comp.withColumnRenamed("doc_id", "id_b").withColumnRenamed("component", "cb"), "id_b")
    )
    assert joined.filter(F.col("ca") != F.col("cb")).count() == 0
    # survivor is the min id of its cluster
    assert all(r.survivor_id == r.component for r in rows)
