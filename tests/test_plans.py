"""Physical-plan regression tests (the 100 TB design contract):
broadcasts stay broadcast, filters reach the parquet scan, column
pruning holds, and the as-of join stays a single-shuffle plan.
"""

from __future__ import annotations

import re

from unity_to_bigquery_spark.registry import all_queries

QUERIES = all_queries()


def _plans(spark, sf_dir, name):
    df = QUERIES[name].spark(spark, sf_dir)
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString(), qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q05_broadcasts_dims(spark, sf_dir):
    physical, _ = _plans(spark, sf_dir, "q05_local_supplier_volume")
    assert "BroadcastHashJoin" in physical
    assert "BroadcastNestedLoopJoin" not in physical


def test_q01_filter_pushdown_and_pruning(spark, sf_dir):
    _, fmt = _plans(spark, sf_dir, "q01_pricing_summary")
    assert re.search(r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate", fmt)
    m = re.search(r"ReadSchema: (struct<[^\n]*)", fmt)
    assert m, "no ReadSchema in formatted plan"
    # 7 of 11 lineitem columns needed; pruning must drop the rest
    assert "l_orderkey" not in m.group(1)
    assert "l_partkey" not in m.group(1)


def test_asof_join_single_shuffle(spark, sf_dir):
    physical, _ = _plans(spark, sf_dir, "j_asof_last_order_before_event")
    # union carry-forward: exactly one Exchange (the window shuffle),
    # and no join operator at all
    assert physical.count("Exchange hashpartitioning") == 1
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join_op not in physical


def test_routing_dim_is_broadcast(spark, sf_dir):
    physical, _ = _plans(spark, sf_dir, "e_routing_dim")
    assert "BroadcastHashJoin" in physical


def test_cosine_topk_broadcasts_queries(spark, sf_dir):
    physical, _ = _plans(spark, sf_dir, "sim_cosine_topk")
    # query batch must be the broadcast side of the cross join
    assert "BroadcastNestedLoopJoin" in physical


def test_no_cartesian_in_interval_join(spark, sf_dir):
    physical, _ = _plans(spark, sf_dir, "j_interval_ships_within_30d")
    assert "CartesianProduct" not in physical
    assert "BroadcastNestedLoopJoin" not in physical
