"""Cost-based-optimizer statistics (100 TB design lever): ANALYZE TABLE
row/column statistics must reach the optimizer and sharpen its
cardinality estimates — at scale, the difference between a broadcast
and a sort-merge join (or a good and bad join order) is exactly these
stats, because file size alone cannot see filter selectivity.
"""

from __future__ import annotations

import os

import pytest

from unity_to_bigquery_spark.catalog import load_table


def _drop_cbo(spark):
    """Drop tables AND stranded warehouse locations: a killed run can
    leave `spark-warehouse/cbo_*` dirs without catalog entries, and the
    next saveAsTable errors on the existing location (VERDICT r10)."""
    import shutil

    for name in ("cbo_nation", "cbo_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        loc = os.path.join("spark-warehouse", name)
        if os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)


@pytest.fixture()
def cbo_tables(spark, sf_dir):
    _drop_cbo(spark)
    load_table(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable("cbo_nation")
    load_table(spark, sf_dir, "orders").write.mode("overwrite").saveAsTable("cbo_orders")
    spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR ALL COLUMNS")
    yield
    _drop_cbo(spark)


def _row_count(df):
    opt = df._jdf.queryExecution().optimizedPlan()
    rc = opt.stats().rowCount()
    return int(str(rc.get())) if not rc.isEmpty() else None


def test_analyze_publishes_row_counts(spark, cbo_tables):
    desc = {r.col_name: r.data_type for r in spark.sql("DESC EXTENDED cbo_nation").collect()}
    assert "Statistics" in desc and "25 rows" in desc["Statistics"]


def test_cbo_uses_exact_row_count(spark, cbo_tables):
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        assert _row_count(spark.table("cbo_nation")) == 25
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")


def test_cbo_filter_selectivity_estimate(spark, cbo_tables):
    """Column stats (min/max/NDV) let the optimizer estimate a range
    filter's output as a FRACTION of the table — the estimate that
    decides broadcastability of filtered dimensions at scale."""
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        orders = spark.table("cbo_orders")
        total = orders.count()
        lo = orders.selectExpr("min(o_orderkey)").first()[0]
        hi = orders.selectExpr("max(o_orderkey)").first()[0]
        cut = lo + (hi - lo) // 10  # ~10% range predicate
        est = _row_count(orders.filter(f"o_orderkey < {cut}"))
        assert est is not None
        # estimate must reflect selectivity, not the full table
        assert est < total * 0.5
        assert est > 0
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
