"""Edge-case semantics locked in after code review: boundary behaviors
that the driver fixtures cannot reach (exact-gap sessions, single-event
groups, unsupported salt-join modes, corrupted checkpoints).
"""

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F
import pytest

from unity_to_bigquery_spark.operators.skew import replicated_salt_join


def test_session_window_boundary_exactly_gap(spark):
    """An event exactly `gap` after its predecessor MERGES into the same
    session (session_window extends the window to prev_ts + gap and the
    boundary event is included) — so the e_session oracle's strict-``>``
    new-session condition is the correct mirror. Verified empirically:
    a code-review pass claimed the opposite; this test settles it."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=30)),          # exactly the gap → merges
        (1, t0 + dt.timedelta(minutes=60, seconds=1)),  # gap+1s after prev → new
    ]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP")
    sessions = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .count()
        .collect()
    )
    assert sorted(r["count"] for r in sessions) == [1, 2]


def test_second_max_excludes_single_event_groups(spark, sf_dir):
    from unity_to_bigquery_spark.registry import all_queries

    q = all_queries()["u_grouped_agg_pandas_udf"]
    # Craft a table where user 99999 has exactly one event; run the same
    # logic inline on it.
    @F.pandas_udf("double")
    def second_max(v: pd.Series) -> float:
        return float(v.nlargest(2).iloc[-1])

    @F.pandas_udf("long")
    def pd_count(v: pd.Series) -> int:
        return len(v)

    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (99999, 5.0)], "user_id BIGINT, value DOUBLE"
    )
    out = (
        df.groupBy("user_id")
        .agg(second_max("value").alias("second_max"), pd_count("value").alias("n"))
        .filter(F.col("n") >= 2)
        .collect()
    )
    assert {r.user_id for r in out} == {1}
    assert out[0].second_max == 10.0

    # and the registered query itself runs clean
    assert q.spark(spark, sf_dir).count() > 0


def test_replicated_salt_join_rejects_outer_modes(spark, sf_dir):
    from unity_to_bigquery_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    with pytest.raises(ValueError, match="n_salt times"):
        replicated_salt_join(li, orders, key="l_orderkey", salt_col="l_quantity", how="full")


def test_corrupted_checkpoint_fails_loudly(spark, tmp_path):
    from unity_to_bigquery_spark.plans.pipeline import CheckpointTable

    path = tmp_path / "ckpt"
    path.mkdir()
    (path / "part-00000.parquet").write_bytes(b"this is not parquet")
    ckpt = CheckpointTable(spark, str(path))
    with pytest.raises(Exception) as ei:
        ckpt.read().count()
    assert "PATH_NOT_FOUND" not in str(ei.value)  # a real error, surfaced
