"""Storage-partitioned joins (plans/spj): exchange-free per-bucket
co-partition plan from part: manifest tuples, broadcast-side choice by
manifest row counts, MoR-delete compose, refusals."""

from __future__ import annotations

import pytest

from unity_to_bigquery_spark.plans.spj import (
    assert_no_shuffle,
    storage_partitioned_join,
)
from unity_to_bigquery_spark.plans.versioned import VersionedTable


def _mk(spark, root, rows, schema, n=4):
    t = VersionedTable(spark, root, partition_spec=[f"bucket({n}, k)"])
    t.commit_append(spark.createDataFrame(rows, schema))
    return t


def test_spj_equals_plain_join_no_shuffle(spark, tmp_path):
    ta = _mk(spark, str(tmp_path / "a"),
             [(i, f"a{i}") for i in range(60)], "k INT, va STRING")
    tb = _mk(spark, str(tmp_path / "b"),
             [(i, float(i)) for i in range(0, 120, 2)], "k INT, xb DOUBLE")
    tb.delete_rows_where("k = 4", mode="mor")  # MoR composes
    j = storage_partitioned_join(ta, tb, "k")
    assert_no_shuffle(j)
    got = sorted(map(tuple, j.collect()))
    want = sorted(map(tuple, ta.read().join(tb.read(), "k").collect()))
    assert got == want and len(got) == 29
    # clashing non-key columns get the r_ prefix
    tc = _mk(spark, str(tmp_path / "c"),
             [(1, "x")] , "k INT, va STRING")
    j2 = storage_partitioned_join(ta, tc, "k")
    assert set(j2.columns) == {"k", "va", "r_va"}


def test_spj_version_pins_and_empty_overlap(spark, tmp_path):
    ta = _mk(spark, str(tmp_path / "a"), [(i, "x") for i in range(20)],
             "k INT, va STRING")
    v1 = ta.latest_version()
    ta.commit_append(spark.createDataFrame([(99, "late")], "k INT, va STRING"))
    tb = _mk(spark, str(tmp_path / "b"), [(99, 1.0)], "k INT, xb DOUBLE")
    # pinned at v1 the late row is invisible
    j = storage_partitioned_join(ta, tb, "k", left_version=v1)
    assert j.count() == 0 and set(j.columns) == {"k", "va", "xb"}
    j2 = storage_partitioned_join(ta, tb, "k")
    assert [(r.k, r.va) for r in j2.collect()] == [(99, "late")]


def test_spj_refusals(spark, tmp_path):
    ta = _mk(spark, str(tmp_path / "a"), [(1, "x")], "k INT, va STRING", n=4)
    tb = _mk(spark, str(tmp_path / "b"), [(1, 1.0)], "k INT, xb DOUBLE", n=8)
    with pytest.raises(ValueError, match="incompatible bucket counts"):
        storage_partitioned_join(ta, tb, "k")
    td = VersionedTable(spark, str(tmp_path / "d"))
    td.commit_append(spark.createDataFrame([(1, 1.0)], "k INT, xb DOUBLE"))
    with pytest.raises(ValueError, match="no bucket transform"):
        storage_partitioned_join(ta, td, "k")
    with pytest.raises(ValueError, match="how='inner'"):
        storage_partitioned_join(ta, ta, "k", how="left")
    # files predating the spec refuse (metadata-only spec evolution)
    te = VersionedTable(spark, str(tmp_path / "e"))
    te.commit_append(spark.createDataFrame([(1, 2.0)], "k INT, xb DOUBLE"))
    te2 = VersionedTable(
        spark, str(tmp_path / "e"), partition_spec=["bucket(4, k)"]
    )
    te2.set_partition_spec(["bucket(4, k)"])
    te2.commit_append(spark.createDataFrame([(2, 3.0)], "k INT, xb DOUBLE"))
    with pytest.raises(ValueError, match="predate the bucket spec"):
        storage_partitioned_join(ta, te2, "k")


def test_spj_broadcasts_smaller_side_by_rowcount(spark, tmp_path):
    ta = _mk(spark, str(tmp_path / "a"),
             [(i % 4, f"a{i}") for i in range(400)], "k INT, va STRING")
    tb = _mk(spark, str(tmp_path / "b"),
             [(i, float(i)) for i in range(4)], "k INT, xb DOUBLE")
    j = storage_partitioned_join(ta, tb, "k")
    plan = j._jdf.queryExecution().executedPlan().toString()
    # every bucket pair must build on the 1-row side (the right table)
    assert "BuildRight" in plan and "BuildLeft" not in plan
    assert j.count() == 400
