"""Generative cross-engine check of the fixed-point aggregate scheme:
for arbitrary finite doubles, Spark's dsum/davg must equal DuckDB
running the sql_dsum/sql_davg mirror on the same values. This is the
portability contract every money aggregate in the engine rests on.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from unity_to_bigquery_spark.functions.canonical import davg, dsum, sql_davg, sql_dsum

finite_doubles = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False, width=64
)


@given(values=st.lists(finite_doubles, min_size=1, max_size=40))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dsum_davg_match_duckdb(spark, values):
    sdf = spark.createDataFrame([(v,) for v in values], "x DOUBLE")
    got = sdf.agg(dsum("x").alias("s"), davg("x").alias("a")).collect()[0]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    want_s, want_a = con.sql(
        f"SELECT {sql_dsum('x')} AS s, {sql_davg('x')} AS a FROM t"
    ).fetchone()
    con.close()

    assert got.s == want_s, f"dsum mismatch on {values}"
    assert got.a == want_a, f"davg mismatch on {values}"
