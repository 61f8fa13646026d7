"""UDF-machinery coverage beyond the oracle-checked queries in
queries/udfs.py: polymorphic UDTFs (analyze-time schemas) and the
Arrow-native mapInArrow path.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from unity_to_bigquery_spark.catalog import load_table


def test_polymorphic_udtf_analyze_time_schema(spark):
    """Spark 4 UDTF with a static analyze(): the OUTPUT SCHEMA is
    computed from a constant argument at plan time — k=2 yields 4
    columns, k=3 yields 6 — so one table function serves any width."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class TopTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            st = StructType()
            for i in range(int(k.value)):
                st = st.add(f"tok{i}", StringType()).add(f"cnt{i}", LongType())
            return AnalyzeResult(schema=st)

        def __init__(self, analyze_result=None):
            pass

        def eval(self, text: str, k: int):
            from collections import Counter

            top = Counter(text.split(" ")).most_common(k)
            row = []
            for i in range(k):
                row += list(top[i]) if i < len(top) else [None, None]
            yield tuple(row)

    spark.udtf.register("top_tokens", TopTokens)
    two = spark.sql("SELECT * FROM top_tokens('a b a c a b', 2)")
    assert two.columns == ["tok0", "cnt0", "tok1", "cnt1"]
    assert [tuple(r) for r in two.collect()] == [("a", 3, "b", 2)]
    three = spark.sql("SELECT * FROM top_tokens('a b a c a b', 3)")
    assert three.columns == ["tok0", "cnt0", "tok1", "cnt1", "tok2", "cnt2"]
    assert [tuple(r) for r in three.collect()] == [("a", 3, "b", 2, "c", 1)]


def test_map_in_arrow_equals_jvm_expression(spark, sf_dir):
    """mapInArrow: zero-copy Arrow RecordBatch transform (no pandas
    conversion) — the leanest Python escape hatch; verified against
    the equivalent JVM-side expression."""
    import pyarrow as pa

    events = load_table(spark, sf_dir, "events").select("event_id", "value")

    def add_cents(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            import pyarrow.compute as pc

            cents = pc.cast(
                pc.floor(pc.add(pc.multiply(t.column("value"), 100.0), 0.5)), pa.int64()
            )
            yield from pa.Table.from_arrays(
                [t.column("event_id"), cents], names=["event_id", "cents"]
            ).to_batches()

    got = events.mapInArrow(add_cents, "event_id BIGINT, cents BIGINT")
    want = events.select(
        "event_id", F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents")
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}
