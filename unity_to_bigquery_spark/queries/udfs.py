"""UDF surface declared queries (SURVEY.md §2B UDF/UDAF/UDTF): scalar
Python UDF, Arrow-vectorized pandas UDF, grouped-agg pandas UDF,
grouped-map applyInPandas, and a Python UDTF. The UDF bodies implement
SQL-expressible functions so the DuckDB oracle can verify the Spark UDF
*machinery* end-to-end (serialization, Arrow batches, grouping).

Scale note: these exist to prove the escape hatch works; the engine's
hot paths (every other query module) stay JVM-side on purpose — a
row-at-a-time Python UDF is ~10-100× slower than codegen expressions.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.types import StringType

from unity_to_bigquery_spark.catalog import load_table, register_views
from unity_to_bigquery_spark.registry import query


@query(
    "u_scalar_python_udf",
    oracle="""
    SELECT doc_id, reverse(source) AS rev_source, length(source) AS src_len
    FROM documents WHERE doc_id % 17 = 0
    """,
    doc="Row-at-a-time Python UDF (string reverse) — the slow path, verified.",
    tags=("udf",),
)
def u_scalar_python_udf(spark, sf_dir):
    rev = F.udf(lambda s: s[::-1] if s is not None else None, StringType())
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 17 == 0)
    return docs.select(
        "doc_id", rev("source").alias("rev_source"), F.length("source").alias("src_len")
    )


@query(
    "u_vectorized_pandas_udf",
    oracle="""
    SELECT event_id,
           CAST(FLOOR(ln(1 + value) * 1000000.0 + 0.5) AS BIGINT) AS log1p6
    FROM events WHERE event_id % 41 = 0
    """,
    doc="Arrow-vectorized scalar pandas_udf (numpy log1p over batches).",
    tags=("udf", "pandas"),
)
def u_vectorized_pandas_udf(spark, sf_dir):
    import numpy as np

    @F.pandas_udf("double")
    def log1p(v: pd.Series) -> pd.Series:
        return pd.Series(np.log1p(v.to_numpy()))

    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 41 == 0)
    return events.select(
        "event_id",
        F.floor(log1p("value") * 1000000.0 + 0.5).alias("log1p6"),
    )


@query(
    "u_grouped_agg_pandas_udf",
    oracle="""
    SELECT user_id, second_max FROM (
      SELECT user_id, value AS second_max,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC) AS rn
      FROM events
    ) WHERE rn = 2
    """,
    doc="Grouped-agg pandas UDF (second-largest value per key — exact, no float arithmetic).",
    tags=("udf", "pandas", "udaf"),
)
def u_grouped_agg_pandas_udf(spark, sf_dir):
    @F.pandas_udf("double")
    def second_max(v: pd.Series) -> float:
        return float(v.nlargest(2).iloc[-1])

    @F.pandas_udf("long")
    def pd_count(v: pd.Series) -> int:
        return len(v)

    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        # count must also be a pandas UDF — Spark refuses to mix
        # grouped-agg pandas UDFs with JVM aggregates in one agg
        .agg(second_max("value").alias("second_max"), pd_count("value").alias("__n"))
        # single-event users have no second-largest; the oracle's rn=2
        # filter drops them, so must we (nlargest(2) of 1 row yields
        # the max, which would be wrong)
        .filter(F.col("__n") >= 2)
        .drop("__n")
    )


@query(
    "u_grouped_map_apply_in_pandas",
    oracle="""
    SELECT user_id, COUNT(*) AS n, MAX(value) - MIN(value) AS value_range
    FROM events GROUP BY user_id
    """,
    doc="Grouped-map applyInPandas (per-key pandas frame → summary row).",
    tags=("udf", "pandas", "grouped-map"),
)
def u_grouped_map_apply_in_pandas(spark, sf_dir):
    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n": [len(pdf)],
                "value_range": [float(pdf["value"].max() - pdf["value"].min())],
            }
        )

    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").applyInPandas(
        summarize, "user_id BIGINT, n BIGINT, value_range DOUBLE"
    )


@query(
    "u_python_udtf",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id % 59 = 0
    """,
    doc="Python UDTF (table function): one row per word via LATERAL.",
    tags=("udf", "udtf"),
)
def u_python_udtf(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string")
    class SplitWords:
        def eval(self, text: str):
            for w in text.split(" "):
                yield (w,)

    spark.udtf.register("split_words", SplitWords)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT doc_id, word
        FROM documents, LATERAL split_words(text)
        WHERE doc_id % 59 = 0
        """
    )


@query(
    "m_multimodal_features",
    oracle=None,  # binary plumbing; shapes/determinism tested in tests/test_multimodal.py
    doc=(
        "Multimodal: binary payload + metadata struct → mapInPandas "
        "BYTE-STAT extraction (length/sha1/mean byte — decode-free by "
        "design; real container decode is the m_*_decode_verified "
        "family via decode_real)."
    ),
    tags=("multimodal",),
)
def m_multimodal_features(spark, sf_dir):
    from unity_to_bigquery_spark.llm.multimodal import extract_features, synthesize_media

    docs = load_table(spark, sf_dir, "documents")
    return extract_features(synthesize_media(docs))


@query(
    "m_video_frame_sample",
    oracle=None,  # 1->N binary frame expansion; tested in tests/test_multimodal.py
    doc="Multimodal: per-video frame sampling (1→N mapInPandas expansion).",
    tags=("multimodal",),
)
def m_video_frame_sample(spark, sf_dir):
    from unity_to_bigquery_spark.llm.multimodal import sample_frames, synthesize_media

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(synthesize_media(docs), every_k=4).drop("frame_bytes")


@query(
    "u_iterator_pandas_udf",
    oracle="""
    SELECT event_id,
           CAST(FLOOR(ln(1.0 + value) * 1000000.0 + 0.5) AS BIGINT) AS log1p6
    FROM events WHERE event_id % 41 = 0
    """,
    doc=(
        "Iterator-of-Series pandas UDF: per-partition setup runs ONCE "
        "and amortizes across all Arrow batches — the pattern for "
        "model-inference UDFs at scale (load weights once per "
        "executor-partition, not once per batch). Verified end-to-end "
        "against the plain-SQL equivalent."
    ),
    tags=("udf", "iterator"),
)
def u_iterator_pandas_udf(spark, sf_dir):
    import numpy as np
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def log1p6(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # stand-in for an expensive one-time init (model/tokenizer load);
        # real pipelines hoist big constants or models here
        scale = np.float64(1000000.0)
        for s in batches:
            yield pd.Series(
                np.floor(np.log1p(s.to_numpy()) * scale + 0.5).astype("int64")
            )

    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 41 == 0)
    return events.select("event_id", log1p6("value").alias("log1p6"))


@query(
    "u_arrow_python_udf",
    oracle="""
    SELECT doc_id, reverse(source) AS rev_source, length(source) AS src_len
    FROM documents WHERE doc_id % 17 = 0
    """,
    doc=(
        "Arrow-optimized Python UDF (Spark 4 useArrow=True): the same "
        "row-at-a-time function as u_scalar_python_udf but transported "
        "in Arrow batches instead of pickled rows — the drop-in "
        "migration path when a pandas_udf rewrite is not worth it "
        "(measured ~2x on string workloads; still slower than a true "
        "vectorized pandas_udf)."
    ),
    tags=("udf", "arrow"),
)
def u_arrow_python_udf(spark, sf_dir):
    rev = F.udf(lambda s: s[::-1], StringType(), useArrow=True)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 17 == 0)
    return docs.select(
        "doc_id", rev("source").alias("rev_source"), F.length("source").alias("src_len")
    )


@query(
    "f_parameterized_sql",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS total2
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice >= 150000.0
    GROUP BY o_orderpriority
    """,
    doc=(
        "Parameterized SQL (Spark 4 named-argument binding): the query "
        "text carries :status/:floor placeholders and values bind "
        "server-side — the injection-safe templating surface (the "
        "reference string-formats its SQL and shell commands, "
        "slack_notifier.py:8; this is the engine's answer)."
    ),
    tags=("sql", "frontend"),
)
def f_parameterized_sql(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS total2
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice >= :floor
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "floor": 150000.0},
    )
