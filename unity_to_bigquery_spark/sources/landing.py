"""Landing-zone sources: the Spark-side half of the reference's
ingestion path (Unity_to_BigQuery.py:105-150 — download, gunzip, write
NDJSON, load to BigQuery).

In the Spark restatement the driver-side REST client (reference A1/A2)
drops files into ``<root>/<project_id>/<report_type>/<date>_<job_id>/``
(directory scheme from Unity_to_BigQuery.py:106) and everything after
that is a declarative scan:

- gzip NDJSON decompresses for free via Hadoop codecs (reference A4's
  in-memory gunzip, Unity_to_BigQuery.py:136-141, disappears);
- multi-file iteration (A5) is a glob;
- partition columns (project/report/job) come from the directory
  layout, not from per-file loops;
- BigQuery's schema inference at load time (bq_uploader.py:22-28) maps
  to ``spark.read.json`` inference, or an explicit StructType for
  production (inference = 2 passes at 100 TB; always pin the schema).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# Explicit schema for the events landing files (FIXTURES.md §2.1); ts
# travels as a formatted string in NDJSON and is parsed on read.
EVENTS_LANDING_DDL = (
    "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_ndjson(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType | str | None = None,
) -> DataFrame:
    """NDJSON scan (handles ``.json.gz`` transparently). With no schema,
    infers like BigQuery's load-time inference (bq_uploader.py:28);
    prefer an explicit schema at scale (single pass, stable types).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_landing_events(spark: SparkSession, root: str) -> DataFrame:
    """Scan the whole landing tree for event files, recovering
    (project_id, report_type, batch_id) from the directory layout
    (mirrors Unity_to_BigQuery.py:106) via input_file_name parsing —
    no per-file driver loop (reference A5/A14 collapse into one scan).
    """
    df = read_ndjson(spark, f"{root}/*/*/*/*.json.gz", EVENTS_LANDING_DDL)
    path = F.input_file_name()
    seg = F.split(F.regexp_replace(path, "^file:", ""), "/")
    n = F.size(seg)
    return (
        df.withColumn("project_id", F.element_at(seg, n - 3))
        .withColumn("report_type", F.element_at(seg, n - 2))
        .withColumn("batch_id", F.element_at(seg, n - 1))
        .withColumn("ts", F.to_timestamp("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    )


def read_csv_with_header(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """CSV scan with header row skipped — mirrors the reference's
    ``skip_leading_rows=1`` (bq_uploader.py:24-25).
    """
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_ndjson_with_quarantine(
    spark: SparkSession,
    path: str | list[str],
    schema: str,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """NDJSON scan with malformed-record policy — the robustness the
    reference lacks (it streams payload bytes straight to BigQuery,
    Unity_to_BigQuery.py:136-150; one bad line fails the whole load
    job).

    PERMISSIVE (default): bad lines null out and land verbatim in
    ``_corrupt_record`` for quarantine — at 100 TB the pipeline must
    keep moving and triage later. DROPMALFORMED: silently skip.
    FAILFAST: error on first bad line (for landing contracts that must
    hold).
    """
    full = schema + ", _corrupt_record STRING" if mode == "PERMISSIVE" else schema
    return (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
