"""BigQuery sink (reference A10, bq_uploader.py:14-38) — the Spark
restatement of ``load_table_from_file`` + blocking ``job.result()``.

The real path uses the spark-bigquery-connector (not installed in this
sandbox, and it needs GCP credentials): one ``df.write`` replaces the
reference's per-file load-job loop, and the connector parallelizes the
upload per partition — the reference uploads files sequentially with a
fresh client each time (bq_uploader.py:12,28-30).

Where the connector (or credentials) is absent, the sink degrades to a
partitioned-parquet staging directory with the SAME layout BigQuery
external tables / `bq load` consume — so the cutover is config, not
code. Callers never branch: ``write_events`` picks the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def connector_available(spark) -> bool:
    """True iff the spark-bigquery-connector is on the session's
    classpath (it registers the ``bigquery`` DataSource)."""
    try:
        spark._jvm.Class.forName(
            "com.google.cloud.spark.bigquery.BigQueryRelationProvider"
        )
        return True
    except Exception:
        return False


def connector_write_options(dataset: str, table: str) -> dict[str, str]:
    """The exact writer options the connector branch emits — kept as a
    pure function so tests pin them without the connector jar.
    ``writeMethod=direct`` is the Storage Write API (no GCS staging
    bucket), the scalable default; the reference instead ran one
    synchronous NEWLINE_DELIMITED_JSON load job per file
    (bq_uploader.py:24-30)."""
    return {"table": f"{dataset}.{table}", "writeMethod": "direct"}


def write_events(
    df: DataFrame,
    dataset: str,
    table: str,
    staging_root: str,
    mode: str = "append",
) -> str:
    """Load ``df`` into ``dataset.table``. Returns a description of the
    sink actually used (connector vs staging parquet) so pipelines can
    log the A10 'job id' analogue.

    Connector path (classpath + credentials present)::

        df.write.format("bigquery")
          .option("table", f"{dataset}.{table}")
          .option("writeMethod", "direct")        # Storage Write API
          .mode(mode).save()

    Staging path (this sandbox): Hive-layout parquet under
    ``<staging_root>/<dataset>/<table>/`` — exactly what
    ``bq load --source_format=PARQUET`` or an external table reads.
    """
    spark = df.sparkSession
    if connector_available(spark):
        (
            df.write.format("bigquery")
            .options(**connector_write_options(dataset, table))
            .mode(mode)
            .save()
        )
        return f"bigquery:{dataset}.{table}"
    path = f"{staging_root}/{dataset}/{table}"
    df.write.mode(mode).parquet(path)
    return f"staging-parquet:{path}"
