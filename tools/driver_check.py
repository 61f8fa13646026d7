"""Emulate the driver's t2 correctness protocol: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
on DuckDB at sf0.01 (or $SPARK_GRAFT_CHECK_SF_DIR), canonicalize, and
compare. Usage: ``python tools/driver_check.py [name ...]``.

``SPARK_GRAFT_HOSTILE=1`` runs the same protocol under a deliberately
adversarial session (7 shuffle partitions, AQE off, non-UTC session TZ)
to catch results that depend on partition count, adaptive planning, or
the session timezone (CLAUDE.md hard rule 6; ``catalog.load_table``
repins TZ to UTC itself).
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_compare import assert_match  # noqa: E402
from unity_to_bigquery_spark.catalog import TABLE_NAMES  # noqa: E402
from unity_to_bigquery_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")
    if os.environ.get("SPARK_GRAFT_HOSTILE"):
        spark = get_spark(
            app_name="driver-check-hostile",
            shuffle_partitions=7,
            extra_conf={
                "spark.sql.adaptive.enabled": "false",
                "spark.sql.session.timeZone": "America/New_York",
            },
        )
    else:
        spark = get_spark(app_name="driver-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = sys.argv[1:] or sorted(qs)
    failed = []
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            if name in oracles:
                assert_match(df, con.sql(oracles[name]), name=name)
                print(f"{name}: MATCH")
            else:
                print(f"{name}: rows-only ({df.count()} rows)")
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"{name}: FAIL — {exc}")
    spark.stop()
    if failed:
        sys.exit(f"{len(failed)} queries failed: {failed}")


if __name__ == "__main__":
    main()
