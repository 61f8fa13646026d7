"""Benchmark harness: times every declared query at the bench scale
factor and prints ONE JSON line for the driver
(``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``).

Usage: ``python bench.py [query_name ...]`` — optional names restrict
the set. Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from unity_to_bigquery_spark.registry import all_queries
from unity_to_bigquery_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry = all_queries()
    names = sys.argv[1:] or sorted(registry)
    unknown = [n for n in names if n not in registry]
    if unknown:
        sys.exit(f"bench: unknown queries {unknown}; known: {sorted(registry)}")
    # No console progress bar: the driver parses our single stdout JSON
    # line and \r-progress frames must never interleave with it.
    spark = get_spark(
        app_name="bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers so per-query numbers measure the
    # query, not session startup (startup cost reported separately).
    t0 = time.perf_counter()
    registry["q01_pricing_summary"].spark(spark, sf_dir).count()
    warmup_sec = round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {}
    for name in names:
        q = registry[name]
        start = time.perf_counter()
        try:
            # count() forces full execution without driver-side result
            # materialization skew for large outputs.
            q.spark(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - start, 3)
        except Exception as exc:  # noqa: BLE001 — record, keep benching
            timings[name] = -1.0
            print(f"# bench error {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "declared_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "warmup_sec": warmup_sec,
                "n_queries": len(timings),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
