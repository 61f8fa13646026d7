"""Benchmark harness: times every declared query at the bench scale
factor and prints ONE SHORT JSON line for the driver
(``{"metric": ..., "value": total_sec, "unit": "sec", "queries":
{headline subset}, "sf": ...}``). Full per-query timings go to
``BENCH_LOCAL.json`` next to this file — round 1's ~5 KB stdout line
overflowed the driver's capture window (BENCH_r01.json ``parsed:
null``), so stdout stays under ~1 KB: only the BASELINE.md headline
queries inline.

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


# The BASELINE.md §"headline queries" set — kept inline on stdout so the
# driver can compare per-query without the full 142-entry dict.
HEADLINE = (
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q21_waiting_suppliers",
    "j_asof_last_order_before_event",
    "w_sessionize_events",
    "d_simhash",
    "d_minhash_lsh",
    "d_minhash_lsh_df",
    "d_dedup_clusters",
    "sim_cosine_topk",
    "sim_embed_neardup_pairs",
    "sim_ivf_neardup_pairs",
    "t_quality_features",
    "u_grouped_map_apply_in_pandas",
    "u_python_udtf",
    # round-3 flagships
    "t_bm25_topk",
    "d_chunk_dedup",
    "sim_semdedup_prune",
    "p_continuous_aggregate",
    # round-3 batch 2/3 flagships
    "d_simhash_neardup",
    "p_neardup_scrub",
    "t_textrank_keywords",
    "sim_pq_rerank_topk",
    # round-5: previously-unwatched expensive paths (VERDICT r4 #1/#8)
    "sim_ivf2_topk",
    "p_versioned_zorder_scan",
    "p_continuous_aggregate_with_deletes",
)


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

    # min-of-R per query: single-shot timings spike 3-5x under ambient
    # machine load (measured round 2: median inter-run ratio 0.98 but
    # individual queries jumped q09 0.88s->5.05s), which is noise, not
    # regression — min-of-2 is the standard de-noising for a per-query
    # 2x acceptance gate.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    timings: dict[str, float] = {}
    for name in names:
        q = registry[name]
        best = -1.0
        for _ in range(reps):
            start = time.perf_counter()
            try:
                # count() forces full execution without driver-side result
                # materialization skew for large outputs.
                q.spark(spark, sf_dir).count()
                took = round(time.perf_counter() - start, 3)
                best = took if best < 0 else min(best, took)
            except Exception as exc:  # noqa: BLE001 — record, keep benching
                print(f"# bench error {name}: {exc}", file=sys.stderr)
                break
        timings[name] = best
        # Several queries persist() intermediates (LSH inputs, iterative
        # state). Across the full 142-query session those caches pile up
        # in executor storage memory and late queries pay GC/spill for
        # blocks they never use — measured: u_python_udtf 15.2 s in the
        # full sweep vs 1.6 s in an 8-query run. Dropping dead caches
        # between queries measures each query, not its predecessors'
        # leftovers.
        spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    payload = {
        "metric": "declared_query_wall_clock_total",
        "value": total,
        "unit": "sec",
        "queries": {n: timings[n] for n in HEADLINE if n in timings},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "warmup_sec": warmup_sec,
        "n_queries": len(timings),
        "n_errors": sum(1 for t in timings.values() if t < 0),
        "detail_file": "BENCH_LOCAL.json",
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")
    with open(detail_path, "w") as fh:
        json.dump({**payload, "queries": timings}, fh, indent=1, sort_keys=True)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
