"""Benchmark harness: times every declared query at the bench scale
factor and prints ONE SHORT JSON line for the driver
(``{"metric": ..., "value": total_sec, "unit": "sec", "queries":
{headline subset}, "sf": ...}``). Full per-query timings go to
``BENCH_LOCAL.json`` next to this file — round 1's ~5 KB stdout line
overflowed the driver's capture window (BENCH_r01.json ``parsed:
null``), so stdout stays under 1 KB: only the BASELINE.md headline
queries inline, values rounded to 2 decimals and capped at 999.99
(a >1000 s single query at sf0.1 is a catastrophic failure either
way), no warmup/detail fields (those live in BENCH_LOCAL.json).

Noise defense (VERDICT r5 #3): single-shot timings on this host spike
3-10x under ambient load (CLAUDE.md rule 14; BENCH_r05 recorded two
false headline breaches that cleared standalone). After the sweep,
any headline that breached its BASELINE gate is re-run standalone in
a FRESH process (``python bench.py <name>``, itself min-of-2); the
reproduced number replaces the sweep number in the stdout line, and
``"reran": <count>`` marks how many were re-run (a count, not a name
list: 3 of these query names alone would blow the 1024 B stdout
contract — names + both timings are in BENCH_LOCAL.json's
``reran_detail``).

Usage: ``python bench.py [query_name ...]`` — optional names restrict
the set. Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32), ``SPARK_GRAFT_BENCH_REPS``
(default 2), ``SPARK_GRAFT_BENCH_NO_RERUN=1`` disables the breach
rerun (set automatically in rerun subprocesses).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from unity_to_bigquery_spark.registry import all_queries
from unity_to_bigquery_spark.session import get_spark


# The BASELINE.md §"headline queries" set — kept inline on stdout so the
# driver can compare per-query without the full per-query dict.
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

# Round-8 pins (VERDICT r7 #5): gated EXACTLY like HEADLINE (breach →
# standalone rerun; reproduced breach fails the gate) but kept OFF the
# stdout line — 36 inline entries would blow the 1024 B driver-capture
# contract that bit in round 1 (BENCH_r01 parsed: null). Their sweep
# timings live in the committed BENCH_LOCAL.json per-query dict.
PINNED_OFF_STDOUT = (
    "sim_index_topk",
    "sim_index_pq_topk",
    "p_gram_index_report",
    "p_crawl_corpus",
    "p_gram_index_retraction",
    "sim_index_retraction_topk",
    "sim_index_ivf2_topk",
    "p_crawl_corpus_streamed",
    "p_crawl_frontier_skew",
    "p_rag_retrieval",
    "p_versioned_bloom_lookup",
    # round-9 pins
    "p_versioned_partition_spec",
    "p_versioned_wap_publish",
    "sim_index_streamed_retraction_topk",
    "sim_index_ivfpq_topk",
    "p_versioned_snapshot_count",
    # round-10 pins
    "p_versioned_manifest_checkpoint",
    "p_versioned_rename_evolution",
    "p_versioned_row_lineage",
    "p_versioned_merge_evolution",
    "p_incremental_join_view",
    "sim_index_bulk_knn_join",
    "p_catalog_multi_table_txn",
    "p_ivm_pipeline",
    "p_ivm_streamed_join",
    "p_versioned_time_travel_ts",
    "p_versioned_join_advisor",
    "p_versioned_metadata_tables",
    # round-13 pins
    "p_versioned_sql_select",
    "p_versioned_spj_bucket_join",
    "t_index_bm25_topk",
    "p_versioned_generated_columns",
    "p_catalog_sql_ctas",
    "p_mv_autorewrite_realtime",
    "t_hybrid_rrf_topk",
    "p_versioned_cluster_string",
    "p_mv_rollup_subset",
    "p_versioned_expectations",
)

# BASELINE.md pinned per-query baselines (sec, sf0.1) — the gate is
# took <= max(2*pin, pin + 0.75) per BASELINE.md's acceptance rule.
# tests/test_bench_contract.py asserts PINS keys == HEADLINE +
# PINNED_OFF_STDOUT.
PINS = {
    "q01_pricing_summary": 0.36,
    "q03_shipping_priority": 1.04,
    "q05_local_supplier_volume": 0.76,
    "q21_waiting_suppliers": 1.70,
    "j_asof_last_order_before_event": 0.81,
    "w_sessionize_events": 0.41,
    "d_simhash": 0.42,
    "d_minhash_lsh": 5.08,
    "d_minhash_lsh_df": 0.81,
    "d_dedup_clusters": 1.98,
    "sim_cosine_topk": 0.69,
    "sim_embed_neardup_pairs": 0.62,
    "sim_ivf_neardup_pairs": 4.60,
    "t_quality_features": 0.20,
    "u_grouped_map_apply_in_pandas": 2.50,
    "u_python_udtf": 1.28,
    "t_bm25_topk": 0.45,
    "d_chunk_dedup": 0.44,
    "sim_semdedup_prune": 1.60,
    "p_continuous_aggregate": 2.10,  # re-pinned r6 (BASELINE.md note)
    "d_simhash_neardup": 2.08,
    "p_neardup_scrub": 1.78,
    # re-pinned r9 per the 3-draw protocol (VERDICT r8 #7):
    # draws 5.56/6.52/8.37 standalone min-of-2 each
    "t_textrank_keywords": 5.56,
    "sim_pq_rerank_topk": 2.36,
    "sim_ivf2_topk": 6.39,
    "p_versioned_zorder_scan": 2.42,
    "p_continuous_aggregate_with_deletes": 7.25,
    # round-8 pins (VERDICT r7 #5), two standalone min-of-2 draws each
    # (BASELINE.md §round-8 re-pin): index demo queries' cost is the
    # BUILD by design — the amortized production cost model is
    # measured separately in BASELINE §ann-index/§gram-index
    "sim_index_topk": 8.42,     # r7 driver recording (draws 8.27/13.9)
    "sim_index_pq_topk": 11.09, # r7 driver recording (draws 9.6/10.8)
    "p_gram_index_report": 13.50,
    "p_crawl_corpus": 2.81,
    "p_gram_index_retraction": 23.00,
    "sim_index_retraction_topk": 12.50,
    "sim_index_ivf2_topk": 10.70,
    "p_crawl_corpus_streamed": 3.10,
    "p_crawl_frontier_skew": 1.19,
    "p_rag_retrieval": 9.47,  # draws 9.10/9.47
    "p_versioned_bloom_lookup": 5.40,  # draws 4.93/5.37
    # round-9 pins, two standalone min-of-2 draws each (BASELINE.md
    # §round-9 pins); the stream/index queries' cost is the demo's
    # build+drain job count by design
    "p_versioned_partition_spec": 5.45,   # draws 5.45/6.59
    "p_versioned_wap_publish": 1.38,      # draws 1.38/1.45
    "sim_index_streamed_retraction_topk": 12.39,  # draws 12.39/13.65
    "sim_index_ivfpq_topk": 12.00,        # draws 12.00/13.22
    "p_versioned_snapshot_count": 2.02,   # draws 2.06/2.02
    # round-10 pins, two standalone min-of-2 draws each (BASELINE.md
    # §round-10 pins); the versioned demos' cost is their multi-commit
    # write paths by design
    "p_versioned_manifest_checkpoint": 1.35,  # draws 1.46/1.35
    "p_versioned_rename_evolution": 0.55,     # draws 0.55/0.58
    "p_versioned_row_lineage": 5.06,          # draws 5.14/5.06
    "p_versioned_merge_evolution": 0.75,      # draws 0.75/0.95
    "p_incremental_join_view": 9.54,          # draws 9.71/9.54
    "sim_index_bulk_knn_join": 8.61,          # draws 10.18/8.61 (after the norm-precompute fix)
    "p_catalog_multi_table_txn": 2.57,        # draws 2.57/3.01
    "p_ivm_pipeline": 14.29,                  # draws 14.80/14.29 (two-hop maintenance: ~15 sequential commit/refresh jobs by design)
    "p_ivm_streamed_join": 15.43,             # draws 16.83/15.43 (four checkpointed stream drains + 7 source commits by design)
    "p_versioned_time_travel_ts": 1.60,       # draws 1.57/1.60 (later 4.5/6.2 draws were a traced ambient spike, rule 14)
    "p_versioned_join_advisor": 2.14,         # draws 1.90/1.80 pre- and 2.14 post-unique()-optimization (ambient spike draws excluded per rule 14)
    "p_versioned_metadata_tables": 5.04,      # draws 5.04/5.42 (two ~84-partition month-layout writes by design; the metadata answers are zero-IO)
    # round-13 pins, two same-session draws each (BASELINE.md
    # §round-13 pins); the versioned/index demos' cost is their
    # multi-commit build+serve job count by design
    "p_versioned_sql_select": 11.12,          # draws 11.12/13.16 (DSv2 Python-source reads ×4 incl. CDF + pushdown twins)
    "p_versioned_spj_bucket_join": 5.27,      # draws 5.51/5.27 (two bucketed table builds + per-bucket union join)
    "t_index_bm25_topk": 17.44,               # draws 19.82/17.44 (postings build + 2 CDC refreshes over 10k docs by design)
    "p_versioned_generated_columns": 2.91,    # draws 3.01/2.91
    "p_catalog_sql_ctas": 2.93,               # draws 3.06/2.93
    "p_mv_autorewrite_realtime": 7.09,        # draws 7.18/7.09 (3 commits + delete + 3 realtime folds)
    "t_hybrid_rrf_topk": 2.39,                # draws 2.39/2.59
    "p_versioned_cluster_string": 2.37,       # draws 2.37/2.93
    "p_mv_rollup_subset": 12.98,              # draws 12.98/13.23 (composite-key refresh + 6 answer_sql paths, each an independent realtime fold by design)
    "p_versioned_expectations": 1.94,         # draws 1.94/2.24 (3 gated ingest commits + quarantine read-back; ×10 smoke 1.0×)
}

# Rerunning more than this many breaches means the whole sweep ran on a
# loaded machine; the first few reruns still document that honestly
# without doubling total bench wall-clock (each rerun pays ~15 s of
# fresh-JVM startup).
MAX_RERUNS = 8


def gate(pin: float) -> float:
    """BASELINE.md acceptance threshold for a pinned headline."""
    return max(2.0 * pin, pin + 0.75)


def breaching_headlines(timings: dict[str, float]) -> list[str]:
    """Pinned queries whose sweep timing exceeds the BASELINE gate —
    the whole PINS set (stdout headliners AND the off-stdout round-8
    pins) is gated identically."""
    return [
        n
        for n in PINS
        if n in timings and timings[n] > gate(PINS[n])
    ]


def rerun_standalone(name: str, timeout_sec: float = 600.0) -> float | None:
    """Re-measure one query in a fresh process (min-of-2 inside).

    Returns the standalone timing, or None if the subprocess failed —
    callers keep the sweep number in that case.
    """
    env = dict(os.environ, SPARK_GRAFT_BENCH_NO_RERUN="1")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            capture_output=True,
            text=True,
            timeout=timeout_sec,
            env=env,
        )
    except (subprocess.TimeoutExpired, OSError):
        return None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        took = parsed.get("queries", {}).get(name)
        if isinstance(took, (int, float)) and took >= 0:
            return float(took)
    return None


def emit_value(took: float) -> float:
    """Bound a per-query stdout value: 2 decimals, capped at 999.99."""
    return round(min(took, 999.99), 2)


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
    # query, not session startup (startup cost reported in BENCH_LOCAL).
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
        # state). Across the full-sweep session those caches pile up
        # in executor storage memory and late queries pay GC/spill for
        # blocks they never use — measured: u_python_udtf 15.2 s in the
        # full sweep vs 1.6 s in an 8-query run. Dropping dead caches
        # between queries measures each query, not its predecessors'
        # leftovers.
        spark.catalog.clearCache()
    spark.stop()

    # Breach rerun (VERDICT r5 #3): reproduce any gate breach standalone
    # before the driver records it. Only in full-sweep mode — explicit
    # name args ARE the standalone protocol already.
    sweep_timings = dict(timings)
    reran_detail: dict[str, dict[str, float]] = {}
    if not sys.argv[1:] and not os.environ.get("SPARK_GRAFT_BENCH_NO_RERUN"):
        for name in breaching_headlines(timings)[:MAX_RERUNS]:
            repro = rerun_standalone(name)
            if repro is not None:
                reran_detail[name] = {
                    "sweep": timings[name],
                    "standalone": repro,
                }
                timings[name] = repro

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    payload = {
        "metric": "declared_query_wall_clock_total",
        "value": round(min(total, 99999.99), 2),
        "unit": "sec",
        "queries": {
            n: emit_value(timings[n]) for n in HEADLINE if n in timings
        },
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(timings),
        "n_errors": sum(1 for t in timings.values() if t < 0),
    }
    if reran_detail:
        payload["reran"] = len(reran_detail)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                **payload,
                "queries": timings,
                "sweep_queries": sweep_timings,
                "reran_detail": reran_detail,
                "warmup_sec": warmup_sec,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
