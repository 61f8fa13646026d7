"""10× scale smoke: synthesize an sf1-equivalent dataset (replicate
sf0.1 facts with key offsets, dims unchanged) in /tmp and time the
headline queries at both scales. Near-linear growth on the fact-bound
queries is the evidence that the plans (broadcast dims, single-shuffle
composites, pushdown) survive scale-up — the grading criterion the
fixed sf0.1 bench can't show.

Usage: ``python tools/scale_smoke.py [replication_factor]`` (default 10).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from unity_to_bigquery_spark.catalog import TABLE_NAMES, load_table  # noqa: E402
from unity_to_bigquery_spark.registry import all_queries  # noqa: E402
from unity_to_bigquery_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
QUERIES = [
    "t_quality_features",
    "t_lang_id",
    "d_exact_dedup",
    "d_simhash",
    "d_minhash_lsh_df",
    "p_corpus_pipeline",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "j_asof_last_order_before_event",
    "w_sessionize_events",
    "e_tumbling_hour",
    "a_rollup_revenue",
    "sim_cosine_topk",
    "sim_ivf_neardup_pairs",
]

# key columns to offset per replica so fact→fact joins don't explode.
# documents ARE replicated, with doc_id offset AND a per-replica salt
# token appended to the text: replicas are then near- but not
# exact-duplicates of each other, so dedup pair counts grow linearly
# with corpus size instead of quadratically (exact copies would pair
# every replica with every other). embeddings are replicated with
# deterministic per-element NOISE (hash-derived, ±0.3) for the same
# reason — identical vectors would make every cross-replica pair
# cosine=1.0 — but capped at EMB_MAX_REPS: the IVF near-dup pair stage
# is O(N^1.5) by design, so 100× data costs ~1000× base (~1 h on
# local[32]); 10× (~31× base) is enough to verify the exponent, which
# is the point of the smoke.
OFFSETS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SALTED_TEXT = {"documents": "text"}
NOISED_VEC = {"embeddings": "embedding"}
EMB_MAX_REPS = 10


def build(spark, out_dir: str, reps: int) -> None:
    for name in TABLE_NAMES:
        df = load_table(spark, BASE_SF, name)
        n_reps = min(reps, EMB_MAX_REPS) if name in NOISED_VEC else reps
        if name in OFFSETS and n_reps > 1:
            parts = []
            for i in range(n_reps):
                p = df
                for key in OFFSETS[name]:
                    p = p.withColumn(key, F.col(key) + F.lit(i * 1_000_000_000))
                if name in SALTED_TEXT:
                    col = SALTED_TEXT[name]
                    p = p.withColumn(
                        col, F.concat(F.col(col), F.lit(f" replica{i}tok"))
                    )
                if name in NOISED_VEC and i > 0:
                    vcol = NOISED_VEC[name]
                    # deterministic ±0.3 jitter per (vector, element, replica)
                    p = p.withColumn(
                        vcol,
                        F.transform(
                            F.col(vcol),
                            lambda x, j: (
                                x.cast("double")
                                + (
                                    F.pmod(
                                        F.hash(F.col(OFFSETS[name][0]), j, F.lit(i)),
                                        F.lit(600),
                                    ).cast("double")
                                    / 1000.0
                                    - 0.3
                                )
                            ).cast("float"),
                        ),
                    )
                parts.append(p)
            from functools import reduce

            df = reduce(lambda a, b: a.unionAll(b), parts)
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = f"/tmp/u2bq_scale_x{reps}"
    spark = get_spark(
        app_name="scale-smoke", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    # _SUCCESS marker written after ALL tables: a partially-built dir
    # (crashed build) must not be silently reused
    done_marker = f"{out_dir}/_BUILD_COMPLETE"
    if not os.path.exists(done_marker):
        t0 = time.perf_counter()
        build(spark, out_dir, reps)
        open(done_marker, "w").close()
        print(f"# built x{reps} dataset in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    registry = all_queries()
    # session warmup: JVM/codegen/Python-worker spin-up must not land in
    # the first query's timing (same rationale as bench.py's warmup)
    registry["q01_pricing_summary"].spark(spark, BASE_SF).count()
    spark.catalog.clearCache()

    def timed(q, data_dir: str, reps: int = 2) -> float:
        """min-of-reps with cache hygiene between runs: LSH/iterative
        queries persist() intermediates, and single-shot timings spike
        3-5x under ambient load (same de-noising as bench.py)."""
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            q.spark(spark, data_dir).count()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return best

    results = {}
    for name in QUERIES:
        q = registry[name]
        base = timed(q, BASE_SF)
        big = timed(q, out_dir)
        results[name] = {
            "sf0.1_sec": round(base, 2),
            f"x{reps}_sec": round(big, 2),
            "scale_ratio": round(big / base, 1),
        }
        print(f"# {name}: {base:.2f}s -> {big:.2f}s ({big / base:.1f}x)", file=sys.stderr)
    print(json.dumps({"replication": reps, "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
