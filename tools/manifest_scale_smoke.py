"""×100 FILE-COUNT smoke for the round-10 manifest encoding
(VERDICT r9 #1 "done" criterion): commit cost and plan cost must stay
sublinear in log length as the live file count scales 500 → 5,000 →
50,000.

This measures the METADATA PLANE in isolation: data files are tiny
real parquet written driver-side (pyarrow), staged stats are supplied
exactly as _write_files would, and commits go through the real
_publish_once/manifest/prune code paths. Spark enters only for the
final pruned-read correctness probe (which must open O(1) files —
that's the point of pruning).

Usage:
    python tools/manifest_scale_smoke.py [--legacy] [scales...]

--legacy forces the pre-round-10 inline JSON encoding for comparison.
Prints one JSON line per scale:
    {"n_files": N, "commit_avg_s": ..., "commit_last_s": ...,
     "log_bytes": ..., "ckpt_bytes": ..., "plan_first_s": ...,
     "plan_cached_s": ..., "pruned_files": ..., "pruned_rows": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS_PER_FILE = 100
COMMITS = 10


def build(t, n_files: int) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from unity_to_bigquery_spark.plans.versioned import DATA_DIR

    per_commit = n_files // COMMITS
    times = []
    nxt = 0
    for _c in range(COMMITS):
        batch, stats = [], {}
        for _ in range(per_commit):
            lo = nxt * ROWS_PER_FILE
            hi = lo + ROWS_PER_FILE - 1
            rel = f"txn-smoke/{nxt:08d}.parquet"
            full = os.path.join(t.root, DATA_DIR, rel)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            pq.write_table(
                pa.table({"k": pa.array(range(lo, hi + 1), pa.int64())}), full
            )
            batch.append(rel)
            stats[rel] = {"k": [lo, hi], "__nrows": ROWS_PER_FILE}
            nxt += 1
        t._staged_stats = stats
        t0 = time.perf_counter()
        base = t.manifest()
        t._publish_once(base, base["files"] + batch, "append", "k BIGINT")
        times.append(time.perf_counter() - t0)
    mdir = os.path.join(t.root, "_manifests")
    log_bytes = sum(
        os.path.getsize(os.path.join(mdir, n))
        for n in os.listdir(mdir)
        if n.endswith(".json")
    )
    ckpt_bytes = sum(
        os.path.getsize(os.path.join(mdir, n))
        for n in os.listdir(mdir)
        if n.startswith("ckpt-") and n.endswith(".parquet")
    )
    return {
        "commit_avg_s": round(sum(times) / len(times), 4),
        "commit_last_s": round(times[-1], 4),
        "log_bytes": log_bytes,
        "ckpt_bytes": ckpt_bytes,
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    legacy = "--legacy" in sys.argv
    scales = [int(a) for a in args] or [500, 5000, 50000]

    from unity_to_bigquery_spark.plans.versioned import VersionedTable
    from unity_to_bigquery_spark.session import get_spark

    spark = get_spark(app_name="manifest-smoke", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for n in scales:
        root = os.path.join(
            tempfile.gettempdir(), f"manifest_smoke_{n}_{os.getpid()}"
        )
        shutil.rmtree(root, ignore_errors=True)
        kw = {"manifest_inline_max": 10**9} if legacy else {}
        t = VersionedTable(spark, root, **kw)
        out = {"n_files": n, "legacy": legacy, **build(t, n)}
        # plan cost: point-range prune (cold handle = reconstruct +
        # index build; warm = cached Arrow compute)
        t2 = VersionedTable(spark, root, **kw)
        probe_lo = (n // 2) * ROWS_PER_FILE  # mid-table file
        t0 = time.perf_counter()
        kept, _ = t2.prune_files("k", probe_lo, probe_lo + ROWS_PER_FILE - 1)
        out["plan_first_s"] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        kept, _ = t2.prune_files("k", probe_lo, probe_lo + ROWS_PER_FILE - 1)
        out["plan_cached_s"] = round(time.perf_counter() - t0, 4)
        out["pruned_files"] = len(kept)
        # correctness probe: the pruned read opens O(1) files
        out["pruned_rows"] = t2.read_pruned(
            "k", probe_lo, probe_lo + ROWS_PER_FILE - 1
        ).count()
        if not legacy:
            # round 11 (VERDICT r10 #7): EXECUTOR-SIDE fold vs driver
            # fold of the same head state, and the cold plan cost when
            # a fresh handle anchors on the folded checkpoint
            ck = t2._ckpt_path(t2.latest_version())
            if os.path.exists(ck):
                os.remove(ck)
            t3 = VersionedTable(spark, root, **kw)
            t0 = time.perf_counter()
            t3.spark_fold_checkpoint()
            out["spark_fold_s"] = round(time.perf_counter() - t0, 4)
            t4 = VersionedTable(spark, root, **kw)
            t0 = time.perf_counter()
            t4.manifest()
            out["cold_plan_from_ckpt_s"] = round(time.perf_counter() - t0, 4)
            os.remove(ck)
            t5 = VersionedTable(spark, root, **kw)
            t0 = time.perf_counter()
            full = t5._reconstruct(
                t5.latest_version(), t5._read_json(t5.latest_version())
            )
            out["driver_fold_s"] = round(time.perf_counter() - t0, 4)
            assert len(full["files"]) == n
        shutil.rmtree(root, ignore_errors=True)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
