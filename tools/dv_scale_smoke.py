"""×100 DELETED-ROW smoke for the round-12 deletion vectors
(VERDICT r11 #2 "done" criterion): PLANNER cost — metadata COUNT(*),
manifest size, conflict-analysis inputs — must stay FLAT as the
deleted-row count scales 1k → 10k → 100k → 1M on a fixed table,
because DV entries carry per-target counts + a bitmap sidecar pointer
instead of driver-readable (file, pos) pairs.

Usage:
    python tools/dv_scale_smoke.py [deleted_counts...]

Prints one JSON line per scale:
    {"n_deleted": N, "commit_s": ..., "manifest_bytes": ...,
     "snapshot_rows_s": ..., "snapshot_rows": ..., "sidecar_bytes": ...,
     "read_count_s": ..., "read_count": ...}

Interpretation: manifest_bytes and snapshot_rows_s are the planner
plane and must be ~flat; sidecar_bytes grows ~2 bytes/row (the data
plane, never driver-read); commit_s and read_count_s may grow with
work actually done (encode job / anti-join), sublinearly.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 2_000_000
SCALES = [1_000, 10_000, 100_000, 1_000_000]


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or SCALES
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    from unity_to_bigquery_spark.plans.versioned import VersionedTable

    for n_del in scales:
        root = os.path.join(tempfile.mkdtemp(), "dv_tbl")
        shutil.rmtree(root, ignore_errors=True)
        t = VersionedTable(spark, root)
        t.commit_append(
            spark.range(N_ROWS).selectExpr(
                "CAST(id AS BIGINT) AS k", "CAST(id % 97 AS DOUBLE) AS x"
            ).repartition(8)
        )
        t0 = time.monotonic()
        # delete every (N_ROWS // n_del)-th row — touches every file
        t.delete_rows_where(f"k % {max(1, N_ROWS // n_del)} = 0")
        commit_s = time.monotonic() - t0
        m = t.manifest()
        manifest_bytes = len(json.dumps(m))
        sidecar_bytes = sum(
            os.path.getsize(os.path.join(root, "data", d["file"]))
            for d in m.get("pos_deletes", [])
        )
        t0 = time.monotonic()
        meta_rows = t.snapshot_rows()
        snap_s = time.monotonic() - t0
        t0 = time.monotonic()
        real = t.read().count()
        read_s = time.monotonic() - t0
        assert meta_rows == real, (meta_rows, real)
        print(json.dumps({
            "n_deleted": N_ROWS - real if n_del else 0,
            "commit_s": round(commit_s, 3),
            "manifest_bytes": manifest_bytes,
            "snapshot_rows_s": round(snap_s, 6),
            "snapshot_rows": meta_rows,
            "sidecar_bytes": sidecar_bytes,
            "read_count_s": round(read_s, 3),
            "read_count": real,
        }), flush=True)
        shutil.rmtree(root, ignore_errors=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
