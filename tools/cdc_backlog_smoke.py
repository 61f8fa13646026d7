"""CDC paging at realistic backlog depth (VERDICT r6 #5):
ContinuousAggregate.refresh() paging is unit-tested at toy commit
counts; this smoke drives a ~1,000-commit catch-up (pages of 256) and
records that

1. catch-up wall is PROPORTIONAL TO COMMITS (half the backlog ≈ half
   the wall — manifest reads are per-commit JSON, delta scans read
   only each page's added files, never the table),
2. a crash BETWEEN pages resumes exactly: fold one page, abandon the
   loop (the simulated crash — each page is its own atomic merge
   commit stamped txn=(app, page_end)), re-open the aggregate cold and
   refresh(); the final rollup must equal a full groupBy recompute of
   the source snapshot, and the resumed run must fold only the
   REMAINING pages (verified via the txn bookmark),
3. per-page cost is flat across the backlog (first vs last page).

Usage: python tools/cdc_backlog_smoke.py [N_COMMITS] [PAGE]
Defaults: 1000 commits, page 256. Rows per commit are tiny by design —
the smoke measures the PER-COMMIT protocol overhead (manifest walk +
page merges), which is what a long-idle catch-up is bounded by; the
per-row cost is the ordinary scan path measured elsewhere.
Results land in BASELINE.md §cdc-backlog.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from unity_to_bigquery_spark.plans.incremental_agg import ContinuousAggregate  # noqa: E402
from unity_to_bigquery_spark.plans.versioned import VersionedTable  # noqa: E402
from unity_to_bigquery_spark.session import get_spark  # noqa: E402


def build_backlog(spark, root: str, n_commits: int) -> VersionedTable:
    shutil.rmtree(root, ignore_errors=True)
    t = VersionedTable(spark, root)
    base = spark.sql(
        "SELECT id, CAST(id % 5 AS INT) AS g, CAST(id AS DOUBLE) AS x "
        "FROM range(4)"
    ).coalesce(1)
    for i in range(n_commits):
        t.commit_append(base.select(
            (F.col("id") + i * 4).alias("id"), "g", (F.col("x") + i).alias("x")
        ))
    return t


def catchup_wall(spark, src: VersionedTable, agg_root: str, page: int) -> float:
    shutil.rmtree(agg_root, ignore_errors=True)
    agg = ContinuousAggregate(spark, src, agg_root, key="g", measures={"s6": "x"})
    t0 = time.monotonic()
    agg.refresh(max_commits=page)
    return time.monotonic() - t0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    page = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spark = get_spark(app_name="cdc-backlog-smoke", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.join(tempfile.gettempdir(), "u2bq_cdc_backlog")
    src_root = os.path.join(root, "src")

    t_build0 = time.monotonic()
    src = build_backlog(spark, src_root, n)
    t_build = time.monotonic() - t_build0

    # 1. wall ∝ commits: full backlog vs half backlog (same table,
    #    refresh windows (0, n/2] vs (0, n] via max-commit paging).
    #    A throwaway warmup catch-up first — the session's first jobs
    #    pay JIT/codegen floors that would inflate whichever variant
    #    runs first (CLAUDE.md rule 14)
    catchup_wall(spark, src, os.path.join(root, "agg_warm"), page)
    wall_full = catchup_wall(spark, src, os.path.join(root, "agg_full"), page)
    shutil.rmtree(os.path.join(root, "agg_half"), ignore_errors=True)
    half = ContinuousAggregate(
        spark, src, os.path.join(root, "agg_half"), key="g", measures={"s6": "x"}
    )
    t0 = time.monotonic()
    last = 0
    while last < n // 2:
        last = half._refresh_window(last, min(last + page, n // 2))
    wall_half = time.monotonic() - t0

    # 3. per-page cost flat across the backlog: first page vs last page
    shutil.rmtree(os.path.join(root, "agg_probe"), ignore_errors=True)
    probe = ContinuousAggregate(
        spark, src, os.path.join(root, "agg_probe"), key="g", measures={"s6": "x"}
    )
    t0 = time.monotonic()
    probe._refresh_window(0, page)
    first_page = time.monotonic() - t0
    t0 = time.monotonic()
    probe._refresh_window(n - (n % page or page), n)
    last_page_wall = time.monotonic() - t0

    # 2. crash-between-pages resume at depth: one page folded, loop
    #    abandoned, cold re-open, full refresh; equality vs recompute
    crash_root = os.path.join(root, "agg_crash")
    shutil.rmtree(crash_root, ignore_errors=True)
    crash = ContinuousAggregate(
        spark, src, crash_root, key="g", measures={"s6": "x"}
    )
    crash._refresh_window(0, page)  # page 1 committed, then "crash"
    resumed = ContinuousAggregate(  # cold re-open after the crash
        spark, src, crash_root, key="g", measures={"s6": "x"}
    )
    assert resumed.last_refreshed() == page  # txn bookmark survived
    resumed.refresh(max_commits=page)
    got = {
        r.g: (r.n, r.s6) for r in resumed.read().collect()
    }
    want = {
        r.g: (r.n, r.s6)
        for r in src.read()
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("x") * 1000000.0 + F.lit(0.5)).cast("long")).alias("s6"),
        )
        .collect()
    }
    assert got == want, "crash-resumed rollup != full recompute"

    print(json.dumps({
        "n_commits": n, "page": page,
        "build_s": round(t_build, 1),
        "catchup_full_s": round(wall_full, 1),
        "catchup_half_s": round(wall_half, 1),
        "full_over_half": round(wall_full / max(wall_half, 1e-9), 2),
        "first_page_s": round(first_page, 2),
        "last_page_s": round(last_page_wall, 2),
        "crash_resume": "exact",
    }))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
