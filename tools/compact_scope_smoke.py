"""x10 TABLE-SIZE smoke for partition-scoped compaction (VERDICT r10
#4 "Done ="): the table grows 10x by ADDING partitions while the
compacted partition stays the same size — compact(where=...) wall time
must stay ~flat (cost follows the selected partition), while full
compact() pays the whole table. Usage: python tools/compact_scope_smoke.py
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unity_to_bigquery_spark.session import get_spark  # noqa: E402
from unity_to_bigquery_spark.plans.versioned import VersionedTable  # noqa: E402

ROWS_PER_PART = 50_000
FILES_PER_PART = 5


def build(spark, root: str, nparts: int) -> VersionedTable:
    shutil.rmtree(root, ignore_errors=True)
    t = VersionedTable(spark, root, partition_spec=["ds"])
    for fi in range(FILES_PER_PART):  # commits -> small files per part
        df = (
            spark.range(nparts * ROWS_PER_PART // FILES_PER_PART)
            .selectExpr(
                "id AS k",
                f"concat('p', CAST(id % {nparts} AS STRING)) AS ds",
                "CAST(id AS DOUBLE) / 7.0 AS x",
            )
            .repartition(4)
        )
        t.commit_append(df)
    return t


def timed_scoped(spark, nparts: int, tag: str) -> float:
    best = None
    for trial in range(2):  # min-of-2, rule 14
        t = build(spark, f"/tmp/csmoke_{tag}_{trial}", nparts)
        spark.catalog.clearCache()
        t0 = time.monotonic()
        t.compact(where={"ds": "p0"})
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
        assert t.read().filter("ds = 'p0'").count() == ROWS_PER_PART
    return best


def main():
    spark = get_spark(app_name="compact-scope-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    s1 = timed_scoped(spark, 4, "s1")
    s10 = timed_scoped(spark, 40, "s10")
    # contrast: full compact at both scales
    f1 = f10 = None
    for trial in range(2):
        t = build(spark, f"/tmp/csmoke_full1_{trial}", 4)
        t0 = time.monotonic(); t.compact(target_files=1)
        d = time.monotonic() - t0
        f1 = d if f1 is None else min(f1, d)
        t = build(spark, f"/tmp/csmoke_full10_{trial}", 40)
        t0 = time.monotonic(); t.compact(target_files=1)
        d = time.monotonic() - t0
        f10 = d if f10 is None else min(f10, d)
    print({
        "scoped_x1_sec": round(s1, 2), "scoped_x10_sec": round(s10, 2),
        "scoped_ratio": round(s10 / s1, 2),
        "full_x1_sec": round(f1, 2), "full_x10_sec": round(f10, 2),
        "full_ratio": round(f10 / f1, 2),
        "rows_x1": 4 * ROWS_PER_PART, "rows_x10": 40 * ROWS_PER_PART,
    })


if __name__ == "__main__":
    main()
