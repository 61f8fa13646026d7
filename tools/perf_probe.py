"""Per-query performance probe (optimization round): runs one or more
declared queries standalone with the Spark event log enabled, then
attributes wall-clock to (a) job count x scheduling, (b) summed
executor task time, (c) driver-side Python (everything else).

Usage: ``python tools/perf_probe.py <query> [query ...]``
Prints one line per query:
  name  wall_s  n_jobs  n_tasks  task_time_s  job_wall_s  py_profile_top

Optionally ``SPARK_GRAFT_PROBE_CPROFILE=1`` adds a cProfile of the
driver process per query (top cumulative entries, pyspark frames
filtered to the interesting boundary calls).
"""

from __future__ import annotations

import cProfile
import io
import json
import os
import pstats
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unity_to_bigquery_spark.registry import all_queries  # noqa: E402
from unity_to_bigquery_spark.session import get_spark  # noqa: E402

EVDIR = "/tmp/u2bq_perf_eventlogs"


def parse_eventlog(path: str) -> dict:
    """Sum job/task metrics out of one Spark event-log file."""
    n_jobs = 0
    n_tasks = 0
    task_time_ms = 0
    gc_time_ms = 0
    job_wall_ms = 0
    job_starts: dict[int, int] = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                job_starts[ev["Job ID"]] = ev.get("Submission Time", 0)
            elif et == "SparkListenerJobEnd":
                n_jobs += 1
                st = job_starts.get(ev["Job ID"])
                if st:
                    job_wall_ms += max(0, ev.get("Completion Time", st) - st)
            elif et == "SparkListenerTaskEnd":
                n_tasks += 1
                tm = ev.get("Task Metrics") or {}
                task_time_ms += tm.get("Executor Run Time", 0)
                gc_time_ms += tm.get("JVM GC Time", 0)
    return {
        "n_jobs": n_jobs,
        "n_tasks": n_tasks,
        "task_time_s": task_time_ms / 1000.0,
        "gc_time_s": gc_time_ms / 1000.0,
        "job_wall_s": job_wall_ms / 1000.0,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: perf_probe.py <query> [query ...]")
    registry = all_queries()
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        app_name="perf-probe",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{EVDIR}",
            # Spark 4 defaults to rolling+zstd event logs; a single
            # plain-text .inprogress file is what parse_eventlog reads.
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry["q01_pricing_summary"].spark(spark, sf_dir).count()  # warmup

    do_prof = bool(os.environ.get("SPARK_GRAFT_PROBE_CPROFILE"))
    for name in names:
        q = registry[name]
        # marker via a fresh job group is overkill: we diff the event
        # log byte offset instead (single sequential file per app).
        logf = None
        for f in os.listdir(EVDIR):
            if not f.endswith(".inprogress"):
                continue
            logf = os.path.join(EVDIR, f)
        if logf is None:
            sys.exit("no in-progress event log found")
        before = os.path.getsize(logf)
        prof = cProfile.Profile() if do_prof else None
        t0 = time.perf_counter()
        if prof:
            prof.enable()
        q.spark(spark, sf_dir).count()
        if prof:
            prof.disable()
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        # flush listener bus before reading the log tail
        time.sleep(0.8)
        with open(logf) as fh:
            fh.seek(before)
            tail = fh.read()
        tmp = os.path.join(EVDIR, "_tail.json")
        with open(tmp, "w") as fh:
            fh.write(tail)
        m = parse_eventlog(tmp)
        print(
            f"{name:42s} wall={wall:7.2f}s jobs={m['n_jobs']:4d} "
            f"tasks={m['n_tasks']:5d} task_time={m['task_time_s']:8.2f}s "
            f"gc={m['gc_time_s']:6.2f}s job_wall={m['job_wall_s']:8.2f}s "
            f"driver_gap={wall - m['job_wall_s']:7.2f}s"
        )
        if prof:
            s = io.StringIO()
            ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
            ps.print_stats(30)
            print(s.getvalue())
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
