"""bench.py driver contract: one SHORT stdout JSON line.

Round 1's bench emitted a ~5 KB line with all per-query timings; the
driver's capture window kept only the tail and recorded parsed:null —
the bench gate silently produced no result (VERDICT r1). Guard the
line size so the regression class cannot recur.
"""

from __future__ import annotations

import json

import bench


def test_headline_payload_stays_small():
    # worst-case payload: every headline query present with a wide float
    payload = {
        "metric": "declared_query_wall_clock_total",
        "value": 12345.678,
        "unit": "sec",
        "queries": {n: 12345.678 for n in bench.HEADLINE},
        "sf": 0.1,
        "warmup_sec": 123.456,
        "n_queries": 999,
        "n_errors": 0,
        "detail_file": "BENCH_LOCAL.json",
    }
    line = json.dumps(payload)
    assert len(line) < 1024, f"bench stdout line {len(line)}B risks driver truncation"


def test_headline_names_are_declared():
    from unity_to_bigquery_spark.registry import all_queries

    registry = all_queries()
    missing = [n for n in bench.HEADLINE if n not in registry]
    assert not missing, f"HEADLINE references undeclared queries: {missing}"
