"""bench.py driver contract: one SHORT stdout JSON line.

Round 1's bench emitted a ~5 KB line with all per-query timings; the
driver's capture window kept only the tail and recorded parsed:null —
the bench gate silently produced no result (VERDICT r1). Round 5 added
3 headlines and the line hit 1112 B worst-case (VERDICT r5 #1). Guard
the line size so the regression class cannot recur, at the emission
bounds bench.py actually enforces (values capped at 999.99 / total at
99999.99, 2 decimals, reran as a count).
"""

from __future__ import annotations

import json

import bench


def _worst_case_payload() -> dict:
    # worst-case payload at bench.py's emission bounds: every headline
    # present at the 999.99 cap, total at its cap, reran triggered.
    return {
        "metric": "declared_query_wall_clock_total",
        "value": 99999.99,
        "unit": "sec",
        "queries": {n: bench.emit_value(1e9) for n in bench.HEADLINE},
        "sf": 0.1,
        "n_queries": 999,
        "n_errors": 99,
        "reran": len(bench.HEADLINE),
    }


def test_headline_payload_stays_small():
    line = json.dumps(_worst_case_payload())
    assert len(line) < 1024, f"bench stdout line {len(line)}B risks driver truncation"


def test_emit_value_bounds():
    assert bench.emit_value(1e9) == 999.99
    assert bench.emit_value(1.23456) == 1.23
    assert bench.emit_value(0.0) == 0.0


def test_headline_names_are_declared():
    from unity_to_bigquery_spark.registry import all_queries

    registry = all_queries()
    missing = [
        n
        for n in bench.HEADLINE + bench.PINNED_OFF_STDOUT
        if n not in registry
    ]
    assert not missing, f"pinned set references undeclared queries: {missing}"


def test_pins_cover_headlines_exactly():
    assert set(bench.PINS) == set(bench.HEADLINE) | set(bench.PINNED_OFF_STDOUT)
    assert all(p > 0 for p in bench.PINS.values())


def test_gate_matches_baseline_rule():
    # BASELINE.md: pass if value <= max(2x pinned, pinned + 0.75)
    assert bench.gate(0.36) == 0.36 + 0.75  # floor dominates small pins
    assert bench.gate(5.08) == 2 * 5.08  # 2x dominates large pins


def test_breach_detection_and_rerun_replacement(monkeypatch):
    """Synthetic slow-machine path (VERDICT r5 #3): a headline that
    breached in-sweep gets its standalone reproduction substituted."""
    slow_name = "d_minhash_lsh"  # pin 5.08 -> gate 10.16
    timings = {n: bench.PINS[n] for n in bench.HEADLINE}
    timings[slow_name] = 30.0  # ambient-load spike, 5.9x pin

    breaches = bench.breaching_headlines(timings)
    assert breaches == [slow_name]

    monkeypatch.setattr(bench, "rerun_standalone", lambda name: 5.5)
    # mirror main()'s substitution loop
    reran_detail = {}
    for name in breaches[: bench.MAX_RERUNS]:
        repro = bench.rerun_standalone(name)
        if repro is not None:
            reran_detail[name] = {"sweep": timings[name], "standalone": repro}
            timings[name] = repro
    assert timings[slow_name] == 5.5
    assert reran_detail[slow_name] == {"sweep": 30.0, "standalone": 5.5}
    assert not bench.breaching_headlines(timings)


def test_rerun_failure_keeps_sweep_number(monkeypatch):
    timings = {n: bench.PINS[n] for n in bench.HEADLINE}
    timings["t_bm25_topk"] = 9.9
    monkeypatch.setattr(bench, "rerun_standalone", lambda name: None)
    for name in bench.breaching_headlines(timings):
        repro = bench.rerun_standalone(name)
        if repro is not None:
            timings[name] = repro
    assert timings["t_bm25_topk"] == 9.9  # honest: breach stands


def test_rerun_standalone_parses_subprocess_line(monkeypatch):
    """rerun_standalone extracts the query timing from the child's
    stdout JSON line, skipping log noise, without spawning Spark."""

    class FakeProc:
        stdout = (
            "WARNING: some jvm noise\n"
            + json.dumps(
                {
                    "metric": "declared_query_wall_clock_total",
                    "value": 1.5,
                    "queries": {"t_bm25_topk": 0.62},
                }
            )
            + "\n"
        )

    monkeypatch.setattr(
        bench.subprocess, "run", lambda *a, **kw: FakeProc()
    )
    assert bench.rerun_standalone("t_bm25_topk") == 0.62
