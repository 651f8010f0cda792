"""bench.py stdout contract: the harness records only the LAST 2000
chars of stdout and parses the JSON line from it — round 1's 96-entry
line overran the window and recorded as ``parsed: null``. These tests
pin the compact-line invariants without starting Spark."""

from __future__ import annotations

import json

from bench import _compact_line


def _payload(n: int) -> dict:
    qs = {f"some_quite_long_query_name_{i:03d}": 0.1 + i * 0.37 for i in range(n)}
    return {
        "metric": "total_wall_clock_all_queries",
        "value": round(sum(qs.values()), 3),
        "unit": "sec",
        "queries": qs,
        "sf": 0.1,
    }


def test_small_payload_passes_through():
    line = _compact_line(_payload(10))
    p = json.loads(line)
    assert len(p["queries"]) == 10
    assert "omitted" not in p


def test_large_payload_fits_budget_and_reconciles():
    line = _compact_line(_payload(150))
    assert len(line) <= 1900
    p = json.loads(line)
    assert p["omitted"] == 150 - len(p["queries"])
    # kept + omitted must reconcile with the total (2-dp rounding slack)
    kept = sum(p["queries"].values())
    assert abs(kept + p["omitted_sum_s"] - p["value"]) < 0.01 * 150
    # the EXPENSIVE queries are the ones kept
    assert min(p["queries"].values()) >= p["omitted_sum_s"] / max(p["omitted"], 1)


def test_line_is_single_line_json():
    line = _compact_line(_payload(150))
    assert "\n" not in line
    json.loads(line)  # parseable


def test_a17_latency_tiers_survive_truncation():
    """VERDICT r4 item 9: the cheap serving-latency entries were
    silently dropped by drop-cheapest-first truncation in the r4
    driver snapshot. They must survive any budget squeeze."""
    p = _payload(150)
    p["queries"]["ml_single_row_serve_p50"] = 0.003
    p["queries"]["ml_loan_pipeline_fit_eval"] = 0.9
    p["queries"]["ml_loan_pipeline_fit_eval_100x"] = 5.7
    line = _compact_line(p)
    assert len(line) <= 1900
    out = json.loads(line)["queries"]
    assert "ml_single_row_serve_p50" in out
    assert "ml_loan_pipeline_fit_eval" in out
    assert "ml_loan_pipeline_fit_eval_100x" in out


def test_diagnostic_dicts_shed_when_pins_alone_overflow():
    """ADVICE r5 item 4: pinned entries can't be dropped, so a huge
    regressions_vs_committed payload could overflow the budget after
    every non-pinned query is gone. The diagnostic dicts must be shed
    before the line exceeds the harness's stdout capture."""
    p = _payload(150)
    p["queries"]["ml_single_row_serve_p50"] = 0.003
    p["queries"]["ml_loan_pipeline_fit_eval"] = 0.9
    p["queries"]["ml_loan_pipeline_fit_eval_100x"] = 5.7
    p["regressions_vs_committed"] = {
        f"very_long_regressed_query_name_number_{i:04d}": [1.234, 9.876]
        for i in range(60)
    }
    p["streaming_steady_s"] = {
        f"streaming_query_with_a_long_name_{i:04d}": 1.23 for i in range(40)
    }
    line = _compact_line(p, budget=700)
    assert len(line) <= 700
    out = json.loads(line)
    assert "ml_single_row_serve_p50" in out["queries"]
    assert "regressions_vs_committed" not in out
    assert "streaming_steady_s" not in out


def test_high_flag_count_sheds_regressions_before_queries():
    """VERDICT r6 item 5: a run with many ≥2x flags must collapse
    regressions_vs_committed to a shed marker BEFORE dropping query
    timings or the streaming steady-state samples — those are the
    in-band evidence that exonerates a host-degradation draw, and the
    full flag dict is always in bench_full.json anyway."""
    p = _payload(40)
    p["regressions_vs_committed"] = {
        f"flagged_query_with_a_long_name_{i:04d}": [1.234, 9.876]
        for i in range(12)
    }
    p["streaming_steady_s"] = {
        f"streaming_query_{i:02d}": 1.23 for i in range(6)
    }
    baseline = len(json.dumps({**p, "queries": {
        k: round(v, 2) for k, v in p["queries"].items()
    }}, separators=(",", ":")))
    assert baseline > 1900  # the synthetic payload genuinely overflows
    line = _compact_line(p)
    assert len(line) <= 1900
    out = json.loads(line)
    # flags collapsed to a counted marker, not silently vanished
    assert out["regressions_vs_committed"] == {"shed_flags": 12}
    # the exonerating evidence survived intact
    assert len(out["streaming_steady_s"]) == 6
    assert len(out["queries"]) == 40
    assert "omitted" not in out
