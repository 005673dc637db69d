"""Guard bench.py's stdout contract.

The driver tail-captures ~2000 chars of bench.py stdout and json.loads the
last line. Round 4's line overflowed that window (per-key medians + 5-sample
arrays rode the same line) and the driver recorded ``"parsed": null`` — no
official headline number. These tests pin the contract so it cannot regress
as BENCH_QUERIES accumulates:

* the compact stdout payload (metric/value/unit/queries/sf) stays < 1500
  chars even with pessimistic float widths;
* it json-round-trips;
* the required driver keys are present.
"""

from __future__ import annotations

import json

import bench


def _compact_payload(value: float = 9999.999) -> dict:
    # pessimistic widths: every per-key timing printed at maximal round(,3)
    # width (4 int digits + 3 decimals)
    return {
        "metric": "headline_queries_total_wall_seconds",
        "value": value,
        "unit": "sec",
        "queries": {name: 9999.999 for name in bench.BENCH_QUERIES},
        "sf": 0.1,
    }


def test_stdout_line_fits_driver_tail_window():
    line = json.dumps(_compact_payload())
    assert len(line) < 1500, (
        f"bench stdout line would be {len(line)} chars; the driver tail "
        "window is ~2000 — trim BENCH_QUERIES keys or move fields to stderr"
    )


def test_stdout_line_round_trips():
    line = json.dumps(_compact_payload())
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall_seconds"
    assert parsed["unit"] == "sec"
    assert set(parsed["queries"]) == set(bench.BENCH_QUERIES)
    assert isinstance(parsed["value"], float)


def test_no_diagnostics_print_after_compact_line():
    """Rounds 4-6 all recorded ``"parsed": null`` because a diagnostics JSON
    print (stdout in r4, stderr in r5/r6 — the driver merges both streams)
    followed the compact line and scrolled it out of the tail window. Pin
    that the ONLY print after the compact contract line is nothing: the
    diagnostics object may be written to the bench_detail.json sidecar but
    never printed."""
    import inspect

    src = inspect.getsource(bench.main)
    compact_at = src.index("print(line")
    tail = src[compact_at:]
    assert "print(json.dumps(diagnostics)" not in src
    # nothing after the compact line may print at all
    assert "print(" not in tail[tail.index("\n") :], (
        "bench.main prints after the compact contract line; the driver "
        "tail-captures merged stdout+stderr and will lose the line"
    )


def test_bench_query_names_are_registered():
    from incremental_etl_on_lakehouse_spark.queries import QUERIES

    missing = [n for n in bench.BENCH_QUERIES if n not in QUERIES]
    assert not missing, f"bench names not in QUERIES registry: {missing}"
