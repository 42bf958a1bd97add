"""bench.py headline-size contract (r11, VERDICT #1).

The driver records only the TAIL of bench stdout (~2000 chars).
BENCH_r05 and BENCH_r10 both went `parsed: null` when the final JSON
line outgrew that window — the automated perf gate was blind for the
round.  These tests pin the contract at WORST-CASE widths so that
adding a workload breaks a unit test instead of the driver's parse.
No SparkSession needed: build_headline is pure."""

import json

import pytest

import bench


def _worst_case_parts():
    # every op present, every value at its widest plausible JSON width:
    # 5-digit seconds (99999.99 > any sane local bench), 4-digit ratios
    timings = {n: 99999.99 for n in bench.WORKLOAD_ORDER}
    vsb = {n: 999.99 for n in bench.BASELINE_SEC}
    return 999999.999, timings, vsb, dict(vsb)


def test_headline_fits_tail_window():
    total, timings, vsb, vsbn = _worst_case_parts()
    line = bench.build_headline(total, timings, vsb, vsbn, 0.1)
    assert len(line) <= bench.HEADLINE_MAX_CHARS
    assert "\n" not in line


def test_headline_round_trips_and_is_complete():
    total, timings, vsb, vsbn = _worst_case_parts()
    rec = json.loads(bench.build_headline(total, timings, vsb, vsbn, 0.1))
    assert rec["metric"] == "total_sec" and rec["unit"] == "sec"
    assert set(rec["queries"]) == set(bench.WORKLOAD_ORDER)
    assert set(rec["vs_baseline"]) == set(bench.BASELINE_SEC)
    assert set(rec["vs_baseline_normalized"]) == set(bench.BASELINE_SEC)
    assert rec["sf"] == 0.1
    # values survive the 2-decimal rounding as numbers (or None for a
    # crashed op — the driver distinguishes missing from failed)
    t2 = dict(timings, full_scan=None)
    rec2 = json.loads(bench.build_headline(total, t2, vsb, vsbn, 0.1))
    assert rec2["queries"]["full_scan"] is None


def test_headline_overflow_fails_loudly():
    # the guard must trip BEFORE the driver goes blind: 200 fake ops
    total, timings, vsb, vsbn = _worst_case_parts()
    fat = {f"workload_{i:03d}_with_a_long_name": 99999.99
           for i in range(200)}
    with pytest.raises(AssertionError, match="headline"):
        bench.build_headline(total, fat, vsb, vsbn, 0.1)
