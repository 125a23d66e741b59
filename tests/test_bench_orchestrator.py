"""bench.py orchestrator mechanics (no jax, no TPU).

Round 2 lost its driver perf number to a timeout mid-compile; these tests
pin the properties that prevent a repeat: every emit is a complete parseable
JSON line, stage subprocesses are killed at their budget and reported as
skipped instead of erroring the whole bench, and exhausted budgets
short-circuit without spawning work.
"""

import io
import json
import sys
from contextlib import redirect_stdout

import bench


def test_emit_always_complete_json():
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.emit({"value": 123.4, "train": {"steps_per_s": 7.0}})
        bench.emit({})  # even with no measurements yet
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 2
    for ln in lines:
        d = json.loads(ln)
        assert d["metric"] == "audio_seconds_per_sec_per_chip"
        assert "value" in d and "vs_baseline" in d and "unit" in d
    assert json.loads(lines[0])["vs_baseline"] == 12.34


def test_run_stage_parses_last_json_line():
    res = bench.run_stage(
        "fake", 30,
        _cmd=[sys.executable, "-c",
              "print('noise'); print('{\"bad\"'); "
              "print('{\"value\": 7}')"],
        _min_timeout=0)
    assert res == {"value": 7}


def test_run_stage_kills_on_timeout():
    res = bench.run_stage(
        "sleepy", 2,
        _cmd=[sys.executable, "-c", "import time; time.sleep(60)"],
        _min_timeout=0)
    assert "skipped" in res and "sleepy" in res["skipped"]


def test_run_stage_reports_subprocess_failure():
    res = bench.run_stage(
        "boom", 30,
        _cmd=[sys.executable, "-c", "raise SystemExit(3)"],
        _min_timeout=0)
    assert res == {"error": "boom subprocess rc=3"}


def test_run_stage_skips_on_exhausted_budget():
    res = bench.run_stage("late", 5)  # below the 30s minimum
    assert "skipped" in res


def test_run_stage_salvages_partial_json_on_timeout():
    """A stage killed mid-work must not lose JSON lines it already printed
    (VERDICT r4: train wall numbers died with the device-loop compile)."""
    res = bench.run_stage(
        "slowpoke", 10,  # interpreter startup alone is ~3.5s on this host
        _cmd=[sys.executable, "-u", "-c",
              "import time; print('{\"steps_per_s\": 5.0}', flush=True); "
              "time.sleep(60)"],
        _min_timeout=0)
    assert res["steps_per_s"] == 5.0
    assert res["stage_killed_at_s"] == 10
