"""bench_diff drift gate (tools/bench_diff.py) — pure text/JSON, no
Spark. Pins: JSON + markdown parsing, threshold + absolute-floor
regression logic, exemption via --allow, section selection, exit codes.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
TOOL = str(ROOT / "tools" / "bench_diff.py")


def _run(*args):
    return subprocess.run([sys.executable, TOOL, *args],
                          capture_output=True, text=True)


def _write_json(p, queries):
    p.write_text(json.dumps({"metric": "bench", "value": sum(
        queries.values()), "queries": queries, "sf": 0.1}) + "\n")


def test_clean_run_exits_zero(tmp_path):
    old, new = tmp_path / "old.json", tmp_path / "new.json"
    _write_json(old, {"q01": 1.0, "q02": 2.0})
    _write_json(new, {"q01": 1.1, "q02": 1.9})
    r = _run(str(old), str(new))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "0 regressions" in r.stdout


def test_regression_fails(tmp_path):
    old, new = tmp_path / "old.json", tmp_path / "new.json"
    _write_json(old, {"q01": 1.0})
    _write_json(new, {"q01": 2.0})
    r = _run(str(old), str(new))
    assert r.returncode == 1
    assert "REGRESS q01" in r.stdout


def test_abs_floor_suppresses_tiny_noise(tmp_path):
    """0.05s -> 0.10s is 2x relative but under the absolute floor."""
    old, new = tmp_path / "old.json", tmp_path / "new.json"
    _write_json(old, {"q01": 0.05})
    _write_json(new, {"q01": 0.10})
    assert _run(str(old), str(new)).returncode == 0


def test_allow_exempts(tmp_path):
    old, new = tmp_path / "old.json", tmp_path / "new.json"
    _write_json(old, {"q01": 1.0})
    _write_json(new, {"q01": 2.0})
    r = _run(str(old), str(new), "--allow", "q01")
    assert r.returncode == 0
    assert "EXEMPT" in r.stdout


def test_markdown_table_and_section(tmp_path):
    md_old = tmp_path / "old.md"
    md_old.write_text(
        "# tables\n\n## sf0.1 run\n\n| query | spark s | duckdb s |\n"
        "|---|---|---|\n| q01 | 1.000 | 0.1 |\n| q02 | 2.000 | 0.2 |\n"
        "\n## sf1 run\n\n| query | spark s |\n|---|---|\n"
        "| q01 | 10.000 |\n")
    new = tmp_path / "new.json"
    _write_json(new, {"q01": 9.0})
    # first table: 1.0 -> 9.0 is a regression
    assert _run(str(md_old), str(new)).returncode == 1
    # sf1 section: 10.0 -> 9.0 is an improvement
    assert _run(str(md_old), str(new), "--section", "sf1").returncode == 0


def test_mismatched_query_sets_reported_not_fatal(tmp_path):
    old, new = tmp_path / "old.json", tmp_path / "new.json"
    _write_json(old, {"q01": 1.0, "q03": 1.0})
    _write_json(new, {"q01": 1.0, "q04": 1.0})
    r = _run(str(old), str(new))
    assert r.returncode == 0
    assert "q03" in r.stdout and "q04" in r.stdout


def _write_warm_json(p, cold, warm):
    p.write_text(json.dumps({"metric": "bench", "value": sum(cold.values()),
                             "queries": cold, "queries_warm": warm,
                             "sf": 1.0}) + "\n")


def test_inversion_flagged(tmp_path):
    """warm > 1.5x cold with >abs-floor growth fails the gate (the q39
    r8 / q05 r9 signature)."""
    rec = tmp_path / "bench.json"
    _write_warm_json(rec, {"q05": 2.309, "q06": 1.0},
                     {"q05": 6.906, "q06": 0.7})
    r = _run("--check-inversions", str(rec))
    assert r.returncode == 1
    assert "INVERT  q05" in r.stdout and "q06" not in r.stdout


def test_inversion_clean_and_floor(tmp_path):
    """Healthy warm<=cold passes; a 2x inversion on a 0.1s query is
    under the absolute floor and passes too."""
    rec = tmp_path / "bench.json"
    _write_warm_json(rec, {"q01": 1.0, "q02": 0.10},
                     {"q01": 0.8, "q02": 0.20})
    r = _run("--check-inversions", str(rec))
    assert r.returncode == 0
    assert "0 flagged" in r.stdout


def test_inversion_allow_exempts(tmp_path):
    rec = tmp_path / "bench.json"
    _write_warm_json(rec, {"q05": 2.0}, {"q05": 6.9})
    r = _run("--check-inversions", str(rec), "--allow", "q05")
    assert r.returncode == 0
    assert "EXEMPT" in r.stdout


def test_inversion_composes_with_comparison(tmp_path):
    """--check-inversions plus OLD/NEW: a clean comparison still fails
    when the new record carries an inversion."""
    old, new = tmp_path / "old.json", tmp_path / "new.json"
    _write_json(old, {"q05": 2.0})
    _write_warm_json(new, {"q05": 2.0}, {"q05": 6.9})
    r = _run(str(old), str(new), "--check-inversions", str(new))
    assert r.returncode == 1
    assert "INVERT  q05" in r.stdout and "0 regressions" in r.stdout
