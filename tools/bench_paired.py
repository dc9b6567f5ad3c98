"""Paired same-session bench — one command, both engines, one verdict.

Round-1 lesson: Spark and DuckDB totals recorded hours apart drifted
enough (the oracle's MinHash query alone swings 8.0-11.5 s run-to-run)
that the 2x pass criterion became ambiguous. This script runs bench.py
(Spark) and tools/bench_oracle.py (DuckDB) back-to-back against the same
sf dir and file-cache state, then prints ONE combined JSON line with both
totals and per-query ratios, plus a ready-to-paste markdown table for
BASELINE.md.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_paired.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run_bench(script: str) -> dict:
    proc = subprocess.run(
        [sys.executable, str(ROOT / script)],
        capture_output=True, text=True, env=os.environ, cwd=ROOT,
    )
    lines = [ln for ln in proc.stdout.strip().splitlines()
             if ln.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"{script} produced no JSON line:\n{proc.stdout}\n{proc.stderr}")
    return json.loads(lines[-1])


def main() -> None:
    spark = run_bench("bench.py")
    duck = run_bench("tools/bench_oracle.py")

    warm = spark.get("queries_warm", {})
    ratios = {}
    ratios_warm = {}
    for name, s in spark["queries"].items():
        d = duck["queries"].get(name)
        ratios[name] = round(s / d, 2) if d else None
        w = warm.get(name)
        ratios_warm[name] = round(w / d, 2) if (d and w is not None) else None
    combined = {
        "metric": "paired_bench",
        "sf": spark["sf"],
        "spark_total_sec": spark["value"],
        "spark_total_warm_sec": spark.get("value_warm"),
        "duckdb_total_sec": duck["value"],
        "ratio": round(spark["value"] / duck["value"], 3),
        "ratio_warm": (round(spark["value_warm"] / duck["value"], 3)
                       if spark.get("value_warm") else None),
        "pass_2x": spark["value"] <= 2 * duck["value"],
        "spark_queries": spark["queries"],
        "spark_queries_warm": warm,
        "duckdb_queries": duck["queries"],
        "ratios": ratios,
        "ratios_warm": ratios_warm,
        # box-state record (round-11): propagate bench.py's contention
        # fields so paired records are annotatable by bench_diff too
        "box": spark.get("box"),
    }
    print(json.dumps(combined))

    # markdown table for BASELINE.md: cold single-shot (drift-gate
    # continuity column) AND warm steady-state (the >2x-class column)
    print(f"\n| query | spark cold s | spark warm s | duckdb s "
          f"| cold ratio | warm ratio |", file=sys.stderr)
    print("|---|---|---|---|---|---|", file=sys.stderr)
    for name, s in spark["queries"].items():
        d = duck["queries"].get(name)
        w = warm.get(name)
        rc = f"{s / d:.2f}x" if d else "(no oracle)"
        rw = f"{w / d:.2f}x" if (d and w is not None) else "-"
        ds = f"{d:.3f}" if d else "-"
        ws = f"{w:.3f}" if w is not None else "-"
        print(f"| {name} | {s:.3f} | {ws} | {ds} | {rc} | {rw} |",
              file=sys.stderr)
    wtot = spark.get("value_warm")
    wts = f"**{wtot:.2f}**" if wtot else "-"
    wr = (f"**{wtot / duck['value']:.2f}x**" if wtot else "-")
    print(f"| **total** | **{spark['value']:.2f}** | {wts} | "
          f"**{duck['value']:.2f}** | "
          f"**{spark['value'] / duck['value']:.2f}x** | {wr} |",
          file=sys.stderr)


if __name__ == "__main__":
    main()
