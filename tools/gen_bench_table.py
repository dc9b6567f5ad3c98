"""Render a paired-bench JSON record as a BENCH_TABLES markdown table.

Usage: python tools/gen_bench_table.py RECORD.json [--sort]
Prints rows `| query | cold | warm | duck | cold ratio | warm ratio |`
in record (registry) order plus the totals row — the exact shape the
BENCH_TABLES_r{N}.md files carry, so the per-round table is generated
from the measurement instead of transcribed.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main() -> None:
    path = sys.argv[1]
    text = Path(path).read_text().lstrip()
    try:
        rec = json.loads(text)
    except json.JSONDecodeError:
        rec = json.loads(text.splitlines()[0])
    cold = rec["spark_queries"]
    warm = rec.get("spark_queries_warm", {})
    duck = rec["duckdb_queries"]
    names = sorted(cold) if "--sort" in sys.argv[2:] else list(cold)
    print("| query | spark cold s | spark warm s | duckdb s "
          "| cold ratio | warm ratio |")
    print("|---|---|---|---|---|---|")
    for q in names:
        c, w = cold[q], warm.get(q, float("nan"))
        d = duck.get(q)  # rows-only queries have no oracle twin
        cr = f"{c / d:.2f}x" if d else "-"
        wr = f"{w / d:.2f}x" if d else "-"
        ds = f"{d:.3f}" if d is not None else "-"
        print(f"| {q} | {c:.3f} | {w:.3f} | {ds} | {cr} | {wr} |")
    ct, wt, dt = (rec["spark_total_sec"], rec.get("spark_total_warm_sec"),
                  rec["duckdb_total_sec"])
    print(f"| **total** | **{ct:.2f}** | **{wt:.2f}** | **{dt:.2f}** | "
          f"**{ct / dt:.2f}x** | **{wt / dt:.2f}x** |")


if __name__ == "__main__":
    main()
