"""Bench drift gate — fail loudly when a query regresses between rounds.

Round-5 VERDICT ("What's missing #2"): BENCH history spans rounds and the
r3->r4 drift episode showed regressions hide in raw numbers — the paired
bench was run and eyeballed, but nothing failed if a query doubled. This
tool compares two bench records per-query and exits nonzero on any
regression above threshold that has no documented exemption, making
drift a gate instead of an observation.

Usage:
    python tools/bench_diff.py OLD NEW [--threshold 0.30]
        [--abs-floor 0.25] [--section REGEX] [--allow QNAME ...]

OLD / NEW are either:
  - JSON files holding one bench object (driver ``BENCH_rN.json`` format
    with ``queries``, or a paired-bench line with ``spark_queries``), or
  - markdown files containing ``| query | spark s | ... |`` tables
    (``BENCH_TABLES_rN.md``); ``--section`` picks the table whose nearest
    preceding heading matches the regex (default: first table).

A regression is: new > old * (1 + threshold) AND new - old > abs_floor
(the absolute floor keeps sub-second session noise from tripping the
gate). Exemptions: ``--allow qname`` or a line in BASELINE.md of the form
``bench-regression-ok: qname — reason`` (the documented-note contract).
Exit status: 0 clean / 1 unexempted regressions / 2 usage error.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _parse_markdown(text: str, section: str | None) -> dict[str, float]:
    """Pull {query: spark_sec} from the first (or --section-matched)
    markdown bench table."""
    heading = None
    tables: list[tuple[str, dict[str, float]]] = []
    cur: dict[str, float] | None = None
    for line in text.splitlines():
        if line.startswith("#"):
            heading = line.lstrip("#").strip()
            cur = None
            continue
        m = re.match(r"\|\s*(q\w+)\s*\|\s*([0-9.]+)\s*\|", line)
        if m:
            if cur is None:
                cur = {}
                tables.append((heading or "", cur))
            cur[m.group(1)] = float(m.group(2))
        elif cur is not None and not line.startswith("|"):
            cur = None
    if not tables:
        raise ValueError("no bench table found")
    if section:
        for h, t in tables:
            if re.search(section, h):
                return t
        raise ValueError(f"no table heading matches {section!r}; "
                         f"headings: {[h for h, _ in tables]}")
    return tables[0][1]


def load_bench(path: str, section: str | None) -> dict[str, float]:
    text = Path(path).read_text()
    stripped = text.lstrip()
    if stripped.startswith("{"):
        try:
            obj = json.loads(stripped)
        except json.JSONDecodeError:
            obj = json.loads(stripped.splitlines()[0])
        q = obj.get("queries") or obj.get("spark_queries")
        if q:
            return {k: float(v) for k, v in q.items()}
        # driver BENCH_rN.json wrapper: per-query times live inside a
        # (possibly head-truncated) stdout "tail" string — regex them out
        tail = obj.get("tail", "")
        pairs = re.findall(r'"(q\w+)":\s*([0-9.]+)', tail)
        if pairs:
            return {k: float(v) for k, v in pairs}
        raise ValueError(f"{path}: no queries/spark_queries/tail data")
    return _parse_markdown(text, section)


def baseline_exemptions() -> set[str]:
    """Query names documented as bench-regression-ok in BASELINE.md."""
    p = ROOT / "BASELINE.md"
    if not p.exists():
        return set()
    return set(re.findall(r"bench-regression-ok:\s*(q\w+)", p.read_text()))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.30)
    ap.add_argument("--abs-floor", type=float, default=0.25,
                    help="seconds of absolute growth below which a "
                         "relative regression is treated as noise")
    ap.add_argument("--section", default=None,
                    help="regex picking the markdown table by heading")
    ap.add_argument("--allow", action="append", default=[])
    args = ap.parse_args()

    try:
        old = load_bench(args.old, args.section)
        new = load_bench(args.new, args.section)
    except (ValueError, json.JSONDecodeError) as e:
        print(f"bench_diff: {e}", file=sys.stderr)
        return 2

    exempt = set(args.allow) | baseline_exemptions()
    shared = sorted(set(old) & set(new))
    regressions, exempted, improved = [], [], 0
    for q in shared:
        o, n = old[q], new[q]
        if n > o * (1 + args.threshold) and (n - o) > args.abs_floor:
            if q in exempt:
                exempted.append((q, o, n))
            else:
                regressions.append((q, o, n))
        elif n < o * (1 - args.threshold):
            improved += 1

    print(f"bench_diff: {len(shared)} shared queries | "
          f"{len(regressions)} regressions | {len(exempted)} exempted | "
          f"{improved} improved >{args.threshold:.0%}")
    for q, o, n in exempted:
        print(f"  EXEMPT  {q}: {o:.3f}s -> {n:.3f}s "
              f"({n / o:.2f}x, documented)")
    for q, o, n in regressions:
        print(f"  REGRESS {q}: {o:.3f}s -> {n:.3f}s ({n / o:.2f}x) — "
              f"fix it or add 'bench-regression-ok: {q} — reason' "
              f"to BASELINE.md")
    only_old = set(old) - set(new)
    only_new = set(new) - set(old)
    if only_old:
        print(f"  dropped from new run: {sorted(only_old)}")
    if only_new:
        print(f"  new queries (no prior): {sorted(only_new)}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
