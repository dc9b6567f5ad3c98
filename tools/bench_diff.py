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

``--check-inversions FILE`` (round-10, r9 VERDICT item 3: BOTH of this
repo's real perf bugs — q39 r8, q05 r9 — manifested as warm>cold
inversions that the cold-only sf0.1 comparison never saw): reads a bench
JSON carrying ``queries`` + ``queries_warm`` and flags every query whose
warm median exceeds ``--inversion-factor`` (default 1.5) x its cold
time with more than abs_floor of absolute growth. A warm run on an
emptied block manager should never be materially SLOWER than cold —
when it is, session state is leaking into the measurement or the engine
is re-doing work, and that class must fail the gate, not hide under a
reporting bar. Exempt via ``bench-inversion-ok: qname — reason`` in
BASELINE.md. Run it on the sf1 tier record too — that is where both
historical inversions lived.

Exit status: 0 clean / 1 unexempted regressions or inversions /
2 usage error.
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


def baseline_exemptions(tag: str = "bench-regression-ok") -> set[str]:
    """Query names documented under the given exemption tag in
    BASELINE.md (``bench-regression-ok`` / ``bench-inversion-ok``)."""
    p = ROOT / "BASELINE.md"
    if not p.exists():
        return set()
    return set(re.findall(rf"{tag}:\s*(q\w+)", p.read_text()))


def load_box(path: str) -> dict | None:
    """Box-state record (bench.py's round-11 ``box`` field: loadavg,
    wall-vs-CPU, other-process busy fraction) from a bench JSON —
    looking inside a driver-wrapper ``tail`` string when needed.
    Returns None for markdown inputs or pre-r11 records."""
    try:
        text = Path(path).read_text().lstrip()
        if not text.startswith("{"):
            return None
        try:
            obj = json.loads(text)
        except json.JSONDecodeError:
            obj = json.loads(text.splitlines()[0])
        if isinstance(obj.get("box"), dict):
            return obj["box"]
        # box holds scalars and flat lists only, so a brace-free regex
        # is enough to cut it out of a truncated driver tail
        m = re.search(r'"box":\s*(\{[^{}]*\})', obj.get("tail", ""))
        return json.loads(m.group(1)) if m else None
    except (OSError, ValueError):
        return None


def annotate_box(label: str, path: str, load_max: float,
                 other_max: float) -> bool:
    """Print one box-state line for a compared run; returns True when the
    run was contended (start loadavg or other-process CPU above the
    thresholds) — the r10 driver-record-vs-idle-replication class."""
    box = load_box(path)
    if box is None:
        print(f"  box[{label}]: no box-state record in {path} "
              f"(pre-r11 bench or markdown input)")
        return False
    la = float((box.get("loadavg_before") or [0.0])[0])
    other = float(box.get("other_busy_frac") or 0.0)
    flags = []
    if la > load_max:
        flags.append(f"start loadavg {la:.2f} > {load_max:g}")
    if other > other_max:
        flags.append(f"other-process cpu {other:.1%} > {other_max:.0%}")
    state = ("CONTENDED — comparison unreliable: " + "; ".join(flags)
             if flags else "idle")
    print(f"  box[{label}]: {state} (load {la:.2f}, "
          f"other {other:.1%}, wall {box.get('wall_sec', '?')}s)")
    return bool(flags)


def calib_factor(old_path: str, new_path: str) -> float | None:
    """Box-speed ratio new/old from the fixed-work calibration probes
    (bench.py round-12: ``calib_cpu_sec`` + ``calib_shuffle_sec`` in the
    box record). >1 means the NEW box ran the identical probe workload
    slower — every query wall is expected to inflate by roughly that
    factor for host reasons, so the gate divides NEW walls by it before
    comparing (r11 VERDICT item 1: normalize cross-day host shifts by
    data instead of blanket exemptions). Geometric mean of the two
    probes — CPU speed and JVM/scheduler/exchange throughput are
    distinct axes and a host shift can move either.

    Fallback for records predating the probes: when BOTH sides are
    paired-bench records carrying ``duckdb_total_sec``, uses
    duck_new/duck_old — the DuckDB oracle is frozen code running the
    identical workload in the same session, i.e. a measured box-speed
    probe on the exact query mix (this is how the r11->r12 cross-day
    shift was pinned). Returns None when neither source is available."""
    ob, nb = load_box(old_path), load_box(new_path)
    try:
        ratios = [nb[k] / ob[k]
                  for k in ("calib_cpu_sec", "calib_shuffle_sec")]
        return (ratios[0] * ratios[1]) ** 0.5
    except (TypeError, KeyError, ZeroDivisionError):
        pass
    def _duck_total(path: str) -> float:
        text = Path(path).read_text().lstrip()
        try:
            obj = json.loads(text)
        except json.JSONDecodeError:
            obj = json.loads(text.splitlines()[0])
        return obj["duckdb_total_sec"]

    try:
        o, n = _duck_total(old_path), _duck_total(new_path)
        if o > 0 and n > 0:
            print(f"bench_diff: calib probes absent on one side — using "
                  f"frozen-oracle duck totals {o:.2f}s -> {n:.2f}s as the "
                  f"box-speed probe")
            return n / o
    except (OSError, KeyError, ValueError, IndexError):
        pass
    return None


def check_inversions(path: str, factor: float, abs_floor: float,
                     allow: set[str]) -> int:
    """Flag warm-median > factor x cold in one bench JSON (docstring:
    the warm>cold inversion class). Returns count of unexempted flags."""
    text = Path(path).read_text().lstrip()
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        obj = json.loads(text.splitlines()[0])
    cold = obj.get("queries") or obj.get("spark_queries")
    warm = obj.get("queries_warm") or obj.get("spark_queries_warm")
    if not cold or not warm:
        raise ValueError(f"{path}: needs queries + queries_warm "
                         f"(or the paired spark_* variants)")
    exempt = allow | baseline_exemptions("bench-inversion-ok")
    flagged, exempted = [], []
    for q in sorted(set(cold) & set(warm)):
        c, w = cold[q], warm[q]
        if w > c * factor and (w - c) > abs_floor:
            (exempted if q in exempt else flagged).append((q, c, w))
    print(f"bench_diff inversions: {len(flagged)} flagged | "
          f"{len(exempted)} exempted (warm > {factor:.2f}x cold)")
    for q, c, w in exempted:
        print(f"  EXEMPT  {q}: cold {c:.3f}s, warm {w:.3f}s "
              f"({w / c:.2f}x, documented)")
    for q, c, w in flagged:
        print(f"  INVERT  {q}: cold {c:.3f}s, warm {w:.3f}s "
              f"({w / c:.2f}x) — a warm run on an emptied block manager "
              f"must not be slower; root-cause it or add "
              f"'bench-inversion-ok: {q} — reason' to BASELINE.md")
    return len(flagged)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", nargs="?")
    ap.add_argument("new", nargs="?")
    ap.add_argument("--threshold", type=float, default=0.30)
    ap.add_argument("--abs-floor", type=float, default=0.25,
                    help="seconds of absolute growth below which a "
                         "relative regression is treated as noise")
    ap.add_argument("--section", default=None,
                    help="regex picking the markdown table by heading")
    ap.add_argument("--allow", action="append", default=[])
    ap.add_argument("--check-inversions", default=None, metavar="FILE",
                    help="bench JSON (queries + queries_warm) to scan "
                         "for warm>cold inversions")
    ap.add_argument("--inversion-factor", type=float, default=1.5)
    ap.add_argument("--load-max", type=float, default=2.0,
                    help="start 1-min loadavg above which a compared "
                         "run is annotated CONTENDED")
    ap.add_argument("--other-busy-max", type=float, default=0.05,
                    help="other-process CPU fraction above which a "
                         "compared run is annotated CONTENDED")
    ap.add_argument("--calibrate", action="store_true",
                    help="divide NEW walls by the box-speed factor "
                         "measured by the fixed-work calibration probes "
                         "before comparing (needs calib_* in both box "
                         "records)")
    args = ap.parse_args()

    # exactly ONE positional is always a miswritten invocation (e.g. NEW
    # forgotten) — refuse instead of silently skipping the comparison
    if bool(args.old) != bool(args.new):
        ap.error("exactly one of OLD/NEW given — pass both, or neither "
                 "with --check-inversions")

    inv_flagged = 0
    if args.check_inversions:
        try:
            inv_flagged = check_inversions(
                args.check_inversions, args.inversion_factor,
                args.abs_floor, set(args.allow))
        except (ValueError, OSError, IndexError,
                json.JSONDecodeError) as e:
            print(f"bench_diff: {e!r}", file=sys.stderr)
            return 2
        if not (args.old and args.new):
            return 1 if inv_flagged else 0

    if not (args.old and args.new):
        ap.error("OLD and NEW required unless --check-inversions alone")
    try:
        old = load_bench(args.old, args.section)
        new = load_bench(args.new, args.section)
    except (ValueError, json.JSONDecodeError) as e:
        print(f"bench_diff: {e}", file=sys.stderr)
        return 2

    norm = 1.0
    if args.calibrate:
        f = calib_factor(args.old, args.new)
        if f is None:
            print("bench_diff: --calibrate requested but calib_* probes "
                  "missing from one side — comparing raw walls")
        else:
            norm = f
            print(f"bench_diff: box-speed factor new/old = {f:.3f} "
                  f"(fixed-work probes) — NEW walls divided by it")

    exempt = set(args.allow) | baseline_exemptions()
    shared = sorted(set(old) & set(new))
    regressions, exempted, improved = [], [], 0
    for q in shared:
        o, n = old[q], new[q] / norm
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
    annotate_box("old", args.old, args.load_max, args.other_busy_max)
    annotate_box("new", args.new, args.load_max, args.other_busy_max)
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
    return 1 if (regressions or inv_flagged) else 0


if __name__ == "__main__":
    sys.exit(main())
