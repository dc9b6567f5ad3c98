"""Round-12 optimization measurement harness (guide §1).

For each named query (default: all registered) at $SPARK_GRAFT_SF_DIR:
- warm the plan shape once at sf0.001 (Janino codegen, JIT),
- time N repeats of the full computation through the NOOP SINK
  (guide §1.4 — computes every column of every row, no driver
  transfer), labelled via setJobDescription,
- optionally also time the bench's toArrow() action for comparability,
- write .explain("formatted") to plans/r12/<query>_<tag>.txt.

Usage:
  python tools/opt_measure.py [--tag before|after] [--sf DIR]
      [--runs N] [--no-plans] [--arrow] [query ...]

Prints one line per query: name, noop median, [arrow median,] runs.
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_transparencia_sergipe_spark.caching import release_all
from etl_transparencia_sergipe_spark.session import get_spark
import __spark_entry__ as entrymod


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = 3
    write_plans = True
    time_arrow = False
    plans_sub = "r13"
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--sf":
            sf_dir = next(it)
        elif a == "--runs":
            runs = int(next(it))
        elif a == "--no-plans":
            write_plans = False
        elif a == "--arrow":
            time_arrow = True
        elif a == "--plans-dir":
            plans_sub = next(it)
        else:
            names.append(a)

    spark = get_spark("opt-measure", extra_conf={
        "spark.cleaner.periodicGC.interval": "60min"})
    qs = entrymod.queries()
    if not names:
        names = list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    plans_dir = Path(__file__).resolve().parent.parent / "plans" / plans_sub
    plans_dir.mkdir(parents=True, exist_ok=True)

    # one warm pass per table + per plan shape at the tiny SF
    from etl_transparencia_sergipe_spark.sources.catalog import TABLES, load_table
    for t in TABLES:
        load_table(spark, t, sf_dir).count()
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            qs[name](spark, warm_dir).write.format("noop").mode(
                "overwrite").save()
        except Exception:
            pass
    spark.catalog.clearCache()
    release_all(spark)

    for name in names:
        sc = spark.sparkContext
        if write_plans:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (plans_dir / f"{name}_{tag}.txt").write_text(plan)
        noop_times: list[float] = []
        arrow_times: list[float] = []
        for i in range(runs):
            sc.setJobDescription(f"{name} noop run {i}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            noop_times.append(time.perf_counter() - t0)
            release_all(spark)
        if time_arrow:
            for i in range(runs):
                sc.setJobDescription(f"{name} arrow run {i}")
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                try:
                    df.toArrow()
                except Exception:
                    df.collect()
                arrow_times.append(time.perf_counter() - t0)
                release_all(spark)
        sc.setJobDescription(None)
        med = statistics.median(noop_times)
        line = (f"{name}\tnoop={med:.3f}"
                f"\tmin={min(noop_times):.3f}\tmax={max(noop_times):.3f}")
        if time_arrow:
            line += f"\tarrow={statistics.median(arrow_times):.3f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
