"""Per-query resilient bench: like bench.py but survives per-query
failures (records the error instead of dying) — used for scale-point
runs where a query may expose a genuine at-scale defect that must be
recorded, not mask the rest of the tier.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_BENCH_QUERIES=a,b,c \
       python tools/bench_resilient.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_transparencia_sergipe_spark.caching import release_all
from etl_transparencia_sergipe_spark.session import get_spark

import __spark_entry__ as entrymod
from bench import bench_names


def _reclaim_disk(spark, floor_free_gib: float = 30.0,
                  max_wait_s: float = 60.0) -> None:
    """Drive dead shuffle files to actual DELETION before the next query
    writes (round-11, diagnosed by the sf10 ENOSPC sweep): shuffle
    cleanup is a four-stage relay — Python refs dropped (cycles need an
    explicit gc.collect(); py4j detach only runs from __del__) -> JVM GC
    collects the detached Datasets, making their AQE-materialized
    ShuffleDependencies weakly reachable -> ContextCleaner's reference
    queue drains -> ASYNC file deletion. A single System.gc() hint with
    no settle time loses the race against the next query's writes, and
    the backlog compounds across a 64-query tier (measured: 42 GiB of
    shuffle ids 29-492 still on disk mid-sweep, flat across boundaries).
    Two GC passes with settle sleeps reclaim reliably (measured on the
    leak probe); when free disk is still under ``floor_free_gib`` keep
    nudging up to ``max_wait_s`` — boundary time is not query time."""
    import gc
    import shutil
    import time as _t

    gc.collect()
    deadline = _t.time() + max_wait_s
    for i in range(8):
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            return
        _t.sleep(3.0)
        if i >= 1:  # two passes minimum, then only under disk pressure
            try:
                free_gib = shutil.disk_usage("/tmp").free / 2**30
            except OSError:
                return
            if free_gib >= floor_free_gib or _t.time() > deadline:
                return


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench-resilient")
    qs = entrymod.queries()
    names = bench_names(qs)

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            qs[name](spark, warm_dir).collect()
        except Exception:  # noqa: BLE001
            pass
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            try:
                df.toArrow()
            except Exception as e:  # noqa: BLE001
                # Arrow-unsupported type falls back; real errors re-raise
                if "UNSUPPORTED" in str(e).upper():
                    df.collect()
                else:
                    raise
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            errors[name] = str(e).split("\n")[0][:300]
            timings[name] = round(time.perf_counter() - t0, 3)
        print(f"{name}: {timings[name]}s"
              + (f" ERROR {errors[name][:120]}" if name in errors else ""),
              file=sys.stderr, flush=True)
        # release_all, not bare clearCache (round-11): clearCache leaves
        # every CC-tier query's FINAL localCheckpoint blocks registered
        # (MEMORY_AND_DISK — they spill to disk at sf10 sizes), so the
        # between-query disk floor crept 16.6 -> 47.7 GiB across the r11
        # 64-query sweep and q38/q39's own ~45 GiB in-query peak then
        # hit the box's ~94 GB capacity: their checkpoint writes died
        # with ENOSPC — the exact r5 defect class, reintroduced at the
        # tool layer (this tool never got bench.py's r9 release_all
        # upgrade).
        release_all(spark)
        _reclaim_disk(spark)

    print(json.dumps({
        "metric": "bench_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
