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

from etl_transparencia_sergipe_spark.caching import release_all, reclaim_disk
from etl_transparencia_sergipe_spark.session import get_spark

import __spark_entry__ as entrymod
from bench import bench_names


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
        # hoisted to caching.reclaim_disk in round 12 (bench.py
        # hit the same ENOSPC class); sweep posture = 2 settle passes
        reclaim_disk(spark)

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
