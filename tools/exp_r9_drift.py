"""Round-9 VERDICT item 1: controlled A/B on the dedup/CC bench head.

BENCH_r08's warm total regressed 86.0 -> 99.4 s with flat visible
per-query sums, and q39 measured warm (8.94 s) > cold (7.63 s) at sf0.1
(BENCH_TABLES_r08.md) — suspicion: executor-state carry-over (the CC
tier's localCheckpoint blocks + shuffle files accumulate until the 2-min
periodic GC fires, so a query's "warm" run can be slower than its cold
run purely from session age). This experiment isolates that:

  mode seq   — bench-order context: q31, q38, q39, q97 each cold + 3
               warm runs in one session (the paired-bench neighborhood)
  mode solo  — fresh session, q39 alone: cold + 3 warm
  mode gc    — fresh session, q39 cold, then an explicit driver
               System.gc() before each warm run (tests the
               ContextCleaner hypothesis directly)

Timing protocol per bench-workflow rules: fresh DataFrame per timed run
(plan rebuilt), toArrow() materialization, one query at a time, nothing
else on the box.

Usage: python tools/exp_r9_drift.py <mode> [sf_dir]
Prints one JSON line per timed run.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _run(spark, name, build, sf_dir, label):
    t0 = time.time()
    build(spark, sf_dir).toArrow()
    dt = time.time() - t0
    print(json.dumps({"query": name, "label": label,
                      "sec": round(dt, 3)}), flush=True)
    return dt


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "seq"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from etl_transparencia_sergipe_spark.plans.registry import queries
    from etl_transparencia_sergipe_spark.session import get_spark

    extra = ({"spark.cleaner.periodicGC.interval": "60min"}
             if mode == "benchgc" else None)
    spark = get_spark(f"exp-r9-drift-{mode}", extra_conf=extra)
    qs = queries()
    # codegen warmup at sf0.001 (bench protocol)
    for n in ("q31_minhash_lsh_dedup", "q38_dedup_clusters",
              "q39_curation_keep_canonical", "q97_incremental_cc"):
        qs[n](spark, "/root/testdata/sf0.001").toArrow()

    if mode == "seq":
        for n in ("q31_minhash_lsh_dedup", "q38_dedup_clusters",
                  "q39_curation_keep_canonical", "q97_incremental_cc"):
            _run(spark, n, qs[n], sf_dir, "cold")
            for i in range(3):
                _run(spark, n, qs[n], sf_dir, f"warm{i}")
    elif mode == "bench":
        # the bench.py protocol post-fix: release_all (catalog caches +
        # localCheckpoint blocks) between timed runs, OUTSIDE the timer
        from etl_transparencia_sergipe_spark.caching import release_all
        for n in ("q31_minhash_lsh_dedup", "q38_dedup_clusters",
                  "q39_curation_keep_canonical", "q97_incremental_cc"):
            release_all(spark)
            _run(spark, n, qs[n], sf_dir, "cold")
            for i in range(3):
                release_all(spark)
                _run(spark, n, qs[n], sf_dir, f"warm{i}")
    elif mode == "benchgc":
        # bench + deterministic GC placement: System.gc() between timed
        # runs (so the ContextCleaner's work happens OUTSIDE the timer,
        # on a heap the release_all just emptied) — candidate protocol
        # for bench.py if it kills the q39 warm2-style mid-run GC spike
        from etl_transparencia_sergipe_spark.caching import release_all
        for n in ("q31_minhash_lsh_dedup", "q38_dedup_clusters",
                  "q39_curation_keep_canonical", "q97_incremental_cc"):
            for label in ("cold", "warm0", "warm1", "warm2"):
                release_all(spark)
                t0 = time.time()
                spark.sparkContext._jvm.System.gc()
                gc_s = round(time.time() - t0, 3)
                dt = _run(spark, n, qs[n], sf_dir, label)
                print(json.dumps({"query": n, "label": label + "+gcinfo",
                                  "gc_sec": gc_s}), flush=True)
    elif mode == "solo":
        n = "q39_curation_keep_canonical"
        _run(spark, n, qs[n], sf_dir, "cold")
        for i in range(3):
            _run(spark, n, qs[n], sf_dir, f"warm{i}")
    elif mode == "gc":
        n = "q39_curation_keep_canonical"
        _run(spark, n, qs[n], sf_dir, "cold")
        for i in range(3):
            spark.sparkContext._jvm.System.gc()
            time.sleep(2)
            _run(spark, n, qs[n], sf_dir, f"warm{i}+gc")
    else:
        raise SystemExit(f"unknown mode {mode}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
