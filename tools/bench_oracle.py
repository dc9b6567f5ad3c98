"""DuckDB oracle timings for the same bench set — the BASELINE
stand-in (the reference publishes no benchmarks; BASELINE.md §'Engine
bench target'). Prints one JSON line shaped like bench.py's.

Uses the same bench-set selection env vars as bench.py (full surface by
default); only oracle-backed queries are timed. Queries with a python
oracle override (registry ``oracle_py`` — q38/q39's iterative CC loop)
are timed through it, with the cross-query labels cache cleared first so
each query pays its own full oracle cost (no cache-sharing skew in the
per-query ratios).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from bench import bench_names


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    from etl_transparencia_sergipe_spark.plans import cc_oracle, registry
    # bench measures the oracle DOING the clustering work — the disk
    # cache is gate-only (see cc_oracle.DISK_CACHE_ENABLED)
    cc_oracle.DISK_CACHE_ENABLED = False
    from etl_transparencia_sergipe_spark.sources.catalog import TABLES
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracles = entrymod.oracle_sql()

    def has_oracle(n: str) -> bool:
        qd = registry.REGISTRY.get(n)
        return n in oracles or (qd is not None and qd.oracle_py is not None)

    names = [n for n in bench_names(entrymod.queries()) if has_oracle(n)]

    def run(n: str) -> None:
        qd = registry.REGISTRY.get(n)
        if qd is not None and qd.oracle_py is not None:
            cc_oracle._CC_CACHE.clear()
            qd.oracle_py(con)
        else:
            # .arrow(): same columnar client-materialization path as the
            # Spark bench's toArrow() — see bench.py methodology note
            con.execute(oracles[n]).arrow()

    run(names[0])  # warmup

    timings = {}
    for n in names:
        t0 = time.perf_counter()
        run(n)
        timings[n] = round(time.perf_counter() - t0, 3)
    print(json.dumps({
        "metric": "duckdb_oracle_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
