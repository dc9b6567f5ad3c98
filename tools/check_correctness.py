"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and an
order-insensitive value hash (column-name-sorted, row-sorted string render
with float rounding). Exits nonzero on any mismatch.

Usage: python tools/check_correctness.py [sf_dir] [query ...]

SPARK_GRAFT_ORACLE_TIMEOUT=<sec>: cap each DuckDB oracle's wall via
``con.interrupt()`` from a watchdog timer. A timed-out oracle records a
rows-only line (``ROWS ... oracle timeout``) instead of a failure — the
round-7 sf10 full-surface contract: oracle walls at sf10 reach tens of
minutes for the recursive/self-join twins (the ORACLE's cost, not the
engine's); such queries fall back to rows-only with their sf1 hash
cited in CORRECTNESS_LOCAL.md. Unset or 0 = no cap (driver parity).
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import threading
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_transparencia_sergipe_spark.caching import release_all
from etl_transparencia_sergipe_spark.plans import registry
from etl_transparencia_sergipe_spark.session import get_spark
from etl_transparencia_sergipe_spark.sources.catalog import TABLES

import __spark_entry__ as entrymod


def canonical(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]

    def render(v):
        import decimal

        if isinstance(v, decimal.Decimal):
            v = float(v)
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            # Full-precision shortest round-trip repr (17 sig figs when
            # needed) — 6-sig-fig rendering masked exactly the class of
            # cross-engine rounding divergence the driver's hash catches
            # (q36, round 1).
            return repr(v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    rows = sorted(
        ",".join(render(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, build in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = build(spark, sf_dir).toPandas()
            release_all(spark)  # bound accumulated persists + checkpoints
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        t_spark = time.time() - t0
        qd = registry.REGISTRY.get(name)
        has_py_oracle = qd is not None and qd.oracle_py is not None
        # driver-mirror mode (round-12): the driver knows nothing of
        # oracle_py — it runs exactly what oracle_sql() publishes. Set
        # SPARK_GRAFT_PREFER_SQL=1 to take the same path here, e.g. to
        # certify the trained-ANN family's GENERATED literal-constant
        # SQL (oracle_gen) end-to-end before the driver does.
        if os.environ.get("SPARK_GRAFT_PREFER_SQL") and name in oracles:
            has_py_oracle = False
        if name not in oracles and not has_py_oracle:
            bc = qd.bound_check if qd is not None else None
            if bc is not None:
                # bounded-error verification (r10 VERDICT item 4): the
                # rows-only-by-design approximates must stay inside their
                # documented error bound or the gate FAILS — an estimate
                # drifting to 50% error no longer hides in a ROWS line
                try:
                    berr = bc(sdf, con)
                except Exception as e:  # noqa: BLE001
                    berr = f"bound-check error: {e!r}"
                if berr:
                    failures.append(name)
                    print(f"FAIL  {name}: {berr}")
                else:
                    print(f"OKB   {name}: {len(sdf)} rows, bounded-error "
                          f"verified [{t_spark:.1f}s]")
                continue
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) "
                  f"[{t_spark:.1f}s]")
            continue
        t1 = time.time()
        timeout = float(os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "0")
                        or 0)

        def run_oracle():
            # per-query python oracle override (registry.QueryDef
            # .oracle_py): same semantics as the SQL oracle, tractable
            # complexity at sf>=1 (q38/q39's iterative CC oracle) or no
            # pure-SQL form at all (q62's data-dependent iteration
            # count); where a SQL form exists the driver still runs it
            # at sf0.01
            if has_py_oracle:
                return qd.oracle_py(con)
            return con.execute(oracles[name]).fetchdf()

        odf = None
        oracle_err = None
        oracle_timed_out = False
        # two attempts: a watchdog that fires AFTER its oracle completed
        # leaves duckdb's interrupt flag set, which spuriously interrupts
        # the NEXT statement — retry distinguishes that from a real
        # timeout (its own watchdog set the event) or a real error
        for _attempt in range(2):
            timed_out = threading.Event()

            def _interrupt(ev=timed_out):
                ev.set()
                con.interrupt()

            watchdog = (threading.Timer(timeout, _interrupt)
                        if timeout > 0 else None)
            if watchdog is not None:
                watchdog.start()
            try:
                odf = run_oracle()
                oracle_err = None
                break
            except Exception as e:  # noqa: BLE001
                if timed_out.is_set():
                    oracle_timed_out = True
                    break
                oracle_err = e
                if "INTERRUPT" not in str(e).upper():
                    break  # real error — don't retry
            finally:
                if watchdog is not None:
                    watchdog.cancel()
        if oracle_timed_out:
            print(f"ROWS  {name}: {len(sdf)} rows (oracle timeout "
                  f">{timeout:.0f}s) [spark {t_spark:.1f}s]")
            continue
        if oracle_err is not None:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {oracle_err}")
            continue
        t_duck = time.time() - t1
        sn, sc, sh = canonical(sdf)
        on, oc, oh = canonical(odf)
        status = "OK  " if (sn, sc, sh) == (on, oc, oh) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{status}  {name}: spark={sn} rows {sh} | duck={on} rows {oh}"
              f" [{time.time()-t0:.1f}s = spark {t_spark:.1f}s"
              f" + duck {t_duck:.1f}s]")
        if status == "FAIL":
            if sc != oc:
                print(f"      cols spark={sc}\n      cols duck ={oc}")
            elif sn == on:
                cols = sorted(sdf.columns)
                merged = sdf[cols].sort_values(cols).reset_index(drop=True)
                omerged = odf[cols].sort_values(cols).reset_index(drop=True)
                diff = (merged.astype(str) != omerged.astype(str)).any(axis=1)
                print("      first diffs (spark vs duck):")
                print(merged[diff].head(3).to_string())
                print(omerged[diff].head(3).to_string())

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
