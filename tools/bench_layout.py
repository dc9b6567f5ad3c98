"""Layout end-to-end measurement (round-5 VERDICT item 6).

Builds a CLUSTERED copy of the big sf1 tables through the production
write path — compact_parquet(sort_cols=...) — and measures, before vs
after, (a) the footer-stats row-group skip fraction each query
predicate gets and (b) warm walls of q94/q19/q50 reading the two
layouts. Baseline is a plain compact_parquet rewrite of the SAME data
into the SAME file count (only row order differs), so the delta is
layout, not file sizing.

Clustering keys (the dominant pruning predicates):
  lineitem -> l_shipdate   (q94: l_shipdate > 1995-03-15)
  orders   -> o_orderdate  (q94: o_orderdate < 1995-03-15)
  events   -> ts           (streaming/event-time range scans)

Usage: python tools/bench_layout.py [sf_dir]  (default .scratch/sf1)
Prints one JSON line with skip fractions and per-query walls.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from etl_transparencia_sergipe_spark.corpus_pipeline import (  # noqa: E402
    compact_parquet,
)
from etl_transparencia_sergipe_spark.operators.layout import (  # noqa: E402
    rowgroup_skip_fraction,
)
from etl_transparencia_sergipe_spark.plans.registry import queries  # noqa: E402
from etl_transparencia_sergipe_spark.session import get_spark  # noqa: E402

CLUSTER_KEYS = {"lineitem": ["l_shipdate"], "orders": ["o_orderdate"],
                "events": ["ts"]}
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
QUERIES = ["q94_shipping_priority", "q19_percentiles",
           "q50_tumbling_window"]
N_FILES = 8


def build_copies(spark, sf_dir: str, base: str) -> tuple[str, str]:
    """(plain_dir, clustered_dir): big tables rewritten into N_FILES
    parquet files each — identical data + file count, order differs —
    everything else symlinked."""
    plain, clustered = os.path.join(base, "plain"), os.path.join(base, "clus")
    for root in (plain, clustered):
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root)
    for t in TABLES:
        src = os.path.abspath(os.path.join(sf_dir, f"{t}.parquet"))
        if t not in CLUSTER_KEYS:
            for root in (plain, clustered):
                os.symlink(src, os.path.join(root, f"{t}.parquet"))
            continue
        df = spark.read.parquet(src)
        size = os.path.getsize(src) if os.path.isfile(src) else None
        tgt = max(1, (size or 0) // N_FILES) if size else 16 * 1024 * 1024
        for root, cols in ((plain, None), (clustered, CLUSTER_KEYS[t])):
            out = os.path.join(root, f"{t}.parquet")
            df.repartition(N_FILES).write.parquet(out)
            # route the rewrite through the production compaction path
            compact_parquet(spark, out, target_bytes=tgt, sort_cols=cols)
    return plain, clustered


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    spark = get_spark("bench-layout")
    base = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", ".scratch",
        f"layout_{sf_dir.strip('/').replace('/', '_')}"))
    plain, clustered = build_copies(spark, sf_dir, base)

    import datetime
    cut = datetime.date(1995, 3, 15)
    preds = {
        "lineitem l_shipdate > 1995-03-15":
            ("lineitem.parquet", "l_shipdate", cut, datetime.date(9999, 1, 1)),
        "orders o_orderdate < 1995-03-15":
            ("orders.parquet", "o_orderdate", datetime.date(1, 1, 1), cut),
    }
    skips = {}
    for label, (tbl, col, lo, hi) in preds.items():
        skips[label] = {
            tag: rowgroup_skip_fraction(os.path.join(root, tbl), col, lo, hi)
            for tag, root in (("plain", plain), ("clustered", clustered))
        }
        print(f"# {label}: plain skip "
              f"{skips[label]['plain']['skip_fraction']:.2f} -> clustered "
              f"{skips[label]['clustered']['skip_fraction']:.2f}",
              file=sys.stderr)

    qs = queries()
    walls = {}
    for name in QUERIES:
        walls[name] = {}
        for tag, root in (("plain", plain), ("clustered", clustered)):
            best = None
            for _ in range(3):  # warm: best of 3 fresh plans
                t = time.time()
                qs[name](spark, root).collect()
                el = time.time() - t
                best = el if best is None else min(best, el)
            walls[name][tag] = round(best, 3)
        print(f"# {name}: plain {walls[name]['plain']}s -> clustered "
              f"{walls[name]['clustered']}s", file=sys.stderr)

    print(json.dumps({"sf_dir": sf_dir, "n_files": N_FILES,
                      "skip_fractions": {
                          k: {t: v[t]["skip_fraction"] for t in v}
                          for k, v in skips.items()},
                      "query_walls": walls}))


if __name__ == "__main__":
    main()
