"""ANN recall@k vs the brute-force baseline — a real quality measurement
once the sf1 fixtures carry perturbed (near- but not identical) copies.

Round-3 VERDICT item 5: with vectors copied unperturbed, every ANN
method trivially recovered the exact top-k and all four queries hashed
identically, so the gate could not distinguish a working index from a
broken-but-lucky one. tools/gen_sf.py now perturbs each copy; this tool
records mean recall@k of each ANN query against q40's exact answer.

Usage: python tools/ann_recall.py [sf_dir]
"""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_transparencia_sergipe_spark.plans.registry import queries
from etl_transparencia_sergipe_spark.session import get_spark

ANN = ["q44_lsh_ann_topk", "q45_lsh_multiprobe", "q46_ivf_ann_topk"]


def topk_sets(rows) -> dict:
    out = defaultdict(set)
    for r in rows:
        out[r.query_id].add(r.neighbor_id)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    spark = get_spark("ann-recall")
    qs = queries()

    exact = topk_sets(qs["q40_knn_bruteforce"](spark, sf_dir).collect())
    print(f"{sf_dir}: {len(exact)} query vectors, k=5")
    for name in ANN:
        got = topk_sets(qs[name](spark, sf_dir).collect())
        per_q = [len(got.get(q, set()) & hits) / len(hits)
                 for q, hits in sorted(exact.items())]
        mean = sum(per_q) / len(per_q)
        print(f"  {name}: recall@5 = {mean:.3f} "
              f"(per-query {['%.1f' % r for r in per_q]})")


if __name__ == "__main__":
    main()
