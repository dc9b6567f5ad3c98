"""Physical-plan audit: for each headline query, print scan pushdown,
join strategies, and whole-stage-codegen coverage — the checklist from the
scale mandate (filters reach the parquet scan, small dims broadcast, no
stray shuffles).

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_transparencia_sergipe_spark.session import get_spark
import __spark_entry__ as entrymod


def audit(name: str, plan: str) -> list[str]:
    notes = []
    scans = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = [s for s in scans if s.strip()]
    if scans:
        notes.append(f"scans={len(scans)} with_pushdown={len(pushed)}")
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                       r"BroadcastNestedLoopJoin|CartesianProduct)", plan)
    if joins:
        notes.append("joins=" + ",".join(joins))
    n_exchange = plan.count("Exchange")
    notes.append(f"exchanges={n_exchange}")
    # codegen span markers by plan-string flavor: "*(N)" operator prefixes
    # (SparkPlan.toString), "[codegen id : N]" (explain formatted),
    # "WholeStageCodegen (N)" (explain extended) — count distinct ids
    n_codegen = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
                    | set(re.findall(r"\[codegen id : (\d+)\]", plan))
                    | set(re.findall(r"\*\((\d+)\)", plan)))
    notes.append(f"codegen_spans={n_codegen}")
    if "CartesianProduct" in plan:
        notes.append("!! cartesian product")
    return notes


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    spark = get_spark("plan-audit")
    # audit the static plan: under AQE the pre-execution plan is an opaque
    # AdaptiveSparkPlan wrapper with no WholeStageCodegen annotation, so
    # codegen coverage (and the non-adaptive join choice) is only visible
    # with AQE off. AQE stays ON everywhere else — this is a read-only
    # audit session.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = entrymod.queries()
    for name, build in qs.items():
        if only and name not in only:
            continue
        df = build(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(f"== {name}: " + "; ".join(audit(name, plan)))
        if only:
            df.explain("formatted")


if __name__ == "__main__":
    main()
