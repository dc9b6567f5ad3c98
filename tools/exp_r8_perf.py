"""Round-8 perf experiments for the two carried weak entries:

q95 (fused as-of, 2.63x warm at sf1): candidate variants —
  a) registered fused plan (baseline)
  b) fused + mid-window row filter (only purchases and change rows
     reach the second window's max-struct evaluation)
  c) JSON extraction via from_json(schema) instead of get_json_object
  d) b + c combined

q19 (stacked exact percentiles, 7.91x warm): component decomposition —
  scan+stack, +distribution agg, +window, full — to locate the floor.

Run on a QUIET machine. Prints one JSON line per variant; run-to-run
±15%, compare warm medians of 3.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.plans._helpers import dsum, load
from etl_transparencia_sergipe_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"


def _ev(spark, kexpr):
    return load(spark, "events", SF).select(
        "user_id", "event_type", "ts", "event_id", "value",
        kexpr.alias("k"))


def q95_variant(spark, json_mode: str, midfilter: bool):
    if json_mode == "get":
        kexpr = F.get_json_object("props", "$.k").cast("int")
    else:
        # partial-schema struct parse: only field k is materialized
        kexpr = F.from_json("props", "k INT").getField("k")
    ev = _ev(spark, kexpr)
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "chg", F.when(F.lag("k").over(wl).isNull()
                      | (F.lag("k").over(wl) != F.col("k")), 1)
        .otherwise(0))
    if midfilter:
        marked = marked.filter(
            "chg = 1 OR event_type = 'purchase'")
    wr = (W.partitionBy("user_id").orderBy("ts")
          .rangeBetween(W.unboundedPreceding, W.currentRow))
    at = marked.withColumn(
        "k_at_purchase",
        F.max(F.when(F.col("chg") == 1,
                     F.struct("ts", "event_id", "k"))).over(wr)
        .getField("k"))
    return (at.filter("event_type = 'purchase'")
            .groupBy("k_at_purchase")
            .agg(F.count("*").cast("bigint").alias("n_purchases"),
                 dsum("value").alias("total_value"))
            .orderBy("k_at_purchase"))


def timed(spark, label, fn, n=3):
    outs = []
    for _ in range(n):
        t0 = time.time()
        rows = fn().collect()
        outs.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    print(json.dumps({"label": label, "runs": outs,
                      "rows": len(rows)}), flush=True)
    return rows


def main():
    spark = get_spark("r8-exp")
    # warm codegen
    q95_variant(spark, "get", False).collect()
    spark.catalog.clearCache()

    base = timed(spark, "q95_a_fused",
                 lambda: q95_variant(spark, "get", False))
    for label, jm, mf in [("q95_b_midfilter", "get", True),
                          ("q95_c_fromjson", "from", False),
                          ("q95_d_both", "from", True)]:
        rows = timed(spark, label, lambda: q95_variant(spark, jm, mf))
        print(label, "rows match baseline:", rows == base, flush=True)

    # q19 decomposition
    li = load(spark, "lineitem", SF)
    li.count()
    specs = [("l_quantity", [0.5], ["median_qty"]),
             ("l_extendedprice", [0.25, 0.75],
              ["p25_price", "p75_price"])]
    npairs = ", ".join(f"'{c}', CAST({c} AS DOUBLE)"
                       for c, _, _ in specs)

    def stack_only():
        return (li.selectExpr("l_returnflag",
                              f"stack(2, {npairs}) AS (_name, _v)")
                .filter("_v IS NOT NULL")
                .selectExpr("count(*) AS n"))

    def dist_only():
        return (li.selectExpr("l_returnflag",
                              f"stack(2, {npairs}) AS (_name, _v)")
                .filter("_v IS NOT NULL")
                .groupBy("l_returnflag", "_name", "_v")
                .agg(F.count("*").alias("_cnt"))
                .selectExpr("count(*) AS n"))

    def windowed():
        d = (li.selectExpr("l_returnflag",
                           f"stack(2, {npairs}) AS (_name, _v)")
             .filter("_v IS NOT NULL")
             .groupBy("l_returnflag", "_name", "_v")
             .agg(F.count("*").alias("_cnt")))
        wo = W.partitionBy("l_returnflag", "_name").orderBy("_v")
        wa = W.partitionBy("l_returnflag", "_name")
        return (d.withColumn("_cum", F.sum("_cnt").over(wo))
                .withColumn("_n", F.sum("_cnt").over(wa))
                .selectExpr("count(*) AS n"))

    def full():
        from etl_transparencia_sergipe_spark.operators.percentiles \
            import exact_percentiles_stacked
        return exact_percentiles_stacked(li, ["l_returnflag"], specs)

    for label, fn in [("q19_scan_stack", stack_only),
                      ("q19_plus_dist", dist_only),
                      ("q19_plus_window", windowed),
                      ("q19_full", full)]:
        timed(spark, label, fn)

    # q56 after the round-8 fusion
    from etl_transparencia_sergipe_spark.plans import registry
    q56 = registry.queries()["q56_iqr_outliers"]
    timed(spark, "q56_fused", lambda: q56(spark, SF))


if __name__ == "__main__":
    main()
