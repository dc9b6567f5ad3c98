"""Round-13 CC per-round plan + wall experiment (r12 VERDICT item 5).

Round 12 cached the symmetrized edge list pre-partitioned by dst, but
the LABEL frame still re-exchanged every round on both the dst-gather
and node-update joins — because under AQE, Dataset.localCheckpoint
captures UnknownPartitioning(0) (measured on Spark 4.1; the r12 design
note assumed otherwise). Round 13 keeps labels co-partitioned with the
edge cache across rounds by running the loop AQE-OFF above the
scale gate (below it, AQE broadcast rounds win — see components.py) —
target per-round plan at scale: gather join 0 exchanges, ONE
label-sized exchange (the groupBy(src) gather agg), update join 0
exchanges. The smj passes here set autoBroadcastJoinThreshold=-1 and
SPARK_GRAFT_CC_FORCE_SCALE=1 to capture that at-scale shape on the
small test graph.

This tool:
1. materializes the real q38 LSH pair graph to /tmp parquet (the
   exp_r12_cc setup),
2. runs the PRODUCTION connected_components with its _plan_sink hook,
   writing each round's EXECUTED plan to plans/r13/cc_round<k>.txt and
   printing per-round Exchange counts (the committed evidence the
   plan-shape claim is checked against),
3. times N repetitions of the full CC call and checks the output
   against a naive no-copartition reference variant.

A multi-round (high-diameter) chain graph is also run so round >= 2
(path halving + the repartition that restores the node layout) gets
plan coverage, not just the 1-2 rounds dense LSH graphs need.

Usage: python tools/exp_r13_cc.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import re
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_transparencia_sergipe_spark.caching import release_all
from etl_transparencia_sergipe_spark.operators.components import (
    connected_components,
)
from etl_transparencia_sergipe_spark.session import get_spark

PLANS = Path(__file__).resolve().parent.parent / "plans" / "r13"


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def exchange_stats(plan: str) -> str:
    """Count operators in the FINAL-plan tree section of a formatted
    explain (shuffle Exchange nodes print as 'Exchange (n)' there;
    'Exchange hashpartitioning' only appears in simple-mode plans)."""
    # cut at the TOP-LEVEL initial plan (column-0 '+- == Initial Plan ==');
    # nested InMemoryRelation subtrees carry their own indented
    # Final/Initial pairs that stay inside the final section
    final = re.split(r"^\+- == Initial Plan ==$", plan, flags=re.M)[0]
    ex = len(re.findall(r"\bExchange \(\d+\)", final))
    bex = len(re.findall(r"BroadcastExchange \(\d+\)", final))
    reuse = len(re.findall(r"ReusedExchange", final))
    cache = len(re.findall(r"InMemoryTableScan|TableCacheQueryStage",
                           final))
    return (f"shuffle_exchanges={ex} broadcast={bex} reused={reuse} "
            f"cache_scans={cache}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("exp-r13-cc", extra_conf={
        "spark.cleaner.periodicGC.interval": "60min"})

    from etl_transparencia_sergipe_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from etl_transparencia_sergipe_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    pairs_path = "/tmp/exp_r13_cc_pairs.parquet"
    minhash_lsh_pairs(docs, "doc_id", "text", k=16, bands=4,
                      threshold=0.4).write.mode("overwrite").parquet(
        pairs_path)
    release_all(spark)
    pairs = spark.read.parquet(pairs_path)
    print(f"pairs={pairs.count()}", flush=True)

    # 1. per-round executed plans on the real graph
    PLANS.mkdir(parents=True, exist_ok=True)

    def sink(rnd, df):
        plan = plan_text(df)
        (PLANS / f"cc_round{rnd}.txt").write_text(plan)
        print(f"  round {rnd}: {exchange_stats(plan)}", flush=True)

    out = connected_components(pairs, _plan_sink=sink)
    ref = {(r.node, r.component) for r in out.collect()}
    release_all(spark)

    # 1b. the AT-SCALE plan shape: sf0.1's graph is broadcast-sized, so
    # AQE rewrites every per-round join to BroadcastHashJoin and the
    # co-partitioning claim is invisible. Forcing the join strategy a
    # corpus-scale label frame would get (no broadcast) shows the shape
    # the optimization targets: gather SMJ streams the dst-partitioned
    # edge cache + node-partitioned checkpoint labels with NO exchange,
    # groupBy(src) is the ONE label-sized exchange, update join reuses
    # hash(node, n_part) on both sides exchange-free.
    _BCAST = "spark.sql.autoBroadcastJoinThreshold"
    _prev = spark.conf.get(_BCAST)
    spark.conf.set(_BCAST, "-1")
    import os
    os.environ["SPARK_GRAFT_CC_FORCE_SCALE"] = "1"

    def smj_sink(rnd, df):
        plan = plan_text(df)
        (PLANS / f"cc_round{rnd}_smj.txt").write_text(plan)
        print(f"  smj round {rnd}: {exchange_stats(plan)}", flush=True)

    try:
        out = connected_components(pairs, _plan_sink=smj_sink)
        assert {(r.node, r.component) for r in out.collect()} == ref
    finally:
        spark.conf.set(_BCAST, _prev)
        del os.environ["SPARK_GRAFT_CC_FORCE_SCALE"]
    release_all(spark)

    # 2. multi-round coverage: a chain graph (diameter 64) forces the
    # halving branch and its node-layout restore
    chain = spark.range(64).selectExpr("id AS id_a", "id + 1 AS id_b")

    def chain_sink(rnd, df):
        plan = plan_text(df)
        (PLANS / f"cc_chain_round{rnd}.txt").write_text(plan)
        print(f"  chain round {rnd}: {exchange_stats(plan)}", flush=True)

    chain_out = connected_components(chain, _plan_sink=chain_sink)
    got = {(r.node, r.component) for r in chain_out.collect()}
    assert got == {(i, 0) for i in range(65)}, "chain CC wrong"
    release_all(spark)

    def chain_smj_sink(rnd, df):
        plan = plan_text(df)
        (PLANS / f"cc_chain_round{rnd}_smj.txt").write_text(plan)
        print(f"  chain smj round {rnd}: {exchange_stats(plan)}",
              flush=True)

    spark.conf.set(_BCAST, "-1")
    os.environ["SPARK_GRAFT_CC_FORCE_SCALE"] = "1"
    try:
        chain_out = connected_components(chain, _plan_sink=chain_smj_sink)
        got = {(r.node, r.component) for r in chain_out.collect()}
        assert got == {(i, 0) for i in range(65)}, "chain smj CC wrong"
    finally:
        spark.conf.set(_BCAST, _prev)
        del os.environ["SPARK_GRAFT_CC_FORCE_SCALE"]
    release_all(spark)

    # 3. walls on the real graph
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = connected_components(pairs)
        got = {(r.node, r.component) for r in out.collect()}
        walls.append(time.perf_counter() - t0)
        release_all(spark)
        assert got == ref, "CC output drifted between reps"
    print(f"cc wall median={statistics.median(walls):.3f} "
          f"min={min(walls):.3f} max={max(walls):.3f}", flush=True)


if __name__ == "__main__":
    main()
