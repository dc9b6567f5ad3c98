"""Round-12 CC-loop experiment: per-variant wall + rounds on REAL pairs.

The CC trio (q38/q39/q97) is 22% of the sf0.1 warm bench. Each
label-propagation round is join + agg + join + self-join + checkpoint —
this experiment isolates the loop from LSH pair generation (pairs are
materialized to /tmp parquet first) and times variants:

  A: current operators/components.connected_components
  B: A + labels0 = least(self, min neighbor) (the distinct() already
     pays the groupBy — folding min(dst) in saves one full round)
  C: B + edges cached pre-partitioned by dst (per-round gather join
     reuses the cached partitioning instead of re-exchanging edges)
  D: C + gather-union round (edges join labels -> union self-labels ->
     one groupBy(node) min) instead of join-left + neighbor_min,
     keeping path halving
  E: D without path halving (plain min rounds)

Every variant must produce the identical (node, component) set — checked
against A's result each run.

Usage: python tools/exp_r12_cc.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.caching import (
    checkpoint_rdd_id,
    release_all,
    unpersist_rdd_ids,
)
from etl_transparencia_sergipe_spark.session import get_spark

ROUNDS = {"n": 0}


def cc_variant(pairs: DataFrame, *, seed_min: bool, prepart: bool,
               gather_union: bool, halving: bool,
               max_iter: int = 20) -> DataFrame:
    spark = pairs.sparkSession
    ROUNDS["n"] = 0
    ncores = spark.sparkContext.defaultParallelism

    def truncate(df, eager=True):
        return df.localCheckpoint(eager=eager)

    edges = (
        pairs.selectExpr("id_a AS src", "id_b AS dst")
        .unionByName(pairs.selectExpr("id_b AS src", "id_a AS dst"))
        .distinct()
    )
    if prepart:
        edges = edges.repartition(ncores, "dst")
    edges = edges.cache()

    if seed_min:
        labels = (
            edges.groupBy("src").agg(F.min("dst").alias("_m"))
            .select(F.col("src").alias("node"),
                    F.least("src", "_m").alias("component"))
            .transform(truncate)
        )
    else:
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
            .transform(truncate)
        )
    round_ids = {checkpoint_rdd_id(labels)}
    for _ in range(max_iter):
        ROUNDS["n"] += 1
        if gather_union:
            gathered = (
                edges.join(labels.withColumnRenamed("node", "dst"), "dst")
                .select(F.col("src").alias("node"),
                        F.col("component").alias("cand"),
                        F.lit(None).cast("long").alias("own"))
            )
            self_rows = labels.select(
                "node", F.col("component").alias("cand"),
                F.col("component").alias("own"))
            hop = (
                gathered.unionByName(self_rows)
                .groupBy("node")
                .agg(F.min("cand").alias("component"),
                     F.min("own").alias("old_component"))
            )
        else:
            neighbor_min = (
                edges.join(labels.withColumnRenamed("node", "dst"), "dst")
                .groupBy("src").agg(F.min("component").alias("nbr_min"))
                .withColumnRenamed("src", "node")
            )
            hop = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.least("component",
                            F.coalesce("nbr_min", "component"))
                    .alias("component"),
                    F.col("component").alias("old_component"),
                )
            )
        if halving:
            parent = hop.select(F.col("node").alias("component"),
                                F.col("component").alias("grand"))
            updated = (
                hop.join(parent, "component", "left")
                .select(
                    "node",
                    F.least("component", F.coalesce("grand", "component"))
                    .alias("component"),
                    "old_component",
                )
                .transform(lambda df: truncate(df, eager=False))
            )
        else:
            updated = hop.transform(lambda df: truncate(df, eager=False))
        created = {checkpoint_rdd_id(updated)}
        changed = updated.filter("component != old_component").count()
        labels = updated.select("node", "component")
        unpersist_rdd_ids(spark, round_ids)
        round_ids = created
        if changed == 0:
            break
    edges.unpersist(blocking=False)
    return labels


VARIANTS = {
    "A_current": dict(seed_min=False, prepart=False, gather_union=False,
                      halving=True),
    "B_seedmin": dict(seed_min=True, prepart=False, gather_union=False,
                      halving=True),
    "C_prepart": dict(seed_min=True, prepart=True, gather_union=False,
                      halving=True),
    "D_gather": dict(seed_min=True, prepart=True, gather_union=True,
                     halving=True),
    "E_nohalve": dict(seed_min=True, prepart=True, gather_union=True,
                      halving=False),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("exp-r12-cc", extra_conf={
        "spark.cleaner.periodicGC.interval": "60min"})

    from etl_transparencia_sergipe_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from etl_transparencia_sergipe_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    pairs_path = "/tmp/exp_r12_cc_pairs.parquet"
    minhash_lsh_pairs(docs, "doc_id", "text", k=16, bands=4,
                      threshold=0.4).write.mode("overwrite").parquet(
        pairs_path)
    release_all(spark)
    pairs = spark.read.parquet(pairs_path)
    n_pairs = pairs.count()
    print(f"pairs={n_pairs}", flush=True)

    ref = None
    for name, kw in VARIANTS.items():
        walls, rounds = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = cc_variant(pairs, **kw)
            rows = out.collect()
            walls.append(time.perf_counter() - t0)
            rounds.append(ROUNDS["n"])
            release_all(spark)
        got = {(r.node, r.component) for r in rows}
        if ref is None:
            ref = got
        ok = "OK" if got == ref else "MISMATCH!!"
        print(f"{name}\twall={statistics.median(walls):.3f}"
              f"\tmin={min(walls):.3f}\tmax={max(walls):.3f}"
              f"\trounds={rounds[-1]}\t{ok}", flush=True)


if __name__ == "__main__":
    main()
