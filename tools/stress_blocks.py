"""Block-size stress for the q33 exact-Jaccard tier.

Inflates the documents corpus by unioning suffix-mutated copies (the
round-1 dedup stress recipe — a worst case where every doc gains mult-1
near-duplicates), then reports the blocking-key group-size distribution
and the implied exact-verify pair counts with and without the
min-shingle-hash (mh0) secondary key. The quadratic term sum(n_b^2) is
what the verify join actually pays, so the ratio of the two columns is
the skew bound the secondary key buys.

Usage: python tools/stress_blocks.py [sf_dir] [mult]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.operators.dedup import shingles_spark
from etl_transparencia_sergipe_spark.operators.hashing import (
    MERSENNE,
    h60_spark,
)
from etl_transparencia_sergipe_spark.session import get_spark
from etl_transparencia_sergipe_spark.sources.catalog import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("stress-blocks")

    docs = load_table(spark, "documents", sf_dir)
    n0 = docs.count()
    parts = [docs]
    for i in range(1, mult):
        parts.append(docs.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            F.concat("text", F.lit(f" variant{i}")).alias("text"),
            "lang", "source", "n_chars"))
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)

    keyed = corpus.selectExpr(
        "doc_id", "lang", "n_chars div 100 AS len_band",
        f"array_min(transform({shingles_spark('text', 3)}, "
        f"s -> {h60_spark('s')} % {MERSENNE})) AS mh0",
    )

    def stats(group_cols: list[str], label: str) -> None:
        sizes = keyed.groupBy(*group_cols).count()
        row = sizes.agg(
            F.count("*").alias("n_blocks"),
            F.max("count").alias("max_block"),
            F.expr("percentile_approx(count, 0.99)").alias("p99_block"),
            F.sum(F.col("count") * (F.col("count") - 1) / 2)
            .alias("verify_pairs"),
        ).collect()[0]
        print(f"{label}: blocks={row['n_blocks']} "
              f"max={row['max_block']} p99={row['p99_block']} "
              f"exact_verify_pairs={int(row['verify_pairs'])}")

    print(f"corpus: {n0} docs x{mult} = {corpus.count()}")
    stats(["lang", "len_band"], "  (lang, len_band)        ")
    stats(["lang", "len_band", "mh0"], "  (lang, len_band, mh0)   ")

    q35_stress(spark, sf_dir, mult)


def q35_stress(spark, sf_dir: str, mult: int) -> None:
    """q35 levenshtein blocking stress: inflate part mult-x (key-shifted
    copies, names unchanged — the worst case where every name gains mult-1
    exact twins in its block) and compare the pairs the OLD fixed
    (brand, size) blocking would verify with levenshtein against the
    candidates the positional char-3-gram equi-join emits."""
    from etl_transparencia_sergipe_spark.sources.catalog import load_table

    p0 = load_table(spark, "part", sf_dir).select(
        "p_partkey", "p_name", "p_brand", "p_size")
    parts = [p0]
    for i in range(1, mult):
        parts.append(p0.select(
            (F.col("p_partkey") + i * 10_000_000).alias("p_partkey"),
            "p_name", "p_brand", "p_size"))
    part = parts[0]
    for q in parts[1:]:
        part = part.unionByName(q)
    part = part.repartition(64).cache()
    n = part.count()

    old_pairs = (
        part.groupBy("p_brand", "p_size").count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2),
             F.max("count"))
        .collect()[0]
    )
    g = (
        part.select(
            "p_partkey", "p_name", "p_brand", "p_size",
            F.explode(
                F.expr("sequence(1, greatest(length(p_name) - 2, 1))")
            ).alias("pos"))
        .withColumn("g", F.expr("substring(p_name, CAST(pos AS INT), 3)"))
    )
    gram_block = (
        g.groupBy("p_brand", "p_size", "g").count()
        .agg(F.max("count")).collect()[0][0]
    )
    x, y = g.alias("x"), g.alias("y")
    cand = (
        x.join(y, (F.col("x.p_brand") == F.col("y.p_brand"))
               & (F.col("x.p_size") == F.col("y.p_size"))
               & (F.col("x.g") == F.col("y.g"))
               & (F.abs(F.col("x.pos") - F.col("y.pos")) <= 4)
               & (F.col("x.p_partkey") < F.col("y.p_partkey"))
               & (F.abs(F.length(F.col("x.p_name"))
                        - F.length(F.col("y.p_name"))) <= 4))
        .select(F.col("x.p_partkey").alias("id_a"),
                F.col("y.p_partkey").alias("id_b"))
        .distinct().count()
    )
    print(f"q35 part: {n} rows (x{mult})")
    print(f"  old (brand,size) blocking: max_block={old_pairs[1]} "
          f"levenshtein_pairs={int(old_pairs[0])}")
    print(f"  pos-3gram blocking: max_gram_block={gram_block} "
          f"candidates={cand} "
          f"reduction={old_pairs[0] / max(cand, 1):.1f}x")
    part.unpersist()


if __name__ == "__main__":
    main()
