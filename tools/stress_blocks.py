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


if __name__ == "__main__":
    main()
