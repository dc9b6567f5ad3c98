"""SRP bucket-size stress for the q87 semantic-dedup tier.

Reports the bucket-occupancy distribution of the embeddings corpus for
several hyperplane counts p — the datum behind q87's scale note: bucket
count is 2^p, in-bucket pair work is O(n^2 / 2^p), so p must grow as
log2(n / target_block) or the per-bucket Arrow pair scan goes quadratic
(max_block_rows fails loudly before that happens at runtime).

Usage: python tools/stress_buckets.py [sf_dir] [p ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.operators.similarity import (
    hyperplanes,
    srp_bucket_spark,
)
from etl_transparencia_sergipe_spark.session import get_spark
from etl_transparencia_sergipe_spark.sources.catalog import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ps = [int(a) for a in sys.argv[2:]] or [6, 8, 10, 12]
    spark = get_spark("stress-buckets")
    emb = load_table(spark, "embeddings", sf_dir)
    n = emb.count()
    print(f"n_vectors={n}  sf_dir={sf_dir}")
    print(f"{'p':>3} {'buckets':>8} {'occupied':>9} {'max':>7} "
          f"{'p99':>7} {'pairs=sum(b^2)/2':>18}")
    for p in ps:
        planes = hyperplanes(p)
        sizes = (emb.selectExpr(
            f"{srp_bucket_spark('embedding', planes)} AS bucket")
            .groupBy("bucket").count())
        row = sizes.agg(
            F.count("*").alias("occ"),
            F.max("count").alias("mx"),
            F.expr("percentile(count, 0.99)").alias("p99"),
            (F.sum(F.col("count") * F.col("count")) / 2).alias("pairs"),
        ).collect()[0]
        print(f"{p:>3} {2**p:>8} {row.occ:>9} {row.mx:>7} "
              f"{row.p99:>7.0f} {int(row.pairs):>18,}")
    spark.stop()


if __name__ == "__main__":
    main()
