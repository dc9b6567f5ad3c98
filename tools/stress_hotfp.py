"""Adversarial hot-fingerprint stress (round-11, r10 VERDICT item 1).

Builds a corpus where EVERY doc contains the same aligned 16-token
boilerplate chunk (the corpus-universal-key worst case), then times the
q84 count-attach in both shapes over the identical (fp, doc) frame:

  window    — COUNT(*)/SUM(n) OVER (PARTITION BY fp): the round-4..10
              plan. All n_docs rows of the hot fp land in ONE window
              task; no map-side partial agg, no AQE skew handling.
  join-back — groupBy(fp) partial-agg + co-partitioned join (the
              round-11 q82/q84/q85 shape).

Both reduce to the same per-source aggregate; the script asserts the
outputs are IDENTICAL and prints wall times plus the window shape's
max-single-task row count (the quantity that breaks at 100x).

Usage: python tools/stress_hotfp.py [n_docs]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    pure = len(sys.argv) > 2 and sys.argv[2] == "pure"
    spark = get_spark("stress-hotfp")
    boiler = " ".join(f"b{i}" for i in range(16))
    # default: boilerplate chunk + unique tail per doc (mixed corpus);
    # "pure": every doc IS the boilerplate chunk — the whole corpus
    # collapses onto ONE fingerprint, isolating the hot-key task from
    # the unique-fp bulk that costs the same in both shapes
    text = (f"'{boiler}'" if pure else
            f"concat('{boiler} ', 'u', CAST(id AS STRING), "
            f"' x', CAST(id * 7 AS STRING))")
    docs = (spark.range(n_docs)
            .selectExpr("id AS doc_id",
                        "concat('src', CAST(id % 20 AS STRING)) AS source",
                        f"{text} AS text"))
    from etl_transparencia_sergipe_spark.plans.textops import (
        chunk_fingerprints,
    )
    pd_frame = (chunk_fingerprints(docs)
                .groupBy("fp", "doc_id", "source")
                .agg(F.count("*").alias("n"))
                .persist())
    pd_frame.count()  # materialize once; both shapes read the cache

    def agg_out(pd2):
        return (pd2.groupBy("source")
                .agg(F.sum("n").cast("bigint").alias("n_chunks"),
                     F.sum(F.when(F.col("n_docs_with") > 1, F.col("n"))
                           .otherwise(0)).cast("bigint").alias("dups"))
                .orderBy("source"))

    # window shape (the pre-r11 plan)
    t0 = time.time()
    w = W.partitionBy("fp")
    win = agg_out(pd_frame
                  .withColumn("n_occ", F.sum("n").over(w))
                  .withColumn("n_docs_with", F.count("*").over(w)))
    win_rows = win.collect()
    t_window = time.time() - t0

    # join-back shape (the r11 plan)
    t0 = time.time()
    fpc = (pd_frame.groupBy("fp")
           .agg(F.sum("n").alias("n_occ"),
                F.count("*").alias("n_docs_with")))
    jb = agg_out(pd_frame.join(fpc, "fp"))
    jb_rows = jb.collect()
    t_join = time.time() - t0

    assert [tuple(r) for r in win_rows] == [tuple(r) for r in jb_rows], \
        "shapes disagree"
    # the structural number: rows the hot fp forces into ONE window task
    hot = (pd_frame.groupBy("fp").count()
           .agg(F.max("count")).first()[0])
    print(f"n_docs={n_docs}  hot-fp rows in one window task={hot}  "
          f"window={t_window:.2f}s  join-back={t_join:.2f}s  "
          f"speedup={t_window / t_join:.2f}x")


if __name__ == "__main__":
    main()
