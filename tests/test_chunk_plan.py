"""q84 plan guards.

1. The tokenizing split() must appear exactly once in the chunk stream's
   optimized plan — CollapseProject re-inlining it into the chunk lambda
   would re-split the text once per chunk (the round-8 defect this pins).
2. The full query must read that stream through ONE cached (fp, doc)
   frame and attach per-fp counts by hash-agg + join-back, never by a
   window over raw fp — a corpus-universal boilerplate chunk would pin
   one window task at scale (round-10 VERDICT item 1, the q110 shape).
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from etl_transparencia_sergipe_spark.plans._helpers import load
from etl_transparencia_sergipe_spark.plans.textops import chunk_fingerprints


def test_chunk_stream_tokenizes_once(spark, sf_dir):
    ch = chunk_fingerprints(load(spark, "documents", sf_dir))
    plan = ch._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split") == 1, plan


def test_q84_no_fp_window_single_cached_scan(spark, sf_dir):
    df = entrymod.queries()["q84_chunk_dedup"](spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # every consumer of the chunk stream reads the persisted frame
    assert "InMemoryRelation" in opt, opt
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in phys, phys
    spark.catalog.clearCache()  # drop the plan-build-registered cache
