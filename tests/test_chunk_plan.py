"""q84 plan guard: the tokenizing split() must appear exactly once in the
optimized plan — CollapseProject re-inlining it into the chunk lambda
would re-split the text once per chunk (the defect this pins)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_q84_tokenizes_once(spark, sf_dir):
    df = entrymod.queries()["q84_chunk_dedup"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split") == 1, plan
