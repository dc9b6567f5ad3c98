"""Physical-plan regression pins for the tuned heavy plans.

These queries earned specific plan shapes through measured rewrites
(BASELINE.md round-5 sections); a refactor that silently loses one —
a dropped broadcast, a resurrected nested-loop join, an un-hinted
verify join — would cost an order of magnitude at scale while every
row-level test stays green. Pin the load-bearing properties.
"""

from __future__ import annotations

import pytest

from etl_transparencia_sergipe_spark.plans.registry import queries

SF = "/root/testdata/sf0.01"


def plan_of(spark, name: str) -> str:
    df = queries()[name](spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_q05_reduces_before_dim_join(spark):
    plan = plan_of(spark, "q05_top_customers")
    assert "CartesianProduct" not in plan
    # the per-order partial aggregation must sit below the customer
    # join: lineitem's revenue collapses to (l_orderkey, sum) before
    # any wide row leaves the fact scan
    agg_pos = plan.find("l_orderkey")
    assert agg_pos != -1
    # final result is a bounded top-k, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_q05_pushes_all_scan_filters(spark):
    plan = plan_of(spark, "q05_top_customers")
    import re

    scans = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert scans, "expected parquet scans with pushdown info"
    assert all(s.strip() for s in scans), f"unpushed scan: {scans}"


def test_q63_search_has_no_nested_loop_join(spark):
    # the round-5 quantizer rewrite removed the corpus x centroid
    # BroadcastNestedLoopJoin expansion (exchanges 10 -> 5); this pins
    # it out of the plan for good
    plan = plan_of(spark, "q63_ivf_trained_topk")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q31_verify_join_is_not_broadcast(spark):
    # AQE underestimates the shingle-array side and broadcasting it
    # OOMs at dup-dense scale (sf10 catch, BASELINE round-5): the
    # verify joins must stay shuffled-hash
    plan = plan_of(spark, "q31_minhash_lsh_dedup")
    assert "ShuffledHashJoin" in plan


@pytest.mark.parametrize("name", ["q46_ivf_ann_topk", "q40_knn_bruteforce"])
def test_ann_plans_have_no_cartesian(spark, name):
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan
