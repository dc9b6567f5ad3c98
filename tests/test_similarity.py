"""Similarity-search behavior: LSH recall vs the exact baseline, bucket
pruning actually prunes."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.operators.similarity import (
    cosine_topk,
    hyperplanes,
    lsh_topk,
)
from etl_transparencia_sergipe_spark.sources.catalog import load_table


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    exact = cosine_topk(emb, emb.filter("vec_id < 8"), k=5)
    approx = lsh_topk(emb, k=5, n_planes=3)  # 8 buckets on a weakly
    # clustered corpus: single-probe recall is modest by construction
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.25, f"recall collapsed: {recall}"
    # and the candidate set is actually pruned vs the full corpus
    n = emb.count()
    planes = hyperplanes(3)
    from etl_transparencia_sergipe_spark.operators.similarity import (
        srp_bucket_spark,
    )
    buckets = emb.selectExpr(
        f"{srp_bucket_spark('embedding', planes)} AS b").groupBy("b").count()
    assert buckets.count() > 1  # vectors actually spread over buckets
    assert buckets.agg(F.max("count")).collect()[0][0] < n


def test_hyperplanes_deterministic():
    assert hyperplanes(4, 8) == hyperplanes(4, 8)
    vals = [x for pl in hyperplanes(8, 64) for x in pl]
    assert all(-0.5 <= v <= 0.5 for v in vals)
