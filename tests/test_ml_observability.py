"""ML parity (A4-A6), multimodal plumbing, and df.observe metrics (D7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.ml import (
    correlation_pairs,
    kmeans_clusters,
    scaler_stats,
)
from etl_transparencia_sergipe_spark.observability import observed
from etl_transparencia_sergipe_spark.sources.catalog import load_table
from etl_transparencia_sergipe_spark.sources.multimodal import (
    decode_image,
    extract_features,
    media_from_documents,
)


def test_kmeans_deterministic_with_seed(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_quantity", "l_extendedprice", "l_discount")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    a = sorted(
        (r.cluster, r.n) for r in
        kmeans_clusters(li, cols, k=3, seed=42)
        .groupBy("cluster").agg(F.count("*").alias("n")).collect())
    b = sorted(
        (r.cluster, r.n) for r in
        kmeans_clusters(li, cols, k=3, seed=42)
        .groupBy("cluster").agg(F.count("*").alias("n")).collect())
    assert a == b
    assert sum(n for _, n in a) == li.count()


def test_scaler_stats_match_python(spark):
    import statistics

    vals = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    row = scaler_stats(df, ["x"]).collect()[0]
    assert row.x_mean == pytest.approx(statistics.mean(vals))
    assert row.x_std_pop == pytest.approx(statistics.pstdev(vals))


def test_correlation_pairs_bounds(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    out = correlation_pairs(li, ["l_quantity", "l_extendedprice"]).collect()
    by_pair = {(r.col_a, r.col_b): r.corr for r in out}
    assert by_pair[("l_quantity", "l_quantity")] == pytest.approx(1.0)
    assert -1.0 <= by_pair[("l_quantity", "l_extendedprice")] <= 1.0


def test_multimodal_features_batch_shape(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    media = media_from_documents(spark, docs)
    feats = extract_features(media, batch_parallelism=4)
    rows = feats.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert r.n_bytes > 0 and len(r.checksum) == 32
    assert 0.0 <= r.feat_mean <= 255.0


def test_decode_stub_raises_cleanly():
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\x89PNG...")


def test_observe_metrics(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    df, obs = observed(
        li.filter("l_quantity > 25"),
        "m",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
    )
    n = df.count()  # action drives the plan; observation rides along
    assert obs.get["n_rows"] == n
    assert obs.get["sum_qty"] > 0
