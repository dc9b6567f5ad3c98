"""Integer-exact K-Means (q62) and its oracle twin.

The operator's whole claim is that the spec is deterministic enough for
two independent implementations to agree bit-for-bit — so the tests
exercise exactly that: the two differently-structured Lloyd loops agree
on adversarial integer data, the tie rules behave as documented, and
the Spark operator matches the DuckDB oracle end-to-end on real files.
"""

from __future__ import annotations

import numpy as np

from etl_transparencia_sergipe_spark.ml import kmeans_exact, lloyd_int
from etl_transparencia_sergipe_spark.plans.kmeans_oracle import (
    _lloyd_int_independent,
)


def test_lloyd_int_matches_independent_impl_on_random_data():
    rng = np.random.default_rng(7)
    for trial in range(5):
        X = rng.integers(-10_000_000, 10_000_000, size=(500, 3))
        a = lloyd_int(X, k=4, max_iter=60)
        b = _lloyd_int_independent(X, k=4, max_iter=60)
        assert a == b, f"trial {trial}: implementations diverged"


def test_lloyd_int_tie_goes_to_lowest_cluster():
    # two centroids equidistant from the probe point: the probe must
    # join cluster 0 (strict-< cascade), pulling its centroid toward it
    X = np.array([[0, 0], [10, 0], [5, 0]], dtype=np.int64)
    cent = lloyd_int(X, k=2, max_iter=1)
    # after one round: cluster 0 = {0, 5} -> centroid (2, 0);
    # cluster 1 = {10} -> centroid (10, 0)
    assert cent == [(2, 0), (10, 0)]


def test_lloyd_int_empty_cluster_keeps_centroid():
    # duplicate init rows: every point ties to cluster 0 (strict <), so
    # cluster 1 never gets a member and must keep its init centroid
    X = np.array([[0, 0], [0, 0], [1, 1]], dtype=np.int64)
    cent = lloyd_int(X, k=2, max_iter=60)
    a = _lloyd_int_independent(X, k=2, max_iter=60)
    assert cent == a
    assert cent[1] == (0, 0)


def test_lloyd_int_floor_division_on_negative_sums():
    # centroid of {-3, -4} in 1-D is floor(-7/2) = -4 (toward -inf),
    # NOT -3 (toward zero) — the rule both implementations must share
    X = np.array([[-3], [-4], [50], [60]], dtype=np.int64)
    a = lloyd_int(X, k=2, max_iter=60)
    b = _lloyd_int_independent(X, k=2, max_iter=60)
    assert a == b
    assert any(c == (-4,) for c in a)


def test_kmeans_exact_spark_deterministic_and_covers_k(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    key = "l_orderkey * 8 + l_linenumber"
    a = kmeans_exact(li, cols, key, k=3).groupBy("cluster").count()
    b = kmeans_exact(li, cols, key, k=3).groupBy("cluster").count()
    ra = {r["cluster"]: r["count"] for r in a.collect()}
    rb = {r["cluster"]: r["count"] for r in b.collect()}
    assert ra == rb
    assert set(ra) <= {0, 1, 2}
    assert sum(ra.values()) == li.count()
