"""Independently-coded float Lloyd pinning ``lloyd_float``'s trajectory.

Round-5 ADVICE (similarity_queries.py:272): the q63/q98/q99/q101 oracles
import ``lloyd_float`` from the implementation under test, so quantizer
TRAINING itself was never independently verified — a training bug would
reproduce identically on both sides. This mirrors the q62/kmeans_oracle
posture: a deliberately different implementation (per-point Python
loops, no vectorized argmin/argsort tricks) must agree with the
production trainer on random data AND on crafted empty-cell inputs.

Float caveat: numpy reduces with pairwise summation while the
independent loops accumulate sequentially, so centroid coordinates are
compared at tight tolerance (1e-9 relative) rather than bit-for-bit;
sample-copied centroids (init rows and empty-cell reseeds) ARE exact
row copies on both sides and are compared exactly.
"""

from __future__ import annotations

import numpy as np

from etl_transparencia_sergipe_spark.operators.similarity import lloyd_float


def _lloyd_float_independent(X, n_cells, seed=42, max_iter=20):
    """Slow reference Lloyd: same spec as lloyd_float (seeded
    no-replacement init, squared-L2 assignment with first-min tie,
    member mean update, farthest-first DISTINCT empty-cell reseeds,
    stop when centroids stop moving), different code shape."""
    rng = np.random.default_rng(seed)
    init = rng.choice(len(X), size=n_cells, replace=False)
    cent = [X[i].copy() for i in init]
    for _ in range(max_iter):
        labels = []
        mindist = []
        for p in X:
            best_c, best_d = 0, None
            for c in range(n_cells):
                d = float(((p - cent[c]) ** 2).sum())
                if best_d is None or d < best_d:  # strict: first min wins
                    best_c, best_d = c, d
            labels.append(best_c)
            mindist.append(best_d)
        # farthest-first order with index-ascending tie-break (matches
        # stable descending argsort)
        far = sorted(range(len(X)), key=lambda i: (-mindist[i], i))
        new = []
        n_empty = 0
        for c in range(n_cells):
            members = [X[i] for i in range(len(X)) if labels[i] == c]
            if not members:
                new.append(X[far[n_empty]].copy())
                n_empty += 1
            else:
                acc = np.zeros(X.shape[1])
                for mrow in members:
                    acc = acc + mrow
                new.append(acc / len(members))
        if all(np.array_equal(a, b) for a, b in zip(new, cent)):
            break
        cent = new
    return np.stack(cent)


def test_lloyd_float_matches_independent_on_random_data():
    rng = np.random.default_rng(7)
    X = rng.normal(size=(300, 16))
    got = lloyd_float(X, n_cells=8, seed=42, max_iter=20)
    want = _lloyd_float_independent(X, n_cells=8, seed=42, max_iter=20)
    assert np.allclose(got, want, rtol=1e-9, atol=1e-12)


def test_lloyd_float_matches_independent_multiple_seeds():
    rng = np.random.default_rng(11)
    X = rng.normal(size=(120, 8))
    for seed in (1, 2, 3):
        got = lloyd_float(X, n_cells=5, seed=seed, max_iter=10)
        want = _lloyd_float_independent(X, n_cells=5, seed=seed,
                                        max_iter=10)
        assert np.allclose(got, want, rtol=1e-9, atol=1e-12), seed


def test_empty_cells_reseed_to_distinct_points():
    """18 copies of A + distinct B, C; seed 0 inits all three centroids
    on copies of A, so two cells empty simultaneously on iteration 1.
    The reseeds must be DISTINCT points (B and C), not the same argmax
    point twice (the pre-round-6 duplicate-centroid bug), and the
    independent implementation must agree exactly (reseeds are row
    copies, bit-comparable)."""
    A = np.zeros(4)
    B = np.full(4, 100.0)
    C = np.full(4, -90.0)
    X = np.stack([A] * 18 + [B, C])
    got = lloyd_float(X, n_cells=3, seed=0, max_iter=20)
    want = _lloyd_float_independent(X, n_cells=3, seed=0, max_iter=20)
    assert np.array_equal(got, want)
    # all three final centroids are distinct: A-cluster mean, B, C
    assert len({tuple(row) for row in got}) == 3
    assert any(np.array_equal(row, B) for row in got)
    assert any(np.array_equal(row, C) for row in got)
