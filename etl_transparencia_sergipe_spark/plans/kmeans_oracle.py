"""Iterative DuckDB K-Means oracle (q62) — twin of ``ml.kmeans_exact``.

Same posture as ``plans/cc_oracle.py`` for connected components: the
Spark operator's spec is deterministic (integer-exact Lloyd over
fixed-point z-scores — see ``ml.kmeans_exact``'s docstring), so the
oracle re-executes that spec with DuckDB doing every data-sized step
(standardization sums, z-score quantization, the hash-ordered training
sample, the final full-table assignment + aggregation) and Python doing
only what the Spark driver also does (mean/std division from exact
sums, Lloyd on the <=65536-row sample). The Lloyd loop here is a
DIFFERENT implementation of the same integer spec than ``ml.lloyd_int``
(per-cluster accumulation loops vs one broadcast tensor op) — integer
exactness means any correct implementation agrees bit-for-bit, which is
the point of making the spec exact.

``tools/check_correctness.py`` runs this via the registry's
``oracle_py`` hook; there is no pure-SQL form because the iteration
count is data-dependent (a fixed unroll would be either wasteful or
wrong), which is exactly the case the oracle_py contract exists for.
"""

from __future__ import annotations

import math


def _lloyd_int_independent(X, k: int, max_iter: int):
    """Integer Lloyd, implemented differently from ml.lloyd_int on
    purpose: explicit per-cluster/per-dimension accumulation instead of
    a broadcast tensor, plain-python floor division for the centroid
    update. Same spec -> same exact centroids."""
    import numpy as np

    X = np.asarray(X, dtype=np.int64)
    n, d = X.shape
    cent = [tuple(int(v) for v in X[j]) for j in range(k)]
    for _ in range(max_iter):
        best_d = None
        lab = np.zeros(n, dtype=np.int64)
        for j, cj in enumerate(cent):
            acc = np.zeros(n, dtype=np.int64)
            for i in range(d):
                diff = X[:, i] - cj[i]
                acc += diff * diff
            if best_d is None:
                best_d = acc
            else:
                better = acc < best_d  # strict: ties keep lower id
                lab[better] = j
                best_d = np.where(better, acc, best_d)
        new = []
        for j in range(k):
            members = X[lab == j]
            if len(members) == 0:
                new.append(cent[j])
            else:
                cnt = len(members)
                new.append(tuple(
                    int(members[:, i].sum()) // cnt for i in range(d)))
        if new == cent:
            break
        cent = new
    return cent


def kmeans_oracle_duck(con, feature_cols: list[str], key_sql: str,
                       metric_col: str, table: str = "lineitem",
                       k: int = 3, max_iter: int = 60,
                       max_train_rows: int = 65536):
    """pandas DataFrame[cluster, n, avg_qty] — q62's oracle result."""
    from etl_transparencia_sergipe_spark.operators.similarity import (
        SAMPLE_HASH,
    )

    # shared overflow-safe hash template — must be the exact expression
    # ml.kmeans_exact orders its sample by
    km_h_sql = SAMPLE_HASH.format(id=f"({key_sql})")
    d = len(feature_cols)
    stats_sel = ", ".join(
        f"CAST(SUM(CAST({c} AS DECIMAL(28,6))) AS DOUBLE) AS s1_{i}, "
        f"CAST(SUM(CAST({c} * {c} AS DECIMAL(28,6))) AS DOUBLE) AS s2_{i}, "
        f"COUNT({c}) AS n_{i}"
        for i, c in enumerate(feature_cols))
    srow = con.execute(f"SELECT {stats_sel} FROM {table}").fetchdf().iloc[0]

    zexprs = []
    for i, c in enumerate(feature_cols):
        n = int(srow[f"n_{i}"])
        mean = float(srow[f"s1_{i}"]) / n
        std = math.sqrt(float(srow[f"s2_{i}"]) / n - mean * mean)
        # literal injection via repr: shortest round-trip repr parses
        # back to the identical double in DuckDB, so the per-row
        # ((x - mean) / std) * 1e6 is the same IEEE op sequence Spark
        # runs with the same constants
        zexprs.append(
            f"CAST(floor((({c} - {mean!r}) / {std!r}) * 1000000.0) "
            f"AS BIGINT) AS zq_{i}")
    con.execute(f"""
        CREATE OR REPLACE TEMP TABLE _km_zq AS
        SELECT {', '.join(zexprs)}, {metric_col} AS metric,
               ({key_sql}) AS km_key,
               {km_h_sql} AS km_h
        FROM {table}
    """)
    zq_cols = ", ".join(f"zq_{i}" for i in range(d))
    # (hash, key, zq...) — same semantically-total order as the Spark
    # side (key_expr need not be unique; see ml.kmeans_exact)
    sample = con.execute(
        f"SELECT {zq_cols} FROM _km_zq "
        f"ORDER BY km_h, km_key, {zq_cols} "
        f"LIMIT {max_train_rows}").fetchall()
    cent = _lloyd_int_independent(
        [list(row) for row in sample], k=k, max_iter=max_iter)

    dists = [
        " + ".join(f"(zq_{i} - {cj[i]}) * (zq_{i} - {cj[i]})"
                   for i in range(d))
        for cj in cent
    ]
    # lowest-index-wins argmin cascade, same strict-< tie rule as the
    # Spark CASE chain
    best = "0"
    bestd = f"({dists[0]})"
    for j in range(1, k):
        best = f"CASE WHEN ({dists[j]}) < {bestd} THEN {j} ELSE {best} END"
        bestd = (f"CASE WHEN ({dists[j]}) < {bestd} THEN ({dists[j]}) "
                 f"ELSE {bestd} END")

    return con.execute(f"""
        SELECT CAST({best} AS INT) AS cluster,
               CAST(COUNT(*) AS BIGINT) AS n,
               round(CAST(SUM(CAST(metric AS DECIMAL(28,6))) AS DOUBLE)
                     / COUNT(*), 4) AS avg_qty
        FROM _km_zq GROUP BY 1 ORDER BY 1
    """).fetchdf()
