"""Generated literal-constant oracle SQL for the trained-ANN family
(round-12, r11 VERDICT item 5).

The driver runs exactly what ``oracle_sql()`` publishes; for
q63/q98/q99/q101/q102/q103 that string is now GENERATED at call time by
``_gen_sql`` — trained constants from the driver's own sf0.01 parquet,
injected as literals. These tests are DuckDB-only (no SparkSession):
they pin that the published SQL is (a) present, (b) executable on a
plain connection with only the testdata views registered (the driver's
posture), and (c) result-identical, order-insensitively, to the
``oracle_py`` twins the local gate has hash-verified against Spark
since round 5. The Spark-side hash equivalence itself is certified by
``SPARK_GRAFT_PREFER_SQL=1 tools/check_correctness.py`` (run green at
sf0.01 this round) and by the driver window.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from etl_transparencia_sergipe_spark.plans import registry

SF_DIR = "/root/testdata/sf0.01"
ANN_GEN = [
    "q63_ivf_trained_topk",
    "q98_pq_ann_topk",
    "q99_pq_rerank_topk",
    "q101_ivfpq_topk",
    "q102_ivfpq_residual_topk",
    "q103_ivfpq_residual_refine_topk",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')")
    yield c
    c.close()


@pytest.fixture(scope="module")
def oracles():
    registry._ensure_loaded()
    return registry.oracle_sql()


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_gen_family_published(oracles):
    """Every trained-ANN query now publishes driver-runnable SQL —
    the family is no longer rows-only at the driver."""
    missing = [n for n in ANN_GEN if n not in oracles]
    assert not missing, f"oracle_gen produced no SQL for {missing}"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
@pytest.mark.parametrize("name", ANN_GEN)
def test_gen_sql_matches_py_twin(name, con, oracles):
    """The generated SQL and the long-verified oracle_py twin return the
    same rows (order-insensitive — the driver hash sorts rows)."""
    qd = registry.REGISTRY[name]
    a = con.execute(oracles[name]).fetchdf()
    b = qd.oracle_py(con)
    assert list(a.columns) == list(b.columns)
    ac = a.sort_values(list(a.columns)).reset_index(drop=True)
    bc = b.sort_values(list(b.columns)).reset_index(drop=True)
    assert ac.equals(bc), f"{name}: generated SQL != oracle_py twin"


def test_gen_missing_dir_degrades_to_rows_only(monkeypatch):
    """An absent driver sf dir must yield rows-only (gen returns None),
    never an exception surfacing through oracle_sql()."""
    registry._ensure_loaded()
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", "/nonexistent/sfX")
    sqls = registry.oracle_sql()
    for n in ANN_GEN:
        assert n not in sqls
