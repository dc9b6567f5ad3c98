"""The iterative DuckDB CC oracle (plans/cc_oracle.py) must produce
bit-identical results to the registered recursive-CTE oracle SQL for
q38/q39 — that equality is what lets the local gate swap in the cheap
formulation at sf>=1 while the driver keeps certifying the SQL form.
No Spark involved: pure DuckDB-vs-DuckDB."""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("documents",)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _norm(df):
    cols = sorted(df.columns)
    return sorted(map(tuple, df[cols].astype(str).itertuples(index=False)))


@pytest.mark.parametrize("qname", ["q38_dedup_clusters",
                                   "q39_curation_keep_canonical",
                                   "q97_incremental_cc",
                                   "q107_canonical_dedup"])
def test_oracle_py_matches_oracle_sql(con, qname):
    from etl_transparencia_sergipe_spark.plans.registry import (
        REGISTRY,
        queries,
    )

    queries()  # force registration
    qd = REGISTRY[qname]
    assert qd.oracle_py is not None and qd.oracle is not None
    sql_df = con.execute(qd.oracle).fetchdf()
    py_df = qd.oracle_py(con)
    assert sorted(sql_df.columns) == sorted(py_df.columns)
    assert _norm(sql_df) == _norm(py_df)


def test_cc_labels_cached_across_queries(con):
    """q39 must reuse q38's converged labels (same pair graph)."""
    from etl_transparencia_sergipe_spark.plans import cc_oracle
    from etl_transparencia_sergipe_spark.plans.dedup_queries import (
        _CC_PAIRS_SQL,
    )

    cc_oracle.cc_labels_duck(con, _CC_PAIRS_SQL)
    assert (id(con), _CC_PAIRS_SQL) in cc_oracle._CC_CACHE


def test_cc_cache_survives_id_collision():
    """A stale cache entry whose connection was GC'd (its id() reused
    by a fresh connection with no _cc_labels table) must fall through
    to a rebuild instead of returning a missing table name (round-5
    ADVICE)."""
    from etl_transparencia_sergipe_spark.plans import cc_oracle

    c = duckdb.connect()
    pairs_sql = "SELECT * FROM (VALUES (1, 2), (2, 3)) AS t(id_a, id_b)"
    # simulate the collision: poison the cache for THIS connection's id
    # while the connection holds no _cc_labels table
    cc_oracle._CC_CACHE[(id(c), pairs_sql)] = "_cc_labels"
    t = cc_oracle.cc_labels_duck(c, pairs_sql)
    got = dict(c.execute(f"SELECT node, component FROM {t}").fetchall())
    assert got == {1: 1, 2: 1, 3: 1}


def test_cc_labels_disk_cache_roundtrip(tmp_path, monkeypatch):
    """Round-9 VERDICT item 3: converged labels persist to the disk
    cache and a FRESH connection (new process in real gate runs) loads
    them bit-identically instead of re-clustering; the tag is bound to
    the corpus file identity, so touching the file invalidates."""
    import shutil

    from etl_transparencia_sergipe_spark.plans import cc_oracle
    from etl_transparencia_sergipe_spark.plans.cc_oracle import (
        cc_labels_duck,
        docs_cache_tag,
    )

    monkeypatch.setattr(cc_oracle, "_DISK_CACHE_ROOT", str(tmp_path))
    src = "/root/testdata/sf0.001/documents.parquet"
    docs = str(tmp_path / "documents.parquet")
    shutil.copy(src, docs)
    pairs_sql = ("SELECT a.doc_id AS id_a, b.doc_id AS id_b "
                 "FROM documents a JOIN documents b "
                 "ON b.doc_id = a.doc_id + 1 AND a.doc_id % 7 = 0")

    def fresh_con():
        c = duckdb.connect()
        c.execute(f"CREATE VIEW documents AS SELECT * FROM "
                  f"read_parquet('{docs}')")
        return c

    c1 = fresh_con()
    tag = docs_cache_tag(c1, pairs_sql)
    assert tag is not None
    t = cc_labels_duck(c1, pairs_sql, disk_tag=tag)
    want = sorted(c1.execute(f"SELECT * FROM {t}").fetchall())
    assert (tmp_path / f"{tag}.parquet").exists()

    # fresh connection: same tag -> loaded from disk, bit-identical
    c2 = fresh_con()
    cc_oracle.clear_cc_cache()
    t2 = cc_labels_duck(c2, pairs_sql, disk_tag=docs_cache_tag(c2,
                                                               pairs_sql))
    assert sorted(c2.execute(f"SELECT * FROM {t2}").fetchall()) == want
    # the load must be a read, not a rebuild: poison-check by deleting
    # the edges table name the build path would create
    assert not [r for r in c2.execute(
        "SELECT table_name FROM duckdb_tables() "
        "WHERE table_name = '_cc_edges'").fetchall()]

    # corpus identity change -> different tag (cache invalidated)
    import os
    import time as _time

    os.utime(docs, (_time.time() + 10, _time.time() + 10))
    c3 = fresh_con()
    assert docs_cache_tag(c3, pairs_sql) != tag
    # and a non-read_parquet view yields no tag (no disk caching)
    c4 = duckdb.connect()
    c4.execute("CREATE VIEW documents AS SELECT 1 AS doc_id, 'x' AS text")
    assert docs_cache_tag(c4, pairs_sql) is None


def test_cc_oracle_exact_on_known_graph():
    """Chain + islands fixture: labels equal min reachable id."""
    from etl_transparencia_sergipe_spark.plans.cc_oracle import (
        cc_labels_duck,
    )

    c = duckdb.connect()
    pairs_sql = """
        SELECT * FROM (VALUES (1, 2), (2, 3), (3, 4), (10, 11),
                              (20, 21), (21, 22), (20, 22))
        AS t(id_a, id_b)
    """
    t = cc_labels_duck(c, pairs_sql)
    got = dict(c.execute(f"SELECT node, component FROM {t}").fetchall())
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}
