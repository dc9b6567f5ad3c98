"""Bounded-error gates for the rows-only-by-design trio (round-11,
r10 VERDICT item 4): the local gate must FAIL — not print an unexamined
ROWS line — when an approximate query's estimate drifts outside its
documented error bound. Pure-pandas/duckdb tests; no Spark session."""

from __future__ import annotations

import duckdb
import pandas as pd

from etl_transparencia_sergipe_spark.plans.event_analytics import (
    _hll_bound_check,
)
from etl_transparencia_sergipe_spark.plans.relational2 import (
    _q43_bound_check,
)
from etl_transparencia_sergipe_spark.plans.textops import _q29_bound_check


def test_hll_bound_pass_and_fail():
    ok = pd.DataFrame({
        "day": ["2024-01-01", "2024-01-02"],
        "n_active_7d_exact": [1000, 2000],
        "n_active_7d_approx": [1010, 1985],
        "rel_err": [0.01, 0.0075],
    })
    assert _hll_bound_check(ok) is None
    bad = ok.assign(rel_err=[0.01, 0.5])
    assert "rel_err" in _hll_bound_check(bad)
    assert _hll_bound_check(ok.iloc[0:0]) == "empty result"
    assert "exact" in _hll_bound_check(
        ok.assign(n_active_7d_exact=[0, 2000]))


def _con_with(table: str, df: pd.DataFrame) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register(f"_{table}_src", df)
    con.execute(f"CREATE VIEW {table} AS SELECT * FROM _{table}_src")
    return con


def test_q43_bound_pass_and_fail():
    li = pd.DataFrame({
        "l_returnflag": ["A"] * 100 + ["R"] * 100,
        "l_partkey": list(range(100)) + list(range(50)) * 2,
        "l_extendedprice": [float(i) for i in range(100)] * 2,
    })
    con = _con_with("lineitem", li)
    ok = pd.DataFrame({
        "l_returnflag": ["A", "R"],
        "approx_parts": [98, 52],      # within 15% of 100 / 50
        "approx_median": [49.5, 50.0],  # exact p50 = 49.5
    })
    assert _q43_bound_check(ok, con) is None
    bad_cnt = ok.assign(approx_parts=[98, 90])  # 80% off for R
    assert "rel err" in _q43_bound_check(bad_cnt, con)
    bad_med = ok.assign(approx_median=[49.5, 75.0])
    assert "approx_median" in _q43_bound_check(bad_med, con)
    missing = ok.iloc[0:1]
    assert "group count" in _q43_bound_check(missing, con)


def test_q29_bound_pass_and_fail():
    docs = pd.DataFrame({
        "lang": ["en"] * 3 + ["pt"] * 2,
        "doc_id": [f"d{i}" for i in range(5)],
    })
    con = _con_with("documents", docs)
    ok = pd.DataFrame({
        "lang": ["en", "pt"], "n": [3, 2],
        "avg_tfidf_norm": [1.25, 0.8],
    })
    assert _q29_bound_check(ok, con) is None
    assert "!= exact" in _q29_bound_check(ok.assign(n=[3, 7]), con)
    assert "finite" in _q29_bound_check(
        ok.assign(avg_tfidf_norm=[1.25, float("nan")]), con)
    assert "lang groups" in _q29_bound_check(ok.iloc[0:1], con)
