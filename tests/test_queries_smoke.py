"""Smoke: every registered query builds and returns rows at sf0.001, and
entry() satisfies the driver contract."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns


def test_all_queries_build_and_run(spark, sf_dir):
    qs = entrymod.queries()
    assert len(qs) >= 15
    for name, build in qs.items():
        df = build(spark, sf_dir)
        # count() is enough to force full plan execution
        assert df.count() >= 0, name


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs
