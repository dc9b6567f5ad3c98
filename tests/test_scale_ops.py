"""Scale-engineering checks: bucketed joins skip the shuffle, salted
aggregation/join match their unsalted equivalents, as-of join matches a
per-group reference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.operators.joins import asof_join
from etl_transparencia_sergipe_spark.operators.scale import (
    _size_bytes,
    estimated_input_size,
    fan_out,
    salted_agg,
    salted_join,
    write_bucketed,
)
from etl_transparencia_sergipe_spark.sources.catalog import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    write_bucketed(o.select("o_orderkey", "o_totalprice"), "b_orders",
                   "o_orderkey", 8)
    write_bucketed(li.select("l_orderkey", "l_quantity"), "b_lineitem",
                   "l_orderkey", 8)
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    # disable broadcast so the co-location actually matters
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout co-locates both sides
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_agg_matches_direct(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    salted = salted_agg(li, "l_returnflag", "l_quantity", salt_n=16)
    direct = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double")
        .alias("total"),
        F.count("*").alias("n"))
    assert sorted(map(tuple, salted.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_salted_join_matches_direct(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    salted = salted_join(li, o, "l_orderkey", salt_n=8)
    direct = li.join(o, "l_orderkey")
    assert salted.count() == direct.count()
    s = salted.agg(F.sum(F.col("l_quantity").cast("decimal(28,6)"))).collect()[0][0]
    d = direct.agg(F.sum(F.col("l_quantity").cast("decimal(28,6)"))).collect()[0][0]
    assert s == d


def test_salt_is_deterministic_across_layouts(spark, sf_dir):
    """Retry-safety contract: the salt must be a pure function of row
    content — the same row gets the same bucket no matter which task
    computes it or how the input is physically partitioned (a stage retry
    is exactly a re-evaluation under a different task layout)."""
    from etl_transparencia_sergipe_spark.operators.scale import _row_salt

    li = (load_table(spark, "lineitem", sf_dir)
          .select("l_orderkey", "l_linenumber", "l_quantity").limit(2000))

    def salted_rows(df):
        return sorted(map(tuple,
                          df.withColumn("_salt", _row_salt(df, 16)).collect()))

    a = salted_rows(li)
    b = salted_rows(li.repartition(7))       # different physical layout
    c = salted_rows(li.coalesce(1))          # single-task evaluation
    assert a == b == c
    # and the salt actually spreads rows (not a constant)
    assert len({row[-1] for row in a}) > 1


def test_asof_join_matches_pandas_reference(spark):
    import pandas as pd

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d"), (3, 9, "e")],
        "k int, ts int, tag string")
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (2, 7, 300.0), (4, 1, 400.0)],
        "k int, rts int, val double")
    got = {
        (r.k, r.ts): r.val
        for r in asof_join(left, right, "k", "ts", "rts", ["val"]).collect()
    }
    # k=1 ts=10 -> rts=8; ts=20 -> rts=15; ts=5 -> none; k=2 ts=7 -> rts=7
    # (inclusive); k=3 -> no right rows
    assert got == {(1, 10): 100.0, (1, 20): 200.0, (1, 5): None,
                   (2, 7): 300.0, (3, 9): None}


def test_asof_join_bucketed_matches_default(spark):
    """Small reference case: ts-bucketed two-pass plan == default plan,
    including carry-in across empty buckets."""
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (1, 250, "f"),
         (2, 7, "d"), (3, 9, "e")],
        "k int, ts int, tag string")
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (2, 7, 300.0), (4, 1, 400.0)],
        "k int, rts int, val double")
    base = asof_join(left, right, "k", "ts", "rts", ["val"])
    # width 10 puts ts=250 three empty buckets past the last right row —
    # the carry-in must skip over them
    bucketed = asof_join(left, right, "k", "ts", "rts", ["val"],
                         ts_bucket="_ts div 10")
    assert sorted(map(tuple, base.collect())) == \
        sorted(map(tuple, bucketed.collect()))


def test_asof_join_hot_key_bucketed(spark):
    """One key owns ALL rows (the skew case the default plan serializes).
    The bucketed plan must (a) agree with the default plan exactly and
    (b) split the hot key's window work across >1 task."""
    n = 5000
    left = spark.range(n).selectExpr(
        "1 AS k", "CAST(id AS INT) AS ts", "CAST(id AS STRING) AS tag")
    right = spark.range(0, n, 50).selectExpr(
        "1 AS k", "CAST(id AS INT) AS rts", "CAST(id AS DOUBLE) AS val")
    base = asof_join(left, right, "k", "ts", "rts", ["val"])
    bucketed = asof_join(left, right, "k", "ts", "rts", ["val"],
                         ts_bucket="_ts div 500")
    b = {(r.k, r.ts): r.val for r in base.collect()}
    s = {(r.k, r.ts): r.val for r in bucketed.collect()}
    assert b == s
    # every ts matches floor(ts/50)*50 — spot-check the semantics too
    assert s[(1, 4999)] == 4950.0 and s[(1, 0)] == 0.0
    # plan check: the big in-bucket window must partition by (_k, _b) —
    # that is what fans the hot key out across the 10 bucket groups
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    import re

    win_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert any("_k" in ws and "_b" in ws for ws in win_specs), win_specs


def test_asof_join_bucketed_null_right_cols(spark):
    """NULL fields in right rows: the default plan fills each column
    independently (last ignorenulls), so a NULL in the latest preceding
    right row falls back to an earlier row per column. The bucketed plan
    must reproduce that exactly — including when the fallback value lives
    in an earlier bucket."""
    left = spark.createDataFrame(
        [(1, 12), (1, 30), (1, 55), (2, 40)], "k int, ts int")
    # latest right row before ts=30 is rts=25 with val=NULL (fallback to
    # rts=8's 100.0, which is in an EARLIER bucket for width 10); tag has
    # the opposite null pattern so per-column independence is exercised
    right = spark.createDataFrame(
        [(1, 8, 100.0, None), (1, 25, None, "x"), (1, 50, 300.0, None),
         (2, 35, None, None)],
        "k int, rts int, val double, tag string")
    base = asof_join(left, right, "k", "ts", "rts", ["val", "tag"])
    got_b = sorted(map(tuple, base.collect()))
    assert got_b == sorted([
        (1, 12, 100.0, None), (1, 30, 100.0, "x"), (1, 55, 300.0, "x"),
        (2, 40, None, None)])
    for width in (10, 3, 1000):
        bucketed = asof_join(left, right, "k", "ts", "rts", ["val", "tag"],
                             ts_bucket=f"_ts div {width}")
        assert sorted(map(tuple, bucketed.collect())) == got_b, width


def test_asof_join_bucketed_randomized(spark):
    """Randomized (seeded) equivalence: default vs bucketed as-of plans on
    clustered keys, duplicate timestamps on the left, sparse right sides,
    and keys with no right rows at all."""
    import random

    rng = random.Random(42)
    left = [(rng.randint(1, 6), rng.randint(0, 1000), i)
            for i in range(400)]
    # right rows unique per (key, ts) — the operator's documented contract;
    # ~30% NULL vals exercise the per-column ignorenulls fallback
    right = list({(k, ts): (k, ts,
                            None if rng.random() < 0.3 else float(i))
                  for i, (k, ts) in enumerate(
        (rng.randint(1, 4), rng.randint(0, 1000)) for _ in range(120)
    )}.values())
    ldf = spark.createDataFrame(left, "k int, ts int, row_id int")
    rdf = spark.createDataFrame(right, "k int, rts int, val double")
    base = asof_join(ldf, rdf, "k", "ts", "rts", ["val"])
    for width in (7, 100, 5000):  # incl. one bucket >> ts range
        bucketed = asof_join(ldf, rdf, "k", "ts", "rts", ["val"],
                             ts_bucket=f"_ts div {width}")
        assert sorted(map(tuple, base.collect())) == \
            sorted(map(tuple, bucketed.collect())), width


def test_asof_join_auto_buckets_timestamps(spark):
    """Round 13: ts_bucket='auto' (now the default) derives calendar-
    month buckets when both ts columns are date/timestamp — results
    identical to the forced plain plan, and the in-bucket window must
    partition by (_k, _b) (the hot-key fan-out). Numeric ts inputs keep
    the plain plan (no inferable scale), covered by the tests above."""
    import re

    left = spark.createDataFrame(
        [(1, "2024-01-15"), (1, "2024-03-02"), (1, "2023-11-30"),
         (2, "2024-02-01"), (3, "2024-06-01")],
        "k int, d string").selectExpr("k", "CAST(d AS TIMESTAMP) AS ts")
    right = spark.createDataFrame(
        [(1, "2024-01-10", 1.0), (1, "2024-02-20", 2.0),
         (2, "2023-01-01", 3.0)],
        "k int, d string, val double").selectExpr(
        "k", "CAST(d AS DATE) AS rts", "val")
    auto = asof_join(left, right, "k", "ts", "rts", ["val"])
    plain = asof_join(left, right, "k", "ts", "rts", ["val"],
                      ts_bucket=None)
    assert sorted(map(tuple, auto.collect())) == \
        sorted(map(tuple, plain.collect()))
    plan = auto._jdf.queryExecution().executedPlan().toString()
    win_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert any("_k" in ws and "_b" in ws for ws in win_specs), win_specs


def test_size_bytes_suffixes():
    """Round-13 ADVICE fix: two-letter Spark byte suffixes must parse
    ('128mb' used to fall into the bare-'b' branch and raise out of
    fan_out); unparseable values degrade to the 128 MiB Spark default
    instead of crashing query build."""
    assert _size_bytes("16777216") == 16777216
    assert _size_bytes("128m") == 128 * 2**20
    assert _size_bytes("128mb") == 128 * 2**20
    assert _size_bytes("1gb") == 2**30
    assert _size_bytes("64kb") == 64 * 2**10
    assert _size_bytes("2t") == 2 * 2**40
    assert _size_bytes("512b") == 512
    assert _size_bytes("-1") == -1
    assert _size_bytes("not-a-size") == 128 * 2**20


def test_estimated_input_size_and_fan_out(spark, sf_dir):
    """estimated_input_size stats the file-backed relations through a
    derived plan (and percent-decoded paths, round-13 ADVICE); fan_out
    repartitions only single-task-league file inputs and leaves
    non-file sources alone."""
    docs = load_table(spark, "documents", sf_dir)
    est = estimated_input_size(docs.selectExpr("doc_id").limit(10))
    assert est is not None
    n_files, total = est
    assert n_files >= 1 and total > 0
    assert estimated_input_size(spark.range(10)) is None
    # tiny single-file input below the session split budget: fan_out
    # inserts a repartition to the session's parallelism
    fanned = fan_out(docs)
    assert "Repartition" in fanned._jdf.queryExecution().logical().toString()
    # non-file source: untouched frame comes back
    rng = spark.range(10)
    assert fan_out(rng) is rng


def test_pack_chunks_shard_width_invariance(spark, sf_dir):
    """q57's two-pass sharded running sum must produce identical packing
    accounting for ANY shard width — including width 1 (every doc its own
    shard, pure carry-in) and a width larger than the id range (single
    shard, equivalent to the round-1 global window)."""
    from etl_transparencia_sergipe_spark.plans.textops import q57_pack_chunks

    ref = sorted(map(tuple, q57_pack_chunks(spark, sf_dir).collect()))
    for w in (1, 17, 10_000_000):
        got = sorted(map(tuple,
                         q57_pack_chunks(spark, sf_dir, shard_w=w).collect()))
        assert got == ref, w
