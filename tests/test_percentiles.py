"""exact_percentiles (distribution-compressed) must be bit-identical to
F.percentile — the buffered aggregate it replaces in q19/q56 — including
interpolated (frac != 0) and exact-rank (frac == 0) positions, ties, and
null handling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.operators.percentiles import (
    exact_percentiles,
)

SF_DIR = "/root/testdata/sf0.01"


def _cmp(spark, df, keys, value, ps):
    mine = exact_percentiles(df, keys, value, ps).collect()
    ref = df.groupBy(*keys).agg(*[
        F.percentile(value, p).alias(f"p{i}") for i, p in enumerate(ps)
    ]).collect()
    mine_d = {tuple(r[k] for k in keys): [r[c] for c in r.asDict()
                                          if c not in keys] for r in mine}
    ref_d = {tuple(r[k] for k in keys): [r[f"p{i}"]
                                         for i in range(len(ps))]
             for r in ref}
    assert set(mine_d) == set(ref_d)
    for k in ref_d:
        for a, b in zip(mine_d[k], ref_d[k]):
            if a is None or b is None:
                assert a is b
            else:
                # bit-identical doubles, not approx
                assert math.isclose(a, b, rel_tol=0, abs_tol=0), (k, a, b)


def test_matches_builtin_on_lineitem(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    _cmp(spark, li, ["l_returnflag"], "l_quantity", [0.5, 0.25, 0.75])
    _cmp(spark, li, ["l_returnflag"], "l_extendedprice",
         [0.25, 0.75, 0.9, 0.99])


def test_matches_builtin_with_ties_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", None),
         ("b", 5.0), ("b", 7.0), ("c", 3.0)],
        "g string, v double")
    _cmp(spark, df, ["g"], "v", [0.0, 0.25, 0.5, 0.75])


def test_single_value_group(spark):
    df = spark.createDataFrame([("x", 42.0)], "g string, v double")
    out = exact_percentiles(df, ["g"], "v", [0.5], ["med"]).collect()
    assert out[0]["med"] == 42.0


def test_bucketed_is_bit_identical_to_windowed(spark):
    """percentiles_bucketed (the bounded-per-task scale variant) ==
    the windowed formulation == F.percentile, on lineitem and on an
    adversarial frame (all-equal group -> degenerate bucket 0; values
    straddling bucket edges; rank exactly at a bucket boundary)."""
    from etl_transparencia_sergipe_spark.operators.percentiles import (
        exact_percentiles_stacked,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    specs = [("l_quantity", [0.5], ["median_qty"]),
             ("l_extendedprice", [0.25, 0.75, 0.99],
              ["p25", "p75", "p99"])]
    a = sorted(map(tuple, exact_percentiles_stacked(
        li, ["l_returnflag"], specs, bucketed=False).collect()))
    b = sorted(map(tuple, exact_percentiles_stacked(
        li, ["l_returnflag"], specs, bucketed=True).collect()))
    spark.catalog.clearCache()
    assert a == b

    df = spark.createDataFrame(
        [("flat", 7.0)] * 5
        + [("edge", float(i)) for i in range(1, 9)]
        + [("two", 1.0), ("two", 2.0)],
        "g string, v double")
    specs = [("v", [0.0, 0.25, 0.5, 0.875], ["q0", "q1", "q2", "q3"])]
    a = sorted(map(tuple, exact_percentiles_stacked(
        df, ["g"], specs, bucketed=False).collect()))
    # tiny bucket count forces multi-value buckets + boundary hits
    b = sorted(map(tuple, exact_percentiles_stacked(
        df, ["g"], specs, bucketed=True, n_buckets=4).collect()))
    spark.catalog.clearCache()
    assert a == b


def test_auto_select_is_a_plan_decision(spark, monkeypatch):
    """bucketed=None (the default) derives the path from an
    approx_count_distinct estimate against the per-task budget
    (round-9 VERDICT item 6): small distinct counts keep the faster
    windowed plan, a tiny budget forces the bounded bucketed plan, and
    BOTH produce the same rows as the explicit paths."""
    from etl_transparencia_sergipe_spark.operators import percentiles as P

    calls = []
    real = P.percentiles_bucketed

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(P, "percentiles_bucketed", spy)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    specs = [("l_quantity", [0.5], ["median_qty"]),
             ("l_extendedprice", [0.25, 0.75], ["p25", "p75"])]
    ref = sorted(map(tuple, P.exact_percentiles_stacked(
        li, ["l_returnflag"], specs, bucketed=False).collect()))

    # default budget: ~30k distinct prices/group at sf0.01 stays windowed
    auto = sorted(map(tuple, P.exact_percentiles_stacked(
        li, ["l_returnflag"], specs).collect()))
    assert auto == ref and not calls

    # a 10-distinct budget forces the bucketed plan; same rows
    forced = sorted(map(tuple, P.exact_percentiles_stacked(
        li, ["l_returnflag"], specs, distinct_budget=10).collect()))
    spark.catalog.clearCache()
    assert forced == ref and calls


def test_auto_select_empty_and_all_null(spark):
    """The estimate returns NULL on an empty/all-null frame — auto mode
    must fall back to the windowed path, not crash."""
    from etl_transparencia_sergipe_spark.operators.percentiles import (
        exact_percentiles_stacked,
    )

    specs = [("v", [0.5], ["med"])]
    empty = spark.createDataFrame([], "g string, v double")
    assert exact_percentiles_stacked(empty, ["g"], specs).collect() == []
    nulls = spark.createDataFrame([("a", None)], "g string, v double")
    assert exact_percentiles_stacked(nulls, ["g"], specs).collect() == []
