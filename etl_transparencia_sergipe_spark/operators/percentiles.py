"""Distributed EXACT percentiles via distribution compression.

``F.percentile`` (Spark's exact percentile aggregate) is an
ObjectHashAggregate that buffers EVERY value of the group in one
aggregation buffer: per-group memory is O(group rows) — at 100 TB a
single-group percentile OOMs an executor, full stop — and the final
merge of those buffers is single-task per group, so it also strands the
cluster (measured: q19 3.3 s / q56 3.9 s at sf1 for work DuckDB's
radix-select does in 0.24 s).

The scalable exact formulation compresses the value DISTRIBUTION first:

1. ``groupBy(keys, value).count()`` — partially aggregated map-side, so
   the shuffle carries one row per DISTINCT value (lineitem sf1:
   l_quantity 2M rows -> 50 rows/group, l_extendedprice -> 198k/group);
2. one cumulative-count window over the compressed distribution gives
   every distinct value its 1-based rank interval [cum-cnt+1, cum];
3. percentile_cont's rank arithmetic (0-based pos = (n-1)*p, linear
   interpolation ``lo + (hi-lo)*frac``) reduces to a conditional
   aggregate picking the two covering rows.

Same formula as Spark's Percentile.getPercentile and DuckDB's
quantile_cont, so results are bit-identical to both (pinned by
tests/test_percentiles.py against F.percentile at two scales, and by
the q19/q56 oracle hashes). Memory per task is O(distinct values in
partition); every stage partial-aggregates or windows over compressed
rows — the 100 TB posture.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _stacked(df: DataFrame, keys: list[str],
             specs: list[tuple[str, list[float], list[str]]]) -> DataFrame:
    """[keys..., _name, _v]: the value columns stacked into rows (nulls
    dropped, F.percentile semantics), shared by the distribution groupBy
    and the auto-switch distinct estimate.

    Round 12 note: a fan_out of the projection was tried here (and in
    value_distribution) and REVERTED — these paths stack near-unique
    values (l_extendedprice), so the partial agg cannot collapse rows
    and the pre-spread exchange moved the full stream a second time for
    nothing: q19 2.6 -> 3.6 s, q56 1.54 -> 2.20 s in same-session A/Bs.
    fan_out only pays when the map work is heavy AND the next partial
    agg collapses to a handful of groups (q01/q18/q37/q60-class exact-
    decimal sums)."""
    npairs = ", ".join(f"'{c}', CAST({c} AS DOUBLE)" for c, _, _ in specs)
    return (
        df.selectExpr(*keys, f"stack({len(specs)}, {npairs}) AS (_name, _v)")
        .filter("_v IS NOT NULL")
    )


def stacked_value_distribution(
        df: DataFrame, keys: list[str],
        specs: list[tuple[str, list[float], list[str]]]) -> DataFrame:
    """Compressed distribution over SEVERAL value columns in one scan +
    one shuffle: [keys..., _name, _v, _cnt]. ``specs``: (value_col, ps,
    out_cols) per column — the columns are stacked into (_name, _v)
    rows before the distribution groupBy, so a q19-shaped query (median
    qty + price quartiles) reads the fact table once."""
    return _stacked(df, keys, specs).groupBy(*keys, "_name", "_v").agg(
        F.count("*").alias("_cnt"))


# Auto-switch ceiling: the window path sorts ONE (group, column)'s full
# distinct-value set in a single task, so the budget is what one task
# can sort/hold — ~10^8 doubles (~1.6 GB of sort buffer) on a standard
# 4-8 GB executor slot. 50M leaves a 2x margin over approx_count_
# distinct's ~5% rsd and heap-size variation across deployments. The
# threshold and the decision protocol are recorded in BASELINE.md
# (round-10 VERDICT item 6).
DISTINCT_BUDGET_PER_TASK = 50_000_000


def exact_percentiles_stacked(
        df: DataFrame, keys: list[str],
        specs: list[tuple[str, list[float], list[str]]],
        bucketed: bool | None = None, n_buckets: int = 4096,
        distinct_budget: int = DISTINCT_BUDGET_PER_TASK) -> DataFrame:
    """Percentiles over SEVERAL value columns in one scan + one shuffle.

    Same bit-identical interpolation as :func:`exact_percentiles`;
    BOTH paths below return bit-identical results (pinned against
    F.percentile by tests/test_percentiles.py), so the choice is purely
    a physical-plan decision.

    ``bucketed`` selects :func:`percentiles_bucketed`'s bounded-
    per-task selection — the shape for when distinct-values-per-group
    exceeds what one task can sort (billions at 100 TB). False keeps
    the full cumulative window: one task per (group, column) over that
    group's DISTINCT values, which is both fine and faster while
    distinct counts are single-task-sized (measured at sf1: 1.7 s vs
    2.5 s — the bucketed path pays a persist + four extra bounded
    stages). Default None AUTO-SELECTS (round-9 VERDICT item 6: a plan
    decision, not a deployment call): one cheap approx_count_distinct
    pass over the pruned (keys, value) columns estimates the max
    distinct-per-(group, column); above ``distinct_budget`` the
    bucketed path is chosen. The estimate pass partial-aggregates
    map-side into one HLL sketch per (group, column) — a tiny shuffle —
    and costs one extra scan of two-three columns, the price of never
    shipping a plan whose single-task sort OOMs at 100x.
    """
    if bucketed is None:
        est = (_stacked(df, keys, specs)
               .groupBy(*keys, "_name")
               .agg(F.approx_count_distinct("_v").alias("_nd"))
               .agg(F.max("_nd")).first()[0])
        bucketed = est is not None and est > distinct_budget
    dist = stacked_value_distribution(df, keys, specs)
    if bucketed:
        return percentiles_bucketed(dist, keys, specs, n_buckets)
    wo = W.partitionBy(*keys, "_name").orderBy("_v")
    wa = W.partitionBy(*keys, "_name")
    dist = (
        dist.withColumn("_cum", F.sum("_cnt").over(wo))
        .withColumn("_n", F.sum("_cnt").over(wa))
    )
    aggs = []
    for c, ps, outs in specs:
        for p, out in zip(ps, outs):
            aggs.append(_interp_agg(p, "_v", extra=F.col("_name") == c)
                        .alias(out))
    return dist.groupBy(*keys).agg(*aggs)


def _interp_agg(p: float, value: str, extra=None):
    """Conditional-aggregate percentile_cont expression over a
    _cnt/_cum/_n-annotated distribution frame (see module docstring)."""
    pos = (F.col("_n") - 1).cast("double") * F.lit(float(p))
    lo0 = F.floor(pos).cast("double")
    w_hi = pos - lo0
    w_lo = (lo0 + F.lit(1.0)) - pos
    lo_rank = F.floor(pos) + 1
    hi_rank = lo_rank + 1

    def covers(r):
        c = (F.col("_cum") - F.col("_cnt") < r) & (F.col("_cum") >= r)
        return c if extra is None else (c & extra)

    v_lo = F.max(F.when(covers(lo_rank), F.col(value)))
    v_hi = F.max(F.when(covers(hi_rank), F.col(value)))
    # weights are constant within the group; max() just selects them
    s_w_hi = F.max(F.when(covers(lo_rank), w_hi))
    s_w_lo = F.max(F.when(covers(lo_rank), w_lo))
    return (F.when(s_w_hi == 0.0, v_lo)
            .otherwise(s_w_lo * v_lo + s_w_hi * F.coalesce(v_hi, v_lo)))


def value_distribution(df: DataFrame, keys: list[str],
                       value: str) -> DataFrame:
    """The compressed (value, count) distribution:
    DataFrame[keys..., _v double, _cnt long]. One partial-aggregated
    exchange carrying one row per DISTINCT value; every exact-order-
    statistic consumer (percentiles, IQR fences, outlier counts) can
    share ONE of these instead of rescanning the fact table. Nulls in
    ``value`` are ignored (F.percentile semantics); grouping on the
    double cast keeps the distinct set identical to what the buffered
    aggregate would see."""
    return (
        df.filter(F.col(value).isNotNull())
        .select(*keys, F.col(value).cast("double").alias("_v"))
        .groupBy(*keys, "_v")
        .agg(F.count("*").alias("_cnt"))
    )


def percentiles_from_distribution(dist: DataFrame, keys: list[str],
                                  ps: list[float],
                                  out_cols: list[str]) -> DataFrame:
    """percentile_cont over an existing :func:`value_distribution`
    frame — the reusable second half of :func:`exact_percentiles`, so a
    caller that also aggregates over the distribution (q56's outlier
    counts) pays the fact-table scan and the distribution exchange
    exactly once."""
    wo = W.partitionBy(*keys).orderBy("_v")
    wa = W.partitionBy(*keys)
    annotated = (
        dist.withColumn("_cum", F.sum("_cnt").over(wo))
        .withColumn("_n", F.sum("_cnt").over(wa))
    )
    # 0-based position pos = (n-1)*p; covering 1-based ranks are
    # floor(pos)+1 and floor(pos)+2. Interpolation (in _interp_agg)
    # replicates Spark's Percentile.getPercentile ARITHMETIC exactly —
    # (higher - pos) * lo_val + (pos - lower) * hi_val, with the
    # frac == 0 case returning lo_val directly — because the
    # algebraically-equal `lo + (hi-lo)*frac` form differs in the last
    # ulp and flips cross-engine hashes (caught by
    # tests/test_percentiles.py's bit-identical assertion).
    aggs = [_interp_agg(p, "_v").alias(out)
            for p, out in zip(ps, out_cols)]
    return annotated.groupBy(*keys).agg(*aggs)


def exact_percentiles(df: DataFrame, keys: list[str], value: str,
                      ps: list[float],
                      out_cols: list[str] | None = None) -> DataFrame:
    """DataFrame[keys..., <out_col per p>] with percentile_cont values.

    Nulls in ``value`` are ignored (F.percentile semantics). ``ps`` must
    be in [0, 1); p=1.0 would need a rank clamp this keeps out of the
    hot expression.
    """
    if out_cols is None:
        out_cols = [f"p{int(p * 100)}" for p in ps]
    dist = value_distribution(df, keys, value)
    return percentiles_from_distribution(dist, keys, ps, out_cols)


def percentiles_bucketed(dist: DataFrame, keys: list[str],
                         specs: list[tuple[str, list[float], list[str]]],
                         n_buckets: int = 4096) -> DataFrame:
    """Bucket-bracketed EXACT percentiles over a stacked
    :func:`value_distribution` frame ([keys..., _name, _v, _cnt]) —
    the formulation whose per-task work is BOUNDED at any scale
    (round 8).

    percentiles_from_distribution's cumulative window sorts each
    (keys, _name) partition in ONE task: O(distinct values in the
    group) per task. For near-unique value columns that is O(group
    rows) — at 100 TB a single-task sort of billions of rows, the same
    class of ceiling the distribution formulation was built to avoid.
    This variant never globally sorts the distribution:

    1. per-group stats (n, min, max) — one tiny partial-agg pass;
    2. equi-width bucket histogram over ``n_buckets`` buckets — one
       partial-agg pass, <= n_buckets rows per group;
    3. cumulative counts over BUCKETS (window partitions of
       <= n_buckets rows — bounded, regardless of data size);
    4. only buckets COVERING a target rank (<= 2 per percentile)
       survive; the distribution rows inside them — expected
       O(distinct / n_buckets) per group — get a local cumulative
       window offset by the bucket's preceding count, reproducing the
       global rank exactly;
    5. the same bit-exact interpolation aggregate as
       :func:`percentiles_from_distribution`.

    Bucket assignment uses float arithmetic, but ONLY to partition the
    value axis: ranks come from counting actual rows per bucket, and
    floor of a monotone map keeps buckets value-ordered, so any
    consistent rounding yields the same covering rows. Results are
    bit-identical to F.percentile / quantile_cont
    (tests/test_percentiles.py pins both formulations against
    F.percentile).
    """
    from etl_transparencia_sergipe_spark.caching import persist_scoped

    # the distribution feeds three passes (stats, histogram, covering-
    # row fetch) — persist it once instead of re-running the fact scan
    # + distribution exchange per pass
    dist = dist.transform(persist_scoped)
    # 1. per-(group, name) stats, broadcast back onto the distribution
    stats = dist.groupBy(*keys, "_name").agg(
        F.sum("_cnt").alias("_n"),
        F.min("_v").alias("_lo"),
        F.max("_v").alias("_hi"))
    b = (
        dist.join(F.broadcast(stats), [*keys, "_name"])
        .withColumn(
            "_b",
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor((F.col("_v") - F.col("_lo"))
                            / (F.col("_hi") - F.col("_lo"))
                            * n_buckets).cast("int"))))
    )
    # 2-3. bucket histogram + cumulative over buckets (<= n_buckets
    # rows per window partition — bounded)
    wb = W.partitionBy(*keys, "_name").orderBy("_b")
    bcum = (
        b.groupBy(*keys, "_name", "_n", "_b")
        .agg(F.sum("_cnt").alias("_bc"))
        .withColumn("_cum_end", F.sum("_bc").over(wb))
        .withColumn("_cum_before", F.col("_cum_end") - F.col("_bc"))
    )
    # 4. covering-bucket predicate: any target rank r (per _name) with
    # _cum_before < r <= _cum_end. lo_rank = floor((n-1)p)+1,
    # hi_rank = lo_rank+1 (always <= n for p < 1).
    covers = []
    for cname, ps, _ in specs:
        for p in ps:
            pos = (F.col("_n") - 1).cast("double") * F.lit(float(p))
            for r in (F.floor(pos) + 1, F.floor(pos) + 2):
                covers.append(
                    (F.col("_name") == cname)
                    & (F.col("_cum_before") < r)
                    & (F.col("_cum_end") >= r))
    needed = bcum.filter(
        reduce(lambda a, c: a | c, covers)
    ).select(*keys, "_name", "_b", "_cum_before")
    # 5. rows inside covering buckets only; local cumsum + bucket
    # offset reproduces the GLOBAL _cum; interpolation unchanged
    kept = b.join(F.broadcast(needed), [*keys, "_name", "_b"])
    wo = W.partitionBy(*keys, "_name", "_b").orderBy("_v")
    kept = kept.withColumn(
        "_cum", F.col("_cum_before") + F.sum("_cnt").over(wo))
    aggs = []
    for cname, ps, outs in specs:
        for p, out in zip(ps, outs):
            aggs.append(
                _interp_agg(p, "_v", extra=F.col("_name") == cname)
                .alias(out))
    return kept.groupBy(*keys).agg(*aggs)
