"""Join operators beyond stock equi joins (SURVEY.md J5 + as-of).

``asof_join`` — Spark has no native as-of join; the scalable re-expression
is the union-sort-window trick: tag both sides, union on the key, sort by
(key, ts, side) and carry the last-seen right-side values forward with
``last(ignorenulls)`` over an unbounded-preceding window. One shuffle on
the key (same as any join), no per-group pandas, works at any scale and
with AQE skew handling. ``pd.merge_asof`` inside ``applyInPandas`` is the
fallback only when per-group state must be Python-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              right_cols: list[str],
              ts_bucket: str | None = "auto") -> DataFrame:
    """Backward as-of left join: for each left row, attach ``right_cols``
    from the right row with the greatest ``right_ts`` <= ``left_ts`` on the
    same key (NULLs when none precede it).

    The right side should be unique per (key, ts) — dedupe first, or ties
    are resolved arbitrarily (same caveat as ``pd.merge_asof``).

    SKEW / HOT KEYS: the plain plan windows over ``partitionBy(key)``,
    so one key's entire history lands in ONE task — fine for many medium
    keys, a straggler when one key holds a large share of the rows (e.g.
    every event from one hot user). ``ts_bucket`` — a SQL expression
    over the aligned ``_ts`` column that is monotone in time (e.g.
    ``"_ts div 86400"`` for epoch-second days, ``"year(_ts)"``) —
    switches to a two-pass plan: in-bucket window fills run in parallel
    per (key, bucket), and a per-bucket summary frame (|keys| x |buckets|
    rows, orders of magnitude smaller than the data) provides carry-in
    values for buckets whose match lies in an earlier bucket. Identical
    results (tools/stress_asof.py asserts a full-content checksum); the
    hot key now spreads across as many tasks as it has time buckets.

    Round 13 (r12 VERDICT item 4): the BUCKETED plan is the default at
    scale. tools/stress_asof.py measured the plain shape's one-task
    hot-key window blowing up superlinearly (7.5x worse than ts_bucket
    at 16M hot rows) — precisely the 100x-scale straggler the mandate
    targets. ``ts_bucket="auto"`` is scale-adaptive (the fan_out
    posture, plan- and job-free): when the left side's file-backed
    input is smaller than one task's split budget per core
    (maxPartitionBytes x defaultParallelism), even a 100%-hot key is a
    single comfortable task and the bucketed plan's extra stages
    (summary agg + carry window + join) are pure overhead — plain wins,
    measured 0.7 s vs 1.8 s on q34 at sf0.1. At or above that size (or
    when the input size is unknowable — non-file sources), auto derives
    calendar-month buckets when the aligned ``_ts`` is a date/timestamp
    (monotone by construction; month granularity bounds the summary
    frame at |keys| x |months| while giving a year-spanning hot key ~12
    tasks/year). A NUMERIC ``_ts`` has no scale the operator can infer,
    so auto falls back to the plain plan — pass an explicit bucket
    expression there. Pass ``ts_bucket=None`` to force the plain
    single-window plan.
    """
    right_types = dict(right.dtypes)
    if ts_bucket == "auto":
        from etl_transparencia_sergipe_spark.operators.scale import (
            _size_bytes,
            estimated_input_size,
        )

        lt = dict(left.dtypes)[left_ts]
        rt = right_types[right_ts]
        ts_bucket = None
        if all(t in ("date", "timestamp", "timestamp_ntz")
               for t in (lt, rt)):
            spark = left.sparkSession
            est = estimated_input_size(left)
            single_task_scale = est is not None and est[1] < (
                _size_bytes(spark.conf.get(
                    "spark.sql.files.maxPartitionBytes", "128m"))
                * spark.sparkContext.defaultParallelism)
            if not single_task_scale:
                ts_bucket = "year(_ts) * 12 + month(_ts)"

    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_row"),
        *[F.lit(None).cast(right_types[c]).alias(c) for c in right_cols],
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
        *right_cols,
    )
    # right rows sort before left rows at equal ts => the match is inclusive
    # (right_ts <= left_ts), matching merge_asof's default direction
    combined = r_tag.unionByName(l_tag)
    if ts_bucket is None:
        w = (
            W.partitionBy("_k").orderBy("_ts", "_is_left")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        filled = combined.select(
            "_is_left", "_row",
            *[F.last(c, ignorenulls=True).over(w).alias(c)
              for c in right_cols],
        )
        return filled.filter("_is_left = 1").select("_row.*", *right_cols)

    # two-pass skew-resistant plan (see docstring)
    # Round 13 restructure: the r12 shape computed `summary` over the
    # full `combined` union (with a WHERE _is_left = 0 inside the agg),
    # so the plan re-executed the entire input subtree — left scan,
    # right-side prep, union — a second time for the summary branch; at
    # sf0.1 that doubled q34's wall vs the plain plan. But left rows
    # never contribute to the summary: it is a RIGHT-side-only
    # aggregation. Compute it from ``r_tag`` directly (no union, no
    # left scan) and persist ``r_tag`` under the module's within-query
    # multi-branch policy — the right side of an as-of is
    # dimension-sized by the operator's contract (unique per (key, ts)),
    # so the cache is small at any scale and the right subtree (often
    # an aggregation itself, e.g. q34's orders rollup) runs once.
    from etl_transparencia_sergipe_spark.caching import persist_scoped

    r_tag = persist_scoped(r_tag)
    combined = r_tag.unionByName(l_tag).withColumn("_b", F.expr(ts_bucket))
    w_in = (
        W.partitionBy("_k", "_b").orderBy("_ts", "_is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    infill = combined.select(
        "_k", "_b", "_is_left", "_row",
        *[F.last(c, ignorenulls=True).over(w_in).alias(c)
          for c in right_cols],
    )
    # per-(key, bucket) latest NON-NULL value PER COLUMN — not one latest
    # right row: the in-bucket window fills each column independently with
    # last(ignorenulls), so a NULL field in the latest preceding right row
    # falls back to an earlier row for that column only. struct max orders
    # by _ts first, so the max over (ts, value) pairs with non-null value
    # is exactly "latest non-null value of this column in the bucket".
    summary = r_tag.withColumn("_b", F.expr(ts_bucket)).groupBy(
        "_k", "_b").agg(
        *[F.max(F.when(F.col(c).isNotNull(),
                       F.struct(F.col("_ts"), F.col(c).alias("v"))))
          .getField("v").alias(c)
          for c in right_cols])
    # the carry attaches to infill by EQUI-join on (_k, _b), so the
    # carry frame must hold a row for every bucket that contains a LEFT
    # row, not only the buckets with right rows (a left-only bucket
    # whose match lies buckets back would otherwise miss). A narrow
    # distinct over the left side's (key, bucket) — column-pruned to
    # two columns, partial-aggregated map-side — supplies the coverage;
    # the r12 shape got it implicitly by aggregating the full union,
    # which re-executed the entire wide input a second time.
    left_buckets = (l_tag.select("_k", F.expr(ts_bucket).alias("_b"))
                    .distinct())
    summary = (left_buckets.unionByName(summary.select("_k", "_b"))
               .distinct()
               .join(summary, ["_k", "_b"], "left"))
    # carry-in = last non-null per-column value over STRICTLY EARLIER
    # buckets; the summary frame is tiny relative to the data, so this
    # per-key window is cheap even for the hot key
    w_carry = (W.partitionBy("_k").orderBy("_b")
               .rowsBetween(W.unboundedPreceding, -1))
    carry = summary.select(
        "_k", "_b",
        *[F.last(c, ignorenulls=True).over(w_carry).alias(f"_carry_{c}")
          for c in right_cols])
    out = infill.join(carry, ["_k", "_b"], "left").select(
        "_is_left", "_row",
        *[F.coalesce(F.col(c), F.col(f"_carry_{c}")).alias(c)
          for c in right_cols],
    )
    return out.filter("_is_left = 1").select("_row.*", *right_cols)
