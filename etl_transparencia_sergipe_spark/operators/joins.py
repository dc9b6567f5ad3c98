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
              ts_bucket: str | None = None) -> DataFrame:
    """Backward as-of left join: for each left row, attach ``right_cols``
    from the right row with the greatest ``right_ts`` <= ``left_ts`` on the
    same key (NULLs when none precede it).

    The right side should be unique per (key, ts) — dedupe first, or ties
    are resolved arbitrarily (same caveat as ``pd.merge_asof``).

    SKEW / HOT KEYS: the default plan windows over ``partitionBy(key)``,
    so one key's entire history lands in ONE task — fine for many medium
    keys, a straggler when one key holds a large share of the rows (e.g.
    every event from one hot user). Pass ``ts_bucket`` — a SQL expression
    over the aligned ``_ts`` column that is monotone in time (e.g.
    ``"_ts div 86400"`` for epoch-second days, ``"year(_ts)"``) — to
    switch to a two-pass plan: in-bucket window fills run in parallel
    per (key, bucket), and a per-bucket summary frame (|keys| x |buckets|
    rows, orders of magnitude smaller than the data) provides carry-in
    values for buckets whose match lies in an earlier bucket. Identical
    results; the hot key now spreads across as many tasks as it has
    time buckets.
    """
    right_types = dict(right.dtypes)

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
    combined = combined.withColumn("_b", F.expr(ts_bucket))
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
    # right row: the default plan fills each column independently with
    # last(ignorenulls), so a NULL field in the latest preceding right row
    # falls back to an earlier row for that column only. struct max orders
    # by _ts first, so the max over (ts, value) pairs with non-null value
    # is exactly "latest non-null value of this column in the bucket".
    summary = combined.groupBy("_k", "_b").agg(
        *[F.max(F.when((F.col("_is_left") == 0) & F.col(c).isNotNull(),
                       F.struct(F.col("_ts"), F.col(c).alias("v"))))
          .getField("v").alias(c)
          for c in right_cols])
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
