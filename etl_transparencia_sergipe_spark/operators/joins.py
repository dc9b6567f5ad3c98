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
              right_cols: list[str]) -> DataFrame:
    """Backward as-of left join: for each left row, attach ``right_cols``
    from the right row with the greatest ``right_ts`` <= ``left_ts`` on the
    same key (NULLs when none precede it).

    The right side should be unique per (key, ts) — dedupe first, or ties
    are resolved arbitrarily (same caveat as ``pd.merge_asof``).
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
    w = (
        W.partitionBy("_k").orderBy("_ts", "_is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = combined.select(
        "_is_left", "_row",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return filled.filter("_is_left = 1").select("_row.*", *right_cols)
