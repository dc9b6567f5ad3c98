"""Windowed event transformations (SURVEY.md §2.10 — all [EXT]; the
reference is pure batch, its month-at-a-time incremental acquisition
(aracaju_barra_pirambu_scraper.py:317-351) being the batch shadow of this
surface).

Each builder takes ANY events DataFrame — batch or streaming — and returns
the transformed DataFrame: the logical plan is identical, only the sink
differs. That is the Structured Streaming model: one declarative plan,
micro-batched or not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.plans._helpers import dsum


def tumbling_counts(events: DataFrame, length: str = "10 minutes",
                    watermark: str | None = None) -> DataFrame:
    """Tumbling window per event_type: count + exact value sum."""
    ev = events.withWatermark("ts", watermark) if watermark else events
    return (
        ev.groupBy(F.window("ts", length), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("win_start"),
            "event_type", "n", "total_value",
        )
    )


def sliding_counts(events: DataFrame, length: str = "10 minutes",
                   slide: str = "5 minutes",
                   watermark: str | None = None) -> DataFrame:
    """Sliding window (each event lands in length/slide panes)."""
    ev = events.withWatermark("ts", watermark) if watermark else events
    return (
        ev.groupBy(F.window("ts", length, slide))
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(F.col("window.start").alias("win_start"), "n", "total_value")
    )


def session_stats(events: DataFrame, gap: str = "5 minutes",
                  watermark: str | None = None) -> DataFrame:
    """Gap-based session windows per user (session_window)."""
    ev = events.withWatermark("ts", watermark) if watermark else events
    return (
        ev.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("sess_start"),
            F.col("session_window.end").alias("sess_end"),
            "n_events", "total_value",
        )
    )


def session_stats_islands(events: DataFrame,
                          gap: str = "5 minutes") -> DataFrame:
    """Batch twin of :func:`session_stats` via the gaps-and-islands
    rewrite: lag-gap flag -> running sum -> one hash aggregation.

    Why it exists (round-6 VERDICT item 4 — q52 was 3.8x at sf1): the
    native ``session_window`` aggregation plans
    Exchange -> Sort -> UpdatingSessions -> two MergingSessions passes —
    machinery built for MERGING sessions across micro-batches, which a
    batch query pays for nothing. The islands plan shuffles ONCE on
    user_id; the window's sort is shared, and the trailing
    groupBy(user_id, sess_id) needs no second exchange because
    hash-partitioning on user_id already clusters (user_id, sess_id).
    Exact same result set (session = maximal run with inter-event gap
    < ``gap``; end = last ts + gap). Streaming paths keep
    ``session_stats`` — window functions aren't streamable.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts")
    gap_i = F.expr(f"INTERVAL {gap}")
    marked = events.withColumn(
        "_new",
        F.when(F.lag("ts").over(w).isNull()
               | (F.col("ts") >= F.lag("ts").over(w) + gap_i), 1)
        .otherwise(0))
    sess = marked.withColumn(
        "_sess", F.sum("_new").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)))
    return (
        sess.groupBy("user_id", "_sess")
        .agg(F.min("ts").alias("sess_start"),
             (F.max("ts") + gap_i).alias("sess_end"),
             F.count("*").alias("n_events"),
             dsum("value").alias("total_value"))
        .select("user_id", "sess_start", "sess_end",
                "n_events", "total_value")
    )


def click_purchase_join(events, horizon: str = "30 minutes",
                        watermark: str | None = None):
    """Stream-stream interval join (§2.10): attribute each purchase to the
    same user's click(s) within the preceding ``horizon``.

    With ``watermark`` set (streaming side), both inputs are watermarked
    and the time-range condition bounds join state on BOTH sides — Spark
    evicts click state older than watermark + horizon and purchase state
    older than watermark, so state stays proportional to the horizon, not
    the stream history. The identical function builds the batch twin
    (watermark=None), and batch ≡ stream is the test oracle.
    """
    clicks = events.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"))
    buys = events.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"),
        F.col("event_id").alias("purchase_id"), "value")
    if watermark is not None:
        clicks = clicks.withWatermark("c_ts", watermark)
        buys = buys.withWatermark("b_ts", watermark)
    joined = clicks.join(buys, F.expr(
        f"c_user = b_user AND b_ts >= c_ts "
        f"AND b_ts <= c_ts + INTERVAL {horizon}"))
    return joined.select(
        F.col("c_user").alias("user_id"), "click_id", "purchase_id",
        "c_ts", "b_ts", "value")
