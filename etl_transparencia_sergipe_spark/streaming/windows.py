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
