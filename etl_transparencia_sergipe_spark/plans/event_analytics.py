"""Event-stream analytics: ordered funnel + cohort retention.

The classic product-analytics pair over the events table — the batch
twins of what the reference's monthly consolidation reports would become
on an event stream. Both plans keep every shuffle on ``user_id`` (the
cascaded aggregates and self-joins co-partition), so the only data-
proportional exchange is the first per-user collapse; output is
cohort/stage-shaped (tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.plans._helpers import load
from etl_transparencia_sergipe_spark.plans.registry import register


@register(
    "q77_event_funnel",
    oracle="""
    WITH t1 AS (
        SELECT user_id, MIN(ts) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), t2 AS (
        SELECT e.user_id, MIN(e.ts) AS first_click
        FROM events e JOIN t1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > t1.first_view
        GROUP BY e.user_id
    ), t3 AS (
        SELECT e.user_id, MIN(e.ts) AS first_purchase
        FROM events e JOIN t2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > t2.first_click
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT)
               AS n_users,
           CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM t2) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM t3) AS BIGINT)
               AS n_view_click_purchase
    """,
    doc="A-class ordered funnel: users who viewed, then clicked AFTER "
        "their first view, then purchased AFTER that first click — "
        "cascaded conditional MIN aggregates, each stage joined back on "
        "user_id [EXT]. All three stages and the joins share the "
        "user_id partitioning, so the funnel costs one corpus-"
        "proportional shuffle regardless of stage count.",
)
def q77_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir).select("user_id", "event_type", "ts")
    t1 = (ev.filter("event_type = 'view'")
          .groupBy("user_id").agg(F.min("ts").alias("first_view")))
    t2 = (ev.filter("event_type = 'click'")
          .join(t1, "user_id")
          .filter(F.col("ts") > F.col("first_view"))
          .groupBy("user_id").agg(F.min("ts").alias("first_click")))
    t3 = (ev.filter("event_type = 'purchase'")
          .join(t2, "user_id")
          .filter(F.col("ts") > F.col("first_click"))
          .groupBy("user_id").agg(F.min("ts").alias("first_purchase")))
    return (
        ev.agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
        .crossJoin(t1.agg(F.count("*").cast("bigint").alias("n_view")))
        .crossJoin(t2.agg(F.count("*").cast("bigint")
                          .alias("n_view_click")))
        .crossJoin(t3.agg(F.count("*").cast("bigint")
                          .alias("n_view_click_purchase")))
    )


@register(
    "q78_cohort_retention",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
        FROM events GROUP BY user_id
    ), active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
        FROM events
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cohort_week, active_week) // 7 AS INT)
               AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM active JOIN first_seen USING (user_id)
    GROUP BY 1, 2
    """,
    doc="A-class cohort retention: users bucketed by first-seen ISO week, "
        "counted per (cohort, week-offset) of later activity — the "
        "retention-triangle input [EXT]. first-seen agg and the distinct "
        "activity frame co-partition on user_id; the final group is "
        "cohort-shaped (weeks x offsets).",
)
def q78_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir).select(
        "user_id", F.date_trunc("week", "ts").alias("week"))
    first_seen = ev.groupBy("user_id").agg(
        F.min("week").alias("cohort_week"))
    active = ev.distinct().withColumnRenamed("week", "active_week")
    return (
        active.join(first_seen, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("active_week", "cohort_week")
             .cast("int") / 7).cast("int").alias("week_offset"))
        .agg(F.count("*").cast("bigint").alias("n_active_users"))
    )
