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

from etl_transparencia_sergipe_spark.plans._helpers import dsum, dsum_sql, load
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


# ---------------------------------------------------------------------------
# round-4 extensions: SCD2 interval build + rolling active users
# ---------------------------------------------------------------------------

_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@register(
    "q88_scd2_intervals",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_type) OVER w IS NULL
                     OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
        SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS version
        FROM o
    ), agg AS (
        SELECT user_id, version, MIN(event_type) AS event_type,
               MIN(ts) AS vf, COUNT(*) AS n_events
        FROM runs GROUP BY user_id, version
    )
    SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
           strftime(vf, '{_FMT_DUCK}') AS valid_from,
           strftime(lead(vf) OVER (PARTITION BY user_id ORDER BY version),
                    '{_FMT_DUCK}') AS valid_to,
           CAST(n_events AS BIGINT) AS n_events
    FROM agg
    """,
    doc="D9/W-class SCD type-2 build: collapse each user's event stream "
        "into slowly-changing-dimension validity intervals — gaps-and-"
        "islands run segmentation (lag-change flag + running sum) over "
        "(ts, event_id) total order, then one row per run with "
        "[valid_from, valid_to) from lead(); the open run has NULL "
        "valid_to, exactly the warehouse SCD2 current-row convention. "
        "The generalization of the reference's month-idempotent re-"
        "scrape bookkeeping to full change-history tracking. Shuffle "
        "shape at 100 TB: every window and the final aggregate partition "
        "by user_id, so the whole plan is ONE corpus-proportional "
        "exchange plus per-partition sorts — the same single-shuffle "
        "shape as q52's sessionization [EXT].",
)
def q88_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "chg",
        F.when(F.lag("event_type").over(w).isNull()
               | (F.lag("event_type").over(w) != F.col("event_type")), 1)
        .otherwise(0))
    runs = marked.withColumn(
        "version",
        F.sum("chg").over(w.rowsBetween(W.unboundedPreceding, 0)))
    agg = (runs.groupBy("user_id", "version")
           .agg(F.min("event_type").alias("event_type"),
                F.min("ts").alias("vf"),
                F.count("*").alias("n_events")))
    wv = W.partitionBy("user_id").orderBy("version")
    return agg.select(
        "user_id",
        F.col("version").cast("bigint").alias("version"),
        "event_type",
        F.date_format("vf", _FMT_SPARK).alias("valid_from"),
        F.date_format(F.lead("vf").over(wv), _FMT_SPARK).alias("valid_to"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )


@register(
    "q90_rolling_active_users",
    oracle="""
    WITH d AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (SELECT DISTINCT day FROM d)
    SELECT strftime(days.day, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_active_7d,
           CAST(COUNT(DISTINCT CASE WHEN d.day = days.day
                                    THEN d.user_id END) AS BIGINT)
               AS n_active_1d
    FROM days JOIN d ON d.day BETWEEN days.day - 6 AND days.day
    GROUP BY days.day
    """,
    doc="A8/W-class rolling engagement: per event-day, distinct users "
        "active in the trailing 7 days (the DAU/WAU family — COUNT "
        "DISTINCT over a sliding date range, which no SQL window frame "
        "expresses directly). The Spark plan inverts the range join: "
        "each (day, user) row EXPLODES into the <=7 future report days "
        "it contributes to (sequence + explode, codegen), then one "
        "hash aggregate counts distinct users per day — no join against "
        "the day spine except a broadcast semi-join to drop phantom "
        "days past corpus end. Shuffle shape at 100 TB: the exchange "
        "carries (day, user) pairs x 7 — bounded fan-out of an already "
        "day-deduplicated frame, with map-side partial distinct [EXT].",
)
def q90_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    d = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    spine = d.select("day").distinct()
    ex = d.selectExpr(
        "user_id", "day AS src_day",
        "explode(sequence(day, date_add(day, 6))) AS day")
    return (
        ex.join(F.broadcast(spine), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active_7d"),
             F.countDistinct(
                 F.when(F.col("src_day") == F.col("day"), F.col("user_id")))
             .cast("bigint").alias("n_active_1d"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                "n_active_7d", "n_active_1d")
    )


def _hll_bound_check(sdf) -> str | None:
    """q92's bounded-error gate (round-11, r10 VERDICT item 4; sigma
    Bonferroni-adjusted round-12 per ADVICE): each day's self-reported
    rel_err is one draw from the lgK=12 HLL error distribution
    (rsd = 1.04/sqrt(2^12) = 0.01625), and the gate checks the MAX over
    n_days draws — so the sigma multiplier must grow with n_days or a
    healthy pipeline eventually fails by multiplicity alone. We size z
    so a Gaussian-error sketch passes with P(fail) <= 0.1% overall:
    z = Phi^-1(1 - 0.001/n_days), floored at the original 3. At
    n_days=30 that is z~=4.0; at n_days=3650 (a 10-year corpus) z~=4.5
    — still a broken-pipeline detector, no longer a lottery. The exact
    column must be positive so the ratio is meaningful."""
    from statistics import NormalDist
    if len(sdf) == 0:
        return "empty result"
    if (sdf["n_active_7d_exact"] <= 0).any():
        return "non-positive exact count"
    worst = float(sdf["rel_err"].max())
    z = max(3.0, NormalDist().inv_cdf(1 - 0.001 / len(sdf)))
    bound = z * 1.04 / (1 << 12) ** 0.5
    if worst > bound:
        return (f"max rel_err {worst:.4f} > {bound:.4f} "
                f"({z:.2f}x lgK=12 rsd, Bonferroni over "
                f"{len(sdf)} days)")
    return None


@register(
    "q92_rolling_active_hll",
    oracle=None,  # Apache DataSketches HLL state isn't SQL-reproducible in
    # DuckDB — rows-only; the plan self-reports its error vs the exact
    # count (q90's semantics) per day, so the gate still certifies
    # estimator QUALITY, the q63 recall pattern
    bound_check=lambda sdf, con: _hll_bound_check(sdf),
    doc="A8 mergeable-sketch rolling actives: per-day HLL sketches "
        "(hll_sketch_agg) unioned over the trailing 7 days "
        "(hll_union_agg) — the pre-aggregation that makes rolling "
        "COUNT DISTINCT feasible at 100 TB, where q90's exact "
        "(day x user) explode-shuffle is corpus-proportional but daily "
        "sketches are KILOBYTES: history compresses to n_days x 2^lgK "
        "bytes and each new day unions 7 sketches instead of rescanning "
        "7 days of raw events. Output self-reports per-day relative "
        "error against the exact count computed in the same plan "
        "(rel_err <= ~2% at lgK=12) [EXT].",
)
def q92_rolling_active_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    daily = (ev.groupBy(F.to_date("ts").alias("day"))
             .agg(F.hll_sketch_agg("user_id").alias("sk")))
    spine = daily.select("day")
    ex = daily.selectExpr(
        "sk", "explode(sequence(day, date_add(day, 6))) AS day")
    approx = (
        ex.join(F.broadcast(spine), "day", "left_semi")
        .groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
             .cast("bigint").alias("n_active_7d_approx")))
    # exact twin (q90's plan) in the same job for the error self-report
    d = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    exact = (
        d.selectExpr("user_id", "explode(sequence(day, date_add(day, 6))) AS day")
        .join(F.broadcast(spine), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("bigint")
             .alias("n_active_7d_exact")))
    return (
        exact.join(approx, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_active_7d_exact", "n_active_7d_approx",
            F.round(
                F.abs(F.col("n_active_7d_approx")
                      - F.col("n_active_7d_exact"))
                / F.col("n_active_7d_exact"), 4).alias("rel_err"))
        .orderBy("day")
    )


@register(
    "q95_scd2_asof_enrich",
    oracle=f"""
    WITH ch AS (
        SELECT user_id, ts, event_id,
               CAST(json_extract(props, '$.k') AS INT) AS k,
               CASE WHEN lag(CAST(json_extract(props, '$.k') AS INT))
                         OVER w IS NULL
                     OR lag(CAST(json_extract(props, '$.k') AS INT))
                         OVER w <> CAST(json_extract(props, '$.k') AS INT)
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), dim AS (
        -- one row per (user_id, eff_ts): if two same-ts events both
        -- change k, the later event_id wins (matches the Spark side)
        SELECT user_id, eff_ts, k FROM (
            SELECT user_id, ts AS eff_ts, k,
                   row_number() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM ch WHERE chg = 1
        ) WHERE rn = 1
    ), buys AS (
        SELECT user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ), enriched AS (
        SELECT b.user_id, b.value,
               (SELECT d.k FROM dim d
                WHERE d.user_id = b.user_id AND d.eff_ts <= b.ts
                ORDER BY d.eff_ts DESC LIMIT 1) AS k_at_purchase
        FROM buys b
    )
    SELECT k_at_purchase,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           {dsum_sql('value')} AS total_value
    FROM enriched GROUP BY k_at_purchase
    ORDER BY k_at_purchase
    """,
    doc="J5/D9 SCD2 CONSUMPTION: enrich each purchase with the "
        "attribute version (props.k) valid at purchase time — the "
        "change-log (first/changed k per user, the q88 segmentation) "
        "becomes the as-of dimension and operators/joins.asof_join "
        "attaches the backward-nearest version; the oracle is the "
        "correlated LIMIT-1 lookup. Every purchase has a version "
        "(a user's first event opens one). Shuffle shape at 100 TB: "
        "the union-sort-window as-of plan co-partitions both sides on "
        "user_id — one exchange; ts_bucket switches to the two-pass "
        "bucketed plan when one user dominates [EXT].",
)
def q95_scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 7 (r6 VERDICT item 5): the registered plan is the FUSED
    # single-exchange form (q95_fused below) — measured at sf1: 1.10 s
    # warm vs 1.51 s for the asof_join composition (3.92x -> ~1.7x vs
    # the oracle), identical row sets at sf0.01 and the same oracle.
    # The asof_join composition is kept as q95_asof_variant: it remains
    # the general operator (any dim table, not just a same-table
    # change-log); the fusion is available exactly because THIS query's
    # dim derives from the fact stream itself.
    return q95_fused(spark, sf_dir)


def _k_fast() -> F.Column:
    """Fast integer extraction of props.k (round-8, the q02
    domain-scoped playbook): the events table's props is a FLAT JSON
    object whose k is an unquoted integer, so one codegen
    regexp_extract replaces the general-purpose JSON scanner —
    measured at sf1: 0.21 s vs 0.68 s for get_json_object over the
    full table, zero value mismatches (checked exhaustively at sf1;
    the oracle's json_extract re-checks the equivalence at every
    hash gate). NOT a general JSON substitute: nested objects or
    quoted numbers would diverge — q15 (the F12 JSON operator
    coverage query) keeps the real parser, and any schema change to
    events.props flips the q88/q95 hashes loudly."""
    return F.regexp_extract(
        "props", '"k"\\s*:\\s*(-?[0-9]+)', 1).cast("int")


def q95_asof_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The original q95 composition over operators/joins.asof_join —
    dim build (change-log window + per-ts dedupe) then union-sort-window
    as-of. Kept for the measured comparison (BASELINE.md round 7) and
    as the reference consumer of the general as-of operator."""
    from pyspark.sql import Window as W

    from etl_transparencia_sergipe_spark.operators.joins import asof_join

    ev = load(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts", "event_id", "value",
        _k_fast().alias("k"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # dedupe to one version per (user_id, eff_ts) — if two same-ts
    # events both change k, keep the later event_id (asof_join's
    # contract requires the right side unique per (key, ts); without
    # this the tie would resolve arbitrarily on both engines)
    dim = (ev.withColumn(
        "chg", F.when(F.lag("k").over(w).isNull()
                      | (F.lag("k").over(w) != F.col("k")), 1).otherwise(0))
        .filter("chg = 1")
        .withColumn("rn", F.row_number().over(
            W.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))))
        .filter("rn = 1")
        .select("user_id", F.col("ts").alias("eff_ts"), "k"))
    buys = ev.filter("event_type = 'purchase'").select(
        "user_id", "ts", "value")
    enriched = asof_join(buys, dim, on="user_id",
                         left_ts="ts", right_ts="eff_ts",
                         right_cols=["k"])
    return (enriched.groupBy(F.col("k").alias("k_at_purchase"))
            .agg(F.count("*").cast("bigint").alias("n_purchases"),
                 dsum("value").alias("total_value"))
            .orderBy("k_at_purchase"))


def q95_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused single-exchange alternative to q95 (round-6 VERDICT item 5
    prototype): instead of materializing the change-log dim and as-of
    joining the purchases back (two events scans, window shuffles on
    (user_id) AND (user_id, ts), then the as-of union's own key
    shuffle), compute the version-at-event inline — ONE events scan,
    ONE exchange on user_id shared by both window passes:

      pass 1 (sort user_id, ts, event_id): chg = k differs from lag(k)
      pass 2 (same partitioning, prefix sort user_id, ts — no re-sort):
        k_at = max(struct(ts, event_id, k)) over RANGE unbounded..current
        of change rows only — the lexicographic struct max picks the
        change with the greatest (ts, event_id) among rows with
        ts <= current ts, which is exactly the as-of backward match
        INCLUDING the same-ts-later-event_id tie rule the dim dedupe
        (rn = 1 by event_id DESC) encodes.

    Result-identical to the registered q95 (same oracle); kept/chosen
    by measurement (BASELINE.md round-7 as-of comparison).
    """
    from pyspark.sql import Window as W

    # round-8 decomposition (BENCH_TABLES_r08): of the 1.16 s warm at
    # sf1, scan+JSON was 0.66 s, the shared-exchange windows ~0.45 s,
    # the groupBy/sort tail ~0.05 s — the k-extraction was HALF the
    # query. _k_fast closes that; the window exchange is the floor
    # (midfilter and from_json variants measured, no further win).
    ev = load(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts", "event_id", "value",
        _k_fast().alias("k"))
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "chg", F.when(F.lag("k").over(wl).isNull()
                      | (F.lag("k").over(wl) != F.col("k")), 1)
        .otherwise(0))
    wr = (W.partitionBy("user_id").orderBy("ts")
          .rangeBetween(W.unboundedPreceding, W.currentRow))
    at = marked.withColumn(
        "k_at_purchase",
        F.max(F.when(F.col("chg") == 1,
                     F.struct("ts", "event_id", "k"))).over(wr)
        .getField("k"))
    return (at.filter("event_type = 'purchase'")
            .groupBy("k_at_purchase")
            .agg(F.count("*").cast("bigint").alias("n_purchases"),
                 dsum("value").alias("total_value"))
            .orderBy("k_at_purchase"))
