"""Adversarial hot-key stress for the as-of join (round-12, r11 VERDICT
stretch item 7 — the stress_hotfp posture applied to operators/joins.py).

Builds the as-of worst case: ONE user carries ~all left-side events (the
"every event from one hot user" straggler the asof_join docstring warns
about), with a per-user right-side history to fill in. Times both plans
over the identical inputs:

  plain     — union-sort-window over PARTITION BY user_id: the hot
              user's entire history sorts and fills in ONE task; no
              partial agg, no AQE skew split (windows aren't joins).
  ts_bucket — the two-pass plan (in-bucket parallel window fills +
              tiny per-bucket carry-in summary): the hot key spreads
              across as many tasks as it has time buckets.

Both must return IDENTICAL results — asserted via a full-content
order-insensitive checksum (count, per-column sums, xor-of-row-hashes),
not an eyeball. Prints wall times and the max single-task row count of
the plain shape (the quantity that breaks at 100x corpus growth).

Usage: python tools/stress_asof.py [n_left] [hot_frac] [n_buckets]
Defaults: 4_000_000 left rows, 0.95 on the hot key, 64 day-buckets.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.operators.joins import asof_join
from etl_transparencia_sergipe_spark.session import get_spark

DAY = 86_400


def checksum(df):
    """Order-insensitive full-content checksum: row count + per-column
    decimal sums + xor-free additive hash of whole rows (BIGINT sums are
    associative-commutative, so identical multisets of rows give
    identical sums regardless of partitioning/order)."""
    cols = df.columns
    return df.select(
        F.count("*").alias("n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("rowhash_sum"),
        *[F.sum(F.col(c).cast("decimal(28,6)")).alias(f"sum_{c}")
          for c in cols if c != "payload"],
    ).collect()[0].asDict()


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.95
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_users = 1000
    spark = get_spark("stress-asof")

    # left: n_left events over n_buckets days; hot_frac of them on user 0,
    # the rest spread over n_users. ts deterministic in id.
    span = n_buckets * DAY
    left = (spark.range(n_left).selectExpr(
        "id AS event_id",
        f"CASE WHEN id % 100 < {int(hot_frac * 100)} THEN 0 "
        f"ELSE 1 + id % {n_users - 1} END AS user_id",
        f"CAST((id * 2654435761) % {span} AS BIGINT) AS ts",
    ).persist())

    # right: 100 price updates per user at regular intervals (plus a
    # pre-history row so every left row has a match)
    right = (spark.range(n_users * 100).selectExpr(
        f"id % {n_users} AS user_id",
        f"CAST((id DIV {n_users}) * {span} DIV 100 AS BIGINT) AS rts",
        "CAST((id * 37) % 10000 AS DOUBLE) / 100.0 AS price",
    ).persist())
    left.count(), right.count()  # materialize; both plans read the cache

    # plain shape: hot key's whole history -> one window task
    t0 = time.time()
    plain = asof_join(left, right, on="user_id", left_ts="ts",
                      right_ts="rts", right_cols=["price"],
                      ts_bucket=None)  # round 13: 'auto' would bucket a
    # non-file source — force the plain shape this stress exists to time
    plain_sum = checksum(plain)
    t_plain = time.time() - t0

    # bucketed shape: in-bucket fills parallel per (user, day)
    t0 = time.time()
    bucketed = asof_join(left, right, on="user_id", left_ts="ts",
                         right_ts="rts", right_cols=["price"],
                         ts_bucket=f"_ts div {DAY}")
    bucketed_sum = checksum(bucketed)
    t_bucket = time.time() - t0

    assert plain_sum == bucketed_sum, (
        f"RESULTS DIFFER:\n plain   {plain_sum}\n bucket  {bucketed_sum}")

    hot_rows = n_left * hot_frac + 100  # left events + right history
    print(f"n_left={n_left} hot_frac={hot_frac} n_buckets={n_buckets}")
    print(f"hot-key single-task rows (plain): ~{int(hot_rows)}")
    print(f"plain    (one-task hot window): {t_plain:.1f}s")
    print(f"ts_bucket (two-pass, {n_buckets} buckets): {t_bucket:.1f}s")
    print(f"speedup: {t_plain / t_bucket:.2f}x | results identical: True")


if __name__ == "__main__":
    main()
