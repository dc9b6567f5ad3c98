"""Declarative data-quality audit (Deequ-style constraint suite).

The reference pipeline trusts its scraped tables implicitly; a 100 TB
ingest cannot — every production run needs a constraint report before
data is published (cf. the reference's failed-row quarantine,
``sources/csv_ptbr.py``, which is the row-level sibling of these
table-level checks). Each check builds a 1-row DataFrame
``(table_name, check_name, n_rows, n_violations)``; ``audit`` unions a
suite into one report frame.

Scale posture: every check is a single aggregate over one scan (unique =
count vs distinct-count, range/not-null = conditional count) or one
EXISTS-style anti-join (fk) — all map-side-combinable, shuffling only
1-row partial aggregates or the join keys. The union is a no-shuffle
concat of 1-row frames. No check ever collects, sorts, or widens the
input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEMA_COLS = ("table_name", "check_name", "n_rows", "n_violations")


def _wrap(df_agg: DataFrame, table: str, check: str) -> DataFrame:
    return df_agg.select(
        F.lit(table).alias("table_name"),
        F.lit(check).alias("check_name"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
    )


def check_unique(df: DataFrame, table: str, cols: list[str]) -> DataFrame:
    """Key-uniqueness: violations = rows in excess of distinct keys."""
    agg = df.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count_distinct(*[F.col(c) for c in cols]))
        .alias("n_violations"))
    return _wrap(agg, table, "unique_" + "_".join(cols))


def check_not_null(df: DataFrame, table: str, col: str) -> DataFrame:
    agg = df.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
        .alias("n_violations"))
    return _wrap(agg, table, f"not_null_{col}")


def check_predicate(df: DataFrame, table: str, name: str,
                    pred: Column | str) -> DataFrame:
    """Row predicate: violations = rows where pred is false OR null."""
    p = F.expr(pred) if isinstance(pred, str) else pred
    agg = df.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(p, 0).otherwise(1)).alias("n_violations"))
    return _wrap(agg, table, name)


def check_fk(child: DataFrame, table: str, key: str,
             parent: DataFrame, parent_key: str) -> DataFrame:
    """Referential integrity: child keys with no parent (EXISTS semantics).

    ONE scan of the child: left-join against the DISTINCT parent keys
    and count rows + unmatched rows in the same aggregate. The distinct
    makes left-join-null-count equal anti-join count (duplicate parent
    keys can never double-count child rows), and at 100 TB it halves
    the passes over the giant child table vs a separate count + anti-
    join; the deduped key column broadcasts when small.
    """
    pk = (parent.select(F.col(parent_key).alias(key)).distinct()
          .withColumn("_hit", F.lit(1)))
    agg = (child.select(F.col(key))
           .join(pk, key, "left")
           .agg(F.count("*").alias("n_rows"),
                F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
                .alias("n_violations")))
    return _wrap(agg, table, f"fk_{key}")


def audit(checks: list[DataFrame]) -> DataFrame:
    """Union a check suite into one report, ordered for stable output."""
    if not checks:
        raise ValueError("audit: empty check suite")
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("table_name", "check_name")
