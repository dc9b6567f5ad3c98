"""Shared builders for engine/oracle determinism.

Cross-engine float rule: never hash a sum of raw doubles — addition order
differs between Spark's partial aggregates and DuckDB. All sums go through
exact DECIMAL intermediates (identical in any order), and ratios divide the
exact parts in DOUBLE at the end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.sources.catalog import load_table

load = load_table  # short alias used by query builders


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal sum of a numeric column, surfaced as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def davg(col: Column | str, scale: int = 2) -> Column:
    """Exact-sum / count in DOUBLE (bit-identical across engines)."""
    c = F.col(col) if isinstance(col, str) else col
    exact = F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
    return exact / F.count(c)


def davg_sql(expr: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )


def revenue_col() -> Column:
    """l_extendedprice * (1 - l_discount) as an exact decimal(18,6) term."""
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")


REVENUE_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"
