"""Named-query registry — the driver contract's backbone.

Every operator from SURVEY.md §2 lands here as a ``QueryDef``: a Spark
builder ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent DuckDB oracle SQL. The driver compares row count + schema +
order-insensitive value hash at sf0.01.

Determinism rules (so engine and oracle hash-match bit-for-bit):
- Money/aggregate arithmetic goes through exact DECIMAL intermediates; any
  ratio is computed in DOUBLE from the exact parts. Never sum raw doubles —
  float addition order differs across engines.
- Every computed column is aliased identically on both sides.
- top-k/limit queries carry a full deterministic tie-break ordering.
- Timestamps are truncated/bucketed to DATE or integer parts in outputs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a builder to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {n: q.build for n, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {n: q.oracle for n, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (import side effect)."""
    global _LOADED
    if _LOADED:
        return
    from etl_transparencia_sergipe_spark.plans import (  # noqa: F401
        relational,
        relational2,
        textops,
        dedup_queries,
        similarity_queries,
        streaming_queries,
        ml_queries,
    )

    _LOADED = True
