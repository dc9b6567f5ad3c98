"""Persist-lifetime policy for multi-branch plan intermediates.

Several operators persist an intermediate frame because it feeds two or
more branches of the same plan (both sides of an LSH band self-join, a
centroid frame probed per query row, ...). Those frames CANNOT be
unpersisted inside the query builder: builders return a lazy DataFrame,
and the persisted subtree must stay cached until the *caller*
materializes the result.

Policy (single place, referenced by every call site):

- Query builders persist via :func:`persist_scoped` only — never call
  ``DataFrame.persist`` directly in plan code.
- Lifetime is bounded by the HARNESS, not the builder: every long-lived
  runner (``tools/check_correctness.py:81``, ``bench.py``) calls
  ``spark.catalog.clearCache()`` after materializing each query, so
  cached intermediates never accumulate across queries.
- Ad-hoc callers holding a session open across many registry runs should
  do the same, or call :func:`release_all`.

The default level is MEMORY_AND_DISK: at 100 TB an intermediate that
outgrows executor memory must spill, not OOM — and production pipelines
would write these frames (e.g. the q81 signature store) rather than
cache them at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel


def persist_scoped(df: DataFrame,
                   level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
                   ) -> DataFrame:
    """Persist a multi-branch plan intermediate under the module policy.

    See the module docstring: the frame stays cached until the harness
    materializes the query and clears the session cache.
    """
    return df.persist(level)


def release_all(spark: SparkSession) -> None:
    """Drop every cached frame in the session (harness-level bound)."""
    spark.catalog.clearCache()
