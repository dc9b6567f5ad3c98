"""Upsert / MERGE-INTO emulation (D9 generalized).

The reference's idempotent month overwrite (re-scrape a month, overwrite
its CSV — file_utils.py:57, write.mode dynamic-overwrite in pipelines.py)
is partition-level upsert. Row-level MERGE needs Delta/Iceberg; without
those jars the standard emulation is: keep old rows that have no match in
the delta (left_anti), union the delta — one shuffle on the key, same
shape AQE handles at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Rows from ``delta`` replace same-key rows in ``base``; new keys
    append. Schemas must match by name."""
    survivors = base.join(delta.select(*keys).distinct(), keys, "left_anti")
    return survivors.unionByName(delta)
