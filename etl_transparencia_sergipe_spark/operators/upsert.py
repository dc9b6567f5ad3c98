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
from pyspark.sql import functions as F


def upsert(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Rows from ``delta`` replace same-key rows in ``base``; new keys
    append. Schemas must match by name."""
    survivors = base.join(delta.select(*keys).distinct(), keys, "left_anti")
    return survivors.unionByName(delta)


def apply_cdc(base: DataFrame, cdc: DataFrame, keys: list[str],
              op_col: str = "op") -> DataFrame:
    """Apply a change-data-capture batch (op in I/U/D) to ``base``.

    Last-writer-wins within the batch is the CALLER's contract (pass a
    deduplicated batch — e.g. latest op per key via a window); here every
    key present in the batch REPLACES its base row (U/I) or removes it
    (D). The plan is one anti-join (survivors: base keys untouched by the
    batch) plus a union of the batch's non-delete rows — the same
    co-partitioned single-shuffle shape as ``upsert``, with deletes
    falling out for free by not unioning them. At 100 TB both sides
    partition on the key; storage-side this is the MERGE WHEN MATCHED
    DELETE flavor (cf. q73's dynamic-partition materialization).
    """
    survivors = base.join(cdc.select(*keys).distinct(), keys, "left_anti")
    applied = (cdc.filter(F.col(op_col) != "D")
               .drop(op_col))
    return survivors.unionByName(applied)
