"""Consolidation (U1): schema-merging union of shard DataFrames.

Parity with the reference's yearly CSV consolidation
(``src/common/file_utils.py:22-57``): pandas ``concat`` aligns differing
column sets and NaN-fills — here ``unionByName(allowMissingColumns=True)``.
At scale the physical equivalent is a multi-path partitioned read (no
per-shard plan nodes); this helper exists for heterogeneous-schema shards.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def consolidate(shards: list[DataFrame]) -> DataFrame:
    """Union shards by column name, adding NULLs for missing columns."""
    if not shards:
        raise ValueError("no shards to consolidate")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), shards
    )
