"""Write-path data layout: sort-clustered parquet for min/max skipping.

The read-path twin of corpus_pipeline.compact_parquet: at 100 TB, WHAT
order rows land in parquet decides whether a time/key-range predicate
reads one row group or the whole table. Parquet stores per-row-group
min/max statistics; a scan with a pushed predicate skips any group whose
[min, max] misses the predicate range — but only a clustered layout
makes those ranges narrow. This module writes the clustered layout and
measures (via footer statistics) the skip fraction a range predicate
gets, so the layout claim is a checked number, not an assertion.

``repartitionByRange + sortWithinPartitions`` is the Spark idiom: the
range exchange gives GLOBALLY disjoint per-file key ranges (each output
file covers one slice of the keyspace), the within-partition sort makes
every row group inside a file tight. A plain ``sort()`` would do both in
one shuffle but couples file count to shuffle parallelism; the explicit
pair keeps file sizing (scale posture: target bytes per file) separate
from sort order. Z-order/Hilbert generalize this to multi-column
predicates; for the single-range-key case (event time, ship date — the
dominant pruning predicates here) range-clustering is optimal and needs
no space-filling-curve library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sorted_write(df: DataFrame, path: str, sort_cols: list[str],
                 n_files: int = 8,
                 rows_per_group: int | None = None) -> None:
    """Write ``df`` range-clustered on ``sort_cols`` into ``n_files``
    parquet files with tight per-row-group min/max stats."""
    w = (df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
         .sortWithinPartitions(*sort_cols)
         .write.mode("overwrite"))
    if rows_per_group:
        w = w.option("parquet.block.size",
                     str(max(64 * 1024, rows_per_group * 64)))
    w.parquet(path)


def rowgroup_skip_fraction(path: str, col: str, lo, hi) -> dict:
    """Fraction of parquet row groups a [lo, hi] predicate can skip,
    from footer statistics alone (exactly what the reader's filter
    pushdown consults). Returns {n_groups, n_skippable, skip_fraction}.
    """
    import datetime
    import glob
    import os

    import pyarrow.parquet as pq

    def _naive(v):
        # TIMESTAMP_MICROS stats come back tz-aware (UTC); session values
        # are naive UTC — compare on one convention
        if isinstance(v, datetime.datetime) and v.tzinfo is not None:
            return v.replace(tzinfo=None)
        return v

    lo, hi = _naive(lo), _naive(hi)
    n_groups = 0
    n_skip = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i
               for i in range(meta.schema.names.__len__())}
        ci = idx[col]
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(ci).statistics
            n_groups += 1
            if st is not None and st.has_min_max and (
                    _naive(st.max) < lo or _naive(st.min) > hi):
                n_skip += 1
    return {"n_groups": n_groups, "n_skippable": n_skip,
            "skip_fraction": (n_skip / n_groups) if n_groups else 0.0}
