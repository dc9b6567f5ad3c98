"""Grouped-map analytics via ``applyInPandas`` (§2.11: the reference's
per-cluster statistics shape, data_science.ipynb cluster profiling).

Use ONLY when the per-group computation genuinely needs pandas (model
scoring, scipy stats); plain aggregates belong in ``groupBy().agg``.
Groups arrive as whole pandas frames — the operator assumes a group fits
in executor memory, so key cardinality/size must be bounded (salt or
pre-aggregate if a group can be huge).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# applyInPandas materializes one whole group per task: cap it so a skewed
# key fails loudly instead of OOMing an executor. 5M rows of one double
# column is ~40 MB of Arrow payload — comfortably inside a task's share.
DEFAULT_MAX_GROUP_ROWS = 5_000_000


def group_profile(df: DataFrame, key: str, value_col: str,
                  max_group_rows: int = DEFAULT_MAX_GROUP_ROWS) -> DataFrame:
    """Per-group profile: count, mean, sample std (ddof=1), median, IQR —
    the pandas ``describe``-style block Spark lacks as one built-in.

    Groups arrive as whole pandas frames, so a group larger than
    ``max_group_rows`` raises ValueError (inside the task, surfaced by the
    job) rather than silently exhausting executor memory. For unbounded
    group sizes use :func:`group_profile_builtin` — same output from
    codegen aggregates, no per-group materialization."""

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_group_rows:
            raise ValueError(
                f"group_profile: group {pdf[key].iloc[0]!r} has "
                f"{len(pdf)} rows > max_group_rows={max_group_rows}; "
                "use group_profile_builtin for unbounded groups")
        v = pdf[value_col]
        q1, med, q3 = v.quantile([0.25, 0.5, 0.75])
        return pd.DataFrame({
            key: [pdf[key].iloc[0]],
            "n": [len(v)],
            "mean": [v.mean()],
            "std": [v.std(ddof=1)],
            "median": [med],
            "iqr": [q3 - q1],
        })

    key_type = dict(df.dtypes)[key]  # keep the key's real type
    out_schema = f"{key} {key_type}, n bigint, mean double, std double, " \
                 "median double, iqr double"
    return df.groupBy(key).applyInPandas(profile, schema=out_schema)


def group_profile_builtin(df: DataFrame, key: str,
                          value_col: str) -> DataFrame:
    """Scale-path twin of :func:`group_profile`: identical columns from
    built-in aggregates (``percentile`` is linear-interpolated like
    pandas' default), so it streams through partial aggregation with no
    per-group memory bound."""
    v = F.col(value_col).cast("double")
    return df.groupBy(key).agg(
        F.count(v).alias("n"),
        F.avg(v).alias("mean"),
        F.stddev_samp(v).alias("std"),
        F.percentile(v, 0.5).alias("median"),
        (F.percentile(v, 0.75) - F.percentile(v, 0.25)).alias("iqr"),
    )
