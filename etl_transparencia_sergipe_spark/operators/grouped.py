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


def group_profile(df: DataFrame, key: str, value_col: str) -> DataFrame:
    """Per-group profile: count, mean, sample std (ddof=1), median, IQR —
    the pandas ``describe``-style block Spark lacks as one built-in."""

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
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
