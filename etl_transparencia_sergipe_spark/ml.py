"""Analytics parity with the reference's data_science notebook (SURVEY.md
§3.3, A4-A6): currency cleaning -> feature scaling -> K-Means (k=3, seed
42) -> correlation — re-expressed on Spark MLlib so the whole pipeline
stays JVM/Arrow-side.

Reference: docs/notebooks/data_science.ipynb:35-58 (cleaning),
:89-96 (StandardScaler), :99-100 (KMeans k=3 random_state=42),
:126-131 (correlation heatmap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scaler_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """A4: per-column mean/std (the StandardScaler fit), computed from
    exact decimal sums so results are engine-independent.

    std is the sample standard deviation (ddof=1, sklearn's default is
    ddof=0 for StandardScaler but stddev_samp for analytics; we expose
    both).
    """
    aggs = []
    for c in cols:
        s1 = F.sum(F.col(c).cast("decimal(28,6)")).cast("double")
        s2 = F.sum((F.col(c) * F.col(c)).cast("decimal(28,6)")).cast("double")
        n = F.count(c)
        mean = (s1 / n)
        var_pop = (s2 / n) - (s1 / n) * (s1 / n)
        aggs += [
            mean.alias(f"{c}_mean"),
            F.sqrt(var_pop).alias(f"{c}_std_pop"),
        ]
    return df.agg(*aggs)


def kmeans_clusters(df: DataFrame, feature_cols: list[str], k: int = 3,
                    seed: int = 42) -> DataFrame:
    """A6: K-Means over standardized features; returns input + cluster
    label. Seeded (data_science.ipynb:99 ``random_state=42``)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features_raw",
                                handleInvalid="skip")
    scaler = StandardScaler(inputCol="features_raw", outputCol="features",
                            withMean=True, withStd=True)
    km = KMeans(k=k, seed=seed, featuresCol="features",
                predictionCol="cluster")

    assembled = assembler.transform(df)
    scaled = scaler.fit(assembled).transform(assembled)
    model = km.fit(scaled)
    return model.transform(scaled).drop("features_raw", "features")


def correlation_pairs(df: DataFrame, cols: list[str]) -> DataFrame:
    """A5: pairwise Pearson correlation matrix as (col_a, col_b, corr)
    rows — the notebook's 7-column corr heatmap shape."""
    spark = df.sparkSession
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            # try_divide: NULL (not DIVIDE_BY_ZERO under ANSI) when a
            # column is constant — F.corr itself throws in that case
            aggs.append(
                F.try_divide(
                    F.covar_samp(a, b),
                    F.stddev_samp(a) * F.stddev_samp(b),
                ).alias(f"{a}|{b}"))
    row = df.agg(*aggs).collect()[0]
    out = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            v = row[f"{a}|{b}"]
            # corr is NULL for constant columns / <2 complete rows —
            # surface as NULL, don't crash on float(None)
            out.append((a, b, float(v) if v is not None else None))
    return spark.createDataFrame(out, "col_a string, col_b string, corr double")
