"""Deduplication queries (P9/P10, J6) — filled in as operators land."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.plans._helpers import load
from etl_transparencia_sergipe_spark.plans.registry import register


@register(
    "q30_exact_dedup",
    oracle="""
    SELECT lang, COUNT(*) AS n_unique_texts
    FROM (SELECT DISTINCT lang, text FROM documents)
    GROUP BY lang
    """,
    doc="P9 exact dedup (hash-groupBy distinct) on document text",
)
def q30_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return (
        docs.select("lang", "text").dropDuplicates(["lang", "text"])
        .groupBy("lang").agg(F.count("*").alias("n_unique_texts"))
    )
