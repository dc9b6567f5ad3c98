"""Text-analysis queries over the documents table (LLM-pipeline [EXT] ops,
SURVEY.md §2.8 F16): token counting, quality scoring, fingerprinting,
language scoring. All built-in column expressions — no Python in the row
loop — so they run inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.plans._helpers import dsum_sql, dsum, load
from etl_transparencia_sergipe_spark.plans.registry import register


def token_count(col) -> F.Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


TOKEN_COUNT_SQL = (
    "CASE WHEN length(trim({c})) = 0 THEN 0 "
    "ELSE len(string_split_regex(trim({c}), '\\s+')) END"
)


@register(
    "q20_token_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           {dsum_sql(TOKEN_COUNT_SQL.format(c='text'), 0)} AS total_tokens,
           MIN({TOKEN_COUNT_SQL.format(c='text')}) AS min_tokens,
           MAX({TOKEN_COUNT_SQL.format(c='text')}) AS max_tokens
    FROM documents GROUP BY lang
    """,
    doc="token counting (whitespace tokenizer) per language [EXT F16]",
)
def q20_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    toks = token_count("text")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        dsum(toks, 0).alias("total_tokens"),
        F.min(toks).alias("min_tokens"),
        F.max(toks).alias("max_tokens"),
    )
