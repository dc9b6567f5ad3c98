"""PySpark-native analytics engine with the query/data-processing surface of
``jeanclaudio13/etl-transparencia-sergipe`` (see SURVEY.md), re-expressed as
idiomatic Spark DataFrame/SQL, plus LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) designed for 100 TB
scale.

Layout:
    session.py    SparkSession factory (AQE on, UTC, sane shuffle partitions)
    functions/    column-expression builders (normalize, money, dates, text)
    sources/      readers/writers (pt-BR CSV dialect, catalog, quarantine)
    operators/    composite operators (dedup, similarity, consolidate, joins)
    plans/        named query builders + DuckDB oracle SQL (driver contract)
    streaming/    Structured Streaming surface over the events table
"""

from etl_transparencia_sergipe_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
