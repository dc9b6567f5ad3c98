"""Column-expression builders (JVM-side, codegen-friendly — no Python UDFs
on the hot path). Each helper has a DuckDB-SQL twin used by the driver's
oracle so engine and oracle share one definition."""

from etl_transparencia_sergipe_spark.functions.normalize import (
    ROYALTY_TERMS,
    PACATUBA_TERMS,
    normalize_text,
    normalize_text_sql,
    term_filter,
    term_filter_sql,
    normalize_colname,
)
from etl_transparencia_sergipe_spark.functions.money import (
    parse_ptbr_money,
    parse_ptbr_money_sql,
    format_ptbr_money,
    format_ptbr_money_sql,
)
from etl_transparencia_sergipe_spark.functions.dates import (
    parse_br_date,
    parse_br_date_sql,
)

__all__ = [
    "ROYALTY_TERMS",
    "PACATUBA_TERMS",
    "normalize_text",
    "normalize_text_sql",
    "term_filter",
    "term_filter_sql",
    "normalize_colname",
    "parse_ptbr_money",
    "parse_ptbr_money_sql",
    "format_ptbr_money",
    "format_ptbr_money_sql",
    "parse_br_date",
    "parse_br_date_sql",
]
