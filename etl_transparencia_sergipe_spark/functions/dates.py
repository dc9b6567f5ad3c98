"""Brazilian date handling (SURVEY.md F10/F11).

Reference dates are ``dd/MM/yyyy`` strings (``'31/01/2024'``, observed
schema SURVEY.md §1.2) with (ano, mes) partition keys as zero-padded
strings (``aracaju_barra_pirambu_scraper.py:326``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_br_date(col: Column | str) -> Column:
    """``'31/01/2024'`` -> DATE (NULL on malformed input)."""
    c = F.col(col) if isinstance(col, str) else col
    # try_to_date: NULL on malformed input (ANSI mode is on)
    return F.try_to_date(c, "dd/MM/yyyy")


def parse_br_date_sql(expr: str) -> str:
    """DuckDB twin of :func:`parse_br_date`."""
    return f"TRY_CAST(strptime({expr}, '%d/%m/%Y') AS DATE)"


def month_key(col: Column | str) -> Column:
    """Month int -> zero-padded partition key string (F8: ``f'{m:02d}'``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lpad(c.cast("string"), 2, "0")


def format_br_date(col: Column | str) -> Column:
    """DATE -> ``dd/MM/yyyy`` string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "dd/MM/yyyy")
