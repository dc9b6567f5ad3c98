"""pt-BR currency parsing/formatting (SURVEY.md F6).

Reference: ``docs/notebooks/data_science.ipynb:46-53`` — strip ``R$``,
remove ``.`` thousands separators, ``,`` -> ``.``, numeric with
coerce-to-null.

Money is DECIMAL(18,2) end-to-end (not double): at 100 TB scale, summing
doubles drifts; decimal arithmetic is exact and Spark's hash aggregate
handles decimals in Tungsten rows natively. Spark's ``cast`` returns NULL on
malformed input, which reproduces ``pd.to_numeric(errors='coerce')``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL = "decimal(18,2)"


def parse_ptbr_money(col: Column | str) -> Column:
    """``'R$ 178.530,84'`` -> DECIMAL(18,2) 178530.84 (NULL on garbage)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c, r"R\$", "")
    cleaned = F.regexp_replace(cleaned, r"\.", "")
    cleaned = F.regexp_replace(cleaned, ",", ".")
    # try_cast: NULL on garbage (ANSI mode is on; plain cast would throw) —
    # reproduces pd.to_numeric(errors='coerce'), data_science.ipynb:53
    return F.trim(cleaned).try_cast(DECIMAL)


def parse_ptbr_money_sql(expr: str) -> str:
    """DuckDB twin of :func:`parse_ptbr_money`. ``TRY_CAST`` = coerce-to-null."""
    return (
        "TRY_CAST(trim(replace(replace(replace("
        f"{expr}, 'R$', ''), '.', ''), ',', '.')) AS DECIMAL(18,2))"
    )


def format_ptbr_money(col: Column | str) -> Column:
    """DECIMAL/number -> ``'R$ 1.234,56'`` (dot thousands, comma decimals).

    ``format_number`` emits ``1,234.56``; swapping separators via a 3-way
    ``translate`` yields the pt-BR dialect. Stays in codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    en = F.format_number(c.cast(DECIMAL), 2)
    return F.concat(F.lit("R$ "), F.translate(en, ".,", ",."))


def format_ptbr_money_sql(expr: str) -> str:
    """DuckDB twin of :func:`format_ptbr_money`.

    DuckDB's ``format('{:,}')`` only thousand-groups integers, so build the
    en-US string from exact integer/cent parts of the DECIMAL(18,2), then
    swap separators like the Spark side.
    """
    d = f"CAST({expr} AS DECIMAL(18,2))"
    # sign must come from the VALUE, not from trunc(): trunc(-0.50) = 0
    # loses the minus for amounts in (-1, 0)
    sign = f"(CASE WHEN {d} < 0 THEN '-' ELSE '' END)"
    int_part = f"format('{{:,}}', CAST(trunc(abs({d})) AS BIGINT))"
    cents = f"lpad(CAST(CAST(abs({d}) * 100 AS BIGINT) % 100 AS VARCHAR), 2, '0')"
    return (f"('R$ ' || {sign} || "
            f"translate({int_part} || '.' || {cents}, '.,', ',.'))")
