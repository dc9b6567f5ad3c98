"""pt-BR CSV dialect I/O (SURVEY.md S6/S7/S8/S10).

Reference behavior:
- write: ``sep=';'``, ``utf-8-sig``, no index (aracaju_barra_pirambu_
  scraper.py:294; pacatuba_scraper.py:457; file_utils.py:57).
- read: separator sniffing (``sep=None, engine='python'``) + warn-don't-fail
  on bad lines (file_utils.py:36-42).
- failure diagnostics dumped to a side channel (aracaju_barra_pirambu_
  scraper.py:132-144) -> here a structured quarantine table.

Scale notes: the sniff reads ONE line via ``spark.read.text(...).head()``
(no full scan); PERMISSIVE mode with a corrupt-record column keeps the main
scan single-pass — bad rows are split out by a filter on the same scan, not
a re-read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def write_ptbr_csv(df: DataFrame, path: str,
                   partition_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """S6: semicolon-separated, headered CSV; hive partitioning replaces
    the reference's filename-encoded (cidade, ano, mes) layout (§1.3)."""
    w = df.write.option("sep", ";").option("header", True).mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.csv(path)


def sniff_sep(spark: SparkSession, path: str) -> str:
    """S7 separator sniffing: inspect the first line only (the pandas
    ``sep=None`` engine='python' analog, file_utils.py:36-42)."""
    head = spark.read.text(path).limit(1).collect()
    if not head:
        return ";"
    line = head[0].value
    return ";" if line.count(";") >= line.count(",") else ","


def read_ptbr_csv(spark: SparkSession, path: str, schema: str | None = None,
                  sep: str | None = None) -> DataFrame:
    """S7: read with sniffed separator; malformed rows land in
    ``_corrupt_record`` instead of failing (PERMISSIVE ≈ on_bad_lines=warn).
    """
    sep = sep or sniff_sep(spark, path)
    reader = (
        spark.read.option("sep", sep).option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", False)
    return reader.csv(path)


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """S10 dead-letter split: (good rows, quarantined corrupt rows).

    Both sides come off the same scan; at scale write the quarantine side
    to its own path (the badRecordsPath pattern) instead of re-parsing.
    """
    if CORRUPT_COL not in df.columns:
        # no corrupt-record column => nothing to quarantine; the empty
        # frame still carries the quarantine schema so callers can union
        # it with an existing quarantine table
        empty = df.limit(0).select(
            F.lit(None).cast("string").alias("raw_line"),
            F.current_timestamp().alias("quarantined_at"),
        )
        return df, empty
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line"),
        F.current_timestamp().alias("quarantined_at"),
    )
    return good, bad
