"""Unit tests for the scalar function layer (normalize/money/dates) —
including bit-exactness of the translate-based accent fold vs the NFKD
reference semantics (SURVEY.md §7 risk 1)."""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.functions import (
    ROYALTY_TERMS,
    format_ptbr_money,
    normalize_colname,
    normalize_text,
    parse_br_date,
    parse_ptbr_money,
    term_filter,
)

# Strings mirroring the reference corpus (fonte_de_recurso values,
# FIXTURES.md F1) plus edge cases.
SAMPLES = [
    "17200000 - Transferências da União Referentes a Royalties",
    "ROYALTIES DO PETRÓLEO",
    "Recursos não vinculados de Impostos",
    "Educação básica",
    "Ação; pontuação!!! (teste)",
    "  espaços  ",
    "",
    "15300000",
    "Royalty-petróleo: R$ 1.234,56",
]


def reference_normalizar(texto: str) -> str:
    """Reference semantics: aracaju_barra_pirambu_scraper.py:39-43."""
    if not isinstance(texto, str):
        return ""
    texto = unicodedata.normalize("NFKD", texto).encode(
        "ASCII", "ignore").decode("utf-8")
    texto = re.sub(r"[^a-zA-Z0-9\s]", "", texto)
    return texto.lower()


def test_normalize_text_matches_reference_semantics(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["t"])
    got = [r.n for r in df.select(normalize_text("t").alias("n")).collect()]
    want = [reference_normalizar(s) for s in SAMPLES]
    assert got == want


def test_term_filter_matches_reference_any_contains(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["t"])
    got = [r.m for r in df.select(term_filter("t").alias("m")).collect()]
    want = [
        any(term in reference_normalizar(s) for term in ROYALTY_TERMS)
        for s in SAMPLES
    ]
    assert got == want
    assert sum(got) == 4  # 17200000+royalties, royalties petroleo, 15300000, royaltypetroleo


def test_money_parse(spark):
    vals = ["R$ 178.530,84", "R$ 0,00", "R$ 1.234.567,89", "garbage", None,
            "R$ -12,50"]
    df = spark.createDataFrame([(v,) for v in vals], ["m"])
    got = [r.d for r in df.select(
        parse_ptbr_money("m").cast("double").alias("d")).collect()]
    assert got == [178530.84, 0.0, 1234567.89, None, None, -12.50]


def test_money_format_roundtrip(spark):
    vals = [178530.84, 0.0, 1234567.89, 7482.53, 0.05]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = df.select(
        format_ptbr_money("v").alias("brl"),
        parse_ptbr_money(format_ptbr_money("v")).cast("double").alias("back"),
    ).collect()
    assert [r.brl for r in out] == [
        "R$ 178.530,84", "R$ 0,00", "R$ 1.234.567,89", "R$ 7.482,53", "R$ 0,05"]
    assert [r.back for r in out] == vals


def test_br_date_parse(spark):
    df = spark.createDataFrame([("31/01/2024",), ("26/12/2023",), ("bogus",)],
                               ["d"])
    got = [str(r.p) if r.p else None for r in
           df.select(parse_br_date("d").alias("p")).collect()]
    assert got == ["2024-01-31", "2023-12-26", None]


def test_normalize_colname():
    # detail-label -> snake_case (aracaju_barra_pirambu_scraper.py:183-189)
    assert normalize_colname("Fonte de Recurso") == "fonte_de_recurso"
    assert normalize_colname("Natureza Despesa:") == "natureza_despesa"
    assert normalize_colname("Modalidade  Aplicação") == "modalidade_aplicacao"
    # NFKD decomposes 'º' to 'o' — matches the observed column name 'no_doc'
    # (OSR_aracaju_barra__pirambu.ipynb cell-32 output)
    assert normalize_colname("Nº Doc") == "no_doc"


def test_sentences_builtin_vs_regex_twin(spark):
    """F16 sentence segmentation: Spark's locale-aware sentences() and the
    oracle-able regex twin (q59) agree on plain punctuated prose — the
    regex variant exists because BreakIterator has no DuckDB oracle."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("One sentence. Two sentences! Three now? Yes.",),
         ("no terminal punctuation at all",)], ["text"])
    out = df.select(
        F.size(F.sentences("text")).alias("n_builtin"),
        F.expr(r"size(filter(split(text, '[.!?]+\\s*'), "
               "x -> length(trim(x)) > 0))").alias("n_regex"),
    ).collect()
    assert [(r.n_builtin, r.n_regex) for r in out] == [(4, 4), (1, 1)]


def test_term_filter_arrow_equivalent_to_expression_path(spark):
    """term_filter_arrow (the Arrow-vectorized q02 fast path) must agree
    with term_filter(normalize_text(...)) — including punctuation-
    spanning matches ("Royalty-petróleo" -> "royaltypetroleo" contains
    "petroleo" only after the strip), accents, non-ASCII letters outside
    the pt-BR map (deleted, like the Java char class), \x0b/\f
    whitespace, empty strings and nulls (-> false)."""
    from etl_transparencia_sergipe_spark.functions.normalize import (
        term_filter_arrow,
    )

    tricky = SAMPLES + [
        "pet" + "\u00df" + "roleo",   # eszett between chars: deleted -> match
        "s-t.r,e;a:m",                # pure punct-spanning "stream"? no: terms differ
        "ro!y@a#l$t%y",               # punct-spanning "royalty"
        "vector\x0bspace",            # Java \s keeps \x0b as separator
        "PETR\u00d3LEO",              # upper accented
        "\u4e2d\u6587 royalty \u4e2d\u6587",  # CJK deleted around a hit
        None,
    ]
    df = spark.createDataFrame([(s,) for s in tricky], "t string")
    expr = [r.m for r in df.select(
        term_filter("t").alias("m")).fillna(False, ["m"]).collect()]
    arrow = [r.m for r in df.select(
        term_filter_arrow("t").alias("m")).collect()]
    assert arrow == expr
