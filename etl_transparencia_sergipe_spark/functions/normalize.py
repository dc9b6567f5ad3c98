"""Text normalization + multi-term predicate compiler.

Reference semantics (SURVEY.md P3/P4):
- ``normalizar``: NFKD accent fold -> drop punctuation -> lowercase
  (reference ``src/scrapers/aracaju_barra_pirambu_scraper.py:37-43``).
- THE core filter: keep a row iff the normalized funding-source column
  contains ANY term from a royalty term/code list
  (``aracaju_barra_pirambu_scraper.py:36,194``; ``pacatuba_scraper.py:32,294``).

Spark-first design: both are pure built-in column expressions
(``translate``/``lower``/``regexp_replace``/``rlike``) so they stay inside
whole-stage codegen and, when applied to a source column, let Catalyst push
work into the scan. The OR-of-contains list compiles to ONE ``rlike``
alternation, evaluated once per row — at 100 TB this is a single codegen'd
regex per row, not N ``contains`` passes.

Accent folding uses an explicit ``translate`` map (pt-BR accents are a small
closed set) instead of a per-row Python ``unicodedata`` UDF; a vectorized
pandas-UDF NFKD fallback exists for bit-exactness on exotic codepoints
(``nfkd_fold_udf``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Royalty-source match terms — aracaju_barra_pirambu_scraper.py:36 (9 terms)
ROYALTY_TERMS: tuple[str, ...] = (
    "royalty", "royalties", "petroleo",
    "15300000", "15400000", "17050000", "17200000", "17210000", "0120000",
)
# pacatuba_scraper.py:32 (3 terms)
PACATUBA_TERMS: tuple[str, ...] = ("royaltie", "royalty", "petroleo")

# Closed pt-BR accent set (both cases) — equivalent to
# unicodedata.normalize('NFKD', t).encode('ASCII','ignore') on pt-BR text.
_ACCENTS_FROM = "áàâãäéèêëíìîïóòôõöúùûüçñýÁÀÂÃÄÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇÑÝ"
_ACCENTS_TO = "aaaaaeeeeiiiiooooouuuucnyAAAAAEEEEIIIIOOOOOUUUUCNY"

_PUNCT_RE = r"[^a-zA-Z0-9\s]"


def normalize_text(col: Column | str) -> Column:
    """Accent-fold -> strip punctuation -> lowercase (reference ``normalizar``)."""
    c = F.col(col) if isinstance(col, str) else col
    folded = F.translate(c, _ACCENTS_FROM, _ACCENTS_TO)
    stripped = F.regexp_replace(folded, _PUNCT_RE, "")
    return F.lower(stripped)


def normalize_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`normalize_text` (note the 'g' regex flag —
    DuckDB replaces only the first match by default, Spark replaces all)."""
    return (
        f"lower(regexp_replace(translate({expr}, "
        f"'{_ACCENTS_FROM}', '{_ACCENTS_TO}'), '{_PUNCT_RE}', '', 'g'))"
    )


def term_filter(col: Column | str, terms: tuple[str, ...] = ROYALTY_TERMS,
                pre_normalized: bool = False) -> Column:
    """OR-of-contains over a term list (P4). Matches
    ``any(termo in normalizar(v) for termo in TERMOS)``.

    Compiled as a chain of ``contains`` (substring scans, whole-stage
    codegen) rather than one ``rlike`` alternation: Java regex evaluation
    is ~10x slower than memcmp-style contains for plain literals, and the
    normalized column is computed once and shared across all terms.
    """
    c = F.col(col) if isinstance(col, str) else col
    if not pre_normalized:
        c = normalize_text(c)
    pred = c.contains(terms[0])
    for t in terms[1:]:
        pred = pred | c.contains(t)
    return pred


def term_filter_sql(expr: str, terms: tuple[str, ...] = ROYALTY_TERMS,
                    pre_normalized: bool = False) -> str:
    """DuckDB twin of :func:`term_filter`."""
    inner = expr if pre_normalized else normalize_text_sql(expr)
    pattern = "|".join(re.escape(t) for t in terms)
    return f"regexp_matches({inner}, '{pattern}')"


def normalize_colname(name: str) -> str:
    """Detail-table label -> snake_case column name (P2; reference
    ``aracaju_barra_pirambu_scraper.py:183-189``): normalizar + spaces->_ ."""
    import unicodedata

    folded = unicodedata.normalize("NFKD", name).encode("ASCII", "ignore").decode()
    cleaned = re.sub(r"[^a-zA-Z0-9\s]", "", folded).lower().strip()
    return re.sub(r"\s+", "_", cleaned)


def normalized_columns(df, mapping: dict[str, str] | None = None):
    """Rename every column via :func:`normalize_colname` (dynamic projection
    P2). ``mapping`` overrides individual names."""
    new_names = [(mapping or {}).get(c, normalize_colname(c)) for c in df.columns]
    return df.toDF(*new_names)


def nfkd_fold_udf():
    """Bit-exact NFKD fallback as an Arrow-vectorized pandas UDF — only for
    text outside the pt-BR closed set; the hot path stays on ``translate``."""
    import pandas as pd
    import unicodedata

    @F.pandas_udf("string")
    def _fold(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize("NFKD", t)
            .encode("ASCII", "ignore").decode()
            if t is not None else None
        )

    return _fold
