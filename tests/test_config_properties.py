"""Config-dispatch parity (S9) + hypothesis property tests for the
normalize/money layers (SURVEY.md §7 hard-part 1: bit-exactness of the
translate-based fold vs NFKD on generated inputs)."""

from __future__ import annotations

import os
import re
import shutil
import tempfile
import unicodedata

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_transparencia_sergipe_spark.config import JobConfig, run_job
from etl_transparencia_sergipe_spark.functions import (
    normalize_text,
    parse_ptbr_money,
    format_ptbr_money,
)

CFG_JSON = """
{
  "anos": ["2024"],
  "cidades": ["aracaju", "cidade_fantasma"],
  "meses": ["1"],
  "configuracoes_paralelismo": {"max_workers": 4}
}
"""


def test_config_parse_and_unknown_city_skip():
    cfg = JobConfig.from_json(CFG_JSON)
    assert cfg.anos == [2024] and cfg.meses == [1] and cfg.max_workers == 4
    assert cfg.resolved_cidades() == ["aracaju"]  # fantasma logged+skipped


def test_run_job_end_to_end(spark):
    out = tempfile.mkdtemp(prefix="job_")
    try:
        run_job(spark, JobConfig.from_json(CFG_JSON), out)
        back = spark.read.parquet(out)
        assert back.count() > 0
        assert {r.cidade for r in back.select("cidade").distinct().collect()} \
            == {"aracaju"}
    finally:
        shutil.rmtree(out, ignore_errors=True)


# pt-BR-ish corpus: letters incl. accents, digits, punctuation, whitespace
_PTBR_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "áàâãéêíóôõúüçÁÀÂÃÉÊÍÓÔÕÚÜÇ .,;:!?()-/R$%"
)


def _reference_normalizar(texto: str) -> str:
    t = unicodedata.normalize("NFKD", texto).encode("ASCII", "ignore").decode()
    return re.sub(r"[^a-zA-Z0-9\s]", "", t).lower()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet=_PTBR_ALPHABET, max_size=40),
                min_size=1, max_size=8))
def test_normalize_matches_nfkd_reference(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "t string")
    got = [r.n for r in df.select(normalize_text("t").alias("n")).collect()]
    assert got == [_reference_normalizar(s) for s in strings]


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.decimals(min_value="-9999999.99", max_value="9999999.99", places=2),
    min_size=1, max_size=8))
def test_money_roundtrip_property(spark, amounts):
    df = spark.createDataFrame([(float(a),) for a in amounts], "v double")
    back = [r.b for r in df.select(
        parse_ptbr_money(format_ptbr_money("v")).cast("double").alias("b")
    ).collect()]
    assert back == pytest.approx([float(a) for a in amounts])
