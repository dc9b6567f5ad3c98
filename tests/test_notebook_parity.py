"""§3.3 analytics-lifecycle parity (data_science.ipynb): CSV of pt-BR
money strings -> F6 clean/cast with coerce-to-null -> dropna on the
description key -> StandardScaler -> KMeans(k=3, seed=42) -> correlation.

Fixture is FIXTURES.md F3-shaped (cfem_detalhamento): money columns with
R$ prefixes, dot thousands, comma decimals, malformed values, and NULL
description rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.functions.money import parse_ptbr_money
from etl_transparencia_sergipe_spark.ml import (
    correlation_pairs,
    kmeans_clusters,
)

ROWS = [
    # (descricao, dotacao_inicial, valor_empenhado, valor_pago)
    ("Obra pavimentação", "R$ 1.234.567,89", "R$ 100.000,00", "R$ 90.000,00"),
    ("Manutenção escolar", "R$ 200.000,00", "R$ 150.000,50", "R$ 149.999,99"),
    (None, "R$ 999,99", "R$ 1,00", "R$ 0,50"),          # dropna target
    ("Royalties repasse", "R$ 50.000,00", "R$ 25.000,00", "R$ 25.000,00"),
    ("Sem valor", "n/d", "R$ 10,00", "R$ 5,00"),        # malformed -> NULL
    ("Saúde básica", "R$ 10.000,00", "R$ 7.500,25", "R$ 7.000,00"),
    ("Iluminação", "R$ 80.000,00", "R$ 60.000,00", "R$ 55.000,00"),
]

MONEY_COLS = ["dotacao_inicial", "valor_empenhado", "valor_pago"]


@pytest.fixture()
def cfem(spark):
    df = spark.createDataFrame(
        ROWS, "descricao string, dotacao_inicial string, "
              "valor_empenhado string, valor_pago string")
    cleaned = df.select(
        "descricao",
        *[parse_ptbr_money(c).cast("double").alias(c) for c in MONEY_COLS],
    )
    return cleaned.na.drop(subset=["descricao"])  # data_science.ipynb:58


def test_clean_cast_and_dropna(cfem):
    rows = cfem.collect()
    assert len(rows) == 6  # NULL-descricao row dropped
    by_desc = {r.descricao: r for r in rows}
    assert by_desc["Obra pavimentação"].dotacao_inicial == 1234567.89
    # malformed money -> NULL (to_numeric errors='coerce' parity)
    assert by_desc["Sem valor"].dotacao_inicial is None


def test_kmeans_full_lifecycle(cfem):
    # handleInvalid='skip' drops the malformed-money row, as the notebook's
    # feature selection implicitly does
    clustered = kmeans_clusters(cfem, MONEY_COLS, k=3, seed=42)
    rows = clustered.collect()
    assert len(rows) == 5
    assert {r.cluster for r in rows} <= {0, 1, 2}
    # deterministic: same seed, same assignment
    again = kmeans_clusters(cfem, MONEY_COLS, k=3, seed=42).collect()
    assert sorted((r.descricao, r.cluster) for r in rows) == \
        sorted((r.descricao, r.cluster) for r in again)


def test_correlation_block(cfem):
    complete = cfem.na.drop(subset=MONEY_COLS)
    out = correlation_pairs(complete, MONEY_COLS)
    by_pair = {(r.col_a, r.col_b): r.corr for r in out.collect()}
    for c in MONEY_COLS:
        assert by_pair[(c, c)] == pytest.approx(1.0)
    # empenhado and pago are near-proportional in the fixture
    assert by_pair[("valor_empenhado", "valor_pago")] > 0.99
