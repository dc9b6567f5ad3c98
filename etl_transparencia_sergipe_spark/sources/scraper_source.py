"""Paginated-fetch fan-out source (SURVEY.md S1-S4, D1-D5).

The reference fans a (cidade, ano, mes) task grid across a thread pool of
Selenium browsers (aracaju_barra_pirambu_scraper.py:328-344) with bounded
retry + linear backoff (:97-147) and a two-pass failed-row retry
(:236-252). Spark-first re-expression:

- the task grid is a tiny DataFrame (crossJoin of dimension literals);
- ``repartition(n)`` spreads tasks across executors (D1/D2 — replaces
  ``numpy.array_split`` + ThreadPoolExecutor);
- the fetch itself is a ``mapInPandas`` stage: iterator of task batches in,
  iterator of row batches out (the UDTF shape, §2.11). I/O retries live
  INSIDE the fetch fn (source logic); task/stage retries are Spark's.
- failed tasks emit an error row -> retry queue = failed keys left_anti
  re-run (D4).

There is no live HTTP in this environment, so the default fetcher is a
deterministic synthetic generator shaped like the reference's observed
output schema (FIXTURES.md F1); a real fetcher plugs in unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MASTER_COLUMNS = [
    "orgao", "unidade", "data", "empenho", "processo",
    "credor", "cpf_cnpj", "pago", "retido", "anulacao",
]
DETAIL_COLUMNS = ["acao", "funcao", "fonte_de_recurso", "historico_pagamento"]

ROW_SCHEMA = (
    "cidade string, ano int, mes int, "
    + ", ".join(f"{c} string" for c in MASTER_COLUMNS + DETAIL_COLUMNS)
    + ", fetch_error string"
)

# Mix of royalty-matching and non-matching funding sources, with accent/case
# variants (exercises P3+P4; codes from aracaju_barra_pirambu_scraper.py:36).
_FONTES = [
    "17200000 - Transferências da União Referentes a Royalties",
    "Recursos não vinculados de Impostos",
    "15300000 - ROYALTIES DO PETRÓLEO",
    "Educação básica - FUNDEB",
    "Royalties; petróleo (participação especial)",
    "15001002 - Recursos Ordinários",
]


def task_grid(spark: SparkSession, cidades: list[str], anos: list[int],
              meses: list[int] | None = None) -> DataFrame:
    """D1: the (cidade, ano, mes) cartesian task grid as a DataFrame."""
    meses = meses or list(range(1, 13))
    if not cidades or not anos or not meses:
        raise ValueError(
            f"empty task grid: cidades={cidades} anos={anos} meses={meses}")
    # single-partition dims: the grid is tiny; parallelism comes from the
    # final repartition in fetch_grid, not from scattering literals
    c = spark.createDataFrame([(x,) for x in cidades], "cidade string").coalesce(1)
    a = spark.createDataFrame([(x,) for x in anos], "ano int").coalesce(1)
    m = spark.createDataFrame([(x,) for x in meses], "mes int").coalesce(1)
    grid = c.crossJoin(a).crossJoin(m)
    n_tasks = len(cidades) * len(anos) * len(meses)
    return grid.repartition(min(n_tasks, 32))


def _det_int(*parts, mod: int) -> int:
    h = hashlib.md5("_".join(map(str, parts)).encode()).hexdigest()
    return int(h[:8], 16) % mod


def synthetic_fetch(tasks: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake of one month-page fetch (stands in for the
    Selenium page walk, aracaju_barra_pirambu_scraper.py:221-252)."""
    rows = []
    for t in tasks.itertuples(index=False):
        n_rows = 5 + _det_int(t.cidade, t.ano, t.mes, mod=10)
        for i in range(n_rows):
            cents = _det_int(t.cidade, t.ano, t.mes, i, "v", mod=10**7)
            fonte = _FONTES[_det_int(t.cidade, t.ano, t.mes, i, mod=len(_FONTES))]
            row = {
                "cidade": t.cidade, "ano": int(t.ano), "mes": int(t.mes),
                "orgao": f"{10 + i % 5} - SECRETARIA {i % 5}",
                "unidade": f"{(10 + i % 5)}101 - UNIDADE {i % 5}",
                "data": f"{min(28, 1 + i):02d}/{t.mes:02d}/{t.ano}",
                "empenho": str(100000 + _det_int(t.cidade, t.ano, t.mes, i, "e", mod=90000)),
                "processo": str(200000 + i),
                "credor": f"FORNECEDOR {chr(65 + i % 26)} LTDA",
                "cpf_cnpj": f"{i % 100:02d}.394.460/0092-{i % 100:02d}",
                "pago": f"R$ {cents // 100:,}".replace(",", ".")
                + f",{cents % 100:02d}",
                "retido": "R$ 0,00",
                "anulacao": "R$ 0,00",
                "acao": f"20{i:02d} - Ação {i}",
                "funcao": f"{i % 10:02d} - Função {i % 10}",
                "fonte_de_recurso": fonte,
                "historico_pagamento": f"Pagamento ref. processo {200000 + i} mês {t.mes:02d}",
                "fetch_error": None,
            }
            rows.append(row)
    return pd.DataFrame(rows)


def fetch_grid(grid: DataFrame,
               fetch_fn: Callable[[pd.DataFrame], pd.DataFrame] = synthetic_fetch,
               max_retries: int = 3,
               parallelism: int | None = None) -> DataFrame:
    """S1/S3 fan-out: repartition the grid, run ``fetch_fn`` per batch with
    bounded retry (D3); failures surface as rows with ``fetch_error`` set
    (feeding the D4 retry queue) instead of failing the task."""
    if parallelism:
        grid = grid.repartition(parallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for tasks in batches:
            for attempt in range(1, max_retries + 1):
                try:
                    yield fetch_fn(tasks)
                    break
                except Exception as exc:  # noqa: BLE001 — source-level retry
                    if attempt == max_retries:
                        err = tasks[["cidade", "ano", "mes"]].copy()
                        for c in MASTER_COLUMNS + DETAIL_COLUMNS:
                            err[c] = None
                        err["fetch_error"] = f"{type(exc).__name__}: {exc}"
                        yield err
                    # no sleep: Spark reschedules; backoff is for live HTTP

    return grid.mapInPandas(run, schema=ROW_SCHEMA)


def retry_queue(fetched: DataFrame, grid: DataFrame) -> DataFrame:
    """D4 two-pass reprocess: grid keys whose fetch failed or vanished —
    a left_anti join against successful keys."""
    ok = fetched.filter(F.col("fetch_error").isNull()) \
        .select("cidade", "ano", "mes").distinct()
    return grid.join(ok, ["cidade", "ano", "mes"], "left_anti")
