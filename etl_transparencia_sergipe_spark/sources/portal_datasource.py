"""Custom Python Data Source for the paginated transparency portal
(SURVEY.md §4 'custom DSv2 paginated-http source with filter pushdown',
S1/S4 as a first-class source).

``spark.read.format("transparencia_portal")`` exposes the portal as a
proper table: one input partition per (cidade, ano, mes) task — the
reference's thread-grid (aracaju_barra_pirambu_scraper.py:328-344) becomes
Spark's partition planning — and equality filters on the partition
dimensions are PUSHED INTO PLANNING: ``WHERE ano = 2024 AND cidade =
'aracaju'`` prunes the task grid before any fetch happens, the engine
analog of the reference composing year/month into the request URL
(pacatuba_scraper.py:332-335).

The fetch per partition is the deterministic synthetic generator (no live
HTTP in this environment); a real fetcher replaces ``_fetch_rows`` only.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

PORTAL_SCHEMA = (
    "cidade string, ano int, mes int, "
    "orgao string, unidade string, data string, empenho string, "
    "processo string, credor string, cpf_cnpj string, pago string, "
    "retido string, anulacao string, acao string, funcao string, "
    "fonte_de_recurso string, historico_pagamento string"
)

_COLS = [c.split()[0] for c in PORTAL_SCHEMA.split(", ")]


class TaskPartition(InputPartition):
    def __init__(self, cidade: str, ano: int, mes: int):
        self.cidade, self.ano, self.mes = cidade, ano, mes


class PortalReader(DataSourceReader):
    def __init__(self, options: dict):
        self.cidades = options.get("cidades", "aracaju").split(",")
        self.anos = [int(a) for a in options.get("anos", "2024").split(",")]
        self.meses = [int(m) for m in options.get(
            "meses", ",".join(map(str, range(1, 13)))).split(",")]
        # LIMIT cannot be pushed through the Python DSv2 API (see
        # pushFilters docstring), so expose the per-partition bound a
        # pushed limit would buy as an explicit reader option: a paginated
        # fetcher stops requesting pages once max_rows rows were yielded.
        self.max_rows = int(options["max_rows"]) if "max_rows" in options \
            else None
        # html_base: fetch real markup (file:// fixtures or a live portal
        # mirror) through sources/html_scraper.py instead of the synthetic
        # generator — same row schema, same partition planning
        self.html_base = options.get("html_base")

    def pushFilters(self, filters):
        """Equality, ``In``, and range filters on (cidade, ano, mes) prune
        the task grid at planning time — the reference's multi-month config
        lists (config.json:21-40) arrive as ``mes IN (...)`` and now prune
        instead of falling back to post-scan evaluation. Pruning is EXACT
        for these columns (every row in a partition shares its dimension
        values), so handled filters are consumed, not re-evaluated.
        Everything else is returned for Spark to apply post-scan.

        Limit pushdown is not expressible in the Python DSv2 API (the
        reader surface is partitions/pushFilters/read only); Spark's own
        LocalLimit stops consuming the iterator early, which for a
        paginated HTTP fetcher bounds work per partition, not partitions.
        """
        for f in filters:
            if len(getattr(f, "attribute", ())) == 1:
                col = f.attribute[0]
                if col in ("cidade", "ano", "mes") and self._narrow(col, f):
                    continue  # fully applied at planning time
            yield f  # not handled here -> Spark evaluates it post-scan

    def _narrow(self, col: str, f) -> bool:
        """Narrow the candidate list for ``col`` by filter ``f``; returns
        False when the filter shape is not handled for this column."""
        cast = str if col == "cidade" else int
        if isinstance(f, EqualTo):
            pred = lambda x, v=cast(f.value): x == v  # noqa: E731
        elif isinstance(f, In):
            vals = {cast(v) for v in f.value}
            pred = lambda x, vs=vals: x in vs  # noqa: E731
        elif col != "cidade" and isinstance(
                f, (GreaterThan, GreaterThanOrEqual,
                    LessThan, LessThanOrEqual)):
            v = cast(f.value)
            ops = {GreaterThan: lambda x: x > v,
                   GreaterThanOrEqual: lambda x: x >= v,
                   LessThan: lambda x: x < v,
                   LessThanOrEqual: lambda x: x <= v}
            pred = ops[type(f)]
        else:
            return False
        attr = {"cidade": "cidades", "ano": "anos", "mes": "meses"}[col]
        setattr(self, attr, [x for x in getattr(self, attr) if pred(x)])
        return True

    def partitions(self):
        return [
            TaskPartition(c, a, m)
            for c in self.cidades for a in self.anos for m in self.meses
        ]

    def read(self, partition: TaskPartition):
        import pandas as pd

        from etl_transparencia_sergipe_spark.sources.scraper_source import (
            synthetic_fetch,
        )

        tasks = pd.DataFrame({
            "cidade": [partition.cidade],
            "ano": [partition.ano],
            "mes": [partition.mes],
        })
        if self.html_base:
            from etl_transparencia_sergipe_spark.sources.html_scraper \
                import html_fetch
            rows = html_fetch(self.html_base)(tasks)
        else:
            rows = synthetic_fetch(tasks)
        if self.max_rows is not None:
            # a real fetcher would stop paginating here instead of slicing
            rows = rows.head(self.max_rows)
        for row in rows.itertuples(index=False):
            d = row._asdict()
            yield tuple(d[c] for c in _COLS)


class PortalStreamReader(SimpleDataSourceStreamReader):
    """Streaming portal source: ONE (ano, mes) per micro-batch, in month
    order — the reference's incremental month-at-a-time acquisition
    (aracaju_barra_pirambu_scraper.py:317-351) as a true streaming source.
    The offset is the month cursor, so restarts resume exactly where the
    checkpoint left off (the 'already-scraped month' skip, D4/J4)."""

    def __init__(self, options: dict):
        self.cidades = options.get("cidades", "aracaju").split(",")
        self.anos = [int(a) for a in options.get("anos", "2024").split(",")]
        meses = [int(m) for m in options.get(
            "meses", ",".join(map(str, range(1, 13)))).split(",")]
        self.months = [(a, m) for a in sorted(self.anos)
                       for m in sorted(meses)]

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict):
        idx = start["idx"]
        if idx >= len(self.months):
            return iter([]), start
        rows = self._rows_for(idx)
        return iter(rows), {"idx": idx + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        out = []
        for idx in range(start["idx"], end["idx"]):
            out.extend(self._rows_for(idx))
        return iter(out)

    def _rows_for(self, idx: int):
        import pandas as pd

        from etl_transparencia_sergipe_spark.sources.scraper_source import (
            synthetic_fetch,
        )

        ano, mes = self.months[idx]
        tasks = pd.DataFrame({
            "cidade": self.cidades,
            "ano": [ano] * len(self.cidades),
            "mes": [mes] * len(self.cidades),
        })
        fetched = synthetic_fetch(tasks)
        return [tuple(r._asdict()[c] for c in _COLS)
                for r in fetched.itertuples(index=False)]


class PortalDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "transparencia_portal"

    def schema(self) -> str:
        return PORTAL_SCHEMA

    def reader(self, schema) -> PortalReader:
        return PortalReader(self.options)

    def simpleStreamReader(self, schema) -> PortalStreamReader:
        return PortalStreamReader(self.options)


def register(spark) -> None:
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PortalDataSource)
