"""Config-driven job dispatch (SURVEY.md S9, §3.1 steps 3-4).

The reference drives everything from ``config.json`` — cities, years,
months, worker count — and dispatches city -> scraper module via a registry
dict (``main.py:13-16,38-60``; ``config.json:21-40``). Here the config
document maps onto pipeline parameters; unknown cities log-and-skip rather
than raise, matching ``main.py:61-64``.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field

log = logging.getLogger(__name__)

# city key -> fetcher name (the SCRAPER_MODULES registry, main.py:13-16)
KNOWN_CIDADES = {
    "aracaju": "serigy",
    "barra_dos_coqueiros": "serigy",
    "pirambu": "serigy",
    "pacatuba": "pacatuba",
}


@dataclass
class JobConfig:
    cidades: list[str] = field(default_factory=lambda: ["aracaju"])
    anos: list[int] = field(default_factory=lambda: [2024])
    meses: list[int] | None = None
    max_workers: int = 2  # config.json:19-21 default

    @classmethod
    def from_json(cls, path_or_str: str) -> "JobConfig":
        if path_or_str.lstrip().startswith("{"):
            raw = json.loads(path_or_str)
        else:
            with open(path_or_str, encoding="utf-8") as f:
                raw = json.load(f)
        par = raw.get("configuracoes_paralelismo", {})
        return cls(
            cidades=raw.get("cidades", ["aracaju"]),
            anos=[int(a) for a in raw.get("anos", [2024])],
            meses=[int(m) for m in raw["meses"]] if raw.get("meses") else None,
            max_workers=int(par.get("max_workers", 2)),
        )

    def resolved_cidades(self) -> list[str]:
        """Filter to known cities, logging unknowns (main.py:61-64)."""
        ok = []
        for c in self.cidades:
            if c in KNOWN_CIDADES:
                ok.append(c)
            else:
                log.error("cidade desconhecida ignorada: %s", c)
        return ok


def run_job(spark, cfg: JobConfig, out_path: str, fetch_fn=None) -> None:
    """config -> pipeline -> partitioned write (the main.py lifecycle)."""
    from etl_transparencia_sergipe_spark.pipelines import (
        royalties_pipeline,
        write_partitioned,
    )
    from etl_transparencia_sergipe_spark.sources.scraper_source import (
        synthetic_fetch,
    )

    cidades = cfg.resolved_cidades()
    if not cidades:
        # reference behavior: unknown cities are logged and skipped, the
        # run completes without output (main.py:61-64)
        log.error("nenhuma cidade conhecida na config; nada a fazer")
        return
    df = royalties_pipeline(
        spark, cidades, cfg.anos, cfg.meses,
        fetch_fn=fetch_fn or synthetic_fetch)
    write_partitioned(df, out_path)
