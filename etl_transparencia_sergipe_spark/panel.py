"""Interactive control panel (reference surface: interface.py:40-209).

The reference ships a Streamlit page that (1) edits the job config with
widgets, (2) launches the scraper as a subprocess, (3) scrapes its OWN
log output to render a progress bar + ETA, and (4) tabulates results.
Spark-first translation, three layers that share one engine path:

- :func:`run_with_progress` — runs the config-driven job on THIS
  SparkSession (no subprocess: the session owns the cluster connection)
  and reports live progress from ``statusTracker()`` — Spark's task
  accounting, the engine-native replacement for log scraping — plus an
  exact row count from ``df.observe`` riding the write pass itself.
- :func:`main` — terminal front-end: renders the progress bar + ETA on
  stderr and the per-(cidade, ano, mes) result table on stdout.
    python -m etl_transparencia_sergipe_spark.panel \
        --config config.json --out /tmp/processed
- :func:`streamlit_app` — the widget layer (multiselects, worker
  slider, run button, ``st.progress``, ``st.dataframe``), importable
  only where streamlit exists; this container ships without it, so the
  module never imports streamlit at top level and the CLI/API layers
  stay fully testable.
"""

from __future__ import annotations

import sys
import threading
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.config import JobConfig
from etl_transparencia_sergipe_spark.observability import observed

# progress_cb(fraction_0_to_1, message, eta_seconds_or_None)
ProgressCb = Callable[[float, str, float | None], None]


class _TaskProgressPoller(threading.Thread):
    """Poll ``statusTracker()`` while a job runs: completed/total tasks
    across the session's active+completed stages since the poller
    started. Coarse (tasks, not rows) but engine-exact and free — the
    same numbers the Spark UI shows."""

    def __init__(self, spark: SparkSession, cb: ProgressCb,
                 interval: float = 0.2):
        super().__init__(daemon=True)
        self._sc = spark.sparkContext
        self._cb = cb
        self._interval = interval
        self._halt = threading.Event()
        self._t0 = time.time()

    def run(self) -> None:
        tracker = self._sc.statusTracker()
        # per-job last-seen (done, total): a multi-job write would make
        # the fraction jump backwards if we only summed ACTIVE jobs —
        # finished jobs drop out of getActiveJobsIds, so keep their final
        # snapshot and report cumulative progress across all jobs seen
        jobs: dict[int, tuple[int, int]] = {}
        while not self._halt.is_set():
            for jid in tracker.getActiveJobsIds():
                jinfo = tracker.getJobInfo(jid)
                if jinfo is None:
                    continue
                done = total = 0
                for sid in jinfo.stageIds:
                    sinfo = tracker.getStageInfo(sid)
                    if sinfo is None:
                        continue
                    total += sinfo.numTasks
                    done += sinfo.numCompletedTasks
                if total:
                    jobs[jid] = (done, total)
            done = sum(d for d, _ in jobs.values())
            total = sum(t for _, t in jobs.values())
            if total:
                frac = min(done / total, 0.99)
                elapsed = time.time() - self._t0
                eta = elapsed * (1 - frac) / frac if frac > 0.01 else None
                self._cb(frac, f"{done}/{total} tasks", eta)
            self._halt.wait(self._interval)

    def finish(self, success: bool = True) -> None:
        """Stop polling; only a SUCCESSFUL run reports the final 100%
        bar — on failure the last real fraction stays on screen and the
        exception surfaces to the caller."""
        self._halt.set()
        self.join(timeout=5)
        if success:
            self._cb(1.0, "done", 0.0)


def run_with_progress(spark: SparkSession, cfg: JobConfig, out_path: str,
                      progress_cb: ProgressCb, fetch_fn=None) -> DataFrame:
    """Run the config-driven job with live progress; returns the
    per-(cidade, ano, mes) summary frame read back from the output
    (rows + exact pago total per partition — interface.py's result
    table, computed from real files, not the in-flight frame)."""
    from etl_transparencia_sergipe_spark.pipelines import (
        royalties_pipeline,
        write_partitioned,
    )
    from etl_transparencia_sergipe_spark.sources.scraper_source import (
        synthetic_fetch,
    )

    cidades = cfg.resolved_cidades()
    if not cidades:
        progress_cb(1.0, "nenhuma cidade conhecida; nada a fazer", 0.0)
        return spark.createDataFrame(
            [], "cidade string, ano int, mes int, n_rows bigint, "
                "total_pago double")

    df = royalties_pipeline(spark, cidades, cfg.anos, cfg.meses,
                            fetch_fn=fetch_fn or synthetic_fetch)
    df, obs = observed(df, "panel")
    poller = _TaskProgressPoller(spark, progress_cb)
    poller.start()
    ok = False
    try:
        write_partitioned(df, out_path)
        ok = True
    finally:
        poller.finish(success=ok)
    progress_cb(1.0, f"{obs.get['n_rows']} rows written", 0.0)

    # write_partitioned uses DYNAMIC partition overwrite, so partitions
    # from earlier runs with a different grid (other cidades/anos/meses)
    # survive on disk — restrict the read-back to THIS run's grid so the
    # result table reports only the run just launched (the reference
    # panel tabulates its own run, interface.py:180-199)
    read = spark.read.parquet(out_path).filter(
        F.col("cidade").isin(cidades) & F.col("ano").isin(cfg.anos))
    if cfg.meses:
        read = read.filter(F.col("mes").isin(cfg.meses))
    return (
        read.groupBy("cidade", "ano", "mes")
        .agg(F.count("*").alias("n_rows"),
             F.sum(F.col("pago_dec").cast("decimal(18,2)")).cast("double")
             .alias("total_pago"))
        .orderBy("cidade", "ano", "mes")
    )


def _render_bar(frac: float, msg: str, eta: float | None,
                width: int = 30) -> str:
    filled = int(frac * width)
    eta_s = f" eta {eta:4.0f}s" if eta is not None else ""
    return f"\r[{'#' * filled}{'.' * (width - filled)}] " \
           f"{frac * 100:3.0f}% {msg}{eta_s}"


def main(argv: list[str] | None = None) -> int:
    import argparse

    from etl_transparencia_sergipe_spark.session import get_spark

    ap = argparse.ArgumentParser(
        description="Config-driven pipeline run with live progress "
                    "(terminal twin of the reference's Streamlit panel)")
    ap.add_argument("--config", required=True,
                    help="config.json path or inline JSON")
    ap.add_argument("--out", required=True, help="output parquet root")
    args = ap.parse_args(argv)

    cfg = JobConfig.from_json(args.config)
    spark = get_spark("panel")

    def cb(frac: float, msg: str, eta: float | None) -> None:
        sys.stderr.write(_render_bar(frac, msg, eta))
        sys.stderr.flush()

    summary = run_with_progress(spark, cfg, args.out, cb)
    sys.stderr.write("\n")
    rows = summary.collect()
    print(f"{'cidade':<20}{'ano':>6}{'mes':>5}{'rows':>8}{'pago':>16}")
    for r in rows:
        print(f"{r.cidade:<20}{r.ano:>6}{r.mes:>5}{r.n_rows:>8}"
              f"{r.total_pago:>16.2f}")
    return 0


def streamlit_app() -> None:  # pragma: no cover - needs streamlit
    """Widget layer (interface.py:40-209 parity).

    ``streamlit run`` takes a script path (not ``-m``), so launch via a
    two-line wrapper script::

        # panel_app.py
        from etl_transparencia_sergipe_spark.panel import streamlit_app
        streamlit_app()

        python -m streamlit run panel_app.py

    Raises ImportError where streamlit is not installed (this container)."""
    import streamlit as st

    from etl_transparencia_sergipe_spark.config import KNOWN_CIDADES
    from etl_transparencia_sergipe_spark.session import get_spark

    st.title("Transparência Sergipe — painel de execução")
    cidades = st.multiselect("Cidades", sorted(KNOWN_CIDADES),
                             default=["aracaju"])
    anos = st.multiselect("Anos", list(range(2018, 2027)), default=[2024])
    meses = st.multiselect("Meses", list(range(1, 13)),
                           default=list(range(1, 13)))
    max_workers = st.slider("Paralelismo (shuffle partitions)", 2, 64, 32)
    out = st.text_input("Diretório de saída", "data/processed")

    if st.button("Executar"):
        spark = get_spark("panel", extra_conf={
            "spark.sql.shuffle.partitions": str(max_workers)})
        cfg = JobConfig(cidades=cidades, anos=anos, meses=meses or None,
                        max_workers=max_workers)
        bar = st.progress(0.0)
        status = st.empty()

        def cb(frac: float, msg: str, eta: float | None) -> None:
            bar.progress(frac)
            eta_s = f" — eta {eta:.0f}s" if eta else ""
            status.text(f"{msg}{eta_s}")

        summary = run_with_progress(spark, cfg, out, cb)
        st.dataframe(summary.toPandas())


if __name__ == "__main__":
    sys.exit(main())
