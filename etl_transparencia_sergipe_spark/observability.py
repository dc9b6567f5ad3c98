"""Progress/metric observability (SURVEY.md D7/D8).

The reference scrapes its own log lines to compute progress and ETA
(interface.py:166-198). Spark-first equivalent: ``df.observe`` attaches
named aggregate metrics to a plan; they are collected as a side effect of
the action that executes it — no log parsing, no second job, and the
metrics are exact because they ride the same pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str = "metrics",
             *metric_cols) -> tuple[DataFrame, Observation]:
    """Attach an Observation with the given aggregate columns (default:
    row count). Read ``obs.get`` AFTER an action has run the plan."""
    obs = Observation(name)
    if not metric_cols:
        metric_cols = (F.count(F.lit(1)).alias("n_rows"),)
    return df.observe(obs, *metric_cols), obs


def task_log_context(task_id: str):
    """D8 thread-context logging parity (logging_setup.py:8-14): a logging
    adapter that injects a task id into records emitted by executor-side
    fetch functions."""
    import logging

    logger = logging.getLogger("etl_transparencia_sergipe_spark")
    return logging.LoggerAdapter(logger, {"task_id": task_id})
