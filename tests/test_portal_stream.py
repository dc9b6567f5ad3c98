"""Streaming portal source: month-cursor offsets, checkpointed resume
(the 'already-scraped month' skip as streaming offsets)."""

from __future__ import annotations

import shutil
import tempfile
import time

import pytest

from etl_transparencia_sergipe_spark.sources import portal_datasource


@pytest.fixture()
def dirs():
    ck, out = tempfile.mkdtemp(prefix="ck_"), tempfile.mkdtemp(prefix="out_")
    yield ck, out
    shutil.rmtree(ck, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)


def _run_once(spark, ck, out):
    stream = (
        spark.readStream.format("transparencia_portal")
        .option("cidades", "aracaju").option("anos", "2024").load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()


def test_stream_advances_and_resumes_from_checkpoint(spark, dirs):
    ck, out = dirs
    portal_datasource.register(spark)

    _run_once(spark, ck, out)
    first = spark.read.parquet(out)
    months_1 = sorted(r.mes for r in first.select("mes").distinct().collect())
    n_1 = first.count()
    assert months_1, "first run ingested nothing"

    # second run resumes at the NEXT month (no re-fetch, no duplicates)
    _run_once(spark, ck, out)
    second = spark.read.parquet(out)
    months_2 = sorted(r.mes for r in second.select("mes").distinct().collect())
    assert len(months_2) > len(months_1)
    assert second.count() > n_1
    # no month was ingested twice
    per_month = second.groupBy("mes").count().collect()
    baseline = {r.mes: r["count"] for r in per_month}
    dup_check = (
        second.groupBy("mes", "empenho", "processo").count()
        .filter("count > 2")  # generator reuses empenho across cities only
    )
    assert months_2[:len(months_1)] == months_1
    assert all(v > 0 for v in baseline.values())
    assert dup_check.count() == 0
