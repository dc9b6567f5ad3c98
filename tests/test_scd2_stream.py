"""Streaming SCD2 (streaming/scd2.py) ≡ batch q88: the closed intervals
a stateful stream emits must equal the batch build's non-null-valid_to
rows — including across micro-batch boundaries (two-file split)."""

from __future__ import annotations

import os

import __spark_entry__ as entrymod
from etl_transparencia_sergipe_spark.sources.catalog import load_table
from etl_transparencia_sergipe_spark.streaming.pipeline import events_stream
from etl_transparencia_sergipe_spark.streaming.scd2 import scd2_stream

COLS = ["user_id", "version", "event_type", "valid_from", "valid_to",
        "n_events"]


def _batch_closed(spark, sf_dir):
    q88 = entrymod.queries()["q88_scd2_intervals"](spark, sf_dir)
    return sorted(
        tuple(r[c] for c in COLS)
        for r in q88.filter("valid_to IS NOT NULL").collect())


def _drain(stream, name):
    q = (stream.writeStream.outputMode("append")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()


def test_scd2_stream_equals_batch_single_batch(spark, sf_dir):
    _drain(scd2_stream(events_stream(spark, sf_dir)), "t_scd2")
    got = sorted(tuple(r[c] for c in COLS)
                 for r in spark.sql("SELECT * FROM t_scd2").collect())
    want = _batch_closed(spark, sf_dir)
    assert got == want and len(want) > 0


def test_scd2_stream_stitches_across_batches(spark, sf_dir, tmp_path):
    # split events into two time-ordered files -> two micro-batches; runs
    # spanning the split must stitch through state, not restart
    ev = load_table(spark, "events", sf_dir).orderBy("ts", "event_id")
    n = ev.count()
    rows = ev.collect()
    half_ts = rows[n // 2].ts
    d = str(tmp_path / "ev2")
    os.makedirs(d)
    early = ev.filter(ev.ts <= half_ts)
    late = ev.filter(ev.ts > half_ts)
    early.coalesce(1).write.parquet(os.path.join(d, "p0"))
    late.coalesce(1).write.parquet(os.path.join(d, "p1"))

    schema = spark.read.parquet(os.path.join(d, "p0")).schema
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1)
           .option("latestFirst", "false")
           .parquet(os.path.join(d, "p*")))
    _drain(scd2_stream(src), "t_scd2_split")
    got = sorted(tuple(r[c] for c in COLS)
                 for r in spark.sql("SELECT * FROM t_scd2_split").collect())
    want = _batch_closed(spark, sf_dir)
    assert got == want
