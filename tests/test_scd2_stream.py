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


def test_scd2_stream_random_sequences(spark, tmp_path):
    """Seeded fuzz: random per-user attribute sequences with heavy
    repeats/alternations, streamed in 3 time-ordered micro-batches, must
    match the batch gaps-and-islands build exactly."""
    import random

    rng = random.Random(42)
    rows = []
    eid = 0
    base = 1_700_000_000_000_000  # us epoch
    for user in range(50):
        t = base
        for _ in range(rng.randint(1, 40)):
            t += rng.randint(1, 10_000_000)
            rows.append((eid, user, rng.choice("abc"),
                         t))
            eid += 1
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type",
                                      "ts_us"])
    pdf["ts"] = pd.to_datetime(pdf["ts_us"], unit="us")
    pdf = pdf.drop(columns=["ts_us"]).sort_values("ts")
    d = str(tmp_path / "fuzz")
    os.makedirs(d)
    n = len(pdf)
    for i, chunk in enumerate((pdf.iloc[:n // 3], pdf.iloc[n // 3:2 * n // 3],
                               pdf.iloc[2 * n // 3:])):
        spark.createDataFrame(chunk).coalesce(1).write.parquet(
            os.path.join(d, f"p{i}"))

    ev = spark.read.parquet(os.path.join(d, "p*"))
    # batch twin: q88's logic inline over this frame
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (ev.withColumn(
        "chg", F.when(F.lag("event_type").over(w).isNull()
                      | (F.lag("event_type").over(w) != F.col("event_type")),
                      1).otherwise(0))
        .withColumn("version",
                    F.sum("chg").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "version")
        .agg(F.min("event_type").alias("event_type"),
             F.min("ts").alias("vf"), F.count("*").alias("n_events")))
    wv = W.partitionBy("user_id").orderBy("version")
    batch = runs.select(
        "user_id", F.col("version").cast("bigint").alias("version"),
        "event_type",
        F.date_format("vf", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(F.lead("vf").over(wv), "yyyy-MM-dd HH:mm:ss")
        .alias("valid_to"),
        F.col("n_events").cast("bigint").alias("n_events"))
    want = sorted(tuple(r[c] for c in COLS)
                  for r in batch.filter("valid_to IS NOT NULL").collect())

    schema = spark.read.parquet(os.path.join(d, "p0")).schema
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1)
           .option("latestFirst", "false")
           .parquet(os.path.join(d, "p*")))
    _drain(scd2_stream(src), "t_scd2_fuzz")
    got = sorted(tuple(r[c] for c in COLS)
                 for r in spark.sql("SELECT * FROM t_scd2_fuzz").collect())
    assert got == want and len(want) > 100
