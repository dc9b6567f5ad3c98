"""Streaming sources/sinks: parquet-backed event stream, memory-sink test
harness, and the foreachBatch hive-partitioned sink that mirrors the
reference's ``data/processed/{cidade}/{cidade}_royalties_{ano}_{mes}.csv``
layout (aracaju_barra_pirambu_scraper.py:289-291) as
``{sink}/event_type=*/event_date=*`` dynamic partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream(spark: SparkSession, sf_dir: str,
                  max_files_per_trigger: int = 1) -> DataFrame:
    """events table as a file stream (one file per micro-batch by default —
    the 'lote' batch-windowing knob, pacatuba_scraper.py:405-428)."""
    import os

    from ..sources.catalog import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The ts encoding varies across generator versions (nanos long vs micros
    # timestamp): streams need an explicit schema, so take it from the
    # parquet footer of the actual file instead of hardcoding one.
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    # FileStreamSource requires a directory; select just the events file
    # from the sf dir with a glob filter.
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(raw)


def run_to_memory(df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming frame to completion synchronously into a memory
    sink; returns the query handle (caller reads ``SELECT * FROM name``)."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory").queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    return q


def foreach_batch_partitioned_sink(out_dir: str):
    """foreachBatch sink writing dynamic hive partitions by
    (event_type, event_date) — idempotent per-partition overwrite is the
    streaming analog of the reference re-running a month and overwriting
    its CSV (file_utils.py:57)."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df
            .withColumn("event_date", F.to_date("ts"))
            .write.mode("append")
            .partitionBy("event_type", "event_date")
            .parquet(out_dir)
        )

    return write_batch
