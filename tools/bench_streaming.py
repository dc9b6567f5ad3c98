"""Streaming throughput bench (VERDICT.md round-2 item 8).

Measures end-to-end events/sec for the Structured Streaming surface at
$SPARK_GRAFT_SF_DIR (default sf0.1). The events table is re-sharded into
8 parquet files in .scratch/ and streamed with maxFilesPerTrigger=1, so
every scenario runs 8 real micro-batches (state carried across batches),
not one batch-sized swallow. availableNow + processAllAvailable drains to
completion; wall time covers query start -> drain.

Scenarios:
- tumbling_counts  (10 min windows, 30 min watermark, append)
- session_stats    (5 min gap session windows, 30 min watermark, append)
- click_purchase_join (stream-stream interval join, both sides
  watermarked, state bounded by the 30 min horizon)
- running_user_stats (applyInPandasWithState custom stateful op, update)
- scd2_intervals   (applyInPandasWithState SCD2 run-closer, append)
- sigstore_sink    (foreachBatch probe-then-append incremental dedup
  over the documents table, replay-idempotent parquet signature store;
  measured in docs/sec over its own 8-shard stream)

Prints one JSON line: {"n_events", "sf_dir", "scenarios": {name:
{"sec", "events_per_sec", "out_rows"}}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from etl_transparencia_sergipe_spark.session import get_spark  # noqa: E402
from etl_transparencia_sergipe_spark.sources.catalog import (  # noqa: E402
    load_table,
    normalize_event_ts,
)
from etl_transparencia_sergipe_spark.streaming.scd2 import (  # noqa: E402
    scd2_stream,
)
from etl_transparencia_sergipe_spark.streaming.stateful import (  # noqa: E402
    running_user_stats,
)
from etl_transparencia_sergipe_spark.streaming.windows import (  # noqa: E402
    click_purchase_join,
    session_stats,
    tumbling_counts,
)

N_SHARDS = 8


def shard_events(spark, sf_dir: str) -> tuple[str, int]:
    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", ".scratch", f"stream_events_{tag}"))
    ev = load_table(spark, "events", sf_dir)
    n = ev.count()
    shutil.rmtree(out, ignore_errors=True)
    # DETERMINISTIC time-ordered shards: micro-batches arrive in
    # chronological order (the real firehose model) AND two runs see
    # bit-identical batch composition. Neither plain repartition (random
    # scatter) nor repartitionByRange (randomly SAMPLED boundaries)
    # gives that — with either, order-sensitive outputs (scd2's run
    # segmentation, watermark-finalized window counts) drifted between
    # otherwise-identical runs (observed 788352 vs 788318 closed
    # intervals, 7756 vs 5216 finalized windows). Explicit
    # row_number-over-(ts, event_id) sharding + one file written per
    # shard in sequence pins both content and arrival order.
    import glob as _glob

    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    ranked = ev.withColumn(
        "_shard",
        _F.floor((_F.row_number().over(
            _W.orderBy("ts", "event_id")) - 1) * N_SHARDS / n))
    os.makedirs(out)
    for s in range(N_SHARDS):
        tmp = f"{out}__tmp{s}"
        (ranked.filter(_F.col("_shard") == s).drop("_shard")
         .coalesce(1).write.mode("overwrite").parquet(tmp))
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.rename(part, os.path.join(out, f"shard-{s:02d}.parquet"))
        shutil.rmtree(tmp)
    return out, n


def stream_source(spark, shard_dir: str):
    schema = spark.read.parquet(shard_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(shard_dir)
    )
    return normalize_event_ts(raw)


def drain(df, name: str, mode: str) -> tuple[float, int]:
    t0 = time.time()
    q = (
        df.writeStream.outputMode(mode)
        .format("memory").queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    sec = time.time() - t0
    spark = df.sparkSession
    rows = spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0].n
    q.stop()
    return sec, rows


_PROVIDERS = {
    # default HDFS-backed in-memory map + snapshot files
    "hdfs": "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
    # RocksDB: state lives off-heap on local disk — commit cost stays
    # bounded when keyed state outgrows executor memory (the 100 TB
    # posture for stream-stream joins / wide session state)
    "rocksdb": "org.apache.spark.sql.execution.streaming.state."
               "RocksDBStateStoreProvider",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    provider = sys.argv[1] if len(sys.argv) > 1 else "hdfs"
    spark = get_spark("bench-streaming", extra_conf={
        "spark.sql.streaming.stateStore.providerClass":
            _PROVIDERS[provider]})
    shard_dir, n_events = shard_events(spark, sf_dir)

    scenarios = {
        "tumbling_counts": (
            lambda s: tumbling_counts(s, watermark="30 minutes"), "append"),
        "session_stats": (
            lambda s: session_stats(s, watermark="30 minutes"), "append"),
        "click_purchase_join": (
            lambda s: click_purchase_join(s, watermark="30 minutes"),
            "append"),
        "running_user_stats": (
            lambda s: running_user_stats(s, expire_state=False), "update"),
        "scd2_intervals": (scd2_stream, "append"),
    }

    out: dict[str, dict] = {}
    for name, (build, mode) in scenarios.items():
        df = build(stream_source(spark, shard_dir))
        sec, rows = drain(df, f"bench_{name}", mode)
        out[name] = {
            "sec": round(sec, 3),
            "events_per_sec": round(n_events / sec),
            "sec_per_batch": round(sec / N_SHARDS, 3),
            "out_rows": rows,
        }
        print(f"# {name}: {sec:.2f}s  "
              f"{n_events / sec:,.0f} ev/s  {rows} out rows",
              file=sys.stderr)

    n_docs = bench_sigstore(spark, sf_dir, out)

    print(json.dumps({
        "n_events": n_events, "n_docs": n_docs, "sf_dir": sf_dir,
        "n_microbatches": N_SHARDS,
        "state_store": provider, "scenarios": out,
    }))


def bench_sigstore(spark, sf_dir: str, out: dict) -> int:
    """foreachBatch sigstore sink over an 8-shard documents stream:
    every micro-batch probes the committed store (asymmetric old x new
    band join) and appends its signatures as a new ingest_batch
    partition — the reference's month-at-a-time incremental model."""
    from etl_transparencia_sergipe_spark.streaming.sigstore_stream import (
        run_ingest_dedup,
    )

    tag = sf_dir.strip("/").replace("/", "_")
    base = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", ".scratch", f"sig_bench_{tag}"))
    shutil.rmtree(base, ignore_errors=True)
    docs = load_table(spark, "documents", sf_dir)
    n_docs = docs.count()
    docs_dir = os.path.join(base, "docs")
    docs.repartition(N_SHARDS).write.mode("overwrite").parquet(docs_dir)
    t0 = time.time()
    run_ingest_dedup(spark, docs_dir,
                     store_path=os.path.join(base, "store"),
                     flags_path=os.path.join(base, "flags"),
                     checkpoint_dir=os.path.join(base, "ckpt"))
    sec = time.time() - t0
    flags = spark.read.parquet(os.path.join(base, "flags")).count()
    out["sigstore_sink"] = {
        "sec": round(sec, 3),
        "docs_per_sec": round(n_docs / sec),
        "sec_per_batch": round(sec / N_SHARDS, 3),
        "out_rows": flags,
    }
    print(f"# sigstore_sink: {sec:.2f}s  {n_docs / sec:,.0f} docs/s  "
          f"{flags} flagged", file=sys.stderr)
    return n_docs


if __name__ == "__main__":
    main()
