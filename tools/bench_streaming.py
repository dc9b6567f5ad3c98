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
- ann_ingest_sink  (foreachBatch assign-only ANN-index append over an
  8-shard embeddings stream against a pre-trained base index;
  measured in vectors/sec with the per-epoch drift-ratio range)

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
    if len(sys.argv) > 1 and sys.argv[1] == "growth":
        # store-growth sweep only: python tools/bench_streaming.py growth [N]
        n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 64
        spark = get_spark("bench-sig-growth")
        res = bench_sigstore_growth(spark, sf_dir, n_batches)
        print(json.dumps({"sf_dir": sf_dir, "sigstore_growth": res}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "canonical_batches":
        # batch-size amortization sweep (round-11, r10 VERDICT stretch
        # item 8): same corpus, 1/8/64-shard streams — per-DOC cost must
        # fall as batch size grows if the 5.9 s/batch wall is per-batch
        # constants, stay flat if it is per-doc work
        shards = ([int(s) for s in sys.argv[2:]] or [1, 8, 64])
        spark = get_spark("bench-canon-batches")
        res = bench_canonical_batches(spark, sf_dir, shards)
        print(json.dumps({"sf_dir": sf_dir, "canonical_batches": res}))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "growth_canonical":
        # canonical-state sweep: bench_streaming.py growth_canonical [N]
        n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 32
        spark = get_spark("bench-canon-growth")
        res = bench_canonical_growth(spark, sf_dir, n_batches)
        print(json.dumps({"sf_dir": sf_dir, "canonical_growth": res}))
        return
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
    bench_canonical(spark, sf_dir, out)
    bench_ann_ingest(spark, sf_dir, out)

    print(json.dumps({
        "n_events": n_events, "n_docs": n_docs, "sf_dir": sf_dir,
        "n_microbatches": N_SHARDS,
        "state_store": provider, "scenarios": out,
    }))


def bench_canonical_batches(spark, sf_dir: str,
                            shards: list[int]) -> dict:
    """Canonical-sink batch-size amortization sweep: ingest the SAME
    src15+ split as a 1-shard (one big batch), 8-shard, and 64-shard
    stream against a freshly built state each time. Reports per-shard
    wall, per-batch wall, and ms/doc — a falling ms/doc curve with flat
    sec/batch pins the cost as per-batch constants (scheduler + state
    list + probe job floor), i.e. batch size is the throughput dial."""
    from etl_transparencia_sergipe_spark.operators.canonical import (
        build_canonical_state,
    )
    from etl_transparencia_sergipe_spark.streaming.canonical_stream import (
        run_canonical_ingest,
    )

    tag = sf_dir.strip("/").replace("/", "_")
    base = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", ".scratch",
        f"canon_batches_{tag}"))
    docs = load_table(spark, "documents", sf_dir)
    is_new = "CAST(SUBSTR(source, 4) AS INT) >= 15"
    hist = docs.filter(f"NOT ({is_new})")
    new = docs.filter(is_new)
    n_new = new.count()
    res: dict[str, dict] = {"n_docs": n_new}
    for k in shards:
        root = os.path.join(base, f"s{k}")
        shutil.rmtree(root, ignore_errors=True)
        state = os.path.join(root, "state")
        build_canonical_state(hist, "doc_id", "text", state,
                              base_epoch=-1)
        docs_dir = os.path.join(root, "docs")
        new.repartition(k).write.mode("overwrite").parquet(docs_dir)
        t0 = time.time()
        run_canonical_ingest(spark, docs_dir, state,
                             matches_path=os.path.join(root, "matches"),
                             checkpoint_dir=os.path.join(root, "ckpt"))
        sec = time.time() - t0
        matched = spark.read.parquet(os.path.join(root, "matches")).count()
        res[f"shards_{k}"] = {
            "sec": round(sec, 3),
            "sec_per_batch": round(sec / k, 3),
            "ms_per_doc": round(1000 * sec / n_new, 3),
            "docs_per_sec": round(n_new / sec),
            "matches": matched,
        }
        print(f"# canonical {k:>3} shards: {sec:7.2f}s  "
              f"{sec / k:6.2f}s/batch  "
              f"{1000 * sec / n_new:7.3f} ms/doc  {matched} matches",
              file=sys.stderr)
    return res


def bench_canonical_growth(spark, sf_dir: str, n_batches: int = 32) -> dict:
    """Canonical-state growth sweep (round 8): drive the
    canonical_ingest_sink body epoch by epoch and record each epoch's
    wall — probe + exact verify + absorb (4 transactional writes) — as
    the state grows by every prior epoch's new canonicals. Flat
    per-batch wall (last-8 mean within ±25% of batches 1-8) = the loop
    is O(batch): the probe broadcast is batch-sized, the texts scan is
    candidate-In-pushed, the writes are batch-sized, and nothing
    rescans state proportional to its size."""
    from etl_transparencia_sergipe_spark.operators.canonical import (
        build_canonical_state,
    )
    from etl_transparencia_sergipe_spark.streaming.canonical_stream import (
        canonical_ingest_sink,
    )

    tag = sf_dir.strip("/").replace("/", "_")
    base = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", ".scratch",
        f"canon_growth_{tag}"))
    shutil.rmtree(base, ignore_errors=True)
    docs = load_table(spark, "documents", sf_dir)
    is_new = "CAST(SUBSTR(source, 4) AS INT) >= 15"
    state = os.path.join(base, "state")
    t0 = time.time()
    build_canonical_state(docs.filter(f"NOT ({is_new})"),
                          "doc_id", "text", state, base_epoch=-1)
    build_sec = round(time.time() - t0, 3)
    new = docs.filter(is_new)
    n_new = new.count()
    batch_dir = os.path.join(base, "batches")
    (new.withColumn("_b", F.pmod("doc_id", F.lit(n_batches)))
     .write.partitionBy("_b").mode("overwrite").parquet(batch_dir))
    sink = canonical_ingest_sink(state, os.path.join(base, "matches"))
    walls = []
    for e in range(n_batches):
        batch = spark.read.parquet(os.path.join(batch_dir, f"_b={e}"))
        t0 = time.time()
        sink(batch, e)
        walls.append(round(time.time() - t0, 3))
    first8 = sum(walls[1:9]) / 8
    last8 = sum(walls[-8:]) / 8
    n_canon = (spark.read.parquet(os.path.join(state, "sigs"))
               .select("doc_id").distinct().count())
    return {
        "n_batches": n_batches,
        "docs_per_batch": round(n_new / n_batches),
        "state_build_sec": build_sec,
        "wall_batches_1_8_mean_sec": round(first8, 3),
        "wall_last_8_mean_sec": round(last8, 3),
        "flat_ratio": round(last8 / first8, 3),
        "n_canonicals_final": n_canon,
        "walls": walls,
    }


def bench_sigstore_growth(spark, sf_dir: str, n_batches: int = 64) -> dict:
    """Store-growth sweep (round-6 VERDICT item 1 'done' criterion):
    drive the foreachBatch sink body epoch by epoch over ``n_batches``
    document batches and record each epoch's wall — probe + banded
    append — as the store grows from empty to ``n_batches - 1`` stored
    partitions. Flat per-batch wall (last-8 mean within ±20% of the
    batches 1-8 mean) = the probe is O(batch), not O(store). Also
    reports the zone-map skip fraction the LAST batch's pushed In
    filter gets against the full-grown store (footer-stats measurement,
    operators/layout.inset_skip_fraction)."""
    from etl_transparencia_sergipe_spark.operators.dedup import (
        minhash_signatures,
    )
    from etl_transparencia_sergipe_spark.operators.layout import (
        inset_skip_fraction,
    )
    from etl_transparencia_sergipe_spark.operators.sigstore import (
        banded_signatures,
    )
    from etl_transparencia_sergipe_spark.streaming.sigstore_stream import (
        sigstore_ingest_sink,
    )

    tag = sf_dir.strip("/").replace("/", "_")
    base = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", ".scratch", f"sig_growth_{tag}"))
    shutil.rmtree(base, ignore_errors=True)
    docs = load_table(spark, "documents", sf_dir)
    n_docs = docs.count()
    batch_dir = os.path.join(base, "batches")
    # deterministic near-equal batches (doc_ids are dense ints)
    (docs.withColumn("_b", F.pmod("doc_id", F.lit(n_batches)))
     .write.partitionBy("_b").mode("overwrite").parquet(batch_dir))

    store = os.path.join(base, "store")
    flags = os.path.join(base, "flags")
    sink = sigstore_ingest_sink(store, flags)
    walls = []
    compact_sec = None
    for e in range(n_batches):
        if e == n_batches // 2:
            # LSM maintenance: fold the first half's live partitions
            # into the clustered zone (runs between batches — its cost
            # is amortized, reported separately, NOT hidden in walls)
            from etl_transparencia_sergipe_spark.operators.sigstore import (
                compact_banded_store,
            )
            t0 = time.time()
            compact_banded_store(spark, store, upto_epoch=e,
                                 rows_per_group=8192)
            compact_sec = round(time.time() - t0, 3)
        batch = spark.read.parquet(os.path.join(batch_dir, f"_b={e}"))
        t0 = time.time()
        sink(batch, e)
        walls.append(round(time.time() - t0, 3))
    first8 = sum(walls[1:9]) / 8  # epoch 0 probes nothing; skip it
    last8 = sum(walls[-8:]) / 8
    last_batch = spark.read.parquet(
        os.path.join(batch_dir, f"_b={n_batches - 1}"))
    last_keys = [r[0] for r in banded_signatures(minhash_signatures(
        last_batch, "doc_id", "text")).select("band_hash").collect()]
    skip = inset_skip_fraction(store, "band_hash", last_keys)
    # point-probe shape: one doc's 4 band keys — zone-map pruning is a
    # function of keys/groups, so the full-batch number above goes to 0
    # whenever batch keys outnumber row groups (true at bench scale,
    # false at production store:batch ratios where groups >> keys)
    one_keys = [r[0] for r in banded_signatures(minhash_signatures(
        last_batch.limit(1), "doc_id", "text"))
        .select("band_hash").collect()]
    skip1 = inset_skip_fraction(store, "band_hash", one_keys)
    res = {
        "n_batches": n_batches,
        "docs_per_batch": round(n_docs / n_batches),
        "wall_batches_1_8_mean_sec": round(first8, 3),
        "wall_last8_mean_sec": round(last8, 3),
        "growth_ratio": round(last8 / first8, 3),
        "flat_within_20pct": last8 <= 1.2 * first8,
        "compact_at_epoch": n_batches // 2,
        "compact_sec": compact_sec,
        "store_rowgroup_skip_last_batch": round(skip["skip_fraction"], 3),
        "store_rowgroup_skip_one_doc": round(skip1["skip_fraction"], 3),
        "store_rowgroups": skip["n_groups"],
        "per_epoch_sec": walls,
    }
    print(f"# sigstore_growth: batches1-8 {first8:.2f}s/batch, "
          f"last8 {last8:.2f}s/batch, ratio {last8 / first8:.2f}, "
          f"skip {skip['skip_fraction']:.2f}", file=sys.stderr)
    return res


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


def bench_canonical(spark, sf_dir: str, out: dict) -> None:
    """foreachBatch canonical-contraction ingest over an 8-shard stream
    of the src15+ split: state built once on the historical corpus
    (src0-14, the q107 split), each micro-batch probes CANONICALS only,
    exact-verifies one pair per matched cluster, and absorbs (round 8,
    streaming/canonical_stream.py). Measured in docs/sec; state-build
    cost reported separately (one-time, not per-batch)."""
    from etl_transparencia_sergipe_spark.operators.canonical import (
        build_canonical_state,
    )
    from etl_transparencia_sergipe_spark.streaming.canonical_stream import (
        run_canonical_ingest,
    )

    tag = sf_dir.strip("/").replace("/", "_")
    base = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", ".scratch",
        f"canon_bench_{tag}"))
    shutil.rmtree(base, ignore_errors=True)
    docs = load_table(spark, "documents", sf_dir)
    is_new = "CAST(SUBSTR(source, 4) AS INT) >= 15"
    state = os.path.join(base, "state")
    t0 = time.time()
    build_canonical_state(docs.filter(f"NOT ({is_new})"),
                          "doc_id", "text", state, base_epoch=-1)
    build_sec = time.time() - t0
    new = docs.filter(is_new)
    n_new = new.count()
    docs_dir = os.path.join(base, "docs")
    new.repartition(N_SHARDS).write.mode("overwrite").parquet(docs_dir)
    t0 = time.time()
    run_canonical_ingest(spark, docs_dir, state,
                         matches_path=os.path.join(base, "matches"),
                         checkpoint_dir=os.path.join(base, "ckpt"))
    sec = time.time() - t0
    matched = spark.read.parquet(os.path.join(base, "matches")).count()
    out["canonical_sink"] = {
        "sec": round(sec, 3),
        "docs_per_sec": round(n_new / sec),
        "sec_per_batch": round(sec / N_SHARDS, 3),
        "state_build_sec": round(build_sec, 3),
        "out_rows": matched,
    }
    print(f"# canonical_sink: {sec:.2f}s  {n_new / sec:,.0f} docs/s  "
          f"{matched} matches (state build {build_sec:.1f}s)",
          file=sys.stderr)


def bench_ann_ingest(spark, sf_dir: str, out: dict) -> None:
    """foreachBatch ANN-index ingest over an 8-shard embeddings stream:
    base index trained+built on the first half of the corpus, the
    second half arrives as 8 micro-batches of assign-only appends
    (streaming/ann_stream.py). Measured in vectors/sec; the per-epoch
    drift ratios are summarized to show the in-distribution band."""
    from etl_transparencia_sergipe_spark.operators.ann_index import (
        build_ivfpq_index,
    )
    from etl_transparencia_sergipe_spark.streaming.ann_stream import (
        run_ann_ingest,
    )

    tag = sf_dir.strip("/").replace("/", "_")
    base = os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", ".scratch", f"ann_bench_{tag}"))
    shutil.rmtree(base, ignore_errors=True)
    emb = load_table(spark, "embeddings", sf_dir)
    n = emb.count()
    half = n // 2
    emb_dir = os.path.join(base, "incoming")
    (emb.filter(f"vec_id >= {half}").repartition(N_SHARDS)
     .write.mode("overwrite").parquet(emb_dir))
    index = os.path.join(base, "index")
    drift = os.path.join(base, "drift")
    build_ivfpq_index(emb.filter(f"vec_id < {half}"), index, base_epoch=-1)
    t0 = time.time()
    run_ann_ingest(spark, emb_dir, index, drift,
                   checkpoint_dir=os.path.join(base, "ckpt"))
    sec = time.time() - t0
    n_stream = n - half
    d = spark.read.parquet(drift).agg(
        F.min("drift_ratio"), F.max("drift_ratio")).collect()[0]
    out["ann_ingest_sink"] = {
        "sec": round(sec, 3),
        "vectors_per_sec": round(n_stream / sec),
        "sec_per_batch": round(sec / N_SHARDS, 3),
        "out_rows": n_stream,
        "drift_ratio_range": [round(d[0], 3), round(d[1], 3)],
    }
    print(f"# ann_ingest_sink: {sec:.2f}s  {n_stream / sec:,.0f} vec/s  "
          f"drift {d[0]:.3f}-{d[1]:.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
