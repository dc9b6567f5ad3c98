"""Canonical-representative contraction for the dedup tier (round-7
VERDICT item 1 — the recorded-but-unbuilt 100 TB mitigation).

The quadratic that survives banded LSH is the VERIFY stage on
clique-dense corpora: within a duplicate cluster of m documents every
band bucket holds all m members, so a new batch's documents each verify
against ~m stored docs and a full self-dedup (q31) verifies m^2/2 true
pairs per clique — measured 390 s at sf10 on the deliberately
clique-dense fixture. Contraction replaces the cluster by ONE canonical
representative (its min doc id — exactly the component label
operators/components.py already computes): a new document is verified
against one doc per CLUSTER it collides with, never per member, so
batch-verify cost is ~linear in batch size regardless of how dense the
historical duplicate structure is.

State (built once per corpus era, the q81 storage posture):

    <path>/labels/   parquet [node, canonical_id]  — every old doc's
                     cluster label (singletons label themselves)
    <path>/sigs/     banded MinHash signature store
                     (operators/sigstore.py layout) of CANONICAL docs
                     ONLY — the band join's old side

Probe: band-join the new batch against the canonical store
(probe_signature_store — O(batch) broadcast, store side pruned), then
exact-Jaccard verify each (new doc, canonical) candidate once
(jaccard_verify_pairs — shingle sets built once per candidate doc).

The recall trade is explicit and standard: a new near-dup of cluster X
is found iff it band-collides with X's CANONICAL (not with any member).
For transitive near-dup clusters (the reason X is a cluster at all) the
canonical is a near-dup of every member, so a new copy of the cluster's
content collides with it in expectation exactly as it would with any
single member; what is given up is the member-specific long tail — the
price of deleting the quadratic.

Reference parity: the reference consolidates per-month CSVs and keeps
one row per logical record (``src/utils/file_utils.py:22-57``); this is
that keep-one-representative posture applied to content-defined
duplicate clusters at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.operators.components import (
    connected_components,
)
from etl_transparencia_sergipe_spark.operators.dedup import (
    jaccard_verify_pairs,
    minhash_lsh_pairs,
)
from etl_transparencia_sergipe_spark.operators.sigstore import (
    build_signature_store,
    probe_signature_store,
    read_banded_store,
)


def _labels_path(path: str) -> str:
    return path.rstrip("/") + "/labels"


def _sigs_path(path: str) -> str:
    return path.rstrip("/") + "/sigs"


def _texts_path(path: str) -> str:
    return path.rstrip("/") + "/texts"


def build_canonical_state(docs_old: DataFrame, id_col: str, text_col: str,
                          path: str, k: int = 16, bands: int = 4,
                          n: int = 3, threshold: float = 0.4,
                          base_epoch: int | None = None) -> dict:
    """Cluster the OLD corpus once and persist the contraction state.

    1. near-dup pairs (banded MinHash LSH + exact verify — the q31
       operator) over the old corpus;
    2. connected components -> labels [node, canonical_id] where the
       canonical IS the component label (min member id); docs in no
       pair label themselves;
    3. the banded signature store of canonical docs only.

    The full text scan happens HERE, once; every later batch probe
    reads the canonical band index + the candidate canonicals' text.
    Returns {"n_docs", "n_canonicals"}.

    ``base_epoch`` selects the STREAMING layout (the ann_index
    base_epoch contract): labels, signatures, and — additionally — the
    canonical docs' TEXT are written under
    ``ingest_batch=<base_epoch>`` partitions, so the ingest sink
    (streaming/canonical_stream.py) can (a) probe/relabel against
    partitions strictly below its epoch (replay determinism) and
    (b) dynamic-overwrite its own epoch partition on replay. The texts
    table exists only in this layout: it makes the state self-
    contained — the exact verify reads candidate canonicals' text from
    the state, never rescanning the corpus.

    ``base_epoch`` must be NEGATIVE (convention: -1). foreachBatch
    epochs start at 0, and the ingest sink probes partitions with
    ``ingest_batch < epoch`` then dynamic-overwrites its OWN epoch
    partition — a state built at base_epoch=0 would be invisible to the
    epoch-0 probe and then silently destroyed by epoch 0's overwrite
    (round-8 ADVICE: silent data loss, guarded loudly here).
    """
    if base_epoch is not None and int(base_epoch) >= 0:
        raise ValueError(
            f"base_epoch must be < 0 (got {base_epoch}): streaming "
            "epochs start at 0 and the sink's dynamic overwrite of its "
            "own ingest_batch partition would destroy a base written "
            "at a non-negative epoch")
    spark = docs_old.sparkSession
    pairs = minhash_lsh_pairs(docs_old, id_col, text_col, k=k,
                              bands=bands, threshold=threshold, n=n)
    cc = connected_components(pairs)
    ids = docs_old.select(F.col(id_col).alias("node"))
    singles = (ids.join(cc, "node", "left_anti")
               .withColumn("component", F.col("node")))
    labels = (cc.unionByName(singles)
              .withColumnRenamed("component", "canonical_id"))
    if base_epoch is None:
        labels.write.mode("overwrite").parquet(_labels_path(path))
    else:
        (labels.withColumn("ingest_batch", F.lit(int(base_epoch)))
         .write.mode("overwrite").partitionBy("ingest_batch")
         .parquet(_labels_path(path)))

    labels = spark.read.parquet(_labels_path(path))
    canon_ids = (labels.select(F.col("canonical_id").alias(id_col))
                 .distinct())
    canon_docs = docs_old.join(canon_ids, id_col, "left_semi")
    if base_epoch is None:
        build_signature_store(canon_docs, id_col, text_col,
                              _sigs_path(path), k=k, n=n, bands=bands)
    else:
        from etl_transparencia_sergipe_spark.operators.dedup import (
            minhash_signatures,
        )
        from etl_transparencia_sergipe_spark.operators.sigstore import (
            banded_signatures,
            write_banded_store,
        )

        sig = minhash_signatures(canon_docs, id_col, text_col, k=k, n=n)
        write_banded_store(
            banded_signatures(sig, k, bands)
            .withColumn("ingest_batch", F.lit(int(base_epoch))),
            _sigs_path(path), partition_by=["ingest_batch"])
        (canon_docs.select(F.col(id_col).alias("doc_id"),
                           F.col(text_col).alias("text"))
         .withColumn("ingest_batch", F.lit(int(base_epoch)))
         .write.mode("overwrite").partitionBy("ingest_batch")
         .parquet(_texts_path(path)))
    return {"n_docs": int(labels.count()),
            "n_canonicals": int(canon_ids.count())}


def read_state_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Zone-aware read of a canonical-state table (labels / texts):
    union of the live ``ingest_batch=N`` partitions and the hidden
    ``_compacted`` zone :func:`compact_canonical_state` folds them
    into. Delegates to the sigstore reader — the two-zone layout is
    identical; only the sort clustering differs."""
    return read_banded_store(spark, table_path)


def compact_canonical_state(spark: SparkSession, path: str,
                            upto_epoch: int, n_files: int = 8) -> None:
    """LSM-compact all three canonical-state tables (round-9 VERDICT
    item 4): fold every committed ``ingest_batch < upto_epoch``
    partition into each table's clustered ``_compacted`` zone —
    signatures band_hash-clustered (the probe's pushed-In zone maps),
    labels/texts id-clustered (the sink's candidate-id In filter prunes
    row groups the same way). Bounded file counts under continuous
    ingestion; probes and replays are unchanged because every reader is
    zone-aware (read_banded_store / read_state_table) and
    ``ingest_batch`` survives as a regular column inside the zones, so
    the ``< epoch`` replay filter still applies row-level.

    Call only with ``upto_epoch`` <= the stream's last COMMITTED epoch
    (the ingest sink passes its current epoch id at batch START, when
    everything below it is committed) — a replay-reachable epoch must
    stay live so the sink's dynamic partition overwrite rewrites it
    in place. Crash safety is _fold_store's two-rename protocol per
    table; the narrow duplicate window is absorbed by the probe's
    pair-level distinct and by replay overwrite, same contract as the
    signature store.
    """
    from etl_transparencia_sergipe_spark.operators.sigstore import (
        _fold_store,
        compact_banded_store,
    )

    compact_banded_store(spark, _sigs_path(path), upto_epoch,
                         n_files=n_files)
    _fold_store(spark, _labels_path(path), upto_epoch, ["node"],
                n_files=n_files)
    _fold_store(spark, _texts_path(path), upto_epoch, ["doc_id"],
                n_files=n_files)


def probe_canonical_state(spark: SparkSession, path: str,
                          docs_all: DataFrame, new_docs: DataFrame,
                          id_col: str, text_col: str, k: int = 16,
                          bands: int = 4, n: int = 3,
                          threshold: float = 0.4,
                          ingest_batch_lt: int | None = None,
                          broadcast_verify: bool = False) -> DataFrame:
    """Verify a NEW batch against one canonical per cluster.

    Returns DataFrame[new_id, canonical_id, jaccard] — one row per
    (new doc, matched cluster) with exact Jaccard >= threshold. The
    band join produces at most one candidate per (new doc, colliding
    CLUSTER); the exact verify therefore does work linear in the
    batch's true cluster matches, never in cluster sizes.

    ``docs_all`` supplies candidate text for the exact verify (both the
    new docs and the canonical docs must be rows of it — for the
    registered query it is simply the documents table; the streaming
    sink passes the state's own texts table plus the batch).
    ``ingest_batch_lt`` restricts an epoch-partitioned canonical store
    to partitions strictly below the given epoch (replay determinism —
    the probe_signature_store contract).
    """
    cand = (
        probe_signature_store(spark, _sigs_path(path), new_docs,
                              id_col, text_col, k=k, bands=bands, n=n,
                              ingest_batch_lt=ingest_batch_lt)
        # all band collisions are candidates; scoring is the EXACT
        # verify below, not the minhash n_agree estimate
        .selectExpr("old_id AS id_a", "new_id AS id_b")
    )
    return (
        jaccard_verify_pairs(docs_all, cand, id_col, text_col, n,
                             broadcast_side=broadcast_verify)
        .filter(F.col("jaccard") >= threshold)
        .selectExpr("id_b AS new_id", "id_a AS canonical_id", "jaccard")
    )


def absorb_batch(spark: SparkSession, path: str, docs_all: DataFrame,
                 new_docs: DataFrame, id_col: str, text_col: str,
                 k: int = 16, bands: int = 4, n: int = 3,
                 threshold: float = 0.4,
                 epoch: int | None = None,
                 matches: DataFrame | None = None) -> DataFrame:
    """Probe, then fold the batch into the state — the production loop.

    Matched new docs adopt their best-match cluster's canonical (max
    jaccard, ties to the smallest canonical id — deterministic);
    unmatched new docs become their own canonicals: their labels row
    points at themselves and their signatures (and, in the streaming
    layout, their text) enter the canonical store so later batches can
    match them. Matched docs' signatures are NOT appended — that is
    the contraction invariant (one signature set per cluster, forever).

    ``epoch`` (streaming layout, build_canonical_state(base_epoch=...)):
    the probe reads only state partitions < epoch, and every write is a
    DYNAMIC OVERWRITE of the batch's own ``ingest_batch=<epoch>``
    partition — a replayed epoch converges bit-identically instead of
    appending duplicates (the sigstore_stream contract). Without it the
    writes are plain appends (the single-driver batch loop).

    ``matches``: a caller that already probed (the streaming sink
    persists one probe and shares it between the matches table and the
    absorb) passes the [new_id, canonical_id, jaccard] frame in; None
    probes here.

    Returns the batch's new labels [node, canonical_id].
    """
    from etl_transparencia_sergipe_spark.operators.dedup import (
        minhash_signatures,
    )
    from etl_transparencia_sergipe_spark.operators.sigstore import (
        banded_signatures,
        write_banded_store,
    )

    if matches is None:
        matches = probe_canonical_state(
            spark, path, docs_all, new_docs, id_col, text_col, k=k,
            bands=bands, n=n, threshold=threshold,
            ingest_batch_lt=None if epoch is None else int(epoch))
    best = (matches
            .withColumn("_r", F.row_number().over(
                W.partitionBy("new_id")
                .orderBy(F.desc("jaccard"), F.asc("canonical_id"))))
            .filter("_r = 1")
            .selectExpr("new_id AS node", "canonical_id"))
    unmatched = (new_docs.selectExpr(f"{id_col} AS node")
                 .join(best, "node", "left_anti")
                 .withColumn("canonical_id", F.col("node")))
    new_labels = best.unionByName(unmatched)
    fresh_canon = new_docs.join(
        unmatched.selectExpr(f"node AS {id_col}"), id_col, "left_semi")
    sig = minhash_signatures(fresh_canon, id_col, text_col, k=k, n=n)
    banded = banded_signatures(sig, k, bands)

    if epoch is None:
        new_labels.write.mode("append").parquet(_labels_path(path))
        write_banded_store(banded, _sigs_path(path), mode="append",
                           n_files=1)
    else:
        (new_labels.withColumn("ingest_batch", F.lit(int(epoch)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("ingest_batch").parquet(_labels_path(path)))
        write_banded_store(
            banded.withColumn("ingest_batch", F.lit(int(epoch))),
            _sigs_path(path), partition_by=["ingest_batch"], n_files=1)
        (fresh_canon.select(F.col(id_col).alias("doc_id"),
                            F.col(text_col).alias("text"))
         .withColumn("ingest_batch", F.lit(int(epoch)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("ingest_batch").parquet(_texts_path(path)))
    return (read_state_table(spark, _labels_path(path))
            .select("node", "canonical_id")
            .join(new_docs.selectExpr(f"{id_col} AS node"), "node",
                  "left_semi"))
