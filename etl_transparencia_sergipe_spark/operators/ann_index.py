"""Incremental IVFADC index — build once, append forever, retrain when
drift says so (round-6 VERDICT item 8).

The quantizer artifact store (operators/quantizer_store.py) made the
trained tier build-once/serve-many, but a growing corpus APPENDS
vectors: retraining centroids + codebooks per batch is neither needed
(quantizers drift slowly) nor desirable (a retrain re-encodes the whole
corpus). This module applies the q79/q81 incremental posture to IVF: a
self-contained index directory whose quantizer is trained exactly once,
with new batches ASSIGN-ONLY encoded against the stored constants —
plus a drift self-report that tells the operator when that stops being
a good idea.

Index layout (plain parquet, no pickles — the quantizer_store format):

    <path>/_quantizer.parquet    cmat (n_cells, dim), books (m, ksub,
                                 dsub), baseline_resid (1, 1): the
                                 training sample's mean squared
                                 coarse-residual norm
    <path>/cell=N/part-*.parquet encoded rows [vec_id, c0..c{m-1}]

``cell`` is a hive partition: a search probing ``nprobe`` of
``n_cells`` cells prunes the scan to those directories — the ADC pass
reads nprobe/n_cells of the codes, which is the IVF contract realized
at the storage layer (no filter evaluation at all, just listing).

Drift self-report: appends return mean ||x - c(x)||^2 of the new batch
vs the training baseline. A ratio near 1 means the stored centroids
still cover the incoming distribution; a ratio well above 1 (the test
pins a 3x-scaled batch) means new vectors land far from every
centroid — cells stop discriminating and ADC quality decays, so
retrain + re-encode (rebuild) is warranted. This is the standard
IVF maintenance signal (mean quantization error drift).

Encode/search math is shared bit-for-bit with q102/q103
(similarity.residual_assign_codes / residual_query_luts), so an
append-built index returns IDENTICAL search results to a fresh
full-corpus encode under the same quantizer —
tests/test_ann_index.py pins that equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from etl_transparencia_sergipe_spark.operators import quantizer_store
from etl_transparencia_sergipe_spark.operators.similarity import (
    _train_sample,
    ivfpq_residual_train,
    residual_assign_codes,
    residual_query_luts,
)


def _quantizer_path(path: str) -> str:
    return path.rstrip("/") + "/_quantizer.parquet"


def _load_quantizer(path: str):
    import numpy as np
    from pathlib import Path

    arrays = quantizer_store._load(Path(_quantizer_path(path)))
    return (np.asarray(arrays["cmat"]), np.asarray(arrays["books"]),
            float(arrays["baseline_resid"][0][0]))


def _encode(df: DataFrame, cmat, books, id_col: str,
            vec_col: str) -> DataFrame:
    """Assign-only encode: [vec_id, cell, c0..c{m-1}, resid_sq] via one
    mapInPandas pass — the exact q102 encode math, no training."""
    m = books.shape[0]
    schema = ("vec_id bigint, cell bigint, "
              + ", ".join(f"c{mm} int" for mm in range(m))
              + ", resid_sq double")

    def enc(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf["cv"]])
            dist, amin, codes = residual_assign_codes(M, cmat, books)
            cols = {"vec_id": pdf["vec_id"], "cell": amin.astype("int64")}
            for mm in range(m):
                cols[f"c{mm}"] = codes[mm]
            # coarse quantization error per vector — the drift signal
            cols["resid_sq"] = dist[np.arange(len(M)), amin]
            yield pd.DataFrame(cols)

    return (df.selectExpr(f"{id_col} AS vec_id", f"{vec_col} AS cv")
            .mapInPandas(enc, schema=schema))


def build_ivfpq_index(corpus: DataFrame, path: str, n_cells: int = 16,
                      m: int = 8, ksub: int = 16, seed: int = 42,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      constants=None, base_epoch: int | None = None) -> dict:
    """Train (or adopt ``constants``) and encode the corpus into a fresh
    index at ``path``. Returns the drift baseline record.

    ``base_epoch`` selects the epoch-partitioned layout
    (``ingest_batch=<base_epoch>/cell=N``) used by the streaming ingest
    sink (streaming/ann_stream.py), whose replays need partition-scoped
    overwrite; the default flat ``cell=N`` layout is unchanged (q106).
    Search reads either tree identically — it prunes on ``cell``
    wherever partition discovery finds it."""
    import numpy as np

    X = _train_sample(corpus, id_col, vec_col, 65536)
    if constants is None:
        cmat, books = ivfpq_residual_train(X, n_cells=n_cells, m=m,
                                           ksub=ksub, seed=seed)
    else:
        cmat, books = constants
    # baseline = mean squared coarse-residual norm of the training
    # sample under these centroids (same sequential math as encode)
    dist, amin, _ = residual_assign_codes(
        np.asarray(X, dtype=np.float64), cmat, books)
    baseline = float(dist[np.arange(len(X)), amin].mean())

    from pathlib import Path

    # encoded rows first — the overwrite clears the directory; the
    # quantizer artifact lands after, and its absence marks a
    # half-built index (loads fail loudly instead of serving stale)
    enc = _encode(corpus, cmat, books, id_col, vec_col).drop("resid_sq")
    if base_epoch is None:
        enc.write.mode("overwrite").partitionBy("cell").parquet(path)
    else:
        (enc.withColumn("ingest_batch", F.lit(int(base_epoch)))
         .write.mode("overwrite")
         .partitionBy("ingest_batch", "cell").parquet(path))
    quantizer_store._save(
        Path(_quantizer_path(path)),
        {"cmat": cmat, "books": books,
         "baseline_resid": np.array([[baseline]])})
    return {"baseline_resid_sq": baseline, "n_cells": int(n_cells)}


def _index_layout(spark: SparkSession, path: str) -> str:
    """'epoch' if the index tree is epoch-partitioned
    (``ingest_batch=*/cell=*``, the streaming-sink layout), else 'flat'
    (``cell=*``, the q106 batch layout)."""
    from etl_transparencia_sergipe_spark.operators.sigstore import _fs

    fs, hpath, jvm = _fs(spark, path.rstrip("/"))
    for status in fs.listStatus(hpath):
        if status.getPath().getName().startswith("ingest_batch="):
            return "epoch"
    return "flat"


def append_ivfpq_index(batch: DataFrame, path: str,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       epoch: int | None = None) -> dict:
    """Assign-only append: encode ``batch`` against the STORED quantizer
    (no retrain, no re-encode of existing rows) and append into the
    cell partitions. Returns the drift self-report:
    {batch_resid_sq, baseline_resid_sq, drift_ratio} — ratio >> 1 says
    the incoming distribution has left the trained centroids and a
    rebuild is warranted.

    Layout guard (round-7 ADVICE): an index built with
    ``base_epoch=...`` is epoch-partitioned (``ingest_batch=N/cell=M``);
    appending the flat ``cell=M`` layout under the same root would mix
    partition depths and every later ``spark.read.parquet(path)`` fails
    with "conflicting directory structures" — corrupting the index. The
    layout is detected from the existing tree: an epoch-partitioned
    index REQUIRES ``epoch`` (the batch lands in its own
    ``ingest_batch=<epoch>`` partition); a flat index REJECTS it.
    """
    from etl_transparencia_sergipe_spark.caching import persist_scoped

    layout = _index_layout(batch.sparkSession, path)
    if layout == "epoch" and epoch is None:
        raise ValueError(
            f"index at {path} is epoch-partitioned (ingest_batch=*); "
            "pass epoch=<n> so the append lands in its own partition "
            "(a flat cell=* append would corrupt the tree)")
    if layout == "flat" and epoch is not None:
        raise ValueError(
            f"index at {path} is flat (cell=*); epoch={epoch} would mix "
            "partition depths — omit epoch for flat indexes")

    cmat, books, baseline = _load_quantizer(path)
    enc = _encode(batch, cmat, books, id_col, vec_col) \
        .transform(persist_scoped)
    try:
        batch_resid = enc.agg(F.avg("resid_sq")).collect()[0][0]
        out = enc.drop("resid_sq")
        if epoch is None:
            out.write.mode("append").partitionBy("cell").parquet(path)
        else:
            (out.withColumn("ingest_batch", F.lit(int(epoch)))
             .write.mode("append")
             .partitionBy("ingest_batch", "cell").parquet(path))
    finally:
        enc.unpersist()
    return {
        "batch_resid_sq": float(batch_resid),
        "baseline_resid_sq": baseline,
        "drift_ratio": float(batch_resid) / baseline,
    }


def compact_ann_index(spark: SparkSession, path: str,
                      upto_epoch: int | None = None) -> dict:
    """Fold ingest epochs of an epoch-partitioned index into the
    base epoch — the LSM compaction posture (operators/sigstore.py
    compact_banded_store) applied to the vector index.

    Streaming appends write ≤ n_cells small files per epoch; after many
    epochs the cell scan pays per-file open cost. Compaction rewrites
    the codes into ``ingest_batch=-1/cell=N`` with ONE file per cell,
    preserving search results bit-identically (codes are immutable —
    this moves rows, it never re-encodes).

    ``upto_epoch`` (round-7 ADVICE, mirrors compact_banded_store): fold
    only epochs STRICTLY BELOW it; epochs >= upto_epoch stay live as
    their own partitions. This is the safe mode to run alongside a
    streaming sink whose checkpoint may replay its most recent epoch:
    a replayed epoch that was already folded into ingest_batch=-1
    would be re-written by the sink's dynamic overwrite and every row
    of that epoch duplicated — and search_ivfpq_index has no distinct,
    so duplicate neighbors consume shortlist/top-k slots silently.
    Pass the stream's last COMMITTED epoch (readable from the
    checkpoint's offsets directory) so anything it can replay is never
    folded. The still-live epochs are carried into the new tree by a
    read+rewrite (they are recent micro-batches, so small), keeping the
    all-or-nothing root swap below intact. Default (None) folds
    everything — correct only between stream runs with a clean
    checkpoint (the original contract).

    Concurrency contract: run between stream runs (availableNow batch
    cycles), never while a sink is writing. Crash
    safety favors LOUD over wrong: the new tree is fully written to
    ``<path>_compact_tmp`` (quantizer artifact included) before a
    root-level two-step rename swap, so a crash leaves either the old
    tree,
    or a missing root with the old tree at ``<path>_compact_old`` —
    searches fail loudly instead of seeing duplicates, and the next
    compact_ann_index call repairs the swap before proceeding. A
    transactional manifest (Iceberg/Delta) is the production upgrade;
    plain parquet + rename keeps the engine dependency-free.

    Returns {"n_rows", "n_files_before", "n_files_after"}.
    """
    from pathlib import Path

    from etl_transparencia_sergipe_spark.operators.sigstore import _fs

    root = path.rstrip("/")
    fs, hpath, jvm = _fs(spark, root)
    HPath = jvm.org.apache.hadoop.fs.Path
    old = HPath(root + "_compact_old")
    # crash repair: a previous compaction died between the two renames
    if not fs.exists(hpath) and fs.exists(old):
        fs.rename(old, hpath)

    def _count_files(p):
        it, n = fs.listFiles(HPath(p), True), 0
        while it.hasNext():
            if it.next().getPath().getName().endswith(".parquet"):
                n += 1
        return n

    n_before = _count_files(root)
    cmat, books, baseline = _load_quantizer(root)
    m = books.shape[0]
    codes = spark.read.parquet(root)
    fold = codes if upto_epoch is None else codes.filter(
        F.col("ingest_batch") < int(upto_epoch))
    tmp = root + "_compact_tmp"
    fs.delete(HPath(tmp), True)
    # one task per cell -> one file per cell dir
    (fold.selectExpr("vec_id", *[f"c{mm}" for mm in range(m)], "cell")
     .repartition(int(cmat.shape[0]), "cell")
     .withColumn("ingest_batch", F.lit(-1))
     .write.partitionBy("ingest_batch", "cell").parquet(tmp))
    if upto_epoch is not None:
        # carry the still-live epochs (>= upto_epoch, replay-reachable)
        # into the new tree unchanged — rewritten rather than moved so
        # the root swap stays all-or-nothing (partition pruning makes
        # this a scan of only those epoch directories)
        live = codes.filter(F.col("ingest_batch") >= int(upto_epoch))
        (live.selectExpr("vec_id", *[f"c{mm}" for mm in range(m)],
                         "ingest_batch", "cell")
         .write.mode("append")
         .partitionBy("ingest_batch", "cell").parquet(tmp))
    import numpy as np

    quantizer_store._save(
        Path(tmp) / "_quantizer.parquet",
        {"cmat": cmat, "books": books,
         "baseline_resid": np.array([[baseline]])})
    n_rows = spark.read.parquet(tmp).count()

    if fs.exists(old):
        fs.delete(old, True)
    fs.rename(hpath, old)
    fs.rename(HPath(tmp), hpath)
    fs.delete(old, True)
    return {"n_rows": int(n_rows), "n_files_before": int(n_before),
            "n_files_after": int(_count_files(root))}


def rebuild_ann_index(corpus: DataFrame, path: str, n_cells: int = 16,
                      m: int = 8, ksub: int = 16, seed: int = 42,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> dict:
    """Act on the drift signal: retrain the quantizer on the CURRENT
    corpus sample, re-encode every vector, and atomically swap the new
    tree in (round-7 VERDICT item 4 — append_ivfpq_index self-reports
    drift > 2 as "retrain warranted"; this is the operation that
    answers it).

    The swap reuses compact_ann_index's two-rename protocol AND its
    marker names (``_compact_tmp`` / ``_compact_old``), so a crash mid-
    rebuild is repaired by the same logic: either the old tree is still
    at the root, or the root is missing and the old tree sits at
    ``_compact_old`` (compact_ann_index and the next rebuild both
    repair that before proceeding). Searches never see a half-rebuilt
    index.

    Layout is preserved: an epoch-partitioned index rebuilds into the
    folded base epoch (``ingest_batch=-1``) — a rebuild re-encodes
    everything, so per-epoch provenance of old batches is spent. Same
    concurrency contract as compaction: run between stream runs; a
    checkpoint that replays an already-re-encoded epoch would duplicate
    its rows.

    Determinism: same corpus + same seed => bit-identical quantizer and
    codes (kmeans init is seeded, the training sample is hash-ordered),
    so an in-distribution rebuild leaves search results unchanged
    (tests/test_ann_index.py pins that).

    Returns {"baseline_resid_sq", "n_cells", "layout"}.
    """
    from pathlib import Path as _P  # noqa: F401 (parity with build)

    from etl_transparencia_sergipe_spark.operators.sigstore import _fs

    spark = corpus.sparkSession
    root = path.rstrip("/")
    fs, hpath, jvm = _fs(spark, root)
    HPath = jvm.org.apache.hadoop.fs.Path
    old = HPath(root + "_compact_old")
    # crash repair: a previous compaction/rebuild died mid-swap
    if not fs.exists(hpath) and fs.exists(old):
        fs.rename(old, hpath)
    layout = _index_layout(spark, root)
    tmp = root + "_compact_tmp"
    fs.delete(HPath(tmp), True)
    report = build_ivfpq_index(
        corpus, tmp, n_cells=n_cells, m=m, ksub=ksub, seed=seed,
        id_col=id_col, vec_col=vec_col,
        base_epoch=-1 if layout == "epoch" else None)
    if fs.exists(old):
        fs.delete(old, True)
    fs.rename(hpath, old)
    fs.rename(HPath(tmp), hpath)
    fs.delete(old, True)
    return {**report, "layout": layout}


def maybe_rebuild_ann_index(spark: SparkSession, index_path: str,
                            drift_path: str, corpus: DataFrame,
                            threshold: float = 2.0, **rebuild_kw) -> dict:
    """The automated maintenance step the drift log feeds: read the
    LATEST drift self-report written by the streaming ingest sink
    (streaming/ann_stream.py) or batch appends, and rebuild the index
    iff ``drift_ratio > threshold``. Run it between stream runs (the
    rebuild concurrency contract). Returns
    {"rebuilt": bool, "drift_ratio": float, ...rebuild report}."""
    last = (spark.read.parquet(drift_path)
            .orderBy(F.desc("batch_id")).limit(1).collect())
    ratio = float(last[0]["drift_ratio"]) if last else 0.0
    if not last or ratio <= threshold:
        return {"rebuilt": False, "drift_ratio": ratio}
    report = rebuild_ann_index(corpus, index_path, **rebuild_kw)
    return {"rebuilt": True, "drift_ratio": ratio, **report}


def search_ivfpq_index(corpus: DataFrame, path: str, k: int = 5,
                       nprobe: int = 4, r: int = 100,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       query_pred: str = "vec_id < 8") -> DataFrame:
    """ADC search over the STORED codes + exact refine (the q103 shape,
    served from the index instead of re-encoding the corpus):

    1. broadcast per-(query, probed cell) residual LUTs;
    2. scan ONLY the probed cell partitions (hive pruning on ``cell``),
       score ADC from the stored codes, keep an r-deep shortlist;
    3. re-score the shortlist's raw vectors exactly (one semi-join into
       the corpus) and return exact-L2 top-k.

    Returns [query_id, neighbor_id, rank, l2sq].
    """
    import numpy as np

    spark = corpus.sparkSession
    cmat, books, _ = _load_quantizer(path)
    m = books.shape[0]
    ksub = books.shape[1]

    qrows = [(row["_id"], row["_v"]) for row in
             corpus.selectExpr(f"{id_col} AS _id", f"{vec_col} AS _v")
             .filter(query_pred).collect()]
    lut_rows = residual_query_luts(qrows, cmat, books, nprobe)
    luts = spark.createDataFrame(
        lut_rows, "query_id bigint, cell bigint, l array<double>")
    probed = sorted({int(c) for _, c, _ in lut_rows})

    idx = spark.read.parquet(path).filter(F.col("cell").isin(probed))
    adc_expr = " + ".join(
        f"element_at(l, {mm * ksub} + c{mm} + 1)" for mm in range(m))
    shortlist_w = W.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc("neighbor_id"))
    shortlist = (
        idx.selectExpr("vec_id AS neighbor_id", "cell",
                       *[f"c{mm}" for mm in range(m)])
        .join(F.broadcast(luts), "cell")
        .filter("query_id != neighbor_id")
        .selectExpr("query_id", "neighbor_id", f"({adc_expr}) AS adc")
        .withColumn("_r", F.row_number().over(shortlist_w))
        .filter(F.col("_r") <= r)
        .select("query_id", "neighbor_id")
    )
    # exact refine: raw vectors only for the r x |Q| shortlist
    qdf = spark.createDataFrame(
        [(int(i), [float(x) for x in np.asarray(v, dtype=np.float64)])
         for i, v in qrows],
        f"query_id bigint, qv array<double>")
    vecs = corpus.selectExpr(f"{id_col} AS neighbor_id",
                             f"{vec_col} AS nv")
    l2 = ("aggregate(zip_with(qv, nv, (a, b) -> CAST((a - b) * (a - b) "
          "AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
    refine_w = W.partitionBy("query_id").orderBy(
        F.asc("l2sq"), F.asc("neighbor_id"))
    return (
        shortlist.join(vecs, "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .selectExpr("query_id", "neighbor_id", f"({l2}) AS l2sq")
        .withColumn("rank", F.row_number().over(refine_w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "l2sq")
    )
