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


def append_ivfpq_index(batch: DataFrame, path: str,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> dict:
    """Assign-only append: encode ``batch`` against the STORED quantizer
    (no retrain, no re-encode of existing rows) and append into the
    cell partitions. Returns the drift self-report:
    {batch_resid_sq, baseline_resid_sq, drift_ratio} — ratio >> 1 says
    the incoming distribution has left the trained centroids and a
    rebuild is warranted."""
    from etl_transparencia_sergipe_spark.caching import persist_scoped

    cmat, books, baseline = _load_quantizer(path)
    enc = _encode(batch, cmat, books, id_col, vec_col) \
        .transform(persist_scoped)
    batch_resid = enc.agg(F.avg("resid_sq")).collect()[0][0]
    (enc.drop("resid_sq")
     .write.mode("append").partitionBy("cell").parquet(path))
    return {
        "batch_resid_sq": float(batch_resid),
        "baseline_resid_sq": baseline,
        "drift_ratio": float(batch_resid) / baseline,
    }


def compact_ann_index(spark: SparkSession, path: str) -> dict:
    """Fold every ingest epoch of an epoch-partitioned index into the
    base epoch — the LSM compaction posture (operators/sigstore.py
    compact_banded_store) applied to the vector index.

    Streaming appends write ≤ n_cells small files per epoch; after many
    epochs the cell scan pays per-file open cost. Compaction rewrites
    the codes into ``ingest_batch=-1/cell=N`` with ONE file per cell,
    preserving search results bit-identically (codes are immutable —
    this moves rows, it never re-encodes).

    Concurrency contract: run between stream runs (availableNow batch
    cycles), never while a sink is writing — folding an epoch that a
    crashed stream later replays would duplicate its rows. Crash
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
    tmp = root + "_compact_tmp"
    fs.delete(HPath(tmp), True)
    # one task per cell -> one file per cell dir
    (codes.selectExpr("vec_id", *[f"c{mm}" for mm in range(m)], "cell")
     .repartition(int(cmat.shape[0]), "cell")
     .withColumn("ingest_batch", F.lit(-1))
     .write.partitionBy("ingest_batch", "cell").parquet(tmp))
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
