"""Similarity-search queries (J6 / ANN) over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.operators.similarity import (
    cosine_expr_duck,
    cosine_expr_spark,
    cosine_topk,
    cosine_topk_duck,
    ivf_topk,
    ivf_topk_duck,
    lsh_topk,
    lsh_topk_duck,
)
from etl_transparencia_sergipe_spark.plans._helpers import load
from etl_transparencia_sergipe_spark.plans.registry import register


@register(
    "q40_knn_bruteforce",
    oracle=cosine_topk_duck("embeddings", k=5, query_pred="vec_id < 8"),
    doc="J6 brute-force cosine top-k ANN baseline: broadcast query set x "
        "corpus scan, window rank [EXT]",
)
def q40_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, "embeddings", sf_dir)
    return cosine_topk(emb, emb.filter("vec_id < 8"), k=5)


@register(
    "q44_lsh_ann_topk",
    oracle=lsh_topk_duck("embeddings", k=5, n_planes=8),
    doc="J6 sign-random-projection LSH ANN: deterministic hyperplanes -> "
        "bucket join -> top-k within bucket (the 1/2^p candidate-pruning "
        "scale path) [EXT]",
)
def q44_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, "embeddings", sf_dir)
    return lsh_topk(emb, k=5, n_planes=8)


@register(
    "q45_lsh_multiprobe",
    oracle=lsh_topk_duck("embeddings", k=5, n_planes=8, multiprobe=True),
    doc="J6 multi-probe SRP-LSH ANN: probe the exact bucket plus every "
        "1-bit-flip neighbor (p+1 probes) — the recall/cost dial [EXT]",
)
def q45_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, "embeddings", sf_dir)
    return lsh_topk(emb, k=5, n_planes=8, multiprobe=True)


@register(
    "q46_ivf_ann_topk",
    oracle=ivf_topk_duck("embeddings", k=5, n_cells=16, nprobe=4),
    doc="J6 IVF ANN: deterministic coarse centroids -> Voronoi cell "
        "assignment (broadcast + partial-agg argmin) -> search only the "
        "nprobe nearest cells per query (the centroid-partitioned scale "
        "path) [EXT]",
)
def q46_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, "embeddings", sf_dir)
    return ivf_topk(emb, k=5, n_cells=16, nprobe=4)


@register(
    "q41_embedding_label_stats",
    oracle="""
    SELECT label,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(
               sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))),
               6) AS DECIMAL(12,6))) AS DOUBLE) AS sum_norm
    FROM embeddings GROUP BY label
    """,
    doc="vector norm stats per label (array fold, no UDF) [EXT]",
)
def q41_embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, "embeddings", sf_dir)
    norm = F.expr(
        "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * "
        "CAST(x AS DOUBLE)), 0.0D, (acc, v) -> acc + v))"
    )
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.sum(F.round(norm, 6).cast("decimal(12,6)"))
        .cast("double").alias("sum_norm"),
    )


@register(
    "q42_cosine_neardup_pairs",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {cosine_expr_duck('a.embedding', 'b.embedding')} AS cos
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos FROM pairs WHERE cos > 0.4
    """,
    doc="J6 embedding-cosine near-dup pairs, label-blocked (the IVF-style "
        "scale path: candidates only within a coarse bucket), computed as "
        "one Arrow-batched BLAS matmul per block (cosine_block_pairs) — "
        "the self-join + per-pair zip_with fold formulation ran "
        "interpreted lambdas 3x per pair (~650 s for sf1's 20M in-block "
        "pairs; the matmul does it in seconds with identical 6-decimal "
        "hashes) [EXT]",
)
def q42_cosine_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.similarity import (
        cosine_block_pairs,
    )

    emb = load(spark, "embeddings", sf_dir).select(
        "vec_id", "label", "embedding")
    return cosine_block_pairs(emb, "label", threshold=0.4)


def _trained_constants(spark, sf_dir: str, kind: str, spec: dict) -> dict:
    """Artifact-store-backed trained constants (operators/
    quantizer_store.py): parquet-cached per (kind, source-data
    fingerprint, spec), trained on first use — "index build once,
    serve many" (round-5 VERDICT item 7, cold-start parity). Training
    is deterministic (seeded Lloyd over the portable-hash-ordered
    sample) so a cache hit is bit-identical to a retrain; the DuckDB
    oracle twins retrain from scratch every run, so a stale or
    corrupted artifact fails the hash gate instead of passing
    silently."""
    import numpy as np

    from etl_transparencia_sergipe_spark.operators.quantizer_store import (
        get_or_train,
    )
    from etl_transparencia_sergipe_spark.operators.similarity import (
        _train_sample,
        ivfpq_residual_train,
        lloyd_float,
    )

    def trainer() -> dict:
        emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
        X = _train_sample(emb, "vec_id", "embedding", 65536)
        seed = spec["seed"]
        if kind == "kmeans":
            return {"cmat": lloyd_float(X, n_cells=spec["n_cells"],
                                        seed=seed,
                                        max_iter=spec.get("max_iter", 20))}
        dsub = X.shape[1] // spec["m"]
        if kind == "pq":
            return {"books": np.stack([
                lloyd_float(X[:, mm * dsub:(mm + 1) * dsub],
                            n_cells=spec["ksub"], seed=seed)
                for mm in range(spec["m"])])}
        if kind == "ivfpq":
            return {
                "books": np.stack([
                    lloyd_float(X[:, mm * dsub:(mm + 1) * dsub],
                                n_cells=spec["ksub"], seed=seed)
                    for mm in range(spec["m"])]),
                "cmat": lloyd_float(X, n_cells=spec["n_cells"], seed=seed),
            }
        if kind == "ivfpq_residual":
            cmat, books = ivfpq_residual_train(
                X, n_cells=spec["n_cells"], m=spec["m"],
                ksub=spec["ksub"], seed=seed)
            return {"cmat": cmat, "books": books}
        raise ValueError(kind)

    return get_or_train(kind, f"{sf_dir}/embeddings.parquet", spec, trainer)


def _sample_X(con):
    """The shared deterministic training sample: portable-hash-ordered
    rows, fetched through whatever DuckDB connection the caller holds
    (the local gate's, or the generator's own over the driver sf)."""
    import numpy as np

    from etl_transparencia_sergipe_spark.operators.similarity import (
        SAMPLE_HASH,
    )

    h = SAMPLE_HASH.format(id="vec_id")
    rows = con.execute(
        f"SELECT embedding FROM embeddings "
        f"ORDER BY {h}, vec_id LIMIT 65536").fetchall()
    return np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])


def _gen_sql(builder):
    """oracle_gen factory for the trained-ANN family (round-12, r11
    VERDICT item 5): the trained constants are deterministic per (data
    fingerprint, spec), so the DRIVER-facing oracle SQL — which must be
    a static string — can be EMITTED at oracle_sql() time by retraining
    against the driver's own sf0.01 parquet on a private DuckDB
    connection and injecting the constants as literals. At sf0.01 the
    whole table fits inside the 65536-row sample cap, so generation is
    sub-second. Returns None (-> rows-only, the pre-r12 contract) when
    the driver sf dir is absent; ``SPARK_GRAFT_ORACLE_SF_DIR``
    overrides the dir for local driver-mirror testing."""
    def gen() -> str | None:
        import os

        import duckdb

        sf = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                            "/root/testdata/sf0.01")
        path = os.path.join(sf, "embeddings.parquet")
        if not os.path.exists(path):
            return None
        con = duckdb.connect()
        try:
            con.execute(
                f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{path}')")
            return builder(con)
        finally:
            con.close()

    return gen


def _q63_oracle_sql(con) -> str:
    """Literal-constant SQL for q63 (round 5, upgraded from rows-only;
    split into builder + executor round-12 so oracle_gen can publish
    the same SQL to the driver): the quantizer is trained from the SAME
    deterministic spec — DuckDB supplies the hash-ordered sample
    (portable multiplicative hash, ``similarity.SAMPLE_HASH``) and
    ``lloyd_float`` turns it into the identical centroid constants the
    Spark side broadcasts (training is a shared deterministic constant,
    like the SRP hyperplanes the q44/q45 oracles share). The SEARCH —
    cell assignment, probe selection, candidate join, exact re-ranking,
    recall join — is then verified end-to-end in pure DuckDB SQL: the
    trained centroids are injected as literals into the same
    q46-proven ivf_topk_duck SQL, wrapped with the brute-force-exact
    recall join."""
    from etl_transparencia_sergipe_spark.operators.similarity import (
        cosine_topk_duck,
        ivf_topk_duck,
        lloyd_float,
    )

    cent = lloyd_float(_sample_X(con), n_cells=16, seed=42, max_iter=20)
    vals = ", ".join(
        f"({i}, [{', '.join(repr(float(v)) for v in cent[i])}]::DOUBLE[])"
        for i in range(len(cent)))
    cent_sql = f"SELECT * FROM (VALUES {vals}) AS t(cell, cvec)"
    ann_sql = ivf_topk_duck("embeddings", k=5, n_cells=16, nprobe=4,
                            cent_sql=cent_sql)
    exact_sql = cosine_topk_duck("embeddings", k=5)
    return f"""
        WITH ann AS ({ann_sql}),
             exact AS (SELECT query_id, neighbor_id FROM ({exact_sql}))
        SELECT ann.query_id,
               CAST(COUNT(*) AS BIGINT) AS n_neighbors,
               CAST(SUM(CASE WHEN e.neighbor_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS DOUBLE) / 5.0
                   AS recall_at_5
        FROM ann LEFT JOIN exact e
          ON e.query_id = ann.query_id
         AND e.neighbor_id = ann.neighbor_id
        GROUP BY ann.query_id ORDER BY ann.query_id
    """


def _q63_oracle(con):
    return con.execute(_q63_oracle_sql(con)).fetchdf()


@register(
    "q63_ivf_trained_topk",
    # training's iteration count and RNG init aren't SQL-expressible, so
    # there is no pure-SQL driver oracle; locally the oracle_py hook
    # verifies the full search plan in DuckDB SQL with the trained
    # centroids injected as literals (_q63_oracle above). Round-12: the
    # same literal-constant SQL is now PUBLISHED to the driver via
    # oracle_gen — trained against the driver's own sf0.01 parquet at
    # oracle_sql() time, upgrading the driver row from rows-only to a
    # full hash check (r11 VERDICT item 5)
    oracle=None,
    oracle_py=_q63_oracle,
    oracle_gen=_gen_sql(_q63_oracle_sql),
    doc="J6 IVF ANN with a TRAINED coarse quantizer: seeded numpy Lloyd "
        "over a bounded portable-hash-ordered sample (FAISS posture; "
        "reference k-means precedent data_science.ipynb:99) learns "
        "balanced Voronoi centroids, then the exact same broadcast "
        "cell-search plan as the oracle-checked q46 runs over them. "
        "Output self-reports recall@5 against the exact brute-force "
        "top-5 (a semi-join inside the same plan), and the whole search "
        "is hash-verified against a literal-centroid DuckDB twin [EXT]",
)
def q63_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_trained,
    )

    emb = load(spark, "embeddings", sf_dir)
    consts = _trained_constants(spark, sf_dir, "kmeans",
                                {"n_cells": 16, "seed": 42, "max_iter": 20})
    ann = ivf_topk_trained(emb, k=5, n_cells=16, nprobe=4, seed=42,
                           cmat=consts["cmat"])
    exact = cosine_topk(emb, emb.filter("vec_id < 8"), k=5).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit"))
    # single pass over the ANN result: flag each neighbor via a broadcast
    # left join against the (tiny) exact top-5, then one aggregate —
    # a separate hits/totals branch pair would execute the entire IVF
    # search subplan twice (audited: exchanges 18 -> 10)
    return (
        ann.join(F.broadcast(exact), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_neighbors"),
             (F.sum(F.coalesce("hit", F.lit(0))) / F.lit(5.0))
             .alias("recall_at_5"))
        .orderBy("query_id")
    )


@register(
    "q69_embedding_dim_stats",
    oracle="""
    WITH d AS (
        SELECT generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    )
    SELECT dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(v) AS vmin,
           MAX(v) AS vmax,
           CAST(SUM(CAST(floor(v * 1000000) AS BIGINT)) AS DOUBLE)
               / (COUNT(*) * 1000000.0) AS vmean_q6,
           (MAX(v) - MIN(v)) / 255.0 AS int8_scale
    FROM d GROUP BY dim
    """,
    doc="per-dimension embedding stats + int8 scalar-quantization scales "
        "[EXT]: posexplode the vector column, partial-agg min/max and a "
        "1e-6-quantized mean per dimension, plus the (max-min)/255 scale "
        "an int8 compression pass ships with the quantized vectors. The "
        "mean sums floor(v*1e6) as BIGINT — floor of an identical double "
        "is bit-deterministic cross-engine (unlike rounding a double to "
        "a decimal scale, which hits Spark's shortest-repr vs DuckDB's "
        "binary rounding at half-points — this query found one such case "
        "at DECIMAL(28,12)). Map-side combine collapses the corpus x dim "
        "explosion to n_dims rows before the shuffle — same shape at "
        "100 TB.",
)
def q69_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, "embeddings", sf_dir)
    d = emb.selectExpr(
        "posexplode(embedding) AS (dim, v0)"
    ).selectExpr("dim", "CAST(v0 AS DOUBLE) AS v")
    return d.groupBy("dim").agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        (F.sum(F.floor(F.col("v") * 1000000).cast("bigint")).cast("double")
         / (F.count("*") * F.lit(1000000.0))).alias("vmean_q6"),
        ((F.max("v") - F.min("v")) / F.lit(255.0)).alias("int8_scale"),
    )


# ---------------------------------------------------------------------------
# round-4 extension: SemDeDup-style semantic dedup over SRP buckets
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU = 0.4
_SEMDEDUP_PLANES = 8


def _semantic_dedup_oracle() -> str:
    from etl_transparencia_sergipe_spark.operators.similarity import (
        hyperplanes,
        srp_bucket_duck,
    )

    planes = hyperplanes(_SEMDEDUP_PLANES)
    cos = cosine_expr_duck("a.embedding", "b.embedding")
    return f"""
    WITH e AS (
        SELECT vec_id, label, embedding,
               {srp_bucket_duck('embedding', planes)} AS bucket
        FROM embeddings
    ), pairs AS (
        SELECT b.vec_id AS id_b
        FROM e a JOIN e b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE {cos} > {_SEMDEDUP_TAU}
    ), removed AS (SELECT DISTINCT id_b FROM pairs)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN r.id_b IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed,
           CAST(SUM(CASE WHEN r.id_b IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM e LEFT JOIN removed r ON e.vec_id = r.id_b
    GROUP BY label ORDER BY label
    """


@register(
    "q87_semantic_dedup",
    oracle=_semantic_dedup_oracle(),
    doc="J6/P10 SemDeDup-style semantic deduplication (Abbas et al. 2023, "
        "arXiv:2303.09540): embeddings are coarsely clustered — here by "
        "deterministic SRP bucket, the oracle-reproducible stand-in for "
        "the paper's k-means cells (q63 holds the trained-KMeans twin) — "
        "and within each cluster every pair above the cosine threshold "
        "marks the higher vec_id as a semantic duplicate; the min-id "
        "representative survives. Per-label keep/remove counts come back. "
        "Shuffle shape at 100 TB: one bucket-keyed exchange (vectors "
        "partition by bucket, never pairwise), the per-bucket pair scan "
        "runs as one Arrow/numpy task per bucket (cosine_block_pairs, "
        "bounded by max_block_rows), and the removed-id frame is "
        "~n_dups x 8 bytes — the corpus-proportional cost is exactly one "
        "shuffle plus the in-bucket matmul, the same sharding production "
        "vector dedup uses. Bucket count is 2^n_planes and must GROW "
        "with the corpus (p ~ log2(n/target_block); in-bucket pair work "
        "is O(n^2/2^p)) — the query pins p=8 for oracle parity at test "
        "scale, max_block_rows fails loudly rather than letting an "
        "undersized p go quadratic (test_similarity.py), and the "
        "trained-KMeans IVF cells (q63) are the balanced-partition "
        "production quantizer [EXT].",
)
def q87_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.similarity import (
        cosine_block_pairs,
        hyperplanes,
        srp_bucket_spark,
    )

    planes = hyperplanes(_SEMDEDUP_PLANES)
    emb = load(spark, "embeddings", sf_dir).selectExpr(
        "vec_id", "label", "embedding",
        f"{srp_bucket_spark('embedding', planes)} AS bucket")
    removed = (
        cosine_block_pairs(emb, "bucket", threshold=_SEMDEDUP_TAU)
        .select(F.col("id_b").alias("vec_id")).distinct()
        .withColumn("is_removed", F.lit(1)))
    return (
        emb.select("vec_id", "label")
        .join(removed, "vec_id", "left")
        .groupBy("label")
        .agg(F.count("*").cast("bigint").alias("n_vecs"),
             F.sum(F.coalesce("is_removed", F.lit(0))).cast("bigint")
             .alias("n_removed"),
             F.sum(F.when(F.col("is_removed").isNull(), 1).otherwise(0))
             .cast("bigint").alias("n_kept"))
        .orderBy("label")
    )


def _pq_books(con):
    """Shared q98-spec PQ codebooks (m=8 x ksub=16, seed 42) from the
    deterministic sample — pq_codebooks' exact procedure."""
    import numpy as np

    from etl_transparencia_sergipe_spark.operators.similarity import (
        lloyd_float,
    )

    X = _sample_X(con)
    m, ksub = 8, 16
    dsub = X.shape[1] // m
    return np.stack([
        lloyd_float(X[:, mm * dsub:(mm + 1) * dsub], n_cells=ksub,
                    seed=42)
        for mm in range(m)
    ])


def _q98_oracle_sql(con) -> str:
    """DuckDB twin for q98: codebooks trained from the shared
    deterministic spec (portable-hash-ordered sample + seeded per-
    subspace numpy Lloyd — pq_codebooks' exact procedure) are injected
    as literals; ENCODE, the ADC lookup-table build, the compressed-
    domain top-k and the exact-L2 recall join are then verified
    end-to-end in pure SQL (pq_topk_duck)."""
    from etl_transparencia_sergipe_spark.operators.similarity import (
        pq_topk_duck,
    )

    return pq_topk_duck("embeddings", _pq_books(con), k=5)


def _q98_oracle(con):
    return con.execute(_q98_oracle_sql(con)).fetchdf()


@register(
    "q98_pq_ann_topk",
    # codebook training (seeded numpy Lloyd per subspace) is not
    # SQL-expressible — same driver contract as q63: rows-only at the
    # driver, full hash verification against the literal-codebook
    # DuckDB twin in the local gate
    oracle=None,
    oracle_py=_q98_oracle,
    oracle_gen=_gen_sql(_q98_oracle_sql),
    doc="J6 PRODUCT-QUANTIZATION ANN [EXT]: per-subspace k-means "
        "codebooks (m=8 x ksub=16, trained like q63's coarse quantizer "
        "on the bounded portable-hash sample) compress each 64-dim "
        "vector to 8 codes; search ranks the corpus by asymmetric "
        "distance — the query's lookup table indexed by each stored "
        "code, pure codegen element_at + adds over the compressed "
        "index, raw vectors never scanned (the 64x-smaller-index path "
        "a 100 TB embedding corpus actually searches; composable with "
        "q63's IVF cells for full IVFPQ). Output self-reports recall "
        "per neighbor vs the exact L2 top-5 (hit column) and carries "
        "floor(adc*1e6) so every compressed distance is hash-verified "
        "cross-engine.",
)
def q98_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.similarity import (
        l2_topk,
        pq_topk,
    )

    emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    consts = _trained_constants(spark, sf_dir, "pq",
                                {"m": 8, "ksub": 16, "seed": 42})
    ann = pq_topk(emb, k=5, m=8, ksub=16, books=consts["books"])
    exact = l2_topk(emb, k=5).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit0"))
    return (
        ann.join(F.broadcast(exact), ["query_id", "neighbor_id"], "left")
        .select("query_id", "neighbor_id", "rank",
                F.expr("CAST(floor(adc * 1000000) AS BIGINT)")
                .alias("adc_q6"),
                F.coalesce("hit0", F.lit(0)).cast("int").alias("hit"))
    )


def _q99_oracle_sql(con) -> str:
    """Literal-codebook DuckDB twin of the PQ shortlist + exact re-rank
    (same shared-training posture as q98/_q63_oracle)."""
    from etl_transparencia_sergipe_spark.operators.similarity import (
        pq_rerank_duck,
    )

    return pq_rerank_duck("embeddings", _pq_books(con), k=5, r=50)


def _q99_oracle(con):
    return con.execute(_q99_oracle_sql(con)).fetchdf()


@register(
    "q99_pq_rerank_topk",
    oracle=None,  # trained codebooks: q63/q98 driver contract;
    # round-12: literal-constant SQL published via oracle_gen
    oracle_py=_q99_oracle,
    oracle_gen=_gen_sql(_q99_oracle_sql),
    doc="J6 PQ + EXACT RE-RANK [EXT]: q98's compressed-domain ADC scan "
        "shortlists the top-50 per query, then ONLY those 50 x |Q| rows' "
        "raw vectors are read back (broadcast semi-join over the corpus "
        "scan) and exactly re-scored with L2 — the FAISS refine posture. "
        "Measured recall@5 vs exact: 1.0 at sf1 / 0.825 at sf0.01 "
        "(ADC-only q98: 0.625 / 0.25) — the recall/cost dial recorded "
        "as data. At 100 TB the raw-vector fetch is candidate-sized, "
        "never corpus-sized; hit column self-reports per-neighbor "
        "recall and floor(l2*1e6) hash-verifies every re-ranked "
        "distance cross-engine.",
)
def q99_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.similarity import (
        l2_topk,
        pq_rerank_topk,
    )

    emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    consts = _trained_constants(spark, sf_dir, "pq",
                                {"m": 8, "ksub": 16, "seed": 42})
    ann = pq_rerank_topk(emb, k=5, r=50, m=8, ksub=16,
                         books=consts["books"])
    exact = l2_topk(emb, k=5).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit0"))
    return (
        ann.join(F.broadcast(exact), ["query_id", "neighbor_id"], "left")
        .select("query_id", "neighbor_id", "rank",
                F.expr("CAST(floor(l2 * 1000000) AS BIGINT)")
                .alias("l2_q6"),
                F.coalesce("hit0", F.lit(0)).cast("int").alias("hit"))
    )


def _q101_oracle_sql(con) -> str:
    """Literal-constant DuckDB twin for IVFPQ: the coarse quantizer
    (full-dim Lloyd, q63's spec) and the PQ codebooks (per-subspace
    Lloyd, q98's spec) are both trained from the shared deterministic
    sample; assignment, probe selection, encode, pruned ADC ranking
    and the exact-L2 recall join are verified in SQL."""
    from etl_transparencia_sergipe_spark.operators.similarity import (
        ivfpq_topk_duck,
        lloyd_float,
    )

    cent = lloyd_float(_sample_X(con), n_cells=16, seed=42, max_iter=20)
    return ivfpq_topk_duck("embeddings", cent, _pq_books(con), k=5,
                           n_cells=16, nprobe=4)


def _q101_oracle(con):
    return con.execute(_q101_oracle_sql(con)).fetchdf()


@register(
    "q101_ivfpq_topk",
    oracle=None,  # trained quantizer + codebooks: the q63/q98
    # contract; round-12: literal-constant SQL published via oracle_gen
    oracle_py=_q101_oracle,
    oracle_gen=_gen_sql(_q101_oracle_sql),
    doc="J6 IVFPQ — IVF x PQ COMPOSED (the FAISS IVFADC architecture, "
        "non-residual variant) [EXT]: the trained coarse quantizer "
        "prunes to nprobe=4 of 16 cells per query and candidates are "
        "ranked by PQ asymmetric distance over their 8-int codes. ONE "
        "combined mapInPandas pass emits cell assignment AND codes, so "
        "the raw-vector column is scanned exactly once and there is no "
        "corpus-sized join; search reads nprobe/n_cells of the CODES "
        "(8 ints/vector). This is the 100 TB embedding-search plan: "
        "storage ∝ codes, probe cost ∝ pruned code scan, exact data "
        "touched = 0 rows. hit column self-reports recall vs exact L2; "
        "full search hash-verified against the literal-constant DuckDB "
        "twin.",
)
def q101_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.similarity import (
        ivfpq_topk,
        l2_topk,
    )

    emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    consts = _trained_constants(
        spark, sf_dir, "ivfpq",
        {"n_cells": 16, "m": 8, "ksub": 16, "seed": 42})
    ann = ivfpq_topk(emb, k=5, n_cells=16, nprobe=4, m=8, ksub=16,
                     constants=(consts["cmat"], consts["books"]))
    exact = l2_topk(emb, k=5).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit0"))
    return (
        ann.join(F.broadcast(exact), ["query_id", "neighbor_id"], "left")
        .select("query_id", "neighbor_id", "rank",
                F.expr("CAST(floor(adc * 1000000) AS BIGINT)")
                .alias("adc_q6"),
                F.coalesce("hit0", F.lit(0)).cast("int").alias("hit"))
    )


# residual-IVFPQ spec shared by the Spark builder and the DuckDB twin
# (nprobe chosen by the recorded recall curve — see BASELINE.md ANN
# recall section and tools/ann_recall.py)
_Q102_SPEC = dict(k=5, n_cells=16, nprobe=4, m=8, ksub=16)


def _q102_oracle_sql(con) -> str:
    """Literal-constant DuckDB twin for RESIDUAL IVFPQ: centroids and
    residual codebooks trained by the shared deterministic procedure
    (``ivfpq_residual_train`` over the portable-hash-ordered sample —
    lloyd_float's trajectory independently pinned by
    tests/test_lloyd_independent.py); L2 assignment, probe selection,
    residual encode, per-(query, cell) LUTs, pruned ADC ranking and
    the exact-L2 recall join verified in SQL."""
    from etl_transparencia_sergipe_spark.operators.similarity import (
        ivfpq_residual_duck,
        ivfpq_residual_train,
    )

    s = _Q102_SPEC
    cmat, books = ivfpq_residual_train(
        _sample_X(con), n_cells=s["n_cells"], m=s["m"], ksub=s["ksub"],
        seed=42)
    return ivfpq_residual_duck("embeddings", cmat, books, k=s["k"],
                               n_cells=s["n_cells"], nprobe=s["nprobe"])


def _q102_oracle(con):
    return con.execute(_q102_oracle_sql(con)).fetchdf()


@register(
    "q102_ivfpq_residual_topk",
    oracle=None,  # trained quantizer + codebooks: the q63/q98
    # contract; round-12: literal-constant SQL published via oracle_gen
    oracle_py=_q102_oracle,
    oracle_gen=_gen_sql(_q102_oracle_sql),
    doc="J6 RESIDUAL IVFPQ — the actual FAISS IVFADC default "
        "(by_residual=True) [EXT]: PQ codebooks quantize each vector's "
        "RESIDUAL x - c(x) against its L2-assigned coarse cell, and "
        "search builds a per-(query, probed-cell) LUT from q - c so "
        "adc = ||(q-c) - r̂(x)||^2 ~ ||q-x||^2 — the centroid drops "
        "out exactly, unlike q101's single global LUT. Residuals have "
        "far smaller spread than raw vectors, so the same 8x16 code "
        "budget quantizes much finer: measured recall@5 vs exact L2 "
        "rises from q101's 0.675 to >=0.9 at sf1 (the round-6 target; "
        "curve in BASELINE.md). Same 100 TB shape as q101: one "
        "raw-vector scan (combined assign+encode mapInPandas), LUTs "
        "|Q| x nprobe tiny rows broadcast, search reads "
        "nprobe/n_cells of the 8-int codes. hit column self-reports "
        "per-neighbor recall; full search hash-verified against the "
        "literal-constant DuckDB twin.",
)
def q102_ivfpq_residual_topk(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.similarity import (
        ivfpq_residual_topk,
        l2_topk,
    )

    emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    s = _Q102_SPEC
    consts = _trained_constants(
        spark, sf_dir, "ivfpq_residual",
        {"n_cells": s["n_cells"], "m": s["m"], "ksub": s["ksub"],
         "seed": 42})
    ann = ivfpq_residual_topk(emb, k=s["k"], n_cells=s["n_cells"],
                              nprobe=s["nprobe"], m=s["m"],
                              ksub=s["ksub"],
                              constants=(consts["cmat"], consts["books"]))
    exact = l2_topk(emb, k=s["k"]).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit0"))
    return (
        ann.join(F.broadcast(exact), ["query_id", "neighbor_id"], "left")
        .select("query_id", "neighbor_id", "rank",
                F.expr("CAST(floor(adc * 1000000) AS BIGINT)")
                .alias("adc_q6"),
                F.coalesce("hit0", F.lit(0)).cast("int").alias("hit"))
    )


# refine spec: nprobe=6 is where measured cell coverage reaches 1.000
# at sf1, and r=100 is sized to the fixtures' near-tie multiplicity —
# at sf10 every source doc has ~100 near-copies inside the quantizer's
# noise band, so an r=50 shortlist holds an ADC-noise-chosen half of
# the tie set and refined recall@5 drops to 0.400; r=100 restores
# 1.000 at every measured scale (sweep in BASELINE.md). The honest
# sizing rule at 100 TB: r >= the expected near-duplicate multiplicity
# at the quantizer's distance resolution, NOT a corpus-size function.
_Q103_SPEC = dict(k=5, r=100, n_cells=16, nprobe=6, m=8, ksub=16)


def _q103_oracle_sql(con) -> str:
    """Literal-constant DuckDB twin for residual IVFADC + exact refine:
    shared deterministic training (``ivfpq_residual_train``), then the
    full search — assignment, probes, residual encode, LUTs, ADC
    shortlist, exact-L2 rescore and re-rank — verified in SQL."""
    from etl_transparencia_sergipe_spark.operators.similarity import (
        ivfpq_residual_refine_duck,
        ivfpq_residual_train,
    )

    s = _Q103_SPEC
    cmat, books = ivfpq_residual_train(
        _sample_X(con), n_cells=s["n_cells"], m=s["m"], ksub=s["ksub"],
        seed=42)
    return ivfpq_residual_refine_duck(
        "embeddings", cmat, books, k=s["k"], r=s["r"],
        n_cells=s["n_cells"], nprobe=s["nprobe"])


def _q103_oracle(con):
    return con.execute(_q103_oracle_sql(con)).fetchdf()


@register(
    "q103_ivfpq_residual_refine_topk",
    oracle=None,  # trained quantizer + codebooks: the q63/q98
    # contract; round-12: literal-constant SQL published via oracle_gen
    oracle_py=_q103_oracle,
    oracle_gen=_gen_sql(_q103_oracle_sql),
    doc="J6 residual IVFADC + exact refine — FAISS IVF16,PQ8 + "
        "RefineFlat [EXT]: the residual compressed index keeps a "
        "top-r=50 ADC shortlist per query over nprobe=6 probed cells, "
        "then raw vectors are read for ONLY the shortlist and "
        "re-ranked with exact L2. This is the query that meets the "
        "round-6 recall target: measured recall@5 at sf1 = 1.000 "
        "(>=0.9 target) because refined recall equals cell coverage, "
        "which reaches 1.000 at nprobe>=6 — while ADC-only ranking "
        "(q101/q102) plateaus at ~0.5-0.7 on this corpus's near-tie "
        "neighbor structure (curve in BASELINE.md). 100 TB shape: one "
        "raw-vector scan (assign+encode), ADC reads nprobe/n_cells of "
        "the 8-int codes, raw vectors re-read for r x |Q| rows via "
        "broadcast semi-join. hit column self-reports per-neighbor "
        "recall; full pipeline hash-verified against the "
        "literal-constant DuckDB twin.",
)
def q103_ivfpq_residual_refine_topk(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.similarity import (
        ivfpq_residual_refine_topk,
        l2_topk,
    )

    emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    s = _Q103_SPEC
    consts = _trained_constants(
        spark, sf_dir, "ivfpq_residual",
        {"n_cells": s["n_cells"], "m": s["m"], "ksub": s["ksub"],
         "seed": 42})
    ann = ivfpq_residual_refine_topk(
        emb, k=s["k"], r=s["r"], n_cells=s["n_cells"],
        nprobe=s["nprobe"], m=s["m"], ksub=s["ksub"],
        constants=(consts["cmat"], consts["books"]))
    exact = l2_topk(emb, k=s["k"]).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit0"))
    return (
        ann.join(F.broadcast(exact), ["query_id", "neighbor_id"], "left")
        .select("query_id", "neighbor_id", "rank",
                F.expr("CAST(floor(l2 * 1000000) AS BIGINT)")
                .alias("l2_q6"),
                F.coalesce("hit0", F.lit(0)).cast("int").alias("hit"))
    )


# ---------------------------------------------------------------------------
# q106: the q103 search SERVED FROM the incremental on-disk index
# (operators/ann_index.py, round-7 VERDICT item 8). The index is built
# ONCE on a base split (7/8 of the corpus by ``vec_id % 8``), the last
# eighth is ASSIGN-ONLY appended against the stored quantizer (no
# retrain, no re-encode of existing rows — the q79/q81 incremental
# posture applied to IVF), and every search after that reads stored
# codes with hive cell-partition pruning. The quantizer is therefore
# trained WITHOUT ever seeing the appended batch — exactly the
# grown-corpus serving scenario — and the drift self-report of that
# append is persisted in the index's _meta.json.
_Q106_SPEC = dict(k=5, r=100, n_cells=16, nprobe=6, m=8, ksub=16,
                  split_mod=8)


def _served_incremental_index(spark: SparkSession, sf_dir: str):
    """Build-once/serve-many incremental index for q106, keyed like the
    quantizer store: (source fingerprint, spec). A hit skips build AND
    append — the query then only pays the pruned-code search. _meta.json
    is written last (atomic rename), so a crashed build never serves."""
    import hashlib
    import json
    import os

    from etl_transparencia_sergipe_spark.operators import quantizer_store
    from etl_transparencia_sergipe_spark.operators.ann_index import (
        append_ivfpq_index,
        build_ivfpq_index,
    )

    s = _Q106_SPEC
    src = f"{sf_dir}/embeddings.parquet"
    key = hashlib.sha256(json.dumps(
        [quantizer_store.STORE_VERSION, "ann_index_v1",
         quantizer_store._fingerprint(src),
         {k: s[k] for k in ("n_cells", "m", "ksub", "split_mod")}],
        sort_keys=True, default=str).encode()).hexdigest()[:24]
    root = quantizer_store._store_dir().parent / "ann_index"
    path = root / key
    meta = path / "_meta.json"
    if meta.exists():
        return str(path), json.loads(meta.read_text())

    emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % s["split_mod"] < s["split_mod"] - 1)
    batch = emb.filter(F.col("vec_id") % s["split_mod"] == s["split_mod"] - 1)
    root.mkdir(parents=True, exist_ok=True)
    build_ivfpq_index(base, str(path), n_cells=s["n_cells"], m=s["m"],
                      ksub=s["ksub"], seed=42)
    report = append_ivfpq_index(batch, str(path))
    tmp = path / "_meta.json.tmp"
    tmp.write_text(json.dumps(report))
    os.replace(tmp, meta)
    return str(path), report


def _q106_oracle(con):
    """DuckDB twin: retrain the quantizer from the BASE split's
    deterministic sample (the appended eighth never reaches training —
    mirroring the index build), then run the full refine search over
    the WHOLE corpus in SQL. Matching hashes prove the assign-only
    append + stored-code search path end-to-end: grown index ==
    full-corpus encode == literal-constant SQL."""
    import numpy as np

    from etl_transparencia_sergipe_spark.operators.similarity import (
        SAMPLE_HASH,
        ivfpq_residual_refine_duck,
        ivfpq_residual_train,
    )

    s = _Q106_SPEC
    h = SAMPLE_HASH.format(id="vec_id")
    rows = con.execute(
        f"SELECT embedding FROM embeddings "
        f"WHERE vec_id % {s['split_mod']} < {s['split_mod'] - 1} "
        f"ORDER BY {h}, vec_id LIMIT 65536").fetchall()
    X = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    cmat, books = ivfpq_residual_train(
        X, n_cells=s["n_cells"], m=s["m"], ksub=s["ksub"], seed=42)
    return con.execute(
        ivfpq_residual_refine_duck(
            "embeddings", cmat, books, k=s["k"], r=s["r"],
            n_cells=s["n_cells"], nprobe=s["nprobe"])).fetchdf()


@register(
    "q106_incremental_ann_index",
    oracle=None,  # trained quantizer: the q63/q98/q103 driver contract
    oracle_py=_q106_oracle,
    doc="J6 incremental ANN serving (round-7): residual IVFADC + exact "
        "refine answered from the PERSISTED index — quantizer trained "
        "once on the base 7/8 split, the last eighth assign-only "
        "appended (operators/ann_index.py; drift self-report persisted "
        "in _meta.json), search scans ONLY the nprobe/n_cells hive "
        "cell partitions of stored 8-int codes and re-reads raw "
        "vectors for the r x |Q| shortlist. 100 TB shape: index "
        "maintenance is O(batch) per append exactly like q79/q81 "
        "dedup, and a serve-time query never touches raw vectors "
        "outside the shortlist. Hash-verified against a "
        "literal-constant DuckDB twin whose quantizer retrains from "
        "the base split only — the append path must be bit-identical "
        "to a full re-encode for the hashes to match "
        "(tests/test_ann_index.py pins the same equality).",
)
def q106_incremental_ann_index(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.ann_index import (
        search_ivfpq_index,
    )
    from etl_transparencia_sergipe_spark.operators.similarity import l2_topk

    emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    s = _Q106_SPEC
    path, _report = _served_incremental_index(spark, sf_dir)
    ann = search_ivfpq_index(emb, path, k=s["k"], nprobe=s["nprobe"],
                             r=s["r"])
    exact = l2_topk(emb, k=s["k"]).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit0"))
    return (
        ann.join(F.broadcast(exact), ["query_id", "neighbor_id"], "left")
        .select("query_id", "neighbor_id", "rank",
                F.expr("CAST(floor(l2sq * 1000000) AS BIGINT)")
                .alias("l2_q6"),
                F.coalesce("hit0", F.lit(0)).cast("int").alias("hit"))
    )
