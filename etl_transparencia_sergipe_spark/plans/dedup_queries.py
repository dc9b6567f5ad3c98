"""Deduplication queries (P9/P10, J6) over the documents table — each tier
of operators/dedup.py with its full DuckDB oracle (cross-engine md5 hashing
makes even MinHash/SimHash exactly reproducible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_lsh_pairs_duck,
    shingles_duck,
    shingles_spark,
    simhash_pairs,
    simhash_pairs_duck,
)
from etl_transparencia_sergipe_spark.plans._helpers import load
from etl_transparencia_sergipe_spark.plans.registry import register


@register(
    "q30_exact_dedup",
    oracle="""
    SELECT lang, COUNT(*) AS n_unique_texts
    FROM (SELECT DISTINCT lang, text FROM documents)
    GROUP BY lang
    """,
    doc="P9 exact dedup (hash-groupBy distinct) on document text",
)
def q30_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return (
        docs.select("lang", "text").dropDuplicates(["lang", "text"])
        .groupBy("lang").agg(F.count("*").alias("n_unique_texts"))
    )


@register(
    "q31_minhash_lsh_dedup",
    oracle=f"""
    WITH pairs AS ({minhash_lsh_pairs_duck('documents', 'doc_id', 'text',
                                           k=16, bands=4, threshold=0.4)})
    SELECT COUNT(*) AS n_pairs,
           COUNT(DISTINCT id_a) AS n_left,
           CAST(SUM(CAST(round(jaccard, 6) AS DECIMAL(10,6))) AS DOUBLE)
               AS sum_jaccard
    FROM pairs
    """,
    doc="P10 MinHash+LSH near-dup (shingle->minhash->band->bucket-join->"
        "Jaccard verify), k=16 b=4, threshold 0.4 [EXT]",
)
def q31_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    pairs = minhash_lsh_pairs(docs, "doc_id", "text",
                              k=16, bands=4, threshold=0.4)
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("id_a").alias("n_left"),
        F.sum(F.round("jaccard", 6).cast("decimal(10,6)"))
        .cast("double").alias("sum_jaccard"),
    )


@register(
    "q32_simhash_dedup",
    oracle=f"""
    WITH pairs AS ({simhash_pairs_duck('documents', 'doc_id', 'text',
                                       max_hamming=8)})
    SELECT COUNT(*) AS n_pairs,
           COALESCE(CAST(SUM(hamming) AS BIGINT), 0) AS sum_hamming
    FROM pairs
    """,
    doc="P10 SimHash near-dup (32-bit fingerprint, 8-bit band blocking, "
        "Hamming verify <= 8) [EXT]",
)
def q32_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    pairs = simhash_pairs(docs, "doc_id", "text", max_hamming=8)
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.coalesce(F.sum("hamming"), F.lit(0)).cast("bigint")
        .alias("sum_hamming"),
    )


@register(
    "q38_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({minhash_lsh_pairs_duck('documents', 'doc_id',
                                                     'text', k=16, bands=4,
                                                     threshold=0.4)}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach AS (
        SELECT src AS node, src AS m FROM edges
        UNION
        SELECT src AS node, dst AS m FROM edges
        UNION
        SELECT r.node, e.dst AS m
        FROM reach r JOIN edges e ON r.m = e.src
    ),
    cc AS (SELECT node, MIN(m) AS component FROM reach GROUP BY node)
    SELECT component, COUNT(*) AS n_members, MAX(node) AS max_member
    FROM cc GROUP BY component
    """,
    doc="near-dup pairs -> connected components -> dedup clusters "
        "(iterative min-label propagation; oracle = recursive transitive "
        "closure) [EXT]",
)
def q38_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.components import (
        dedup_clusters,
    )

    docs = load(spark, "documents", sf_dir)
    pairs = minhash_lsh_pairs(docs, "doc_id", "text",
                              k=16, bands=4, threshold=0.4)
    return dedup_clusters(pairs)


@register(
    "q33_ngram_jaccard_topk",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, lang, n_chars // 100 AS len_band,
               {shingles_duck('text', 3)} AS sh
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.len_band = b.len_band
     AND a.doc_id < b.doc_id
    ORDER BY jaccard DESC, id_a ASC, id_b ASC
    LIMIT 20
    """,
    doc="P10 blocked n-gram Jaccard near-dup: (lang, length-band) blocking "
        "keys + exact 3-gram Jaccard, top-20 [EXT]",
)
def q33_ngram_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    docs = load(spark, "documents", sf_dir)
    sh = docs.selectExpr(
        "doc_id", "lang",
        "n_chars div 100 AS len_band",
        f"{shingles_spark('text', 3)} AS sh",
    ).persist(StorageLevel.MEMORY_AND_DISK)  # feeds both self-join sides
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.lang") == F.col("b.lang"))
               & (F.col("a.len_band") == F.col("b.len_band"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.expr("CAST(size(array_intersect(a.sh, b.sh)) AS DOUBLE) / "
                   "size(array_union(a.sh, b.sh))").alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("id_a"), F.asc("id_b"))
        .limit(20)
    )
