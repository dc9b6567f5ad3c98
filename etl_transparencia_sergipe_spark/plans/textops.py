"""Text-analysis queries over the documents table (LLM-pipeline [EXT] ops,
SURVEY.md §2.8 F16): token counting, quality scoring, fingerprinting,
language scoring. All built-in column expressions — no Python in the row
loop — so they run inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.plans._helpers import dsum_sql, dsum, load
from etl_transparencia_sergipe_spark.plans.registry import register


def token_count(col) -> F.Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


TOKEN_COUNT_SQL = (
    "CASE WHEN length(trim({c})) = 0 THEN 0 "
    "ELSE len(string_split_regex(trim({c}), '\\s+')) END"
)


@register(
    "q20_token_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           {dsum_sql(TOKEN_COUNT_SQL.format(c='text'), 0)} AS total_tokens,
           MIN({TOKEN_COUNT_SQL.format(c='text')}) AS min_tokens,
           MAX({TOKEN_COUNT_SQL.format(c='text')}) AS max_tokens
    FROM documents GROUP BY lang
    """,
    doc="token counting (whitespace tokenizer) per language [EXT F16]",
)
def q20_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    toks = token_count("text")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        dsum(toks, 0).alias("total_tokens"),
        F.min(toks).alias("min_tokens"),
        F.max(toks).alias("max_tokens"),
    )


from etl_transparencia_sergipe_spark.operators.textstats import (  # noqa: E402
    bpe_token_count_duck,
    bpe_token_count_spark,
    fingerprint_duck,
    fingerprint_spark,
    lang_hits_duck,
    lang_hits_spark,
    langid_case,
    quality_score_duck,
    quality_score_spark,
)

_TOKS_SPARK = "split(lower(trim(text)), '\\\\s+')"
_TOKS_DUCK = "string_split_regex(lower(trim(text)), '\\s+')"


@register(
    "q21_quality_scores",
    oracle=f"""
    SELECT {quality_score_duck('text')} AS quality,
           COUNT(*) AS n_docs,
           {dsum_sql('n_chars', 0)} AS total_chars
    FROM documents GROUP BY 1
    """,
    doc="quality scoring: length band + alpha ratio + mean word length "
        "(pretraining-filter shape) [EXT F16]",
)
def q21_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return (
        docs.selectExpr(f"{quality_score_spark('text')} AS quality", "n_chars")
        .groupBy("quality")
        .agg(F.count("*").alias("n_docs"), dsum("n_chars", 0).alias("total_chars"))
    )


@register(
    "q22_langid_heuristic",
    oracle=f"""
    SELECT lang AS lang_label,
           {langid_case(lang_hits_duck, _TOKS_DUCK)} AS lang_pred,
           COUNT(*) AS n
    FROM documents GROUP BY 1, 2
    """,
    doc="language-ID heuristic: stopword-hit argmax with deterministic "
        "tie order, cross-tabbed vs the labeled lang [EXT F16]",
)
def q22_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    # materialize each language's hit count once, then argmax over the
    # columns (an explode + hash-agg variant measured SLOWER here: the
    # per-doc token counts are too small to amortize the extra shuffle)
    from etl_transparencia_sergipe_spark.operators.textstats import (
        LANG_STOPWORDS,
    )

    hits = docs.selectExpr(
        "lang AS lang_label",
        *[f"{lang_hits_spark(_TOKS_SPARK, g)} AS hits_{g}"
          for g in LANG_STOPWORDS],
    )
    pred = langid_case(lambda _t, g: f"hits_{g}", "_")
    return (
        hits.selectExpr("lang_label", f"{pred} AS lang_pred")
        .groupBy("lang_label", "lang_pred")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q23_bpe_token_count",
    oracle=f"""
    SELECT source,
           {dsum_sql(bpe_token_count_duck('text'), 0)} AS total_bpe_tokens,
           MAX({bpe_token_count_duck('text')}) AS max_bpe_tokens
    FROM documents GROUP BY source
    """,
    doc="BPE-ish regex token counting (alpha runs / digit runs / punct "
        "singletons) per source [EXT F16]",
)
def q23_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    cnt = F.expr(bpe_token_count_spark("text"))
    return docs.groupBy("source").agg(
        dsum(cnt, 0).alias("total_bpe_tokens"),
        F.max(cnt).alias("max_bpe_tokens"),
    )


@register(
    "q29_tfidf_features",
    oracle=None,  # HashingTF bucket ids are Spark-specific — rows-only
    doc="F16 TF-IDF via ml.feature (Tokenizer -> HashingTF -> IDF): "
        "per-language mean vector norm of weighted features [EXT]",
)
def q29_tfidf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    docs = load(spark, "documents", sf_dir)
    tok = Tokenizer(inputCol="text", outputCol="words")
    tf = HashingTF(inputCol="words", outputCol="tf", numFeatures=1 << 12)
    words = tok.transform(docs)
    tfd = tf.transform(words)
    idf = IDF(inputCol="tf", outputCol="tfidf").fit(tfd)
    out = idf.transform(tfd)
    from pyspark.ml.functions import vector_to_array

    norm = F.sqrt(F.aggregate(
        F.transform(vector_to_array("tfidf"), lambda x: x * x),
        F.lit(0.0), lambda acc, v: acc + v))
    return (
        out.withColumn("norm", norm)
        .groupBy("lang")
        .agg(F.count("*").alias("n"),
             F.round(F.avg("norm"), 4).alias("avg_tfidf_norm"))
    )


@register(
    "q24_fingerprint_dedup",
    oracle=f"""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT {fingerprint_duck('text')}) AS n_fingerprints,
           MIN({fingerprint_duck('text')}) AS min_fp
    FROM documents
    """,
    doc="document fingerprinting (md5 of whitespace-normalized text) as "
        "a dedup key [EXT F16]",
)
def q24_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    fp = F.expr(fingerprint_spark("text"))
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(fp).alias("n_fingerprints"),
        F.min(fp).alias("min_fp"),
    )


# ---------------------------------------------------------------------------
# End-to-end corpus curation: the composite training-data pipeline shape —
# quality filter + near-dup removal + per-language token accounting. The
# reference's analog is filter-then-consolidate (P4 royalty filter ->
# file_utils.py:22-57 yearly merge); here the filter is a quality score and
# the "overwrite" is keep-lowest-id near-dup dedup.
# ---------------------------------------------------------------------------

from etl_transparencia_sergipe_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    minhash_lsh_pairs_duck,
)
from etl_transparencia_sergipe_spark.operators.textstats import (  # noqa: E402
    quality_score_duck,
    quality_score_spark,
)


@register(
    "q47_corpus_curation",
    oracle=f"""
    WITH pairs AS ({minhash_lsh_pairs_duck('documents', 'doc_id', 'text',
                                           k=16, bands=4, threshold=0.4)}),
    dupes AS (SELECT DISTINCT id_b AS doc_id FROM pairs),
    kept AS (
        SELECT d.* FROM documents d
        WHERE {quality_score_duck('d.text')} >= 0.7
          AND d.doc_id NOT IN (SELECT doc_id FROM dupes)
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM({bpe_token_count_duck('text')}) AS BIGINT)
               AS total_tokens,
           {dsum_sql('n_chars', 0)} AS total_chars
    FROM kept GROUP BY lang
    """,
    doc="corpus curation pipeline [EXT]: quality-score filter (>= 0.7) + "
        "MinHash near-dup removal (drop the higher doc_id of every "
        "verified pair — keep-first semantics) + per-language doc/token/"
        "char accounting. Composite of P4-shape filtering, P10 dedup and "
        "F16 text stats in ONE plan: the LSH anti-join prunes before the "
        "final aggregate, so Catalyst pipelines filter->dedup->agg without "
        "materializing the corpus.",
)
def q47_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    pairs = minhash_lsh_pairs(docs, "doc_id", "text",
                              k=16, bands=4, threshold=0.4)
    dupes = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    # the dup-id list is ids-only and a small fraction of the corpus:
    # broadcast turns the anti join into a map-side filter (no corpus
    # shuffle); stats after the LSH pipeline are too opaque for Catalyst
    # to pick this on its own
    kept = (
        docs.filter(F.expr(quality_score_spark("text")) >= 0.7)
        .join(F.broadcast(dupes), "doc_id", "left_anti")
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.expr(bpe_token_count_spark("text"))).cast("bigint")
        .alias("total_tokens"),
        dsum("n_chars", 0).alias("total_chars"),
    )
