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


def _q29_bound_check(sdf, con) -> str | None:
    """q29's partial verification (round-11, r10 VERDICT item 4): the
    Spark-specific HashingTF norms can't be reproduced in SQL (the exact
    tf-idf twin q85 is hash-verified instead), but the EXACT columns can:
    per-language doc counts must match DuckDB, and every mean norm must
    be finite and positive (an all-zero or NaN norm means the vector
    pipeline silently broke)."""
    import math as _m

    ex = con.execute(
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM documents GROUP BY lang").fetchdf().set_index("lang")
    errs = []
    if sorted(sdf["lang"]) != sorted(ex.index):
        errs.append(f"lang groups {sorted(sdf['lang'])} != "
                    f"exact {sorted(ex.index)}")
    for r in sdf.itertuples(index=False):
        if r.lang in ex.index and int(r.n) != int(ex.loc[r.lang, "n"]):
            errs.append(f"{r.lang}: n {r.n} != exact "
                        f"{int(ex.loc[r.lang, 'n'])}")
        v = float(r.avg_tfidf_norm)
        if not _m.isfinite(v) or v <= 0:
            errs.append(f"{r.lang}: avg_tfidf_norm {v} not finite/positive")
    return "; ".join(errs) or None


@register(
    "q29_tfidf_features",
    oracle=None,  # HashingTF bucket ids are Spark-specific — rows-only
    doc="F16 TF-IDF via ml.feature (Tokenizer -> HashingTF -> IDF): "
        "per-language mean vector norm of weighted features [EXT]; the "
        "exact tf-idf formulation is hash-verified separately (q85); "
        "the local gate bound-checks the exact columns (per-lang doc "
        "counts) and that every norm is finite and positive",
    bound_check=lambda sdf, con: _q29_bound_check(sdf, con),
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

    # L2 norm over the SPARSE values (unwrap_udt exposes the vector's
    # values array): the previous vector_to_array fold densified every
    # row to 4096 doubles and ran ~200M interpreted lambda steps at sf1
    # (15.9 s); the ~80 nonzeros per doc give the identical sum — zeros
    # add exactly 0.0 in IEEE and sparse values are stored in index
    # order, so the fold sequence over nonzeros is unchanged.
    vals = F.unwrap_udt(F.col("tfidf")).getField("values")
    norm = F.sqrt(F.aggregate(
        vals, F.lit(0.0), lambda acc, v: acc + v * v))
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
        "MinHash near-dup removal (drop every doc that is the HIGHER id "
        "of any verified pair — conservative: transitive chains A~B~C "
        "drop both B and C even when A!~C, trading a little over-removal "
        "for a single anti-join pass; exact greedy keep-first needs the "
        "iterative connected-components of q38) + per-language doc/token/"
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
    # no broadcast hint: the dup-id list is unbounded (dup-heavy corpora
    # can put a large fraction of ids here), so forcing a broadcast risks
    # the driver. AQE sizes the materialized side at runtime and converts
    # the anti join to broadcast exactly when the list is actually small.
    kept = (
        docs.filter(F.expr(quality_score_spark("text")) >= 0.7)
        .join(dupes, "doc_id", "left_anti")
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.expr(bpe_token_count_spark("text"))).cast("bigint")
        .alias("total_tokens"),
        dsum("n_chars", 0).alias("total_chars"),
    )


def _q39_oracle_py(con):
    """Iterative label-propagation oracle for q39 — shares the converged
    labels table with q38's (same pair graph, cached per connection)."""
    from etl_transparencia_sergipe_spark.plans.cc_oracle import (
        cc_labels_duck,
        docs_cache_tag,
    )
    from etl_transparencia_sergipe_spark.plans.dedup_queries import (
        _CC_PAIRS_SQL,
    )

    t = cc_labels_duck(con, _CC_PAIRS_SQL,
                       disk_tag=docs_cache_tag(con, _CC_PAIRS_SQL))
    return con.execute(f"""
        SELECT lang,
               COUNT(*) AS n_docs,
               {dsum_sql(TOKEN_COUNT_SQL.format(c='text'), 0)}
                   AS total_tokens,
               {dsum_sql('n_chars', 0)} AS total_chars
        FROM documents d
        WHERE d.doc_id NOT IN
              (SELECT node FROM {t} WHERE node <> component)
        GROUP BY lang
    """).fetchdf()


@register(
    "q39_curation_keep_canonical",
    oracle_py=_q39_oracle_py,
    oracle=f"""
    WITH RECURSIVE pairs AS (
        {minhash_lsh_pairs_duck('documents', 'doc_id', 'text',
                                k=16, bands=4, threshold=0.4)}
    ),
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
    cc AS (SELECT node, MIN(m) AS component FROM reach GROUP BY node),
    drops AS (SELECT node AS doc_id FROM cc WHERE node != component),
    kept AS (
        SELECT d.* FROM documents d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           {dsum_sql(TOKEN_COUNT_SQL.format(c='text'), 0)} AS total_tokens,
           {dsum_sql('n_chars', 0)} AS total_chars
    FROM kept GROUP BY lang
    """,
    doc="EXACT keep-first curation [EXT]: near-dup pairs -> connected "
        "components (operators/components.py, iterative min-label + path "
        "halving) -> keep only each cluster's canonical doc (min doc_id), "
        "then per-language accounting. The greedy-exact complement of "
        "q47's conservative pair-drop (which over-removes on transitive "
        "chains A~B~C); oracle is the recursive-CTE transitive closure. "
        "Reference anchor: keep-one-per-key overwrite semantics, "
        "file_utils.py:57.",
)
def q39_curation_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.components import (
        connected_components,
    )

    docs = load(spark, "documents", sf_dir)
    pairs = minhash_lsh_pairs(docs, "doc_id", "text",
                              k=16, bands=4, threshold=0.4)
    drops = (
        connected_components(pairs)
        .filter("node != component")
        .select(F.col("node").alias("doc_id"))
    )
    kept = docs.join(drops, "doc_id", "left_anti")
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        dsum(token_count("text"), 0).alias("total_tokens"),
        dsum("n_chars", 0).alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (rolling-hash document fingerprinting, the
# MOSS/Schleimer-Wilkerson-Aiken scheme): hash every word k-gram, slide a
# window of w consecutive k-gram hashes, keep each window's minimum —
# guarantees any shared run of >= w+k-1 tokens between two documents
# shares a fingerprint, at ~1/w of the k-gram count stored.
# ---------------------------------------------------------------------------

from etl_transparencia_sergipe_spark.operators.dedup import (  # noqa: E402
    tokens_duck,
    tokens_spark,
)
from etl_transparencia_sergipe_spark.operators.hashing import (  # noqa: E402
    h60_duck,
    h60_spark,
)

_WINNOW_K = 3  # k-gram size
_WINNOW_W = 4  # winnowing window (consecutive k-grams)


@register(
    "q49_winnowing_fingerprints",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang,
               generate_subscripts(t.toks, 1) AS pos, unnest(t.toks) AS t
        FROM (SELECT doc_id, lang, {tokens_duck('text')} AS toks
              FROM documents) t
    ), gram AS (
        SELECT doc_id, lang, pos,
               t || ' ' || lead(t, 1) OVER w || ' ' || lead(t, 2) OVER w
                   AS g,
               COUNT(*) OVER (PARTITION BY doc_id) AS cnt
        FROM tok
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), gh AS (
        SELECT doc_id, lang, pos, {h60_duck('g')} AS h,
               cnt - {_WINNOW_K - 1} AS n_grams
        FROM gram WHERE pos <= cnt - {_WINNOW_K - 1}
    ), winmin AS (
        -- window minima over ALL k-gram hashes; restrict to window-START
        -- positions only afterwards, so trailing windows still see their
        -- full w hashes (filtering first would truncate them)
        SELECT doc_id, lang, pos, n_grams,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                            AND {_WINNOW_W - 1} FOLLOWING) AS fp
        FROM gh
    ), sel AS (
        SELECT doc_id, lang, fp FROM winmin
        WHERE pos <= GREATEST(n_grams - {_WINNOW_W - 1}, 1)
    )
    SELECT lang,
           CAST(COUNT(DISTINCT (doc_id, fp)) AS BIGINT) AS n_fingerprints,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct_fps,
           MIN(fp) AS min_fp
    FROM sel GROUP BY lang
    """,
    doc="F16 rolling-hash winnowing fingerprints (Schleimer et al. local "
        "algorithm): k=3 word-gram hashes, per-window minimum selection "
        "(w=4) -> ~1/w sampled fingerprints with shared-substring "
        "guarantee; per-language fingerprint accounting [EXT]",
)
def q49_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load(spark, "documents", sf_dir)
    tok = docs.selectExpr(
        "doc_id", "lang",
        f"posexplode({tokens_spark('text')}) AS (pos0, t)",
    ).selectExpr("doc_id", "lang", "pos0 + 1 AS pos", "t")
    w = W.partitionBy("doc_id").orderBy("pos")
    gram = (
        tok.withColumn("g", F.expr(
            "concat_ws(' ', t, lead(t, 1) OVER "
            "(PARTITION BY doc_id ORDER BY pos), lead(t, 2) OVER "
            "(PARTITION BY doc_id ORDER BY pos))"))
        .withColumn("cnt", F.count("*").over(W.partitionBy("doc_id")))
        .filter(f"pos <= cnt - {_WINNOW_K - 1}")
    )
    gh = gram.selectExpr(
        "doc_id", "lang", "pos",
        f"{h60_spark('g')} AS h",
        f"cnt - {_WINNOW_K - 1} AS n_grams",
    )
    # window minima over ALL hashes first, THEN keep window-start rows —
    # filtering first would drop the last w-1 hashes from trailing
    # windows and break the shared-substring guarantee
    sel = (
        gh.withColumn("fp", F.min("h").over(
            w.rowsBetween(W.currentRow, _WINNOW_W - 1)))
        .filter(f"pos <= GREATEST(n_grams - {_WINNOW_W - 1}, 1)")
    )
    return sel.groupBy("lang").agg(
        F.countDistinct("doc_id", "fp").cast("bigint")
        .alias("n_fingerprints"),
        F.countDistinct("fp").cast("bigint").alias("n_distinct_fps"),
        F.min("fp").alias("min_fp"),
    )


@register(
    "q53_vocab_topk",
    oracle=f"""
    SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS freq,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM (
        SELECT doc_id, unnest({tokens_duck('text')}) AS t
        FROM documents
    )
    GROUP BY t
    ORDER BY freq DESC, token ASC
    LIMIT 25
    """,
    doc="F16 corpus vocabulary: token frequency + document frequency, "
        "top-25 — the vocab-building pass of a training-data pipeline; "
        "partial-agg explode -> count, TakeOrderedAndProject top-k [EXT]",
)
def q53_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    tok = docs.selectExpr(
        "doc_id", f"explode({tokens_spark('text')}) AS token")
    return (
        tok.groupBy("token")
        .agg(F.count("*").cast("bigint").alias("freq"),
             F.countDistinct("doc_id").cast("bigint").alias("doc_freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(25)
    )


@register(
    "q54_hash_split_stratified",
    oracle=f"""
    SELECT lang,
           CASE WHEN {h60_duck("CAST(doc_id AS VARCHAR)")} % 100 < 80
                THEN 'train'
                WHEN {h60_duck("CAST(doc_id AS VARCHAR)")} % 100 < 90
                THEN 'val' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           {dsum_sql('n_chars', 0)} AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
    doc="deterministic train/val/test corpus split (80/10/10) by hashing "
        "the stable doc_id — reproducible across runs/engines, unlike "
        "seed-based sampling; per-(lang, split) accounting verifies "
        "stratification [EXT]. At scale this is a pure map-side "
        "projection: no shuffle beyond the final agg.",
)
def q54_hash_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    bucket = f"{h60_spark('CAST(doc_id AS STRING)')} % 100"
    return (
        docs.selectExpr(
            "lang",
            f"CASE WHEN {bucket} < 80 THEN 'train' "
            f"WHEN {bucket} < 90 THEN 'val' ELSE 'test' END AS split",
            "n_chars",
        )
        .groupBy("lang", "split")
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             dsum("n_chars", 0).alias("total_chars"))
    )


# Spark string literals eat one level of backslashes; DuckDB keeps them.
_CPF_SPARK = r"\\d{3}\\.\\d{3}\\.\\d{3}-\\d{2}"
_CPF_DUCK = r"\d{3}\.\d{3}\.\d{3}-\d{2}"
_EMAIL_SPARK = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_EMAIL_DUCK = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"


@register(
    "q55_pii_scan",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN regexp_matches(text, '{_CPF_DUCK}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_cpf,
           CAST(SUM(CASE WHEN regexp_matches(text, '{_EMAIL_DUCK}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
           CAST(SUM(len(regexp_extract_all(text, '{_CPF_DUCK}')))
                AS BIGINT) AS total_cpf_hits
    FROM documents GROUP BY source
    """,
    doc="PII pattern scan (curation/redaction precheck): CPF-formatted ids "
        "and emails per source — the reference corpus carries formatted "
        "cpf_cnpj values (OSR_aracaju_barra__pirambu.ipynb cell-32 "
        "output), so leak detection is a first-class op [EXT]. Pure "
        "map-side regexp_count inside codegen.",
)
def q55_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.expr(f"CASE WHEN text RLIKE '{_CPF_SPARK}' THEN 1 ELSE 0 END"))
        .cast("bigint").alias("docs_with_cpf"),
        F.sum(F.expr(
            f"CASE WHEN text RLIKE '{_EMAIL_SPARK}' THEN 1 ELSE 0 END"))
        .cast("bigint").alias("docs_with_email"),
        F.sum(F.expr(f"regexp_count(text, '{_CPF_SPARK}')"))
        .cast("bigint").alias("total_cpf_hits"),
    )


_CHUNK = 2048  # context-window token budget


@register(
    "q57_pack_chunks",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, {TOKEN_COUNT_SQL.format(c='text')} AS n_tok
        FROM documents
    ), c AS (
        SELECT lang, n_tok,
               SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(MAX((cum + {_CHUNK} - 1) // {_CHUNK}) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN (cum - n_tok) // {_CHUNK} != (cum - 1) // {_CHUNK}
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boundary_docs
    FROM c GROUP BY lang
    """,
    doc="sequence-packing accounting (concat-and-chunk pretraining shape): "
        "docs concatenated in doc_id order per language, chunked into "
        "2048-token context windows — reports chunk count and how many "
        "docs straddle a chunk boundary. All integer arithmetic, so "
        "bit-exact cross-engine [EXT]. SCALE SHAPE: the running sum is "
        "computed two-pass over contiguous doc_id shards — per-(lang, "
        "shard) local running sums in parallel window tasks, then a tiny "
        "per-shard-total frame yields carry-in prefix offsets that are "
        "broadcast-joined back (cum = local_cum + offset). Identical "
        "result to the global window (same oracle), but each language "
        "spreads across many tasks instead of serializing into one — the "
        "plan a 1000-executor packing job needs. Shard width is a knob: "
        "size it so n_docs/width offset rows stay broadcastable (e.g. 1e6 "
        "docs/shard at corpus scale; 256 here so tiny test data still "
        "exercises >1 shard per language). Order anchor: the "
        "reference consolidates files in sorted-name order "
        "(file_utils.py:22-57); doc_id order is the same contract.",
)
def q57_pack_chunks(spark: SparkSession, sf_dir: str,
                    shard_w: int = 256) -> DataFrame:
    """``shard_w`` = contiguous doc_id range per shard (order-preserving);
    results are invariant to it by construction (tested)."""
    from pyspark.sql import Window as W

    docs = load(spark, "documents", sf_dir)
    t = docs.select(
        "doc_id", "lang", token_count("text").alias("n_tok"),
        # integer div, not float /: exact for all long ids, no 2^53 cliff
        F.expr(f"doc_id div {shard_w}").alias("shard"))
    # pass 1: local running sum inside each (lang, shard) — parallel
    w_local = (W.partitionBy("lang", "shard").orderBy("doc_id")
               .rowsBetween(W.unboundedPreceding, W.currentRow))
    local = t.withColumn("lcum", F.sum("n_tok").over(w_local))
    # pass 2: carry-in offsets = sum of earlier shards' totals (tiny frame:
    # n_langs x n_shards rows), broadcast back
    totals = t.groupBy("lang", "shard").agg(F.sum("n_tok").alias("stok"))
    w_off = (W.partitionBy("lang").orderBy("shard")
             .rowsBetween(W.unboundedPreceding, -1))
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("stok").over(w_off), F.lit(0)))
    c = local.join(
        F.broadcast(offsets.select("lang", "shard", "offset")),
        ["lang", "shard"],
    ).withColumn("cum", F.col("lcum") + F.col("offset"))
    return c.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.max(F.expr(f"(cum + {_CHUNK} - 1) div {_CHUNK}")).cast("bigint")
        .alias("n_chunks"),
        F.sum(F.expr(
            f"CASE WHEN (cum - n_tok) div {_CHUNK} != (cum - 1) div {_CHUNK} "
            "THEN 1 ELSE 0 END")).cast("bigint").alias("n_boundary_docs"),
    )


_SENT_SPARK = r"[.!?]+\\s*"   # Spark SQL literal: \\s survives as \s
_SENT_DUCK = r"[.!?]+\s*"


@register(
    "q59_sentence_stats",
    oracle=f"""
    WITH s AS (
        SELECT lang,
               len(list_filter(string_split_regex(text, '{_SENT_DUCK}'),
                               x -> length(trim(x)) > 0)) AS n_sent,
               {TOKEN_COUNT_SQL.format(c='text')} AS n_tok
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_sent) AS BIGINT) AS total_sentences,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tok) AS DOUBLE) / SUM(n_sent) AS avg_sent_tokens
    FROM s GROUP BY lang
    """,
    doc="F16 sentence segmentation stats: deterministic regex sentence "
        "splitting ([.!?]+ boundaries, blank segments dropped) with "
        "per-language sentence counts and mean tokens-per-sentence. The "
        "cross-engine-reproducible twin of Spark's locale-dependent "
        "sentences() BreakIterator (which has no DuckDB oracle); the "
        "ratio divides exact integer sums, so it is bit-identical. All "
        "map-side expression work [EXT F16].",
)
def q59_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    s = (
        docs.withColumn(
            "n_sent",
            F.expr(f"size(filter(split(text, '{_SENT_SPARK}'), "
                   "x -> length(trim(x)) > 0))"))
        .withColumn("n_tok", token_count("text"))
        .select("lang", "n_sent", "n_tok")
    )
    return s.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_sent").cast("bigint").alias("total_sentences"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        (F.sum("n_tok").cast("double") / F.sum("n_sent"))
        .alias("avg_sent_tokens"),
    )


@register(
    "q74_bigram_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang,
               generate_subscripts(toks, 1) AS pos, unnest(toks) AS t
        FROM (SELECT doc_id, lang, {tokens_duck('text')} AS toks
              FROM documents)
    ), bg AS (
        SELECT lang,
               t || ' ' || lead(t) OVER (PARTITION BY doc_id ORDER BY pos)
               AS bigram
        FROM tok
    )
    SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS freq
    FROM bg WHERE bigram IS NOT NULL
    GROUP BY lang, bigram
    QUALIFY row_number() OVER (ORDER BY freq DESC, lang ASC, bigram ASC)
            <= 20
    """,
    doc="F16 corpus bigram statistics: top-20 (lang, bigram) pairs by "
        "frequency — the n-gram LM / tokenizer-training precursor pass "
        "[EXT]. posexplode + per-doc lead window builds the bigram "
        "stream; partial agg collapses it before the (lang, bigram) "
        "shuffle, TakeOrderedAndProject takes the head. NULL-propagating "
        "concat (not concat_ws) so the trailing token drops identically "
        "on both engines.",
)
def q74_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    # round 12 (guide §2.3/§2.4): the bigram used to be assembled with a
    # lead() window — a full token-stream exchange + sort just to see
    # pos+1. Carrying the token array through the posexplode makes the
    # neighbor an in-row try_element_at lookup (NULL past the end, so
    # the trailing token drops via the NULL-propagating concat exactly
    # as before): the whole bigram stream is now map-side and the only
    # exchange left is the partial-aggregated (lang, bigram) shuffle.
    tok = docs.selectExpr("lang", f"{tokens_spark('text')} AS _tk")
    bg = (
        tok.select("lang", "_tk", F.posexplode("_tk").alias("pos", "t"))
        .select("lang", F.concat(
            "t", F.lit(" "),
            F.try_element_at("_tk", F.col("pos") + F.lit(2))).alias("bigram"))
    )
    return (
        bg.filter("bigram IS NOT NULL")
        .groupBy("lang", "bigram")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("lang"), F.asc("bigram"))
        .limit(20)
    )


@register(
    "q75_ttr_by_source",
    oracle=f"""
    WITH per_doc AS (
        SELECT source,
               len({tokens_duck('text')}) AS n_tok,
               len(list_distinct({tokens_duck('text')})) AS n_types
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(floor(CAST(n_types AS DOUBLE) / n_tok * 1000000)
                         AS BIGINT)) AS DOUBLE)
               / (COUNT(*) * 1000000.0) AS avg_ttr_q6
    FROM per_doc GROUP BY source
    """,
    doc="F16 lexical-diversity quality signal: per-doc type-token ratio "
        "(distinct/total tokens), averaged per source — low TTR flags "
        "template/boilerplate-heavy sources for downweighting [EXT]. The "
        "mean sums floor(ttr*1e6) as BIGINT (the q69 idiom): floor of an "
        "identical double is bit-deterministic cross-engine, while a "
        "double sum's addition order is not. Pure map-side projection + "
        "one 20-group agg — no shuffle grows with the corpus.",
)
def q75_ttr_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    per_doc = docs.selectExpr(
        "source",
        f"size({tokens_spark('text')}) AS n_tok",
        f"size(array_distinct({tokens_spark('text')})) AS n_types")
    return (
        per_doc.groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.sum("n_tok").cast("bigint").alias("total_tokens"),
             (F.sum(F.floor(F.col("n_types").cast("double")
                            / F.col("n_tok") * 1e6).cast("bigint"))
              .cast("double")
              / (F.count("*") * F.lit(1e6))).alias("avg_ttr_q6"))
    )


_PREFIX_TOKENS = 32


@register(
    "q76_prefix_dedup",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, source,
               {h60_duck(f"array_to_string(({tokens_duck('text')})"
                         f"[1:{_PREFIX_TOKENS}], ' ')")} AS ph
        FROM documents
    ), g AS (
        SELECT ph, COUNT(*) AS grp_n FROM p GROUP BY ph
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN grp_n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_prefix_dup_docs,
           CAST(COUNT(DISTINCT CASE WHEN grp_n > 1 THEN ph END) AS BIGINT)
               AS n_dup_groups
    FROM p JOIN g USING (ph)
    GROUP BY source
    """,
    doc="P9-adjacent prefix dedup (RefinedWeb/C4 curation op): hash the "
        "first 32 tokens; docs sharing a prefix hash are boilerplate-"
        "intro suspects, counted per source [EXT]. Group sizes come from "
        "a self-join on the prefix hash — both sides shuffle on the SAME "
        "key, so Catalyst co-partitions them (one exchange each, no "
        "broadcast of an unbounded dup list); at 100 TB this is the "
        "vocab-shaped shuffle the other dedup tiers already use.",
)
def q76_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    prefix = (f"array_join(slice({tokens_spark('text')}, 1, "
              f"{_PREFIX_TOKENS}), ' ')")
    p = docs.selectExpr(
        "doc_id", "source", f"{h60_spark(prefix)} AS ph")
    g = p.groupBy("ph").agg(F.count("*").alias("grp_n"))
    return (
        p.join(g, "ph")
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.sum(F.when(F.col("grp_n") > 1, 1).otherwise(0))
             .cast("bigint").alias("n_prefix_dup_docs"),
             F.countDistinct(F.when(F.col("grp_n") > 1, F.col("ph")))
             .cast("bigint").alias("n_dup_groups"))
    )


_DUPFRAC_N = 8  # shingle width for the duplicate-text-fraction metric

from etl_transparencia_sergipe_spark.operators.dedup import (  # noqa: E402
    shingles_duck,
)


@register(
    "q82_dup_text_fraction",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, source, unnest({{sh}}) AS s
        FROM documents
    ), counts AS (
        SELECT s, COUNT(DISTINCT doc_id) AS n_docs_with
        FROM sh GROUP BY s
    ), per_doc AS (
        SELECT sh.doc_id, ANY_VALUE(sh.source) AS source,
               COUNT(DISTINCT sh.s) AS n_shingles,
               COUNT(DISTINCT CASE WHEN c.n_docs_with > 1 THEN sh.s END)
                   AS n_dup_shingles
        FROM sh JOIN counts c ON sh.s = c.s
        GROUP BY sh.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_shingles) AS BIGINT) AS total_shingles,
           CAST(SUM(n_dup_shingles) AS BIGINT) AS total_dup_shingles,
           CAST(SUM(CASE WHEN 2 * n_dup_shingles > n_shingles
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_majority_duplicated
    FROM per_doc GROUP BY source
    """.format(sh=shingles_duck("text", _DUPFRAC_N)),
    doc="F16/P10 duplicate-text-fraction curation metric (the RefinedWeb/"
        "CCNet 'fraction of a document's n-grams seen elsewhere in the "
        "corpus' filter): every doc's DISTINCT 8-gram shingles are "
        "counted corpus-wide; a doc whose majority of shingles appear in "
        "other docs is flagged. Unlike the pairwise dedup tiers "
        "(q31-q33), this is a GLOBAL containment measure — it catches "
        "mosaic duplication (a doc stitched from fragments of many "
        "others) that no pairwise Jaccard threshold sees. Shuffle shape "
        "at 100 TB: one token-stream shuffle to count shingle "
        "occurrences, one shuffle joining counts back to the doc's "
        "shingles — the same vocab-shaped exchanges as q53/q76; "
        "integer-exact so the oracle hash is bit-stable [EXT].",
)
def q82_dup_text_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.caching import persist_scoped
    from etl_transparencia_sergipe_spark.operators.dedup import shingle_rows

    docs = load(spark, "documents", sf_dir)
    # distinct (doc, shingle) rows via the codegen shingler (may emit
    # within-doc duplicates -> explicit distinct, matching the oracle's
    # COUNT(DISTINCT ...) semantics); persisted because three branches
    # consume it (per-doc totals, corpus shingle counts, the dup probe) —
    # the module policy single-text-scan guarantee
    # by_doc (round 12): the distinct() needs (doc, shingle) ROWS — the
    # 8-token shingle strings are ~8x the token bytes, so exchange the
    # raw doc rows once instead and let the doc_id partitioning make
    # the distinct exchange-free
    sh = (shingle_rows(docs, "doc_id", "text", _DUPFRAC_N, by_doc=True)
          .distinct()
          .transform(persist_scoped))
    # Round-11 de-skew (r10 VERDICT item 1, the q110 shape): round-10
    # used COUNT(*) OVER (PARTITION BY s) here — rows unique per (doc, s)
    # make that count n_docs_with without a join, but a corpus-universal
    # boilerplate shingle materializes EVERY doc's row in ONE window task
    # at 100x (window exec gets neither map-side partial aggregation nor
    # AQE skew splitting). The hash-agg pays the same s-keyed exchange,
    # partial-aggregates map-side (a hot shingle is one row after it),
    # and only DUPLICATED shingles survive into the join probe, which is
    # a left-semi both sides keyed on s — co-partitioned and
    # AQE-skew-splittable. The historical broadcast-OOM objection was to
    # broadcasting an unbounded all-shingle count frame; nothing is
    # broadcast here and the nd>1 filter shrinks the probe side besides.
    dup_s = (sh.groupBy("s").agg(F.count("*").alias("nd"))
             .filter("nd > 1").select("s"))
    n_sh = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    n_dup = (sh.join(dup_s, "s", "left_semi")
             .groupBy("doc_id").agg(F.count("*").alias("n_dup_shingles")))
    per_doc = (
        n_sh.join(n_dup, "doc_id", "left")
        .na.fill(0, ["n_dup_shingles"])
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_shingles").cast("bigint").alias("total_shingles"),
        F.sum("n_dup_shingles").cast("bigint").alias("total_dup_shingles"),
        F.sum(F.when(2 * F.col("n_dup_shingles") > F.col("n_shingles"), 1)
              .otherwise(0)).cast("bigint")
        .alias("docs_majority_duplicated"),
    )


@register(
    "q83_source_overlap",
    oracle="""
    WITH h AS (
        SELECT DISTINCT source,
               md5(array_to_string(
                   (string_split_regex(lower(trim(text)), '\\s+'))[1:12],
                   ' ')) AS th
        FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS shared_texts
    FROM h a JOIN h b ON a.th = b.th AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY shared_texts DESC, source_a ASC, source_b ASC
    LIMIT 25
    """,
    doc="P9/J6 cross-source overlap matrix (dataset-lineage /"
        " contamination audit): for every source pair, how many content "
        "fingerprints (md5 of the normalized 12-token prefix — the same "
        "head-fingerprint family as q76, which catches retitled/"
        "re-suffixed copies exact equality misses) they share. "
        "Distinct-per-source first so multiplicity inside one source "
        "doesn't inflate the overlap; the self-join keys on the "
        "fixed-width digest, so shuffle ~ n_distinct_fingerprints, "
        "never the text bytes [EXT].",
)
def q83_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    h = docs.selectExpr(
        "source",
        "md5(array_join(slice(split(lower(trim(text)), '\\\\s+'), 1, 12), "
        "' ')) AS th").distinct()
    a, b = h.alias("a"), h.alias("b")
    return (
        a.join(b, (F.col("a.th") == F.col("b.th"))
               & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"),
                 F.col("b.source").alias("source_b"))
        .agg(F.count("*").cast("bigint").alias("shared_texts"))
        .orderBy(F.desc("shared_texts"), F.asc("source_a"),
                 F.asc("source_b"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# round-4 curation extensions: chunk-store dedup, tf-idf, quality scorer
# ---------------------------------------------------------------------------

_CHUNK_TOKENS = 16


def chunk_fingerprints(docs: DataFrame, c: int = _CHUNK_TOKENS) -> DataFrame:
    """(doc_id, source, fp) — one md5 fingerprint per aligned c-token
    chunk, with ONE tokenization per doc: the token array materializes in
    its own projection, then a second projection chunks it. Inlining the
    split into the transform lambda re-ran the regex split once PER CHUNK
    (a subexpression inside a higher-order-function lambda evaluates per
    element; codegen CSE cannot hoist it out), and CollapseProject would
    have rebuilt exactly that — but it declines to collapse when a
    non-cheap expression would be duplicated, so the two-step select
    keeps split() evaluated once (asserted in tests/test_chunk_plan.py;
    chunk stage 3.7 s -> 1.2 s warm at sf1).

    Round 12: a scale.fan_out of the docs was tried here and REVERTED —
    the downstream (fp, doc) partial agg does not collapse (one row per
    chunk), so the pre-spread added an exchange for no shuffle savings:
    q84 1.67 -> 2.11 s warm in the same-session A/B."""
    return (
        docs.selectExpr("doc_id", "source",
                        f"{tokens_spark('text')} AS toks")
        .selectExpr(
            "doc_id", "source",
            f"explode(transform(sequence(0, (size(toks) - 1) div {c}), "
            f"i -> md5(array_join(slice(toks, i * {c} + 1, {c}), ' ')))) "
            "AS fp"))


@register(
    "q84_chunk_dedup",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source, {{toks}} AS toks FROM documents
    ), ch AS (
        SELECT doc_id, source,
               md5(array_to_string(
                   toks[(i * {_CHUNK_TOKENS} + 1):
                        ((i + 1) * {_CHUNK_TOKENS})], ' ')) AS fp
        FROM tok,
             UNNEST(generate_series(
                 0, CAST((len(toks) - 1) // {_CHUNK_TOKENS} AS INT))) AS t(i)
    ), occ AS (
        SELECT fp, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs_with
        FROM ch GROUP BY fp
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT ch.fp) AS BIGINT) AS n_distinct_chunks,
           CAST(SUM(CASE WHEN n_docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cross_doc_dup_chunks,
           CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_occurrences
    FROM ch JOIN occ USING (fp)
    GROUP BY source
    """.format(toks=tokens_duck("text")),
    doc="P9/F16 aligned chunk-store dedup: each doc is cut into "
        f"consecutive {_CHUNK_TOKENS}-token chunks (the RAG/context-"
        "store granularity — cf. q57's cross-doc packing, which is the "
        "inverse operation) and each chunk gets an md5 fingerprint; "
        "chunks seen in more than one doc are exact duplicates a "
        "chunk-level store would serve once. Complements q82: q82 "
        "measures ALL-position 8-gram containment, this measures "
        "ALIGNED-block identity, the unit a dedup'd chunk store "
        "actually stores. Shuffle shape at 100 TB: fingerprints are "
        "fixed-width digests, so both exchanges (occurrence count + "
        "count-back join) carry ~n_chunks x 32 bytes, never text; the "
        "join keys both sides on fp so Catalyst co-partitions them "
        "[EXT].",
)
def q84_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    ch = chunk_fingerprints(docs)
    # partial-agg to one row per (fp, doc) — single text scan (persisted;
    # two branches below). Round-11 de-skew (r10 VERDICT item 1, the q110
    # shape): round-10 attached n_occ/n_docs_with via SUM/COUNT OVER
    # (PARTITION BY fp) — a corpus-universal boilerplate chunk puts every
    # doc's (fp, doc) row in ONE window task at 100x, with no map-side
    # partial agg and no AQE skew handling. The hash-agg + join-back pays
    # the same fp-keyed exchange but partial-aggregates map-side, and
    # only fps with n_occ > 1 (which subsumes n_docs_with > 1) survive
    # into the join, whose sides are both keyed on fp — co-partitioned,
    # AQE-skew-splittable, nothing broadcast (the old rejection rationale
    # targeted broadcasting an all-chunk count frame, a 100 TB OOM shape;
    # this broadcasts nothing).
    from etl_transparencia_sergipe_spark.caching import persist_scoped
    pd = (ch.groupBy("fp", "doc_id", "source").agg(F.count("*").alias("n"))
          .transform(persist_scoped))
    base = pd.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_chunks"),
        F.countDistinct("fp").cast("bigint").alias("n_distinct_chunks"))
    dupfp = (pd.groupBy("fp")
             .agg(F.sum("n").alias("n_occ"),
                  F.count("*").alias("n_docs_with"))
             .filter("n_occ > 1"))
    dup = (pd.join(dupfp, "fp")
           .groupBy("source")
           .agg(F.sum(F.when(F.col("n_docs_with") > 1, F.col("n"))
                      .otherwise(0))
                .cast("bigint").alias("n_cross_doc_dup_chunks"),
                F.sum("n").cast("bigint").alias("n_dup_occurrences")))
    return (
        base.join(dup, "source", "left")
        .select("source", "n_chunks", "n_distinct_chunks",
                F.coalesce("n_cross_doc_dup_chunks", F.lit(0))
                .cast("bigint").alias("n_cross_doc_dup_chunks"),
                F.coalesce("n_dup_occurrences", F.lit(0))
                .cast("bigint").alias("n_dup_occurrences"))
    )


_SPAN_W = 16


@register(
    "q110_substring_dedup_spans",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source, {{toks}} AS toks FROM documents
    ), totals AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(toks)) AS BIGINT) AS total_tokens
        FROM tok GROUP BY source
    ), win AS (
        SELECT doc_id, source, i AS pos,
               md5(array_to_string(toks[(i + 1):(i + {_SPAN_W})], ' '))
                   AS fp
        FROM tok,
             UNNEST(generate_series(0, len(toks) - {_SPAN_W})) AS t(i)
        WHERE len(toks) >= {_SPAN_W}
    ), dupfp AS (
        SELECT fp FROM win GROUP BY fp HAVING COUNT(DISTINCT doc_id) > 1
    ), dup AS (
        SELECT w.doc_id, w.source, w.pos FROM win w JOIN dupfp USING (fp)
    ), flagged AS (
        SELECT doc_id, source, pos,
               CASE WHEN MAX(pos + {_SPAN_W}) OVER prev IS NULL
                      OR pos > MAX(pos + {_SPAN_W}) OVER prev
                    THEN 1 ELSE 0 END AS is_start
        FROM dup
        WINDOW prev AS (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), isl AS (
        SELECT doc_id, source, pos,
               SUM(is_start) OVER (PARTITION BY doc_id ORDER BY pos)
                   AS island
        FROM flagged
    ), spans AS (
        SELECT doc_id, source, island,
               MIN(pos) AS s, MAX(pos) + {_SPAN_W} AS e
        FROM isl GROUP BY doc_id, source, island
    ), per_doc AS (
        SELECT doc_id, source,
               COUNT(*) AS n_spans, SUM(e - s) AS dup_tokens
        FROM spans GROUP BY doc_id, source
    )
    SELECT t.source, t.n_docs,
           CAST(COUNT(p.doc_id) AS BIGINT) AS n_docs_with_dup,
           CAST(COALESCE(SUM(p.n_spans), 0) AS BIGINT) AS n_dup_spans,
           CAST(COALESCE(SUM(p.dup_tokens), 0) AS BIGINT) AS dup_tokens,
           t.total_tokens,
           ROUND(CAST(COALESCE(SUM(p.dup_tokens), 0) AS DOUBLE)
                 / t.total_tokens, 6) AS dup_token_frac
    FROM totals t LEFT JOIN per_doc p USING (source)
    GROUP BY t.source, t.n_docs, t.total_tokens
    """.format(toks=tokens_duck("text")),
    doc="P9/F16 EXACT SUBSTRING-level dedup at fixed token granularity "
        "(round-8 VERDICT item 8; the Lee et al. 'Deduplicating "
        "Training Data' posture re-expressed relationally): every "
        f"{_SPAN_W}-token SLIDING window (all positions, not q84's "
        "aligned blocks) is fingerprinted; windows shared across "
        "documents are merged per doc into MAXIMAL duplicated spans by "
        "a gaps-and-islands pass (running max of span end; a window "
        "opens a new span iff it starts past everything seen), giving "
        "per-source counts of duplicated spans and the exact token "
        "coverage a Lee-style cut would remove. Any duplicated "
        f"substring of >= {_SPAN_W} tokens shares at least one "
        "window, so span coverage lower-bounds true maximal-substring "
        "coverage, converging as W shrinks — the suffix-array exactness "
        "traded for a shuffle-only plan. Shuffle shape at 100 TB: one "
        "row per token position but fixed-width (pos + 8-byte xxhash64 "
        "fingerprint, never text); the dup-window semi-join keys both "
        "sides on fp "
        "(co-partitioned, hash-aggregated with join-back — NOT a "
        "per-fingerprint window, so a corpus-wide boilerplate w-gram "
        "cannot pin one task); the islands window partitions per "
        "doc_id — bounded by document length, no global sort. "
        "fp_bits=128 (element-rehashed second channel) is the ~1e12-"
        "window posture [EXT].",
)
def q110_substring_dedup_spans(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    return substring_dedup_spans(load(spark, "documents", sf_dir))


def span_fp_expr(sl: str, fp_bits: int) -> str:
    """SQL fingerprint expression over a slice of per-token xxhash64
    values (``sl`` is an array<bigint>-typed SQL fragment).

    64: one xxhash64 over the slice. 128: a 2-field struct whose second
    channel hashes the ELEMENT-REHASHED slice — NOT the reversed slice:
    reverse() is the identity on palindromic slices (runs of one
    repeated token, i.e. boilerplate), which would collapse h2 to h1 and
    leave exactly those windows with only 64-bit collision protection
    (round-10 ADVICE). Rehashing each element first feeds h2 different
    bytes wherever the raw slices differ, palindromic or not; a struct
    key keeps the grouping/join pipeline shape identical to 64-bit.
    Module-level so tests can pin the channel-independence property
    directly (tests/test_substring_spans.py).
    """
    if fp_bits == 64:
        return f"xxhash64({sl})"
    if fp_bits == 128:
        return (f"struct(xxhash64({sl}) AS h1, "
                f"xxhash64(transform({sl}, x -> xxhash64(x))) AS h2)")
    raise ValueError(f"fp_bits must be 64 or 128, got {fp_bits}")


def substring_dedup_spans(docs: DataFrame, w: int = _SPAN_W,
                          fp_bits: int = 64) -> DataFrame:
    """Per-source duplicated-span stats over sliding w-token windows —
    the parameterized engine behind q110 (see its register doc).

    ``fp_bits``: window-fingerprint width. 64 (default) is one xxhash64
    over the slice of per-token hashes — ~4e-5 expected collisions over
    sf1's ~37M windows. 128 is the 100-TB posture (~1e12 windows would
    see ~30k spurious merges at 64 bits): a SECOND decorrelated channel
    hashes the ELEMENT-REHASHED slice (``xxhash64(transform(sl, x ->
    xxhash64(x)))``), so two windows merge only if both 64-bit hashes
    collide (~1e-15 at 1e12 windows). Spark's xxhash64 has a FIXED seed
    (42) and multi-arg calls chain the running hash as the next seed —
    so ``xxhash64(sl, lit(1))`` is a deterministic function of
    ``xxhash64(sl)`` alone and adds NO independence (round-9 ADVICE).
    The intermediate ``xxhash64(reverse(sl))`` design fell to round-10
    ADVICE: reverse() is the identity on palindromic slices — notably
    runs of one repeated token, i.e. exactly the boilerplate these
    fingerprints exist to merge — collapsing those windows back to
    64-bit protection. Rehashing each element first keeps the channels
    independent on every input class: wherever the raw slices differ,
    the rehashed arrays differ at the same position (up to an
    element-level xxhash64 collision).
    """
    from pyspark.sql import Window as W

    from etl_transparencia_sergipe_spark.caching import persist_scoped

    # one tokenization per doc, materialized in its own projection (the
    # q84 lesson: a split() inlined into the transform lambda re-runs
    # per element; tests/test_chunk_plan.py pins the hoist there).
    # Round 12: scale.fan_out tried and dropped — the downstream
    # position-stream exchange carries ~one row per token either way
    # (no partial-agg collapse), so the pre-spread bought nothing
    # (A/B medians 2.14-2.32 fanned vs 2.15-2.19 not).
    tok = docs.selectExpr("doc_id", "source",
                          f"{tokens_spark('text')} AS toks")
    totals = tok.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size("toks")).cast("bigint").alias("total_tokens"))
    # Window fingerprints need only WITHIN-ENGINE injectivity (each side
    # partitions its own windows by equality; the compared OUTPUT is the
    # span stats), so the engine is free to pick a cheaper hash than the
    # oracle's md5: every token is xxhash64'd ONCE per doc, and each
    # window fingerprints a w-long slice of those 8-byte hashes instead
    # of md5 over a rebuilt ~100-byte string per position — measured
    # 22.0 s -> see BASELINE round-9 (the md5+array_join pass dominated
    # the corpus-position explosion).
    fp_expr = span_fp_expr(f"slice(th, i + 1, {w})", fp_bits)
    win = (tok.filter(F.size("toks") >= w)
           .selectExpr("doc_id", "source",
                       "transform(toks, t -> xxhash64(t)) AS th")
           .selectExpr(
        "doc_id", "source",
        f"posexplode(transform(sequence(0, size(th) - {w}), "
        f"i -> {fp_expr})) "
        "AS (pos, fp)"))
    # single-pass dup detection: the corpus-position stream is reduced
    # to one row per (fp, doc) carrying its position list — bounded by
    # positions within one document, so no corpus-frequency skew on
    # THAT shuffle (a boilerplate 16-gram in every doc still yields one
    # bounded row per doc). Cross-doc windows are then flagged by a
    # partially-aggregated groupBy(fp).count() joined back on fp
    # (post-aggregation each (fp, doc) appears once, so the count IS
    # the distinct-doc count). Round 9 used COUNT(*) OVER (PARTITION BY
    # fp) here — one window partition per fingerprint, which
    # materializes EVERY (fp, doc) row of a corpus-wide boilerplate
    # fingerprint in a single task at 100x scale (window exec gets
    # neither map-side partial aggregation nor AQE skew splitting); the
    # hash-agg + join-back pays the same fp-keyed exchange, partial-
    # aggregates map-side, and the join IS AQE-skew-splittable
    # (round-9 VERDICT item 2; hash-identical, pinned by
    # tests/test_substring_spans.py).
    per = (win.groupBy("fp", "doc_id", "source")
           .agg(F.collect_list("pos").alias("poss"))
           # feeds both the fp-count branch and the join probe — persist
           # so the corpus tokenize+hash pass runs once (module policy:
           # the harness clears caches after materializing each query)
           .transform(persist_scoped))
    dupfp = (per.groupBy("fp").agg(F.count("*").alias("nd"))
             .filter("nd > 1").select("fp"))
    dup = (per.join(dupfp, "fp")
           .select("doc_id", "source", F.explode("poss").alias("pos")))
    wd = W.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + w).over(
        wd.rowsBetween(W.unboundedPreceding, -1))
    isl = (dup.withColumn(
        "is_start",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1)
        .otherwise(0))
        .withColumn("island", F.sum("is_start").over(wd)))
    spans = isl.groupBy("doc_id", "source", "island").agg(
        F.min("pos").alias("s"), (F.max("pos") + w).alias("e"))
    per_doc = spans.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("e") - F.col("s")).alias("dup_tokens"))
    per_src = per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs_with_dup"),
        F.sum("n_spans").cast("bigint").alias("n_dup_spans"),
        F.sum("dup_tokens").cast("bigint").alias("dup_tokens"))
    return (
        totals.join(per_src, "source", "left")
        .select(
            "source", "n_docs",
            F.coalesce("n_docs_with_dup", F.lit(0)).cast("bigint")
            .alias("n_docs_with_dup"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("bigint")
            .alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint")
            .alias("dup_tokens"),
            "total_tokens",
            F.round(F.coalesce("dup_tokens", F.lit(0)).cast("double")
                    / F.col("total_tokens"), 6).alias("dup_token_frac"))
    )


@register(
    "q85_tfidf_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source, unnest({{toks}}) AS t FROM documents
    ), df AS (
        SELECT t, COUNT(DISTINCT doc_id) AS n_df FROM tok GROUP BY t
    ), tf AS (
        SELECT source, t, COUNT(*) AS n_tf FROM tok GROUP BY source, t
    ), n AS (
        SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
        SELECT source, t AS term, n_tf, n_df,
               ROUND(n_tf * ((n.n_docs + 1.0) / (n_df + 1.0)), 6) AS tfidf
        FROM tf JOIN df USING (t) CROSS JOIN n
    )
    SELECT source, term, CAST(n_tf AS BIGINT) AS n_tf,
           CAST(n_df AS BIGINT) AS n_df, tfidf
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY source
                               ORDER BY tfidf DESC, term ASC) <= 5
    ORDER BY source ASC, tfidf DESC, term ASC
    """.format(toks=tokens_duck("text")),
    doc="F16 per-source tf-idf salient terms (top-5): term frequency per "
        "source weighted by inverse document frequency over the corpus — "
        "the hash-verified twin of q29's Spark-ML HashingTF pipeline "
        "(rows-only by contract; this exact formulation closes that "
        "family's oracle gap). "
        "idf is the RAW rational (N+1)/(df+1), NOT log-scaled: ln() is "
        "not correctly-rounded IEEE and differs between libm and the "
        "JVM in the last ulp, while +,*,/ are correctly rounded, so the "
        "raw form is bit-identical across engines (same monotone "
        "ranking; the module's cross-engine float rule). Shuffle shape "
        "at 100 TB: token-stream shuffles for tf and df (vocab-sized "
        "results), a broadcast of the 1-row corpus count, and a "
        "vocab-sized df-to-tf join — text bytes never shuffle [EXT].",
)
def q85_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load(spark, "documents", sf_dir)
    tok = docs.selectExpr(
        "doc_id", "source", f"explode({tokens_spark('text')}) AS t")
    # Round-11 de-skew (r10 VERDICT item 1) kept n_df out of any window
    # over the (t, doc)-level rows: a stopword-class term present in
    # EVERY doc would materialize ~n_docs rows in ONE window task at
    # 100x. Round 13 (r12 VERDICT item 6) removes the df-to-tf JOIN that
    # shape paid — and the persist_scoped cache both its branches needed
    # — without reintroducing the skew. Key fact: doc_id -> source is
    # functional (one row per doc in documents), so per-(t, source)
    # distinct-doc counts PARTITION the per-t document frequency:
    #   n_df(t) = SUM over sources of nd_src(t, source).
    # Aggregate the (t, source, doc)-level frame once more to
    # (t, source) — map-side partial agg, a corpus-universal term is
    # one row per (map task, source) pre-shuffle — then attach n_df as
    # SUM(nd_src) OVER (PARTITION BY t) on the vocab x source-sized
    # frame, where a partition is AT MOST |sources| rows (a handful),
    # by construction skew-free at any corpus size. Plan effect vs
    # round 12: persist+two cache-scan branches + vocab-sized SMJ
    # (4 exchanges + 2 sorts) -> one streaming pipeline of 3
    # shrinking exchanges ((t,src,doc) -> (t,src) -> t) and no join;
    # integer counts are exact, so n_df is bit-identical.
    td = tok.groupBy("t", "source", "doc_id").agg(F.count("*").alias("n"))
    tfsrc = td.groupBy("t", "source").agg(
        F.sum("n").alias("n_tf"), F.count("*").alias("nd_src"))
    tf = tfsrc.withColumn(
        "n_df", F.sum("nd_src").over(W.partitionBy("t")))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.crossJoin(F.broadcast(n))
        .select(
            "source", F.col("t").alias("term"),
            F.col("n_tf").cast("bigint").alias("n_tf"),
            F.col("n_df").cast("bigint").alias("n_df"),
            F.round(F.col("n_tf") * ((F.col("n_docs") + F.lit(1.0))
                                     / (F.col("n_df") + F.lit(1.0))), 6)
            .alias("tfidf"))
    )
    w = W.partitionBy("source").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 5").drop("rn")
        .orderBy(F.asc("source"), F.desc("tfidf"), F.asc("term"))
    )


_QL_STOPS = "'the', 'a', 'of', 'and', 'to'"


@register(
    "q86_quality_logistic",
    oracle=f"""
    WITH feat AS (
        SELECT source,
               len({{toks}}) AS n_tok,
               length(regexp_replace(trim(text), '\\s+', '', 'g'))
                   AS n_word_chars,
               len(list_filter({{toks}}, x -> x IN ({_QL_STOPS})))
                   AS n_stop
        FROM documents
    ), z AS (
        -- 0.03 must be a DOUBLE literal: DuckDB parses bare decimal
        -- literals as DECIMAL, making 0.03 * n_tok EXACT decimal
        -- arithmetic while Spark's 0.03D * n_tok rounds once in binary —
        -- an ulp apart for some n_tok, which flips floor(score*5) bands
        -- (surfaced at sf1: 14 band rows differed; e0 notation pins the
        -- same double-rounded tree on both engines)
        SELECT source,
               -2.0e0 + 0.03e0 * n_tok
                    + 4.0e0 * (CAST(n_stop AS DOUBLE) / n_tok)
                    - 0.5e0 * abs(CAST(n_word_chars AS DOUBLE) / n_tok
                                  - 5.0e0)
                   AS z
        FROM feat
    ), s AS (
        SELECT source, 0.5 + z / (2.0 * (1.0 + abs(z))) AS score FROM z
    )
    SELECT source,
           CAST(floor(score * 5) AS BIGINT) AS score_band,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS avg_score
    FROM s GROUP BY source, score_band
    """.format(toks=tokens_duck("text")),
    doc="F16 linear quality classifier (the fasttext-style pretraining "
        "keep/drop gate, deterministic weights): per-doc features "
        "(token count, stopword fraction, mean word length) -> linear "
        "score -> the algebraic sigmoid 0.5 + z/(2(1+|z|)) instead of "
        "1/(1+exp(-z)) — exp() is not correctly-rounded IEEE so its "
        "last-ulp differences between libm and the JVM could flip a "
        "floor(score*5) band, while the algebraic form uses only "
        "correctly-rounded ops and is bit-identical across engines "
        "(same monotone S-shape, same 0.5 decision point at z=0). "
        "Output: per (source, score band) doc counts, kept count at "
        "the 0.5 threshold, exact-decimal mean score. Pure map + one "
        "hash-agg — at 100 TB this is a single pass with map-side "
        "partial aggregation and no joins [EXT].",
)
def q86_quality_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    toks = tokens_spark("text")
    feat = docs.selectExpr(
        "source",
        f"size({toks}) AS n_tok",
        "length(regexp_replace(trim(text), '\\\\s+', '')) AS n_word_chars",
        f"size(filter({toks}, x -> x IN ({_QL_STOPS}))) AS n_stop")
    z = feat.selectExpr(
        "source",
        "-2.0D + 0.03D * n_tok"
        " + 4.0D * (CAST(n_stop AS DOUBLE) / n_tok)"
        " - 0.5D * abs(CAST(n_word_chars AS DOUBLE) / n_tok - 5.0D) AS z")
    s = z.selectExpr("source", "0.5D + z / (2.0D * (1.0D + abs(z))) AS score")
    return (
        s.groupBy("source",
                  F.floor(F.col("score") * 5).cast("bigint")
                  .alias("score_band"))
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.sum(F.when(F.col("score") >= 0.5, 1).otherwise(0))
             .cast("bigint").alias("n_kept"),
             (F.sum(F.col("score").cast("decimal(18,6)")).cast("double")
              / F.count("*")).alias("avg_score"))
    )


# ---------------------------------------------------------------------------
# round-4: count-min sketch heavy hitters (constant-size frequency sketch)
# ---------------------------------------------------------------------------

from etl_transparencia_sergipe_spark.operators.hashing import (  # noqa: E402
    HASH_A as _CM_A,
    HASH_B as _CM_B,
    MERSENNE as _CM_P,
    h60_duck,
    h60_spark,
)

_CM_D, _CM_W = 4, 1024


def _cm_bucket(i: int, h60: str) -> str:
    """Row-i CM bucket of a pre-hashed token (shared by both engines)."""
    return (f"((({_CM_A[i]} * ({h60} % {_CM_P}) + {_CM_B[i]}) % {_CM_P})"
            f" % {_CM_W})")


@register(
    "q93_cm_heavy_hitters",
    oracle=f"""
    WITH vocab AS (
        SELECT t, COUNT(*) AS exact_cnt, {h60_duck('t')} AS h
        FROM (SELECT unnest({{toks}}) AS t FROM documents)
        GROUP BY t
    ), rows_ AS (
        SELECT i, CASE i {' '.join(
            f"WHEN {i} THEN {_cm_bucket(i, 'h')}" for i in range(_CM_D))}
               END AS b, exact_cnt, t
        FROM vocab, UNNEST(range({_CM_D})) AS r(i)
    ), cm AS (
        SELECT i, b, SUM(exact_cnt) AS cnt FROM rows_ GROUP BY i, b
    ), est AS (
        SELECT r.t, MAX(r.exact_cnt) AS exact_cnt, MIN(cm.cnt) AS cm_est
        FROM rows_ r JOIN cm ON r.i = cm.i AND r.b = cm.b
        GROUP BY r.t
    )
    SELECT t AS token, CAST(exact_cnt AS BIGINT) AS exact_cnt,
           CAST(cm_est AS BIGINT) AS cm_est,
           CAST(cm_est - exact_cnt AS BIGINT) AS overcount
    FROM est ORDER BY exact_cnt DESC, token ASC LIMIT 20
    """.format(toks=tokens_duck("text")),
    doc="A8/F16 count-min-sketch heavy hitters: a d=4 x w=1024 CM sketch "
        "of corpus token frequencies — CONSTANT size (16 KB of counters) "
        "no matter the corpus, the property that lets a 100 TB pipeline "
        "keep a mergeable frequency summary per shard and union by "
        "elementwise addition. Built from the vocab (each DISTINCT token "
        "hashed once, counts added weighted), not the raw stream — "
        "identical counters, vocab-sized work. Estimates are "
        "min-over-rows; overcount >= 0 always, reported per top-20 "
        "token so the gate certifies estimator quality EXACTLY (all "
        "integer arithmetic on the shared md5-derived hash family — "
        "bit-identical in DuckDB, full hash match, unlike the "
        "DataSketches-backed q43/q92 which are rows-only) [EXT].",
)
def q93_cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    vocab = (docs.selectExpr(f"explode({tokens_spark('text')}) AS t")
             .groupBy("t").agg(F.count("*").alias("exact_cnt"))
             .selectExpr("t", "exact_cnt", f"{h60_spark('t')} AS h"))
    rows = vocab.selectExpr(
        "t", "exact_cnt",
        "explode(array(" + ", ".join(
            f"struct({i} AS i, {_cm_bucket(i, 'h')} AS b)"
            for i in range(_CM_D)) + ")) AS s"
    ).select("t", "exact_cnt", "s.i", "s.b")
    cm = rows.groupBy("i", "b").agg(F.sum("exact_cnt").alias("cnt"))
    est = (rows.join(F.broadcast(cm), ["i", "b"])
           .groupBy("t")
           .agg(F.max("exact_cnt").alias("exact_cnt"),
                F.min("cnt").alias("cm_est")))
    return (est.select(
        F.col("t").alias("token"),
        F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
        F.col("cm_est").cast("bigint").alias("cm_est"),
        (F.col("cm_est") - F.col("exact_cnt")).cast("bigint")
        .alias("overcount"))
        .orderBy(F.desc("exact_cnt"), F.asc("token")).limit(20))


# --- q100: BM25 retrieval scoring ------------------------------------------

_BM25_TERMS = ("window", "stream", "merge", "hash")


def _bm25_contrib(i: int, lit: str) -> str:
    """Per-term BM25 contribution, written with IDENTICAL expression
    shape and literal forms on both engines so every double is
    bit-identical (all ops are IEEE correctly-rounded: + - * /; the
    standard ln() idf is NOT — Java and libm logs can differ in the
    last ulp — so this uses the rational idf (N - df + 0.5)/(df + 0.5),
    a monotone-equivalent weighting; k1=1.2, b=0.75). ``lit`` is the
    engine's double-literal suffix style: 'D' (Spark) or 'e0' (DuckDB
    — bare 1.2 would parse as exact DECIMAL there and run different
    arithmetic, the q86 gotcha)."""
    idf = (f"((CAST(n_docs AS DOUBLE) - df{i} + 0.5{lit})"
           f" / (df{i} + 0.5{lit}))")
    avgdl = f"(CAST(total_dl AS DOUBLE) / n_docs)"
    tfn = (f"((tf{i} * 2.2{lit}) / (tf{i} + 1.2{lit} * "
           f"(1.0{lit} - 0.75{lit} + 0.75{lit} * (dl / {avgdl}))))")
    return f"({idf} * {tfn})"


_BM25_SCORE_SPARK = " + ".join(
    _bm25_contrib(i, "D") for i in range(len(_BM25_TERMS)))
_BM25_SCORE_DUCK = " + ".join(
    _bm25_contrib(i, "e0") for i in range(len(_BM25_TERMS)))
_BM25_HITS = " + ".join(
    f"CAST(tf{i} > 0 AS INT)" for i in range(len(_BM25_TERMS)))


@register(
    "q100_bm25_topk",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {tokens_duck('text')} AS toks FROM documents
    ), base AS (
        SELECT doc_id, len(toks) AS dl,
               {", ".join(f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
                          for i, t in enumerate(_BM25_TERMS))}
        FROM t
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS total_dl,
               {", ".join(
                   f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)"
                   f" AS BIGINT) AS df{i}"
                   for i in range(len(_BM25_TERMS)))}
        FROM base
    )
    SELECT doc_id, ({_BM25_SCORE_DUCK}) AS bm25,
           ({_BM25_HITS}) AS n_hits
    FROM base CROSS JOIN stats
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 20
    """,
    doc="F16 BM25 retrieval scoring [EXT]: rank the corpus against a "
        "fixed query-term set — the 'select domain-relevant documents' "
        "curation op (quality-weighted sampling precedent: DSIR/"
        "importance resampling pipelines). ONE corpus scan computes "
        "doc length and per-term tf as codegen column expressions (no "
        "explode, no per-term shuffle); corpus stats (N, avgdl, df) "
        "are a 1-row broadcast; scoring is a pure map-side expression "
        "and top-20 is TakeOrderedAndProject. Rational-idf variant for "
        "cross-engine bit-determinism (ln is not correctly rounded; "
        "see _bm25_contrib) — the raw double score hash-matches. At "
        "100 TB: scan-bound, embarrassingly parallel, the only "
        "exchange is the final top-k.",
)
def q100_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.dedup import (
        tokens_spark,
    )

    docs = load(spark, "documents", sf_dir)
    base = (
        docs.selectExpr("doc_id", f"{tokens_spark('text')} AS toks")
        .selectExpr(
            "doc_id", "size(toks) AS dl",
            *[f"size(filter(toks, x -> x = '{t}')) AS tf{i}"
              for i, t in enumerate(_BM25_TERMS)])
    )
    from etl_transparencia_sergipe_spark.caching import persist_scoped

    base = base.transform(persist_scoped)
    stats = base.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_dl"),
        *[F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
          .cast("bigint").alias(f"df{i}")
          for i in range(len(_BM25_TERMS))])
    return (
        base.crossJoin(F.broadcast(stats))
        .selectExpr("doc_id", f"({_BM25_SCORE_SPARK}) AS bm25",
                    f"({_BM25_HITS}) AS n_hits")
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


# --- q108: BPE vocabulary induction (round-7 VERDICT item 8) ---------------

_Q108_MERGES = 16


def _q108_oracle_py(con):
    """Independent reference BPE trainer: pull the word-frequency table
    from DuckDB (tokens_duck — the cross-engine whitespace tokenizer),
    then run the textbook merge loop in plain Python with the same
    deterministic tie-break (max pair count, then lexicographic
    (left, right)). Bit-for-bit identical to the Spark fold or the hash
    gate fails."""
    from etl_transparencia_sergipe_spark.operators.dedup import (
        tokens_duck,
    )

    wf = con.execute(f"""
        SELECT t AS word, COUNT(*) AS freq
        FROM documents, unnest({tokens_duck('text')}) AS u(t)
        GROUP BY t
    """).fetchdf()
    vocab = [(list(w), int(f)) for w, f in
             zip(wf["word"], wf["freq"]) if len(w) > 0]

    import pandas as pd

    rows = []
    for rank in range(_Q108_MERGES):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        # max count, ties to lexicographically smallest (left, right)
        (l, r), cnt = min(counts.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        rows.append((rank, l, r, l + r, cnt))
        merged = l + r
        nxt = []
        for syms, f in vocab:
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = merged
                else:
                    out.append(s)
            nxt.append((out, f))
        vocab = nxt
    return pd.DataFrame(
        rows, columns=["rank", "left", "right", "merged", "pair_count"])


@register(
    "q108_bpe_vocab_induction",
    oracle=None,  # iterative algorithm: rows-only at the driver; the
    # oracle_py twin below hash-verifies it in the local gate (the
    # q62/q92 contract for non-SQL-expressible queries)
    oracle_py=_q108_oracle_py,
    doc="F16/[EXT] BPE vocabulary INDUCTION — learn the merge table "
        "from the corpus (Sennrich et al. 2016), the tokenizer-training "
        "step q23's fixed merge table presupposes. One corpus scan "
        "builds the word-frequency table (distinct words weighted by "
        "freq — every later round is vocabulary-sized); each of the "
        f"{_Q108_MERGES} rounds is one pair-count hash-agg (partial "
        "map-side, shuffle = distinct pairs), a deterministic top-1 "
        "(max count, lexicographic tie-break), and a codegen "
        "aggregate() fold contracting the chosen pair left-to-right. "
        "Output = the rank-ordered merge table. The oracle is an "
        "independent plain-Python reimplementation over DuckDB's "
        "word-frequency table (same tie-break) — bit-identical or the "
        "local hash gate fails; no pure-SQL form exists (iterative), "
        "so the driver records rows-only (the q62/q92 contract). "
        "100 TB: the corpus is read once; rounds never touch it again.",
)
def q108_bpe_vocab_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.bpe import (
        bpe_merge_table,
    )

    docs = load(spark, "documents", sf_dir)
    return bpe_merge_table(docs, "text", _Q108_MERGES)
