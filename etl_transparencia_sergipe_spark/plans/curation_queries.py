"""Corpus-curation queries beyond dedup ([EXT] training-data pipeline
surface): benchmark decontamination, domain-mixture reweighting, and
repetition-based quality signals. All pure DataFrame/codegen expression
work with full DuckDB oracles.

Reference anchor: the reference curates by hand-picked substring filters
(main.py:57-58) and per-source file consolidation (file_utils.py:22-57);
these queries are the corpus-scale generalizations a pretraining pipeline
runs over the same shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.operators.dedup import (
    shingle_rows,
    shingles_duck,
    tokens_duck,
    tokens_spark,
)
from etl_transparencia_sergipe_spark.operators.hashing import (
    h60_duck,
    h60_spark,
    perm_hash_duck,
)
from etl_transparencia_sergipe_spark.plans._helpers import load
from etl_transparencia_sergipe_spark.plans.registry import register

# pseudo-benchmark membership: a stable id predicate stands in for "doc is
# in an eval set" (real pipelines join against the benchmark corpus)
_BENCH_PRED_SPARK = "doc_id % 97 = 0"
_BENCH_PRED_DUCK = "doc_id % 97 = 0"
_DECON_N = 4  # n-gram size; real decontamination uses 8-13-gram windows


@register(
    "q64_decontamination",
    oracle=f"""
    WITH bench AS (
        SELECT DISTINCT unnest({shingles_duck('text', _DECON_N)}) AS s
        FROM documents WHERE {_BENCH_PRED_DUCK}
    ), corp AS (
        SELECT doc_id, unnest({shingles_duck('text', _DECON_N)}) AS s
        FROM documents WHERE NOT ({_BENCH_PRED_DUCK})
    ), hits AS (
        SELECT doc_id, COUNT(DISTINCT s) AS n_shared
        FROM corp JOIN bench USING (s) GROUP BY doc_id
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(h.n_shared) AS BIGINT) AS n_contaminated,
           CAST(COALESCE(SUM(h.n_shared), 0) AS BIGINT) AS total_shared_grams
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE NOT ({_BENCH_PRED_DUCK})
    GROUP BY d.source
    """,
    doc="benchmark decontamination scan [EXT]: flag training docs sharing "
        f"any {_DECON_N}-gram with the (pseudo-)benchmark set, per-source "
        "accounting. Scale shape: the benchmark's distinct n-grams are a "
        "SMALL broadcast set (eval suites are tiny next to the corpus), "
        "so the overlap test is a map-side broadcast semi-join on the "
        "exploded corpus gram stream — no corpus self-shuffle. Real "
        "pipelines use 8-13-gram windows; 4 here so the synthetic corpus "
        "yields hits.",
)
def q64_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    bench_g = (
        shingle_rows(docs.filter(_BENCH_PRED_SPARK), "doc_id", "text",
                     _DECON_N)
        .select("s").distinct()
    )
    corp = docs.filter(f"NOT ({_BENCH_PRED_SPARK})")
    corp_g = shingle_rows(corp, "doc_id", "text", _DECON_N)
    hits = (
        corp_g.join(F.broadcast(bench_g), "s")
        .groupBy("doc_id")
        .agg(F.countDistinct("s").alias("n_shared"))
    )
    return (
        corp.select("doc_id", "source")
        .join(hits, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count("n_shared").cast("bigint").alias("n_contaminated"),
            F.coalesce(F.sum("n_shared"), F.lit(0)).cast("bigint")
            .alias("total_shared_grams"),
        )
    )


@register(
    "q65_domain_mixture",
    oracle="""
    WITH s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+'))
                        END) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    )
    SELECT source, n_docs, tokens,
           CAST(tokens AS DOUBLE) / SUM(tokens) OVER () AS natural_share,
           1.0 / COUNT(*) OVER () AS target_share,
           CAST(SUM(tokens) OVER () AS DOUBLE)
               / (COUNT(*) OVER () * tokens) AS sampling_rate
    FROM s
    """,
    doc="domain-mixture reweighting [EXT]: per-source token mass, natural "
        "vs uniform target share, and the per-source sampling rate that "
        "hits the target (rate = total/(n_sources*tokens)). All ratios "
        "divide exact integer sums, so bit-identical cross-engine. At "
        "scale this is one partial-agg pass plus a window over the tiny "
        "per-source frame; the rates then drive a map-side hash-sample "
        "filter exactly like q54's split buckets.",
)
def q65_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from etl_transparencia_sergipe_spark.plans.textops import token_count

    docs = load(spark, "documents", sf_dir)
    s = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(token_count("text")).cast("bigint").alias("tokens"),
    )
    w = W.partitionBy()
    return s.select(
        "source", "n_docs", "tokens",
        (F.col("tokens").cast("double") / F.sum("tokens").over(w))
        .alias("natural_share"),
        (F.lit(1.0) / F.count("*").over(w)).alias("target_share"),
        (F.sum("tokens").over(w).cast("double")
         / (F.count("*").over(w) * F.col("tokens")))
        .alias("sampling_rate"),
    )


@register(
    "q66_repetition_ratio",
    oracle=f"""
    WITH per_doc AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+'))
               END AS ntok,
               len({shingles_duck('text', 2)}) AS dist
        FROM documents
    ), counted AS (
        SELECT doc_id,
               CASE WHEN ntok < 2 THEN 1 ELSE ntok - 1 END AS tot, dist
        FROM per_doc
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(c.tot) AS BIGINT) AS total_bigrams,
           CAST(SUM(c.dist) AS BIGINT) AS distinct_bigrams,
           1.0 - CAST(SUM(c.dist) AS DOUBLE) / SUM(c.tot) AS rep_ratio,
           CAST(SUM(CASE WHEN 10 * c.dist < 7 * c.tot THEN 1 ELSE 0 END)
                AS BIGINT) AS n_high_rep
    FROM documents d JOIN counted c USING (doc_id)
    GROUP BY d.source
    """,
    doc="repetition-ratio quality signal [EXT] (Gopher-style duplicate "
        "n-gram fraction): per-doc token-bigram total vs distinct counts, "
        "rolled up per source with a corpus repetition ratio and a count "
        "of high-repetition docs (>30% duplicate bigrams — tested as the "
        "all-integer inequality 10*distinct < 7*total, so no double "
        "compares cross-engine). Per-doc counts come off the exploded "
        "gram stream with map-side partial aggregation.",
)
def q66_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.plans.textops import token_count

    docs = load(spark, "documents", sf_dir)
    counted = (
        shingle_rows(docs, "doc_id", "text", 2)
        .groupBy("doc_id")
        .agg(F.count("*").alias("tot"), F.countDistinct("s").alias("dist"))
    )
    return (
        docs.select("doc_id", "source")
        .join(counted, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("tot").cast("bigint").alias("total_bigrams"),
            F.sum("dist").cast("bigint").alias("distinct_bigrams"),
            (F.lit(1.0) - F.sum("dist").cast("double") / F.sum("tot"))
            .alias("rep_ratio"),
            F.sum(F.when(10 * F.col("dist") < 7 * F.col("tot"), 1)
                  .otherwise(0)).cast("bigint").alias("n_high_rep"),
        )
    )


@register(
    "q68_mixture_sample",
    oracle=f"""
    WITH s AS (
        SELECT source,
               CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+'))
                        END) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ), rates AS (
        SELECT source,
               CAST(SUM(tokens) OVER () AS DOUBLE)
                   / (COUNT(*) OVER () * tokens) AS rate
        FROM s
    ), sampled AS (
        SELECT d.source, d.doc_id,
               CASE WHEN length(trim(d.text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(d.text), '\\s+'))
               END AS n_tok
        FROM documents d JOIN rates r USING (source)
        WHERE ({h60_duck("CAST(d.doc_id AS VARCHAR)")} % 1000000)
              < CAST(FLOOR(LEAST(r.rate, 1.0) * 1000000) AS BIGINT)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(n_tok) AS BIGINT) AS sampled_tokens
    FROM sampled GROUP BY source
    """,
    doc="deterministic mixture sampling [EXT]: materialize q65's "
        "per-source sampling rates as a hash-bucket filter (keep doc iff "
        "h(doc_id) mod 1e6 < rate*1e6) and account the achieved sample — "
        "the reproducible-across-engines/runs subsample that seed-based "
        "sampling can't give. The rate*1e6 threshold goes through an "
        "explicit floor() before the BIGINT cast on BOTH engines — a bare "
        "double->BIGINT cast truncates on Spark but rounds-to-nearest on "
        "DuckDB, so frac>=0.5 thresholds would diverge by one bucket. "
        "floor of an identical double is bit-deterministic. Map-side "
        "filter + small broadcast of the per-source rate frame at any "
        "scale.",
)
def q68_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from etl_transparencia_sergipe_spark.operators.hashing import h60_spark
    from etl_transparencia_sergipe_spark.plans.textops import token_count

    docs = load(spark, "documents", sf_dir)
    s = docs.groupBy("source").agg(
        F.sum(token_count("text")).cast("bigint").alias("tokens"))
    w = W.partitionBy()
    rates = s.select(
        "source",
        (F.sum("tokens").over(w).cast("double")
         / (F.count("*").over(w) * F.col("tokens"))).alias("rate"))
    bucket = F.expr(f"{h60_spark('CAST(doc_id AS STRING)')} % 1000000")
    sampled = (
        docs.withColumn("n_tok", token_count("text"))
        .join(F.broadcast(rates), "source")
        .filter(bucket < F.floor(F.least(F.col("rate"), F.lit(1.0)) * 1000000)
                .cast("bigint"))
    )
    return sampled.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_sampled"),
        F.sum("n_tok").cast("bigint").alias("sampled_tokens"),
    )


@register(
    "q72_boilerplate_rules",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+'))
               AS t
        FROM documents
    ), f AS (
        SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t
    ), m AS (
        SELECT doc_id, MAX(c) AS maxc, SUM(c) AS tot FROM f GROUP BY doc_id
    ), flags AS (
        SELECT d.source,
               CASE WHEN (CASE WHEN length(trim(d.text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(d.text), '\s+'))
                          END) < 15 THEN 1 ELSE 0 END AS too_short,
               CASE WHEN COALESCE(m.maxc, 0) * 5 > COALESCE(m.tot, 1)
                    THEN 1 ELSE 0 END AS dominant_token,
               CASE WHEN len(regexp_extract_all(d.text, '[0-9]')) * 10
                         > d.n_chars THEN 1 ELSE 0 END AS numeric_heavy
        FROM documents d LEFT JOIN m USING (doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(too_short) AS BIGINT) AS n_too_short,
           CAST(SUM(dominant_token) AS BIGINT) AS n_dominant_token,
           CAST(SUM(numeric_heavy) AS BIGINT) AS n_numeric_heavy,
           CAST(SUM(CASE WHEN too_short + dominant_token + numeric_heavy
                         = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM flags GROUP BY source
    """,
    doc="C4-style boilerplate rule filter [EXT]: per-source accounting of "
        "rule violations — too-short docs (<15 tokens), dominant-token "
        "docs (one token > 20% of the stream, the 'lorem lorem lorem' "
        "signal), digit-heavy docs (>10% digit chars) — and the kept "
        "count after applying all rules. The dominant-token rule is the "
        "only non-map-side piece: explode -> per-(doc, token) partial-agg "
        "counts -> per-doc max/sum, the same corpus-proportional shuffle "
        "as vocab building (q53). All thresholds are integer-scaled "
        "comparisons, so the hash is bit-exact cross-engine. Reference "
        "anchor: the hand-picked substring exclusion filter main.py:57.",
)
def q72_boilerplate_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.plans.textops import token_count

    docs = load(spark, "documents", sf_dir)
    tok = docs.selectExpr(
        "doc_id", "explode(split(lower(trim(text)), '\\\\s+')) AS t")
    m = (
        tok.groupBy("doc_id", "t").count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("maxc"), F.sum("count").alias("tot"))
    )
    flags = (
        docs.select(
            "doc_id", "source", "n_chars",
            token_count("text").alias("ntok"),
            F.expr("regexp_count(text, '[0-9]')").alias("digits"))
        .join(m, "doc_id", "left")
        .select(
            "source",
            F.when(F.col("ntok") < 15, 1).otherwise(0).alias("too_short"),
            F.when(F.coalesce("maxc", F.lit(0)) * 5
                   > F.coalesce("tot", F.lit(1)), 1)
            .otherwise(0).alias("dominant_token"),
            F.when(F.col("digits") * 10 > F.col("n_chars"), 1)
            .otherwise(0).alias("numeric_heavy"),
        )
    )
    return flags.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("too_short").cast("bigint").alias("n_too_short"),
        F.sum("dominant_token").cast("bigint").alias("n_dominant_token"),
        F.sum("numeric_heavy").cast("bigint").alias("n_numeric_heavy"),
        F.sum(F.when(F.col("too_short") + F.col("dominant_token")
                     + F.col("numeric_heavy") == 0, 1).otherwise(0))
        .cast("bigint").alias("n_kept"),
    )


@register(
    "q80_token_budget_sample",
    oracle=f"""
    WITH sized AS (
        SELECT source, doc_id,
               len({tokens_duck('text')}) AS n_tok,
               {h60_duck("CAST(doc_id AS VARCHAR)")} AS h
        FROM documents
    ), ranked AS (
        SELECT *, SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_tok
        FROM sized
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_kept
    FROM ranked WHERE cum_tok <= 20000
    GROUP BY source
    """,
    doc="Curation: deterministic token-budget downsampling — each source "
        "keeps docs in hash-of-id order until a 20k-token budget is "
        "reached (the mixture-building step after q65 sets per-source "
        "rates) [EXT]. Hash order is a reproducible shuffle (no seed "
        "drift across engines/runs) and the cutoff is an all-integer "
        "running sum, so the kept set is bit-stable. Scale shape: one "
        "shuffle on source + an in-partition sort for the window; for "
        "sources too large to sort, the q68 hash-bucket filter is the "
        "pre-prune (sample first, budget-trim second).",
)
def q80_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load(spark, "documents", sf_dir)
    sized = docs.selectExpr(
        "source", "doc_id",
        f"size({tokens_spark('text')}) AS n_tok",
        f"{h60_spark('CAST(doc_id AS STRING)')} AS h")
    w = (W.partitionBy("source").orderBy("h", "doc_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    ranked = sized.withColumn("cum_tok", F.sum("n_tok").over(w))
    return (
        ranked.filter("cum_tok <= 20000")
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_docs_kept"),
             F.sum("n_tok").cast("bigint").alias("tokens_kept"))
    )


# --- DSIR-style importance resampling (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling") -----------------------
_DSIR_B = 1024               # hashed-feature buckets
_DSIR_TARGET = "lang = 'en'"  # target-domain proxy (the paper's target set)


@register(
    "q104_dsir_importance_sample",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang,
               ({h60_duck('t')}) % {_DSIR_B} AS bucket
        FROM documents, unnest({tokens_duck('text')}) AS u(t)
    ),
    raw_model AS (
        SELECT bucket, COUNT(*) AS r FROM toks GROUP BY bucket
    ),
    tgt_model AS (
        SELECT bucket, COUNT(*) AS t FROM toks
        WHERE {_DSIR_TARGET} GROUP BY bucket
    ),
    totals AS (
        SELECT (SELECT COUNT(*) FROM toks) AS rtot,
               (SELECT COUNT(*) FROM toks WHERE {_DSIR_TARGET}) AS ttot
    ),
    ratio AS (
        SELECT rm.bucket,
               CAST(floor(
                   1000000.0e0
                   * CAST((COALESCE(tm.t, 0) + 1)
                          * (totals.rtot + {_DSIR_B}) AS DOUBLE)
                   / CAST((rm.r + 1)
                          * (totals.ttot + {_DSIR_B}) AS DOUBLE)
               ) AS BIGINT) AS ratio_q6
        FROM raw_model rm
        LEFT JOIN tgt_model tm ON tm.bucket = rm.bucket
        CROSS JOIN totals
    ),
    doc_buckets AS (
        SELECT doc_id, lang, bucket, COUNT(*) AS c
        FROM toks GROUP BY doc_id, lang, bucket
    ),
    scores AS (
        SELECT db.doc_id, db.lang,
               CAST(SUM(db.c * ratio.ratio_q6) AS BIGINT) AS score
        FROM doc_buckets db JOIN ratio ON ratio.bucket = db.bucket
        GROUP BY db.doc_id, db.lang
    ),
    smax AS (SELECT MAX(score) AS m FROM scores),
    kept AS (
        SELECT s.lang, s.score,
               CASE WHEN ({h60_duck('CAST(s.doc_id AS VARCHAR)')}) % 1000000
                    < CAST(floor(1000000.0e0 * CAST(s.score AS DOUBLE)
                                 / CAST(smax.m AS DOUBLE)) AS BIGINT)
                    THEN 1 ELSE 0 END AS keep
        FROM scores s CROSS JOIN smax
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(keep) AS BIGINT) AS n_kept,
           CAST(SUM(score) AS BIGINT) AS score_sum
    FROM kept GROUP BY lang
    """,
    doc="DSIR-style importance resampling (Xie et al. 2023) [EXT]: score "
        "every document by how target-domain-like its hashed-unigram "
        "distribution is, then hash-resample with probability "
        "proportional to the score. Features are portable-md5-hashed "
        f"unigrams in {_DSIR_B} buckets; the target/raw bucket models "
        "use Laplace(+1) smoothing and the per-bucket importance weight "
        "is a RATIONAL ratio quantized to 1e-6 — the q100 rational-idf "
        "precedent: no ln() anywhere, so scores are bit-identical "
        "cross-engine (the paper's log-ratio is a monotone per-bucket "
        "transform of the same counts; this variant keeps the ranking "
        "signal while staying hash-verifiable; exact-integer products "
        "stay under 2^53 for per-bucket token counts < ~3e9 — beyond "
        "that shard the model). The resample keeps a doc iff "
        "h60(doc_id) mod 1e6 < 1e6 * score / max_score — deterministic, "
        "reproducible across runs and engines (the q68 hash-bucket "
        "pattern). 100 TB shape: the B-bucket model is two partial "
        "aggregates + one broadcast; scoring shuffles (doc_id, bucket) "
        "once then doc_id once; no driver-side state beyond the 1-row "
        "max.",
)
def q104_dsir_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.textstats import dsir_keep

    docs = load(spark, "documents", sf_dir)
    # score = sum over TOKENS of ratio[bucket(token)] — identical exact
    # integer sum to the oracle's count-then-multiply doc_buckets CTE,
    # but the broadcast-join + doc_id partial agg compresses map-side to
    # ~1 row per doc per partition, so no (doc_id, bucket)-sized shuffle
    # (measured 4.2 s of the sf1 wall in the first formulation)
    kept = dsir_keep(docs, _DSIR_TARGET, n_buckets=_DSIR_B)
    return (
        kept.groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.sum("keep").cast("bigint").alias("n_kept"),
             F.sum("score").cast("bigint").alias("score_sum"))
    )


# --- Bloom-filter decontamination ---------------------------------------
# A portable, SQL-expressible Bloom filter: W 64-bit words aggregated
# with bit_or, k=4 universal hashes from the shared md5-based family
# (operators/hashing.py). The mergeable-bitset shape is THE way a
# benchmark-membership test ships to 1000 executors at 100 TB: the
# filter is built once (tiny aggregate), broadcast as W*8 bytes, and
# every probe is pure codegen bit arithmetic — no gram set shuffled.
_BLOOM_W = 16384   # words; 63 usable bits each (DuckDB raises on 1<<63)
_BLOOM_K = 4


@register(
    "q105_bloom_decontamination",
    oracle=f"""
    WITH bench AS (
        SELECT DISTINCT unnest({shingles_duck('text', _DECON_N)}) AS s
        FROM documents WHERE {_BENCH_PRED_DUCK}
    ),
    bloom AS (
        SELECT word, bit_or(mask) AS bits FROM (
            {" UNION ALL ".join(
                f"SELECT (({perm_hash_duck('s', i)}) % {_BLOOM_W * 63})"
                f" // 63 AS word,"
                f" (CAST(1 AS BIGINT) <<"
                f" ((({perm_hash_duck('s', i)}) % {_BLOOM_W * 63}) % 63))"
                f" AS mask FROM bench"
                for i in range(_BLOOM_K))}
        ) GROUP BY word
    ),
    corp AS (
        SELECT doc_id, source, unnest({shingles_duck('text', _DECON_N)}) AS s
        FROM documents WHERE NOT ({_BENCH_PRED_DUCK})
    ),
    probe AS (
        SELECT c.source, c.s,
               CASE WHEN {" AND ".join(
                   f"COALESCE(b{i}.bits, 0) & (CAST(1 AS BIGINT) <<"
                   f" ((({perm_hash_duck('c.s', i)}) % {_BLOOM_W * 63})"
                   f" % 63)) != 0"
                   for i in range(_BLOOM_K))}
                    THEN 1 ELSE 0 END AS bloom_hit,
               CASE WHEN e.s IS NOT NULL THEN 1 ELSE 0 END AS exact_hit
        FROM corp c
        {" ".join(
            f"LEFT JOIN bloom b{i} ON b{i}.word ="
            f" ((({perm_hash_duck('c.s', i)}) % {_BLOOM_W * 63}) // 63)"
            for i in range(_BLOOM_K))}
        LEFT JOIN bench e ON e.s = c.s
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(bloom_hit) AS BIGINT) AS bloom_hits,
           CAST(SUM(exact_hit) AS BIGINT) AS exact_hits,
           CAST(SUM(bloom_hit) - SUM(exact_hit) AS BIGINT) AS false_pos
    FROM probe GROUP BY source
    """,
    doc="Bloom-filter benchmark decontamination [EXT]: membership of "
        f"every corpus {_DECON_N}-gram in the benchmark gram set tested "
        f"against a {_BLOOM_W}-word (63 usable bits/word, ~1M-bit) "
        f"Bloom filter (k={_BLOOM_K} "
        "universal hashes from the shared portable md5 family), with the "
        "exact broadcast-join containment (q64's check) run in the SAME "
        "plan so the output SELF-REPORTS the false-positive count per "
        "source — bloom_hits >= exact_hits always, and the gap is the "
        "measured fp rate at the current fill factor. 100 TB shape: the "
        "filter builds with one partial-aggregable bit_or over the "
        "(small) benchmark grams, broadcasts as 128 KB, and probes are "
        "pure codegen bit arithmetic via 4 broadcast word lookups — the "
        "corpus gram stream is never shuffled (the exact check "
        "broadcasts the bench set too; at real scale where the bench "
        "set outgrows a broadcast, the Bloom filter IS the answer and "
        "the exact column is dropped). Bits and hashes identical in "
        "both engines: hash-verified vs the full SQL oracle.",
)
def q105_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.hashing import (
        perm_hash_spark,
    )

    docs = load(spark, "documents", sf_dir)
    bench_g = (
        shingle_rows(docs.filter(_BENCH_PRED_SPARK), "doc_id", "text",
                     _DECON_N)
        .select("s").distinct()
    )
    m_bits = _BLOOM_W * 63
    # build: k (word, mask) rows per gram, bit_or per word
    pos = [(f"(({perm_hash_spark('s', i)}) % {m_bits})")
           for i in range(_BLOOM_K)]
    stacked = bench_g.selectExpr(
        f"stack({_BLOOM_K}, "
        + ", ".join(f"{p} DIV 63, shiftleft(CAST(1 AS BIGINT), {p} % 63)"
                    for p in pos)
        + ") AS (word, mask)")
    bloom = stacked.groupBy("word").agg(F.expr("bit_or(mask)").alias("bits"))

    # per-doc DISTINCT gram stream (shingles_duck is list_distinct, so
    # the oracle's unnest emits each gram once per doc — match it); the
    # distinct is the one gram-stream shuffle this query pays
    corp_g = shingle_rows(
        docs.filter(f"NOT ({_BENCH_PRED_SPARK})"), "doc_id", "text",
        _DECON_N, carry=("source",)).distinct()
    probe = corp_g
    hit_terms = []
    for i in range(_BLOOM_K):
        p = f"(({perm_hash_spark('s', i)}) % {m_bits})"
        b = bloom.selectExpr(f"word AS w{i}", f"bits AS bits{i}")
        probe = probe.join(F.broadcast(b),
                           F.expr(f"{p} DIV 63") == F.col(f"w{i}"), "left")
        hit_terms.append(
            f"(COALESCE(bits{i}, CAST(0 AS BIGINT))"
            f" & shiftleft(CAST(1 AS BIGINT), {p} % 63)) != 0")
    exact = bench_g.selectExpr("s", "1 AS e")
    probe = (
        probe.join(F.broadcast(exact), "s", "left")
        .selectExpr(
            "source",
            f"CASE WHEN {' AND '.join(hit_terms)} THEN 1 ELSE 0 END"
            " AS bloom_hit",
            "CASE WHEN e IS NOT NULL THEN 1 ELSE 0 END AS exact_hit")
    )
    return (
        probe.groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_grams"),
             F.sum("bloom_hit").cast("bigint").alias("bloom_hits"),
             F.sum("exact_hit").cast("bigint").alias("exact_hits"),
             (F.sum("bloom_hit") - F.sum("exact_hit")).cast("bigint")
             .alias("false_pos"))
    )
