"""Text-analysis operators (LLM-pipeline [EXT]): language ID, quality
scoring, token counting, document fingerprinting.

All pure column expressions (codegen'd, no Python) with DuckDB twins. The
reference's text handling is the normalizar pipeline
(aracaju_barra_pirambu_scraper.py:39-43); these generalize it to the
training-data-curation surface mandated by the north star.
"""

from __future__ import annotations

# Tiny per-language stopword sets for the n-gram/stopword heuristic.
# Deterministic tie order: en > es > de > fr > zh (argmax by count, then
# this priority).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "a", "in", "that"),
    "es": ("el", "la", "de", "que", "y", "los", "es", "una"),
    "de": ("der", "die", "und", "das", "nicht", "ist", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans"),
    "zh": ("de5", "shi4", "le5", "bu4", "zai4", "you3", "he2", "ren2"),
}

_PRIORITY = ("en", "es", "de", "fr", "zh")


def _inlist(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def lang_hits_spark(tokens_expr: str, lang: str) -> str:
    return (f"size(filter({tokens_expr}, "
            f"t -> t IN ({_inlist(LANG_STOPWORDS[lang])})))")


def lang_hits_duck(tokens_expr: str, lang: str) -> str:
    return (f"len(list_filter({tokens_expr}, "
            f"t -> t IN ({_inlist(LANG_STOPWORDS[lang])})))")


def langid_case(hits_fn, tokens_expr: str) -> str:
    """Argmax over language hit counts with deterministic priority order.

    Emits a CASE chain: a language wins iff its count is strictly greater
    than every higher-priority language and >= every lower-priority one;
    all-zero -> 'und'.
    """
    counts = {g: hits_fn(tokens_expr, g) for g in _PRIORITY}
    top = f"greatest({', '.join(counts.values())})"
    whens = []
    for g in _PRIORITY:
        whens.append(f"WHEN {counts[g]} = {top} THEN '{g}'")
    return (f"CASE WHEN {top} = 0 THEN 'und' " + " ".join(whens) + " END")


def quality_score_spark(text: str) -> str:
    """Composite quality score in [0,1]: length band + alpha ratio +
    mean-word-length band. Mirrors common pretraining-corpus filters."""
    toks = f"split(lower(trim({text})), '\\\\s+')"
    n_chars = f"length({text})"
    n_alpha = f"length(regexp_replace({text}, '[^a-zA-Z]', ''))"
    n_tok = f"size({toks})"
    return (
        f"round((CASE WHEN {n_chars} BETWEEN 64 AND 4096 THEN 0.4 ELSE 0.0 END)"
        f" + (CASE WHEN {n_chars} > 0 AND CAST({n_alpha} AS DOUBLE) / {n_chars} > 0.6"
        f" THEN 0.3 ELSE 0.0 END)"
        f" + (CASE WHEN {n_tok} > 0 AND CAST({n_chars} AS DOUBLE) / {n_tok}"
        f" BETWEEN 3 AND 12 THEN 0.3 ELSE 0.0 END), 2)"
    )


def quality_score_duck(text: str) -> str:
    toks = f"string_split_regex(lower(trim({text})), '\\s+')"
    n_chars = f"length({text})"
    n_alpha = f"length(regexp_replace({text}, '[^a-zA-Z]', '', 'g'))"
    n_tok = f"len({toks})"
    return (
        f"round((CASE WHEN {n_chars} BETWEEN 64 AND 4096 THEN 0.4 ELSE 0.0 END)"
        f" + (CASE WHEN {n_chars} > 0 AND CAST({n_alpha} AS DOUBLE) / {n_chars} > 0.6"
        f" THEN 0.3 ELSE 0.0 END)"
        f" + (CASE WHEN {n_tok} > 0 AND CAST({n_chars} AS DOUBLE) / {n_tok}"
        f" BETWEEN 3 AND 12 THEN 0.3 ELSE 0.0 END), 2)"
    )


# BPE-ish subword proxy: count alternating alpha runs / digit runs /
# punctuation singletons — a cheap, deterministic stand-in for a tokenizer
# vocabulary count. NOTE: Spark SQL string literals process backslash
# escapes ('\s' -> 's'), so the Spark-side literal needs '\\s'; DuckDB
# literals keep backslashes as-is.
_BPE_SPARK = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]"
_BPE_DUCK = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def bpe_token_count_spark(text: str) -> str:
    return f"regexp_count({text}, '{_BPE_SPARK}')"


def bpe_token_count_duck(text: str) -> str:
    return f"len(regexp_extract_all({text}, '{_BPE_DUCK}'))"


def fingerprint_spark(text: str) -> str:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text (stable under reflow/case changes)."""
    return f"md5(regexp_replace(lower(trim({text})), '\\\\s+', ' '))"


def fingerprint_duck(text: str) -> str:
    return f"md5(regexp_replace(lower(trim({text})), '\\s+', ' ', 'g'))"


def hashed_bucket_counts(docs, id_col: str, text_col: str,
                         n_buckets: int,
                         carry_cols: tuple[str, ...] = (),
                         as_arrays: bool = False):
    """Per-document hashed-unigram bucket counts in ONE Arrow pass:
    DataFrame[id, *carry_cols, bucket, c] — bit-identical to

        docs.selectExpr(id, carry..., explode(tokens_spark(text)) AS t)
            .selectExpr(..., h60_spark('t') % n_buckets AS bucket)
            .groupBy(id, carry..., bucket).count()

    (pinned by tests/test_textstats_arrow.py on the real corpus), but
    the q02 term_filter_arrow playbook applied to the token-hash class
    (round-7 VERDICT item 2): the JVM expression pipeline materializes
    the exploded token stream and md5-hashes EVERY OCCURRENCE — and a
    consumer needing both a bucket model and per-doc scores pays that
    token pass twice. Here the text crosses Arrow once per batch;
    tokens are factorized so each UNIQUE token is md5-hashed once per
    task (a worker-local vocab cache persists across the task's
    batches — hash cost tracks vocabulary, not token count); the
    (doc, bucket) reduction happens in numpy before anything returns
    to the JVM. Both downstream aggregations then run over the
    compressed per-doc bucket rows.

    Cross-engine tokenization contract (exactly tokens_spark):
    trim = strip ASCII spaces only, Java-regex '\\\\s+' split with
    ASCII \\s (re.ASCII), empty/leading/trailing empty tokens kept as
    Java split(limit=-1) keeps them; null text yields no rows
    (explode-of-null semantics).

    ``as_arrays``: emit ONE row per document —
    [id, carry..., bucket array<bigint>, c array<bigint>] (buckets
    ascending) — instead of one row per (doc, bucket);
    ``explode(arrays_zip(bucket, c))`` recovers the row form exactly
    (pinned by the same test). Use it when the consumer wants per-doc
    vectors (one downstream pass). For dsir_keep's two-aggregate shape
    it is a MEASURED DEAD END: the smaller Arrow hand-off (50k vs 1.2M
    rows at sf1) is outweighed by paying explode(arrays_zip) in BOTH
    consumers of the persisted frame — 3.2 s vs 2.6 s warm at sf1.
    """
    import hashlib
    import re as _re

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    carry = list(carry_cols)
    carry_fields = [docs.schema[c] for c in carry]
    carry_ddl = "".join(f", {f.name} {f.dataType.simpleString()}"
                        for f in carry_fields)
    if as_arrays:
        schema = (f"{id_col} bigint{carry_ddl}, "
                  "bucket array<bigint>, c array<bigint>")
    else:
        schema = f"{id_col} bigint{carry_ddl}, bucket bigint, c bigint"
    splitter = _re.compile(r"\s+", _re.ASCII)

    def gen(batches):
        cache: dict[str, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            tok_lists = []
            for t in pdf[text_col]:
                if t is None:
                    tok_lists.append([])
                else:
                    tok_lists.append(
                        splitter.split(t.strip(" ").lower()))
            lens = np.fromiter((len(x) for x in tok_lists),
                               dtype=np.int64, count=len(tok_lists))
            if lens.sum() == 0:
                continue
            flat = np.empty(int(lens.sum()), dtype=object)
            pos = 0
            for x in tok_lists:
                flat[pos:pos + len(x)] = x
                pos += len(x)
            codes, uniques = pd.factorize(flat)
            ub = np.empty(len(uniques), dtype=np.int64)
            for i, tok in enumerate(uniques):
                v = cache.get(tok)
                if v is None:
                    v = int(hashlib.md5(tok.encode("utf-8"))
                            .hexdigest()[:15], 16) % n_buckets
                    cache[tok] = v
                ub[i] = v
            doc_idx = np.repeat(np.arange(len(ids)), lens)
            key = doc_idx * n_buckets + ub[codes]
            uk, counts = np.unique(key, return_counts=True)
            row = (uk // n_buckets).astype(np.int64)
            buckets = uk % n_buckets
            counts = counts.astype(np.int64)
            if as_arrays:
                # np.unique sorted key => per-doc runs are contiguous
                # with buckets ascending inside each run
                du, starts = np.unique(row, return_index=True)
                ends = np.append(starts[1:], len(row))
                cols = {id_col: ids[du]}
                for c in carry:
                    cols[c] = pdf[c].to_numpy()[du]
                cols["bucket"] = [buckets[s:e]
                                  for s, e in zip(starts, ends)]
                cols["c"] = [counts[s:e] for s, e in zip(starts, ends)]
            else:
                cols = {id_col: ids[row]}
                for c in carry:
                    cols[c] = pdf[c].to_numpy()[row]
                cols["bucket"] = buckets
                cols["c"] = counts
            yield pd.DataFrame(cols)

    return docs.select(id_col, *carry, text_col).mapInPandas(
        gen, schema=schema)


def dsir_keep(docs, target_pred: str, n_buckets: int = 1024,
              text_col: str = "text", id_col: str = "doc_id",
              carry_cols: tuple[str, ...] = ("lang",)):
    """DSIR-style importance resampling core (Xie et al. 2023) ->
    DataFrame[id, *carry_cols, score, keep].

    Scores each document by how target-domain-like its hashed-unigram
    distribution is (portable md5 h60 buckets, Laplace-smoothed
    target/raw count models, per-bucket RATIONAL importance ratio
    quantized to 1e-6 — the q100 rational-idf precedent, no ln()), then
    keeps a doc iff h60(id) mod 1e6 < 1e6 * score / max_score —
    deterministic resampling with probability proportional to score.
    q104 is the registered aggregate view; this operator is the
    reusable per-document form (tests drive it with a constructed
    two-vocabulary corpus, where the kept set must skew target-like).

    Scale: ONE Arrow token pass (hashed_bucket_counts — round-7 VERDICT
    item 2: the previous shape ran the explode+md5 token pipeline twice,
    once per aggregate; measured 8.2 s -> see BENCH_TABLES_r08) emits
    per-doc compressed (bucket, c) rows, persisted and shared by both
    aggregates: the n_buckets model is a partial-aggregable groupBy over
    those rows + broadcast; scoring joins the broadcast ratio and
    combines map-side on the doc id. Both persisted frames are
    model/doc-bucket sized, never token-stream sized.

    Second measured dead end (round 8, besides the as_arrays one): a
    TWO-pass form — pass A emitting per-task (bucket, r, t) partials
    with the ratio model collected to the driver, pass B emitting one
    (id, score) row per doc — eliminates the doc-x-bucket intermediate
    entirely but re-ships the TEXT across Arrow twice, and the text
    transfer is the dominant cost: 3.1-3.7 s vs 2.6 s warm at sf1.
    One text crossing + a compressed intermediate beats two crossings
    + no intermediate.
    """
    from pyspark.sql import functions as F

    from etl_transparencia_sergipe_spark.caching import persist_scoped
    from etl_transparencia_sergipe_spark.operators.hashing import h60_spark

    carry = list(carry_cols)
    # Row form deliberately (measured): the as_arrays variant halves the
    # Arrow row count but both consumers then pay explode(arrays_zip)
    # from the persisted frame — 3.2 s vs 2.6 s warm at sf1. Persisting
    # the flat rows ships them across Arrow once and leaves both
    # aggregates pure codegen over already-flat ints.
    doc_buckets = (
        hashed_bucket_counts(docs, id_col, text_col, n_buckets,
                             tuple(carry))
        .transform(persist_scoped)
    )

    models = doc_buckets.groupBy("bucket").agg(
        F.sum("c").alias("r"),
        F.sum(F.when(F.expr(target_pred), F.col("c"))
              .otherwise(F.lit(0))).alias("t"))
    models = models.transform(persist_scoped)
    # totals and (later) the score max are 1-row aggregates over tiny
    # persisted frames: collect them into plan literals instead of
    # crossJoin(broadcast(1-row)) — same job count, but the joins were
    # BroadcastNestedLoopJoins in the static audit and literals keep
    # the whole expression in one codegen span (values identical, so
    # hashes are unchanged — re-gated at all four scales)
    trow = models.agg(F.sum("r").alias("rtot"),
                      F.sum("t").alias("ttot")).collect()[0]
    rtot, ttot = int(trow["rtot"]), int(trow["ttot"])
    ratio = models.selectExpr(
        "bucket",
        f"CAST(floor(1000000.0D"
        f" * CAST((t + 1) * CAST({rtot + n_buckets} AS BIGINT) AS DOUBLE)"
        f" / CAST((r + 1) * CAST({ttot + n_buckets} AS BIGINT) AS DOUBLE))"
        f" AS BIGINT) AS ratio_q6")
    scores = (
        doc_buckets.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col, *carry)
        .agg(F.sum(F.col("c") * F.col("ratio_q6")).cast("bigint")
             .alias("score"))
        .transform(persist_scoped)
    )
    smax = int(scores.agg(F.max("score")).collect()[0][0])
    return scores.selectExpr(
        id_col, *carry, "score",
        f"CASE WHEN ({h60_spark(f'CAST({id_col} AS STRING)')}) % 1000000"
        f" < CAST(floor(1000000.0D * CAST(score AS DOUBLE)"
        f" / CAST({smax} AS DOUBLE)) AS BIGINT)"
        " THEN 1 ELSE 0 END AS keep")
