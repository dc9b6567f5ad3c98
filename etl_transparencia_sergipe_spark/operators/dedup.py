"""Deduplication operators (P9/P10, J6 — LLM-pipeline [EXT] surface).

The reference's only dedup-adjacent behavior is idempotent month overwrite
(``file_utils.py:57``); the north star mandates real dedup for training-data
pipelines. Four tiers, all expressed in DataFrame ops so Catalyst plans them:

- exact: ``dropDuplicates`` (hash aggregate).
- MinHash+LSH: shingle -> minhash signature -> band -> bucket self-join ->
  Jaccard verify. Signatures are computed as explode + codegen md5 + a
  partially-aggregated groupBy (shuffle volume = n_docs x k integers, not
  tokens); verification shingles are built only for candidate pairs —
  this is the textbook scale-out shape: at 100 TB candidates are a tiny
  fraction of the n^2 pair space.
- SimHash: 32-bit fingerprints, banded by 8-bit chunks, Hamming verify.
- n-gram Jaccard: exact verify within cheap blocking keys.

All hashing is cross-engine deterministic (operators/hashing.py), so every
tier has a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.operators.hashing import (
    HASH_A,
    HASH_B,
    MERSENNE,
    h60_duck,
    h60_spark,
)

# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def tokens_spark(text: str) -> str:
    return f"split(lower(trim({text})), '\\\\s+')"


def tokens_duck(text: str) -> str:
    return f"string_split_regex(lower(trim({text})), '\\s+')"


def shingles_spark(text: str, n: int = 3) -> str:
    """Distinct word n-grams as array<string> (Spark SQL expression)."""
    toks = tokens_spark(text)
    return (
        f"array_distinct(CASE WHEN size({toks}) < {n} "
        f"THEN array(concat_ws(' ', {toks})) "
        f"ELSE transform(sequence(1, size({toks}) - {n - 1}), "
        f"j -> concat_ws(' ', slice({toks}, j, {n}))) END)"
    )


def shingles_duck(text: str, n: int = 3) -> str:
    """DuckDB twin of :func:`shingles_spark` (list slice is inclusive)."""
    toks = tokens_duck(text)
    return (
        f"list_distinct(CASE WHEN len({toks}) < {n} "
        f"THEN [array_to_string({toks}, ' ')] "
        f"ELSE list_transform(range(1, len({toks}) - {n - 2}), "
        f"j -> array_to_string(({toks})[j:j+{n - 1}], ' ')) END)"
    )


def shingle_rows(df: DataFrame, id_col: str, text_col: str,
                 n: int = 3, carry: tuple[str, ...] = (),
                 by_doc: bool = False) -> DataFrame:
    """Word n-grams as ROWS (doc_id, s) — the codegen-friendly shingler.

    ``shingles_spark`` builds the n-gram array with higher-order-function
    lambdas, which Spark evaluates interpreted row-at-a-time (profiled at
    ~3 s for 5k docs at sf0.1). Rounds 5-11 posexploded the token stream
    and assembled n-grams with window ``lead``s — codegen, but it paid a
    full TOKEN-STREAM exchange + per-partition sort just to see each
    token's neighbors. Round 12 (guide §2.3/§2.4 — shuffle fewer bytes,
    remove shuffles outright): posexplode CARRIES the token array through
    the Generate, so neighbors are ``try_element_at`` lookups into the
    in-row array — the whole assembly is map-side, no exchange, no sort,
    and the downstream groupBy(doc_id) partial-aggregates signatures
    before the only shuffle left (n_docs x k integers, not tokens).
    Measured at sf0.1 (same-session A/B, bench boundaries): the sig
    stage 1.03 -> 0.80 s, the q82 shingle+distinct core 2.32 -> 1.82 s.
    A scale.fan_out of the input was tried here and REVERTED: the
    downstream exchanges carry shingle-proportional rows (distinct,
    collect_set), so pre-spreading the docs added a full extra exchange
    for no collapse — 0.80 -> 0.91 s on the sig stage, and consumer
    queries (q82/q84-class) regressed 1.2-1.6x warm in the interleaved
    tree A/B. May emit within-doc duplicate n-grams (unlike the array
    variant's array_distinct) — callers must be duplicate-insensitive
    (min-aggregates are).

    Short docs (< n tokens) emit the whole token string once, matching
    ``shingles_spark``: at pos 0 the trailing ``try_element_at`` lookups
    are NULL and ``concat_ws`` skips them, which IS the all-tokens
    string. ``carry`` lists extra columns (functional on the id, e.g.
    source) to ride along in the output rows.

    ``by_doc=True`` hash-repartitions the DOC rows by id first — the
    narrowest possible exchange (raw text, not tokens, not n-token
    shingle strings) — so the OUTPUT is doc_id-partitioned and a
    downstream distinct()/collect_set keyed on doc_id runs exchange-free
    (ClusteredDistribution(doc_id, ...) is satisfied by
    HashPartitioning(doc_id)). Use it when the consumer needs (doc,
    shingle) ROWS: the map-side path would otherwise shuffle the
    assembled shingle strings — n tokens wide each — where the old
    window shuffled 1-token rows (q82 at n=8 regressed 1.2x before this;
    with by_doc the exchange carries ~1/8 the old bytes AND the sort is
    gone). Leave False when the consumer partial-aggregates per doc
    before its exchange (minhash signatures: doc x k integers).
    """
    if by_doc:
        df = df.repartition(F.col(id_col))
    tok = df.selectExpr(
        f"{id_col} AS doc_id", *carry,
        f"split(lower(trim({text_col})), '\\\\s+') AS _tk",
    )
    pe = tok.select("doc_id", *carry, "_tk",
                    F.posexplode("_tk").alias("pos", "t"))
    gram = F.concat_ws(" ", F.col("t"), *[
        F.try_element_at("_tk", F.col("pos") + F.lit(i + 1))
        for i in range(1, n)
    ])
    return (
        pe.filter(f"(size(_tk) >= {n} AND pos <= size(_tk) - {n}) "
                  f"OR (size(_tk) < {n} AND pos = 0)")
        .select("doc_id", *carry, gram.alias("s"))
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, keys: list[str]) -> DataFrame:
    """P9 exact dedup — hash-groupBy distinct on the key columns."""
    return df.dropDuplicates(keys)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       k: int = 16, n: int = 3) -> DataFrame:
    """k-permutation MinHash signatures: DataFrame[doc_id, mh0..mh{k-1}].

    Explode shingles -> codegen md5 -> groupBy(doc_id) with k plain min()
    aggregates; partial (map-side) aggregation collapses each document's
    tokens before the exchange, so the shuffle carries n_docs x k integers.
    This is the persistable unit of incremental dedup: write this frame
    once per ingested batch and later batches probe it from storage
    without touching the original text (operators/sigstore.py).
    """
    tok = shingle_rows(df, id_col, text_col, n).selectExpr(
        "doc_id", f"{h60_spark('s')} % {MERSENNE} AS h")
    return tok.groupBy("doc_id").agg(*[
        F.min(F.expr(f"({HASH_A[i]} * h + {HASH_B[i]}) % {MERSENNE}"))
        .alias(f"mh{i}")
        for i in range(k)
    ])


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      k: int = 16, bands: int = 4,
                      threshold: float = 0.5, n: int = 3) -> DataFrame:
    """Near-dup pairs (id_a < id_b, jaccard >= threshold) via MinHash LSH.

    k minhashes in `bands` bands of k/bands rows; a pair is a candidate iff
    it collides in >= 1 band; candidates are verified with exact Jaccard
    over the shingle sets. Returns DataFrame[id_a, id_b, jaccard].
    """
    r = k // bands
    # Signature computation: explode shingles -> whole-stage-codegen md5 ->
    # groupBy(doc_id) with k plain min() aggregates. Spark's partial (map-
    # side) aggregation collapses each document's tokens before the
    # exchange, so the shuffle carries only n_docs x k integers — at 100 TB
    # that is proportional to the number of documents, not tokens. Measured
    # 3-4x faster than the per-row `array_min(transform(...))` formulation,
    # whose higher-order lambdas are interpreted row-at-a-time with boxing
    # (profiled at sf0.1: ~3 s vs ~0.8 s for the signature stage).
    tok = shingle_rows(df, id_col, text_col, n).selectExpr(
        "doc_id", f"{h60_spark('s')} % {MERSENNE} AS h")
    sig = tok.groupBy("doc_id").agg(*[
        F.min(F.expr(f"({HASH_A[i]} * h + {HASH_B[i]}) % {MERSENNE}"))
        .alias(f"mh{i}")
        for i in range(k)
    ])
    # Persist the signatures: the sig subtree feeds three plan branches
    # (both band-join sides and the bands themselves); without
    # materialization the whole shingle+md5+k-min computation re-executes
    # per branch. MEMORY_AND_DISK spills instead of OOMing — at 100 TB
    # signatures are persisted (or written) for exactly this reason.
    from etl_transparencia_sergipe_spark.caching import persist_scoped

    sig = sig.transform(persist_scoped)

    band_structs = ", ".join(
        f"struct({b} AS band_id, {h60_spark(_band_key([f'mh{b * r + j}' for j in range(r)]))} AS band_hash)"
        for b in range(bands)
    )
    banded = sig.selectExpr(
        "doc_id", f"explode(array({band_structs})) AS band"
    ).select("doc_id", "band.band_id", "band.band_hash")

    x, y = banded.alias("x"), banded.alias("y")
    cand = (
        x.join(y, (F.col("x.band_id") == F.col("y.band_id"))
               & (F.col("x.band_hash") == F.col("y.band_hash"))
               & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    return jaccard_verify_pairs(df, cand, id_col, text_col,
                                n).filter(
        F.col("jaccard") >= threshold)


def jaccard_verify_pairs(df: DataFrame, cand: DataFrame, id_col: str,
                         text_col: str, n: int = 3,
                         broadcast_side: bool = False) -> DataFrame:
    """Exact-Jaccard verify for candidate pairs (id_a, id_b): build each
    CANDIDATE doc's shingle set exactly once — semi-join the corpus to
    candidate ids, run the codegen shingler (shingle_rows) and
    collect_set per doc — then join the two arrays to each pair for the
    intersect/union. A per-pair formulation (interpreted transform()
    lambdas over the raw text on both sides of every pair) pays the
    lambda cost p times for a doc in p pairs; on dup-dense corpora that
    stage dominates (q31 at sf1: 22 s -> 6 s with identical pair counts
    and oracle hashes — collect_set over shingle ROWS is the same
    distinct set array_distinct built). Returns cand + jaccard."""
    # no .distinct(): the left_semi join is set-semantic on the right side
    # already, so deduplicating here would only add an exchange
    cand_ids = (cand.selectExpr("id_a AS _cand_id")
                .union(cand.selectExpr("id_b")))
    doc_sh = (
        shingle_rows(df.join(cand_ids,
                             F.col(id_col) == F.col("_cand_id"),
                             "left_semi"),
                     id_col, text_col, n,
                     # collect_set has no partial collapse: by_doc moves
                     # the raw candidate TEXT once instead of shuffling
                     # assembled n-token shingle rows, and the groupBy
                     # below is then exchange-free (round 12)
                     by_doc=True)
        .groupBy("doc_id").agg(F.collect_set("s").alias("sh"))
    )
    # shuffle_hash hints: the shingle-array side's in-memory size is
    # badly underestimated by size stats (arrays of 60-bit hashes), and
    # letting AQE "optimize" these joins into broadcasts builds a
    # multi-GB driver-side hash relation on dup-dense corpora — the
    # exact OOM the sf10 scale run caught (q33: 500k docs x 100-clique
    # density). A shuffled hash join partitions the array side instead:
    # per-task build memory is size/partitions, bounded.
    # ``broadcast_side=True`` is the MICRO-BATCH caller's override
    # (streaming canonical sink): when the candidate-doc set is known
    # batch-bounded the two forced shuffles are pure per-epoch overhead
    # and a broadcast of the small shingle side is safe by contract —
    # the same caller-knows-the-size split as
    # probe_signature_store(broadcast_probe=...).
    hint = ((lambda d: F.broadcast(d)) if broadcast_side
            else (lambda d: d.hint("shuffle_hash")))
    return (
        cand.join(hint(doc_sh.selectExpr("doc_id AS id_a", "sh AS sh_a")),
                  "id_a")
        .join(hint(doc_sh.selectExpr("doc_id AS id_b", "sh AS sh_b")),
              "id_b")
        .withColumn(
            "jaccard",
            F.expr("CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE) / "
                   "size(array_union(sh_a, sh_b))"),
        )
        .select(*cand.columns, "jaccard")
    )


def _band_key(cols: list[str]) -> str:
    return "concat_ws('_', " + ", ".join(cols) + ")"


def minhash_lsh_pairs_duck(table: str, id_col: str, text_col: str,
                           k: int = 16, bands: int = 4,
                           threshold: float = 0.5, n: int = 3) -> str:
    """DuckDB oracle SQL equivalent of :func:`minhash_lsh_pairs`."""
    r = k // bands
    sig_cols = ",\n           ".join(
        f"list_min(list_transform(hs, h -> ({HASH_A[i]} * h + {HASH_B[i]}) % {MERSENNE})) AS mh{i}"
        for i in range(k)
    )
    band_selects = "\n        UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, "
        f"{h60_duck(_band_key([f'mh{b * r + j}' for j in range(r)]))} AS band_hash FROM sig"
        for b in range(bands)
    )
    return f"""
    WITH base AS (
        SELECT {id_col} AS doc_id, {shingles_duck(text_col, n)} AS sh
        FROM {table}
    ), hashed AS (
        SELECT doc_id, sh,
               list_transform(sh, s -> {h60_duck('s')} % {MERSENNE}) AS hs
        FROM base
    ), sig AS (
        SELECT doc_id, sh, {sig_cols}
        FROM hashed
    ), banded AS (
        {band_selects}
    ), cand AS (
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        FROM banded x JOIN banded y
          ON x.band_id = y.band_id AND x.band_hash = y.band_hash
         AND x.doc_id < y.doc_id
    )
    SELECT id_a, id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
    FROM cand
    JOIN sig a ON a.doc_id = id_a
    JOIN sig b ON b.doc_id = id_b
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh, b.sh))) >= {threshold}
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash_from_hashes_spark(th: str) -> str:
    """32-bit SimHash from a PRECOMPUTED bigint token-hash array column —
    hashing once and folding 32 bit-sums over the array keeps the md5 cost
    at O(tokens), not O(32 * tokens)."""
    bit_terms = " + ".join(
        f"(CASE WHEN aggregate({th}, 0L, (acc, h) -> acc + "
        f"CASE WHEN shiftright(h, {j}) % 2 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE 0L END)"
        for j in range(SIMHASH_BITS)
    )
    return f"({bit_terms})"


def simhash_from_hashes_duck(th: str) -> str:
    """DuckDB twin of :func:`simhash_from_hashes_spark`."""
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform({th}, h -> "
        f"CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << j}::BIGINT ELSE 0::BIGINT END)"
        for j in range(SIMHASH_BITS)
    )
    return f"({bit_terms})"


def simhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  max_hamming: int = 6) -> DataFrame:
    """Near-dup pairs by SimHash: 8-bit band blocking + Hamming verify.

    A pair with Hamming distance <= 6 over 32 bits must agree exactly on at
    least one of the four 8-bit bands only probabilistically — bands are a
    recall/cost tradeoff exactly as in the MinHash case.
    Returns DataFrame[id_a, id_b, hamming].
    """
    # Explode tokens and compute the 32 bit-sums as ONE codegen'd hash
    # aggregate instead of 32 interpreted array folds per document:
    # higher-order-function lambdas are evaluated row-at-a-time with
    # boxing, while explode + conditional SUMs stay in whole-stage
    # codegen. Identical fingerprints (integer sums are order-free).
    toks = tokens_spark(text_col)
    tok_hash = df.selectExpr(
        f"{id_col} AS doc_id", f"explode({toks}) AS t"
    ).selectExpr("doc_id", f"{h60_spark('t')} AS h")
    bit_sums = tok_hash.groupBy("doc_id").agg(*[
        F.sum(F.expr(
            f"CASE WHEN shiftright(h, {j}) % 2 = 1 THEN 1 ELSE -1 END"))
        .alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ])
    fp_expr = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0L END)"
        for j in range(SIMHASH_BITS)
    )
    fp = bit_sums.selectExpr("doc_id", f"({fp_expr}) AS fp")
    # persist: fp feeds both self-join sides through the band explode
    # (see minhash_lsh_pairs for the materialization rationale)
    from etl_transparencia_sergipe_spark.caching import persist_scoped

    fp = fp.transform(persist_scoped)
    band_structs = ", ".join(
        f"struct({b} AS band_id, (shiftright(fp, {8 * b}) % 256) AS band_val)"
        for b in range(4)
    )
    banded = fp.selectExpr(
        "doc_id", "fp", f"explode(array({band_structs})) AS band"
    ).select("doc_id", "fp", "band.band_id", "band.band_val")
    x, y = banded.alias("x"), banded.alias("y")
    # Emit each pair exactly once: only at the FIRST band where the two
    # fingerprints agree ("no earlier band matches" predicates). This
    # replaces a dropDuplicates over the full candidate-pair stream —
    # millions of rows on near-duplicate-heavy corpora — with a few bit
    # ops inside the join, removing an entire shuffle.
    first_band = F.expr(" AND ".join(
        f"(x.band_id <= {b} OR (shiftright(x.fp, {8 * b}) % 256) != "
        f"(shiftright(y.fp, {8 * b}) % 256))"
        for b in range(3)
    ))
    return (
        x.join(y, (F.col("x.band_id") == F.col("y.band_id"))
               & (F.col("x.band_val") == F.col("y.band_val"))
               & (F.col("x.doc_id") < F.col("y.doc_id"))
               & first_band)
        .select(F.col("x.doc_id").alias("id_a"),
                F.col("y.doc_id").alias("id_b"),
                F.expr("bit_count(x.fp ^ y.fp)").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs_duck(table: str, id_col: str, text_col: str,
                       max_hamming: int = 6) -> str:
    """DuckDB oracle SQL equivalent of :func:`simhash_pairs`."""
    band_selects = "\n        UNION ALL ".join(
        f"SELECT doc_id, fp, {b} AS band_id, (fp >> {8 * b}) & 255 AS band_val FROM fp"
        for b in range(4)
    )
    return f"""
    WITH hashed AS (
        SELECT {id_col} AS doc_id,
               list_transform({tokens_duck(text_col)},
                              t -> {h60_duck('t')}) AS th
        FROM {table}
    ), fp AS (
        SELECT doc_id, {simhash_from_hashes_duck('th')} AS fp
        FROM hashed
    ), banded AS (
        {band_selects}
    )
    SELECT x.doc_id AS id_a, y.doc_id AS id_b,
           bit_count(xor(x.fp, y.fp)) AS hamming
    FROM banded x JOIN banded y
      ON x.band_id = y.band_id AND x.band_val = y.band_val
     AND x.doc_id < y.doc_id
    WHERE bit_count(xor(x.fp, y.fp)) <= {max_hamming}
      AND {" AND ".join(
          f"(x.band_id <= {b} OR ((x.fp >> {8 * b}) & 255) != ((y.fp >> {8 * b}) & 255))"
          for b in range(3))}
    """
