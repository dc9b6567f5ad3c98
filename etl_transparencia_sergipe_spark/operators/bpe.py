"""BPE vocabulary induction — learn merge rules FROM the corpus
(round-7 VERDICT item 8: q23 consumes a fixed merge table; this is the
operator a tokenizer-training workflow needs to produce one).

Classic byte-pair-encoding training (Sennrich et al. 2016), Spark-first:

1. ONE corpus scan builds the word-frequency table (whitespace tokens,
   the shared tokens_spark semantics) — the standard BPE trick: train
   over DISTINCT words weighted by frequency, so every later round is
   vocabulary-sized, never corpus-sized.
2. Each round: count adjacent symbol pairs across the (distinct) words
   (explode + hash-agg, partial map-side — the shuffle carries one row
   per distinct pair), pick the most frequent pair with a DETERMINISTIC
   tie-break (max count, then lexicographic (left, right)), contract
   every left-to-right non-overlapping occurrence via a codegen
   aggregate() fold, repeat.
3. Output: the rank-ordered merge table
   [rank, left, right, merged, pair_count].

Determinism: the tie-break makes the learned table a pure function of
the corpus — the DuckDB oracle twin (plans) reimplements the loop in
plain Python over the same word-frequency table and must match
bit-for-bit.

100 TB shape: the corpus is touched ONCE (word counting — partial-agg
groupBy, shuffle = distinct words); all R merge rounds run over the
persisted vocabulary table (|V| rows, symbols arrays), each round one
small hash-agg + a 1-row collect + a map-side fold. Driver state is one
(pair, count) row per round. Rounds are bounded (R is the vocab-size
budget), and per-round lineage is truncated so the plan never deepens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.operators.dedup import tokens_spark


def word_frequencies(docs: DataFrame, text_col: str) -> DataFrame:
    """DataFrame[word, freq] over whitespace tokens (tokens_spark
    semantics: trim spaces, lowercase, Java '\\\\s+' split). Empty
    tokens are kept by the splitter but carry zero symbols, so they
    never influence a merge."""
    return (docs.selectExpr(f"explode({tokens_spark(text_col)}) AS word")
            .groupBy("word").agg(F.count("*").alias("freq")))


def _merge_fold(left: str, right: str) -> str:
    """Codegen fold contracting every left-to-right non-overlapping
    (left, right) adjacency in ``syms`` — the single-pair BPE merge.
    After a contraction the new last symbol is left||right, which never
    re-matches ``left`` exactly, so overlaps resolve greedily
    left-to-right exactly as in reference BPE.

    Pair as LITERALS deliberately (two alternatives measured at sf1):
    a broadcast 1-row (_l, _r) frame makes every round's generated code
    identical but its per-round broadcast-build job DOUBLES the wall
    (5.3 s -> 10.9 s); lazy localCheckpoint + coalesce(1) changed
    nothing. The ~0.3 s/round that remains is the driver-synchronized
    Spark job floor (R sequential top-1 collects by construction) —
    see the q108 note in BENCH_TABLES_r08.
    """
    l_lit = left.replace("\\", "\\\\").replace("'", "\\'")
    r_lit = right.replace("\\", "\\\\").replace("'", "\\'")
    return (
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, s) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{l_lit}' "
        f"AND s = '{r_lit}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), "
        f"array('{l_lit}{r_lit}')) "
        "ELSE concat(acc, array(s)) END)"
    )


def _bpe_task(batches, n_merges: int):
    """The whole merge loop inside ONE Spark task (round 13, guide §4.2:
    distribution/shuffle stays in Spark — the corpus-sized word count —
    and the vocabulary-sized sequential loop runs as native batch code
    instead of R driver-synchronized jobs).

    Input: Arrow batches of (word, freq) — the task owns the full
    vocabulary because the caller coalesces to one partition, which the
    distributed loop ALREADY required de facto (its working set has been
    ``coalesce(1)`` since round 8: per-round task scheduling dominated).

    Algorithm: incremental pair-count maintenance (Sennrich et al. 2016
    reference trainer shape) — count every adjacency once, keep a
    pair -> word-ids index, and per round touch only the words that
    contain the merged pair. DELIBERATELY a different algorithm from the
    oracle_py twin's full recount-per-round, so the bit-identical hash
    gate stays a real cross-check.

    Determinism notes:
    - tie-break compares UTF-8 BYTES (max count, then lexicographic
      (left, right)): Spark orders strings by binary UTF8String
      comparison, and UTF-8 byte order equals code-point order, so this
      matches both the old orderBy and the oracle's tuple compare.
    - a pair merged at round k can REAPPEAR later (a subsequent merge
      may recreate its left token); stale zero-count entries are
      skipped lazily, re-incremented entries stay eligible — exactly
      the full-recount semantics.
    - contraction is greedy left-to-right non-overlapping, equivalent
      to the fold in :func:`_merge_fold` (a merged token l||r can never
      re-match l, since r is non-empty).
    """
    import pyarrow as pa

    words: list[list[str]] = []
    freqs: list[int] = []
    for b in batches:
        for w, f in zip(b.column("word").to_pylist(),
                        b.column("freq").to_pylist()):
            if w:  # empty tokens carry zero symbols — never merge input
                words.append(list(w))
                freqs.append(int(f))

    counts: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        f = freqs[wi]
        for j in range(len(syms) - 1):
            p = (syms[j], syms[j + 1])
            counts[p] = counts.get(p, 0) + f
            index.setdefault(p, set()).add(wi)

    out_rank: list[int] = []
    out_l: list[str] = []
    out_r: list[str] = []
    out_cnt: list[int] = []
    for rank in range(n_merges):
        cmax = 0
        for c in counts.values():
            if c > cmax:
                cmax = c
        if cmax <= 0:
            break
        best = min((p for p, c in counts.items() if c == cmax),
                   key=lambda p: (p[0].encode("utf-8"),
                                  p[1].encode("utf-8")))
        l, r = best
        out_rank.append(rank)
        out_l.append(l)
        out_r.append(r)
        out_cnt.append(cmax)
        merged = l + r
        for wi in sorted(index.get(best, ())):
            syms = words[wi]
            f = freqs[wi]
            new: list[str] = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                    new.append(merged)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            if len(new) == n:
                continue  # stale index entry: pair no longer present
            for j in range(n - 1):
                counts[(syms[j], syms[j + 1])] -= f
            for j in range(len(new) - 1):
                p = (new[j], new[j + 1])
                counts[p] = counts.get(p, 0) + f
                index.setdefault(p, set()).add(wi)
            words[wi] = new

    yield pa.RecordBatch.from_arrays(
        [pa.array(out_rank, pa.int64()), pa.array(out_l, pa.string()),
         pa.array(out_r, pa.string()),
         pa.array([a + b for a, b in zip(out_l, out_r)], pa.string()),
         pa.array(out_cnt, pa.int64())],
        names=["rank", "left", "right", "merged", "pair_count"])


def learn_bpe_merges(docs: DataFrame, text_col: str = "text",
                     n_merges: int = 16,
                     distributed: bool = False) -> list[dict]:
    """Learn ``n_merges`` BPE merge rules from the corpus; returns the
    rank-ordered merge table as plain rows
    [{rank, left, right, merged, pair_count}] (driver-side: one tiny
    row per round by construction). Stops early when no adjacent pair
    remains.

    Default path (round 13): ONE Spark job — the corpus-sized word
    count shuffles to a vocabulary-sized (word, freq) table, and the
    whole R-round merge loop runs inside a single ``mapInArrow`` task
    (:func:`_bpe_task`). The old per-round plan paid R sequential
    driver round-trips, R fresh Janino codegen compiles (each round's
    fold bakes new literals) and R localCheckpoints — measured 3.35 s
    warm at sf0.1 for 16 rounds where the in-task loop is one job.

    ``distributed=True`` keeps the per-round Spark loop: the only path
    whose per-round pair count runs distributed — for a vocabulary too
    large for one task's memory (the in-task path holds the symbol
    lists + pair index in RAM; the distributed one only the arrays).
    Both paths are pinned equal in tests/test_bpe.py.
    """
    if not distributed:
        rows = (
            word_frequencies(docs, text_col)
            .coalesce(1)
            .mapInArrow(
                lambda it: _bpe_task(it, n_merges),
                "rank bigint, left string, right string, merged string, "
                "pair_count bigint")
            .collect()
        )
        return [row.asDict() for row in rows]
    spark = docs.sparkSession
    words = (word_frequencies(docs, text_col)
             .selectExpr(
                 "freq",
                 "transform(sequence(1, length(word)), "
                 "i -> substring(word, i, 1)) AS syms")
             .filter("size(syms) > 0")
             # the working set is vocabulary-sized from here on — one
             # partition kills per-round task-scheduling overhead
             # (measured at sf1: 5.3 s -> see BENCH_TABLES_r08); at a
             # genuinely huge vocabulary raise this to taste, the
             # algorithm is partition-agnostic
             .coalesce(1))
    # localCheckpoint per round truncates the fold-expression lineage
    # (16 nested aggregate() folds would otherwise stack into one giant
    # codegen expression). LAZY: the next round's top-1 collect is the
    # materializing action, so each round runs ONE job instead of
    # checkpoint-then-count
    from etl_transparencia_sergipe_spark.caching import (
        checkpoint_rdd_id,
        unpersist_rdd_ids,
    )

    words = words.localCheckpoint(eager=False)
    # a LAZY checkpoint still references its predecessor until the next
    # collect materializes it — so each round frees the checkpoint from
    # TWO rounds back (live = materialized, pending = registered). Ids
    # are read DIRECTLY off each checkpointed Dataset (caching.py
    # checkpoint_rdd_id) — the former session-global snapshot diffing
    # captured concurrent queries' registrations and evicted them with
    # no lineage to recover (round-9 ADVICE).
    pending_ids = {checkpoint_rdd_id(words)}
    live_ids: set[int] = set()

    merges: list[dict] = []
    for rank in range(n_merges):
        top = (
            # single-symbol words carry no pair (and sequence(1, 0)
            # would DESCEND under Spark semantics) — filter them from
            # the pair count, never from the working set
            words.filter("size(syms) > 1")
            .selectExpr(
                "freq",
                "explode(transform(sequence(1, size(syms) - 1), "
                "i -> struct(element_at(syms, i) AS l, "
                "element_at(syms, i + 1) AS r))) AS p")
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        # the collect materialized this round's checkpoint — the prior
        # round's blocks are dead weight from here
        unpersist_rdd_ids(spark, live_ids - pending_ids)
        live_ids = pending_ids
        if not top:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["pair_count"])
        merges.append({"rank": rank, "left": l, "right": r,
                       "merged": l + r, "pair_count": cnt})
        words = (words.selectExpr("freq", f"{_merge_fold(l, r)} AS syms")
                 .localCheckpoint(eager=False))
        pending_ids = {checkpoint_rdd_id(words)}
    return merges


def bpe_merge_table(docs: DataFrame, text_col: str = "text",
                    n_merges: int = 16) -> DataFrame:
    """The merge table as a DataFrame
    [rank bigint, left string, right string, merged string,
    pair_count bigint] — the queries()/oracle surface."""
    spark = docs.sparkSession
    rows = [(m["rank"], m["left"], m["right"], m["merged"],
             m["pair_count"]) for m in learn_bpe_merges(
                 docs, text_col, n_merges)]
    return spark.createDataFrame(
        rows, "rank bigint, left string, right string, merged string, "
              "pair_count bigint")
