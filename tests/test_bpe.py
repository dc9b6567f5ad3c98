"""BPE vocabulary induction (operators/bpe.py): greedy left-to-right
overlap resolution, deterministic tie-break, early stop, and
equivalence to the plain-Python reference trainer on constructed
corpora (the real-corpus equivalence is the q108 oracle_py gate)."""

from __future__ import annotations

import pytest

from etl_transparencia_sergipe_spark.operators.bpe import (
    bpe_merge_table,
    learn_bpe_merges,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string")


def test_overlaps_contract_left_to_right(spark):
    """'aaaa' under merge (a, a) yields [aa, aa] — greedy non-
    overlapping, so the round-1 top pair of 'aaaa aaaa' is (aa, aa)."""
    docs = _docs(spark, ["aaaa aaaa"] * 3)
    m = learn_bpe_merges(docs, "text", n_merges=2)
    assert (m[0]["left"], m[0]["right"]) == ("a", "a")
    assert m[0]["pair_count"] == 3 * 2 * 3  # 3 docs x 2 words x 3 adj
    assert (m[1]["left"], m[1]["right"], m[1]["merged"]) == (
        "aa", "aa", "aaaa")


def test_tie_breaks_lexicographically(spark):
    """'ab' and 'cd' each appear equally often: (a, b) < (c, d)."""
    docs = _docs(spark, ["ab cd", "ab cd"])
    m = learn_bpe_merges(docs, "text", n_merges=2)
    assert (m[0]["left"], m[0]["right"]) == ("a", "b")
    assert (m[1]["left"], m[1]["right"]) == ("c", "d")


def test_stops_when_no_pairs_remain(spark):
    docs = _docs(spark, ["ab ab"])
    m = learn_bpe_merges(docs, "text", n_merges=10)
    # after merging (a,b) every word is a single symbol -> stop
    assert len(m) == 1


def test_matches_reference_python_trainer(spark):
    """Operator vs the oracle_py-style textbook loop on a mixed corpus
    (frequencies matter: 'the' dominates)."""
    texts = ["the theme of the thesis", "then the weather thawed",
             "these the the them"]
    docs = _docs(spark, texts)
    got = [(m["rank"], m["left"], m["right"], m["merged"],
            m["pair_count"]) for m in learn_bpe_merges(docs, "text", 8)]

    # reference loop (same as q108's oracle_py, over a Python wordfreq)
    from collections import Counter
    wf = Counter(w for t in texts for w in t.lower().split())
    vocab = [(list(w), f) for w, f in wf.items()]
    exp = []
    for rank in range(8):
        counts = Counter()
        for syms, f in vocab:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (l, r), cnt = min(counts.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        exp.append((rank, l, r, l + r, cnt))
        nxt = []
        for syms, f in vocab:
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            nxt.append((out, f))
        vocab = nxt
    assert got == exp


def _reference_merges(texts, n_merges):
    """The oracle_py-style textbook loop (full recount per round) over a
    Python word-frequency table — the independent reference."""
    from collections import Counter

    wf = Counter(w for t in texts for w in t.lower().split())
    vocab = [(list(w), f) for w, f in wf.items() if w]
    exp = []
    for rank in range(n_merges):
        counts = Counter()
        for syms, f in vocab:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (l, r), cnt = min(counts.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        exp.append((rank, l, r, l + r, cnt))
        nxt = []
        for syms, f in vocab:
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            nxt.append((out, f))
        vocab = nxt
    return exp


def test_in_task_matches_distributed_loop(spark):
    """Round-13 pin: the default in-task incremental trainer and the
    per-round distributed Spark loop produce identical merge tables."""
    texts = ["the theme of the thesis", "then the weather thawed",
             "these the the them", "aaaa baab abab"]
    docs = _docs(spark, texts)
    fast = learn_bpe_merges(docs, "text", 8)
    slow = learn_bpe_merges(docs, "text", 8, distributed=True)
    assert fast == slow


def test_random_corpora_match_reference(spark):
    """Property pin for the incremental count maintenance (including
    merged-pair REAPPEARANCE, which a tiny alphabet provokes): random
    corpora over {a,b,c} must match the full-recount reference."""
    import random

    rng = random.Random(13)
    for _ in range(3):
        texts = [
            " ".join("".join(rng.choice("abc")
                             for _ in range(rng.randint(1, 6)))
                     for _ in range(rng.randint(1, 8)))
            for _ in range(6)
        ]
        docs = _docs(spark, texts)
        got = [(m["rank"], m["left"], m["right"], m["merged"],
                m["pair_count"])
               for m in learn_bpe_merges(docs, "text", 10)]
        assert got == _reference_merges(texts, 10), texts


def test_merge_table_schema(spark):
    docs = _docs(spark, ["spark parquet shuffle"])
    df = bpe_merge_table(docs, "text", 4)
    assert [f.name for f in df.schema.fields] == [
        "rank", "left", "right", "merged", "pair_count"]
    assert df.count() == 4
