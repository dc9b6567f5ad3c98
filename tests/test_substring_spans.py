"""substring_dedup_spans (q110's engine): exact span semantics, the
de-skewed hash-agg dup detection (round-9 VERDICT item 2 — results must
be identical to the window formulation it replaced), and the 128-bit
fingerprint channel (item 5)."""

from __future__ import annotations

import random

import pytest

from etl_transparencia_sergipe_spark.plans._helpers import load
from etl_transparencia_sergipe_spark.plans.textops import (
    substring_dedup_spans,
)

SCHEMA = "doc_id string, source string, text string"


def test_spans_handcrafted(spark):
    # two docs share exactly one 16-token run -> one maximal span each
    shared = " ".join(f"s{i}" for i in range(16))
    a = "a0 a1 a2 " + shared + " a3 a4"
    b = "b0 " + shared + " b1 b2 b3"
    c = " ".join(f"c{i}" for i in range(20))
    df = spark.createDataFrame(
        [("d1", "src1", a), ("d2", "src1", b), ("d3", "src2", c)], SCHEMA)
    got = {r.source: r for r in substring_dedup_spans(df).collect()}
    r1 = got["src1"]
    assert (r1.n_docs, r1.n_docs_with_dup, r1.n_dup_spans) == (2, 2, 2)
    assert r1.dup_tokens == 32  # one 16-token span per doc
    r2 = got["src2"]
    assert (r2.n_docs_with_dup, r2.n_dup_spans, r2.dup_tokens) == (0, 0, 0)


def test_fp128_identical_on_collision_prone_fixture(spark):
    # low-entropy corpus: a 2-token vocabulary yields masses of repeated
    # and overlapping windows across every doc — the dense-collision
    # regime where a broken second channel (e.g. one correlated with the
    # first — Spark's xxhash64(sl, 1) chains the FIXED seed, see the
    # builder docstring) would go unnoticed; the reversed-slice channel
    # must leave every span decision unchanged
    rnd = random.Random(7)
    rows = []
    for d in range(12):
        toks = [("x" if rnd.random() < 0.5 else "y") for _ in range(120)]
        rows.append((f"d{d:02d}", f"s{d % 3}", " ".join(toks)))
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(map(tuple, substring_dedup_spans(df, fp_bits=64).collect()))
    b = sorted(map(tuple, substring_dedup_spans(df, fp_bits=128).collect()))
    assert a == b
    # the fixture actually exercises the dup path
    assert any(r[2] > 0 for r in a)  # n_docs_with_dup


def test_fp128_identical_on_testdata(spark, sf_dir):
    docs = load(spark, "documents", sf_dir)
    a = sorted(map(tuple,
                   substring_dedup_spans(docs, fp_bits=64).collect()))
    b = sorted(map(tuple,
                   substring_dedup_spans(docs, fp_bits=128).collect()))
    assert a == b


def test_fp128_channels_independent_on_palindromes(spark):
    # round-10 ADVICE: the earlier xxhash64(reverse(sl)) second channel
    # degenerates to h2 == h1 on palindromic hash slices — runs of one
    # repeated token, i.e. exactly the boilerplate these fingerprints
    # exist to merge. The element-rehashed channel must stay independent
    # there: evaluate the exact production expression over palindromic
    # slices (all-equal elements and a mirrored run) plus ordinary ones.
    from etl_transparencia_sergipe_spark.plans.textops import span_fp_expr

    fp = span_fp_expr("th", 128)
    rows = (spark.createDataFrame(
        [("rep", ["z"] * 16),                      # all-equal run
         ("mir", list("abcdefgh") + list("hgfedcba")),  # mirrored
         ("ord", [f"t{i}" for i in range(16)])],   # ordinary
        "kind string, toks array<string>")
        .selectExpr("kind", "transform(toks, t -> xxhash64(t)) AS th")
        .selectExpr("kind", f"{fp} AS fp")
        .collect())
    got = {r.kind: r.fp for r in rows}
    for kind, f in got.items():
        assert f.h1 != f.h2, f"{kind}: second channel degenerated"
    # and the channel is a different function, not a copy, across rows
    assert len({f.h2 for f in got.values()}) == 3


def test_fp_bits_validated(spark):
    df = spark.createDataFrame([("d", "s", "a b c")], SCHEMA)
    with pytest.raises(ValueError, match="fp_bits"):
        substring_dedup_spans(df, fp_bits=96)
