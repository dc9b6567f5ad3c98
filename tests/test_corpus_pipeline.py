"""End-to-end corpus dedup pipeline + compaction (corpus_pipeline.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.corpus_pipeline import (
    compact_parquet,
    dedup_corpus,
    parquet_files,
)
from etl_transparencia_sergipe_spark.operators.components import (
    connected_components,
)
from etl_transparencia_sergipe_spark.operators.dedup import (
    minhash_lsh_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_dedup_corpus_matches_operator_composition(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "deduped")
    report = dedup_corpus(docs, out)

    # independent recomputation from the oracle-checked building blocks
    pairs = minhash_lsh_pairs(docs, "doc_id", "text",
                              k=16, bands=4, threshold=0.4)
    drops = connected_components(pairs).filter("node != component")
    n_in = docs.count()
    assert report["n_in"] == n_in
    assert report["n_dropped"] == drops.count()
    assert report["n_kept"] == n_in - report["n_dropped"]

    written = spark.read.parquet(out)
    assert written.count() == report["n_kept"]
    # no dropped doc survives; every cluster keeps exactly its canonical
    dropped_ids = {r[0] for r in drops.select("node").collect()}
    surviving = {r[0] for r in written.select("doc_id").collect()}
    assert not (dropped_ids & surviving)


def test_dedup_corpus_idempotent_on_deduped_output(spark, tmp_path):
    docs = _docs(spark)
    out1 = str(tmp_path / "pass1")
    out2 = str(tmp_path / "pass2")
    r1 = dedup_corpus(docs, out1)
    r2 = dedup_corpus(spark.read.parquet(out1), out2)
    # a second pass over already-deduped output drops (almost) nothing:
    # the canonical representatives can still band-collide, but every
    # >= threshold verified pair was collapsed in pass 1
    assert r2["n_in"] == r1["n_kept"]
    assert r2["n_dropped"] == 0


def test_compact_parquet_preserves_content(spark, tmp_path):
    frag = str(tmp_path / "fragmented")
    docs = _docs(spark)
    docs.repartition(40).write.parquet(frag)
    n_before = len(parquet_files(frag))
    assert n_before >= 40
    before_sum = docs.agg(F.sum("doc_id"), F.count("*")).collect()[0]

    report = compact_parquet(spark, frag, target_bytes=64 * 1024 * 1024)
    assert report["files_before"] == n_before
    assert report["files_after"] < n_before
    after = spark.read.parquet(frag)
    after_sum = after.agg(F.sum("doc_id"), F.count("*")).collect()[0]
    assert tuple(before_sum) == tuple(after_sum)
    assert report["rows"] == before_sum[1]


def test_compact_parquet_clustered_rewrite_skips_rowgroups(spark, tmp_path):
    """compact_parquet(sort_cols=...) — layout wired into the compaction
    path (round-5 VERDICT item 6): same data and content-sum, but the
    rewrite is range-clustered, so a key-range predicate can skip row
    groups that a plain compact cannot (footer-stats measurement)."""
    from etl_transparencia_sergipe_spark.operators.layout import (
        rowgroup_skip_fraction,
    )

    df = spark.range(0, 40_000).selectExpr(
        "id AS doc_id", "CAST(id % 9973 AS BIGINT) AS k",
        "repeat('x', 32) AS text")
    plain, clus = str(tmp_path / "plain"), str(tmp_path / "clus")
    for path in (plain, clus):
        df.orderBy(F.rand(7)).repartition(16).write.parquet(path)
    compact_parquet(spark, plain, target_bytes=64 * 1024)
    compact_parquet(spark, clus, target_bytes=64 * 1024, sort_cols=["k"])

    before_sum = df.agg(F.sum("doc_id"), F.count("*")).collect()[0]
    after_sum = spark.read.parquet(clus).agg(
        F.sum("doc_id"), F.count("*")).collect()[0]
    assert tuple(before_sum) == tuple(after_sum)

    skip_plain = rowgroup_skip_fraction(plain, "k", 0, 500)
    skip_clus = rowgroup_skip_fraction(clus, "k", 0, 500)
    assert skip_plain["skip_fraction"] == 0.0  # every group spans the domain
    assert skip_clus["skip_fraction"] > 0.5, skip_clus
    # mutual exclusion guard
    import pytest
    with pytest.raises(ValueError):
        compact_parquet(spark, clus, sort_cols=["k"], zorder_cols=["k"])


def test_dsir_keeps_target_like_documents(spark):
    """DSIR semantics on a corpus where the signal is unambiguous: two
    disjoint vocabularies, target = domain 'a' docs. Every a-doc's
    tokens hit buckets where t ~ r (ratio >> 1) and every b-doc's hit
    t = 0 buckets (ratio ~ 0), so a-docs must score higher and be kept
    at a strictly higher rate. (The registered q104 runs on the shared-
    vocabulary synthetic fixture where this skew is weak; hash
    verification covers its arithmetic — THIS pins the semantics.)"""
    from etl_transparencia_sergipe_spark.operators.textstats import dsir_keep

    rows = []
    for i in range(60):
        rows.append((i, "a", "alpha beta gamma delta " * 5))
    for i in range(60, 120):
        rows.append((i, "b", "omega sigma tau kappa " * 5))
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = dsir_keep(docs, "lang = 'a'", n_buckets=64).collect()
    a = [r for r in out if r.lang == "a"]
    b = [r for r in out if r.lang == "b"]
    assert min(r.score for r in a) > max(r.score for r in b)
    keep_a = sum(r.keep for r in a) / len(a)
    keep_b = sum(r.keep for r in b) / len(b)
    assert keep_a > keep_b
    # every max-score doc is kept (prob = 1e6/1e6... strictly < — the
    # top doc keeps iff its hash < 1e6 * s/smax = 1e6; h60 % 1e6 is
    # always < 1e6, so yes)
    assert all(r.keep == 1 for r in a if r.score == max(x.score for x in a))


def test_bloom_decontamination_no_false_negatives(spark, sf_dir):
    """Bloom membership is a superset guarantee: every exact containment
    hit MUST be a bloom hit (false positives allowed, false negatives
    never). Checked per-gram at the fixture scale by running the q105
    plan's probe relation shape: per source, bloom_hits >= exact_hits
    AND the whole-corpus exact total equals q64's independent exact
    count (the two queries share the bench-gram definition)."""
    from etl_transparencia_sergipe_spark.plans.registry import queries

    qs = queries()
    rows = qs["q105_bloom_decontamination"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.bloom_hits >= r.exact_hits, r
        assert r.false_pos == r.bloom_hits - r.exact_hits
    # cross-check the exact side against q64's independent containment
    # accounting (different plan, same bench definition): total distinct
    # shared grams agree
    q64 = qs["q64_decontamination"](spark, sf_dir).collect()
    assert sum(r.exact_hits for r in rows) == sum(
        r.total_shared_grams for r in q64)
