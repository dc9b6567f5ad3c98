"""BM25 scoring semantics on a planted corpus (q100's operator math)."""

from __future__ import annotations

from etl_transparencia_sergipe_spark.plans.textops import (
    _BM25_SCORE_SPARK,
    _BM25_TERMS,
)


def _bm25_py(tfs, dl, dfs, n_docs, avgdl):
    """Reference implementation of the rational-idf BM25 variant with
    the same operation ORDER as the SQL expression (left-assoc)."""
    score = 0.0
    for tf, df in zip(tfs, dfs):
        idf = (float(n_docs) - df + 0.5) / (df + 0.5)
        tfn = (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))
        score = score + idf * tfn
    return score


def test_bm25_expression_matches_reference(spark):
    docs = spark.createDataFrame(
        [
            (1, "window stream merge hash"),        # all 4 terms, short
            (2, "window window window pad pad pad pad pad"),  # tf=3, long
            (3, "stream hash pad pad"),
            (4, "pad pad pad pad"),                 # no hits
        ],
        "doc_id bigint, text string")
    base = docs.selectExpr(
        "doc_id", "split(lower(trim(text)), '\\\\s+') AS toks"
    ).selectExpr(
        "doc_id", "size(toks) AS dl",
        *[f"size(filter(toks, x -> x = '{t}')) AS tf{i}"
          for i, t in enumerate(_BM25_TERMS)])
    import pyspark.sql.functions as F

    stats = base.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_dl"),
        *[F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
          .cast("bigint").alias(f"df{i}") for i in range(4)])
    got = {r.doc_id: r.bm25 for r in
           base.crossJoin(F.broadcast(stats))
           .selectExpr("doc_id", f"({_BM25_SCORE_SPARK}) AS bm25")
           .collect()}

    # reference: corpus stats by hand
    rows = {1: ([1, 1, 1, 1], 4), 2: ([3, 0, 0, 0], 8),
            3: ([0, 1, 0, 1], 4), 4: ([0, 0, 0, 0], 4)}
    dfs = [2, 2, 1, 2]  # window, stream, merge, hash doc frequencies
    avgdl = 20.0 / 4
    for d, (tfs, dl) in rows.items():
        want = _bm25_py(tfs, dl, dfs, 4, avgdl)
        assert got[d] == want, (d, got[d], want)
    # no-hit doc scores exactly 0; all-hit short doc wins
    assert got[4] == 0.0
    assert got[1] == max(got.values())
