"""aHash + Hamming band join (sources/multimodal.py): planted duplicate
and near-duplicate payloads must come back; the band join must equal a
brute-force Hamming scan on the same hashes."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.sources.multimodal import (
    average_hash,
    hamming_neardup_pairs,
)


def _media(spark, rows):
    return spark.createDataFrame(
        rows, "media_id bigint, media_type string, content binary")


def test_identical_payloads_hash_equal_and_pair(spark):
    blob = ("the quick brown fox jumps over the lazy dog " * 40).encode()
    near = bytearray(blob)
    near[100] ^= 0xFF  # perturb one byte -> few aHash bits flip
    media = _media(spark, [
        (1, "image/png", bytes(blob)),
        (2, "image/png", bytes(blob)),        # exact dup of 1
        (3, "image/png", bytes(near)),        # near dup of 1
        (4, "image/png", bytes(reversed(blob)) * 2),  # different
    ])
    hashes = average_hash(media)
    h = {r.media_id: r.ahash for r in hashes.collect()}
    assert h[1] == h[2]

    pairs = {(r.id_a, r.id_b): r.dist
             for r in hamming_neardup_pairs(hashes, max_dist=4).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 4


def test_band_join_equals_bruteforce(spark, sf_dir):
    from etl_transparencia_sergipe_spark.plans._helpers import load
    from etl_transparencia_sergipe_spark.sources.multimodal import (
        media_from_documents,
    )

    media = media_from_documents(spark, load(spark, "documents", sf_dir))
    hashes = average_hash(media).cache()
    got = {(r.id_a, r.id_b, r.dist) for r in
           hamming_neardup_pairs(hashes, max_dist=4).collect()}
    a = hashes.selectExpr("media_id AS id_a", "ahash AS ha",
                          "media_type AS ta")
    b = hashes.selectExpr("media_id AS id_b", "ahash AS hb",
                          "media_type AS tb")
    brute = (a.crossJoin(b).filter("id_a < id_b AND ta = tb")
             .withColumn("dist", F.expr("bit_count(ha ^ hb)").cast("int"))
             .filter("dist <= 4"))
    want = {(r.id_a, r.id_b, r.dist) for r in brute.collect()}
    hashes.unpersist()
    assert got == want and len(want) > 0
