"""ML-parity + multimodal queries (A4-A6, §3.3; north-star multimodal).

Everything here is hash-verified against a DuckDB twin. Scaler stats and
correlation come from exact decimal sums; the multimodal mapInPandas
stages (q70 metadata, q71 features, q91 aHash) are twinned via hex()
byte extraction of the same payloads; q62's K-Means is the round-5
integer-exact Lloyd (plans/kmeans_oracle.py) so even the iterative
clustering has a cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.ml import kmeans_exact, scaler_stats
from etl_transparencia_sergipe_spark.plans.kmeans_oracle import (
    kmeans_oracle_duck,
)
from etl_transparencia_sergipe_spark.plans._helpers import load
from etl_transparencia_sergipe_spark.plans.registry import register
from etl_transparencia_sergipe_spark.sources.multimodal import (
    extract_features,
    media_from_documents,
)


def _stats_sql(c: str) -> str:
    s1 = f"CAST(SUM(CAST({c} AS DECIMAL(28,6))) AS DOUBLE)"
    s2 = f"CAST(SUM(CAST({c} * {c} AS DECIMAL(28,6))) AS DOUBLE)"
    n = f"COUNT({c})"
    return (f"{s1} / {n} AS {c}_mean, "
            f"sqrt({s2} / {n} - ({s1} / {n}) * ({s1} / {n})) AS {c}_std_pop")


@register(
    "q60_scaler_stats",
    oracle=f"""
    SELECT {_stats_sql('l_quantity')}, {_stats_sql('l_extendedprice')},
           {_stats_sql('l_discount')}
    FROM lineitem
    """,
    doc="A4 StandardScaler fit stats (mean/std) from exact decimal sums "
        "(data_science.ipynb:95-96 parity)",
)
def q60_scaler_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.scale import fan_out

    li = load(spark, "lineitem", sf_dir)
    # round 12: the exact-decimal sums are ~10x the cost of the scan
    # (double->decimal cast + non-compact decimal(28,6) buffer), and a
    # single-file scan ran them all in ONE task — fan the narrow
    # 3-column projection out first (measured 1.62 -> 0.88 s at sf0.1;
    # decimal sums are order-exact so the result is bit-identical)
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    return scaler_stats(fan_out(li.select(*cols)), cols)


@register(
    "q61_correlation_pairs",
    oracle="""
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_r FROM lineitem
    UNION ALL
    SELECT 'l_quantity', 'l_discount',
           round(corr(l_quantity, l_discount), 6) FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount',
           round(corr(l_extendedprice, l_discount), 6) FROM lineitem
    """,
    doc="A5 Pearson correlation pairs (data_science.ipynb:126 parity), "
        "rounded to 6 dp for cross-engine float stability",
)
def q61_correlation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    pairs = [("l_quantity", "l_extendedprice"),
             ("l_quantity", "l_discount"),
             ("l_extendedprice", "l_discount")]
    frames = [
        li.agg(F.round(F.corr(a, b), 6).alias("corr_r")).select(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"), "corr_r")
        for a, b in pairs
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


_KM_FEATS = ["l_quantity", "l_extendedprice", "l_discount"]
# unique int64 row key (l_linenumber is 1..7): drives the portable
# multiplicative-hash sample order shared with the oracle
_KM_KEY = "l_orderkey * 8 + l_linenumber"


@register(
    "q62_kmeans_clusters",
    # The iteration count is data-dependent, so there is no pure-SQL
    # form; the hash check runs through the oracle_py hook instead
    # (plans/kmeans_oracle.py — DuckDB executes every data-sized step
    # of the same deterministic integer-exact Lloyd spec). Upgraded
    # from rows-only in round 5. The MLlib KMeans operator
    # (ml.kmeans_clusters) remains as the A6 library-parity path with
    # its own determinism tests; this query runs the exact variant so
    # the clustering itself is cross-engine verified.
    oracle=None,
    oracle_py=lambda con: kmeans_oracle_duck(
        con, _KM_FEATS, _KM_KEY, "l_quantity"),
    doc="A6 K-Means k=3 over standardized (quantity, price, discount) — "
        "cluster cardinality + per-cluster exact-decimal mean quantity "
        "(data_science.ipynb:99-100), via integer-exact Lloyd (bounded "
        "deterministic training sample, one distributed assignment "
        "pass) so the clustering hash-matches the DuckDB twin",
)
def q62_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", *_KM_FEATS)
    clustered = kmeans_exact(li, _KM_FEATS, _KM_KEY, k=3)
    return (
        clustered.groupBy("cluster")
        .agg(F.count("*").cast("bigint").alias("n"),
             F.round(
                 F.sum(F.col("l_quantity").cast("decimal(28,6)"))
                 .cast("double") / F.count("*"), 4).alias("avg_qty"))
        .orderBy("cluster")
    )


@register(
    "q70_multimodal_metadata",
    oracle="""
    SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
           WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS media_type,
           COUNT(*) AS n,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MIN(md5(text)) AS min_checksum
    FROM documents GROUP BY 1
    """,
    doc="multimodal binary columns: typed payload + metadata agg "
        "(octet length, checksum) — the decode-free scan path [EXT]",
)
def q70_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    media = media_from_documents(spark, docs)
    return media.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.sum(F.length("content")).cast("bigint").alias("total_bytes"),
        F.min(F.md5("content")).alias("min_checksum"),
    )


@register(
    "q71_multimodal_features",
    # Full SQL twin of the mapInPandas fake-decode stage (round 5,
    # upgraded from rows-only): per-payload feat_mean = byte_sum/len is
    # two exact int->double conversions and one IEEE division, so both
    # engines produce identical doubles; the group mean is made
    # order-independent by summing floor(feat_mean*1e6) as BIGINT (the
    # q69 quantized-mean pattern) instead of averaging doubles in
    # whatever order the shuffle delivers them. Byte extraction reuses
    # the q91 hex() trick.
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id,
               ['image/png','audio/wav','video/mp4']
                   [CAST(doc_id % 3 + 1 AS INT)] AS media_type,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS nb
        FROM documents
    ), b AS (
        SELECT media_id, media_type, nb,
               list_sum(list_transform(range(1, 2*nb+1, 2), p ->
                   (strpos('0123456789ABCDEF',
                           substring(hx, CAST(p AS INT), 1))-1)*16
                   + strpos('0123456789ABCDEF',
                            substring(hx, CAST(p AS INT)+1, 1))-1))
                   AS byte_sum
        FROM m
    ), f AS (
        SELECT media_type,
               CASE WHEN nb = 0 THEN 0.0
                    ELSE CAST(byte_sum AS DOUBLE) / nb END AS feat_mean,
               LEAST(nb, 2048) AS feat_dim
        FROM b
    )
    SELECT media_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM(CAST(floor(feat_mean * 1000000) AS BIGINT))
                      AS DOUBLE) / (COUNT(*) * 1000000.0), 4) AS avg_feat,
           CAST(MAX(feat_dim) AS INT) AS max_dim
    FROM f GROUP BY media_type ORDER BY media_type
    """,
    doc="multimodal feature extraction via Arrow mapInPandas (stubbed "
        "decoder; real Spark plumbing); group mean quantized to 1e-6 "
        "before summing so the aggregate is shuffle-order-independent "
        "and hash-twinnable [EXT]",
)
def q71_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    media = media_from_documents(spark, docs)
    feats = extract_features(media)
    return feats.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.floor(F.col("feat_mean") * F.lit(1000000.0))
                  .cast("bigint")).cast("double")
            / (F.count("*") * F.lit(1000000.0)), 4).alias("avg_feat"),
        F.max("feat_dim").alias("max_dim"),
    )


@register(
    "q67_corr_series",
    oracle="""
    WITH series AS (
        SELECT n.n_name AS nation,
               year(o.o_orderdate) * 100 + month(o.o_orderdate) AS mk,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    ), p AS (
        SELECT a.nation AS nation_a, b.nation AS nation_b,
               COUNT(*) AS n,
               CAST(SUM(a.rev) AS DOUBLE) AS sx,
               CAST(SUM(b.rev) AS DOUBLE) AS sy,
               CAST(SUM(CAST(a.rev * b.rev AS DECIMAL(38,4))) AS DOUBLE)
                   AS sxy,
               CAST(SUM(CAST(a.rev * a.rev AS DECIMAL(38,4))) AS DOUBLE)
                   AS sxx,
               CAST(SUM(CAST(b.rev * b.rev AS DECIMAL(38,4))) AS DOUBLE)
                   AS syy
        FROM series a JOIN series b
          ON a.mk = b.mk AND a.nation < b.nation
        GROUP BY 1, 2
    )
    SELECT nation_a, nation_b, CAST(n AS BIGINT) AS n_months,
           CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) <= 0
                THEN NULL
                ELSE round((n * sxy - sx * sy)
                     / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
           END AS corr_r
    FROM p
    """,
    doc="A5 transposed-frame correlation (data_science.ipynb:157-169 "
        "second corr demo): correlation BETWEEN series — each nation's "
        "monthly revenue curve against every other's over their common "
        "months. Pearson r from EXACT decimal sums (sum/sum-of-products "
        "in DECIMAL(38,4), one double expression at the end, rounded "
        "6dp) so the hash is engine-stable; the series frame is tiny "
        "(nations x months), so the pair self-join is a broadcast at "
        "any corpus scale.",
)
def q67_corr_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    c = load(spark, "customer", sf_dir)
    n = load(spark, "nation", sf_dir)
    series = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .alias("mk"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    a, b = series.alias("a"), series.alias("b")
    p = (
        a.join(b, (F.col("a.mk") == F.col("b.mk"))
               & (F.col("a.nation") < F.col("b.nation")))
        .groupBy(F.col("a.nation").alias("nation_a"),
                 F.col("b.nation").alias("nation_b"))
        .agg(
            F.count("*").alias("n"),
            F.sum("a.rev").cast("double").alias("sx"),
            F.sum("b.rev").cast("double").alias("sy"),
            F.sum((F.col("a.rev") * F.col("b.rev")).cast("decimal(38,4)"))
            .cast("double").alias("sxy"),
            F.sum((F.col("a.rev") * F.col("a.rev")).cast("decimal(38,4)"))
            .cast("double").alias("sxx"),
            F.sum((F.col("b.rev") * F.col("b.rev")).cast("decimal(38,4)"))
            .cast("double").alias("syy"),
        )
    )
    denom = ((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
             * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")))
    corr = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / F.sqrt(denom), 6)
    return p.select(
        "nation_a", "nation_b", F.col("n").cast("bigint").alias("n_months"),
        F.when(denom <= 0, F.lit(None).cast("double"))
        .otherwise(corr).alias("corr_r"),
    )


@register(
    "q91_media_ahash_neardup",
    # Full SQL twin of the mapInPandas aHash stage (byte extraction via
    # hex(), exact integer mean-pool threshold 64*S_i > sum(S)) plus a
    # brute-force same-type Hamming join — the oracle verifies the
    # banded join admits exactly the <= max_dist pairs. Upgraded from
    # rows-only in round 5 (round-4 VERDICT item 6).
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id,
               ['image/png','audio/wav','video/mp4']
                   [CAST(doc_id % 3 + 1 AS INT)] AS media_type,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents
    ), by AS (
        SELECT media_id, media_type,
               CASE WHEN n < 64
                 THEN list_concat(
                   list_transform(range(1, 2*n+1, 2), p ->
                     (strpos('0123456789ABCDEF',
                             substring(hx, CAST(p AS INT), 1))-1)*16
                     + strpos('0123456789ABCDEF',
                              substring(hx, CAST(p AS INT)+1, 1))-1),
                   list_transform(range(64 - n), x -> 0))
                 ELSE list_transform(range(1, 2*(n - n % 64)+1, 2), p ->
                     (strpos('0123456789ABCDEF',
                             substring(hx, CAST(p AS INT), 1))-1)*16
                     + strpos('0123456789ABCDEF',
                              substring(hx, CAST(p AS INT)+1, 1))-1)
               END AS bv
        FROM m
    ), pooled AS (
        SELECT media_id, media_type,
               list_transform(range(64), i ->
                   list_sum(bv[(i * (len(bv)//64) + 1)
                               :((i+1) * (len(bv)//64))])) AS s,
               list_sum(bv) AS t
        FROM by
    ), h AS (
        SELECT media_id, media_type,
               CAST(list_sum(list_transform(range(64), i ->
                   CASE WHEN 64 * s[CAST(i AS INT)+1] > t
                        THEN CASE WHEN i = 0 THEN -9223372036854775808
                             ELSE (1::HUGEINT << (63 - CAST(i AS INT)))
                             END
                        ELSE 0 END)) AS BIGINT) AS ahash
        FROM pooled
    ), pairs AS (
        SELECT x.media_type,
               CAST(bit_count(xor(x.ahash, y.ahash)) AS INT) AS dist
        FROM h x JOIN h y
          ON x.media_type = y.media_type AND x.media_id < y.media_id
        WHERE bit_count(xor(x.ahash, y.ahash)) <= 4
    )
    SELECT media_type,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact,
           MAX(dist) AS max_dist
    FROM pairs GROUP BY media_type ORDER BY media_type
    """,
    doc="multimodal content near-dup: 64-bit average-hash (aHash) per "
        "payload via Arrow mapInPandas (stubbed decode, real byte "
        "pooling), then Hamming-distance pairs via pigeonhole band "
        "blocking — split the hash into d+1 bands, self-join on a "
        "matching band, first-matching-band predicate kills the pair-"
        "distinct shuffle (the q32 SimHash pattern applied to media), "
        "bit_count(xor) verifies exactly. Content bytes never shuffle: "
        "the join carries (id, 64-bit hash, band) only. Planted-"
        "duplicate recovery is pytest-enforced (test_media_hash.py) "
        "[EXT]",
)
def q91_media_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.sources.multimodal import (
        average_hash,
        hamming_neardup_pairs,
    )

    docs = load(spark, "documents", sf_dir)
    media = media_from_documents(spark, docs)
    pairs = hamming_neardup_pairs(average_hash(media), max_dist=4)
    return (
        pairs.groupBy("media_type")
        .agg(F.count("*").cast("bigint").alias("n_pairs"),
             F.sum(F.when(F.col("dist") == 0, 1).otherwise(0))
             .cast("bigint").alias("n_exact"),
             F.max("dist").cast("int").alias("max_dist"))
        .orderBy("media_type")
    )
