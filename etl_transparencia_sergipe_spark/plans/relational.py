"""Relational operator queries (SURVEY.md §2.2-§2.8).

Each query exercises one operator family from the inventory, on the driver
star schema, with a DuckDB oracle. Reference citations are on each builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_transparencia_sergipe_spark.functions.money import (
    format_ptbr_money,
    format_ptbr_money_sql,
    parse_ptbr_money,
    parse_ptbr_money_sql,
)
from etl_transparencia_sergipe_spark.functions.normalize import (
    normalize_text,
    normalize_text_sql,
    term_filter_arrow,
    term_filter_sql,
)
from etl_transparencia_sergipe_spark.plans._helpers import (
    REVENUE_SQL,
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    load,
    revenue_col,
)
from etl_transparencia_sergipe_spark.plans.registry import register

# ---------------------------------------------------------------------------
# A7/A10 partial+final agg — TPC-H Q1 shape (reference consolidation stats,
# file_utils.py:29 counts + data_science.ipynb aggregate analytics).
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql(REVENUE_SQL, 6)} AS sum_disc_price,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_discount', 4)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="hash agg w/ map-side partial aggregation (A7/A10); TPC-H Q1 shape",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_transparencia_sergipe_spark.operators.scale import fan_out

    li = load(spark, "lineitem", sf_dir)
    # round 12: five exact-decimal aggregates dominate this query (~10x
    # the scan cost) and the partial agg ran inside a single-file scan's
    # ONE task locally — fan the filtered narrow projection out first
    # (guide §2.5; decimal sums are order-exact, result bit-identical)
    need = ["l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount"]
    return (
        fan_out(
            li.filter(F.col("l_shipdate")
                      <= F.lit("1998-09-02").cast("timestamp"))
            .select(*need))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(revenue_col()).cast("double").alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount", 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# P3+P4 — THE reference core filter: normalize text, keep rows matching any
# term (aracaju_barra_pirambu_scraper.py:36,194 / 39-43), then aggregate.
# Terms adapted to the testdata corpus vocabulary.
# ---------------------------------------------------------------------------

_DOC_TERMS = ("stream", "vector", "petroleo")


@register(
    "q02_term_filter_normalize",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           {dsum_sql('n_chars', 0)} AS total_chars
    FROM documents
    WHERE {term_filter_sql('text', _DOC_TERMS)}
    GROUP BY lang
    """,
    doc="P3 normalize + P4 multi-term filter + agg (the reference's "
        "royalty filter, aracaju_barra_pirambu_scraper.py:36,194). "
        "Round 6: the filter runs as the Arrow-vectorized predicate "
        "(term_filter_arrow) — one C-level translate pass per batch, "
        "booleans-only back across Arrow — closing the measured 4.5x "
        "sf1 gap vs the oracle (2.75 s -> 0.58 s warm; the codegen "
        "expression path materializes three JVM strings per row). "
        "term_filter/normalize_text stay the expression path for "
        "short dimension strings where codegen wins.",
)
def q02_term_filter_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return (
        docs.filter(term_filter_arrow("text", _DOC_TERMS))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            dsum("n_chars", 0).alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# F6 — pt-BR money format + parse roundtrip (data_science.ipynb:46-53).
# ---------------------------------------------------------------------------


@register(
    "q03_money_roundtrip",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {format_ptbr_money_sql('l_extendedprice')} AS pago_brl,
           CAST({parse_ptbr_money_sql(format_ptbr_money_sql('l_extendedprice'))}
                AS DOUBLE) AS pago_dec
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
    doc="F6 pt-BR currency format+parse roundtrip (data_science.ipynb:46-53)",
)
def q03_money_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") % 100 == 0)
    brl = format_ptbr_money(F.col("l_extendedprice"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        brl.alias("pago_brl"),
        parse_ptbr_money(brl).cast("double").alias("pago_dec"),
    )


# ---------------------------------------------------------------------------
# J3 equi join + date-part agg — the (cidade, ano, mes) consolidation view
# (file_utils.py:22-57) re-expressed as a partitioned star-schema agg.
# ---------------------------------------------------------------------------


@register(
    "q04_monthly_revenue",
    oracle=f"""
    SELECT year(o_orderdate) AS ano, month(o_orderdate) AS mes,
           {dsum_sql(REVENUE_SQL, 6)} AS revenue,
           COUNT(DISTINCT o.o_orderkey) AS n_orders
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    """,
    doc="J3 equi join + A7 monthly money rollup (consolidation parity, "
        "file_utils.py:22-57)",
)
def q04_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reduce-before-join (round 13, guide §2.3 "aggregate before you
    shuffle" — the q05 shape): the previous plan joined orders x lineitem
    first, so the join exchange carried every LINEITEM row (with the
    revenue decimals and the order date attached post-join) and only then
    collapsed to per-order partials. Collapsing lineitem to per-order
    revenue BEFORE the join shrinks the fact-side exchange to one narrow
    (key, decimal) row per ORDER (map-side partial agg does the collapse
    pre-shuffle: ~4x fewer rows at TPC-H ratios, and the month-level agg
    keys come from the dimension side only). Equivalences: revenue is an
    exact DECIMAL sum reassociated over the same two levels (per-order,
    then per-month — bit-identical); n_orders = COUNT(*) of per-order
    rows per month, and an order appears in per_order iff it has a
    lineitem — exactly the old inner-join + per-order-group count.
    Measured (bench protocol, sf0.1, 3 interleaved reps): warm median
    1.59 -> 1.25 s, cold 2.25 -> 1.66 s; hash green at sf0.01/sf0.1."""
    o = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    per_order = (
        li.groupBy("l_orderkey").agg(F.sum(revenue_col()).alias("rev"))
    )
    joined = o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("ano"),
        F.month("o_orderdate").alias("mes"),
    ).join(per_order, F.col("o_orderkey") == F.col("l_orderkey"))
    return joined.groupBy("ano", "mes").agg(
        F.sum("rev").cast("double").alias("revenue"),
        F.count("*").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# O3 top-k with deterministic tie-break; J3 3-way join with broadcast dim.
# ---------------------------------------------------------------------------


@register(
    "q05_top_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {dsum_sql(REVENUE_SQL, 6)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 10
    """,
    doc="O3 top-k (TakeOrderedAndProject) + broadcast dim join (J2/J3)",
)
def q05_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reduce-before-join shape (round 5): the original plan joined
    customer->orders->lineitem first and grouped the 6M-row wide join
    result by (custkey, name, nation) — every exchange carried the
    customer strings alongside the fact columns. Revenue is an exact
    DECIMAL sum, so reaggregation is associative and hash-identical:
    collapse lineitem to per-order revenue (narrow 2-column shuffle),
    attach o_custkey and collapse to per-customer revenue, and only then
    join the customer dim + broadcast nation. At 100 TB the dominant
    exchange drops from |lineitem| wide rows to |lineitem| (key, decimal)
    pairs, and the dim join sees |customers| rows instead of |lineitem|.
    Measured sf1 steady (4-run, same session): 4.1-4.6 s -> 1.5-1.7 s,
    identical hash both scales."""
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    n = load(spark, "nation", sf_dir)
    per_order = (
        li.groupBy("l_orderkey").agg(F.sum(revenue_col()).alias("rev"))
    )
    per_cust = (
        per_order.join(o.select("o_orderkey", "o_custkey"),
                       per_order.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_custkey").agg(F.sum("rev").alias("rev"))
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "n_name",
                F.col("rev").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# U1 — schema-merging UNION (pd.concat parity, file_utils.py:51): month
# shards with drifting column sets -> unionByName(allowMissingColumns).
# ---------------------------------------------------------------------------


@register(
    "q06_union_consolidation",
    oracle=f"""
    WITH shard_n AS (
        SELECT l_orderkey, l_returnflag, l_quantity, l_tax
        FROM lineitem WHERE l_returnflag = 'N'
    ), shard_a AS (
        SELECT l_orderkey, l_returnflag, l_quantity
        FROM lineitem WHERE l_returnflag = 'A'
    ), shard_r AS (
        SELECT l_orderkey, l_returnflag, l_tax
        FROM lineitem WHERE l_returnflag = 'R'
    ), unioned AS (
        SELECT * FROM shard_n
        UNION ALL BY NAME SELECT * FROM shard_a
        UNION ALL BY NAME SELECT * FROM shard_r
    )
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(l_quantity) AS n_qty,
           COUNT(l_tax) AS n_tax,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM unioned GROUP BY l_returnflag
    """,
    doc="U1 schema-merging union w/ missing columns (file_utils.py:51 "
        "pandas-concat NaN-fill parity)",
)
def q06_union_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    shard_n = li.filter("l_returnflag = 'N'").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_tax")
    shard_a = li.filter("l_returnflag = 'A'").select(
        "l_orderkey", "l_returnflag", "l_quantity")
    shard_r = li.filter("l_returnflag = 'R'").select(
        "l_orderkey", "l_returnflag", "l_tax")
    unioned = shard_n.unionByName(shard_a, allowMissingColumns=True).unionByName(
        shard_r, allowMissingColumns=True)
    return unioned.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        F.count("l_tax").alias("n_tax"),
        dsum("l_quantity").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# J4 semi/anti — "already-scraped month" incremental-skip semantics
# (SURVEY.md §2.3; retry-queue left_anti D4).
# ---------------------------------------------------------------------------


@register(
    "q07_anti_join_inactive_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND year(o.o_orderdate) = 1995)
    """,
    doc="J4 left_anti (NOT EXISTS) — incremental-skip / retry-queue shape "
        "(D4, aracaju_barra_pirambu_scraper.py:236-252)",
)
def q07_anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir).filter(F.year("o_orderdate") == 1995)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment")


@register(
    "q08_semi_join_big_orders",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice AS total
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    """,
    doc="J4 left_semi (EXISTS) over the fact table",
)
def q08_semi_join_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir).filter(F.col("l_quantity") > 45)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").alias("total"))


# ---------------------------------------------------------------------------
# §2.5 windows — ranking / lag / running totals (all [EXT]).
# ---------------------------------------------------------------------------


@register(
    "q09_top_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice AS total
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
    doc="window row_number top-1-per-group (§2.5) with deterministic tie-break",
)
def q09_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("o_custkey", "o_orderkey", F.col("o_totalprice").alias("total"))
    )


@register(
    "q10_running_monthly_revenue",
    oracle=f"""
    WITH monthly AS (
        SELECT year(o_orderdate) AS ano, month(o_orderdate) AS mes,
               {dsum_sql('o_totalprice')} AS rev
        FROM orders GROUP BY 1, 2
    )
    SELECT ano, mes, rev,
           CAST(SUM(CAST(rev AS DECIMAL(18,2)))
                OVER (PARTITION BY ano ORDER BY mes
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_rev,
           CAST(lag(CAST(rev AS DECIMAL(18,2))) OVER (PARTITION BY ano ORDER BY mes)
                AS DOUBLE) AS prev_rev
    FROM monthly
    """,
    doc="window running sum + lag (month-over-month, §2.5)",
)
def q10_running_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    monthly = o.groupBy(
        F.year("o_orderdate").alias("ano"),
        F.month("o_orderdate").alias("mes"),
    ).agg(dsum("o_totalprice").alias("rev"))
    w = W.partitionBy("ano").orderBy("mes")
    return monthly.select(
        "ano", "mes", "rev",
        F.sum(F.col("rev").cast("decimal(18,2)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double").alias("running_rev"),
        F.lag(F.col("rev").cast("decimal(18,2)")).over(w)
        .cast("double").alias("prev_rev"),
    )


# ---------------------------------------------------------------------------
# A8/A9 — distinct, rollup hierarchies (ano, mes).
# ---------------------------------------------------------------------------


@register(
    "q11_rollup_revenue",
    oracle=f"""
    SELECT year(o_orderdate) AS ano, month(o_orderdate) AS mes,
           {dsum_sql('o_totalprice')} AS rev, COUNT(*) AS n
    FROM orders GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))
    """,
    doc="A9 rollup (ano, mes) hierarchy incl. grand total",
)
def q11_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    return (
        o.withColumn("ano", F.year("o_orderdate"))
        .withColumn("mes", F.month("o_orderdate"))
        .rollup("ano", "mes")
        .agg(dsum("o_totalprice").alias("rev"), F.count("*").alias("n"))
    )


@register(
    "q12_distinct_customers_monthly",
    oracle="""
    SELECT year(o_orderdate) AS ano, month(o_orderdate) AS mes,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders GROUP BY 1, 2
    """,
    doc="A8 multi countDistinct (expand-based distinct agg)",
)
def q12_distinct_customers_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    return o.groupBy(
        F.year("o_orderdate").alias("ano"),
        F.month("o_orderdate").alias("mes"),
    ).agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


# ---------------------------------------------------------------------------
# U3 intersect/except; J5 range predicate join.
# ---------------------------------------------------------------------------


@register(
    "q13_intersect_except_custkeys",
    oracle="""
    WITH y1995 AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE year(o_orderdate) = 1995),
         y1996 AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE year(o_orderdate) = 1996),
         both_years AS (SELECT o_custkey FROM y1995 INTERSECT
                        SELECT o_custkey FROM y1996),
         only_1995 AS (SELECT o_custkey FROM y1995 EXCEPT
                       SELECT o_custkey FROM y1996)
    SELECT 'both' AS cohort, COUNT(*) AS n FROM both_years
    UNION ALL
    SELECT 'only_1995' AS cohort, COUNT(*) AS n FROM only_1995
    """,
    doc="U3 intersect + except cohort analysis",
)
def q13_intersect_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    y1995 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y1996 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    both_years = y1995.intersect(y1996).agg(F.count("*").alias("n")).select(
        F.lit("both").alias("cohort"), "n")
    only_1995 = y1995.exceptAll(y1996).agg(F.count("*").alias("n")).select(
        F.lit("only_1995").alias("cohort"), "n")
    return both_years.unionByName(only_1995)


@register(
    "q14_range_join_ship_lag",
    oracle="""
    SELECT year(o_orderdate) AS ano,
           COUNT(*) AS n_fast_lines
    FROM orders o JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    GROUP BY 1
    """,
    doc="J5 range/interval predicate join (date-in-period, "
        "teste_selenium.ipynb:118-125 date-range semantics)",
)
def q14_range_join_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    cond = (
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAYS"))
    )
    return o.join(li, cond).groupBy(
        F.year("o_orderdate").alias("ano")
    ).agg(F.count("*").alias("n_fast_lines"))


# ---------------------------------------------------------------------------
# F12 JSON extraction (config parse parity, main.py:38-39) on events.props.
# ---------------------------------------------------------------------------


@register(
    "q15_json_extract_events",
    oracle=f"""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           {dsum_sql('value')} AS total_value
    FROM events GROUP BY 1
    """,
    doc="F12 JSON field extraction (get_json_object) + agg",
)
def q15_json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    return (
        ev.withColumn(
            "k_bucket",
            (F.get_json_object("props", "$.k").cast("bigint") % 10),
        )
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
    )


# ---------------------------------------------------------------------------
# P1/P2/P3 — projection + dynamic rename + normalization as a query.
# ---------------------------------------------------------------------------


@register(
    "q16_normalized_projection",
    oracle=f"""
    SELECT DISTINCT p_brand,
           {normalize_text_sql('p_type')} AS tipo_norm,
           {normalize_text_sql('p_name')} AS nome_norm
    FROM part
    """,
    doc="P1 fixed projection + P3 normalizar as column exprs "
        "(aracaju_barra_pirambu_scraper.py:39-43,199-204)",
)
def q16_normalized_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, "part", sf_dir)
    return p.select(
        "p_brand",
        normalize_text("p_type").alias("tipo_norm"),
        normalize_text("p_name").alias("nome_norm"),
    ).distinct()


# ---------------------------------------------------------------------------
# CASE bucketing + pivot (O2-adjacent analytics shape).
# ---------------------------------------------------------------------------


@register(
    "q17_price_bucket_pivot",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS bucket,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS st_open,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS st_filled,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS st_partial
    FROM orders GROUP BY 1
    """,
    doc="CASE WHEN bucketing + pivot on order status",
)
def q17_price_bucket_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    pivoted = (
        o.withColumn("bucket", bucket)
        .groupBy("bucket")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return pivoted.select(
        "bucket",
        F.coalesce("O", F.lit(0)).alias("st_open"),
        F.coalesce("F", F.lit(0)).alias("st_filled"),
        F.coalesce("P", F.lit(0)).alias("st_partial"),
    )
