"""Data-quality audit query (q89) — the constraint suite a production
ingest runs before publishing a snapshot (operators/dq.py holds the
reusable check builders)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_transparencia_sergipe_spark.operators.dq import (
    audit,
    check_fk,
    check_not_null,
    check_predicate,
    check_unique,
)
from etl_transparencia_sergipe_spark.plans._helpers import load
from etl_transparencia_sergipe_spark.plans.registry import register


@register(
    "q89_dq_audit",
    oracle="""
    SELECT * FROM (
        SELECT 'customer' AS table_name, 'unique_c_custkey' AS check_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
                   AS n_violations
        FROM customer
        UNION ALL
        SELECT 'part', 'unique_p_partkey', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(DISTINCT p_partkey) AS BIGINT)
        FROM part
        UNION ALL
        SELECT 'orders', 'fk_o_custkey',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'lineitem', 'fk_l_orderkey',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
        UNION ALL
        SELECT 'lineitem', 'discount_quantity_range',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN l_discount BETWEEN 0 AND 1
                              AND l_quantity > 0 THEN 0 ELSE 1 END)
                    AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'orders', 'not_null_o_orderdate', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'documents', 'nonempty_text', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN length(trim(text)) > 0 THEN 0 ELSE 1 END)
                    AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'events', 'nonneg_value', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN value >= 0 THEN 0 ELSE 1 END) AS BIGINT)
        FROM events
    ) ORDER BY table_name, check_name
    """,
    doc="A-class declarative data-quality audit (Deequ/dbt-test family): "
        "key uniqueness, referential integrity (EXISTS anti-join), value "
        "ranges, and null guards across five tables, unioned into one "
        "constraint report — the publish gate a 100 TB ingest runs every "
        "batch (operators/dq.py; the table-level sibling of the "
        "reference's row-level quarantine sink, csv_ptbr.py:64). Shuffle "
        "shape: each check is one map-side-combinable aggregate or one "
        "key-only anti-join; the report union concatenates 1-row frames "
        "[EXT].",
)
def q89_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir)
    lineitem = load(spark, "lineitem", sf_dir)
    part = load(spark, "part", sf_dir)
    documents = load(spark, "documents", sf_dir)
    events = load(spark, "events", sf_dir)
    return audit([
        check_unique(customer, "customer", ["c_custkey"]),
        check_unique(part, "part", ["p_partkey"]),
        check_fk(orders, "orders", "o_custkey", customer, "c_custkey"),
        check_fk(lineitem, "lineitem", "l_orderkey", orders, "o_orderkey"),
        check_predicate(
            lineitem, "lineitem", "discount_quantity_range",
            "l_discount BETWEEN 0 AND 1 AND l_quantity > 0"),
        check_not_null(orders, "orders", "o_orderdate"),
        check_predicate(documents, "documents", "nonempty_text",
                        "length(trim(text)) > 0"),
        check_predicate(events, "events", "nonneg_value", "value >= 0"),
    ])
