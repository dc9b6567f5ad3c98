from etl_transparencia_sergipe_spark.plans.registry import (
    QueryDef,
    REGISTRY,
    register,
    queries,
    oracle_sql,
)

__all__ = ["QueryDef", "REGISTRY", "register", "queries", "oracle_sql"]
