"""Composite operators (LLM-data-pipeline [EXT] surface + consolidation).

Everything here is built from DataFrame/SQL primitives so Catalyst controls
the physical plan; the only pandas-UDF paths are the genuinely non-relational
ones (multimodal decode stubs).
"""

from etl_transparencia_sergipe_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    simhash_pairs,
)
from etl_transparencia_sergipe_spark.operators.similarity import (
    cosine_topk,
)
from etl_transparencia_sergipe_spark.operators.consolidate import (
    consolidate,
)

__all__ = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "cosine_topk",
    "consolidate",
]
