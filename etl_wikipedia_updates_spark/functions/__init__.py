"""Reusable column-expression helpers (all built-in-function compositions)."""

from etl_wikipedia_updates_spark.functions.deterministic import (
    dec_avg,
    dec_sum,
    money_avg,
    money_sum,
    ts_str,
)
from etl_wikipedia_updates_spark.functions.arrays import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "dec_avg",
    "dec_sum",
    "money_avg",
    "money_sum",
    "ts_str",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
