"""Extension operators for large-scale training-data pipelines.

These go beyond the reference's own surface (BASELINE.json north star):
deduplication, similarity search, text analysis, multimodal columns — each
designed for 100 TB first (shuffle budgets, skew caps, no driver-side
loops), then validated against DuckDB oracles at small SF.
"""

from mongo_arrow_spark.operators import (
    clustering,
    dedup,
    encoding,
    expectations,
    langid,
    layout,
    membership,
    multimodal,
    selection,
    similarity,
    text,
    tokenizer,
    url,
    versioning,
)

__all__ = [
    "clustering",
    "dedup",
    "encoding",
    "expectations",
    "langid",
    "layout",
    "membership",
    "selection",
    "similarity",
    "text",
    "tokenizer",
    "url",
    "multimodal",
    "versioning",
]
