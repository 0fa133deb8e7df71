from labelspark_spark.operators import (
    asof,
    dedup,
    enrich,
    flatten,
    multimodal,
    silver,
    similarity,
    uploads,
)

__all__ = [
    "asof",
    "dedup",
    "enrich",
    "flatten",
    "multimodal",
    "silver",
    "similarity",
    "uploads",
]
