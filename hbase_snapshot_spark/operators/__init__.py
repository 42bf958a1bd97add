from hbase_snapshot_spark.operators import (
    asof,
    dedup,
    embeddings,
    multimodal,
    packing,
    pipeline,
    sampling,
    similarity,
    text,
)

__all__ = [
    "asof",
    "dedup",
    "embeddings",
    "multimodal",
    "packing",
    "pipeline",
    "sampling",
    "similarity",
    "text",
]
