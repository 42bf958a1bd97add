from hbase_snapshot_spark.operators import (
    asof,
    bpe,
    dedup,
    embeddings,
    lm,
    multimodal,
    packing,
    pipeline,
    sampling,
    similarity,
    text,
)

__all__ = [
    "asof",
    "bpe",
    "dedup",
    "embeddings",
    "lm",
    "multimodal",
    "packing",
    "pipeline",
    "sampling",
    "similarity",
    "text",
]
