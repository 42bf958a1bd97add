from hbase_snapshot_spark.operators import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
