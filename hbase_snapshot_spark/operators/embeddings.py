"""Embedding-column utilities: normalization and int8 quantization —
the storage/serving reductions an embedding corpus goes through before
ANN indexing (beyond-reference; arrays are opaque blobs to the
reference).

Pure-Column lambda ops (transform/aggregate) — JVM-side, no UDFs."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_snapshot_spark.functions import l2_norm


def l2_normalize(vec: Column) -> Column:
    """unit-norm the vector (zero vectors stay zero)"""
    n = l2_norm(vec)
    return F.when(n == 0, vec).otherwise(F.transform(vec, lambda x: x / n))


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 quantization: scale = max|x| / 127,
    q_i = round(x_i / scale).  Emits the scale plus summary stats of the
    quantized vector (sum/min/max) — a compact, hash-checkable witness
    of the full quantized array."""
    v = F.col(vec_col)
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.greatest(absmax / 127.0, F.lit(1e-12))
    q = F.transform(v, lambda x: F.round(x / scale).cast("int"))
    return df.select(
        F.col(id_col),
        F.round(scale, 9).alias("scale"),
        F.aggregate(q, F.lit(0), lambda acc, x: acc + x).alias("q_sum"),
        F.array_min(q).alias("q_min"),
        F.array_max(q).alias("q_max"),
    )
