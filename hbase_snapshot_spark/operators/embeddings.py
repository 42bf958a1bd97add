"""Embedding-column utilities: normalization and int8 quantization —
the storage/serving reductions an embedding corpus goes through before
ANN indexing (beyond-reference; arrays are opaque blobs to the
reference).

Pure-Column lambda ops (transform/aggregate) — JVM-side, no UDFs."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_snapshot_spark.functions import bind_once, l2_norm


def l2_normalize(vec: Column) -> Column:
    """unit-norm the vector (zero vectors stay zero).  The norm is
    bound ONCE (functions.bind_once): HOF lambda bodies get no
    common-subexpression elimination, so an inlined norm would be
    re-summed per ELEMENT — O(d²) per row instead of O(d)."""
    return bind_once(
        l2_norm(vec),
        lambda n: F.when(n == 0.0, vec).otherwise(
            F.transform(vec, lambda x: x / n)),
    )


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 quantization: scale = max|x| / 127,
    q_i = round(x_i / scale).  Emits the scale (round-9 display of the
    exact scale the quantization used) plus summary stats of the
    quantized vector (sum/min/max) — a compact, hash-checkable witness
    of the full quantized array.

    scale and q are bound ONCE (functions.bind_once): inlined, the
    O(d) scale expression re-evaluated per element of q (O(d²) per
    row), and each of the three aggregates re-ran the whole q chain —
    ~4·d² multiply/abs ops per row at d=1024 instead of ~4·d."""
    v = F.col(vec_col)
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x)))

    def emit(b):
        return F.struct(
            F.round(b["scale"], 9).alias("scale"),
            F.aggregate(b["q"], F.lit(0),
                        lambda acc, x: acc + x).alias("q_sum"),
            F.array_min(b["q"]).alias("q_min"),
            F.array_max(b["q"]).alias("q_max"),
        )

    bound = bind_once(
        F.greatest(absmax / 127.0, F.lit(1e-12)),
        lambda s: F.struct(
            s.alias("scale"),
            F.transform(v, lambda x: F.round(x / s).cast("int")).alias("q"),
        ),
    )
    out = bind_once(bound, emit)
    # the result struct materializes in its OWN projection and the
    # field extraction reads the attribute: extracting four fields of
    # the raw expression would clone the whole chain four times
    # (CollapseProject declines to merge: the struct is not cheap and
    # is referenced more than once)
    return df.select(F.col(id_col), out.alias("_o")).select(
        id_col,
        F.col("_o.scale").alias("scale"),
        F.col("_o.q_sum").alias("q_sum"),
        F.col("_o.q_min").alias("q_min"),
        F.col("_o.q_max").alias("q_max"),
    )
