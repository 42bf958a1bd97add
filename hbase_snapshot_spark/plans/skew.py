"""Skew-mitigation helpers for hot row keys.

AQE (spark.sql.adaptive.skewJoin) already splits skewed shuffle
partitions at runtime; these helpers cover the two places AQE can't
help: window/groupBy aggregations keyed on a hot key, via the classic
two-phase salted aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, key_cols: list[str], buckets: int = 16) -> DataFrame:
    """add a deterministic salt derived from all columns (content hash),
    spreading a hot key over ``buckets`` partitions"""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(buckets))
    )


def salted_count(df: DataFrame, key_cols: list[str], buckets: int = 16) -> DataFrame:
    """two-phase count: partial count per (key, salt) — map-side-combinable
    and skew-free — then final sum per key"""
    partial = (
        salted(df, key_cols, buckets)
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_c").alias("n"))
