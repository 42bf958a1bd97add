"""Skew-mitigation helpers for hot row keys.

AQE (spark.sql.adaptive.skewJoin) already splits skewed shuffle
partitions at runtime; these helpers cover the two places AQE can't
help: window/groupBy aggregations keyed on a hot key, via the classic
two-phase salted aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, buckets: int = 16) -> DataFrame:
    """add a per-row salt spreading hot keys over ``buckets`` partitions.

    The salt must vary WITHIN identical rows — duplicate rows of one hot
    key are exactly the skew shape — so it derives from the physical row
    position (monotonically_increasing_id), never a content hash (a
    content hash gives every duplicate the same salt and spreads
    nothing).  Aggregation results don't depend on salt values, only the
    partial/final split does."""
    return df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(buckets))
    )


def salted_count(df: DataFrame, key_cols: list[str], buckets: int = 16) -> DataFrame:
    """two-phase count: partial count per (key, salt) — map-side-combinable
    and skew-free — then final sum per key"""
    partial = (
        salted(df, buckets)
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_c").alias("n"))
