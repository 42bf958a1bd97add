"""Deterministic sampling for training-data pipelines.

Hash-based sampling (md5 of the key → uniform fraction) is reproducible
across runs, engines, and cluster sizes — unlike ``df.sample`` whose
output depends on partitioning.  Stratified variant applies a
per-stratum rate (the standard data-mixture rebalancing step).

Both are pure Column expressions and have exact DuckDB oracle twins
(the md5-hex → fraction arithmetic is engine-portable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_fraction(key: Column) -> Column:
    """uniform [0,1) fraction from the first 8 hex chars of md5(key)"""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / float(1 << 32)


def hash_sample(df: DataFrame, key: Column, fraction: float) -> DataFrame:
    """keep rows whose hash fraction < fraction — deterministic,
    partition-independent sampling"""
    return df.filter(hash_fraction(key) < fraction)


def stratified_sample(
    df: DataFrame,
    key: Column,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
) -> DataFrame:
    """per-stratum deterministic sampling rates (data-mixture control):
    e.g. {'en': 0.1, 'de': 1.0} keeps 10% of English, all German,
    nothing else (default)."""
    rate = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(stratum)
        rate = F.when(cond, frac) if rate is None else rate.when(cond, frac)
    rate = rate.otherwise(F.lit(default)) if rate is not None else F.lit(default)
    return df.filter(hash_fraction(key) < rate)
