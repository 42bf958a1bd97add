"""Bucketed cell storage — registering tables with sorted-bucket
metadata so Catalyst can join/aggregate them WITHOUT a shuffle
(SURVEY §4: 'register the engine's tables with sorted-bucket metadata
so Catalyst can exploit ordering').

At 100 TB this is the difference between re-shuffling both sides of
every row-key join and a zero-exchange sort-merge join: two cell tables
bucketed by ``row`` into the same bucket count are joined bucket-to-
bucket.  The reference gets the same effect from aligned region
boundaries (TableInputFormat one-split-per-region + HRegionPartitioner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table_name: str,
    buckets: int = 32,
    bucket_col: str = "row",
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """write a DataFrame as a bucketed+sorted catalog table"""
    w = (
        df.write.mode(mode)
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
