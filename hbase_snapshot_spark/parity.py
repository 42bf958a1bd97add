"""Parity harness — deterministic cell encodings of the driver's
TPC-H-ish tables, used by ``__spark_entry__.py`` to exercise every
engine operator with a DuckDB-checkable oracle.

``encode_orders_cells`` melts the ``orders`` table into a versioned cell
stream with puts, updates, and all three tombstone kinds, derived purely
from ``o_orderkey`` arithmetic so that the identical stream is
expressible in ANSI SQL (see oracle.py — the two definitions are kept
in lock-step; tests/test_parity.py asserts they agree cell-for-cell).

The melt is a single-pass ``explode`` over per-row struct arrays — the
shape a 100 TB ImportTsv-style ingest would use (one scan, no
self-unions; Catalyst prunes the unused order columns from the scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_snapshot_spark.model import KeyType
from hbase_snapshot_spark.resolve import ResolveSpec, resolve

CELL_COLS = ["row", "family", "qualifier", "ts", "type", "seq", "value"]


def _cell_struct(family, qualifier, ts: int, typ: int, seq: int, value) -> Column:
    q = F.lit(qualifier).cast("string") if not isinstance(qualifier, Column) else qualifier
    v = value if isinstance(value, Column) else F.lit(value)
    return F.struct(
        F.lit(family).cast("string").alias("family"),
        q.alias("qualifier"),
        F.lit(ts).cast("long").alias("ts"),
        F.lit(typ).cast("int").alias("type"),
        F.lit(seq).cast("long").alias("seq"),
        v.cast("string").alias("value"),
    )


def encode_orders_cells(
    spark: SparkSession, sf_dir: str, input_partitions: int | None = None
) -> DataFrame:
    """orders → versioned cell stream.  Families: 'o' (status, total) and
    'm' (prio, odate).  Versions/tombstones keyed off o_orderkey mod
    classes; mirrored exactly by oracle.orders_cells_sql().

    ``input_partitions`` spreads a single-file source before the melt:
    the test-scale orders.parquet is ONE row group, so without it the
    whole explode runs on one core — at 100 TB the source is thousands
    of splits and the melt parallelizes naturally, so the bench sets
    this to mirror the scale shape (row content is unchanged)."""
    # date_format below is session-TZ-sensitive; pin UTC so the oracle's
    # (UTC-naive) strftime agrees regardless of the host session's tz
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    if input_partitions:
        o = o.repartition(input_partitions)
    k = F.col("o_orderkey")
    total_s = F.col("o_totalprice").cast("decimal(18,2)").cast("string")
    odate_s = F.date_format("o_orderdate", "yyyy-MM-dd")

    def guarded(cond: Column, st: Column) -> Column:
        return F.when(cond, st)

    cells = F.array(
        _cell_struct("o", "status", 1000, KeyType.PUT, 1, F.col("o_orderstatus")),
        _cell_struct("o", "total", 1000, KeyType.PUT, 1, total_s),
        _cell_struct("m", "prio", 1000, KeyType.PUT, 1, F.col("o_orderpriority")),
        _cell_struct("m", "odate", 1000, KeyType.PUT, 1, odate_s),
        guarded(k % 3 == 0, _cell_struct(
            "o", "status", 2000, KeyType.PUT, 2, F.concat(F.lit("U-"), F.col("o_orderstatus")))),
        guarded(k % 9 == 0, _cell_struct("o", "status", 3000, KeyType.PUT, 3, "FINAL")),
        guarded(k % 6 == 0, _cell_struct(
            "o", "total", 2000, KeyType.PUT, 4, F.concat(F.lit("T2-"), total_s))),
        guarded(k % 5 == 0, _cell_struct(
            "m", "prio", 1500, KeyType.DELETE_COLUMN, 5, F.lit(None))),
        guarded(k % 11 == 0, _cell_struct(
            "o", None, 1700, KeyType.DELETE_FAMILY, 6, F.lit(None))),
        guarded(k % 7 == 0, _cell_struct(
            "o", "total", 1000, KeyType.DELETE, 7, F.lit(None))),
    )
    return (
        o.select(
            F.lpad(k.cast("string"), 12, "0").alias("row"),
            F.explode(F.filter(cells, lambda c: c.isNotNull())).alias("c"),
        )
        .select("row", "c.*")
    )


def resolve_orders(spark: SparkSession, sf_dir: str, spec: ResolveSpec) -> DataFrame:
    out = resolve(encode_orders_cells(spark, sf_dir), spec=spec)
    return out.select("row", "family", "qualifier", "ts", "value")
