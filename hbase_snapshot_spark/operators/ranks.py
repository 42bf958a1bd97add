"""Distributed global ranking — ``row_number / ntile / percent_rank /
cume_dist OVER (ORDER BY ...)`` without the single-task window Spark
executes them as.

Spark runs an unpartitioned window in ONE task: at 10⁹ rows the whole
table funnels through a single sort.  But a global rank is a pure
function of range partitioning: range-partition on the order columns
(ascending buckets aligned with the target order), row_number within
each bucket, plus the running row count of the preceding buckets —
which is metadata-sized (one row per partition) and derived from the
ONE persisted materialization of the range exchange (see the
load-bearing persist note in global_ranks).  Every derived statistic
is closed-form from (rank, N):

* ``ntile(b)``:   first ``N % b`` tiles take ``ceil(N/b)`` rows, the
  rest ``floor(N/b)`` — the standard SQL contract;
* ``percent_rank``: ``(rank-1)/(N-1)`` (0.0 when N == 1);
* ``cume_dist``: ``rank/N`` (valid because the order is total — with
  ties row_number ≠ rank and cume_dist would need the tie-group max).

``order_cols`` MUST be a total order (append a unique id as the last
column, exactly like rfm_scores' (metric, user) tie-break): under a
total order row_number == rank == the deterministic value both engines
agree on; under ties row_number is partition-order-dependent.  NULL
order values rank nulls-FIRST (Spark's ASC default) — an ANSI-SQL
oracle must spell ``NULLS FIRST`` explicitly (DuckDB defaults to
NULLS LAST).

This is the single-order sibling of rfm_scores' three-metric melt
(operators/asof.py) — same machinery, same scale posture: no driver
collect, no SinglePartition, nothing data-sized through one task.  The
bucket-offsets window runs over ONE row per range partition (P rows
total), keyed by a constant — metadata-sized by construction.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ------------------------------------------------------- cache lifecycle

#: Innermost-first stack of active rank_cache_scope collectors.  The
#: rank primitives' persists are LOAD-BEARING (see global_ranks), so
#: they deliberately never unpersist themselves — but a long-lived
#: session ranking many tables would accumulate caches without bound.
_ACTIVE_SCOPES: list[list[DataFrame]] = []


def _register_cache(df: DataFrame) -> DataFrame:
    if _ACTIVE_SCOPES:
        _ACTIVE_SCOPES[-1].append(df)
    return df


@contextmanager
def rank_cache_scope():
    """Bound the load-bearing persists of global_ranks / rfm_scores:
    every cache they create inside the ``with`` block is unpersisted on
    exit.  CONTRACT: consume (collect / write / count) the returned
    DataFrames INSIDE the scope — executing them after exit recomputes
    the range exchange uncached, which re-opens the bucket-id
    consistency hazard the persist exists to close.

        with rank_cache_scope():
            out = global_ranks(df, ["v", "id"])
            out.write.parquet(...)        # materialized in-scope
        # caches released here

    Scopes nest; each persist registers with the innermost one.
    Without an active scope the historical behavior stands: caches
    live until their lineage is garbage-collected (ContextCleaner) or
    ``spark.catalog.clearCache()``.  Yields the collector list so
    callers can inspect what was pinned."""
    scope: list[DataFrame] = []
    _ACTIVE_SCOPES.append(scope)
    try:
        yield scope
    finally:
        _ACTIVE_SCOPES.pop()
        for df in scope:
            df.unpersist()


def global_ranks(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    buckets: int | None = None,
    ntile_col: str = "ntile",
    percent: bool = False,
    range_partitions: int | None = None,
) -> DataFrame:
    """Add ``rank_col`` (1-based global rank in ``order_cols`` asc
    order); with ``buckets`` also ``ntile_col``; with ``percent`` also
    ``percent_rank`` and ``cume_dist``.  All bit-identical to the
    corresponding unpartitioned window functions over the same total
    order."""
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    spark = df.sparkSession
    P = int(range_partitions
            or spark.conf.get("spark.sql.shuffle.partitions"))
    # PERSIST is load-bearing, not an optimization: the bucket counts
    # and the ranked rows both key off spark_partition_id() of THIS
    # range exchange, so they must observe ONE materialization.
    # Without it, consistency rests on ReuseExchange canonical
    # equality — which ANY external column pruning can break (observed:
    # global_ranks(global_ranks(df)) pruned the two consumers
    # differently, the exchange ran twice with independent range
    # sampling, and the bucket-id maps disagreed → silently wrong,
    # run-unstable ranks).  The cache substitutes one InMemoryRelation
    # into both branches regardless of pruning above it; an evicted
    # partition recomputes from the exchange's already-written shuffle
    # files, so bucket ids stay fixed.  Cache size = the input rows —
    # size the call accordingly (rank user/aggregate tables, not raw
    # corpora).  Lifecycle: no unpersist here (consumers are lazy);
    # the ContextCleaner reclaims the cache once the returned
    # DataFrame's lineage is garbage-collected, a long-lived session
    # can force the issue with spark.catalog.clearCache(), and
    # pipelines that rank many tables should wrap their consume in
    # rank_cache_scope() for deterministic release.
    from pyspark import StorageLevel

    rp = _register_cache(
        df.repartitionByRange(P, *[F.col(c).asc() for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK))
    cnt = rp.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    # The offsets window runs over the P-row bucket summary and DOES
    # compile to an Exchange SinglePartition — deliberately: its input
    # is one row per range partition (metadata-sized by construction,
    # bounded by range_partitions regardless of data volume), which is
    # the one place a single-task stage is harmless.  The plan pin in
    # tests asserts exactly this: any SinglePartition exchange sits
    # directly above the _pid-keyed count aggregate, never above data.
    off_w = (Window.partitionBy(F.lit(0)).orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    meta = cnt.select(
        "_pid",
        (F.sum("_c").over(off_w) - F.col("_c")).alias("_off"),
        F.sum("_c").over(Window.partitionBy(F.lit(0))).alias("_n"),
    )
    rn_w = (Window.partitionBy("_pid")
            .orderBy(*[F.col(c).asc() for c in order_cols]))
    out = (
        rp.join(F.broadcast(meta), "_pid")
        .withColumn(rank_col, F.col("_off") + F.row_number().over(rn_w))
    )
    rk = F.col(rank_col)
    if buckets is not None:
        out = (
            out.withColumn("_q", F.expr(f"_n div {buckets}"))
            .withColumn("_r", F.expr(f"_n % {buckets}"))
            # greatest(_q, 1L): unreachable divisor branch, but ANSI +
            # common-subexpression elimination can evaluate it anyway
            .withColumn(ntile_col, F.expr(
                f"CASE WHEN {rank_col} <= _r * (_q + 1)"
                f"     THEN ({rank_col} - 1) div (_q + 1) + 1"
                f"     ELSE _r + ({rank_col} - _r * (_q + 1) - 1)"
                "               div greatest(_q, 1L) + 1 END"))
            .drop("_q", "_r")
        )
    if percent:
        out = out.withColumn(
            "percent_rank",
            F.when(F.col("_n") > 1,
                   (rk - 1) / (F.col("_n") - 1)).otherwise(F.lit(0.0)),
        ).withColumn("cume_dist", rk / F.col("_n"))
    return out.drop("_pid", "_off", "_n")
