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
order values follow Spark's window defaults — ASC ranks nulls FIRST,
DESC ranks nulls LAST — so an ANSI-SQL oracle must spell
``NULLS FIRST`` explicitly on ascending columns (DuckDB defaults to
NULLS LAST either direction).

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

#: Per-THREAD stack of active rank_cache_scope collectors (driver apps
#: routinely run concurrent jobs from a thread pool; a process-global
#: stack would let thread A's scope capture — and unpersist — thread
#: B's load-bearing caches).  The rank primitives' persists are
#: LOAD-BEARING (see global_ranks), so they deliberately never
#: unpersist themselves — but a long-lived session ranking many tables
#: would accumulate caches without bound.
import threading

_SCOPES = threading.local()


def _scope_stack() -> list:
    stack = getattr(_SCOPES, "stack", None)
    if stack is None:
        stack = _SCOPES.stack = []
    return stack


def _register_cache(df: DataFrame) -> DataFrame:
    stack = _scope_stack()
    if stack:
        stack[-1].append(df)
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

    Scopes nest and are PER-THREAD (a concurrent driver thread's rank
    calls never register with — or get unpersisted by — another
    thread's scope).  Without an active scope the caches are pinned
    for the SESSION — the SQL CacheManager keeps a strong reference to
    every persisted query, so Python-side garbage collection never
    releases them; only ``unpersist()`` (this scope) or
    ``spark.catalog.clearCache()`` does.  Yields the collector list so
    callers can inspect what was pinned."""
    stack = _scope_stack()
    scope: list[DataFrame] = []
    stack.append(scope)
    try:
        yield scope
    finally:
        stack.pop()
        for df in scope:
            df.unpersist()


def shuffle_partitions(spark, override=None, default: int = 200) -> int:
    """``spark.sql.shuffle.partitions`` as an int, tolerating the
    non-numeric values the setting legitimately takes (``'auto'``
    under some AQE configurations) — ``int('auto')`` crashed
    zorder_layout/global_ranks/asof on exactly the clusters most
    likely to run them (r12, ADVICE).  ``override`` wins when given;
    a non-numeric conf falls back to ``default`` (Spark's own
    default partition count)."""
    if override is not None:
        return int(override)
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return default


def _sort_exprs(order_cols: list[str], ascending) -> list:
    """Per-column sort expressions with Spark's window defaults:
    asc → nulls FIRST, desc → nulls LAST — exactly what
    ``ORDER BY c [DESC]`` means inside a window function, so the rank
    parity contract extends to mixed directions unchanged.  (A DuckDB
    oracle agrees by default only on DESC; ASC needs an explicit
    NULLS FIRST.)"""
    if isinstance(ascending, bool):
        ascending = [ascending] * len(order_cols)
    if len(ascending) != len(order_cols):
        raise ValueError(
            f"ascending has {len(ascending)} entries for "
            f"{len(order_cols)} order columns")
    return [F.col(c).asc() if a else F.col(c).desc()
            for c, a in zip(order_cols, ascending)]


def global_ranks(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    buckets: int | None = None,
    ntile_col: str = "ntile",
    percent: bool = False,
    range_partitions: int | None = None,
    ties: str = "row",
    ascending: "bool | list[bool]" = True,
    dense_col: str | None = None,
) -> DataFrame:
    """Add ``rank_col`` (1-based global rank in ``order_cols`` order —
    ascending by default; ``ascending`` takes a bool or one bool per
    column for ``ORDER BY a DESC, b ASC`` shapes); with ``buckets``
    also ``ntile_col``; with ``percent`` also ``percent_rank`` and
    ``cume_dist``.  All bit-identical to the corresponding
    unpartitioned window functions over the same order.

    ``ties`` selects the SQL semantics:

    * ``'row'`` (default) — ``row_number()``: ``order_cols`` MUST be a
      total order (append a unique id); supports ``buckets`` (ntile is
      row_number-based in SQL) and ``percent``.
    * ``'rank'`` — SQL ``rank()``: tied rows share the tie group's
      minimum row_number (gaps follow).  Duplicate order values are
      fine; ``buckets`` is rejected (ntile needs a total order).
    * ``'dense'`` — SQL ``dense_rank()``: tied rows share the 1-based
      index of their DISTINCT order value (no gaps).

    ``dense_col`` (tie paths only): the machinery computes rank AND
    dense_rank in the same pass — naming ``dense_col`` emits the
    dense_rank next to ``rank_col`` instead of discarding it, so a
    caller needing both pays ONE distinct-key aggregation, one
    persisted range exchange, and one fan-back join rather than
    running the whole pipeline twice.

    The tie-aware path is the same no-single-task machinery run over
    the DISTINCT order keys (with their row counts as weights): rank =
    1 + running row-weight of preceding keys, dense_rank = the key's
    global row_number — then a null-safe equi-join fans the per-key
    numbers back to the rows (hash shuffle on the order columns; keys
    ≤ rows by construction).  ``percent`` under ties uses the
    tie-correct forms: percent_rank = (rank−1)/(N−1), cume_dist =
    (rank−1+tie_count)/N — exactly Spark's window definitions."""
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    if ties not in ("row", "rank", "dense"):
        raise ValueError(f"ties must be 'row' | 'rank' | 'dense': {ties!r}")
    if buckets is not None and buckets < 1:
        # (r12 review) Spark's own ntile(0) is rejected at analysis
        # time; letting 0 through here reached `_n div 0` — all-NULL
        # tiles under non-ANSI, DIVIDE_BY_ZERO mid-job under ANSI
        raise ValueError(f"buckets must be >= 1: {buckets!r}")
    reserved = {"_pid", "_off", "_n", "_q", "_r", "_c", "_kc", "_wc"}
    clash = reserved & set(df.columns)
    if clash:
        # (r12 review) a same-named user column either made the
        # fan-back join ambiguous (AMBIGUOUS_REFERENCE on _n in the
        # percent path) or was silently DROPPED by the working-column
        # cleanup
        raise ValueError(
            f"input columns {sorted(clash)} collide with global_ranks' "
            "working columns — rename them first")
    spark = df.sparkSession
    P = shuffle_partitions(spark, range_partitions)
    if ties != "row":
        if buckets is not None:
            raise ValueError(
                "ntile buckets require ties='row' (SQL ntile is "
                "row_number-based; under a non-total order it is "
                "partition-order-dependent)")
        return _global_tie_ranks(df, order_cols, rank_col, percent, P,
                                 ties, ascending, dense_col)
    if dense_col is not None:
        raise ValueError(
            "dense_col requires ties='rank' or 'dense' (under a "
            "total order dense_rank == rank == row_number)")
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
    # corpora).  Lifecycle: no unpersist here (consumers are lazy),
    # and the SQL CacheManager holds every persisted query by STRONG
    # reference — garbage-collecting the Python DataFrame does NOT
    # release it (ContextCleaner weak-ref-cleans raw RDDs/shuffles/
    # broadcasts, never cacheQuery entries).  Each call therefore pins
    # one cache for the session: pipelines that rank many tables MUST
    # wrap their consume in rank_cache_scope() for deterministic
    # release, or fall back to spark.catalog.clearCache().
    from pyspark import StorageLevel

    order = _sort_exprs(order_cols, ascending)
    rp = _register_cache(
        df.repartitionByRange(P, *order)
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
    rn_w = Window.partitionBy("_pid").orderBy(*order)
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
            # common-subexpression elimination can evaluate it anyway.
            # rank_col is backquoted: the percent path resolves it via
            # F.col, and an unquotable name must not parse differently
            # here (r12 review)
            .withColumn(ntile_col, F.expr(
                f"CASE WHEN `{rank_col}` <= _r * (_q + 1)"
                f"     THEN (`{rank_col}` - 1) div (_q + 1) + 1"
                f"     ELSE _r + (`{rank_col}` - _r * (_q + 1) - 1)"
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


def _global_tie_ranks(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str,
    percent: bool,
    P: int,
    ties: str,
    ascending,
    dense_col: str | None = None,
) -> DataFrame:
    """rank()/dense_rank() without the single-task window: run the
    range-partition machinery over the DISTINCT order keys weighted by
    their row counts, then fan the per-key numbers back to the rows.
    The distinct keys ARE a total order on themselves, so row_number
    within the key table is deterministic by construction."""
    from pyspark import StorageLevel

    order = _sort_exprs(order_cols, ascending)
    keys = df.groupBy(*order_cols).agg(F.count(F.lit(1)).alias("_c"))
    # load-bearing persist, same contract as the row path: bucket
    # counts and ranked keys both read spark_partition_id() of this one
    # materialization.  Cache size = distinct keys (≤ input rows).
    rp = _register_cache(
        keys.repartitionByRange(P, *order)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK))
    cnt = rp.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_kc"),      # keys in bucket
        F.sum("_c").alias("_wc"),            # rows in bucket
    )
    off_w = (Window.partitionBy(F.lit(0)).orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    meta = cnt.select(
        "_pid",
        (F.sum("_kc").over(off_w) - F.col("_kc")).alias("_koff"),
        (F.sum("_wc").over(off_w) - F.col("_wc")).alias("_woff"),
        F.sum("_wc").over(Window.partitionBy(F.lit(0))).alias("_n"),
    )
    in_w = Window.partitionBy("_pid").orderBy(*order)
    cum_w = in_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = (
        rp.join(F.broadcast(meta), "_pid")
        .withColumn("_dense", F.col("_koff") + F.row_number().over(in_w))
        .withColumn("_rk", F.col("_woff")
                    + F.sum("_c").over(cum_w) - F.col("_c") + F.lit(1))
    )
    val = F.col("_rk") if ties == "rank" else F.col("_dense")
    out_cols = [val.alias(rank_col)]
    if dense_col is not None:
        if dense_col == rank_col:
            raise ValueError("dense_col must differ from rank_col")
        out_cols.append(F.col("_dense").alias(dense_col))
    if percent:
        out_cols += [
            F.when(F.col("_n") > 1, (F.col("_rk") - 1) / (F.col("_n") - 1))
            .otherwise(F.lit(0.0)).alias("percent_rank"),
            ((F.col("_rk") - 1 + F.col("_c")) / F.col("_n"))
            .alias("cume_dist"),
        ]
    keymap = ranked.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(order_cols)],
        *out_cols,
    )
    cond = None
    for i, c in enumerate(order_cols):
        clause = df[c].eqNullSafe(F.col(f"_k{i}"))
        cond = clause if cond is None else cond & clause
    return df.join(keymap, cond).drop(
        *[f"_k{i}" for i in range(len(order_cols))])
