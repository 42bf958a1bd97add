"""As-of (point-in-time) join — the scalable generalization of the
reference's one as-of operator, ``getRowOrBefore``
(HTable.getRowOrBefore:472, Store.getRowKeyAtOrBefore:980): for every
left row, the newest right row with ``right.ts <= left.ts`` within the
same key group.

Spark lacks a native as-of join; the naive formulation (range-condition
join) degenerates to a per-key sort-merge with duplicate explosion.
This implementation uses the union + last_value window trick:
tag and union both sides, sort within key by (ts, side), and carry the
most recent right-side ROW forward with ``last(struct, ignorenulls)`` —
ONE shuffle on the key, no range join, no explosion; skew only if a
single key dominates (then salt the key upstream).

The carried payload is a single struct, not per-column fills: carrying
columns independently would stitch values from DIFFERENT right rows
together whenever a newer right row has a NULL in one column (the older
row's value would leak through ignorenulls).  Ties among right rows at
the same (key, ts) break deterministically toward the greatest carried
struct, so repeated runs (and the DuckDB ASOF oracle) agree."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    allow_unpartitioned: bool = False,
) -> DataFrame:
    """left rows + the newest right row at-or-before each left row.

    ``on``: ordering column (same name both sides); ``by``: equality
    key columns; ``right_cols``: right columns to carry (default: all
    non-key, non-ts).  Right ``on`` value is carried as ``{on}{suffix}``
    (NULL when no right row precedes the left row).

    NULL ``on`` semantics (r12 review): a right row with NULL ts can
    never satisfy ``right.ts <= left.ts`` (SQL three-valued logic; the
    DuckDB ASOF oracle agrees), so such rows are EXCLUDED — previously
    NULLS-FIRST ordering sorted them before every row and
    last(ignorenulls) carried their payload into every left row with no
    genuine predecessor.  A LEFT row with NULL ts matches nothing
    (all-NULL carry), for the same reason.

    ``by=[]`` degenerates to ONE unpartitioned window task over
    left ∪ right — the single-task funnel this codebase's scale
    posture forbids.  Deliberate small-data use requires
    ``allow_unpartitioned=True``; otherwise raise."""
    by = by or []
    if not by and not allow_unpartitioned:
        raise ValueError(
            "asof_join without `by` sorts the ENTIRE left ∪ right "
            "through one unpartitioned window task — pass the equality "
            "key columns, or allow_unpartitioned=True if both sides "
            "are genuinely driver-small")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(by) | {on}]
    reserved = {"_side", "_r"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with asof_join's "
            "working columns — rename them first")

    lhs = left.withColumn("_side", F.lit(1)).withColumn("_r", F.lit(None).cast(
        "struct<" + ",".join(
            [f"`{on}`:" + dict(right.dtypes)[on]]
            + [f"`{c}`:" + dict(right.dtypes)[c] for c in right_cols]
        ) + ">"
    ))
    rhs = right.filter(F.col(on).isNotNull()).select(
        *by,
        F.col(on),
        F.struct(F.col(on), *[F.col(c) for c in right_cols]).alias("_r"),
    ).withColumn("_side", F.lit(0))
    rhs = rhs.select(*[
        F.col(c) if c in rhs.columns else F.lit(None).alias(c)
        for c in lhs.columns
    ])

    unioned = lhs.unionByName(rhs)
    # right rows sort before left rows at equal ts (_side asc) so a right
    # row AT the left row's ts is visible to it — "at or before".  The
    # trailing _r ordering makes same-(key, ts) right-row ties
    # deterministic: the greatest struct is the one last() carries.
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc(), F.col("_r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    # ONE select, not per-column withColumn chains: O(columns) nested
    # Projects give quadratic driver-side analysis on wide tables
    r = F.col("_r")
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in left.columns],
        r.getField(on).alias(f"{on}{suffix}"),
        *[r.getField(c).alias(f"{c}{suffix}") for c in right_cols],
    )


def funnel_depth(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis (r8): for each user, how far through the
    ``steps`` sequence they progressed, taking each step at its EARLIEST
    valid time (strictly after the previous step — the greedy assignment,
    which is optimal by the exchange argument, so it equals the
    chained-min SQL formulation the oracle states).

    Returns (user_col, depth, first_ts, last_ts): depth = completed
    steps, first/last = the entry/deepest-step timestamps (null when
    depth is 0).  Population contract: the output covers users with at
    least one FUNNEL-TYPE event (the scan filter) — a user whose
    events are all non-funnel types is absent, while one with
    funnel-type events that never advance appears with depth 0.  The
    oracle states the same population (fu = users with funnel-type
    events); conversion denominators over "all users" must come from
    the events table, not from this result's row count.

    Plan shape: ONE shuffle — filter to funnel event types at the scan,
    groupBy user with a sorted collect_list, then a pure-Catalyst
    ``aggregate`` fold over the per-user sequence (bounded by a user's
    own funnel-event count; no window cascade, no per-step self-join —
    a k-step funnel as k chained joins would be k shuffles and k scans).
    """
    sl = list(steps)
    evs = events.filter(F.col(type_col).isin(sl)).select(
        F.col(user_col),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_et"),
    )
    per_user = evs.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_ts"), F.col("_et")))
        ).alias("_seq")
    )
    step_arr = F.array(*[F.lit(s) for s in sl])
    acc0 = F.struct(
        F.lit(0).alias("depth"),
        F.lit(None).cast(dict(evs.dtypes)["_ts"]).alias("first_ts"),
        F.lit(None).cast(dict(evs.dtypes)["_ts"]).alias("last_ts"),
    )

    def fold(acc, e):
        advance = (
            (acc.depth < F.lit(len(sl)))
            & (e._et == F.element_at(step_arr, acc.depth + 1))
            & (acc.last_ts.isNull() | (e._ts > acc.last_ts))
        )
        return F.when(
            advance,
            F.struct(
                (acc.depth + 1).alias("depth"),
                F.coalesce(acc.first_ts, e._ts).alias("first_ts"),
                e._ts.alias("last_ts"),
            ),
        ).otherwise(acc)

    return per_user.select(
        F.col(user_col),
        F.aggregate(F.col("_seq"), acc0, fold).alias("_f"),
    ).select(
        user_col,
        F.col("_f.depth").alias("depth"),
        F.col("_f.first_ts").alias("first_ts"),
        F.col("_f.last_ts").alias("last_ts"),
    )


#: one week of epoch nanoseconds — the default cohort period
WEEK_NS = 7 * 24 * 3600 * 1_000_000_000


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_ns: int = WEEK_NS,
) -> DataFrame:
    """Cohort retention matrix over an event stream — the standard
    product-analytics rollup next to sessions and funnels: users are
    cohorted by their FIRST active period (integer division of the
    epoch-nanos timestamp, exact — float division could flip a
    boundary event between engines), and each (cohort, offset) cell
    counts the cohort's users active ``offset`` periods later.
    Returns (cohort, offset, n_users, cohort_size, retention) with
    retention = round(n_users / cohort_size, 6); offset 0 is the
    cohort size by construction.

    100 TB shape: the input collapses to DISTINCT (user, period) pairs
    first (one shuffle with map-side partial aggregation — the pair
    count is users × active-periods, tiny next to raw events); the
    cohort min is a second user-keyed aggregation; the final matrix
    aggregation carries matrix-sized rows.  Nothing joins or shuffles
    raw events twice, and the retention window is per-cohort over the
    already-matrix-sized result.

    Perioding TRUNCATES toward zero (Spark ``div`` == DuckDB ``//`` —
    the engines agree by construction), so pre-1970 timestamps share
    the double-width period 0 with early post-epoch ones; floor-divide
    upstream if your event time predates the epoch."""
    period = F.expr(f"CAST({ts_col} div {period_ns} AS BIGINT)")
    up = (df.select(F.col(user_col).alias("_u"), period.alias("period"))
          .distinct())
    cohorts = up.groupBy("_u").agg(F.min("period").alias("cohort"))
    ret = (
        up.join(cohorts, "_u")
        .groupBy("cohort",
                 (F.col("period") - F.col("cohort")).alias("offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    w = Window.partitionBy("cohort")
    size = F.max(F.when(F.col("offset") == 0, F.col("n_users"))).over(w)
    return (
        ret.withColumn("cohort_size", size)
        .withColumn("retention",
                    F.round(F.col("n_users") / F.col("cohort_size"), 6))
    )


def rfm_scores(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    buckets: int = 5,
    range_partitions: int | None = None,
) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quantile
    scores, 1..buckets with ``buckets`` best) — the classic
    product-analytics user scoring next to cohorts and funnels.
    Returns (user, last_ts, frequency, monetary, r_score, f_score,
    m_score), bit-identical to ``ntile(buckets) OVER (ORDER BY metric
    ASC, user ASC)`` per metric.

    Scale shape (no single-task window anywhere): a quantile rank is a
    pure function of a row's GLOBAL RANK in the (metric, user) total
    order, and a global rank does not need a global window — it is
    range partitioning plus per-partition row_number plus the running
    count of the preceding partitions:

    1. one per-user aggregation (map-side combine; users ≪ events);
       monetary sums through DECIMAL(18,4) so float addition order
       can't leak into the scores;
    2. melt the three metrics to (metric, value, user) rows on a
       common EXACT type (decimal(38,4) — bigint ts/frequency and the
       decimal sum embed losslessly, so the sort order is exactly the
       oracle's; a double would collapse >2^53 distinctions);
    3. ``repartitionByRange(P, metric, value, user)`` — ascending
       range buckets aligned with the ntile order, every bucket
       ~3·users/P rows (the user tie-break keeps keys unique, so even
       a constant metric splits across buckets); the result is
       PERSISTED (load-bearing, exactly like global_ranks — see
       ranks.py): both consumers key off spark_partition_id() of this
       exchange and must observe ONE materialization.  ReuseExchange
       used to carry that guarantee, but it is an optimization, not a
       contract — canonical-equality is broken by external column
       pruning or disabling spark.sql.exchange.reuse, after which the
       exchange runs twice with independent range sampling and scores
       go silently wrong;
    4. per-(metric, bucket) counts → running offsets over the
       metadata-sized summary (P×3 rows), then broadcast-joined back:
       global_rank = offset + row_number over (metric, bucket).  No
       driver collect, nothing data-sized passes through one task;
    5. the ntile value from (rank, N) in closed form with exact
       bigint arithmetic: the first N%b buckets take ceil(N/b) rows,
       the rest floor(N/b) — the standard SQL ntile contract both
       Spark and DuckDB implement.
    """
    from pyspark import StorageLevel

    from hbase_snapshot_spark.operators.ranks import (
        _register_cache, shuffle_partitions)

    spark = df.sparkSession
    P = shuffle_partitions(spark, range_partitions)
    # persisted so the melt branch and the final payload join share ONE
    # events scan + user aggregation by cache substitution (a contract)
    # instead of by exchange-subtree canonical equality (an optimizer
    # heuristic).  User-table sized — 4 narrow columns per user.
    per_user = _register_cache(
        df.groupBy(F.col(user_col).alias("user")).agg(
            F.max(ts_col).alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col(value_col).cast("decimal(18,4)")).alias("monetary"),
        ).persist(StorageLevel.MEMORY_AND_DISK))
    metrics = [("last_ts", "r_score"), ("frequency", "f_score"),
               ("monetary", "m_score")]

    def sort_key(name):
        # exact, order-preserving embedding into the melt's common
        # decimal(38,4): datetimes go through integer epoch micros /
        # days (timestampdiff is pure local-datetime arithmetic, so
        # TIMESTAMP_NTZ never takes a DST-ambiguous tz round-trip)
        dt = dict(per_user.dtypes)[name]
        if dt == "timestamp_ntz":
            e = F.expr(f"timestampdiff(MICROSECOND, "
                       f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{name}`)")
        elif dt == "timestamp":
            e = F.expr(f"unix_micros(`{name}`)")
        elif dt == "date":
            e = F.expr(f"datediff(`{name}`, DATE'1970-01-01')")
        else:
            e = F.col(name)
        return e.cast("decimal(38,4)")

    # melt carries ONLY (user, _m, _v) — no payload columns; the
    # payload (last_ts/frequency/monetary) joins back from the cached
    # per_user at the end.
    melted = per_user.select(
        "user",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("_m"), sort_key(m).alias("_v"))
            for i, (m, _) in enumerate(metrics)
        ])).alias("_e"),
    ).select("user", F.col("_e._m").alias("_m"), F.col("_e._v").alias("_v"))
    # explicit partition count: AQE never coalesces a user-specified
    # repartitionByRange, so bucket ids are stable across the two
    # consumers of the exchange.  PERSIST is load-bearing (ranks.py
    # documents the failure mode): bucket counts and ranked rows both
    # key off spark_partition_id() of this exchange and must observe
    # one materialization — by cache, not by ReuseExchange.
    rp = _register_cache(
        melted.repartitionByRange(P, "_m", "_v", "user")
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK))
    cnt = rp.groupBy("_m", "_pid").agg(F.count(F.lit(1)).alias("_c"))
    off_w = (Window.partitionBy("_m").orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    meta = cnt.select(
        "_m", "_pid",
        (F.sum("_c").over(off_w) - F.col("_c")).alias("_off"),
        F.sum("_c").over(Window.partitionBy("_m")).alias("_N"),
    )
    rn_w = (Window.partitionBy("_m", "_pid")
            .orderBy(F.col("_v").asc(), F.col("user").asc()))
    ranked = (
        rp.join(F.broadcast(meta), ["_m", "_pid"])
        .withColumn("_rn", F.col("_off") + F.row_number().over(rn_w))
        .withColumn("_q", F.expr(f"_N div {buckets}"))
        .withColumn("_r", F.expr(f"_N % {buckets}"))
        # greatest(_q, 1L): the divisor branch is unreachable when
        # _q = 0 (rank ≤ N = cut), but ANSI mode + common-subexpression
        # elimination can still evaluate the dead division
        .withColumn("_tile", F.expr(
            "CASE WHEN _rn <= _r * (_q + 1)"
            "     THEN (_rn - 1) div (_q + 1) + 1"
            "     ELSE _r + (_rn - _r * (_q + 1) - 1)"
            "              div greatest(_q, 1L) + 1 END"))
    )
    scores = ranked.groupBy(F.col("user").alias("_user")).agg(*[
        F.max(F.when(F.col("_m") == i, F.col("_tile")))
        .cast("int").alias(score)
        for i, (_, score) in enumerate(metrics)
    ])
    # null-safe equality: a NULL user group must keep its scores (plain
    # inner join would drop it), and eqNullSafe pushes no isnotnull
    # filter into the per_user side, so the cached per_user serves this
    # join unfiltered.
    return per_user.join(
        scores, F.col("user").eqNullSafe(F.col("_user"))
    ).select(
        "user", "last_ts", "frequency",
        F.col("monetary").cast("double").alias("monetary"),
        *[score for _, score in metrics],
    )


def window_zscores(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: "list[str] | None" = None,
    window_ns: int = 3600 * 1_000_000_000,
) -> DataFrame:
    """Per-key window-count z-scores — the spike/anomaly signal over an
    event stream (which hours are unusually hot for each event type).
    Buckets by exact integer division of the epoch-nanos timestamp,
    counts per (key, window), then scores each window against its
    key's mean/stddev: z = (n − μ) / σ (sample σ; null when the key
    has <2 windows or zero variance).

    Cross-engine determinism is by construction: every aggregate the
    statistics need (Σn, Σn², window count) is an exact integer — the
    only floating-point ops are the final closed-form divisions, which
    are identical IEEE operations on identical longs in any engine.

    Returns (key…, window_start_s, n, z).  One count shuffle off raw
    events; statistics are a per-key window over the already
    window-sized counts.  Windowing truncates toward zero (Spark
    ``div`` == DuckDB ``//``); see cohort_retention's pre-1970 note."""
    keys = key_cols or ["event_type"]
    w = F.expr(f"CAST({ts_col} div {window_ns} AS BIGINT)")
    per = (df.groupBy(*keys, w.alias("_w"))
           .agg(F.count(F.lit(1)).alias("n")))
    kw = Window.partitionBy(*keys)
    k = F.count(F.lit(1)).over(kw)
    # Exact-integer statistics without the BIGINT cliffs: n² and the
    # Σn / Σn² accumulations run in DECIMAL(38,0) (exact to 1e38 —
    # n < 9.2e18 keeps every n² under 8.5e37; the old long forms
    # errored under ANSI / silently corrupted z past ~3e9 events per
    # key for s1², and past ~3e9 per WINDOW for Σn²).  The casts to
    # DOUBLE happen only at the closed-form float math, mirroring the
    # oracle exactly: DuckDB accumulates in HUGEINT and double-izes at
    # its own division, and (double) of the same exact integer — plus
    # s1d·s1d == (double)(s1²) for s1 ≤ 2^53 — gives identical IEEE
    # results on both engines.
    nd = F.col("n").cast("decimal(38,0)")
    s1 = F.sum(nd).over(kw).cast("double")
    s2 = F.sum(nd * nd).over(kw).cast("double")
    mean = s1 / k
    var = F.when(k > 1, (s2 - s1 * s1 / k) / (k - 1))
    z = F.when(var > 0, (F.col("n") - mean) / F.sqrt(var))
    return per.select(
        *keys,
        # start in NANOS first, divide once: _w * (window_ns div 1e9)
        # collapses every sub-second window's start to 0 (and skews any
        # window_ns that isn't a whole second)
        F.expr(f"(_w * {window_ns}) div 1000000000")
        .alias("window_start_s"),
        "n",
        F.round(z, 4).alias("z"),
    )
