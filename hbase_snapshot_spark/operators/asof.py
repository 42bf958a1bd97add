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
) -> DataFrame:
    """left rows + the newest right row at-or-before each left row.

    ``on``: ordering column (same name both sides); ``by``: equality
    key columns; ``right_cols``: right columns to carry (default: all
    non-key, non-ts).  Right ``on`` value is carried as ``{on}{suffix}``
    (NULL when no right row precedes the left row)."""
    by = by or []
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(by) | {on}]

    lhs = left.withColumn("_side", F.lit(1)).withColumn("_r", F.lit(None).cast(
        "struct<" + ",".join(
            [f"`{on}`:" + dict(right.dtypes)[on]]
            + [f"`{c}`:" + dict(right.dtypes)[c] for c in right_cols]
        ) + ">"
    ))
    rhs = right.select(
        *by,
        F.col(on),
        F.struct(F.col(on), *[F.col(c) for c in right_cols]).alias("_r"),
    ).withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))

    unioned = lhs.unionByName(rhs.select(lhs.columns))
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
    out = filled.filter(F.col("_side") == 1)
    out = out.withColumn(f"{on}{suffix}", F.col(f"_r.{on}"))
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_r.{c}"))
    return out.drop("_side", "_r")


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
    depth is 0).

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
    already-matrix-sized result."""
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
) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quantile
    scores, 1..buckets with ``buckets`` best) — the classic
    product-analytics user scoring next to cohorts and funnels.
    Returns (user, last_ts, frequency, monetary, r_score, f_score,
    m_score).

    Scale note: the per-user aggregation is one shuffle with map-side
    combine (users ≪ events); the quantile ranking is ntile over the
    USER table — inherently a global ordering, but of user-sized data,
    and fully deterministic via the (metric, user) tie-break so two
    engines agree exactly.  Monetary sums go through DECIMAL(18,4) so
    float addition order can't leak into the scores."""
    per_user = df.groupBy(F.col(user_col).alias("user")).agg(
        F.max(ts_col).alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(value_col).cast("decimal(18,4)")).alias("monetary"),
    )
    r_w = Window.orderBy(F.col("last_ts").asc(), F.col("user").asc())
    f_w = Window.orderBy(F.col("frequency").asc(), F.col("user").asc())
    m_w = Window.orderBy(F.col("monetary").asc(), F.col("user").asc())
    return per_user.select(
        "user", "last_ts", "frequency",
        F.col("monetary").cast("double").alias("monetary"),
        F.ntile(buckets).over(r_w).alias("r_score"),
        F.ntile(buckets).over(f_w).alias("f_score"),
        F.ntile(buckets).over(m_w).alias("m_score"),
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
    window-sized counts."""
    keys = key_cols or ["event_type"]
    w = F.expr(f"CAST({ts_col} div {window_ns} AS BIGINT)")
    per = (df.groupBy(*keys, w.alias("_w"))
           .agg(F.count(F.lit(1)).alias("n")))
    kw = Window.partitionBy(*keys)
    k = F.count(F.lit(1)).over(kw)
    s1 = F.sum("n").over(kw)
    s2 = F.sum(F.col("n") * F.col("n")).over(kw)
    mean = s1 / k
    var = F.when(k > 1, (s2 - s1 * s1 / k) / (k - 1))
    z = F.when(var > 0, (F.col("n") - mean) / F.sqrt(var))
    return per.select(
        *keys,
        (F.col("_w") * (window_ns // 1_000_000_000))
        .alias("window_start_s"),
        "n",
        F.round(z, 4).alias("z"),
    )
