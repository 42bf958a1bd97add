"""As-of (point-in-time) join — the scalable generalization of the
reference's one as-of operator, ``getRowOrBefore``
(HTable.getRowOrBefore:472, Store.getRowKeyAtOrBefore:980): for every
left row, the newest right row with ``right.ts <= left.ts`` within the
same key group.

Spark lacks a native as-of join; the naive formulation (range-condition
join) degenerates to a per-key sort-merge with duplicate explosion.
This implementation uses the union + last_value window trick:
tag and union both sides, sort within key by (ts, side), and carry the
most recent right-side values forward with ``last(..., ignorenulls)`` —
ONE shuffle on the key, no range join, no explosion; skew only if a
single key dominates (then salt the key upstream)."""

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

    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.select(
        *by, on, *[F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    ).withColumn("_side", F.lit(0))

    carried = [f"{c}{suffix}" for c in right_cols] + [f"{on}{suffix}"]
    rhs = rhs.withColumn(f"{on}{suffix}", F.col(on))
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    for c in carried:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None))

    unioned = lhs.unionByName(rhs.select(lhs.columns))
    # right rows sort before left rows at equal ts (_side asc) so a right
    # row AT the left row's ts is visible to it — "at or before"
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for c in carried:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled.filter(F.col("_side") == 1).drop("_side")
