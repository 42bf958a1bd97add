"""Sequence packing — assign documents to fixed-token-budget bins, the
batch-construction step of an LLM training pipeline (beyond-reference).

The strategy is deterministic offset packing: within each group
(e.g. language), documents are laid out in a stable order and a bin
boundary falls every ``cap`` tokens of the running total.  This is the
streaming-friendly packing a 100 TB pipeline actually uses — one
cumulative-sum window per group, no bin-state coordination across
executors, and adding documents never re-bins earlier ones.  (First-fit
bin packing would need sequential state; the offset variant is the
order-preserving approximation with identical packing efficiency for
documents much smaller than the cap.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col,
    cap: int,
    order_col: str = "doc_id",
    by: str | None = None,
) -> DataFrame:
    """Add ``bin`` (0-based) and ``bin_offset`` (tokens before this doc
    within its group): bin = floor(cum_tokens_before / cap).

    One window shuffle on the group key; within a group the cumulative
    sum is a single pass in ``order_col`` order.

    ``by=None`` computes ONE global sequence — every row funnels through
    a single task (Spark's no-partition window).  That is occasionally
    what you want for a small final corpus, never for a large one: at
    scale always pass a group key (language, shard, source).
    """
    if by is None:
        import warnings

        warnings.warn(
            "pack_sequences(by=None) runs the cumulative sum in a single "
            "task; pass a group key for large inputs",
            stacklevel=2,
        )
    keys = [by] if by else []
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn("bin_offset", cum_before).withColumn(
        "bin", F.floor(F.col("bin_offset") / F.lit(cap))
    )
