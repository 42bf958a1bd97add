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


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap_tokens: int = 64,
    ws: str = r"\s+",
) -> DataFrame:
    """Split each document into fixed-token windows with overlap — the
    context-length preparation step that precedes sequence packing in
    a training pipeline.  Adds ``chunk_idx`` (0-based), ``chunk_text``
    (the window, space-joined), and ``n_chunk_tokens``.

    Pure Catalyst — split → sequence/explode → slice → array_join, no
    UDFs and NO shuffle (a per-row generator, so it scales with the
    scan).  Window i covers tokens [i*stride, i*stride + chunk_tokens)
    with stride = chunk_tokens - overlap_tokens; every token is in at
    least one window and the last window is the only short one."""
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    toks = F.split(F.trim(F.col(text_col)), ws)
    n_chunks = F.greatest(
        F.ceil((F.size(toks) - F.lit(overlap_tokens)) / F.lit(stride)),
        F.lit(1),
    ).cast("int")
    start = F.col("chunk_idx") * stride  # 0-based token offset
    return (
        df.withColumn("_toks", toks)
        .withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn("chunk_idx", F.col("chunk_idx").cast("long"))
        .withColumn(
            "chunk_text",
            F.array_join(F.slice("_toks", start + 1, chunk_tokens), " "),
        )
        .withColumn(
            "n_chunk_tokens",
            F.least(F.lit(chunk_tokens), F.size("_toks") - start).cast("long"),
        )
        .drop("_toks")
    )


def pack_sequences(
    df: DataFrame,
    token_col,
    cap: int,
    order_col: str | list[str] = "doc_id",
    by: str | None = None,
) -> DataFrame:
    """Add ``bin`` (0-based) and ``bin_offset`` (tokens before this doc
    within its group): bin = floor(cum_tokens_before / cap).

    One window shuffle on the group key; within a group the cumulative
    sum is a single pass in ``order_col`` order (a list means a
    composite order, e.g. ``["doc_id", "chunk_idx"]`` over chunked
    documents).

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
    order = [order_col] if isinstance(order_col, str) else list(order_col)
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn("bin_offset", cum_before).withColumn(
        "bin", F.floor(F.col("bin_offset") / F.lit(cap))
    )
