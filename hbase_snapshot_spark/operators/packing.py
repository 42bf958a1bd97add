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

from hbase_snapshot_spark.functions import WS_RE, memo_exprs


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap_tokens: int = 64,
    ws: str = WS_RE,
) -> DataFrame:
    """Split each document into fixed-token windows with overlap — the
    context-length preparation step that precedes sequence packing in
    a training pipeline.  Adds ``chunk_idx`` (0-based), ``chunk_text``
    (the window, space-joined), and ``n_chunk_tokens``.

    Pure Catalyst — split → sequence/explode → slice → array_join, no
    UDFs and NO shuffle (a per-row generator, so it scales with the
    scan).  Window i covers tokens [i*stride, i*stride + chunk_tokens)
    with stride = chunk_tokens - overlap_tokens; every token is in at
    least one window and the last window is the only short one.

    ``ws`` (r12 semantics change) is the SEPARATOR CLASS collapsed to
    single spaces before tokenizing — it must be a regex class of
    characters safe to replace with ' ' (the word_tokens contract),
    NOT a general split pattern as pre-r12; tokens can therefore never
    contain a literal space."""
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    # the generator expressions are memoized per (SparkContext, args) —
    # everything is keyed by plain names/ints, and pipelines rebuild
    # this op per stage (guide §7.3; ~0.2s of driver py4j construction)
    toks, idxs, chunk_text, n_chunk_tokens = memo_exprs(
        "chunk_documents", (text_col, chunk_tokens, overlap_tokens, ws),
        lambda: _chunk_exprs(text_col, chunk_tokens, overlap_tokens, ws))
    return (
        df.withColumn("_toks", toks)
        .withColumn("chunk_idx", F.explode(idxs))
        .withColumn("chunk_idx", F.col("chunk_idx").cast("long"))
        .withColumn("chunk_text", chunk_text)
        .withColumn("n_chunk_tokens", n_chunk_tokens)
        .drop("_toks")
    )


def _chunk_exprs(text_col: str, chunk_tokens: int, overlap_tokens: int,
                 ws: str) -> tuple:
    stride = chunk_tokens - overlap_tokens
    # NULL / empty / whitespace-only text → ZERO chunks, via the shared
    # word_tokens contract: collapse the ``ws`` class to single spaces,
    # trim, gate on NULL-or-empty, split on ' '.  The previous
    # F.trim(text)=='' gate failed BOTH its documented promises: plain
    # trim strips only spaces, so '\n'-only text passed the gate and
    # split('\n', r'\s+') grew empty tokens (phantom 2-token chunk);
    # and NULL text slid through when()'s NULL predicate into
    # split(NULL) = NULL toks, where greatest()/least() skip NULL
    # operands — n_chunks became 1, not NULL, yielding one phantom
    # chunk with chunk_text=NULL and n_chunk_tokens=chunk_tokens.
    norm = F.trim(F.regexp_replace(F.col(text_col), ws, " "))
    empty = F.col(text_col).isNull() | (norm == "")
    toks = F.when(empty, F.array().cast("array<string>")).otherwise(
        F.split(norm, " "))
    n_chunks = F.greatest(
        F.ceil((F.size(toks) - F.lit(overlap_tokens)) / F.lit(stride)),
        F.lit(1),
    ).cast("int")
    idxs = F.when(
        F.size(toks) == 0, F.array().cast("array<int>")
    ).otherwise(F.sequence(F.lit(0), n_chunks - 1))
    start = F.col("chunk_idx") * stride  # 0-based token offset
    chunk_text = F.array_join(
        F.slice("_toks", start + 1, chunk_tokens), " ")
    n_chunk_tokens = F.least(
        F.lit(chunk_tokens), F.size("_toks") - start).cast("long")
    return toks, idxs, chunk_text, n_chunk_tokens


#: sentence boundary: terminal punctuation (optionally closing quotes/
#: brackets) followed by whitespace and an upper-case/digit opener.
#: Java lookarounds — this op is Spark-side only (RE2/DuckDB have no
#: lookaround, so there is no verbatim oracle; the differential test
#: against a pure-Python reference is the correctness pin).
#: two FIXED-width lookbehinds (bare terminal; terminal+closer) — a
#: variable-width one would be Java-only and break the Python
#: differential reference
SENTENCE_SPLIT_RE = (
    r"(?:(?<=[.!?])|(?<=[.!?][\"')\]]))\s+(?=[\"'(\[]?[A-Z0-9])"
)


def chunk_documents_sentences(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 512,
    ws: str = WS_RE,
) -> DataFrame:
    """Sentence-aware chunking: split each document into sentences
    (terminal-punctuation heuristic) and GREEDILY pack consecutive
    sentences into chunks of at most ``chunk_tokens`` whitespace
    tokens — the context-preparation step for embedding/retrieval
    corpora, where a window cut mid-sentence poisons the vector.  A
    single sentence longer than the budget becomes its own oversized
    chunk (kept whole — the fixed-window ``chunk_documents`` is the
    tool for pathological rows).  Adds the same ``chunk_idx`` /
    ``chunk_text`` / ``n_chunk_tokens`` columns, so packing/sharding
    compose unchanged.  ``ws`` is the separator CLASS collapsed to
    single spaces before sentence-splitting (see chunk_documents —
    same r12 semantics change), so token counts split on ' '.

    Pure Catalyst, NO shuffle: the greedy assignment is one
    ``aggregate`` fold over the per-sentence token counts (state =
    current chunk id + its running token count + the assignment list),
    then chunks materialize by index — O(chunks × sentences) cheap int
    work per row inside codegen."""
    # the shared WS_RE contract first (r12): F.trim strips only spaces,
    # so a '\n'-led document previously carried the newline INTO the
    # first sentence — its token count ran over split(r'\s+')'s empty
    # leading token (+1) and the newline survived into chunk_text.
    # After collapse-then-trim, sentences are space-separated words
    # with no edge whitespace of any kind.
    norm = F.trim(F.regexp_replace(F.col(text_col), ws, " "))
    sents = F.filter(
        F.split(norm, SENTENCE_SPLIT_RE),
        lambda s: F.trim(s) != "")
    counts = F.transform(
        sents, lambda s: F.size(F.split(F.trim(s), " ")))
    init = F.struct(
        F.lit(0).alias("cid"),
        F.lit(0).alias("tok"),
        F.array().cast("array<int>").alias("assign"),
    )

    def step(st, c):
        overflow = (st["tok"] + c > chunk_tokens) & (st["tok"] > 0)
        cid = F.when(overflow, st["cid"] + 1).otherwise(st["cid"])
        tok = F.when(overflow, c).otherwise(st["tok"] + c)
        return F.struct(
            cid.alias("cid"), tok.alias("tok"),
            F.concat(st["assign"], F.array(cid)).alias("assign"))

    assign = F.aggregate(counts, init, step)["assign"]

    def materialize(sn, asg):
        ids = F.sequence(F.lit(0), F.array_max(asg))
        pairs = F.zip_with(
            sn, asg, lambda s, a: F.struct(s.alias("s"), a.alias("a")))
        return F.transform(
            ids,
            lambda k: F.array_join(
                F.transform(
                    F.filter(pairs, lambda p: p["a"] == k),
                    lambda p: F.trim(p["s"])),
                " "))

    chunks = F.when(
        F.size(sents) > 0,
        F.transform(F.array(F.struct(
            sents.alias("sn"), assign.alias("asg"))),
            lambda b: materialize(b["sn"], b["asg"]))[0],
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.withColumn("_chunks", chunks)
        # plain posexplode: a NULL/sentence-less document yields ZERO
        # rows, consistent with chunk_documents — posexplode_outer kept
        # a (NULL chunk_idx, NULL text, NULL tokens) row that fed
        # pack_sequences a NULL token count
        .select("*", F.posexplode("_chunks")
                .alias("chunk_idx", "chunk_text"))
        .withColumn("chunk_idx", F.col("chunk_idx").cast("long"))
        .withColumn(
            "n_chunk_tokens",
            F.when(F.col("chunk_text").isNotNull(),
                   F.size(F.split(F.col("chunk_text"), " ")))
            .cast("long"))
        .drop("_chunks")
    )


#: pack_sequences/tokenize_and_pack default group key sentinel: hash
#: the first order column into ``auto_groups`` buckets so the safe
#: (distributed) path is the DEFAULT path.  The single-task global
#: sequence is opt-in via an explicit ``by=None``.
AUTO_GROUP = "__auto__"

#: default AUTO_GROUP bucket count — a CONSTANT, deliberately not
#: spark.sql.shuffle.partitions: bin assignment is part of the output
#: (pack_group, bin), and deriving it from cluster config made packing
#: non-reproducible across clusters (200 vs 2000 partitions → different
#: packs for identical input) and crashed outright on non-numeric
#: settings ('auto').  256 parallel groups is plenty of window
#: parallelism at any scale; override with ``auto_groups``.
DEFAULT_AUTO_GROUPS = 256


def pack_sequences(
    df: DataFrame,
    token_col,
    cap: int,
    order_col: str | list[str] = "doc_id",
    by: "str | list[str] | None" = AUTO_GROUP,
    auto_groups: int | None = None,
) -> DataFrame:
    """Add ``bin`` (0-based) and ``bin_offset`` (tokens before this doc
    within its group): bin = floor(cum_tokens_before / cap).

    One window shuffle on the group key; within a group the cumulative
    sum is a single pass in ``order_col`` order (a list means a
    composite order, e.g. ``["doc_id", "chunk_idx"]`` over chunked
    documents).

    The DEFAULT group key (``by=AUTO_GROUP``) is a hash of the first
    order column into ``auto_groups`` buckets (default:
    ``DEFAULT_AUTO_GROUPS`` — a constant, so identical input packs
    identically on any cluster), emitted as a ``pack_group`` column — (pack_group, bin) then identifies a pack.  All chunks of
    one document share a group (the hash is on the document-identity
    column), so per-document contiguity is preserved; the only cost is
    ≤ auto_groups partially-filled final bins, noise at corpus scale.

    ``by=None`` opts IN to ONE global sequence — every row funnels
    through a single task (Spark's no-partition window).  That is
    occasionally what you want for a small final corpus, never for a
    large one, hence the warning and the non-default."""
    order = [order_col] if isinstance(order_col, str) else list(order_col)
    if by is None:
        import warnings

        warnings.warn(
            "pack_sequences(by=None) runs the cumulative sum in a single "
            "task; pass a group key for large inputs",
            stacklevel=2,
        )
        keys: list[str] = []
    elif by == AUTO_GROUP:
        g = DEFAULT_AUTO_GROUPS if auto_groups is None else int(auto_groups)
        if g < 1:
            raise ValueError(f"auto_groups must be >= 1: {g}")
        df = df.withColumn(
            "pack_group",
            F.pmod(F.xxhash64(F.col(order[0])), F.lit(g)).cast("int"))
        keys = ["pack_group"]
    else:
        keys = [by] if isinstance(by, str) else list(by)
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn("bin_offset", cum_before).withColumn(
        "bin", F.floor(F.col("bin_offset") / F.lit(cap))
    )


def length_bucketed_batches(
    df: DataFrame,
    token_col: str,
    batch_size: int,
    by: str | None = None,
    order_col: str | list[str] = "doc_id",
    bounds: tuple[int, ...] = (16, 32, 48),
) -> DataFrame:
    """Padding-efficiency batching: group sequences of SIMILAR length
    into fixed-count batches, so padding each batch to its max wastes
    little (the sorted-batching trick every training loader uses —
    batching a 5-token and a 64-token sequence together pads 59).

    Adds ``len_bucket`` (how many ``bounds`` the length exceeds — a
    handful of comparisons, pure Catalyst) and ``batch`` (0-based batch
    index within (by, len_bucket), assigned by row_number in
    ``order_col`` order / ``batch_size``).  Deterministic on any
    cluster size ONLY when ``order_col`` is a TOTAL order within each
    (by, len_bucket) group: row_number breaks ties by partition-arrival
    order, so duplicate keys (e.g. bare doc_id over chunked rows) give
    run-dependent batch assignments — pass a composite order like
    ``["doc_id", "chunk_idx"]``, exactly as pack_sequences requires.

    One window shuffle keyed on (by, len_bucket); as with
    ``pack_sequences``, each group runs in a single task — pass a
    group key (language, shard) for large inputs.
    """
    if by is None:
        import warnings

        warnings.warn(
            "length_bucketed_batches(by=None) runs each length bucket "
            "in a single task; pass a group key for large inputs",
            stacklevel=2,
        )
    lb = None
    for b in bounds:
        t = (F.col(token_col) > F.lit(int(b))).cast("int")
        lb = t if lb is None else lb + t
    out = df.withColumn("len_bucket", lb.cast("bigint"))
    keys = [by] if by else []
    order = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(*keys, "len_bucket").orderBy(*order)
    rn = F.row_number().over(w)
    return out.withColumn(
        "batch",
        F.floor((rn - F.lit(1)) / F.lit(int(batch_size))).cast("bigint"),
    )


def padding_efficiency(
    df: DataFrame, token_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-batch padding diagnostics: n_seqs, token_sum, padded_tokens
    (= batch max × n_seqs — what the accelerator actually processes),
    and waste_ratio.  Aggregate further for a corpus-level number."""
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("n_seqs"),
        F.sum(token_col).alias("token_sum"),
        (F.max(token_col) * F.count("*")).alias("padded_tokens"),
    ).withColumn(
        "waste_ratio",
        (F.col("padded_tokens") - F.col("token_sum"))
        / F.col("padded_tokens"),
    )
