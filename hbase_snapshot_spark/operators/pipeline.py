"""End-to-end corpus preprocessing: the standard pretraining-data
sequence composed from the individual operators into ONE declarative
DataFrame graph, so Catalyst sees — and optimizes — the whole pipeline
at once instead of materialized stage boundaries.

Shuffle inventory at scale (the 100 TB budget of the default graph):

1. exact dedup — one hash Exchange on the fingerprint;
2. sequence packing — one hash Exchange on the group key (language).

Everything else — HTML stripping, language ID, quality scoring, token
stats, chunking — is a narrow projection or per-row generator fused
into the scans around those two shuffles.  Near-dup (MinHash) and
decontamination stages are deliberately NOT defaults: they carry their
own shuffle/join budgets and live in ``dedup.py`` for explicit
composition when the corpus calls for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_snapshot_spark.operators.dedup import exact_dedup, line_dedup
from hbase_snapshot_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
)
from hbase_snapshot_spark.operators.text import (
    extract_main_content,
    fingerprint,
    lang_id,
    quality_score,
    strip_html,
)


def preprocess_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    html: "bool | str" = False,
    line_dedup_mode: str | None = None,
    line_min_count: int = 2,
    min_quality: float = 0.25,
    keep_langs: list[str] | None = None,
    chunk_tokens: int = 512,
    overlap_tokens: int = 64,
    pack_cap: int = 4096,
) -> DataFrame:
    """raw documents → packed training chunks, one logical plan:

    1. (optional) HTML → plain text: ``html=True`` keeps everything
       (``strip_html``); ``html='justext'`` runs block-level
       main-content extraction instead (``extract_main_content`` —
       nav/footer/banner boilerplate never reaches the gates; blocks
       arrive newline-joined, so a line-level pass composes).  Both
       are pure projections;
    1b. (optional, ``line_dedup_mode``) CCNet line-level boilerplate
        removal BEFORE the content gates, so nav menus and cookie
        banners don't pollute lang-ID/quality.  'boilerplate' costs one
        line-hash aggregation for the (usually tiny) frequent set plus
        an AQE-decided anti-join (line_dedup deliberately does NOT
        force broadcast: at min_count=2 the frequent set can be
        corpus-sized and forcing broadcast would OOM the driver);
        'first' costs a hash-window shuffle + reassembly (full CCNet
        semantics, use when exact keep-first matters);
    2. language ID + quality score (pure projections);
    3. quality / language gate (plain filters — they reach the scan);
    4. exact dedup on the normalized-text fingerprint (shuffle #1);
    5. fixed-token chunking with overlap (per-row generator);
    6. token-budget packing per (language, doc-hash bucket) — language-pure
       packs, parallel windows (shuffle #2).

    Returns one row per CHUNK with ``doc_id, lang, quality, chunk_idx,
    chunk_text, n_chunk_tokens, bin, bin_offset`` — the shape a
    training-shard writer consumes (partitionBy bin / shard_shuffle
    downstream as needed).
    """
    out = docs
    col = text_col
    if html == "justext":
        out = extract_main_content(out, text_col, out_col="_plain")
        col = "_plain"
    elif html:
        # preserve block-boundary newlines when a line-level pass
        # follows — the default whitespace collapse would fold every
        # document into one line and line_dedup would silently become
        # whole-document dedup
        out = strip_html(out, text_col, out_col="_plain",
                         preserve_newlines=line_dedup_mode is not None)
        col = "_plain"
    if line_dedup_mode is not None:
        out = line_dedup(out, col, id_col=id_col, mode=line_dedup_mode,
                         min_count=line_min_count)
        col = f"clean_{col}"
    out = out.withColumn("lang", lang_id(col))
    out = quality_score(out, col)
    out = out.filter(F.col("quality") >= min_quality)
    if keep_langs is not None:
        out = out.filter(F.col("lang").isin(keep_langs))
    out = fingerprint(out, col)
    out = exact_dedup(out, F.col("fingerprint"), id_col=id_col)
    out = chunk_documents(out, col, chunk_tokens=chunk_tokens,
                          overlap_tokens=overlap_tokens)
    # per-language packs WITHOUT a per-language single-task window:
    # by="lang" alone routed every chunk of the dominant language (half
    # of a web corpus) through ONE cumulative-sum task — the exact
    # straggler pack_sequences' AUTO_GROUP exists to avoid.  Hashing
    # the document id into buckets WITHIN each language keeps packs
    # language-pure ((lang, pack_group, bin) identifies a pack, chunks
    # of one document stay contiguous) while the window parallelizes
    # by lang × bucket.
    from hbase_snapshot_spark.operators.packing import DEFAULT_AUTO_GROUPS

    out = out.withColumn(
        "pack_group",
        F.pmod(F.xxhash64(F.col(id_col)),
               F.lit(DEFAULT_AUTO_GROUPS)).cast("int"))
    out = pack_sequences(out, "n_chunk_tokens", cap=pack_cap,
                         order_col=[id_col, "chunk_idx"],
                         by=["lang", "pack_group"])
    keep = [id_col, "lang", "quality", "chunk_idx", "chunk_text",
            "n_chunk_tokens", "pack_group", "bin", "bin_offset"]
    return out.select(*keep)
