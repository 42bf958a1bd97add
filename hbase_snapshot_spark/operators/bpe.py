"""Byte-pair-encoding tokenizer — train on a corpus, encode at scale.

The public BPE algorithm (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"; the byte-level variant
popularized by GPT-2's public tokenizer): greedily merge the most
frequent adjacent symbol pair until the vocabulary budget is reached.

Scale shape (the part that must survive 100 TB):

* **Training** never iterates over the corpus.  The corpus collapses
  to a WORD-FREQUENCY table first — one `regexp_extract_all` +
  explode + groupBy (a single shuffle on the word hash) — and the
  merge loop runs driver-side over that table.  The unique-word count
  is a vocabulary-sized object (heaps-law sublinear in corpus size;
  `max_words` caps it explicitly and `log`s the drop), which is how
  the reference BPE/SentencePiece trainers work too: frequency table
  in memory, corpus on disk.
* **Encoding** is embarrassingly parallel: the merge ranks broadcast
  (a dict of ~vocab_size entries) and each executor encodes its rows
  in an Arrow-batched ``mapInPandas`` with a fill-once word cache (frozen at 65536 entries) — no
  shuffle at all; the output schema (ids array + n_tokens) feeds
  ``chunk_documents``/``pack_sequences`` directly.

Pre-tokenization uses a GPT-2-style regex (contractions, letter runs,
digit runs, punctuation runs, whitespace folded into the following
word) so merges never cross word boundaries — the property that makes
the word-frequency collapse exact, not an approximation.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbase_snapshot_spark.operators import packing as packing_mod
from pyspark.sql import types as T

# GPT-2-shaped pre-tokenizer (public pattern, re-stated without \p
# classes so Python's stdlib `re` and Spark's Java regex agree):
# contraction | optional-space+letters | optional-space+digits |
# optional-space+other-runs | trailing spaces
PRETOKEN_RE = (
    r"'(?:[sdmt]|ll|ve|re)"
    r"| ?[A-Za-zÀ-ɏ]+"
    r"| ?[0-9]+"
    r"| ?[^\sA-Za-zÀ-ɏ0-9]+"
    r"|\s+$|\s+"
)
_PRETOKEN = re.compile(PRETOKEN_RE)

END_OF_WORD = "</w>"  # classic Sennrich end-of-word marker


def pretokenize(text: str) -> list[str]:
    """Text → pre-token strings (the unit BPE merges live inside)."""
    return _PRETOKEN.findall(text)


# ------------------------------------------------------------------ train


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq) — ONE wide scan + one groupBy shuffle.
    The regex runs JVM-side (regexp_extract_all); nothing touches
    Python here."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE), F.lit(0))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_loop(freqs: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE over a word-frequency dict: symbols start as
    characters (+ END_OF_WORD on the last), each round merges the
    globally most-frequent adjacent pair.  Pair counts are maintained
    incrementally — only words containing the merged pair rescan."""
    words: list[list[str]] = []
    wfreq: list[int] = []
    for w, f in freqs.items():
        if not w:
            continue
        syms = list(w)
        syms[-1] += END_OF_WORD
        words.append(syms)
        wfreq.append(f)

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        f = wfreq[i]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
            pair_words.setdefault((a, b), set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # deterministic argmax: highest count, then lexicographic pair
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if pair_counts[best] < 1:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for i in list(pair_words.get(best, ())):
            syms = words[i]
            f = wfreq[i]
            # remove this word's contribution to all its pairs
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= f
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(i)
                    if not ws:
                        del pair_words[(a, b)]
            # apply the merge within the word
            j, out = 0, []
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            # re-add contributions
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
                pair_words.setdefault((a, b), set()).add(i)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1024,
    min_freq: int = 2,
    max_words: int = 1_000_000,
) -> "BpeTokenizer":
    """Train on a corpus DataFrame.  The distributed part is ONE
    word-frequency aggregation; only the (capped) frequency table is
    collected.  ``max_words`` keeps the driver object bounded at any
    corpus size — the tail it drops is, by construction, the lowest-
    frequency words, which contribute least to merge counts."""
    wf = word_frequencies(df, text_col).where(F.col("freq") >= min_freq)
    top = (
        wf.orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    freqs = {r["word"]: r["freq"] for r in top}
    base: set[str] = set()
    for w in freqs:
        if w:
            base.update(w[:-1])
            base.add(w[-1] + END_OF_WORD)
    # <unk> occupies id 0: without the -1 the trained tokenizer's
    # vocab_size exceeded the request by one, and an embedding table
    # allocated at exactly the requested size got an out-of-range id
    num_merges = max(0, vocab_size - len(base) - 1)
    merges = _merge_loop(freqs, num_merges)
    return BpeTokenizer(merges, base_symbols=sorted(base))


# ------------------------------------------------------------------ encode


class BpeTokenizer:
    """Merge list + vocabulary; encodes word-by-word with rank-greedy
    merging (the public GPT-2 encode loop).  Symbols outside the vocab
    always map to ``unk_id`` (= 0) — the vocab is FROZEN at training
    time."""

    def __init__(self, merges: list[tuple[str, str]], base_symbols: list[str]):
        self.merges = list(merges)
        self.base_symbols = list(base_symbols)
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        vocab = list(base_symbols) + [a + b for a, b in merges]
        self.id_of = {"<unk>": 0}
        for s in vocab:
            if s not in self.id_of:
                self.id_of[s] = len(self.id_of)
        self.token_of = {i: s for s, i in self.id_of.items()}
        self._cache: dict[str, list[str]] = {}

    # -- single word
    def encode_word(self, word: str) -> list[str]:
        got = self._cache.get(word)
        if got is not None:
            return got
        syms = list(word)
        if not syms:
            return []
        syms[-1] += END_OF_WORD
        while len(syms) > 1:
            ranked = [
                (self.ranks[p], i)
                for i, p in enumerate(zip(syms, syms[1:]))
                if p in self.ranks
            ]
            if not ranked:
                break
            _r, i = min(ranked)
            syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
        if len(self._cache) < 65536:
            self._cache[word] = syms
        return syms

    def encode(self, text: str) -> list[int]:
        unk = 0
        out: list[int] = []
        for w in pretokenize(text):
            for s in self.encode_word(w):
                out.append(self.id_of.get(s, unk))
        return out

    def decode(self, ids: list[int]) -> str:
        return "".join(
            self.token_of.get(i, "") for i in ids
        ).replace(END_OF_WORD, "")

    @property
    def vocab_size(self) -> int:
        return len(self.id_of)

    # -- (de)serialization: a merges list is the whole model
    def to_rows(self) -> list[tuple[int, str, str]]:
        return [(i, a, b) for i, (a, b) in enumerate(self.merges)]

    @classmethod
    def from_rows(cls, rows, base_symbols):
        merges = [(a, b) for _i, a, b in sorted(rows)]
        return cls(merges, base_symbols)


def encode_documents(
    df: DataFrame,
    tokenizer: BpeTokenizer,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus → (doc_id, token_ids array<int>, n_tokens).  The model
    (merges + vocab) ships to executors once via closure broadcast;
    encode is a shuffle-free mapInPandas with the tokenizer's word
    cache warm across rows in a batch — repeated words (the Zipf mass
    of any corpus) cost one dict hit."""
    merges = tokenizer.merges
    base = tokenizer.base_symbols
    # id dtype copied from the input: hardcoding LongType broke any
    # corpus with string (or int) document ids at the Arrow boundary
    schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType, True),
        T.StructField("token_ids", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tokens", T.IntegerType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = BpeTokenizer(merges, base)
        for pdf in batches:
            ids_col, n_col = [], []
            for text in pdf[text_col]:
                ids = tok.encode(text) if text is not None else None
                ids_col.append(ids)
                n_col.append(len(ids) if ids is not None else None)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "token_ids": ids_col,
                "n_tokens": pd.array(n_col, dtype="Int32"),
            })

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)


# --------------------------------------------------------- batch prep


def tokenize_and_pack(
    df: DataFrame,
    tokenizer: BpeTokenizer,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 1024,
    overlap: int = 0,
    pack_cap: int | None = None,
    by: str | None = packing_mod.AUTO_GROUP,
) -> DataFrame:
    """documents → packed fixed-length token sequences, the full batch-
    construction path: BPE encode (shuffle-free mapInPandas) → split
    each id array into ``seq_len`` windows with ``overlap`` (pure
    Catalyst: sequence/explode + slice on the array — a per-row
    generator, no extra shuffle) → ``pack_sequences`` bins (ONE window
    shuffle, grouped by ``by`` at scale).  Output: (id, chunk_idx,
    input_ids, n_chunk_tokens, bin, bin_offset) — and, under the
    default ``by=AUTO_GROUP``, ``pack_group``: a pack is identified by
    (pack_group, bin), never by bin alone.  Rows with null text are
    dropped — run the quality gate first."""
    if not 0 <= overlap < seq_len:
        raise ValueError("need 0 <= overlap < seq_len")
    stride = seq_len - overlap
    # either tokenizer family plugs in: the encode wrappers share the
    # (id, token_ids, n_tokens) contract
    if hasattr(tokenizer, "logp"):  # unigram.UnigramTokenizer
        from hbase_snapshot_spark.operators.unigram import (
            encode_documents_unigram,
        )

        enc = encode_documents_unigram(
            df, tokenizer, text_col=text_col, id_col=id_col)
    else:
        enc = encode_documents(
            df, tokenizer, text_col=text_col, id_col=id_col)
    enc = enc.where(F.col("token_ids").isNotNull())
    n_chunks = F.greatest(
        F.ceil((F.size("token_ids") - F.lit(overlap)) / F.lit(stride)),
        F.lit(1),
    ).cast("int")
    start = F.col("chunk_idx") * stride
    chunked = (
        enc.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn("chunk_idx", F.col("chunk_idx").cast("long"))
        .withColumn("input_ids", F.slice("token_ids", start + 1, seq_len))
        .withColumn("n_chunk_tokens", F.size("input_ids").cast("long"))
        .drop("token_ids", "n_tokens")
    )
    return packing_mod.pack_sequences(
        chunked, "n_chunk_tokens",
        cap=pack_cap if pack_cap is not None else seq_len * 8,
        order_col=[id_col, "chunk_idx"], by=by,
    )
