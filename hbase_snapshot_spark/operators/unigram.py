"""Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization:
Improving Neural Network Translation Models with Multiple Subword
Candidates" — the SentencePiece `--model_type=unigram` algorithm,
re-stated from the public paper).

The model is a piece → probability table.  Training seeds a large
candidate vocabulary, runs EM (E-step: expected piece counts from the
forward-backward marginals of every word's segmentation lattice;
M-step: renormalize), and alternates EM with pruning of the
lowest-probability pieces until the vocabulary budget is met.  Encoding
is the Viterbi (max-probability) segmentation.

Scale shape — identical to bpe.py, deliberately:

* **Training** never iterates over the corpus.  One
  ``word_frequencies`` aggregation (a single shuffle) collapses the
  corpus to a capped word-frequency table; EM runs driver-side over
  that table (unique words are heaps-law sublinear in corpus size;
  ``max_words`` bounds the driver object explicitly).  This is how the
  reference SentencePiece trainer works too: frequency table in
  memory, corpus on disk.
* **Encoding** broadcasts the piece table (~vocab_size floats) and
  Viterbi-decodes rows in a shuffle-free Arrow-batched
  ``mapInPandas`` with a word cache — repeated words (the Zipf mass)
  cost one dict hit.

Reference parity note: the reference repo has no tokenizer; this
exists for the LLM-pipeline tier next to operators/bpe.py.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hbase_snapshot_spark.operators.bpe import (
    pretokenize,
    word_frequencies,
)

#: encode-time fallback for characters never seen in training
UNK = "<unk>"


# ------------------------------------------------------------------ train


def _seed_vocab(freqs: dict[str, int], seed_size: int,
                max_piece_len: int) -> dict[str, float]:
    """Candidate pieces: every substring of every word up to
    ``max_piece_len``, scored by freq·len (the paper's suffix-array
    seeding, stated plainly); ALL single characters are kept
    unconditionally — they guarantee every word stays segmentable
    through every pruning round."""
    scores: dict[str, int] = {}
    chars: set[str] = set()
    for w, f in freqs.items():
        n = len(w)
        for i in range(n):
            chars.add(w[i])
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                piece = w[i:j]
                scores[piece] = scores.get(piece, 0) + f * (j - i)
    multi = sorted(
        ((s, p) for p, s in scores.items() if len(p) > 1),
        key=lambda t: (-t[0], t[1]))
    keep = {p for _s, p in multi[: max(0, seed_size - len(chars))]}
    keep |= chars
    total = sum(scores[p] for p in keep)
    return {p: scores[p] / total for p in keep}


def _em_step(freqs: dict[str, int], probs: dict[str, float],
             max_piece_len: int) -> tuple[dict[str, float], float]:
    """One EM pass over the word-frequency table: forward-backward
    marginals per word → expected piece counts → renormalized probs.
    Returns (new probs, total data log-likelihood)."""
    counts: dict[str, float] = {}
    loglik = 0.0
    for w, f in freqs.items():
        n = len(w)
        if n == 0:
            continue
        alpha = [0.0] * (n + 1)
        alpha[0] = 1.0
        for i in range(1, n + 1):
            a = 0.0
            for j in range(max(0, i - max_piece_len), i):
                if alpha[j]:
                    p = probs.get(w[j:i])
                    if p:
                        a += alpha[j] * p
            alpha[i] = a
        z = alpha[n]
        if z <= 0.0:
            continue  # unsegmentable (cannot happen while chars remain)
        beta = [0.0] * (n + 1)
        beta[n] = 1.0
        for i in range(n - 1, -1, -1):
            b = 0.0
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                if beta[j]:
                    p = probs.get(w[i:j])
                    if p:
                        b += p * beta[j]
            beta[i] = b
        loglik += f * math.log(z)
        inv_z = f / z
        for i in range(n):
            ai = alpha[i]
            if not ai:
                continue
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                piece = w[i:j]
                p = probs.get(piece)
                if p and beta[j]:
                    counts[piece] = counts.get(piece, 0.0) \
                        + ai * p * beta[j] * inv_z
    total = sum(counts.values())
    if total <= 0.0:
        return probs, loglik
    return {p: c / total for p, c in counts.items() if c > 0.0}, loglik


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1024,
    min_freq: int = 2,
    max_words: int = 1_000_000,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    em_iters: int = 2,
    shrink: float = 0.75,
) -> "UnigramTokenizer":
    """Train on a corpus DataFrame.  The distributed part is ONE
    word-frequency aggregation; EM + pruning run driver-side over the
    capped table.  Each pruning round runs ``em_iters`` EM passes then
    keeps the best ``shrink`` fraction of multi-char pieces (single
    chars are never pruned), until the budget is met."""
    wf = word_frequencies(df, text_col).where(F.col("freq") >= min_freq)
    top = (
        wf.orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    freqs = {r["word"]: r["freq"] for r in top if r["word"]}
    probs = _seed_vocab(freqs, vocab_size * seed_factor, max_piece_len)
    while True:
        for _ in range(em_iters):
            new_probs, _ll = _em_step(freqs, probs, max_piece_len)
            # pieces EM zeroed out still need to exist for pruning
            # bookkeeping; single chars must survive regardless
            floor = min(new_probs.values(), default=1.0) * 1e-6
            probs = {
                p: new_probs.get(p, floor if len(p) == 1 else 0.0)
                for p in probs
            }
            probs = {p: v for p, v in probs.items()
                     if v > 0.0 or len(p) == 1}
        n_multi = sum(1 for p in probs if len(p) > 1)
        n_chars = len(probs) - n_multi
        budget = max(0, vocab_size - n_chars)
        if n_multi <= budget:
            break
        keep_n = max(budget, int(n_multi * shrink))
        if keep_n == n_multi:  # shrink must make progress
            keep_n = budget
        ranked = sorted(
            ((v, p) for p, v in probs.items() if len(p) > 1),
            key=lambda t: (-t[0], t[1]))
        kept = {p for _v, p in ranked[:keep_n]}
        probs = {p: v for p, v in probs.items()
                 if len(p) == 1 or p in kept}
        total = sum(probs.values())
        probs = {p: v / total for p, v in probs.items()}
    new_probs, _ll = _em_step(freqs, probs, max_piece_len)
    floor = min(new_probs.values(), default=1.0) * 1e-6
    probs = {p: new_probs.get(p, floor) for p in probs}
    total = sum(probs.values())
    return UnigramTokenizer(
        {p: math.log(v / total) for p, v in probs.items()},
        max_piece_len=max_piece_len)


# ------------------------------------------------------------------ encode


class UnigramTokenizer:
    """piece → log-probability table; encodes word-by-word with the
    Viterbi segmentation (maximize Σ logp; ties broken toward the
    LONGER piece, then lexicographically — deterministic).  Characters
    outside the vocabulary map to ``unk_id`` (= 0) one at a time, at a
    fixed penalty below the worst real piece."""

    def __init__(self, logp: dict[str, float], max_piece_len: int = 8):
        self.logp = dict(logp)
        self.max_piece_len = max_piece_len
        self._unk_logp = min(self.logp.values(), default=0.0) - 10.0
        self.id_of = {UNK: 0}
        for p in sorted(self.logp, key=lambda p: (-self.logp[p], p)):
            self.id_of[p] = len(self.id_of)
        self.token_of = {i: p for p, i in self.id_of.items()}
        self._cache: dict[str, list[str]] = {}

    # -- single word
    def encode_word(self, word: str) -> list[str]:
        got = self._cache.get(word)
        if got is not None:
            return got
        n = len(word)
        if n == 0:
            return []
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back = [0] * (n + 1)
        best[0] = 0.0
        for i in range(1, n + 1):
            for j in range(max(0, i - self.max_piece_len), i):
                if best[j] == NEG:
                    continue
                piece = word[j:i]
                lp = self.logp.get(piece)
                if lp is None:
                    if i - j == 1:  # unknown single char fallback
                        lp = self._unk_logp
                    else:
                        continue
                score = best[j] + lp
                # strictly-greater keeps the SMALLEST j (longest last
                # piece) on ties, since j ascends
                if score > best[i]:
                    best[i] = score
                    back[i] = j
        pieces: list[str] = []
        i = n
        while i > 0:
            j = back[i]
            pieces.append(word[j:i])
            i = j
        pieces.reverse()
        if len(self._cache) < 65536:
            self._cache[word] = pieces
        return pieces

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for w in pretokenize(text):
            for p in self.encode_word(w):
                out.append(self.id_of.get(p, 0))
        return out

    def decode(self, ids: list[int]) -> str:
        return "".join(
            self.token_of.get(i, "") for i in ids if i != 0)

    @property
    def vocab_size(self) -> int:
        return len(self.id_of)

    # -- (de)serialization: the (piece, logp) table IS the model
    def to_rows(self) -> list[tuple[str, float]]:
        return sorted(self.logp.items())

    @classmethod
    def from_rows(cls, rows, max_piece_len: int = 8):
        return cls({p: lp for p, lp in rows}, max_piece_len=max_piece_len)


def encode_documents_unigram(
    df: DataFrame,
    tokenizer: UnigramTokenizer,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus → (doc_id, token_ids array<int>, n_tokens), the same
    contract as bpe.encode_documents: model ships once via closure
    broadcast, Viterbi decode runs in a shuffle-free mapInPandas."""
    logp = tokenizer.logp
    mpl = tokenizer.max_piece_len
    schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType, True),
        T.StructField("token_ids", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tokens", T.IntegerType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = UnigramTokenizer(logp, max_piece_len=mpl)
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
