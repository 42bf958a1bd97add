"""N-gram language model — train counts and score documents at corpus
scale, the CCNet-style perplexity-filter stage of a training-data
pipeline.

Smoothing is **Stupid Backoff** (Brants et al. 2007, "Large Language
Models in Machine Translation"): S(w | context) is the relative
frequency at the longest matching order, backing off with a constant
factor α (no discounting, no normalization) — the smoothing DESIGNED
for distributed MapReduce LMs, because both training and scoring are
pure count arithmetic:

* **Training** is one tokenize + explode + groupBy per order — the LM
  lives as a DataFrame of ``(order, context, word, count,
  context_count)`` rows and is NEVER collected: at 100 TB the model
  itself is big data (Brants trained on 2T tokens this way).
* **Scoring** joins each document's n-grams against the count table
  once per order (n is 2-4, so 2-4 equi-joins on (context, word)),
  coalescing down the backoff chain with α per step, then aggregates
  per-document log₁₀-probability.  With ``broadcast_lm=True`` a small
  (pruned) LM broadcasts and scoring is shuffle-free except the final
  per-doc aggregation.

Everything is Column arithmetic — no UDFs anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOS = "<s>"
EOS = "</s>"
_WS = r"\s+"


def _tokens(text_col: str, lowercase: bool, ws: str = _WS):
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    toks = F.split(F.trim(c), ws)
    return F.filter(toks, lambda t: t != "")


def _with_markers(toks, n: int):
    """Prepend n-1 BOS and append EOS (standard n-gram sentence
    framing; documents are treated as one sentence each)."""
    if n > 1:
        bos = F.array(*([F.lit(BOS)] * (n - 1)))
        return F.concat(bos, toks, F.array(F.lit(EOS)))
    return F.concat(toks, F.array(F.lit(EOS)))


def _explode_ngrams(df: DataFrame, text_col: str, n: int, lowercase: bool,
                    keep: list[str], ws: str = _WS) -> DataFrame:
    """One row per token position with the order-n context and word:
    (``context`` = space-joined n-1 predecessors, ``word``).  Pure
    Catalyst: transform over a position sequence + slice."""
    toks = _with_markers(_tokens(text_col, lowercase, ws), n)
    df = df.select(*keep, toks.alias("_t"))
    # positions of scoreable words: indexes n-1 .. len-1 (0-based)
    pos = F.sequence(F.lit(n - 1), F.size("_t") - 1)
    df = df.where(F.size("_t") >= n).select(
        *keep,
        F.col("_t"),
        F.explode(pos).alias("_i"),
    )
    ctx = (
        F.array_join(F.slice("_t", F.col("_i") - n + 2, n - 1), " ")
        if n > 1 else F.lit("")
    )
    return df.select(
        *keep,
        ctx.alias("context"),
        F.element_at("_t", F.col("_i") + 1).alias("word"),
        F.col("_i").alias("pos"),
    )


def train_ngram_lm(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    lowercase: bool = True,
    min_count: int = 1,
    ws: str = _WS,
) -> DataFrame:
    """Corpus → Stupid-Backoff count table: one row per seen n-gram at
    every order 1..n — ``(order, context, word, count,
    context_count)`` (context = '' at order 1, context_count = corpus
    token total there).  One groupBy shuffle per order; the result is
    a DataFrame you persist/partition like any table — never a driver
    object."""
    if n < 1:
        raise ValueError("n must be >= 1")
    tables = []
    for k in range(1, n + 1):
        grams = _explode_ngrams(df, text_col, k, lowercase, keep=[], ws=ws)
        counts = grams.groupBy("context", "word").agg(
            F.count("*").alias("count"))
        totals = counts.groupBy("context").agg(
            F.sum("count").alias("context_count"))
        joined = counts.join(totals, "context")
        if k > 1:
            # the unigram floor stays WHOLE regardless of min_count —
            # scoring's final backoff step needs it (the same invariant
            # prune_lm preserves); thresholding order 1 pushed every
            # rare-but-seen word onto the harsher unseen-word floor and
            # inflated perplexity for documents containing them
            joined = joined.where(F.col("count") >= min_count)
        tables.append(
            joined.select(F.lit(k).alias("order"), "context", "word",
                          "count", "context_count")
        )
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out


def prune_lm(lm: DataFrame, min_count: int = 2) -> DataFrame:
    """Count-threshold pruning (the standard way an LM gets small
    enough to broadcast): drop rows below ``min_count`` EXCEPT the
    unigram floor, which scoring's final backoff step needs whole."""
    return lm.where((F.col("count") >= min_count) | (F.col("order") == 1))


def score_documents(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    alpha: float = 0.4,
    lowercase: bool = True,
    broadcast_lm: bool = False,
    ws: str = _WS,
) -> DataFrame:
    """Per-document Stupid-Backoff score: for each token position take
    S = count(context,w)/context_count at the longest order with a hit,
    else α·S(shorter), ending at the unigram relative frequency; a
    token absent even there scores α^(n-1)·(1/corpus_tokens) (one
    pseudo-count of an unseen word).  Output: (id, n_tokens,
    avg_logprob  [log₁₀ per token], perplexity  [10^-avg]).

    Plan shape: ONE n-gram explode of the corpus, n equi-joins against
    the order slices (broadcast when ``broadcast_lm``), one final
    groupBy on the document id."""
    grams = _explode_ngrams(df, text_col, n, lowercase, keep=[id_col], ws=ws)
    joined = grams
    for k in range(n, 0, -1):
        slice_k = lm.where(F.col("order") == k).select(
            F.col("context").alias(f"_c{k}"),
            F.col("word").alias(f"_w{k}"),
            (F.col("count") / F.col("context_count")).alias(f"_p{k}"),
        )
        if broadcast_lm:
            slice_k = F.broadcast(slice_k)
        # the order-k context of this position = last k-1 words of the
        # full order-n context string
        if k > 1:
            ctx_k = F.array_join(
                F.slice(F.split("context", " "), n - k + 1, k - 1), " ")
        else:
            ctx_k = F.lit("")
        joined = joined.join(
            slice_k,
            (ctx_k == F.col(f"_c{k}")) & (F.col("word") == F.col(f"_w{k}")),
            "left",
        )
    # corpus token total for the unseen-word floor = any order-1
    # context_count (single value; computed without a collect)
    uni_total = lm.where(F.col("order") == 1).select(
        F.max("context_count").alias("_N"))
    joined = joined.crossJoin(F.broadcast(uni_total))
    prob = None
    for i, k in enumerate(range(n, 0, -1)):
        term = F.col(f"_p{k}") * F.lit(alpha ** i)
        prob = term if prob is None else F.coalesce(prob, term)
    floor = F.lit(alpha ** (n - 1)) / F.col("_N")
    prob = F.coalesce(prob, floor)
    per_tok = F.log10(prob)
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(per_tok).alias("avg_logprob"),
        )
        .withColumn("perplexity", F.pow(F.lit(10.0), -F.col("avg_logprob")))
    )


def perplexity_filter(
    df: DataFrame,
    lm: DataFrame,
    max_perplexity: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    **score_kwargs,
) -> DataFrame:
    """CCNet-style gate: keep documents whose LM perplexity is below
    the threshold (high perplexity = gibberish / boilerplate / wrong
    language relative to the reference corpus the LM was trained
    on)."""
    scores = score_documents(
        df, lm, text_col=text_col, id_col=id_col, **score_kwargs)
    keep = scores.where(
        F.col("perplexity") <= max_perplexity).select(id_col)
    return df.join(keep, id_col, "left_semi")


def local_stupid_backoff(
    docs: list[str], text: str, n: int = 3, alpha: float = 0.4,
    lowercase: bool = True,
) -> tuple[int, float]:
    """Driver-side reference implementation (tests pin the distributed
    plan against this): returns (n_tokens, avg log10 prob)."""
    import re as _re

    def tok(s):
        s = s.lower() if lowercase else s
        return [t for t in _re.split(_WS, s.strip()) if t]

    counts: dict[tuple[str, ...], int] = {}
    for d in docs:
        ts = [BOS] * (n - 1) + tok(d) + [EOS]
        for k in range(1, n + 1):
            start = (n - 1) - (k - 1)
            for i in range(start, len(ts) - k + 1):
                g = tuple(ts[i : i + k])
                counts[g] = counts.get(g, 0) + 1
    # context totals (only genuine counts contribute)
    ctx_tot: dict[tuple[str, ...], int] = {}
    for g, c in counts.items():
        if len(g) >= 1 and c > 0:
            ctx_tot[g[:-1]] = ctx_tot.get(g[:-1], 0) + c
    total = ctx_tot.get((), 0)
    ts = [BOS] * (n - 1) + tok(text) + [EOS]
    lp = 0.0
    cnt = 0
    for i in range(n - 1, len(ts)):
        p = None
        for j, k in enumerate(range(n, 0, -1)):
            g = tuple(ts[i - k + 1 : i + 1])
            c = counts.get(g, 0)
            t = ctx_tot.get(g[:-1], 0)
            if c > 0 and t > 0:
                p = (alpha ** j) * c / t
                break
        if p is None:
            p = (alpha ** (n - 1)) / total
        lp += math.log10(p)
        cnt += 1
    return cnt, lp / cnt
