"""Distributed Naive-Bayes text classifier — the seed-corpus quality /
domain classifier stage of a training-data pipeline.  The GPT-3 and
LLaMA curation recipes train a linear text classifier on a trusted
positive corpus plus crawl negatives, then score every crawl document
and keep the high scorers; multinomial Naive Bayes over unigrams is the
count-arithmetic member of that family, which makes it MapReduce/Spark
native in the same way Stupid Backoff is for LMs (see ``lm.py``):

* **Training** is tokenize + explode + ONE groupBy over the token with
  per-class counts.  The model is a DataFrame of sufficient statistics
  ``(token, pos_count, neg_count)`` — never collected, mergeable across
  corpus shards by summing counts, prunable like an LM count table.
* **Scoring** is one explode + one equi-join on the token (broadcast
  when the pruned model is small) + a per-document sum of Laplace-
  smoothed log-likelihood ratios.  Unseen tokens contribute the
  smoothing-floor LLR via ``coalesce`` — no second pass, no UDFs.

Scale shape at 100 TB: the model groupBy is map-side combinable on the
token; scoring's join key is the token (model side tiny after pruning →
broadcast), and the only required shuffle is the final per-document
aggregation, which carries one partial sum per (partition, doc).

This operator is part of the LLM-pipeline tier (no reference twin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lm import _WS, _tokens


def _explode_tokens(df: DataFrame, text_col: str, lowercase: bool,
                    keep: list[Column], ws: str) -> DataFrame:
    toks = _tokens(text_col, lowercase, ws)
    return df.select(*keep, F.explode(toks).alias("token"))


def train_nb(
    df: DataFrame,
    label: Column,
    text_col: str = "text",
    lowercase: bool = True,
    min_count: int = 1,
    ws: str = _WS,
) -> DataFrame:
    """Corpus + boolean label Column → NB sufficient statistics:
    ``(token, pos_count, neg_count)``.  One groupBy shuffle; the result
    is a DataFrame you persist like any table."""
    toks = _explode_tokens(
        df, text_col, lowercase, keep=[label.alias("_pos")], ws=ws)
    model = toks.groupBy("token").agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("pos_count"),
        F.sum(F.when(F.col("_pos"), 0).otherwise(1)).alias("neg_count"),
    )
    if min_count > 1:
        model = model.where(
            (F.col("pos_count") + F.col("neg_count")) >= min_count)
    return model


def prune_nb(model: DataFrame, min_count: int = 2) -> DataFrame:
    """Count-threshold pruning — the standard way the model gets small
    enough to broadcast.  Dropping a token moves it to the smoothing
    floor at scoring time (a graceful degradation, not an error)."""
    return model.where(
        (F.col("pos_count") + F.col("neg_count")) >= min_count)


def score_nb(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    prior_llr: float = 0.0,
    lowercase: bool = True,
    broadcast_model: bool = False,
    ws: str = _WS,
) -> DataFrame:
    """Per-document NB log-likelihood ratio
    ``llr = prior + Σ_tok [ln P(tok|pos) - ln P(tok|neg)]`` with
    Laplace smoothing α over the model vocabulary V:
    ``P(tok|class) = (count+α) / (class_total + α·V)``.

    Output: (id, n_tokens, llr) — llr > 0 reads "more like the positive
    class".  Documents with zero tokens produce no output row (nothing
    to condition on).  The class totals and V come from a one-row
    aggregate over the model, broadcast back into the plan — the model
    is never collected."""
    consts = model.agg(
        F.sum("pos_count").alias("_P"),
        F.sum("neg_count").alias("_N"),
        F.count("*").alias("_V"),
    )
    m = model.select("token", "pos_count", "neg_count")
    if broadcast_model:
        m = F.broadcast(m)
    toks = _explode_tokens(
        df, text_col, lowercase, keep=[F.col(id_col)], ws=ws)
    joined = toks.join(m, "token", "left").crossJoin(F.broadcast(consts))
    a = F.lit(float(alpha))
    llr_tok = (
        F.log((F.coalesce(F.col("pos_count"), F.lit(0)) + a)
              / (F.col("_P") + a * F.col("_V")))
        - F.log((F.coalesce(F.col("neg_count"), F.lit(0)) + a)
                / (F.col("_N") + a * F.col("_V")))
    )
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (F.sum(llr_tok) + F.lit(float(prior_llr))).alias("llr"),
    )


def nb_filter(
    df: DataFrame,
    model: DataFrame,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    **score_kwargs,
) -> DataFrame:
    """Classifier gate: keep documents whose NB llr clears the
    threshold (the "looks like the trusted seed corpus" filter)."""
    scores = score_nb(
        df, model, text_col=text_col, id_col=id_col, **score_kwargs)
    keep = scores.where(F.col("llr") >= threshold).select(id_col)
    return df.join(keep, id_col, "left_semi")
