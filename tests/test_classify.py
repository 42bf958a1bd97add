"""Naive-Bayes classifier (operators/classify.py): distributed counts
vs a driver-side reference, smoothing-floor paths, the gate, and the
100 TB plan shape."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from hbase_snapshot_spark.operators import classify as C

POS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
]
NEG = [
    "der hund sitzt auf dem baum",
    "die katze schläft",
]
EVAL = [
    "the cat and the dog",          # all-seen, english-ish
    "der hund und die katze",       # german-ish (und unseen in train)
    "zzz qqq",                      # fully unseen → pure floor
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, t, True) for i, t in enumerate(POS)] + [
        (100 + i, t, False) for i, t in enumerate(NEG)]
    return spark.createDataFrame(rows, ["doc_id", "text", "pos"])


@pytest.fixture(scope="module")
def evaldf(spark):
    return spark.createDataFrame(
        list(enumerate(EVAL)), ["doc_id", "text"])


def _ref_model():
    counts: dict[str, list[int]] = {}
    for pos, docs in ((0, POS), (1, NEG)):
        for d in docs:
            for t in re.split(r"\s+", d.strip().lower()):
                if t:
                    counts.setdefault(t, [0, 0])[pos] += 1
    return counts


def _ref_score(text: str, alpha: float = 1.0):
    counts = _ref_model()
    p_tot = sum(v[0] for v in counts.values())
    n_tot = sum(v[1] for v in counts.values())
    vocab = len(counts)
    llr, n = 0.0, 0
    for t in re.split(r"\s+", text.strip().lower()):
        if not t:
            continue
        pn, nn = counts.get(t, (0, 0))
        llr += math.log((pn + alpha) / (p_tot + alpha * vocab))
        llr -= math.log((nn + alpha) / (n_tot + alpha * vocab))
        n += 1
    return n, llr


def test_model_counts_match_reference(corpus):
    model = {r.token: (r.pos_count, r.neg_count)
             for r in C.train_nb(corpus, F.col("pos")).collect()}
    ref = {t: tuple(v) for t, v in _ref_model().items()}
    assert model == ref


def test_scores_match_reference(corpus, evaldf):
    model = C.train_nb(corpus, F.col("pos"))
    got = {r.doc_id: (r.n_tokens, r.llr)
           for r in C.score_nb(evaldf, model).collect()}
    for i, text in enumerate(EVAL):
        n_ref, llr_ref = _ref_score(text)
        assert got[i][0] == n_ref
        assert got[i][1] == pytest.approx(llr_ref, rel=1e-12)


def test_score_signs_separate_classes(corpus, evaldf):
    model = C.train_nb(corpus, F.col("pos"))
    got = {r.doc_id: r.llr for r in C.score_nb(evaldf, model).collect()}
    assert got[0] > 0          # english-ish doc scores positive
    assert got[1] < 0          # german-ish doc scores negative
    # fully-unseen doc sits at the (nonzero) floor: every token gets
    # ln((0+1)/(P+V)) - ln((0+1)/(N+V)) = ln((N+V)/(P+V))
    ref = _ref_model()
    p_tot = sum(v[0] for v in ref.values())
    n_tot = sum(v[1] for v in ref.values())
    floor = 2 * math.log((n_tot + len(ref)) / (p_tot + len(ref)))
    assert got[2] == pytest.approx(floor, rel=1e-12)


def test_empty_doc_produces_no_row(spark, corpus):
    model = C.train_nb(corpus, F.col("pos"))
    df = spark.createDataFrame([(7, ""), (8, "   ")], ["doc_id", "text"])
    assert C.score_nb(df, model).count() == 0


def test_prune_moves_tokens_to_floor(corpus, evaldf):
    model = C.train_nb(corpus, F.col("pos"))
    pruned = C.prune_nb(model, min_count=2)
    kept = {r.token for r in pruned.collect()}
    assert kept < {r.token for r in model.collect()}
    # scoring still runs, all tokens resolve (seen or floor)
    got = C.score_nb(evaldf, pruned).collect()
    assert {r.doc_id for r in got} == {0, 1, 2}


def test_nb_filter_gate(corpus, evaldf):
    model = C.train_nb(corpus, F.col("pos"))
    kept = C.nb_filter(evaldf, model, threshold=0.0)
    assert {r.doc_id for r in kept.collect()} == {0}


def test_broadcast_and_prior(corpus, evaldf):
    model = C.train_nb(corpus, F.col("pos"))
    base = {r.doc_id: r.llr
            for r in C.score_nb(evaldf, model).collect()}
    shifted = {r.doc_id: r.llr for r in C.score_nb(
        evaldf, model, prior_llr=1.5, broadcast_model=True).collect()}
    for k in base:
        assert shifted[k] == pytest.approx(base[k] + 1.5, rel=1e-12)


def test_plan_jvm_side_and_broadcast(corpus, evaldf):
    """Scale pins: training and scoring are pure Catalyst (no Python in
    the plan); with broadcast_model the token join is broadcast, so the
    only exchange keys on the doc aggregation."""
    model = C.train_nb(corpus, F.col("pos"))
    p_train = model._jdf.queryExecution().executedPlan().toString()
    scored = C.score_nb(evaldf, model, broadcast_model=True)
    p_score = scored._jdf.queryExecution().executedPlan().toString()
    for p in (p_train, p_score):
        assert "BatchEvalPython" not in p and "PythonUDF" not in p
    assert "BroadcastHashJoin" in p_score
