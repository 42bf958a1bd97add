"""Unigram-LM tokenizer (operators/unigram.py, Kudo 2018): EM
monotonicity (the mathematical property a correct E/M pair must have),
Viterbi-vs-bruteforce segmentation optimality, morpheme discovery on a
compositional corpus, roundtrip/unknown handling, and the shuffle-free
Spark encode path."""

import itertools
import math
import random

from pyspark.sql import functions as F

from hbase_snapshot_spark.operators import unigram as U


def test_em_step_is_monotone_in_likelihood():
    freqs = {"abab": 10, "abc": 7, "cab": 5, "bbb": 3, "ac": 2}
    probs = U._seed_vocab(freqs, seed_size=40, max_piece_len=4)
    lls = []
    for _ in range(6):
        probs, ll = U._em_step(freqs, probs, max_piece_len=4)
        lls.append(ll)
    for a, b in zip(lls, lls[1:]):
        assert b >= a - 1e-9, lls
    assert abs(sum(probs.values()) - 1.0) < 1e-9


def test_viterbi_matches_bruteforce():
    rng = random.Random(42)
    pieces = ["a", "b", "c", "ab", "bc", "abc", "ca", "bca"]
    logp = {p: -rng.uniform(0.5, 6.0) for p in pieces}
    tok = U.UnigramTokenizer(logp, max_piece_len=3)

    def brute(word):
        n = len(word)
        best_score, best_seg = float("-inf"), None
        # all 2^(n-1) cut sets
        for cuts in itertools.product([0, 1], repeat=n - 1):
            bounds = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
            seg = [word[a:b] for a, b in zip(bounds, bounds[1:])]
            if any(p not in logp for p in seg):
                continue
            score = sum(logp[p] for p in seg)
            if score > best_score:
                best_score, best_seg = score, seg
        return best_score, best_seg

    for _ in range(60):
        word = "".join(rng.choice("abc") for _ in range(rng.randrange(1, 9)))
        want_score, _want = brute(word)
        got = tok.encode_word(word)
        got_score = sum(logp[p] for p in got)
        assert abs(got_score - want_score) < 1e-9, (word, got)


def test_train_discovers_morphemes_and_roundtrips(spark):
    base = ("unhappy unkind rethink rekind thinking kindness "
            "unthinking rethinking happyness kindly ")
    docs = spark.createDataFrame(
        [(i, base) for i in range(30)], "doc_id long, text string")
    tok = U.train_unigram(docs, vocab_size=64, min_freq=1,
                          max_piece_len=6, em_iters=2)
    assert tok.vocab_size <= 64 + 1  # + <unk>
    pieces = set(tok.logp)
    # the compositional morphemes should survive pruning as pieces
    assert "kind" in pieces or " kind" in pieces
    assert "think" in pieces or " think" in pieces
    # lossless roundtrip on in-vocabulary text
    text = "unkind rethink kindness"
    assert tok.decode(tok.encode(text)) == text
    # a trained piece segmentation beats char-by-char
    word = " kindness"
    assert len(tok.encode_word(word)) < len(word)


def test_unknown_char_fallback():
    tok = U.UnigramTokenizer({"a": -1.0, "b": -1.5, "ab": -1.2},
                             max_piece_len=2)
    ids = tok.encode("aZb")
    assert 0 in ids  # unk id for Z
    assert tok.decode(ids) == "ab"  # unk skipped, known chars kept
    # a word of ONLY unknown chars still encodes (one unk per char)
    assert tok.encode_word("ZZ") == ["Z", "Z"]


def test_serialization_roundtrip():
    tok = U.UnigramTokenizer(
        {"a": -1.0, "b": -2.0, "ab": -0.7}, max_piece_len=2)
    tok2 = U.UnigramTokenizer.from_rows(tok.to_rows(), max_piece_len=2)
    for w in ("ab", "aab", "ba"):
        assert tok.encode_word(w) == tok2.encode_word(w)
        assert tok.encode(w) == tok2.encode(w)


def test_encode_documents_unigram_spark(spark):
    docs = spark.createDataFrame(
        [(1, "abab abc"), (2, None), (3, "")],
        "doc_id long, text string")
    tok = U.UnigramTokenizer(
        {"a": -2.0, "b": -2.0, "c": -2.2, " a": -1.9, "ab": -1.0,
         "abab": -0.9, " abc": -1.1}, max_piece_len=4)
    out = {r.doc_id: r for r in
           U.encode_documents_unigram(docs, tok).collect()}
    assert out[2].token_ids is None and out[2].n_tokens is None
    assert out[3].token_ids == [] and out[3].n_tokens == 0
    ids = out[1].token_ids
    assert out[1].n_tokens == len(ids) > 0
    assert tok.decode(ids) == "abab abc"
    # shuffle-free: pure mapInPandas over the scan
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        U.encode_documents_unigram(docs, tok).explain("simple")
    assert "Exchange" not in buf.getvalue()


def test_train_respects_char_coverage(spark):
    """every character of the training corpus stays encodable after
    aggressive pruning (single chars are never pruned)."""
    docs = spark.createDataFrame(
        [(1, "xyzzy quux " * 20)], "doc_id long, text string")
    tok = U.train_unigram(docs, vocab_size=8, min_freq=1,
                          max_piece_len=4, em_iters=1)
    for ch in set("xyzzy quux"):
        word = ch if ch != " " else " x"
        seg = tok.encode_word(word)
        assert seg and all(
            p in tok.logp or len(p) == 1 for p in seg)
    assert 0 not in tok.encode("xyzzy quux")  # no unk on seen text


def test_unigram_vs_bpe_contract_parity(spark):
    """encode_documents_unigram keeps bpe.encode_documents' exact
    output contract so chunk/pack/shard consume either tokenizer."""
    from hbase_snapshot_spark.operators.bpe import (
        encode_documents,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat " * 3) for i in range(5)],
        "doc_id long, text string")
    uni = U.train_unigram(docs, vocab_size=64, min_freq=1)
    bpe = train_bpe(docs, vocab_size=64, min_freq=1)
    a = U.encode_documents_unigram(docs, uni)
    b = encode_documents(docs, bpe)
    assert a.schema == b.schema
    ra = {r.doc_id: r.n_tokens for r in a.collect()}
    rb = {r.doc_id: r.n_tokens for r in b.collect()}
    assert set(ra) == set(rb) and all(v > 0 for v in ra.values())


def test_unigram_artifact_roundtrip(spark, tmp_path):
    """save_unigram/load_unigram: the reopened model encodes
    identically (the train-once / score-many contract)."""
    from hbase_snapshot_spark.operators.artifacts import (
        load_unigram,
        save_unigram,
    )

    docs = spark.createDataFrame(
        [(i, "the kind of thinking that rethinks unkind things " * 2)
         for i in range(8)],
        "doc_id long, text string")
    tok = U.train_unigram(docs, vocab_size=48, min_freq=1)
    path = str(tmp_path / "uni")
    save_unigram(tok, spark, path)
    tok2 = load_unigram(spark, path)
    assert tok2.max_piece_len == tok.max_piece_len
    for text in ("rethinks unkind", "the thinking kind", "zz unseen"):
        assert tok.encode(text) == tok2.encode(text)


def test_tokenize_and_pack_accepts_unigram(spark):
    """tokenize_and_pack dispatches on tokenizer family — the whole
    batch-construction path runs off a unigram model too."""
    from hbase_snapshot_spark.operators.bpe import tokenize_and_pack

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog sat too " * 4)
         for i in range(4)],
        "doc_id long, text string")
    tok = U.train_unigram(docs, vocab_size=64, min_freq=1)
    out = tokenize_and_pack(docs, tok, seq_len=16, overlap=4,
                            pack_cap=64).collect()
    assert out
    assert all(r.n_chunk_tokens <= 16 for r in out)
    assert {r.doc_id for r in out} == {0, 1, 2, 3}
