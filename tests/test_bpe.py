"""BPE tokenizer (operators/bpe.py): the classic merge algorithm
against a hand-computed reference, encode/decode roundtrip, the
word-frequency collapse's exactness, and the distributed encode path."""

import pytest

from hbase_snapshot_spark.operators import bpe as B


# ------------------------------------------------------------ merge loop


def test_merge_loop_classic_example():
    """Sennrich's worked example: {'low':5,'lower':2,'newest':6,
    'widest':3} — the first merges are (e,s), (es,t</w>), ... driven
    purely by pair frequency."""
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = B._merge_loop(dict(freqs), 4)
    # round 1: (e,s) and (s,t</w>) tie at count 9 (newest 6 + widest
    # 3); everything else is ≤7 — the winner must be one of the two
    assert merges[0] in (("e", "s"), ("s", "t</w>"))
    # round 2 completes the 'est</w>' suffix either way, still at 9
    assert merges[1] in (("es", "t</w>"), ("e", "st</w>"))
    assert merges[1][0] + merges[1][1] == "est</w>"
    # round 3: (l,o) at 7 (low 5 + lower 2) is now the unique max
    assert merges[2] == ("l", "o")
    # round 4: (w, est</w>) from newest alone = 6 beats (lo, w</w>) = 5
    assert merges[3] == ("w", "est</w>")


def test_merge_loop_deterministic_tiebreak():
    # two pairs with equal count: lexicographically LARGER pair wins
    # (max over (count, pair)) — just pin determinism
    m1 = B._merge_loop({"ab": 3, "cd": 3}, 1)
    m2 = B._merge_loop({"cd": 3, "ab": 3}, 1)
    assert m1 == m2


def test_merge_loop_stops_when_exhausted():
    merges = B._merge_loop({"ab": 1}, 100)
    assert len(merges) == 1  # only (a, b</w>) exists


# ------------------------------------------------------------ pretokenize


def test_pretokenize_partitions_exactly():
    texts = [
        "Hello, world!  It's 2026.",
        "  leading spaces",
        "tabs\tand\nnewlines\n",
        "digits123mix 45.67",
        "café résumé",
    ]
    for t in texts:
        toks = B.pretokenize(t)
        assert "".join(toks) == t  # exact partition, nothing lost


def test_pretokenize_contractions():
    assert "'s" in B.pretokenize("it's")
    assert "'ll" in B.pretokenize("we'll")


# ------------------------------------------------------- tokenizer object


def _toy_tokenizer():
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = B._merge_loop(dict(freqs), 10)
    base = set()
    for w in freqs:
        base.update(w[:-1])
        base.add(w[-1] + B.END_OF_WORD)
    return B.BpeTokenizer(merges, sorted(base))


def test_encode_decode_roundtrip_known_words():
    tok = _toy_tokenizer()
    ids = tok.encode("newest lowest")
    assert ids and all(isinstance(i, int) for i in ids)
    # decode rebuilds the text modulo the end-of-word marker → spaces
    # survive only as pre-token prefixes; known chars reconstruct
    assert tok.decode(tok.encode("newest")) == "newest"


def test_encode_word_greedy_rank_order():
    tok = _toy_tokenizer()
    syms = tok.encode_word("newest")
    assert "".join(syms) == "newest" + B.END_OF_WORD
    # trained on a corpus where 'est</w>' merges early: the word must
    # NOT be all single chars
    assert len(syms) < len("newest") + 1


def test_unknown_char_maps_to_unk():
    tok = _toy_tokenizer()
    ids = tok.encode("quiz")  # q, u, z never seen
    assert 0 in ids  # <unk> id


def test_serialization_roundtrip():
    tok = _toy_tokenizer()
    rows = tok.to_rows()
    tok2 = B.BpeTokenizer.from_rows(rows, tok.base_symbols)
    assert tok2.encode("newest lower") == tok.encode("newest lower")
    assert tok2.vocab_size == tok.vocab_size


# ------------------------------------------------------------- spark path


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the lowest newest widest"),
        (2, "lower and lower, newest of the new"),
        (3, "the the the widest"),
        (4, None),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_word_frequencies_matches_local(spark, corpus):
    wf = {r["word"]: r["freq"] for r in B.word_frequencies(corpus).collect()}
    # recompute locally over the same pretokenizer: must agree exactly
    # (this is the exactness of the corpus→frequency-table collapse,
    # and pins the Java-regex/Python-re agreement on PRETOKEN_RE)
    local: dict = {}
    for _i, t in [(1, "the lowest newest widest"),
                  (2, "lower and lower, newest of the new"),
                  (3, "the the the widest")]:
        for w in B.pretokenize(t):
            local[w] = local.get(w, 0) + 1
    assert wf == local


def test_train_and_encode_documents(spark, corpus):
    tok = B.train_bpe(corpus, vocab_size=80, min_freq=1)
    assert tok.vocab_size <= 80 or not tok.merges
    out = {r["doc_id"]: r for r in
           B.encode_documents(corpus, tok).collect()}
    assert out[4]["token_ids"] is None and out[4]["n_tokens"] is None
    for d in (1, 2, 3):
        ids = out[d]["token_ids"]
        assert ids is not None and out[d]["n_tokens"] == len(ids)
    # distributed encode == driver encode
    assert list(out[1]["token_ids"]) == tok.encode("the lowest newest widest")


def test_train_is_deterministic_across_partitioning(spark, corpus):
    t1 = B.train_bpe(corpus.repartition(1), vocab_size=60, min_freq=1)
    t2 = B.train_bpe(corpus.repartition(7), vocab_size=60, min_freq=1)
    assert t1.merges == t2.merges
    assert t1.base_symbols == t2.base_symbols


def test_encode_feeds_packing_schema(spark, corpus):
    """n_tokens is the contract chunk_documents/pack_sequences expect."""
    tok = B.train_bpe(corpus, vocab_size=64, min_freq=1)
    out = B.encode_documents(corpus, tok)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "token_ids", "n_tokens"]
    total = out.agg({"n_tokens": "sum"}).first()[0]
    assert total and total > 0


# ------------------------------------------------------------ properties

from hypothesis import given, settings, strategies as st


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_pretokenize_exact_partition_property(t):
    assert "".join(B.pretokenize(t)) == t


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    min_size=1, max_size=30), min_size=1, max_size=10))
def test_bpe_decode_inverts_encode_property(texts):
    """With a vocab trained on the corpus itself (min_freq=1, no cap),
    every character is a base symbol, so decode∘encode is exact."""
    freqs = {}
    for t in texts:
        for w in B.pretokenize(t):
            freqs[w] = freqs.get(w, 0) + 1
    merges = B._merge_loop(dict(freqs), 50)
    base = set()
    for w in freqs:
        if w:
            base.update(w[:-1])
            base.add(w[-1] + B.END_OF_WORD)
    tok = B.BpeTokenizer(merges, sorted(base))
    for t in texts:
        assert tok.decode(tok.encode(t)) == t


def test_tokenize_and_pack_end_to_end(spark, corpus):
    import warnings
    tok = B.train_bpe(corpus, vocab_size=70, min_freq=1)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # by=None single-sequence path
        out = B.tokenize_and_pack(
            corpus, tok, seq_len=8, overlap=0, pack_cap=16).collect()
    assert out  # null-text row dropped
    assert {r["doc_id"] for r in out} == {1, 2, 3}
    by_doc: dict = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).extend(r["input_ids"])
        assert len(r["input_ids"]) == r["n_chunk_tokens"] <= 8
        # bin arithmetic: bin = floor(bin_offset / cap)
        assert r["bin"] == r["bin_offset"] // 16
    # overlap=0: chunk concatenation reconstructs the full encoding
    texts = {1: "the lowest newest widest",
             2: "lower and lower, newest of the new",
             3: "the the the widest"}
    for d, ids in by_doc.items():
        assert ids == tok.encode(texts[d])


def test_tokenize_and_pack_overlap_validation(spark, corpus):
    tok = _toy_tokenizer()
    with pytest.raises(ValueError):
        B.tokenize_and_pack(corpus, tok, seq_len=8, overlap=8)
