"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure-Column implementations (whole-stage codegen, no UDFs); each has
an ANSI-SQL twin generated from the same spec (oracle side in
hbase_snapshot_spark/oracle.py textops generators) so the driver's
DuckDB gate can verify them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hbase_snapshot_spark.functions import memo_exprs, word_tokens

# language → discriminating stopwords (lowercase).  Shared with the SQL
# generator — keep lists and ORDER identical on both sides: ties in the
# score argmax break toward the earlier language.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "ist", "ein"],
    "es": ["el", "la", "que", "los", "una", "es"],
    "fr": ["le", "la", "les", "une", "est", "dans"],
}

#: BPE-ish token pattern: word pieces or single non-space symbols
TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r\f]"  # whitespace (explicit ASCII class - Java \\s and RE2 \\s disagree on \\x0B) is neither a token nor punctuation


def stopword_hits(text: Column, words: list[str]) -> Column:
    """how many of the given stopwords occur in the text (word-bounded
    by any ASCII whitespace: runs collapse to single spaces before the
    padded ' w ' containment test, so 'the\nend' counts 'the' — the
    raw form only matched stopwords space-delimited on BOTH sides,
    zeroing lang_id/quality on multi-line text)"""
    norm = F.trim(F.regexp_replace(F.lower(text), _WS, " "))
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    hits = [
        F.when(padded.contains(f" {w} "), F.lit(1)).otherwise(F.lit(0))
        for w in words
    ]
    out = hits[0]
    for h in hits[1:]:
        out = out + h
    return out


def lang_id(text: "Column | str") -> Column:
    """n-gram/stopword-heuristic language ID: argmax of per-language
    stopword hits; 'und' (undetermined) when no list scores > 0; ties
    break toward the earlier language in STOPWORDS order.

    Shape note (r10): the argmax is array_position(scores,
    array_max(scores)) — each per-language score expression appears
    ONCE in the array instead of ~5x in the earlier when-chain (gmax
    re-expanded per language).  Downstream plans that substitute an
    expensive ``text`` expression into every reference (the warc
    pipeline's strip chain) multiply by that count, and the when-chain
    form pushed the fused dedup stage past javac's 64 KB method limit
    into interpreted fallback.  array_position returns the FIRST
    maximum, which is exactly the earlier-language tie-break.

    r15 (guide §7.3 — don't regenerate giant expression trees): pass a
    column NAME to get the memoized form — the ~150-py4j-call tree is
    built once per (SparkContext, name) instead of per drain/stage.
    Column inputs (arbitrary expressions) always build fresh."""
    if isinstance(text, str):
        return memo_exprs("lang_id", (text,),
                          lambda: lang_id(F.col(text)))
    langs = list(STOPWORDS)
    arr = F.array(*[stopword_hits(text, STOPWORDS[lang]) for lang in langs])
    lang_arr = F.array(*[F.lit(lang) for lang in langs])
    mx = F.array_max(arr)
    return F.when(
        mx > 0,
        F.element_at(lang_arr, F.array_position(arr, mx).cast("int")),
    ).otherwise(F.lit("und"))


def token_count(text: Column) -> Column:
    """BPE-ish token count via regexp_extract_all (JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), F.lit(0)))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """per-document statistics used by quality scoring (the six stat
    Columns are memoized per (SparkContext, text_col) — name-keyed
    immutable expressions, guide §7.3)"""
    return df.withColumns(dict(memo_exprs(
        "text_stats", (text_col,),
        lambda: tuple(_text_stats_cols(text_col).items()))))


def _text_stats_cols(text_col: str) -> dict:
    t = F.col(text_col)
    toks = word_tokens(t)
    return ({
        "n_chars_c": F.length(t),
        "n_tokens": F.size(toks),
        "n_bpe_tokens": token_count(t),
        "avg_token_len": F.round(
            F.when(F.size(toks) > 0,
                   (F.length(F.regexp_replace(t, _WS, "")) / F.size(toks)))
            .otherwise(F.lit(0.0)), 4),
        "punct_ratio": F.round(
            F.when(F.length(t) > 0,
                   F.length(F.regexp_replace(t, _PUNCT_STRIP, "")) / F.length(t))
            .otherwise(F.lit(0.0)), 4),
        "stopword_hits_en": stopword_hits(t, STOPWORDS["en"]),
    })


# the sharing idiom now lives in functions.bind_once (other operator
# modules need it too); the private alias keeps this module's callers
# and docstring references stable
from hbase_snapshot_spark.functions import bind_once as _bind_once  # noqa: E402


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """composite quality score in [0,1]: length band + stopword presence
    + punctuation sanity — the standard cheap pretraining-corpus filter.

    The three component statistics are bound ONCE via _bind_once and
    the score arithmetic runs over the lambda variable: the when-chain
    form re-expanded n_tok/sw/punct (each referencing ``text``) per
    branch, which — with an expensive substituted text expression —
    pushed fused downstream stages past the 64 KB codegen limit.

    r15: the quality Column is memoized per (SparkContext, text_col) —
    it references ``text_col`` only by name, so the same immutable
    expression serves every DataFrame (guide §7.3; ~0.2s of driver
    py4j construction otherwise rebuilt per drain/stage)."""
    return df.withColumn(
        "quality",
        memo_exprs("quality_score", (text_col,),
                   lambda: _quality_expr(text_col)))


def _quality_expr(text_col: str) -> Column:
    t = F.col(text_col)
    toks = word_tokens(t)
    n_tok = F.size(toks)
    sw = stopword_hits(t, STOPWORDS["en"])
    punct = F.when(
        F.length(t) > 0,
        F.length(F.regexp_replace(t, _PUNCT_STRIP, "")) / F.length(t),
    ).otherwise(F.lit(0.0))

    def score(s):
        len_ok = F.when((s.n_tok >= 10) & (s.n_tok <= 1000),
                        F.lit(1.0)).otherwise(
            F.when(s.n_tok > 0, F.lit(0.5)).otherwise(F.lit(0.0)))
        sw_ok = F.when(s.sw >= 2, F.lit(1.0)).otherwise(
            s.sw.cast("double") / 2)
        punct_ok = F.when(s.punct <= 0.2, F.lit(1.0)).otherwise(
            F.greatest(F.lit(0.0), 1.0 - (s.punct - 0.2) * 2))
        # isNull: a NULL text makes every component NULL-propagate
        # EXCEPT punct (0.0 -> punct_ok 1.0), so the old n_tok == 0
        # gate fell through and scored empty documents 0.3333 —
        # passing a 'quality >= 0.25' corpus gate with no content
        return F.when(s.n_tok.isNull() | (s.n_tok == 0),
                      F.lit(0.0)).otherwise(
            F.round((len_ok + sw_ok + punct_ok) / 3, 4))

    comps = F.struct(n_tok.alias("n_tok"), sw.alias("sw"),
                     punct.alias("punct"))
    return _bind_once(comps, score)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """document fingerprint: md5 of the whitespace-normalized lowercase
    text (the rolling-hash/content-address device)"""
    # collapse FIRST, trim second: plain trim() strips only spaces, so
    # trim-first left a leading space on '\n'-led text and two copies
    # of one document fingerprinted differently
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), _WS, " "))
    return df.withColumn("fingerprint", F.md5(norm))


# HTML entity decode order matters: '&amp;' must decode LAST or
# double-encoded entities ('&amp;lt;') would decode twice.  Shared with
# the SQL twin — keep list and ORDER identical on both sides.
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
    ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"),
]

# ASCII whitespace class spelled explicitly: Java's \s includes \x0B
# (vertical tab) while RE2's does not — an explicit class keeps the
# Spark expression and the DuckDB oracle byte-identical.
_WS = "[ \\t\\n\\r\\f]+"

#: strip-class for punctuation ratios: alphanumerics + the SAME
#: explicit whitespace class (a bare \s would make Java and RE2
#: disagree on \x0B)
_PUNCT_STRIP = "[a-zA-Z0-9 \\t\\n\\r\\f]"


def strip_html(df: DataFrame, text_col: str = "text",
               out_col: str = "plain",
               preserve_newlines: bool = False) -> DataFrame:
    """HTML → plain text, the first stage of a web-corpus pipeline
    (C4/RefinedWeb-style): drop comments and script/style blocks
    (content included), strip remaining tags, decode the common named
    entities, collapse whitespace.  Pure-Column regexp_replace chain —
    whole-stage codegen, no Python in the hot path, scales like any
    projection.  Numeric character references beyond &#39; are left
    as-is (a full HTML5 entity table is a fidelity concern, not a
    pipeline-shape one).

    ``preserve_newlines`` turns BLOCK boundaries (<br>/<hr>, closing
    p/div/li/tr/h1-6/blockquote/section/article tags) into '\\n' and
    collapses whitespace without eating them — required when a
    line-level pass (line_dedup) follows: the default collapse folds
    every document into ONE line, silently degrading line dedup to
    whole-document dedup.  Default False keeps the original
    (oracle-pinned) single-line behavior."""
    c = F.col(text_col)
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    if preserve_newlines:
        c = F.regexp_replace(
            c,
            # \b[^>]*: br/hr commonly carry attributes (<br clear="all">)
            # — without it they'd fall through to the generic tag strip
            # as a SPACE and the two lines would merge
            r"(?i)<(?:br|hr)\b[^>]*>|"
            r"</(?:p|div|li|tr|h[1-6]|blockquote|section|article)\s*>",
            "\n")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, rep in HTML_ENTITIES:
        c = F.regexp_replace(c, ent, rep)
    if preserve_newlines:
        # collapse within lines, then collapse blank runs to one \n;
        # trim outer whitespace including newlines
        c = F.regexp_replace(c, "[ \\t\\f\\r]+", " ")
        c = F.regexp_replace(c, " ?\\n ?", "\n")
        c = F.regexp_replace(c, "\\n{2,}", "\n")
        c = F.regexp_replace(c, "^[ \\n]+|[ \\n]+$", "")
    else:
        c = F.trim(F.regexp_replace(c, _WS, " "))
    return df.withColumn(out_col, c)


def html_metadata(df: DataFrame, text_col: str = "text",
                  prefix: str = "meta_") -> DataFrame:
    """Document-level HTML metadata — the head fields a corpus keeps as
    provenance/quality columns before the body is reduced to plain
    text: ``<prefix>title``, ``<prefix>description`` (meta
    name=description), ``<prefix>canonical`` (link rel=canonical
    href), ``<prefix>lang`` (html lang attribute, lowercased).  Empty
    match → null (not '').  Pure-Column regexp_extract chain — a
    projection fused into the scan; attribute order inside the tags is
    accommodated for the common forms (name before content / rel
    before href and the reverse)."""
    c = F.col(text_col)

    def first_nonempty(*pats):
        col = None
        for p in pats:
            e = F.regexp_extract(c, p, 1)
            col = e if col is None else F.when(col != "", col).otherwise(e)
        return F.when(col != "", col)

    # Captured attribute VALUES use one alternate per quote type
    # (content="([^"]*)" | content='([^']*)') rather than the class
    # ['"]([^'"]*)['"]: the class form both truncates a double-quoted
    # value at an embedded apostrophe (content="John's site" -> "John")
    # and accepts mismatched open/close quotes.  \s* cannot skip a
    # quote char, so the wrong-quote alternate never matches inside the
    # other form's value.  Fixed-literal attribute matches (the word
    # 'description'/'canonical' itself) keep the class — no capture.
    def quoted(attr):
        return [attr + '\\s*=\\s*"([^"]*)"', attr + "\\s*=\\s*'([^']*)'"]

    title = first_nonempty(r"(?is)<title[^>]*>(.*?)</title\s*>")
    desc = first_nonempty(*(
        [r"(?is)<meta\b[^>]*\bname\s*=\s*['\"]description['\"][^>]*\b" + q
         for q in quoted("content")]
        + [r"(?is)<meta\b[^>]*\b" + q + r"[^>]*\bname\s*=\s*['\"]description['\"]"
           for q in quoted("content")]
    ))
    canon = first_nonempty(*(
        [r"(?is)<link\b[^>]*\brel\s*=\s*['\"]canonical['\"][^>]*\b" + q
         for q in quoted("href")]
        + [r"(?is)<link\b[^>]*\b" + q + r"[^>]*\brel\s*=\s*['\"]canonical['\"]"
           for q in quoted("href")]
    ))
    lang = first_nonempty(
        *[r"(?is)<html\b[^>]*\b" + q for q in quoted("lang")])
    return (
        df.withColumn(prefix + "title",
                      F.trim(F.regexp_replace(title, _WS, " ")))
        .withColumn(prefix + "description", desc)
        .withColumn(prefix + "canonical", canon)
        .withColumn(prefix + "lang", F.lower(lang))
    )


#: jusText-style English function words (the "stopword density"
#: feature's word list — a block of real prose sits well above 0.30,
#: navigation/boilerplate far below).  Parameterizable per language.
JUSTEXT_STOPWORDS_EN = [
    "the", "of", "and", "a", "to", "in", "is", "it", "you", "that",
    "he", "was", "for", "on", "are", "as", "with", "his", "they", "i",
    "at", "be", "this", "have", "from", "or", "one", "had", "by",
    "but", "not", "what", "all", "were", "we", "when", "your", "can",
    "said", "there", "an", "each", "which", "she", "do", "how",
    "their", "if", "will",
]

#: block-level boundary tags (opening or closing) + void separators.
#: ONE leading (?i) — Java/RE2 would also accept a mid-pattern flag,
#: but Python re (the differential-test reference) requires
#: start-anchored flags, and the leading form means the same thing in
#: all three engines.
_BLOCK_SPLIT_RE = (
    r"(?i)(?:</?(?:p|div|td|th|tr|table|thead|tbody|ul|ol|li|h[1-6]|"
    r"blockquote|section|article|header|footer|nav|aside|main|form|"
    r"fieldset|figure|figcaption|dl|dt|dd|pre|title)\b[^>]*>"
    r"|<(?:br|hr)\b[^>]*>)"
)


def extract_main_content(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "content",
    stopwords: "list[str] | None" = None,
    max_link_density: float = 0.2,
    length_low: int = 70,
    length_high: int = 200,
    stopwords_low: float = 0.30,
    stopwords_high: float = 0.32,
) -> DataFrame:
    """Main-content extraction from HTML — the block-level boilerplate
    remover between raw HTML and the quality gates (jusText, Pomikálek
    2011, re-stated from the public thesis; the same role trafilatura/
    readability play in Common-Crawl pipelines).  strip_html keeps
    EVERYTHING (nav, cookie banners, footers); this classifies each
    block-level segment by the paper's context-free features — link
    density (anchor chars / chars), length, and stopword density —
    then resolves the undecided (short / near-good) blocks by the
    paper's CONTEXT rule: an undecided block survives iff its nearest
    DECIDED neighbor on either side is good (document edges count as
    bad), so a run of short paragraphs between two good ones survives
    whole while the same run inside boilerplate drops whole:

    * link_density > ``max_link_density``       → bad (nav/footer)
    * length < ``length_low``                   → undecided (short)
    * stop density ≥ high and len > length_high → good (prose)
    * stop density ≥ low                        → undecided (near-good)
    * else                                      → bad (code/menus)

    Adds ``out_col`` (kept blocks joined by newline), ``n_blocks``
    (non-empty), ``n_good`` (kept after promotion).

    Plan shape: pure per-row Catalyst array expressions (split +
    transform/filter/zip) — ZERO shuffles, map-only at any scale, no
    Python.  Shared subexpressions (the per-block feature structs, the
    class array read three times by the promotion pass) are bound as
    LAMBDA VARIABLES via the winnow _bind idiom, so no optimizer
    rewrite can re-evaluate the block features per neighbor probe.
    Anchors spanning a block boundary contribute to neither side (the
    split cuts them) — a fidelity trade the block model accepts."""
    stop = stopwords if stopwords is not None else JUSTEXT_STOPWORDS_EN
    stop_arr = F.array(*[F.lit(w) for w in stop])

    _bind = _bind_once   # the module-level sharing idiom, not a copy

    c = F.col(text_col)
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    blocks = F.split(c, _BLOCK_SPLIT_RE)

    def features(b):
        link_len = F.aggregate(
            F.transform(
                F.regexp_extract_all(
                    b, F.lit("(?is)<a\\b[^>]*>(.*?)</a[ \\t\\n\\r\\f]*>"), F.lit(1)),
                lambda a: F.length(F.trim(
                    F.regexp_replace(a, r"<[^>]+>", " ")))),
            F.lit(0), lambda acc, x: acc + x)
        # entities decode AFTER the tag strip (strip_html's order: a
        # decoded &lt; must never fabricate a tag) and BEFORE the ws
        # collapse; link lengths are measured on the raw tag-stripped
        # anchor text (entity width is noise at the 0.2 threshold)
        plain = F.regexp_replace(b, r"<[^>]+>", " ")
        for ent, rep in HTML_ENTITIES:
            plain = F.regexp_replace(plain, ent, rep)
        plain = F.trim(F.regexp_replace(plain, _WS, " "))

        def scored(p):
            n = F.length(p)
            words = F.filter(F.split(F.lower(p), " "), lambda w: w != "")
            wc = F.size(words)
            hits = F.size(F.filter(
                words,
                lambda w: F.array_contains(
                    stop_arr,
                    F.regexp_replace(w, r"^[^a-z0-9']+|[^a-z0-9']+$", "")),
            ))
            # greatest() guard even under the when(): CSE can hoist a
            # shared division above a short-circuit (ANSI div-by-zero,
            # see gopher_rules)
            stop_frac = F.when(
                wc > 0, hits / F.greatest(wc, F.lit(1))
            ).otherwise(F.lit(0.0))
            link_density = link_len / F.greatest(n, F.lit(1))
            cls = (
                F.when(n == 0, F.lit(0))
                .when(link_density > max_link_density, F.lit(0))
                .when(n < length_low, F.lit(1))
                .when((stop_frac >= stopwords_high)
                      & (n > length_high), F.lit(2))
                .when(stop_frac >= stopwords_low, F.lit(1))
                .otherwise(F.lit(0))
            )
            return F.struct(p.alias("plain"), cls.alias("cls"))

        return _bind(plain, scored)

    def assemble(scored):
        classes = F.transform(scored, lambda s: s["cls"])

        def promote(cl):
            idx = F.sequence(F.lit(0), F.size(scored) - 1)
            n = F.size(cl)

            def final_cls(i):
                # jusText context resolution: an undecided (short /
                # near-good) block takes GOOD iff its NEAREST DECIDED
                # neighbor on either side is good (document edges count
                # as bad) — runs of undecided blocks between two good
                # paragraphs all survive, runs inside boilerplate all
                # drop.  O(blocks²) per document in cheap int
                # comparisons; block counts are tens-to-hundreds.
                cur = F.get(cl, i)
                left = F.filter(F.slice(cl, 1, i), lambda c: c != 1)
                right = F.filter(
                    F.slice(cl, i + 2, n - i - 1), lambda c: c != 1)
                left_dec = F.when(
                    F.size(left) > 0, F.element_at(left, F.size(left)))
                right_dec = F.when(
                    F.size(right) > 0, F.element_at(right, F.lit(1)))
                return F.when(cur == 2, F.lit(2)).when(
                    (cur == 1) & (left_dec.eqNullSafe(2)
                                  | right_dec.eqNullSafe(2)),
                    F.lit(2)).otherwise(F.lit(0))

            kept = F.filter(
                F.transform(
                    idx,
                    lambda i: F.when(final_cls(i) == 2,
                                     F.get(scored, i)["plain"])),
                lambda x: x.isNotNull())
            return F.struct(
                F.array_join(kept, "\n").alias("content"),
                F.size(scored).alias("n_blocks"),
                F.size(kept).alias("n_good"),
            )

        return _bind(classes, promote)

    def with_empty_guard(scored):
        return F.when(
            F.size(scored) > 0, assemble(scored)
        ).otherwise(F.struct(
            F.lit("").alias("content"),
            F.lit(0).alias("n_blocks"),
            F.lit(0).alias("n_good")))

    # empty blocks (whitespace between adjacent boundary tags) are
    # dropped BEFORE classification so promotion adjacency means the
    # nearest non-empty block — an empty gap must not veto a
    # heading-next-to-prose promotion
    res = _bind(
        F.filter(F.transform(blocks, features),
                 lambda s: s["plain"] != ""),
        with_empty_guard)
    # null html → null outputs (strip_html's convention)
    res = F.when(F.col(text_col).isNotNull(), res)
    return (
        df.withColumn("_emc", res)
        .withColumn(out_col, F.col("_emc.content"))
        .withColumn("n_blocks", F.col("_emc.n_blocks"))
        .withColumn("n_good", F.col("_emc.n_good"))
        .drop("_emc")
    )


# ------------------------------------------------------------------ tf-idf

def tfidf_top_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF
    (score = tf * ln((N+1)/(df+1)), rounded to 6; ties by term asc) —
    the corpus-statistics primitive for quality filtering and topic
    mixing in training-data pipelines (beyond-reference; the reference
    has no corpus analytics).

    Plan shape (single pass, three exchanges): explode → hash agg on
    (doc, term) → doc-frequency as a count-window over term (NOT a
    self-join — a join back to a tf-derived aggregate would recompute
    the whole explode subtree for the second branch) → top-k window on
    doc.  N is a driver-side scalar.  Empty documents are excluded.
    """
    from pyspark.sql import Window

    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), _WS, " "))
    toks = df.filter(norm != "").select(
        F.col(id_col),
        F.explode(F.split(norm, " ")).alias("term"),
    )
    n_docs = df.filter(norm != "").count()
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).select(
        F.col(id_col),
        "term",
        F.round(
            F.col("tf") * F.log((F.lit(n_docs) + 1) / (F.col("df") + 1)), 6
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "score", "rank")
    )


#: Gopher rule 7's required stop words (Rae et al. 2021, Table A1).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")


def gopher_rules(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021, "Scaling
    Language Models", Table A1) — the standard web-corpus document
    filter.  Eight rules, each a pure-Catalyst boolean; returns per-rule
    flags, ``gopher_mask`` (bit i = rule i passed, pinning every rule
    independently in one number) and ``gopher_pass`` (all eight).

    Rules (word = explicit-ASCII-whitespace token; empty docs fail all):
      0 word count in [50, 100000]
      1 mean word length in [3, 10]
      2 symbol-to-word ratio ('#' or '...') <= 0.1
      3 <= 10% of lines start with a bullet ('-', '*', '•')
      4 <= 30% of lines end with an ellipsis
      5 >= 80% of words contain an alphabetic character
      6 >= 2 distinct required stop words present
      7 duplicate-line fraction <= 0.30

    No UDFs, no shuffle — one codegen stage over the corpus scan."""
    t = F.col(text_col)
    ws = "[ \t\n\r\f]+"
    words = F.filter(F.split(t, ws), lambda x: x != "")
    n_words = F.size(words)
    # division-safe denominators: every ratio rule is already gated by
    # ``nonempty`` (or n_lines == 0), so substituting 1 for an empty
    # denominator never changes a rule's outcome — but it keeps ANSI
    # mode's DIVIDE_BY_ZERO out even when common-subexpression
    # elimination hoists the division above the boolean guard
    nwd = F.greatest(n_words, F.lit(1))
    # sum of word lengths == non-whitespace char count
    n_word_chars = F.length(F.regexp_replace(t, ws, ""))
    mean_wl = n_word_chars / nwd
    symbols = (F.regexp_count(t, F.lit("#"))
               + F.regexp_count(t, F.lit(r"\.\.\.")))
    lines = F.filter(F.split(t, "\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    nld = F.greatest(n_lines, F.lit(1))
    bullet = F.size(F.filter(
        lines, lambda x: x.rlike(r"^[ \t]*[-*•]")))
    ellipsis = F.size(F.filter(lines, lambda x: x.rlike(r"\.\.\.[ \t]*$")))
    alpha = F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]")))
    sw_present = F.size(F.array_intersect(
        F.array_distinct(F.transform(words, F.lower)),
        F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])))
    dup_lines = (n_lines - F.size(F.array_distinct(lines))) / nld

    nonempty = n_words > 0
    rules = [
        nonempty & (n_words >= 50) & (n_words <= 100000),
        nonempty & (mean_wl >= 3.0) & (mean_wl <= 10.0),
        nonempty & (symbols / nwd <= 0.1),
        nonempty & ((n_lines == 0) | (bullet / nld <= 0.1)),
        nonempty & ((n_lines == 0) | (ellipsis / nld <= 0.3)),
        nonempty & (alpha / nwd >= 0.8),
        nonempty & (sw_present >= 2),
        nonempty & (dup_lines <= 0.3),
    ]
    mask = None
    for i, r in enumerate(rules):
        bit = F.when(r, F.lit(1 << i)).otherwise(F.lit(0))
        mask = bit if mask is None else mask + bit
    out = df.select(
        F.col(id_col),
        *[r.alias(f"rule{i}") for i, r in enumerate(rules)],
        mask.cast("long").alias("gopher_mask"),
    )
    return out.withColumn(
        "gopher_pass", F.col("gopher_mask") == (1 << len(rules)) - 1)


def bm25_topk(
    df: DataFrame,
    queries: dict[str, str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-k retrieval over the corpus — the lexical-search
    primitive of a training-data pipeline (targeted corpus slicing,
    eval-set mining, quality-by-relevance).  ``queries`` maps query_id →
    query string; returns (query_id, doc_id, score, rank) with
    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  (Robertson–Spärck Jones
    as used by Lucene — strictly positive), round 6, ties doc asc.

    Plan shape (the inverted-index seek): the tf branch pre-filters
    whole documents with a coarse ``contains(any query term)`` scan
    predicate — verified to evaluate AT the file scan (a DataFilter) —
    so the explode and the (doc, term) aggregation run only over
    candidate documents; the exact term isin filter sits directly above
    the explode and prunes to the query-term postings.  Doc lengths are
    one separate count-agg over the corpus (inherent — avgdl needs all
    tokens); df is a count-window over term on the filtered tf
    (query-term df equals corpus df).  N and avgdl are driver-side
    scalars, like tfidf's N.
    """
    from functools import reduce

    from pyspark.sql import Window

    from pyspark.sql import types as T

    empty_schema = T.StructType([
        T.StructField("query_id", T.StringType()),
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("score", T.DoubleType()),
        T.StructField("rank", T.IntegerType()),
    ])
    spark = df.sparkSession

    qterms = sorted({
        (qid, t) for qid, qs in queries.items()
        for t in qs.lower().strip().split()
    })
    all_terms = sorted({t for _, t in qterms})
    if not qterms:
        return spark.createDataFrame([], empty_schema)

    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), _WS, " "))
    docs = df.filter(norm != "")
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(norm, " ")).alias("term"),
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_docs, avgdl = docs.count(), dl.agg(F.avg("dl")).first()[0]
    if n_docs == 0:
        return spark.createDataFrame([], empty_schema)

    qdf = spark.createDataFrame(qterms, ["query_id", "term"])

    candidate = reduce(
        lambda a, b: a | b,
        [F.lower(F.col(text_col)).contains(t) for t in all_terms],
    )
    tf = (
        docs.filter(candidate)
        .select(
            F.col(id_col),
            F.explode(F.split(norm, " ")).alias("term"),
        )
        .filter(F.col("term").isin(all_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored_terms = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).join(dl, id_col)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
    )
    per_query = (
        scored_terms.withColumn("c", contrib)
        .select(id_col, "term", "c")
        .join(F.broadcast(qdf), "term")
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("c"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc())
    return (
        per_query.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


# ---------------------------------------------------------------- scrubbing

#: RE2-compatible patterns (work identically in Java regex and DuckDB)
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PATTERN = "https?://[^ \\t\\n\\r\\f]+"  # explicit negated class: Java [^\\s] stops at \\x0B, RE2 does not
# phone: requires explicit separators so bare digit runs (ids, years,
# prices) never match — the over-match failure mode of corpus scrubs
PHONE_PATTERN = r"(\+[0-9]{1,2}[ -])?\(?[0-9]{3}\)?[ -][0-9]{3}[ -][0-9]{4}"
IPV4_PATTERN = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# payment-card candidates: 13-19 digits with optional single space or
# hyphen separators (ISO/IEC 7812 PAN lengths)
CARD_PATTERN = r"\b[0-9](?:[ -]?[0-9]){12,18}\b"


def luhn_valid(cand: Column) -> Column:
    """Luhn mod-10 check (ISO/IEC 7812-1) over a candidate with
    optional space/hyphen separators — pure Catalyst array math: from
    the RIGHTMOST digit, double every second one, subtract 9 when the
    double exceeds 9, sum ≡ 0 (mod 10)."""
    rev = F.reverse(F.regexp_replace(cand, "[ -]", ""))
    digits = F.filter(F.split(rev, ""), lambda c: c != "")
    vals = F.transform(
        digits,
        lambda c, i: F.when(
            i % 2 == 1,
            F.when(c.cast("int") * 2 > 9, c.cast("int") * 2 - 9)
            .otherwise(c.cast("int") * 2),
        ).otherwise(c.cast("int")),
    )
    total = F.aggregate(vals, F.lit(0), lambda acc, x: acc + x)
    return total % 10 == 0


def scrub_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails, URLs, phone numbers, IPv4 addresses, and
    payment-card numbers (the standard PII/noise scrub a web-scale
    training corpus applies), reporting per-doc counts and the cleaned
    length.  Pure-Column regexp + array ops — whole-stage codegen, and
    the patterns are RE2-compatible so the DuckDB oracle runs them
    verbatim.

    Replacement order is email → URL → IP → phone → card and counts
    are taken on the ORIGINAL text, so an IP inside a URL counts as
    both but is redacted once (as part of the <URL>); keep both
    engines in this exact order.  Card REDACTION is deliberately
    conservative: every 13-19-digit run is replaced (a long digit run
    carries no training value and might be a mistyped PAN), while
    ``n_cards`` counts only candidates passing the Luhn mod-10 check —
    the actual-card signal a privacy audit reads."""
    text = F.col(text_col)
    cleaned = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>"),
                    URL_PATTERN, "<URL>"),
                IPV4_PATTERN, "<IP>"),
            PHONE_PATTERN, "<PHONE>"),
        CARD_PATTERN, "<CARD>",
    )

    def _n(pattern):
        return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))

    n_cards = F.size(F.filter(
        F.regexp_extract_all(text, F.lit(CARD_PATTERN), F.lit(0)),
        luhn_valid))

    return df.select(
        F.col(id_col),
        _n(EMAIL_PATTERN).alias("n_emails"),
        _n(URL_PATTERN).alias("n_urls"),
        _n(PHONE_PATTERN).alias("n_phones"),
        _n(IPV4_PATTERN).alias("n_ips"),
        n_cards.alias("n_cards"),
        F.length(cleaned).alias("clean_len"),
        cleaned.alias("clean_text"),
    )


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    ngram: int = 2,
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "Scaling Language Models", repetition filters) — the signals a
    web-scale corpus uses to drop boilerplate/spam documents:

    - ``dup_line_frac``: fraction of lines that are repeats of an
      earlier line,
    - ``top_ngram_frac``: fraction of word n-grams accounted for by the
      single most frequent n-gram.

    Pure array-Column ops (split / transform / filter / array_max) —
    whole-stage codegen, no shuffle, no UDF.  The per-row n-gram
    frequency scan is O(distinct-grams x grams) inside codegen, bounded
    by document length.
    """
    text = F.col(text_col)
    # blank lines carry structure, not content: counting them as
    # "duplicates" flagged every double-spaced document (gopher_rules
    # rule 7 filters trimmed-empty lines the same way)
    lines = F.filter(F.split(text, "\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        F.round((n_lines - F.size(F.array_distinct(lines))) / n_lines, 4),
    ).otherwise(F.lit(0.0))

    grams = F.col("_grams")
    top = F.array_max(
        F.transform(
            F.array_distinct(grams),
            lambda g: F.size(F.filter(grams, lambda x: x == g)),
        )
    )
    n_grams = F.size(grams)
    top_frac = F.when(n_grams > 0, F.round(top / n_grams, 4)).otherwise(
        F.lit(0.0)
    )
    from hbase_snapshot_spark.functions import word_ngrams

    return (
        df.withColumn("_grams", word_ngrams(word_tokens(text), ngram))
        .select(
            F.col(id_col),
            dup_line_frac.alias("dup_line_frac"),
            top_frac.alias("top_ngram_frac"),
        )
    )


# ---------------------------------------------------- encoding repair

#: cp1252 codepoints for bytes 0x80-0x9F (the 27 mapped positions) and
#: the bytes they came from — the inverse of a UTF-8-bytes-read-as-
#: cp1252 misdecode.  Unmapped bytes (81 8D 8F 90 9D) pass through as
#: C1 controls, which encode('ISO-8859-1') already inverts.
_CP1252_CHARS = "".join(map(chr, [
    0x20AC, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021, 0x02C6,
    0x2030, 0x0160, 0x2039, 0x0152, 0x017D, 0x2018, 0x2019, 0x201C,
    0x201D, 0x2022, 0x2013, 0x2014, 0x02DC, 0x2122, 0x0161, 0x203A,
    0x0153, 0x017E, 0x0178]))
_CP1252_BYTES = "".join(map(chr, [
    0x80, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x8B,
    0x8C, 0x8E, 0x91, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99,
    0x9A, 0x9B, 0x9C, 0x9E, 0x9F]))

# a mojibake'd multi-byte UTF-8 sequence, as seen through cp1252/latin1:
# a lead char (U+00C2-U+00DF / U+00E0-U+00EF / U+00F0-U+00F4) followed
# by continuation chars (bytes 0x80-0xBF → the cp1252 punctuation or
# U+0080-U+00BF)
_CONT = _CP1252_CHARS + "".join(map(chr, range(0x80, 0xC0)))
_MOJI_RE = (
    "[Â-ß][{c}]|[à-ï][{c}]{{2}}|"
    "[ð-ô][{c}]{{3}}"
).format(c=_CONT)
#: chars that cannot have come from a single-byte misdecode at all
_NON_LATIN1_RE = "[^\\u0000-\\u00ff{0}]".format(_CP1252_CHARS)


def fix_mojibake(text: Column) -> Column:
    """Repair UTF-8-read-as-cp1252/latin-1 mojibake ("cafÃ©" → "café")
    in PURE Catalyst — the ftfy-style encoding-repair pass every
    crawl-derived corpus needs, with zero Python in the plan:

    1. map the 27 cp1252 punctuation chars back to bytes 0x80-0x9F
       (``translate``), then ``encode('ISO-8859-1')`` — together the
       exact inverse of the original misdecode;
    2. apply only when the text (a) contains a mojibake-shaped
       lead+continuation sequence, (b) contains ONLY chars a one-byte
       misdecode can produce, and (c) re-encodes to valid UTF-8
       (``is_valid_utf8`` guards the strict Spark 4 ``decode``).

    Unfixable or already-clean text passes through unchanged —
    including truncated artifacts like a trailing "â€" whose original
    byte (0x9D) was dropped by the misdecoder, which no longer form
    valid UTF-8 and fail guard (c).  Apply iteratively for
    double-encoded text (each pass removes one layer).
    """
    redone = F.encode(
        F.translate(text, _CP1252_CHARS, _CP1252_BYTES), "ISO-8859-1")
    fixable = (
        text.rlike(_MOJI_RE)
        & ~text.rlike(_NON_LATIN1_RE)
        & F.is_valid_utf8(redone)
    )
    return F.when(fixable, F.decode(redone, "UTF-8")).otherwise(text)


def clean_text(
    df: DataFrame,
    text_col: str = "text",
    repair_encoding: bool = True,
    strip_controls: bool = True,
    collapse_whitespace: bool = False,
) -> DataFrame:
    """Standard corpus text-normalization pass, all pure Catalyst:
    mojibake repair (see ``fix_mojibake``), C0/C1 control-char removal
    (keeping \\t \\n \\r), and optional whitespace-run collapse (off by
    default — it destroys meaningful layout in code/markup)."""
    c: Column = F.col(text_col)
    if repair_encoding:
        c = fix_mojibake(c)
    if strip_controls:
        c = F.regexp_replace(
            c, "[\\u0000-\\u0008\\u000b\\u000c\\u000e-\\u001f"
               "\\u007f-\\u009f]", "")
    if collapse_whitespace:
        c = F.regexp_replace(c, "[ \\t]{2,}", " ")
    return df.withColumn(text_col, c)


def normalize_unicode(
    df: DataFrame, text_col: str = "text", form: str = "NFKC",
) -> DataFrame:
    """Unicode normalization (UAX #15) of a text column — the
    canonicalization step tokenizer training assumes (SentencePiece
    defaults to NFKC): full-width forms narrow, compatibility ligatures
    expand, combining sequences compose.  There is no Catalyst NFKC
    builtin, so this is the one text op that runs as an Arrow-batched
    ``mapInPandas`` over Python's ``unicodedata`` (the reference
    implementation of the property itself — no differential gap to
    close); everything stays shuffle-free and batch-shaped.  Preserves
    the input schema, replacing ``text_col`` in place."""
    import unicodedata

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"form={form!r}: not a UAX #15 form")
    schema = df.schema
    cols = df.columns

    def run(batches):
        import pandas as pd

        for pdf in batches:
            pdf[text_col] = pd.Series(
                [unicodedata.normalize(form, t) if t is not None else None
                 for t in pdf[text_col]],
                index=pdf.index, dtype=object)
            yield pdf[cols]

    return df.mapInPandas(run, schema=schema)


# ------------------------------------------------------- winnowing

def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every character k-gram of
    the normalized text, slide a ``window``-gram window, and select
    each window's minimum hash; the DISTINCT selected values are the
    document's fingerprint set.  Guarantees every shared substring of
    length ≥ k + window - 1 contributes at least one common selected
    hash — the local, position-independent near-dup signal.

    Selecting hash VALUES (not positions) makes the in-window
    tie-break irrelevant, so a plain rolling ``min`` suffices — and the
    whole operator compiles to per-row Catalyst array expressions
    (``transform``/``slice``/``array_min``): ZERO shuffles, map-only at
    any scale, never an explode of corpus positions.

    Adds ``winnow`` (sorted distinct selected hashes, int64 from the
    first 8 md5 hex chars — engine-portable), ``n_winnow``, and
    ``winnow_digest`` (md5 over the joined sorted set — a compact
    equality key for exact fingerprint-set comparison).

    The k-gram hash array is bound as a LAMBDA VARIABLE before the
    window pass reads it.  This is load-bearing, not style: if the
    array EXPRESSION is inlined into the window lambda, Catalyst
    re-evaluates the whole array (hundreds of md5 calls) once PER
    WINDOW ELEMENT — O(n²) md5s per row, measured 700+ s at sf0.01 vs
    ~2 s shared.  Plain staged withColumns are NOT enough: a consumer
    that references ``winnow`` once (e.g. winnow_pairs' explode) lets
    CollapseProject fold the stages back into one projection and the
    quadratic blowup returns.  A lambda variable is evaluated once per
    element by construction — no optimizer rewrite can duplicate it."""
    def _seq(n):  # sequence(1, n), EMPTY when n < 1 (Spark's
        # sequence(1, 0) would count DOWN and yield [1, 0])
        return F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>"))

    _bind = _bind_once   # the module-level sharing idiom, not a copy

    # Unicode letter/digit classes, not [a-z0-9]: an ASCII-only
    # normalization would strip EVERY character of a non-Latin
    # document, giving all Chinese/Russian/Arabic docs the same
    # empty fingerprint set (silently blind near-dup signal)
    nrm_expr = F.regexp_replace(
        F.lower(F.col(text_col)), r"[^\p{L}\p{N}]", "")

    def _hashes(nrm):
        return F.transform(
            _seq(F.length(nrm) - F.lit(k - 1)),
            lambda p: F.conv(
                F.substring(F.md5(nrm.substr(p, F.lit(k))), 1, 8),
                16, 10,
            ).cast("long"),
        )

    def _mins(hashes):
        return F.transform(
            _seq(F.size(hashes) - F.lit(window - 1)),
            lambda i: F.array_min(F.slice(hashes, i, window)),
        )

    winnow = _bind(
        nrm_expr,
        lambda nrm: _bind(
            _hashes(nrm),
            lambda hs: F.array_sort(F.array_distinct(_mins(hs)))),
    )
    out = df.withColumn("winnow", winnow)
    return (
        out.withColumn("n_winnow", F.size("winnow").cast("bigint"))
        .withColumn(
            "winnow_digest",
            F.md5(F.array_join(
                F.transform(F.col("winnow"), lambda x: x.cast("string")),
                ",")))
    )


# --------------------------------------------------- URL/domain filter

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


#: tracking query parameters every corpus canonicalizer strips.
#: Deliberately NOT 'ref': unlike utm_*/gclid/fbclid it is frequently
#: load-bearing (?ref=<branch> on code hosts, ?ref=<page> pagination),
#: and pre-dedup canonicalization that strips it merges genuinely
#: distinct URLs and silently drops documents as duplicates.  Corpora
#: where 'ref' IS tracking noise pass their own pattern via
#: ``canonicalize_url(..., tracking_params_re=...)``.
TRACKING_PARAMS_RE = r"(?:utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*"
_SCHEME_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def canonicalize_url(
    url: Column | str,
    tracking_params_re: str = TRACKING_PARAMS_RE,
) -> Column:
    """URL canonicalization for corpus-level URL dedup (the
    RefinedWeb/CCNet-style pre-dedup normalization): lowercase the
    scheme+authority (path/query stay case-sensitive per RFC 3986),
    drop the fragment, drop default ports (http:80 / https:443), strip
    tracking parameters (``tracking_params_re``, default utm_*/gclid/
    fbclid — NOT 'ref', see TRACKING_PARAMS_RE) with separator
    tidy-up, and give an empty path a '/'.  Pure-Column regexp chain —
    and deliberately ZERO capture-group replacements, because Java
    spells backrefs '$1' while RE2/DuckDB spell them '\\\\1' and a
    shared-pattern oracle must run the same strings verbatim.
    Non-URL strings (no scheme://authority) pass through unchanged."""
    u = F.col(url) if isinstance(url, str) else url
    sh = F.lower(F.regexp_extract(u, _SCHEME_HOST_RE, 0))
    rest = F.regexp_replace(u, _SCHEME_HOST_RE, "")
    # fragment first: nothing after '#' survives
    rest = F.regexp_replace(rest, r"(?s)#.*$", "")
    # tracking params live in the QUERY: '&utm_x=...' is legal inside
    # a path segment ('/p&utm_a=1/page2'), and stripping it there
    # deleted real path bytes — split at the first '?' and scope the
    # three strips to the query part.  Non-leading params drop with
    # their '&'; a leading one hands '?' to the next param; a lone one
    # drops with its '?'.
    path = F.regexp_extract(rest, r"^[^?]*", 0)
    qs = F.regexp_replace(rest, r"^[^?]*", "")
    qs = F.regexp_replace(qs, "&" + tracking_params_re, "")
    qs = F.regexp_replace(qs, r"\?" + tracking_params_re + "&", "?")
    qs = F.regexp_replace(qs, r"\?" + tracking_params_re + "$", "")
    rest = F.concat(path, qs)
    sh = F.when(
        sh.startswith("http://"), F.regexp_replace(sh, ":80$", "")
    ).when(
        sh.startswith("https://"), F.regexp_replace(sh, ":443$", "")
    ).otherwise(sh)
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.when(sh == "", u).otherwise(F.concat(sh, rest))


def url_host(url: Column | str) -> Column:
    """Registered host of a hierarchical URL, lowercased: scheme '://'
    [userinfo '@'] HOST [':' port] — empty string when the value does
    not parse as a URL (regexp_extract's no-match result, kept as-is so
    the column stays non-null for downstream array ops).  Trailing dots
    are stripped: 'example.com.' is the root-qualified FQDN spelling of
    'example.com' (browsers and HTTP clients treat them as the same
    host) — without this a blocklist is trivially evaded by appending a
    dot."""
    u = F.col(url) if isinstance(url, str) else url
    return F.regexp_replace(
        F.lower(F.regexp_extract(u, _HOST_RE, 1)), r"\.+$", "")


def domain_filter(
    df: DataFrame,
    url_col: str = "url",
    blocklist: "list[str] | DataFrame" = (),
    include_subdomains: bool = True,
    out_col: str = "blocked",
) -> DataFrame:
    """Domain-blocklist filtering (the URL-curation gate every web
    corpus runs before content filters — CCNet / RefinedWeb both gate
    on a domain blocklist first, it is the cheapest signal available).

    ``blocklist`` entries are registrable domains ('example.com');
    with ``include_subdomains`` a document is blocked when ANY dot
    suffix of its URL host equals a blocklist entry, so
    'a.b.example.com' matches 'example.com' but 'notexample.com' does
    NOT (suffix match is on whole labels, never substrings).

    Adds ``out_col`` (boolean).  Two shapes, both scale-safe:

    - Python list/tuple blocklist → a literal array and
      ``arrays_overlap`` against the host's label-suffix array: pure
      Catalyst, map-only, zero shuffles at any corpus size.
    - DataFrame blocklist (column ``domain``) → the decision is made at
      HOST level (the natural join key — never a synthetic row id):
      distinct hosts, explode their ≤ ~6 suffixes, broadcast left-semi
      against the blocklist, then broadcast the (small) blocked-host
      set back onto the corpus.  The corpus side is never exploded and
      never shuffled; the distinct runs over hosts, which dedup
      massively on any web corpus.  If the blocked-host set ever
      outgrew broadcast (a blocklist matching millions of distinct
      hosts), swap the final broadcast join for a plain hash join —
      the host key keeps that a one-line change.
    """
    def _suffixes(host: Column) -> Column:
        parts = F.split(host, r"\.")
        if include_subdomains:
            return F.transform(
                F.sequence(F.lit(1), F.size(parts)),
                lambda i: F.array_join(
                    F.slice(parts, i, F.size(parts)), "."),
            )
        return F.array(host)

    host = url_host(url_col)
    if isinstance(blocklist, DataFrame):
        bl = blocklist.select(F.lower(F.col("domain")).alias("__df_hit"))
        blocked_hosts = (
            df.select(host.alias("__df_host"))
            .where(F.length("__df_host") > 0).distinct()
            .select("__df_host",
                    F.explode(_suffixes(F.col("__df_host"))).alias("__df_s"))
            .join(F.broadcast(bl),
                  F.col("__df_s") == F.col("__df_hit"), "left_semi")
            .select("__df_host").distinct()
            .withColumn(out_col, F.lit(True))
        )
        return (
            df.join(F.broadcast(blocked_hosts),
                    host == F.col("__df_host"), "left")
            .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(False)))
            .drop("__df_host")
        )
    lits = F.array(*[F.lit(str(d).lower()) for d in blocklist]) \
        if blocklist else F.array().cast("array<string>")
    return df.withColumn(
        out_col,
        F.when(F.size(F.array_intersect(_suffixes(host), lits)) > 0,
               F.lit(True))
        .otherwise(F.lit(False)),
    )


# ----------------------------------------------------- corpus report

def corpus_report(
    df: DataFrame,
    group_cols: "list[str] | tuple[str, ...]" = ("source", "lang"),
    text_col: str = "text",
    distinct: "str | None" = None,
) -> DataFrame:
    """Corpus data-card statistics (the audit table a corpus release
    ships — Datasheets for Datasets, Gebru et al. 2021): per group AND
    rolled-up totals via CUBE — doc counts, token/char volumes, quality
    mean, exact length percentiles.

    One pass, one shuffle: the per-doc columns are pure projections
    fused into the scan, and the cube is a single aggregation with
    map-side partial combine.  Exact ``percentile`` (not approx) keeps
    the report deterministic; its cost is per GROUP, and a data card
    has a handful of groups regardless of corpus size.  NULL group
    values in the output are the rollup rows — ``gid`` (grouping_id)
    distinguishes a rollup from a genuine NULL group value.

    ``distinct`` (r9) adds a unique-document column ``n_unique``:

    * ``'exact'`` — COUNT(DISTINCT text) per cube group.  Exact, but
      the distinct agg shuffles the text once per cube level (Expand)
      — the verification-scale path, not the 100 TB one.
    * ``'sketch'`` — HLL(256) estimate (±~6.5%), the 100 TB data
      card: the corpus is hashed ONCE into per-(group, bucket)
      registers (map-side partial max — the shuffle carries at most
      groups×256 register rows, never the text), and every cube
      rollup level is computed by MERGING those registers (per-bucket
      max over the rolled-up groups), not by rescanning the corpus.
      Length percentiles switch to ``approx_percentile`` in this mode
      for the same reason: exact percentile buffers every value per
      group, and the grand-total rollup row would buffer the whole
      corpus's lengths in one aggregation state."""
    if distinct not in (None, "exact", "sketch"):
        raise ValueError(f"distinct={distinct!r}: "
                         "expected None, 'exact' or 'sketch'")
    group_cols = list(group_cols)
    t = F.col(text_col)
    per_doc = quality_score(df, text_col).select(
        *group_cols,
        # null text counts as 0 volume, not as null/-1: size(null) is
        # -1 under the legacy sizeOfNull behavior, which would SUBTRACT
        # from the audited token totals — a wrong data card, the one
        # table that must not lie
        F.coalesce(F.length(text_col), F.lit(0)).alias("_chars"),
        F.when(t.isNull(), F.lit(0))
        .otherwise(F.size(word_tokens(t))).alias("_tokens"),
        "quality",
        *([t.alias("_text")] if distinct == "exact" else []),
    )
    if distinct == "sketch":
        p50 = F.expr("approx_percentile(_chars, 0.5, 10000)")
        p90 = F.expr("approx_percentile(_chars, 0.9, 10000)")
    else:
        p50 = F.expr("percentile(_chars, 0.5)")
        p90 = F.expr("percentile(_chars, 0.9)")
    aggs = [
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tokens").cast("bigint").alias("n_tokens"),
        F.sum("_chars").cast("bigint").alias("n_chars"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        p50.cast("bigint").alias("p50_chars"),
        p90.cast("bigint").alias("p90_chars"),
    ]
    if distinct == "exact":
        aggs.append(
            F.count_distinct(F.col("_text")).cast("double")
            .alias("n_unique"))
    report = per_doc.cube(*group_cols).agg(*aggs)
    if distinct != "sketch":
        return report

    from functools import reduce
    from operator import and_

    from hbase_snapshot_spark.operators import sketches as sk

    # ONE corpus pass builds the finest-grained registers; ONE
    # grouping-sets aggregation rolls them up to every cube level
    # (per-bucket max — HLL registers merge losslessly), so the whole
    # estimate side costs one scan + register-sized shuffles.  (A
    # per-level union would re-run the hll_sketch subtree once per
    # level — 2^n corpus scans; measured, not hypothetical.)
    regs = sk.hll_sketch(df, t, group_cols)  # (group…, bucket, rho)
    n = len(group_cols)
    sets = [
        [F.col(c) for i, c in enumerate(group_cols)
         if not (gid >> (n - 1 - i)) & 1] + [F.col("bucket")]
        for gid in range(2 ** n)  # grouping_id bit i (MSB = first col)
    ]
    rolled = (
        regs.groupingSets(sets, *[F.col(c) for c in group_cols],
                          F.col("bucket"))
        .agg(F.max("rho").alias("rho"),
             # grouping_id counts the bucket bit (always grouped, LSB
             # = 0): shift it out to match the report's cube gid
             F.grouping_id().alias("_gid2"))
        .withColumn("gid", F.shiftright("_gid2", 1).cast("int"))
    )
    levels = sk.hll_estimate(rolled, [*group_cols, "gid"]).select(
        *group_cols, "gid", F.col("est").alias("n_unique"))
    cond = reduce(and_, [report[c].eqNullSafe(levels[c])
                         for c in group_cols]
                  + [report["gid"] == levels["gid"]])
    return report.join(levels, cond, "left").select(
        *[report[c] for c in report.columns],
        # a cube row with no register row means every text in the
        # group was NULL — 0 distinct, matching COUNT(DISTINCT)
        F.coalesce(F.col("n_unique"), F.lit(0.0)).alias("n_unique"),
    )
