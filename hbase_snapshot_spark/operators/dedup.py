"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Design for 100 TB: no pairwise O(n²) anywhere on the main path —
candidate generation is always a bucket/equi-join (shingle inverted
index, LSH band buckets, simhash half-fingerprint pigeonhole, cluster
blocking), with exact verification only inside candidate groups.  Hashes
are md5-based (portable to the DuckDB oracle); minhash rides a numeric
affine family over one md5 per shingle (MH_PRIME/_mh_params — exact
int64 arithmetic in both engines, HashAggregate-friendly mins).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hbase_snapshot_spark.functions import WS_RE, cosine, word_tokens, hex4_to_int

#: modulus of the affine minhash family — the Mersenne prime 2^31-1.
#: The base hash x folds to [0, 2^31-1) first, so with a_i < p and
#: b_i < p the whole expression a_i*x' + b_i stays < 2^62 + 2^31 <
#: 2^63: exact 64-bit signed arithmetic in BOTH engines (Spark bigint
#: and DuckDB BIGINT agree on % for non-negative operands; no HUGEINT
#: promotion fires).  p = 2^31-1 instead of 2^61-1 because the 61-bit
#: prime forced a_i ≤ 2047 for overflow safety — and any a_i with
#: a_i·2^52 < p never wraps the modulus at all, making h_i strictly
#: MONOTONE in x (its min is always the min-x shingle): several of the
#: 8 default hash functions were perfectly correlated, quietly bending
#: the LSH band-collision S-curve.  Over the 31-bit prime every a_i
#: spans the full multiplier range and every product wraps ~2^31
#: times.
MH_PRIME = (1 << 31) - 1

#: bump when the signature formula changes — persisted LSH indexes
#: carry it (minhash_index) and delta_dedup_pairs validates it: an
#: index hashed with a different formula joins a different band family
#: and silently finds ~nothing.  v3 = full-range affine family mod
#: 2^31-1 (v2 was the short-lived small-multiplier family mod 2^61-1,
#: monotone for small a_i; v1 was min over md5(f"{i}:{shingle}")
#: prefixes, 8 md5s/shingle).
MH_FORMULA_VERSION = 3


def _mh_params(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i) of the i-th affine minhash function
    h_i(x) = (a_i·(x mod p) + b_i) mod p, p = MH_PRIME = 2^31-1, over
    the 52-bit md5 prefix x.

    Seeded from md5 so every engine/process derives the same family
    with no RNG state.  a_i is uniform in [1, p-1] and b_i in [0, p-1]
    — the textbook universal family over Z_p, every multiplier
    full-range (see MH_PRIME for why the modulus is 31-bit: overflow
    exactness AND thorough wrapping are only simultaneously available
    below 2^31.5).  Folding x to x mod p costs a 2^-31 collision on
    distinct shingles — immaterial for a min aggregate."""
    a = 1 + int(hashlib.md5(f"mh-a:{i}".encode()).hexdigest()[:13], 16) % (
        MH_PRIME - 1)
    b = int(hashlib.md5(f"mh-b:{i}".encode()).hexdigest()[:13], 16) % MH_PRIME
    return a, b


# ---------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, key: Column, id_col: str = "doc_id") -> DataFrame:
    """hash-groupBy exact dedup: keep the smallest id per key; adds
    ``dup_count``.  One shuffle on the (hashed) key.

    NULL keys are never duplicates of each other (md5(NULL) is NULL and
    a window would lump every NULL-key row into ONE group, silently
    dropping all but one unrelated document) — each gets a unique
    sentinel key."""
    w = Window.partitionBy("_key").orderBy(F.col(id_col).asc())
    null_sentinel = F.concat(F.lit("\x00null:"), F.col(id_col).cast("string"))
    return (
        df.withColumn("_key", F.coalesce(F.md5(key), null_sentinel))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("dup_count", F.count(F.lit(1)).over(Window.partitionBy("_key")))
        .filter(F.col("_rn") == 1)
        .drop("_key", "_rn")
    )


# ---------------------------------------------------------------- shingles

def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """distinct word n-gram shingles in a SINGLE regex pass: overlapping
    matches via lookahead capture over the whitespace-normalized text.
    (The compositional word_ngrams(word_tokens(...)) form re-evaluates
    the tokenizing split per array element inside Catalyst lambdas —
    ~3n regex passes per row; this is one.)"""
    # the shared WS_RE contract, collapse-then-trim (r12): Java \s
    # includes \x0B while the oracle's RE2/DuckDB class does not — a
    # \x0B-separated document shingled DIFFERENTLY on the two engines
    # (the exact divergence class the explicit-class contract kills);
    # trim-first also left a leading space when text led with \n
    norm = F.trim(F.regexp_replace(F.col(text_col), WS_RE, " "))
    # lookahead captures the n-gram; the match then CONSUMES exactly one
    # token (+ separator) so successive matches start at token boundaries.
    # [^ ] not \S: after normalization the ONLY separator is a single
    # space, and Java's \S excludes \x0B (Java \s includes it) — a
    # \x0B-bearing token would split mid-token and silently DROP the
    # shingles touching it, diverging from the oracle's space-split
    pattern = r"(?=([^ ]+" + r" [^ ]+" * (n - 1) + r"))[^ ]+ ?"
    return df.withColumn(
        "shingles", F.array_distinct(F.regexp_extract_all(norm, F.lit(pattern), 1))
    )


def _exploded(df: DataFrame, id_col: str) -> DataFrame:
    return df.select(id_col, F.explode("shingles").alias("shingle"))


# ---------------------------------------------------------------- jaccard

def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    df_max: int | None = 5000,
) -> DataFrame:
    """exact n-gram Jaccard over an inverted shingle index: pairs sharing
    ≥1 shingle are candidates (equi-join on shingle — never all-pairs),
    then |A∩B| / (|A|+|B|-|A∩B|) ≥ threshold.

    Hub-shingle guard (default on): a shingle present in k docs yields
    k² candidate pairs, so one boilerplate shingle shared by 10⁵ docs
    would explode the self-join to 10¹⁰ rows.  Shingles with document
    frequency > ``df_max`` are excluded from CANDIDATE GENERATION only —
    the verification below intersects full shingle sets, so every
    reported jaccard value is exact.  Pairs whose shared shingles are
    ALL hubs are missed (by construction boilerplate-only overlap);
    ``df_max=None`` disables the guard.  The DF count is a map-side-
    combinable groupBy joined back on the shingle — NOT a window: a
    window count would funnel every occurrence of the hottest shingle
    (the exact hub the guard exists for) through one sorted task,
    while the aggregate's shuffle carries one row per distinct shingle
    per map task and the inner join drops hub occurrences at probe
    time without sorting.

    Output: (a, b, jaccard) with a < b, jaccard rounded to 6 digits.
    """
    ex = _exploded(df, id_col)
    if df_max is not None:
        dfreq = (
            ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= df_max)
            .select("shingle")
        )
        ex = ex.join(dfreq, "shingle")
    a, b = ex.alias("a"), ex.alias("b")
    candidates = (
        a.join(b, on="shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id")
        )
        .distinct()
    )
    sets = df.select(F.col(id_col), F.col("shingles"))
    out = (
        candidates.join(
            sets.select(F.col(id_col).alias("a_id"), F.col("shingles").alias("a_sh")),
            on="a_id",
        )
        .join(
            sets.select(F.col(id_col).alias("b_id"), F.col("shingles").alias("b_sh")),
            on="b_id",
        )
        .withColumn("inter", F.size(F.array_intersect("a_sh", "b_sh")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("a_sh") + F.size("b_sh") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("a_id").alias("a"), F.col("b_id").alias("b"), "jaccard"
        )
    )
    return out


# ---------------------------------------------------------------- minhash

def minhash_signature(
    df: DataFrame, id_col: str = "doc_id", num_hashes: int = 8
) -> DataFrame:
    """MinHash signature via an affine universal-hash family over ONE
    md5 per shingle: x = the shingle's 52-bit md5 prefix folded to
    [0, 2^31-1), then hash_i(doc) = min over shingles of
    (a_i*x + b_i) % MH_PRIME with full-range a_i (textbook minhash —
    each h_i approximates an independent random permutation; see
    MH_PRIME/_mh_params for why 2^31-1 is the modulus and why every
    multiplier must span it).  Computed as num_hashes min aggregates
    over the exploded shingle index — one shuffle, no UDFs.

    Output columns mh0..mh{n-1} are BIGINT (r11): a long min aggregate
    compiles to HashAggregate (mutable buffer), where a hex-string min
    forces sort-based SortAggregate on the dedup hot path — per-
    partition sorts that spill under executor memory pressure at corpus
    scale.  r12: the per-(shingle, i) md5 — 8 md5s + 8 radix
    conversions per shingle — collapsed to ONE md5/conv per shingle
    projected BEFORE the aggregate; the per-hash work is two bigint
    multiplies-adds."""
    ex = _exploded(df, id_col).withColumn(
        "xh",
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 13), 16, 10)
        .cast("long") % F.lit(MH_PRIME),
    )
    aggs = []
    for i in range(num_hashes):
        a, b = _mh_params(i)
        aggs.append(
            F.min((F.lit(a) * F.col("xh") + F.lit(b)) % F.lit(MH_PRIME))
            .alias(f"mh{i}")
        )
    return ex.groupBy(id_col).agg(*aggs)


def _banded_long(df: DataFrame, id_col: str, num_hashes: int, bands: int) -> DataFrame:
    """minhash signature → long-format LSH band buckets
    (id, band_id, bh) — the ONE band-hash construction shared by
    within-corpus and cross-corpus candidate generation.

    ``bands`` must divide ``num_hashes``: bands > num_hashes would
    make every band hash md5('') — every document in ONE bucket, the
    full O(n²) cartesian this construction exists to avoid — and a
    non-divisor silently drops the trailing hashes from every band,
    weakening the advertised LSH guarantee.  Both fail loudly here
    (guarding every entry point: minhash_dup_pairs,
    cross_corpus_overlap, minhash_index, delta_dedup_pairs,
    dedup_corpus, leakage_safe_split)."""
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must be a positive divisor of "
            f"num_hashes={num_hashes}: bands > num_hashes hashes the "
            "empty signature (one bucket = quadratic candidates), a "
            "non-divisor silently ignores trailing minhashes")
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df, id_col, num_hashes)
    band_cols = [
        F.md5(F.concat_ws(
            "|", *[f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        )).alias(f"band{b}")
        for b in range(bands)
    ]
    return sig.select(id_col, *band_cols).select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_id"), F.col(f"band{b}").alias("bh"))
                for b in range(bands)
            ])
        ).alias("b"),
    ).select(id_col, "b.band_id", "b.bh")


def _verify_jaccard(
    cand: DataFrame,
    sets_a: DataFrame,
    sets_b: DataFrame,
    threshold: float,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """exact-Jaccard verification restricted to candidate pairs only —
    the LSH point.  Two plain equi-joins fetch both shingle sets, then
    |A∩B| is a JVM-side array_intersect: no exploded self-join, no
    chance of a nested-loop plan, candidate set stays broadcastable.
    ``sets_a``/``sets_b`` carry (a_col|b_col, shingles)."""
    joined = (
        cand.join(sets_a.withColumnsRenamed({"shingles": "sh_a"}), on=a_col)
        .join(sets_b.withColumnsRenamed({"shingles": "sh_b"}), on=b_col)
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                6,
            ),
        )
    )
    return joined.filter(F.col("jaccard") >= threshold).select(
        a_col, b_col, "jaccard"
    )


def minhash_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding: signature split into ``bands`` bands of
    num_hashes/bands rows; docs agreeing on ANY full band are
    candidates (bucket equi-join); candidates verified with exact
    Jaccard ≥ threshold.  The scale path for near-dup at 100 TB."""
    bands_long = _banded_long(df, id_col, num_hashes, bands)
    x, y = bands_long.alias("x"), bands_long.alias("y")
    cand = (
        x.join(y, on=["band_id", "bh"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b")
        )
        .distinct()
    )
    sets = df.select(F.col(id_col), F.col("shingles"))
    return _verify_jaccard(
        cand,
        sets.withColumnsRenamed({id_col: "a"}),
        sets.withColumnsRenamed({id_col: "b"}),
        threshold,
    )


# ---------------------------------------------------------------- simhash

def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """SimHash fingerprint: per token, a 16-bit md5-derived hash votes
    ±1 on each bit position; fingerprint bit = sign of the vote sum.
    Pure Column math (hex-nibble arithmetic), one shuffle."""
    toks = df.select(
        id_col, F.explode(word_tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", hex4_to_int(F.md5(F.col("tok"))))
    votes = [
        F.sum(
            F.when((F.floor(F.col("h") / (1 << k)) % 2) == 1, 1).otherwise(-1)
        ).alias(f"v{k}")
        for k in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    fp = None
    for k in range(bits):
        bit = F.when(F.col(f"v{k}") > 0, F.lit(1 << k)).otherwise(F.lit(0))
        fp = bit if fp is None else (fp + bit)
    return agg.select(id_col, fp.alias("simhash"))


def simhash_dup_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """near-dup via SimHash: pigeonhole on ``max_hamming + 1`` blocks of
    the 16-bit fingerprint — with at most max_hamming differing bits,
    at least one of max_hamming+1 disjoint blocks is identical (two
    halves would ONLY be complete for max_hamming ≤ 1: hamming 2-3 can
    straddle both halves).  Candidates come from one equi-join per
    block, never all-pairs; exact hamming filter verifies."""
    n_blocks = max_hamming + 1
    if n_blocks > 16:
        raise ValueError("max_hamming must be < 16 for 16-bit fingerprints")
    bounds = [round(i * 16 / n_blocks) for i in range(n_blocks + 1)]
    fp = simhash(df, id_col, text_col)
    block_cols = []
    blocked = fp
    for i in range(n_blocks):
        lo, hi = bounds[i], bounds[i + 1]
        width = hi - lo
        col = (F.floor(F.col("simhash") / (1 << lo)) % (1 << width))
        blocked = blocked.withColumn(f"blk{i}", col)
        block_cols.append(f"blk{i}")
    x, y = blocked.alias("x"), blocked.alias("y")
    cands = None
    for part in block_cols:
        c = (
            x.join(y, on=F.col(f"x.{part}") == F.col(f"y.{part}"))
            .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            .select(
                F.col(f"x.{id_col}").alias("a"),
                F.col(f"y.{id_col}").alias("b"),
                F.col("x.simhash").alias("sa"),
                F.col("y.simhash").alias("sb"),
            )
        )
        cands = c if cands is None else cands.unionByName(c)
    xor = F.lit(0)
    for k in range(16):
        ba = F.floor(F.col("sa") / (1 << k)) % 2
        bb = F.floor(F.col("sb") / (1 << k)) % 2
        xor = xor + F.when(ba != bb, F.lit(1)).otherwise(F.lit(0))
    return (
        cands.distinct()
        .withColumn("hamming", xor)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def hamming_dup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 8,
    bits: int = 64,
) -> DataFrame:
    """Near-dup pairs over a 64-bit fingerprint column (e.g. the
    perceptual image hash from ``multimodal.phash_images``) — the
    64-bit generalization of ``simhash_dup_pairs``: pigeonhole the
    fingerprint into ``max_hamming + 1`` disjoint blocks (≤ max_hamming
    differing bits ⇒ at least one block identical), equi-join per
    block, union + distinct, then exact verification with
    ``bit_count(a XOR b)`` — all JVM-side bit ops, never all-pairs.

    Output: (a, b, hamming) with a < b.  NULL fingerprints (decode
    failures under on_error='null') are dropped before joining.
    """
    if bits != 64:
        raise ValueError("hamming_dup_pairs operates on 64-bit fingerprints")
    n_blocks = max_hamming + 1
    if n_blocks > bits:
        raise ValueError("max_hamming must be < 64")
    bounds = [round(i * bits / n_blocks) for i in range(n_blocks + 1)]
    fp = df.select(
        F.col(id_col), F.col(hash_col).cast("long").alias("_fp")
    ).where(F.col("_fp").isNotNull())
    blocked = fp
    block_cols = []
    for i in range(n_blocks):
        lo, hi = bounds[i], bounds[i + 1]
        width = hi - lo
        mask = (1 << width) - 1
        col = F.shiftrightunsigned(F.col("_fp"), lo).bitwiseAND(F.lit(mask))
        blocked = blocked.withColumn(f"blk{i}", col)
        block_cols.append(f"blk{i}")
    x, y = blocked.alias("x"), blocked.alias("y")
    cands = None
    for part in block_cols:
        c = (
            x.join(y, on=F.col(f"x.{part}") == F.col(f"y.{part}"))
            .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            .select(
                F.col(f"x.{id_col}").alias("a"),
                F.col(f"y.{id_col}").alias("b"),
                F.col("x._fp").alias("fa"),
                F.col("y._fp").alias("fb"),
            )
        )
        cands = c if cands is None else cands.unionByName(c)
    hamming = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (
        cands.distinct()
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# ---------------------------------------------------------------- embeddings

def cosine_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_col: str | None = None,
    allow_all_pairs: bool = False,
) -> DataFrame:
    """embedding near-dup: cosine ≥ threshold.  With ``block_col`` the
    join is blocked (cluster id / LSH bucket) — the scale path; without
    it, all-pairs (small inputs only; the brute-force baseline), which
    must be opted into with ``allow_all_pairs=True`` so a quadratic
    cartesian can't be reached by accident on a production corpus."""
    if block_col is None and not allow_all_pairs:
        raise ValueError(
            "cosine_dup_pairs without block_col is an all-pairs cartesian "
            "join (O(n^2)); pass block_col= (LSH bucket / cluster id) for "
            "the scale path, or allow_all_pairs=True to run the "
            "brute-force baseline on a small input"
        )
    from hbase_snapshot_spark.functions import dot, l2_norm

    # norms hoisted BELOW the self-join (r13): HOF bodies get no CSE,
    # so the inlined cosine() recomputed both O(d) norms per candidate
    # PAIR; per-row evaluation is bit-identical (same expression, same
    # input) and the pair stage pays one dot instead of three aggregates
    v = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("nrm"),
        *( [F.col(block_col).alias("blk")] if block_col else [] )
    )
    a, b = v.alias("a"), v.alias("b")
    on = [F.col("a.id") < F.col("b.id")]
    if block_col:
        on.append(F.col("a.blk") == F.col("b.blk"))
    joined = a.join(b, on=on[0] if len(on) == 1 else (on[0] & on[1]))
    cos = F.when(
        (F.col("a.nrm") > F.lit(0.0)) & (F.col("b.nrm") > F.lit(0.0)),
        dot(F.col("a.vec"), F.col("b.vec")) / (F.col("a.nrm") * F.col("b.nrm")),
    )
    return (
        joined.select(
            F.col("a.id").alias("a"),
            F.col("b.id").alias("b"),
            F.round(cos, 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def semantic_dedup(
    vectors: DataFrame,
    num_clusters: int = 16,
    eps: float = 0.93,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iterations: int = 0,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication of an embedding corpus.  K-means-cluster the embedding
    space, then WITHIN each cluster order items farthest-from-centroid
    first and drop every item whose cosine similarity to an
    earlier-ordered (farther) item is >= ``eps`` — the paper's
    keep-the-outlier rule, which preserves the most diverse exemplar of
    each semantic duplicate set.

    Returns (id_col, cell, cent_sim, keep) for every input vector:
    ``cell`` the cluster, ``cent_sim`` the round-6 cosine to its
    centroid, ``keep`` 1/0.

    Scale shape: candidate comparison is blocked by cluster — a
    cell-keyed self equi-join, never an all-pairs product (the paper
    clusters precisely so the n² sits inside bounded cells; pick
    ``num_clusters`` ~ n/10k to bound cell size).  Centroids broadcast;
    the per-cell rank is one window over the assignment exchange.

    Determinism: the quantizer is the smallest-id init (ivf_assign), so
    with ``kmeans_iterations=0`` the whole decision has a closed SQL
    form (oracle_ops.semantic_dedup_sql); refined quantizers are for
    production recall, pinned by pytest instead.
    """
    from .similarity import ivf_assign

    assigned, cents = ivf_assign(
        vectors, num_clusters, id_col, vec_col, kmeans_iterations)
    scored = assigned.join(F.broadcast(cents), "cell").select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        "cell",
        F.round(cosine(F.col(vec_col), F.col("cvec")), 6).alias("cent_sim"),
    )
    from hbase_snapshot_spark.functions import dot, l2_norm

    w = Window.partitionBy("cell").orderBy(
        F.col("cent_sim").asc(), F.col("id").asc())
    # the row norm rides the rank exchange once (r13 hoist): the
    # in-cell pair filter below would otherwise recompute both O(d)
    # norms per candidate PAIR (no CSE inside HOF bodies) — values are
    # bit-identical, only the evaluation point moves
    ranked = scored.withColumn("rk", F.row_number().over(w)).withColumn(
        "nrm", l2_norm(F.col("vec")))
    a = ranked.select(F.col("cell").alias("a_cell"),
                      F.col("vec").alias("a_vec"),
                      F.col("nrm").alias("a_nrm"),
                      F.col("rk").alias("a_rk"))
    pair_cos = F.when(
        (F.col("a_nrm") > F.lit(0.0)) & (F.col("nrm") > F.lit(0.0)),
        dot(F.col("a_vec"), F.col("vec")) / (F.col("a_nrm") * F.col("nrm")),
    )
    removed = (
        a.join(ranked, (F.col("a_cell") == F.col("cell"))
               & (F.col("a_rk") < F.col("rk")))
        .filter(F.round(pair_cos, 6) >= eps)
        .select("id")
        .distinct()
        .withColumn("_rm", F.lit(1))
    )
    return (
        ranked.join(removed, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cell",
            "cent_sim",
            F.when(F.col("_rm").isNull(), F.lit(1))
            .otherwise(F.lit(0)).cast("long").alias("keep"),
        )
    )


# ---------------------------------------------------------- clustering

def duplicate_clusters(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate-pair edges → connected components → canonical doc per
    cluster: the step that turns LSH candidate pairs into an actual
    dedup decision (keep min-id doc of each component, like the
    union-find pass after MinHash in a web-scale dedup pipeline).

    Iterative min-label propagation: each round every node adopts the
    smallest label among itself and its neighbors; converges in
    O(diameter) ≤ O(log n) rounds for near-dup clusters (which are
    small and dense).  Each round is one join + one aggregation, with
    localCheckpoint() to cut the growing lineage — the standard
    large-graph CC shape on Spark (GraphX/GraphFrames do the same
    hash-join propagation underneath).

    Output: (doc_id, cluster_id) for EVERY id (singletons map to
    themselves).
    """
    # materialize the edge list ONCE: pairs is usually the output of a
    # whole LSH pipeline, and every propagation round (plus its
    # convergence check) references edges — without this checkpoint each
    # iteration would re-execute candidate generation end-to-end
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = ids.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new = (
            labels.join(nbr, labels.id == nbr.src, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), on="id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        # silently-wrong clusters are worse than a loud failure: a chain
        # longer than max_iter hops would exit split — callers can raise
        # max_iter (rounds needed = component diameter)
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iter} iterations; "
            "increase max_iter (one round per hop of component diameter)"
        )
    return labels.select(
        F.col("id").alias(id_col), F.col("label").alias("cluster_id")
    )


def dedup_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """End-to-end near-dup removal — the composition a corpus pipeline
    actually runs: shingle → MinHash+LSH candidate pairs → connected
    components → keep each cluster's canonical (min-id) document.

    Returns the deduplicated corpus (original columns).  Singletons
    survive by construction (they are their own canonical).
    ``text_col`` names the shingled column (the sibling composition
    leakage_safe_split exposes the same knob)."""
    pairs = minhash_dup_pairs(
        with_shingles(df, text_col=text_col, n=n), id_col=id_col,
        num_hashes=num_hashes, bands=bands, threshold=threshold,
    )
    clusters = duplicate_clusters(pairs, df.select(id_col), id_col=id_col)
    keep = clusters.filter(F.col(id_col) == F.col("cluster_id")).select(id_col)
    return df.join(keep, on=id_col, how="left_semi")


def cross_corpus_overlap(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Decontamination: near-duplicate pairs BETWEEN two corpora (e.g.
    training set × evaluation set) — the train/test-overlap check every
    serious training pipeline runs before shipping a dataset.

    Same LSH shape as minhash_dup_pairs — shared ``_banded_long`` /
    ``_verify_jaccard`` construction — but the band-bucket join is
    across corpora (A-side × B-side, never within a side), so the
    candidate count scales with true cross-overlap, not corpus size.
    Inputs must already carry a ``shingles`` column (with_shingles).

    Output: (a_id, b_id, jaccard) with exact verified jaccard ≥
    threshold; a_id from corpus_a, b_id from corpus_b.
    """
    a = _banded_long(corpus_a, id_col, num_hashes, bands).withColumnsRenamed(
        {id_col: "a_id"}
    )
    b = _banded_long(corpus_b, id_col, num_hashes, bands).withColumnsRenamed(
        {id_col: "b_id"}
    )
    cand = a.join(b, on=["band_id", "bh"]).select("a_id", "b_id").distinct()
    sa = corpus_a.select(F.col(id_col).alias("a_id"), "shingles")
    sb = corpus_b.select(F.col(id_col).alias("b_id"), "shingles")
    return _verify_jaccard(cand, sa, sb, threshold, a_col="a_id", b_col="b_id")


def minhash_index(
    df: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Persistable LSH index of a corpus: one row per (id, band_id,
    band-hash).  The DELTA-dedup contract at 100 TB: build this ONCE
    over the standing corpus (and write it as parquet, bucketed by
    ``bh`` if batches are frequent); every incoming batch then joins
    against the index instead of re-shingling petabytes.  Inputs must
    carry a ``shingles`` column (with_shingles).

    The build parameters ride along as constant ``num_hashes`` /
    ``bands`` columns (RLE-compressed to nothing in parquet): a batch
    banded with DIFFERENT parameters hashes a different family, the
    (band_id, bh) join silently finds ~nothing, and the pipeline would
    conclude "no duplicates" — delta_dedup_pairs validates them
    instead of failing silent."""
    return (_banded_long(df, id_col, num_hashes, bands)
            .withColumn("num_hashes", F.lit(num_hashes))
            .withColumn("bands", F.lit(bands))
            .withColumn("mh_version", F.lit(MH_FORMULA_VERSION)))


def delta_dedup_pairs(
    batch: DataFrame,
    index: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental near-dup detection of a NEW batch against a standing
    corpus: candidates come from the batch's band hashes equi-joined to
    the prebuilt :func:`minhash_index`; exact-jaccard verification then
    reads the shingles of ONLY the candidate corpus documents (semi-
    join pruning) — the corpus is never re-shingled and never scanned
    beyond the candidate ids.  ``batch`` and ``corpus`` must carry
    ``shingles`` (with_shingles); ``corpus`` can lazily re-derive them
    since only candidate rows are evaluated.

    Output: (batch_id, corpus_id, jaccard) with verified jaccard >=
    threshold — drop or link the batch docs per policy.

    If the index carries its build parameters (minhash_index does),
    they are VALIDATED against this call's ``num_hashes``/``bands`` —
    a mismatched index hashes a different band family, the join finds
    ~nothing, and an unvalidated pipeline would silently report "no
    duplicates" (a decontamination failure, not an error).  The check
    reads one index row.  The formula version is validated the same way
    (MH_FORMULA_VERSION); a parameter-less pre-versioning index RAISES
    outright — it was necessarily hashed with an older family, so
    "skip the check and trust it" (the pre-r12 behavior) is now a
    guaranteed silent decontamination failure."""
    if not {"num_hashes", "bands"}.issubset(index.columns):
        # pre-r11 indexes carried no metadata AT ALL — and they were
        # necessarily hashed with the v1 per-hash-md5 formula, which
        # joins the current family to ~nothing.  Before the formula
        # changed, skipping validation was merely trusting; now it
        # would be a guaranteed silent decontamination failure.
        raise ValueError(
            "index carries no build metadata (num_hashes/bands/"
            "mh_version columns) — it predates formula versioning and "
            "was hashed with a different minhash family, so joining it "
            "would silently find no duplicates.  Rebuild the index "
            "with minhash_index()")
    has_ver = "mh_version" in index.columns
    cols = ["num_hashes", "bands"] + (["mh_version"] if has_ver else [])
    meta = index.select(*cols).limit(1).collect()
    if meta and (meta[0][0] != num_hashes or meta[0][1] != bands):
        raise ValueError(
            f"index was built with num_hashes={meta[0][0]}, "
            f"bands={meta[0][1]} but this batch is banded with "
            f"num_hashes={num_hashes}, bands={bands} — a mismatch "
            "joins two different hash families and silently finds "
            "no duplicates")
    # formula version: an index from an OLDER formula (v1/v2, or one
    # with params but no version stamp) hashes a DIFFERENT band family
    # than this build — the join would find ~nothing and report "no
    # duplicates".  Rebuild, don't guess.
    ver = meta[0][2] if (meta and has_ver) else (1 if meta else None)
    if ver is not None and ver != MH_FORMULA_VERSION:
        raise ValueError(
            f"index carries minhash formula version {ver} but this "
            f"build uses version {MH_FORMULA_VERSION} — different "
            "hash families join to ~nothing (a silent decontamination"
            " failure).  Rebuild the index with minhash_index()")
    index = index.drop(*cols)
    b = _banded_long(batch, id_col, num_hashes, bands).withColumnsRenamed(
        {id_col: "batch_id"}
    )
    idx = index.withColumnsRenamed({id_col: "corpus_id"})
    cand = (
        b.join(idx, on=["band_id", "bh"])
        .select("batch_id", "corpus_id")
        .distinct()
    )
    sb = batch.select(F.col(id_col).alias("batch_id"), "shingles")
    # candidate pruning BEFORE the corpus shingle fetch — the scan of
    # the standing corpus reduces to the matched ids
    sc = (
        corpus.select(F.col(id_col).alias("corpus_id"), "shingles")
        .join(cand.select("corpus_id").distinct(), on="corpus_id",
              how="left_semi")
    )
    return _verify_jaccard(
        cand, sb, sc, threshold, a_col="batch_id", b_col="corpus_id"
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    test_fraction: float = 0.1,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    max_iter: int = 25,
) -> DataFrame:
    """Train/eval split that cannot leak near-duplicates across sides:
    documents are clustered (LSH pairs → connected components) and the
    WHOLE cluster is assigned to one side by a deterministic hash of its
    canonical id — the split every careful pretraining pipeline needs
    (a random per-document split puts one copy of a near-dup pair in
    train and the other in eval, silently inflating eval scores).

    Adds ``split`` ('train' | 'test'); deterministic across runs,
    engines, and cluster sizes.  The split hash is DOMAIN-SEPARATED
    ('split:' prefix) from hash_sample/stratified_sample's raw id hash —
    composing a 50% upstream sample with a 40% split must give
    0.5 × 0.4 of the corpus in test, not the pathological correlation an
    identical hash would produce (every sampled singleton's fraction is
    already < the sample rate)."""
    from hbase_snapshot_spark.operators.sampling import hash_fraction

    pairs = minhash_dup_pairs(
        with_shingles(df, text_col=text_col, n=n), id_col=id_col,
        num_hashes=num_hashes, bands=bands, threshold=threshold,
    )
    clusters = duplicate_clusters(
        pairs, df.select(id_col), id_col=id_col, max_iter=max_iter
    )
    split_key = F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))
    side = F.when(
        hash_fraction(split_key) < test_fraction, F.lit("test")
    ).otherwise(F.lit("train"))
    return df.join(clusters, on=id_col).withColumn("split", side)


# ------------------------------------------------- exact substring spans

def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_tokens: int | None = None,
) -> DataFrame:
    """Exact duplicated-substring detection (the Lee et al.
    "Deduplicating Training Data" ExactSubstr family): every maximal
    token span of length ≥ k that appears verbatim more than once in
    the corpus (in another document OR again in the same one).

    Output: (id, span_start, span_end, span_tokens) — token offsets,
    end exclusive, one row per maximal duplicated span.

    Scale shape (the part that matters at 100 TB): NO pair
    materialization anywhere.  Positions are flagged by an equi-join
    against the DISTINCT set of shingle hashes whose corpus frequency
    is ≥ 2 — a hub shingle ("in the the end…" boilerplate) contributes
    ONE hash row regardless of how many millions of positions carry
    it, so there is no quadratic blowup to cap.  Span assembly is a
    per-document coverage-union window (_coverage_islands: flags merge
    while the covered [pos, pos+k) intervals stay contiguous), one
    shuffle on the id.
    """
    if min_tokens is None:
        min_tokens = k
    toks = F.split(F.trim(F.regexp_replace(F.col(text_col), WS_RE, " ")), " ")
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks")).filter(
        F.size("toks") >= k
    )
    # positional k-gram hashes: pos → xxhash64 of tokens [pos, pos+k)
    grams = base.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - k),
                lambda i: F.xxhash64(F.concat_ws("\x1f", F.slice("toks", i + 1, k))),
            )
        ).alias("pos", "gh"),
    )
    # shingle hashes seen at ≥ 2 positions corpus-wide (distinct set —
    # the join right side carries one row per duplicated HASH)
    dup_hashes = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("gh")
    )
    flagged = grams.join(dup_hashes, on="gh").select("id", "pos")
    spans = _coverage_islands(flagged, k, min_tokens, id_col)
    return spans


def _coverage_islands(
    flagged: DataFrame, k: int, min_tokens: int, id_col: str
) -> DataFrame:
    """Merge flagged k-gram START positions into maximal COVERED token
    runs: a flagged pos covers tokens [pos, pos+k), so two flags merge
    whenever the next start is ≤ prev + k (overlap OR adjacency keeps
    the covered run contiguous) — NOT only when starts are consecutive
    integers.  Start-gap islands (pos − row_number) fragmented one
    duplicated region into overlapping rows (double-counted
    span_tokens) and, worse, let min_tokens > k silently DROP a
    genuinely duplicated region whose individual fragments were each
    shorter than min_tokens.  One per-document window shuffle, same
    scale shape as before (pos is sorted, so lag(pos) IS the max
    preceding coverage start)."""
    w = Window.partitionBy("id").orderBy("pos")
    prev = F.lag("pos").over(w)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        flagged
        .withColumn("_new", F.when(prev.isNull()
                                   | (F.col("pos") > prev + k),
                                   F.lit(1)).otherwise(F.lit(0)))
        .withColumn("island", F.sum("_new").over(run))
        .groupBy("id", "island")
        .agg(F.min("pos").alias("span_start"),
             (F.max("pos") + k).alias("span_end"))
        .withColumn("span_tokens", F.col("span_end") - F.col("span_start"))
        .filter(F.col("span_tokens") >= min_tokens)
        .select(F.col("id").alias(id_col), "span_start", "span_end", "span_tokens")
    )


def scrub_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_tokens: int | None = None,
) -> DataFrame:
    """ExactSubstr dedup applied: rewrite each document with its
    duplicated spans removed (every occurrence is cut — the
    conservative decontamination form; keeping one canonical occurrence
    is a policy layer on top).  Documents without duplicated spans pass
    through untouched.  One extra shuffle (the span join back)."""
    spans = duplicated_spans(df, id_col, text_col, k, min_tokens)
    agg = spans.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("span_start", "span_end"))).alias("_spans")
    )
    toks = F.split(F.trim(F.regexp_replace(F.col(text_col), WS_RE, " ")), " ")
    joined = df.withColumn("_toks", toks).join(agg, on=id_col, how="left")
    kept = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.size("_toks") - 1),
            lambda i: F.when(
                F.exists(
                    "_spans",
                    lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
                ),
                F.lit(None).cast("string"),
            ).otherwise(F.element_at("_toks", i + 1)),
        ),
        lambda t: t.isNotNull(),
    )
    return joined.withColumn(
        text_col,
        F.when(F.col("_spans").isNull(), F.col(text_col))
        .otherwise(F.concat_ws(" ", kept)),
    ).drop("_toks", "_spans")


def contaminated_spans(
    train: DataFrame,
    evalset: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_tokens: int | None = None,
) -> DataFrame:
    """Exact-substring eval decontamination (the GPT-3/PaLM-report
    contamination check made actionable): maximal token spans in TRAIN
    documents that appear verbatim anywhere in the eval set.

    Output: (id, span_start, span_end, span_tokens) over TRAIN docs.
    Feed the result to the same span-scrub policy as
    :func:`scrub_duplicated_spans` or drop the documents outright.

    Same scale shape as duplicated_spans: train positions flag-join
    against the DISTINCT eval k-gram hash set (one row per hash —
    typically small enough to broadcast), then a per-document
    gaps-and-islands merge.  No train×eval pair set exists at any
    point."""
    if min_tokens is None:
        min_tokens = k

    def grams(df):
        toks = F.split(F.trim(F.regexp_replace(F.col(text_col), WS_RE, " ")), " ")
        base = df.select(F.col(id_col).alias("id"), toks.alias("toks")).filter(
            F.size("toks") >= k
        )
        return base.select(
            "id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - k),
                    lambda i: F.xxhash64(
                        F.concat_ws("\x1f", F.slice("toks", i + 1, k))
                    ),
                )
            ).alias("pos", "gh"),
        )

    eval_hashes = grams(evalset).select("gh").distinct()
    flagged = grams(train).join(eval_hashes, on="gh").select("id", "pos")
    return _coverage_islands(flagged, k, min_tokens, id_col)


# ----------------------------------------------------- line-level dedup

def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "first",
    min_count: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Line/paragraph-level corpus dedup (CCNet, Wenzek et al. 2019 —
    the pass that strips nav menus, cookie banners, and boilerplate
    before document-level dedup).  Splits each document on ``sep``,
    hashes each normalized line (lowercased, ASCII-whitespace-trimmed),
    and removes lines by corpus-wide frequency:

    - ``mode='first'`` (CCNet semantics): every repeated line is kept
      only at its FIRST corpus occurrence (ordered by (id, position));
      later occurrences are dropped.  The row_number window + rn==1
      filter compiles to a map-side PARTIAL WindowGroupLimit (pinned
      by test_line_dedup_plan_shape): each map task keeps only its own
      first occurrence per line hash, so a corpus-hot boilerplate line
      ships ≤1 row per map task through the shuffle — cheaper than a
      min-aggregate + join-back, which would re-shuffle EVERY line for
      the join.
    - ``mode='boilerplate'`` (RefinedWeb-style frequent-line removal):
      lines whose corpus count >= ``min_count`` are dropped EVERYWHERE.
      The frequent-hash set is tiny by construction (boilerplate is
      few distinct strings), so the removal join is a broadcast
      left-anti — the per-line pass stays map-only.

    Lines that normalize to EMPTY are always kept: they carry document
    structure, not content, and their hash would otherwise be the
    single most frequent key in the corpus — a guaranteed skew
    hot-partition at 100 TB.

    Output: one row per input row with ``clean_<text_col>`` (surviving
    lines joined by ``sep``, original line text and order preserved),
    ``n_lines`` and ``n_removed``.  Documents whose every line is
    removed survive with an empty clean text (left join back to the
    input keys — a groupBy over kept lines alone would drop them)."""
    if mode not in ("first", "boilerplate"):
        raise ValueError(f"line_dedup mode {mode!r}")
    # sep is a LITERAL separator everywhere (F.split takes a regex, so
    # escape it — sep='|' or '.' would otherwise split per character)
    import re as _re

    sep_re = _re.escape(sep)
    lines = (
        df.select(id_col, F.posexplode(F.split(F.col(text_col), sep_re))
                  .alias("_pos", "_line"))
        # explicit ASCII class, NOT trim(): Spark's trim strips only
        # spaces, so a tab-only line would count as content and
        # tab-only lines across the corpus would dedup against each
        # other (caught by the differential property test); the
        # explicit class also keeps the DuckDB twin byte-identical
        .withColumn(
            "_norm",
            F.lower(F.regexp_replace(
                F.col("_line"), "^[ \\t\\r\\f]+|[ \\t\\r\\f]+$", "")))
        .withColumn("_h", F.md5(F.col("_norm")))
    )
    content = lines.filter(F.length("_norm") > 0)
    blank = lines.filter(F.length("_norm") == 0)
    if mode == "first":
        w = Window.partitionBy("_h").orderBy(
            F.col(id_col).asc(), F.col("_pos").asc())
        kept = (
            content.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn")
        )
    else:
        frequent = (
            content.groupBy("_h").agg(F.count(F.lit(1)).alias("_cnt"))
            .filter(F.col("_cnt") >= min_count)
            .select("_h")
        )
        # no forced broadcast: with a boilerplate-grade min_count the
        # frequent set is tiny and AQE picks broadcast at runtime, but
        # at min_count=2 on a web corpus it is EVERY duplicated line —
        # forcing a broadcast there would OOM the driver.  AQE makes
        # the right call per run from the measured build-side size.
        kept = content.join(frequent, "_h", "left_anti")
    kept = kept.unionByName(blank)
    reassembled = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                    lambda s: s["_line"],
                ),
                sep,
            ).alias(f"clean_{text_col}"),
            F.count(F.lit(1)).alias("_n_kept"),
        )
    )
    # n_lines needs no second explode/agg/join: it is a map-side
    # projection on the input (split size; null text -> 0 lines)
    return (
        df.withColumn(
            "n_lines",
            F.when(F.col(text_col).isNull(), F.lit(0))   # size(null) is
            .otherwise(F.size(F.split(F.col(text_col), sep_re))))  # -1 legacy
        .join(reassembled, id_col, "left")
        .withColumn(
            f"clean_{text_col}",
            F.coalesce(F.col(f"clean_{text_col}"), F.lit("")))
        .withColumn(
            "n_removed",
            (F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long"))
        .withColumn("n_lines", F.col("n_lines").cast("long"))
        .drop("_n_kept")
    )


def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    threshold: float = 0.5,
    df_max: int | None = 5000,
) -> DataFrame:
    """MOSS near-dup DETECTION (the second half of winnowing —
    Schleimer et al. 2003 §4): documents sharing a large fraction of
    their selected winnow hashes are near-duplicates.  Exactly
    jaccard_pairs' inverted-index shape applied to the winnow sets
    (text.winnow_fingerprints), so the hub guard, the candidate
    equi-join, and the exact full-set verification are all inherited —
    one operator definition, two sketch domains.

    Compared to n-gram Jaccard, winnow sets are ~1/window the size for
    the same coverage guarantee (every shared run of k+window-1 chars
    still lands a common hash), so the inverted index — the dominant
    shuffle at corpus scale — is proportionally smaller.

    Output: (a, b, jaccard) with a < b, rounded to 6 — jaccard_pairs'
    column names, since this IS jaccard_pairs over winnow sets."""
    from hbase_snapshot_spark.operators.text import winnow_fingerprints

    sets = winnow_fingerprints(df, text_col, k=k, window=window).select(
        F.col(id_col), F.col("winnow").alias("shingles"))
    # the fingerprint sets feed FIVE plan branches downstream (the
    # inverted-index self-join's two sides, the hub-guard window, and
    # both exact-verification set fetches) — materialize them so the
    # hashing pass runs once, which is also the 100 TB shape: sketch
    # the corpus once, reuse the sketch.  localCheckpoint rather than
    # persist(): a DataFrame persist is pinned in the CacheManager
    # until an explicit unpersist this function has no good place for
    # (the caller holds a lazy result), while a local checkpoint's
    # blocks are released by the ContextCleaner once the result is
    # garbage collected.  Trade-off: local checkpoints don't survive
    # executor loss — acceptable for a one-shot operator (re-run it).
    sets = sets.localCheckpoint(eager=True)
    return jaccard_pairs(
        sets, id_col=id_col, threshold=threshold, df_max=df_max)
