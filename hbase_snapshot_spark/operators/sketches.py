"""Mergeable sketches: KMV (K-Minimum-Values) and HyperLogLog for
distinct counts, KMV set-operation estimates (union / Jaccard /
intersection of key sets without joining them), and Count-Min for
point frequencies / heavy hitters — the approximate-analytics
primitives a 100 TB engine needs where exact COUNT(DISTINCT) or a
full-frequency table would shuffle every key.

Both sketches hash with md5 (portable to the DuckDB oracle, like every
hash in this repo): the first 13 hex chars give an exact 52-bit
fraction (fits a double exactly), so estimates have a closed SQL form
and the oracle pins them bit-for-bit.

Scale shape: a sketch is an ALGEBRAIC aggregate — registers build with
map-side partial aggregation (one hash exchange of k (KMV) or m (HLL)
values per group, never the key set), and registers from disjoint
partitions/days/tables MERGE losslessly (kmv_merge / hll_merge), the
property that makes pre-aggregated rollup cubes possible.  Exact
distinct of a billion users shuffles a billion keys; the sketch
shuffles 256 registers.

References: Bar-Yossef et al. 2002 (KMV); Beyer et al. 2007 (KMV set
operations); Flajolet, Fusy, Gandouet, Meunier 2007 (HyperLogLog);
Cormode & Muthukrishnan 2005 (Count-Min).  The reference repo has no
sketches (beyond-reference, SURVEY §2.8 relational extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "kmv_sketch", "kmv_merge", "kmv_estimate", "kmv_set_estimates",
    "hll_sketch", "hll_merge", "hll_estimate",
    "cms_sketch", "cms_merge", "cms_query",
    "quantile_sketch", "quantile_merge", "quantile_estimate",
    "quantile_sql",
]

#: 16**13 — the denominator of the exact 52-bit md5 fraction.
_FRAC_DEN = float(16 ** 13)


def _hash_frac(key: Column) -> Column:
    """md5(key) → exact fraction in [0, 1): first 13 hex chars as a
    52-bit integer over 16^13.  52 bits fit a double exactly, so both
    engines see the identical value."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 13), 16, 10)
        .cast("double") / F.lit(_FRAC_DEN)
    )


# ------------------------------------------------------------------ KMV

def _topk_regs(h: DataFrame, by: list[str], k: int) -> DataFrame:
    """The shared per-group bottom-k-by-frac register pass: dense_rank
    ≤ k over possibly-duplicated fracs (WindowGroupLimit's PARTIAL stage
    prunes each map partition to its own k smallest BEFORE the window
    exchange — so the shuffle carries ≤ k·partitions rows per group,
    never the distinct hash set), then dedupe the tiny survivor set and
    re-rank.  Used by kmv_sketch, kmv_merge, and kmv_set_estimates so
    tie-breaking and the below-k branch can never desynchronize."""
    from pyspark.sql import Window

    w = Window.partitionBy(*by).orderBy(F.col("frac").asc())
    pruned = (
        h.withColumn("_dr", F.dense_rank().over(w))
        .filter(F.col("_dr") <= k)
        .select(*by, "frac")
        .distinct()
    )
    return (
        pruned.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select(*by, "pos", "frac")
    )


def _kmv_est_col(k: int) -> Column:
    """The shared KMV estimator over (nreg, hk): (k−1)/h_k when full,
    exact register count below k.  Round 6."""
    return F.round(
        F.when(F.col("nreg") < k, F.col("nreg").cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.col("hk")),
        6,
    )


def kmv_sketch(
    df: DataFrame, key: Column, by: list[str], k: int = 64
) -> DataFrame:
    """Per-group KMV registers: the ``k`` smallest DISTINCT hash
    fractions of non-null ``key`` values.  Returns (by…, pos, frac)
    long-form registers (pos = 1-based rank).  No distinct() over the
    full hash set — see _topk_regs for the partial-prune shape."""
    h = df.filter(key.isNotNull()).select(
        *by, _hash_frac(key).alias("frac"))
    return _topk_regs(h, by, k)


def kmv_merge(a: DataFrame, b: DataFrame, by: list[str], k: int = 64) -> DataFrame:
    """Merge two KMV register sets: union the fractions, re-take the k
    smallest — lossless for the union of the underlying sets (the
    defining property of KMV)."""
    u = a.select(*by, "frac").unionByName(b.select(*by, "frac"))
    return _topk_regs(u, by, k)


def kmv_estimate(sketch: DataFrame, by: list[str], k: int = 64) -> DataFrame:
    """Distinct-count estimate from KMV registers: (k−1)/h_k when the
    sketch is full, else the register count itself (the sketch holds
    every distinct hash — the estimate is exact).  Round 6."""
    return (
        sketch.groupBy(*by)
        .agg(F.count(F.lit(1)).alias("nreg"), F.max("frac").alias("hk"))
        .select(*by, _kmv_est_col(k).alias("est"))
    )


def kmv_sql(key_expr: str, table: str, by: str, k: int = 64) -> str:
    """DuckDB twin of kmv_sketch → kmv_estimate (one group column)."""
    return f"""
SELECT {by}, round(CASE WHEN nreg < {k} THEN nreg::DOUBLE
                        ELSE {float(k - 1)} / hk END, 6) AS est
FROM (
  SELECT {by}, count(*) AS nreg, max(frac) AS hk
  FROM (
    SELECT {by}, frac, row_number() OVER (
             PARTITION BY {by} ORDER BY frac ASC) AS pos
    FROM (SELECT DISTINCT {by},
                 ('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 13))
                   ::BIGINT / {_FRAC_DEN} AS frac
          FROM {table} WHERE {key_expr} IS NOT NULL) h) r
  WHERE pos <= {k}
  GROUP BY {by}) s
"""


def kmv_set_estimates(
    a: DataFrame, b: DataFrame, by: list[str], k: int = 64
) -> DataFrame:
    """Set-operation estimates from two KMV sketches over the same key
    domain (Beyer et al. 2007, "On synopses for distinct-value
    estimation"): take the k smallest fractions of the UNION of the two
    register sets; the fraction of those present in BOTH sketches
    estimates Jaccard; union-cardinality × Jaccard estimates the
    intersection.  Returns (by…, union_est, jaccard, intersect_est).

    This is the sketch answer to "how much do two corpora overlap"
    (train/eval contamination at the cardinality level, cross-snapshot
    churn) without ever joining the key sets.

    The union registers come from kmv_merge and the union estimator is
    _kmv_est_col — the exact machinery of kmv_estimate, so the two can
    never drift."""
    merged = kmv_merge(a, b, by, k)
    flagged = (
        merged
        .join(a.select(*by, "frac").withColumn("in_a", F.lit(1)),
              [*by, "frac"], "left")
        .join(b.select(*by, "frac").withColumn("in_b", F.lit(1)),
              [*by, "frac"], "left")
    )
    agg = flagged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("nreg"),
        F.max("frac").alias("hk"),
        F.sum(F.coalesce(F.col("in_a"), F.lit(0))
              * F.coalesce(F.col("in_b"), F.lit(0))).alias("common"),
    )
    union_est = _kmv_est_col(k)
    jacc = F.round(F.col("common") / F.col("nreg"), 6)
    return agg.select(
        *by,
        union_est.alias("union_est"),
        jacc.alias("jaccard"),
        F.round(union_est * jacc, 6).alias("intersect_est"),
    )


# ------------------------------------------------------------ HyperLogLog

def _rho(hexpart: Column) -> Column:
    """Leading-zero rank of a 13-hex-char (52-bit) field: 4·(leading
    '0' chars) + in-char zeros + 1.  Pure string/CASE ops — exact and
    identical in both engines (no float log2)."""
    z = F.length(F.regexp_extract(hexpart, "^0*", 0))
    c = F.substring(F.concat(hexpart, F.lit("f")), z + 1, 1)
    inchar = (
        F.when(c == "1", 3)
        .when(c.isin("2", "3"), 2)
        .when(c.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return (F.lit(4) * z + inchar + 1).cast("int")


def hll_sketch(
    df: DataFrame, key: Column, by: list[str], m: int = 256
) -> DataFrame:
    """Per-group HLL registers, long form (by…, bucket, rho): bucket =
    first 2 md5 hex chars (m=256 fixed — the register width is part of
    the sketch identity), rho = leading-zero rank of the next 52 bits.
    NULL keys are dropped (COUNT DISTINCT semantics).  One hash exchange
    of ≤ m rows per group (map-side max combine)."""
    if m != 256:
        raise ValueError("hll_sketch is fixed at m=256 (2 hex chars)")
    h = F.md5(key.cast("string"))
    return (
        df.filter(key.isNotNull())
        .select(
            *by,
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("bucket"),
            _rho(F.substring(h, 3, 13)).alias("r"),
        )
        .groupBy(*by, "bucket")
        .agg(F.max("r").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, by: list[str]) -> DataFrame:
    """Merge HLL register sets: per-bucket max — lossless for the union
    of the underlying sets."""
    return (
        a.select(*by, "bucket", "rho")
        .unionByName(b.select(*by, "bucket", "rho"))
        .groupBy(*by, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(sketch: DataFrame, by: list[str], m: int = 256) -> DataFrame:
    """Flajolet et al. 2007 estimator with the small-range (linear
    counting) correction: E = α_m·m²/S where S sums 2^−rho over all m
    registers (empty = 2⁰); if E ≤ 2.5m and V empty registers remain,
    E = m·ln(m/V).  Round 4 (the estimate's useful precision; keeps
    the cross-engine float-sum ulp out of the hash).

    ``m`` is the SKETCH's register width, not a knob: hll_sketch only
    builds m=256 (first-2-hex bucketing), so any other value here
    silently mis-scales alpha and the empty-register fill — and an m
    smaller than a group's nonempty count feeds log() a negative
    argument (NULL estimate).  Enforced to match the builder."""
    if m != 256:
        raise ValueError(
            "hll_estimate must use the sketch's register width (m=256, "
            "the first-2-hex-chars bucketing hll_sketch builds); a "
            "different m mis-scales alpha and the empty-register fill")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = sketch.groupBy(*by).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s_used"),
        F.count(F.lit(1)).alias("nonempty"),
    )
    s = F.col("s_used") + (F.lit(m) - F.col("nonempty"))
    v = F.lit(m) - F.col("nonempty")
    e_raw = F.lit(alpha * m * m) / s
    est = F.when(
        (e_raw <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(e_raw)
    return agg.select(*by, F.round(est, 4).alias("est"))


def hll_sql(key_expr: str, table: str, by: str, m: int = 256) -> str:
    """DuckDB twin of hll_sketch → hll_estimate (one group column).

    Same m==256 guard as hll_estimate (r12 review): the bucketing
    below is hard-coded to the first TWO hex chars (256 registers), so
    a foreign m would mis-scale alpha, the empty-register fill, and
    the linear-counting branch — ln(m/(m-nonempty)) can even go
    negative — while looking like plausible SQL."""
    if m != 256:
        raise ValueError(
            f"hll_sql is generated for m=256 registers (2 hex chars); "
            f"got m={m} — the register width is the sketch's identity")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return f"""
WITH h AS (
  SELECT {by}, md5(CAST({key_expr} AS VARCHAR)) AS hx FROM {table}
  WHERE {key_expr} IS NOT NULL
),
reg AS (
  SELECT {by},
         ('0x' || substr(hx, 1, 2))::INTEGER AS bucket,
         max(4 * length(regexp_extract(substr(hx, 3, 13), '^0*'))
             + CASE substr(substr(hx, 3, 13) || 'f',
                 length(regexp_extract(substr(hx, 3, 13), '^0*')) + 1, 1)
               WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
               WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
               WHEN '7' THEN 1 ELSE 0 END + 1) AS rho
  FROM h GROUP BY {by}, 2
),
agg AS (
  SELECT {by}, sum(pow(2.0, -rho)) AS s_used, count(*) AS nonempty
  FROM reg GROUP BY {by}
)
SELECT {by},
       round(CASE WHEN {alpha * m * m} / (s_used + ({m} - nonempty))
                       <= {2.5 * m}
                   AND ({m} - nonempty) > 0
             THEN {float(m)} * ln({float(m)} / ({m} - nonempty))
             ELSE {alpha * m * m} / (s_used + ({m} - nonempty)) END,
             4) AS est
FROM agg
"""


# ------------------------------------------------------------- Count-Min

#: Count-Min geometry: 4 independent hash rows × 256 buckets.  Error
#: bound: overestimate ≤ 2e/w · N with prob 1 − (1/2)^d ≈ 0.94.
_CMS_D, _CMS_W = 4, 256


def _cms_bucket(row: int, key: Column) -> Column:
    """bucket of ``key`` in hash row ``row``: first 2 hex chars of
    md5('<row>:'+key) — d independent hash functions by seeding."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"),
                                   key.cast("string"))), 1, 2),
        16, 10,
    ).cast("int")


def cms_sketch(df: DataFrame, key: Column, by: list[str]) -> DataFrame:
    """Per-group Count-Min registers (Cormode & Muthukrishnan 2005),
    long form (by…, row, bucket, cnt): COUNTS (not distinct) of
    non-null keys hashed into d×w counters.  ONE scan of the input —
    the d hash rows come from a posexplode of a d-element bucket array,
    not d unioned scans; one exchange of ≤ d·w rows per group
    (map-side combine); registers merge by plain addition (cms_merge) —
    the mergeable frequency/heavy-hitter primitive."""
    buckets = F.array(*[_cms_bucket(r, key) for r in range(_CMS_D)])
    return (
        df.filter(key.isNotNull())
        .select(*by, F.posexplode(buckets).alias("row", "bucket"))
        .groupBy(*by, "row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame, by: list[str]) -> DataFrame:
    """Merge Count-Min register sets: per-counter sum — lossless for
    the concatenation of the underlying streams."""
    return (
        a.select(*by, "row", "bucket", "cnt")
        .unionByName(b.select(*by, "row", "bucket", "cnt"))
        .groupBy(*by, "row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_query(
    sketch: DataFrame, keys: DataFrame, key_col: str, by: list[str]
) -> DataFrame:
    """Point-frequency estimates: for each (group, key) the minimum
    counter over the d hash rows (absent counter = 0).  ``keys`` is the
    small query relation — it broadcasts; the sketch never rehashes the
    data."""
    probes = None
    for r in range(_CMS_D):
        p = keys.select(
            F.col(key_col),
            F.lit(r).alias("row"),
            _cms_bucket(r, F.col(key_col)).alias("bucket"),
        )
        probes = p if probes is None else probes.unionByName(p)
    groups = sketch.select(*by).distinct()
    joined = (
        probes.crossJoin(F.broadcast(groups))
        .join(sketch, [*by, "row", "bucket"], "left")
    )
    return (
        joined.groupBy(*by, key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_sql(key_expr: str, table: str, by: str,
            keys_sql: str, key_col: str = "k") -> str:
    """DuckDB twin of cms_sketch → cms_query: ``keys_sql`` yields the
    probe relation with a ``{key_col}`` column.  One scan of the table
    (the d hash rows fan out via a range() cross join, mirroring the
    Spark posexplode)."""
    probes = " UNION ALL ".join(
        f"SELECT {key_col}, {r} AS row, ('0x' || substr(md5('{r}:' || "
        f"CAST({key_col} AS VARCHAR)), 1, 2))::INTEGER AS bucket "
        f"FROM qkeys"
        for r in range(_CMS_D)
    )
    return f"""
WITH qkeys AS ({keys_sql}),
reg AS (
  SELECT {by}, d.row, ('0x' || substr(md5(CAST(d.row AS VARCHAR) || ':'
           || CAST({key_expr} AS VARCHAR)), 1, 2))::INTEGER AS bucket,
         count(*) AS cnt
  FROM {table} CROSS JOIN (SELECT unnest(range({_CMS_D})) AS row) d
  WHERE {key_expr} IS NOT NULL
  GROUP BY {by}, d.row, 3
),
probe AS ({probes})
SELECT g.{by}, p.{key_col},
       min(coalesce(r.cnt, 0)) AS est
FROM probe p
CROSS JOIN (SELECT DISTINCT {by} FROM {table}
            WHERE {key_expr} IS NOT NULL) g
LEFT JOIN reg r ON r.{by} = g.{by} AND r.row = p.row
                AND r.bucket = p.bucket
GROUP BY g.{by}, p.{key_col}
"""


# ----------------------------------------------------- quantile sample

def _bottomk_sample(h: DataFrame, by: list[str], k: int) -> DataFrame:
    """Per-group bottom-k (frac, val) register pass — _topk_regs with
    the VALUE carried: dense_rank over (frac, val) so WindowGroupLimit's
    partial stage prunes each map partition to its own k smallest
    before the exchange, then dedupe and re-rank.  Shared by
    quantile_sketch and quantile_merge so tie-breaking can never
    desynchronize."""
    from pyspark.sql import Window

    w = Window.partitionBy(*by).orderBy(
        F.col("frac").asc(), F.col("val").asc())
    pruned = (
        h.withColumn("_dr", F.dense_rank().over(w))
        .filter(F.col("_dr") <= k)
        .select(*by, "frac", "val")
        .distinct()
    )
    return (
        pruned.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select(*by, "pos", "frac", "val")
    )


def quantile_sketch(
    df: DataFrame, value: Column, ident: Column, by: list[str],
    k: int = 256,
) -> DataFrame:
    """Mergeable per-group QUANTILE sketch via bottom-k coordinated
    sampling (Cohen & Kaplan's bottom-k sketches): keep the ``k`` rows
    whose IDENTITY hashes smallest, carrying their values — a uniform
    random-but-DETERMINISTIC sample of the group, so the sample's
    empirical quantiles estimate the group's with the usual
    O(1/sqrt(k)) error.  Returns (by…, pos, frac, val) registers.

    Same algebraic shape as KMV/HLL/CMS: map-side partial prune (each
    task contributes ≤ k registers per group — the shuffle never
    carries the raw value multiset), and sketches over disjoint
    partitions MERGE losslessly (bottom-k of a union is the bottom-k
    of the unions' bottom-ks).  ``ident`` must identify a row (e.g.
    the event id); identical (frac, val) pairs dedupe harmlessly.
    NULL and NaN values are excluded: NaN sorts after +Inf in Spark
    and would poison the upper quantiles, and pandas folds NULL into
    NaN, so excluding both keeps the streaming twin's drained state
    byte-identical to this batch sketch."""
    v = value.cast("double")
    h = df.filter(
        v.isNotNull() & ~F.isnan(v) & ident.isNotNull()
    ).select(*by, _hash_frac(ident).alias("frac"), v.alias("val"))
    return _bottomk_sample(h, by, k)


def quantile_merge(
    a: DataFrame, b: DataFrame, by: list[str], k: int = 256
) -> DataFrame:
    """Merge two quantile-sample register sets: union, re-take the k
    hash-smallest — register-exact equal to sketching the union."""
    u = (a.select(*by, "frac", "val")
         .unionByName(b.select(*by, "frac", "val")))
    return _bottomk_sample(u, by, k)


def quantile_estimate(
    sketch: DataFrame, by: list[str], probs: tuple[float, ...] = (0.5,),
) -> DataFrame:
    """Quantile estimates from the registers: for each p, the sample
    value at 1-based rank ``floor(p·(n−1)) + 1`` of the value-sorted
    sample ('lower' empirical quantile — exact integer selection, no
    interpolation, so the DuckDB twin is bit-identical).  Returns
    (by…, p, est)."""
    from pyspark.sql import Window

    vw = Window.partitionBy(*by).orderBy(
        F.col("val").asc(), F.col("frac").asc())
    s = (
        sketch.withColumn("_n", F.count(F.lit(1))
                          .over(Window.partitionBy(*by)))
        .withColumn("_vpos", F.row_number().over(vw))
    )
    return (
        s.select(*by, "_n", "_vpos", "val",
                 F.explode(F.array(*[F.lit(float(p)) for p in probs]))
                 .alias("p"))
        .filter(F.col("_vpos")
                == F.floor(F.col("p") * (F.col("_n") - 1)) + 1)
        .select(*by, "p", F.col("val").alias("est"))
    )


def quantile_sql(
    value_expr: str, ident_expr: str, table: str, by: str,
    k: int = 256, probs: tuple[float, ...] = (0.5,),
) -> str:
    """DuckDB twin of quantile_sketch → quantile_estimate (one group
    column) — the same md5 fraction, bottom-k selection, and
    lower-quantile rank arithmetic."""
    plist = ", ".join(f"CAST({float(p)} AS DOUBLE)" for p in probs)
    return f"""
SELECT {by}, p, val AS est
FROM (
  SELECT {by}, val,
         row_number() OVER (PARTITION BY {by}
                            ORDER BY val ASC, frac ASC) AS vpos,
         count(*) OVER (PARTITION BY {by}) AS n
  FROM (
    SELECT {by}, frac, val, row_number() OVER (
             PARTITION BY {by} ORDER BY frac ASC, val ASC) AS pos
    FROM (SELECT DISTINCT {by},
                 ('0x' || substr(md5(CAST({ident_expr} AS VARCHAR)), 1, 13))
                   ::BIGINT / {_FRAC_DEN} AS frac,
                 CAST({value_expr} AS DOUBLE) AS val
          FROM {table}
          WHERE {value_expr} IS NOT NULL
            AND NOT isnan(CAST({value_expr} AS DOUBLE))
            AND {ident_expr} IS NOT NULL) h) r
  WHERE pos <= {k}) s
CROSS JOIN (SELECT unnest([{plist}]) AS p) pp
WHERE vpos = floor(p * (n - 1)) + 1
"""
