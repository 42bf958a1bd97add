"""Deterministic sampling for training-data pipelines.

Hash-based sampling (md5 of the key → uniform fraction) is reproducible
across runs, engines, and cluster sizes — unlike ``df.sample`` whose
output depends on partitioning.  Stratified variant applies a
per-stratum rate (the standard data-mixture rebalancing step).

Both are pure Column expressions and have exact DuckDB oracle twins
(the md5-hex → fraction arithmetic is engine-portable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: stand-in hashed for NULL keys — md5(NULL) is NULL, and a NULL
#: fraction would silently DROP every null-keyed row at any rate (even
#: 1.0).  All NULL-key rows share this sentinel, so they sample as one
#: deterministic unit.  Mirrored in oracle_ops.hash_fraction_sql.
NULL_KEY_SENTINEL = "<NULL>"


def hash_fraction(key: Column) -> Column:
    """uniform [0,1) fraction from the first 8 hex chars of md5(key)"""
    k = F.coalesce(key.cast("string"), F.lit(NULL_KEY_SENTINEL))
    return F.conv(F.substring(F.md5(k), 1, 8), 16, 10).cast(
        "double"
    ) / float(1 << 32)


def hash_sample(df: DataFrame, key: Column, fraction: float) -> DataFrame:
    """keep rows whose hash fraction < fraction — deterministic,
    partition-independent sampling"""
    return df.filter(hash_fraction(key) < fraction)


def stratified_sample(
    df: DataFrame,
    key: Column,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
) -> DataFrame:
    """per-stratum deterministic sampling rates (data-mixture control):
    e.g. {'en': 0.1, 'de': 1.0} keeps 10% of English, all German,
    nothing else (default)."""
    rate = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(stratum)
        rate = F.when(cond, frac) if rate is None else rate.when(cond, frac)
    rate = rate.otherwise(F.lit(default)) if rate is not None else F.lit(default)
    return df.filter(hash_fraction(key) < rate)


def mixture_sample(
    df: DataFrame,
    key: Column,
    domain_col: str,
    weights: dict[str, float],
    token_budget: int,
    token_col: str,
) -> DataFrame:
    """Domain-mixture sampling to a token budget — the corpus-mixing
    step of a pre-training pipeline ("20% code, 30% web, ...").  Each
    domain d gets a token target ``budget * w_d / Σw`` and an
    acceptance rate ``min(1, target_d / domain_total_tokens)``;
    documents are kept by the deterministic hash fraction, so the
    expected kept-token mass per domain hits the target and the
    selection is reproducible on any cluster size.

    Scale shape (100 TB): per-domain totals are ONE map-side-combinable
    groupBy on a low-cardinality key; the tiny rate table broadcasts
    back; the keep-filter is a pure Column predicate.  No per-domain
    window / cumulative sum — that design puts an entire domain in one
    partition and dies on the first big domain.

    Domains absent from ``weights`` (and NULL domains) get rate 0 and
    are dropped.
    """
    wsum = float(sum(weights.values()))
    target = None
    for d, w in weights.items():
        t = float(token_budget) * float(w) / wsum
        cond = F.col(domain_col) == F.lit(d)
        target = F.when(cond, t) if target is None else target.when(cond, t)
    target = (
        target.otherwise(F.lit(0.0)) if target is not None else F.lit(0.0)
    )
    totals = df.groupBy(domain_col).agg(
        F.sum(F.col(token_col).cast("double")).alias("_domain_tokens")
    )
    rates = totals.select(
        F.col(domain_col),
        F.least(F.lit(1.0), target / F.col("_domain_tokens")).alias("_rate"),
    )
    out = df.join(F.broadcast(rates), domain_col)
    return out.where(hash_fraction(key) < F.col("_rate")).drop("_rate")


def importance_sample(
    df: DataFrame,
    key: Column,
    weight: Column,
    target_fraction: float,
) -> DataFrame:
    """Importance resampling (the DSIR shape — Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): keep
    each row with probability proportional to ``weight``, scaled so
    the EXPECTED kept fraction equals ``target_fraction``
    (p = min(1, w · f/mean(w))).  Weight is any non-negative Column —
    an LM log-ratio turned importance weight, a quality score, a
    length prior.

    Deterministic via the md5 hash fraction; the scale constant is a
    one-row mean aggregate broadcast back into the plan (no collect,
    no second pass over the data for the filter itself).
    """
    mean_w = df.agg(F.avg(weight.cast("double")).alias("_mean_w"))
    out = df.crossJoin(F.broadcast(mean_w))
    p = F.least(
        F.lit(1.0),
        weight.cast("double") * (F.lit(float(target_fraction)) / F.col("_mean_w")),
    )
    return out.where(hash_fraction(key) < p).drop("_mean_w")


# ------------------------------------------------- deterministic shuffle

def shuffle_key(key: Column, seed: int) -> Column:
    """deterministic 64-bit shuffle ordinal: xxhash64(seed, key).
    Seed-controlled, partition-independent, engine-stable — the basis
    of reproducible corpus shuffling (re-running with the same seed
    yields the same order on any cluster size)."""
    return F.xxhash64(F.lit(int(seed)), F.coalesce(
        key.cast("string"), F.lit(NULL_KEY_SENTINEL)))


def deterministic_shuffle(df: DataFrame, key: Column, seed: int = 0) -> DataFrame:
    """globally shuffle a corpus into a seeded pseudorandom total order
    (the pre-training 'shuffle the corpus once' step).  This is a
    range-partitioned global sort on the hash ordinal — use it only
    when a single totally-ordered stream is genuinely required; for
    sharded training input prefer ``shard_shuffle`` (one hash
    Exchange, no range sampling pass, no global Sort)."""
    return df.orderBy(shuffle_key(key, seed))


def shard_shuffle(
    df: DataFrame, key: Column, n_shards: int, seed: int = 0
) -> DataFrame:
    """deterministic shuffle INTO SHARDS — the scale path: rows land in
    shard pmod(xxhash64(seed,key), n) and are hash-ordered within the
    shard.  One hash Exchange + per-partition sort; no global range
    sort, so the plan is identical at 1 GB and 100 TB.  Writing the
    result with partitionBy('shard') (or per-partition writers) yields
    reproducible training shards; different seeds give independent
    epoch orders."""
    h = shuffle_key(key, seed)
    out = df.withColumn("shard", F.pmod(h, F.lit(int(n_shards))).cast("int"))
    # sort leads with 'shard': repartition(n, shard) HASH-partitions
    # the shard values, so two shards routinely share one physical
    # partition — sorting by the shuffle key alone interleaved their
    # rows, and a downstream partitionBy('shard') writer (whose own
    # SortExec on just 'shard' is not stable) could scramble the seeded
    # within-shard order this function exists to establish
    return (
        out.repartition(int(n_shards), F.col("shard"))
        .sortWithinPartitions("shard", shuffle_key(key, seed))
    )
