"""KMV / HyperLogLog sketch tests: merge losslessness (the property
that makes sketches usable as pre-aggregated rollups), exactness below
the register budget, and accuracy at realistic cardinalities."""

import pytest
from pyspark.sql import functions as F

from hbase_snapshot_spark.operators import sketches as sk


@pytest.fixture(scope="module")
def users(spark):
    # 2000 rows over 700 distinct users, one group
    rows = [(i % 700, "g") for i in range(2000)]
    return spark.createDataFrame(rows, ["user_id", "grp"])


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(i % 10, "g") for i in range(50)],
                               ["user_id", "grp"])
    est = sk.kmv_estimate(
        sk.kmv_sketch(df, F.col("user_id"), ["grp"], k=64), ["grp"], k=64
    ).collect()[0].est
    assert est == 10.0  # sketch not full -> exact


def test_kmv_accuracy(users):
    import hashlib

    est = sk.kmv_estimate(
        sk.kmv_sketch(users, F.col("user_id"), ["grp"], k=256),
        ["grp"], k=256,
    ).collect()[0].est
    # pin against the pure-python KMV of the same md5 hash (these keys
    # happen to land 5.4% high) AND a loose accuracy bound
    fr = sorted(
        int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) / 16 ** 13
        for i in range(700))
    assert est == round(255 / fr[255], 6)
    assert abs(est - 700) / 700 < 0.15


def test_kmv_merge_lossless(users):
    """sketch(A) merge sketch(B) must equal sketch(A ∪ B) exactly."""
    a = users.filter(F.col("user_id") % 2 == 0)
    b = users.filter(F.col("user_id") % 3 != 0)  # overlapping halves
    sa = sk.kmv_sketch(a, F.col("user_id"), ["grp"], k=64)
    sb = sk.kmv_sketch(b, F.col("user_id"), ["grp"], k=64)
    merged = sk.kmv_merge(sa, sb, ["grp"], k=64)
    whole = sk.kmv_sketch(
        a.unionByName(b), F.col("user_id"), ["grp"], k=64)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect()))


def test_hll_accuracy_and_registers(users):
    reg = sk.hll_sketch(users, F.col("user_id"), ["grp"])
    rows = reg.collect()
    assert all(0 <= r.bucket < 256 and 1 <= r.rho <= 53 for r in rows)
    est = sk.hll_estimate(reg, ["grp"]).collect()[0].est
    assert abs(est - 700) / 700 < 0.20  # ~1.04/sqrt(256) = 6.5% expected


def test_hll_merge_lossless(users):
    a = users.filter(F.col("user_id") < 350)
    b = users.filter(F.col("user_id") >= 300)  # overlap 300..349
    sa = sk.hll_sketch(a, F.col("user_id"), ["grp"])
    sb = sk.hll_sketch(b, F.col("user_id"), ["grp"])
    merged = sk.hll_merge(sa, sb, ["grp"])
    whole = sk.hll_sketch(
        a.unionByName(b), F.col("user_id"), ["grp"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect()))
    # and therefore identical estimates
    em = sk.hll_estimate(merged, ["grp"]).collect()[0].est
    ew = sk.hll_estimate(whole, ["grp"]).collect()[0].est
    assert em == ew


def test_hll_small_range_correction(spark):
    # tiny cardinality forces the linear-counting branch:
    # E = m * ln(m / V) with V empty registers
    import math

    df = spark.createDataFrame([(i, "g") for i in range(5)],
                               ["user_id", "grp"])
    reg = sk.hll_sketch(df, F.col("user_id"), ["grp"])
    nonempty = reg.count()
    est = sk.hll_estimate(reg, ["grp"]).collect()[0].est
    assert est == round(256.0 * math.log(256.0 / (256 - nonempty)), 4)
    assert abs(est - 5) < 1.0


def test_rho_distribution(spark):
    # rho=1 must occur for ~half of hashes (first bit set)
    df = spark.createDataFrame([(i, "g") for i in range(1000)],
                               ["user_id", "grp"])
    reg = sk.hll_sketch(df, F.col("user_id"), ["grp"])
    # max rho over 1000 keys is plausibly ~log2(1000/256)+few; just pin
    # the hard bounds and that registers cover most buckets
    rows = reg.collect()
    assert len(rows) > 200  # 1000 keys into 256 buckets: most occupied
    assert max(r.rho for r in rows) < 30


def test_kmv_set_estimates(spark):
    # A = 0..499, B = 250..749: union 750, intersection 250, J = 1/3
    a = spark.createDataFrame([(i, "g") for i in range(500)],
                              ["user_id", "grp"])
    b = spark.createDataFrame([(i, "g") for i in range(250, 750)],
                              ["user_id", "grp"])
    sa = sk.kmv_sketch(a, F.col("user_id"), ["grp"], k=256)
    sb = sk.kmv_sketch(b, F.col("user_id"), ["grp"], k=256)
    r = sk.kmv_set_estimates(sa, sb, ["grp"], k=256).collect()[0]
    assert abs(r.union_est - 750) / 750 < 0.15
    assert abs(r.jaccard - 1 / 3) < 0.12
    assert abs(r.intersect_est - 250) / 250 < 0.35


def test_kmv_set_estimates_disjoint_and_identical(spark):
    a = spark.createDataFrame([(i, "g") for i in range(100)],
                              ["user_id", "grp"])
    b = spark.createDataFrame([(i, "g") for i in range(100, 200)],
                              ["user_id", "grp"])
    sa = sk.kmv_sketch(a, F.col("user_id"), ["grp"], k=64)
    sb = sk.kmv_sketch(b, F.col("user_id"), ["grp"], k=64)
    r = sk.kmv_set_estimates(sa, sb, ["grp"], k=64).collect()[0]
    assert r.jaccard == 0.0 and r.intersect_est == 0.0
    r2 = sk.kmv_set_estimates(sa, sa, ["grp"], k=64).collect()[0]
    assert r2.jaccard == 1.0


def test_cms_exact_at_low_collision(spark):
    # few keys, many counters: estimates equal exact counts; absent
    # key reads 0
    rows = [(i % 5, "g") for i in range(100)]  # keys 0..4, 20 each
    df = spark.createDataFrame(rows, ["user_id", "grp"])
    sketch = sk.cms_sketch(df, F.col("user_id"), ["grp"])
    keys = spark.createDataFrame([(i,) for i in range(6)], ["k"])
    est = {r.k: r.est for r in sk.cms_query(
        sketch, keys, "k", ["grp"]).collect()}
    assert est == {0: 20, 1: 20, 2: 20, 3: 20, 4: 20, 5: 0}


def test_cms_never_underestimates(spark):
    rows = [(i % 300, "g") for i in range(3000)]
    df = spark.createDataFrame(rows, ["user_id", "grp"])
    sketch = sk.cms_sketch(df, F.col("user_id"), ["grp"])
    keys = spark.createDataFrame([(i,) for i in range(50)], ["k"])
    est = {r.k: r.est for r in sk.cms_query(
        sketch, keys, "k", ["grp"]).collect()}
    assert all(est[i] >= 10 for i in range(50))  # true count = 10
    # and the overestimate stays within the CMS bound comfortably
    assert all(est[i] <= 10 + 2 * 2.718 / 256 * 3000 for i in range(50))


def test_cms_merge_is_sum(spark):
    a = spark.createDataFrame([(1, "g")] * 7, ["user_id", "grp"])
    b = spark.createDataFrame([(1, "g")] * 5, ["user_id", "grp"])
    merged = sk.cms_merge(
        sk.cms_sketch(a, F.col("user_id"), ["grp"]),
        sk.cms_sketch(b, F.col("user_id"), ["grp"]), ["grp"])
    keys = spark.createDataFrame([(1,)], ["k"])
    est = sk.cms_query(merged, keys, "k", ["grp"]).collect()[0].est
    assert est == 12


def test_cms_sql_null_only_group_matches_spark(spark, tmp_path):
    # A group whose keys are ALL NULL must be absent from BOTH engines:
    # Spark enumerates groups from the null-filtered sketch; the oracle's
    # groups subquery must carry the same IS NOT NULL predicate (ADVICE
    # r8: an unfiltered SELECT DISTINCT {by} surfaced the group with
    # est=0 in the oracle only).
    import duckdb

    rows = [(1, "g1")] * 4 + [(2, "g1")] * 2 + [(None, "gnull")] * 3
    df = spark.createDataFrame(rows, "user_id long, grp string")
    pdf_path = str(tmp_path / "ev.parquet")
    df.write.parquet(pdf_path)

    sketch = sk.cms_sketch(df, F.col("user_id"), ["grp"])
    keys = spark.createDataFrame([(1,), (2,)], "k long")
    got = sorted(
        (r.grp, r.k, r.est)
        for r in sk.cms_query(sketch, keys, "k", ["grp"]).collect())

    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM read_parquet('{pdf_path}/*.parquet')")
    want = sorted(
        (g, k, float(e))
        for g, k, e in con.sql(sk.cms_sql(
            "user_id", "t", "grp",
            "SELECT unnest([1, 2]) AS k")).fetchall())
    assert got == want
    assert {g for g, _, _ in got} == {"g1"}  # gnull absent from both


# ------------------------------------------------- quantile sample (r10)


def test_quantile_sketch_exact_below_k(spark):
    """n < k: the sample IS the group — estimates equal the exact
    lower quantiles."""
    import random

    from hbase_snapshot_spark.operators import sketches as sk

    rng = random.Random(5)
    vals = [rng.uniform(0, 100) for _ in range(60)]
    # a NaN and a NULL row must both be excluded (streaming parity:
    # pandas folds NULL into NaN, so the batch side drops both)
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)]
        + [(900, "g", float("nan")), (901, "g", None)],
        "id long, g string, v double")
    est = {r.p: r.est for r in sk.quantile_estimate(
        sk.quantile_sketch(df, F.col("v"), F.col("id"), ["g"], k=256),
        ["g"], probs=(0.0, 0.25, 0.5, 0.9, 1.0)).collect()}
    sv = sorted(vals)
    for p, e in est.items():
        import math
        assert e == sv[math.floor(p * (len(sv) - 1))], p


def test_quantile_sketch_merge_register_exact(spark):
    from hbase_snapshot_spark.operators import sketches as sk

    df = spark.createDataFrame(
        [(i, f"g{i % 3}", float((i * 131) % 997)) for i in range(3000)],
        "id long, g string, v double")
    a, b = df.filter("id % 2 = 0"), df.filter("id % 2 = 1")
    m = sk.quantile_merge(
        sk.quantile_sketch(a, F.col("v"), F.col("id"), ["g"], k=64),
        sk.quantile_sketch(b, F.col("v"), F.col("id"), ["g"], k=64),
        ["g"], k=64)
    whole = sk.quantile_sketch(df, F.col("v"), F.col("id"), ["g"], k=64)
    assert sorted(map(tuple, m.collect())) \
        == sorted(map(tuple, whole.collect()))


def test_quantile_sketch_accuracy_and_determinism(spark):
    """k=256 over 20k skewed values: every estimated quantile's TRUE
    rank is within 5 rank-percent of the target (the O(1/sqrt(k))
    sampling bound with slack), and the sketch is a pure function of
    the data (identical registers from 1-partition and 32-partition
    layouts)."""
    from hbase_snapshot_spark.operators import sketches as sk

    rows = [(i, "g", float((i * i) % 7919)) for i in range(20000)]
    one = spark.createDataFrame(rows, "id long, g string, v double").coalesce(1)
    many = spark.createDataFrame(rows, "id long, g string, v double").repartition(32)
    r1 = sorted(map(tuple, sk.quantile_sketch(
        one, F.col("v"), F.col("id"), ["g"], k=256).collect()))
    r2 = sorted(map(tuple, sk.quantile_sketch(
        many, F.col("v"), F.col("id"), ["g"], k=256).collect()))
    assert r1 == r2
    est = {r.p: r.est for r in sk.quantile_estimate(
        sk.quantile_sketch(many, F.col("v"), F.col("id"), ["g"], k=256),
        ["g"], probs=(0.1, 0.5, 0.9)).collect()}
    vals = sorted(v for _, _, v in rows)
    import bisect
    for p, e in est.items():
        true_rank = bisect.bisect_right(vals, e) / len(vals)
        assert abs(true_rank - p) < 0.05, (p, e, true_rank)


def test_quantile_sketch_partial_prune_plan(spark):
    """the map-side WindowGroupLimit partial prune must be in the plan
    (the shuffle carries <= k registers per group per task, never the
    raw value multiset) — same pin as the KMV register pass."""
    from hbase_snapshot_spark.operators import sketches as sk

    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(100)], "id long, g string, v double")
    qs = sk.quantile_sketch(df, F.col("v"), F.col("id"), ["g"], k=16)
    plan = qs._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan, plan
