"""The r14 range-scan plan change (bench.Bench._restrict_row_bands):
the 100-term OR row-band predicate became a block-bucket broadcast
LEFT SEMI join.  These tests pin that the two formulations select
EXACTLY the same cells — including overlapping bands (semi join must
not duplicate), band boundaries (closed lo, open hi), and bands that
straddle block borders."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench as B


def _mk_cells(spark, n=500, versions=2):
    rows = []
    for i in range(n):
        for v in range(versions):
            rows.append((f"{i:012d}", "o", "c", 100 + v, 4, f"v{i}.{v}"))
    return spark.createDataFrame(
        rows, "row STRING, family STRING, qualifier STRING, ts LONG, "
              "type INT, value STRING")


def _or_pred(bands):
    pred = None
    for lo, hi in bands:
        p = (F.col("row") >= lo) & (F.col("row") < hi)
        pred = p if pred is None else (pred | p)
    return pred


def _assert_same(spark, cells, bands, block):
    bench = B.Bench.__new__(B.Bench)
    bench.spark = spark
    got = bench._restrict_row_bands(cells, bands, block=block)
    want = cells.filter(_or_pred(bands))
    assert got.columns == cells.columns  # schema preserved, helper col dropped
    g = sorted(got.collect())
    w = sorted(want.collect())
    assert g == w, (len(g), len(w))


def test_bands_match_or_predicate_disjoint(spark):
    cells = _mk_cells(spark)
    bands = [(f"{s:012d}", f"{s + 10:012d}") for s in (5, 120, 300, 490)]
    _assert_same(spark, cells, bands, block=10)


def test_bands_overlapping_no_duplicates(spark):
    cells = _mk_cells(spark)
    # heavy overlap: rows in [100, 148) matched by up to 4 bands
    bands = [(f"{s:012d}", f"{s + 30:012d}") for s in (100, 105, 110, 118)]
    bench = B.Bench.__new__(B.Bench)
    bench.spark = spark
    got = bench._restrict_row_bands(cells, bands, block=30)
    # 48 distinct rows x 2 versions, each exactly once (no join dup)
    assert got.count() == 96
    assert got.select("row", "ts").distinct().count() == 96
    _assert_same(spark, cells, bands, block=30)


def test_bands_boundaries_closed_lo_open_hi(spark):
    cells = _mk_cells(spark, n=50, versions=1)
    bands = [("000000000010", "000000000020")]
    bench = B.Bench.__new__(B.Bench)
    bench.spark = spark
    got = bench._restrict_row_bands(cells, bands, block=7)  # straddles blocks
    rows = sorted(r["row"] for r in got.collect())
    assert rows == [f"{i:012d}" for i in range(10, 20)]


def test_bands_plan_is_broadcast_hash_semi_join(spark):
    # the whole point of the block bucketing: the band restriction must
    # plan as a broadcast HASH join on the block id (LeftSemi) with the
    # band bounds as the join residual — a BroadcastNestedLoopJoin
    # would evaluate every band against every cell, the O(cells x
    # bands) shape the r14 rewrite removed
    cells = _mk_cells(spark, n=100, versions=1)
    bands = [(f"{s:012d}", f"{s + 10:012d}") for s in (5, 50)]
    bench = B.Bench.__new__(B.Bench)
    bench.spark = spark
    got = bench._restrict_row_bands(cells, bands, block=10)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("simple")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bands_block_larger_and_smaller_than_span(spark):
    cells = _mk_cells(spark, n=300, versions=1)
    bands = [(f"{s:012d}", f"{s + 25:012d}") for s in (3, 90, 260)]
    for block in (5, 25, 100, 1000):
        _assert_same(spark, cells, bands, block=block)
