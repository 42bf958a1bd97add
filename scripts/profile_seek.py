"""Profile random_seek_scan (BASELINE §F worst row, 1.58x two rounds).

Phases timed separately on the same stored table bench uses:
  resolve_full   — resolve(maxv=1) over ALL cells, count (the plan's base)
  current        — the shipped plan: full resolve -> broadcast blk join
                   -> band filter -> dense_rank cap
  pushdown       — candidate: blk InSet filter on raw cells BEFORE
                   resolve, so the resolve exchange only carries the
                   ~12k banded rows, then the same join/rank tail

Run alone on an idle host (bench discipline).  Usage:
  python scripts/profile_seek.py [sf_dir] [attempts]
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B


def build_seeks(spark, n_orders):
    from pyspark.sql import functions as F  # noqa: F401

    BLOCK, SPAN = 1000, 120
    rng = random.Random(59)
    seeks = []
    for i in range(100):
        s = rng.randrange(max(1, n_orders - SPAN))
        for blk in range(s // BLOCK, (s + SPAN) // BLOCK + 1):
            seeks.append((i, f"{s:012d}", f"{s + SPAN:012d}", blk))
    df = spark.createDataFrame(seeks, "seek_id INT, start STRING, stop STRING, blk LONG")
    blks = sorted({b for (_i, _s, _e, b) in seeks})
    # the per-seek bands as closed (lo, hi) row ranges — the
    # cells_for_ranges shape the r14 bench plan prunes files with
    ranges = sorted({(st, sp) for (_i, st, sp, _b) in seeks})
    return df, blks, ranges


def plan_current(bench, seek_df):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hbase_snapshot_spark.resolve import ResolveSpec, resolve

    rows = resolve(bench.table.cells(), spec=ResolveSpec(max_versions=1)) \
        .withColumn("blk", F.floor(F.col("row").cast("long") / 1000))
    joined = rows.join(F.broadcast(seek_df), on="blk").filter(
        (F.col("row") >= F.col("start")) & (F.col("row") < F.col("stop"))
    )
    w = Window.partitionBy("seek_id").orderBy("row")
    return joined.withColumn("rk", F.dense_rank().over(w)).filter(F.col("rk") <= 100)


def plan_pushdown(bench, seek_df, blks, ranges=None):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hbase_snapshot_spark.resolve import ResolveSpec, resolve

    # r14: bench routes the seek bands through the file-skipping
    # manifest (cells_for_ranges — a no-op at 32 files, the file-level
    # carve at high file counts), then restricts the raw cells to the
    # EXACT seek bands via the block-bucket broadcast LEFT SEMI join
    # (bench._restrict_row_bands) before resolve — the old block InSet
    # kept ~every 1000-key block at bench scale, so resolve still ran
    # on ~the whole table.  Mirrors bench.random_seek_scan exactly.
    base = (bench.table.cells_for_ranges(ranges) if ranges is not None
            else bench.table.cells())
    if ranges is not None:
        bands = [(lo, hi) for lo, hi in ranges]
        cells = bench._restrict_row_bands(base, bands, block=120)
    else:
        cells = base
    cells = cells.withColumn(
        "blk", F.floor(F.col("row").cast("long") / 1000))
    if ranges is None:
        cells = cells.filter(F.col("blk").isin(blks))
    rows = resolve(cells, spec=ResolveSpec(max_versions=1))
    joined = rows.join(F.broadcast(seek_df), on="blk").filter(
        (F.col("row") >= F.col("start")) & (F.col("row") < F.col("stop"))
    )
    w = Window.partitionBy("seek_id").orderBy("row")
    return joined.withColumn("rk", F.dense_rank().over(w)).filter(F.col("rk") <= 100)


def plan_prefix(bench, seek_df, blks):
    """Like pushdown, but the block filter is an OR of row-key
    startswith(block-prefix) predicates — parquet-PUSHABLE
    (Or(StringStartsWith...)), so the range-sorted segments get
    row-group skipping, the thing that matters at 100 TB."""
    from functools import reduce

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hbase_snapshot_spark.resolve import ResolveSpec, resolve

    pred = reduce(
        lambda a, b: a | b,
        [F.col("row").startswith(f"{b:09d}") for b in blks],
    )
    cells = bench.table.cells().filter(pred).withColumn(
        "blk", F.floor(F.col("row").cast("long") / 1000)
    )
    rows = resolve(cells, spec=ResolveSpec(max_versions=1))
    joined = rows.join(F.broadcast(seek_df), on="blk").filter(
        (F.col("row") >= F.col("start")) & (F.col("row") < F.col("stop"))
    )
    w = Window.partitionBy("seek_id").orderBy("row")
    return joined.withColumn("rk", F.dense_rank().over(w)).filter(F.col("rk") <= 100)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else B.SF_DIR
    attempts = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import tempfile

    spark = B.make_spark()
    workdir = tempfile.mkdtemp(prefix="seekprof-")
    b = B.Bench(spark, sf_dir, workdir)
    b.bulk_write()  # stored sorted table, untimed here
    seek_df, blks, ranges = build_seeks(spark, b.n_orders)
    print(f"n_orders={b.n_orders} blocks={len(blks)}")

    from hbase_snapshot_spark.resolve import ResolveSpec, resolve

    def resolve_full():
        return resolve(b.table.cells(), spec=ResolveSpec(max_versions=1)).count()

    phases = {
        "resolve_full": resolve_full,
        "current": lambda: plan_current(b, seek_df).count(),
        "pushdown": lambda: plan_pushdown(b, seek_df, blks, ranges).count(),
        "prefix": lambda: plan_prefix(b, seek_df, blks).count(),
    }
    results = {}
    for name, fn in phases.items():
        ts, val = [], None
        for _ in range(attempts):
            t0 = time.time()
            val = fn()
            ts.append(round(time.time() - t0, 3))
        results[name] = (val, ts)
        print(f"{name:14s} rows={val} times={ts} best={min(ts)}")
    assert results["current"][0] == results["pushdown"][0], "row mismatch!"
    print("PLAN current:")
    plan_current(b, seek_df).explain("formatted")
    print("PLAN pushdown:")
    plan_pushdown(b, seek_df, blks, ranges).explain("formatted")


if __name__ == "__main__":
    main()
