"""Capture ``.explain('formatted')`` for every bench workload's core
DataFrame and every declared query, into plans/<tag>/<name>_<suffix>.txt
(the optimization-round deliverable: plan evidence the judge can check
without running Spark).

Bench workloads are reconstructed as DataFrames (the bench methods
call actions internally); declared queries come straight from
``__spark_entry__.queries()``.

Usage:
  python scripts/capture_plans.py before            # all, sf0.01 queries
  python scripts/capture_plans.py after q1 q2 ...   # subset
"""

from __future__ import annotations

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as B

QUERY_SF_DIR = os.environ.get("PLAN_QUERY_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(REPO, "plans", os.environ.get("PLAN_TAG", "r14"))


def _explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def bench_frames(spark, bench):
    """name -> lazily-built core DataFrame for each read workload (the
    write workloads' cost is the write itself; their plan is the input
    melt, captured as bulk_write_melt)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hbase_snapshot_spark.client import Scan, Table
    from hbase_snapshot_spark.filters import (
        CompareOp,
        FilterList,
        PageFilter,
        SingleColumnValueFilter,
        WhileMatchFilter,
    )
    from hbase_snapshot_spark.parity import encode_orders_cells
    from hbase_snapshot_spark.resolve import ResolveSpec, resolve

    out = {}
    out["bulk_write_melt"] = lambda: encode_orders_cells(
        spark, bench.sf_dir, input_partitions=B.CPUS)

    def point_get():
        rng = random.Random(42)
        keys = [f"{rng.randrange(bench.n_orders):012d}" for _ in range(1000)]
        cells = bench.table.cells_for_ranges([(k, k) for k in keys]).filter(
            F.col("row").isin(keys))
        return resolve(cells, spec=ResolveSpec(max_versions=1))

    out["point_get"] = point_get

    def range_scan(span, seed):
        def mk():
            # mirror bench._range_scan exactly (r14: band semi-join)
            rng = random.Random(seed)
            ranges = []
            for _ in range(100):
                s = rng.randrange(max(1, bench.n_orders - span))
                ranges.append((f"{s:012d}", f"{s + span:012d}"))
            cells = bench._restrict_row_bands(
                bench.table.cells_for_ranges(ranges), ranges, block=span)
            return resolve(cells, spec=ResolveSpec(max_versions=1))

        return mk

    out["range_scan_10"] = range_scan(10, 41)
    out["range_scan_100"] = range_scan(100, 43)
    out["range_scan_1000"] = range_scan(1000, 47)
    out["range_scan_10000"] = range_scan(10000, 53)
    out["full_scan"] = lambda: resolve(
        bench.table.cells(), spec=ResolveSpec(max_versions=3))

    def seek_scan():
        BLOCK, SPAN = 1000, 120
        rng = random.Random(59)
        seeks = []
        ranges = []
        for i in range(100):
            s = rng.randrange(max(1, bench.n_orders - SPAN))
            ranges.append((f"{s:012d}", f"{s + SPAN:012d}"))
            for blk in range(s // BLOCK, (s + SPAN) // BLOCK + 1):
                seeks.append((i, f"{s:012d}", f"{s + SPAN:012d}", blk))
        seek_df = spark.createDataFrame(
            seeks, "seek_id INT, start STRING, stop STRING, blk LONG")
        # mirror bench.random_seek_scan exactly (r14: band semi-join
        # pre-resolve; the blk attribution join unchanged)
        cells = bench._restrict_row_bands(
            bench.table.cells_for_ranges(ranges), ranges, block=SPAN
        ).withColumn("blk", F.floor(F.col("row").cast("long") / BLOCK))
        rows = resolve(cells, spec=ResolveSpec(max_versions=1))
        joined = rows.join(F.broadcast(seek_df), on="blk").filter(
            (F.col("row") >= F.col("start")) & (F.col("row") < F.col("stop")))
        w = Window.partitionBy("seek_id").orderBy("row")
        return joined.withColumn("rk", F.dense_rank().over(w)).filter(
            F.col("rk") <= 100)

    out["random_seek_scan"] = seek_scan

    def sequential_read():
        rows = resolve(bench.table.cells(), spec=ResolveSpec(max_versions=1))
        return rows.repartitionByRange(B.CPUS, "row").sortWithinPartitions(
            "row", "family", "qualifier")

    out["sequential_read"] = sequential_read

    def filter_scan():
        t = Table(bench.table.cells())
        return t.scan(Scan(filter=FilterList(FilterList.MUST_PASS_ALL, [
            SingleColumnValueFilter("o", "status", CompareOp.EQUAL, "F"),
            WhileMatchFilter(PageFilter(120)),
        ])))

    out["filter_scan"] = filter_scan

    def snapshot_row_count():
        # the snapshot_restore op's verification read (its dominant
        # cost): the DataFrame row_count counts.  r15 exposes it as
        # _row_count_df; older trees (before-capture) computed
        # scan().select(row).distinct() inline.
        c = bench.table.client()
        fn = getattr(c, "_row_count_df", None)
        if fn is not None:
            return fn()
        return c.scan(Scan()).select("row").distinct()

    out["snapshot_row_count"] = snapshot_row_count

    def zorder():
        from hbase_snapshot_spark.operators.layout import zorder_layout

        li = spark.read.parquet(f"{bench.sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice")
        return zorder_layout(li, ["l_partkey", "l_suppkey"],
                             n_partitions=B.CPUS)

    out["zorder_write"] = zorder
    return out


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT_DIR, exist_ok=True)

    spark = B.make_spark()
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    workdir = tempfile.mkdtemp(prefix="plans-")
    bench = B.Bench(spark, B.SF_DIR, workdir)
    names = {}

    # bench setup (bulk_write + all bench frames) is only needed when a
    # requested name is a BENCH workload; bare query names (the
    # documented `after q1 q2` usage, no `q:` prefix) must not trigger
    # it (r14 advice) — normalize against the known query set
    import __spark_entry__ as _e

    qnames = set(_e.queries())
    needs_bench = not only or any(
        not (n.startswith("q:") or n in qnames) for n in only)
    if needs_bench:
        bench.bulk_write()  # setup for the stored-table read plans
        names.update(bench_frames(spark, bench))

    import __spark_entry__ as e

    for qname, fn in e.queries().items():
        names[f"q:{qname}"] = (
            lambda fn=fn: fn(spark, QUERY_SF_DIR))

    done = []
    for name, mk in names.items():
        if only and name not in only and name.replace("q:", "") not in only:
            continue
        fname = name.replace("q:", "query_") + f"_{suffix}.txt"
        try:
            txt = _explain_str(mk())
        except Exception as ex:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {ex}"
        with open(os.path.join(OUT_DIR, fname), "w") as f:
            f.write(txt)
        done.append(fname)
    print(f"wrote {len(done)} plans to {OUT_DIR}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
