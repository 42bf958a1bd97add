"""Quantify the file-skipping manifest's wall-clock payoff (VERDICT
r12 Next #5): tests/test_layout.py proves FILES are skipped; this
measures what that buys at 1x/3x/10x of the sf0.1 lineitem volume.

Per scale R: lineitem replicated R times with l_partkey/l_suppkey
key-space spreading (dense domains, scale_stress convention), written
z-ordered on (l_partkey, l_suppkey) with a file count that grows with
the data (32*R output files — the honest 100 TB model: more data means
more files, and the manifest's win is skipping FILE OPENS and task
launches, not just row groups).  Then, for a ~1%-selectivity range on
EACH clustered column (the second column is the one plain sorting
cannot serve):

  full    — spark.read.parquet(dir).filter(range).count(): Spark still
            row-group-prunes per file, but schedules/opens every file.
  pruned  — operators.layout.read_pruned: driver-side manifest prune
            of the file list, then the same residual filter.

Reports best-of-3 seconds each (probes bracketing, bench discipline:
run alone on an idle host), files kept/total, and row-count equality
between the two paths (a correctness tripwire, not the gate — the
oracle branch in __spark_entry__ owns correctness).

Usage: python scripts/pruned_read_bench.py [--reps 1,3,10] [out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as B  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scaled_lineitem(spark, reps: int):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{BASE}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice")
    if reps == 1:
        return li
    maxpk = li.agg(F.max("l_partkey")).collect()[0][0] + 1
    maxsk = li.agg(F.max("l_suppkey")).collect()[0][0] + 1
    parts = []
    for r in range(reps):
        parts.append(li.select(
            "l_orderkey",
            (F.col("l_partkey") + F.lit(r * maxpk)).alias("l_partkey"),
            (F.col("l_suppkey") + F.lit(r * maxsk)).alias("l_suppkey"),
            "l_quantity", "l_extendedprice"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn, n=3, spark=None, calib=None):
    best, att = None, []
    for _ in range(n):
        pre = B.calibrate(spark)
        t0 = time.time()
        fn()
        dt = time.time() - t0
        att.append({"sec": round(dt, 3), "calib": pre["total"]})
        if best is None or dt < best:
            best = dt
        if calib is not None:
            calib.append(pre)
    return round(best, 3), att


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", default="1,3,10")
    ap.add_argument("out", nargs="?", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from hbase_snapshot_spark.operators.layout import (
        SKIP_MANIFEST_NAME, read_pruned, zorder_write,
    )

    spark = B.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    B.calibrate(spark)

    work = tempfile.mkdtemp(prefix="pruned-read-")
    record = {"base": BASE, "cpus": B.CPUS, "scales": {}}
    try:
        for reps in [int(x) for x in args.reps.split(",")]:
            li = scaled_lineitem(spark, reps)
            d = os.path.join(work, f"z{reps}x")
            t0 = time.time()
            zorder_write(li, ["l_partkey", "l_suppkey"], d,
                         n_partitions=32 * reps)
            t_build = round(time.time() - t0, 3)
            with open(os.path.join(d, SKIP_MANIFEST_NAME)) as f:
                man = json.load(f)
            n_files = len(man["files"])
            n_rows = spark.read.parquet(d).count()

            entry = {"build_sec": t_build, "files": n_files,
                     "rows": n_rows, "queries": {}}
            # ~1% selectivity on each clustered column
            for col in ("l_partkey", "l_suppkey"):
                mx = spark.read.parquet(d).agg(F.max(col)).collect()[0][0]
                lo, hi = int(mx * 0.42), int(mx * 0.42 + max(1, mx * 0.01))
                bounds = {col: (lo, hi)}

                full_df = spark.read.parquet(d).filter(
                    (F.col(col) >= lo) & (F.col(col) <= hi))
                pruned_df = read_pruned(spark, d, bounds, manifest=man)
                c_full, c_pruned = full_df.count(), pruned_df.count()
                assert c_full == c_pruned, (col, c_full, c_pruned)
                kept = len(set(pruned_df.inputFiles())) if c_pruned else 0

                # both paths rebuild their plan inside the timed region
                # (the pruned path's driver-side manifest sweep is part
                # of its honest cost)
                t_full, att_f = timed(
                    lambda: spark.read.parquet(d).filter(
                        (F.col(col) >= lo) & (F.col(col) <= hi)).count(),
                    spark=spark)
                t_pruned, att_p = timed(
                    lambda: read_pruned(spark, d, bounds, manifest=man)
                    .count(), spark=spark)
                entry["queries"][col] = {
                    "rows": c_full, "files_kept": kept,
                    "full_sec": t_full, "pruned_sec": t_pruned,
                    "speedup": round(t_full / t_pruned, 2)
                    if t_pruned else None,
                    "attempts_full": att_f, "attempts_pruned": att_p,
                }
            record["scales"][f"{reps}x"] = entry
            shutil.rmtree(d, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    line = json.dumps(record)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
