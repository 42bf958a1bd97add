"""Chase the random_seek_scan 32-core inversion (VERDICT r14 Next #2).

The r14 driver gate read the op at 3.51s on local[32] but 1.72s on
local[8] (scaling ratio 0.49 — twice as fast on a quarter of the
cores), with attempt stability 1.45.  Two candidate explanations:

  storm     — the 32-core run drew a throttle window (the r14 builder's
              five suite runs and the 8-core driver run all read
              1.59-1.79s); the per-attempt probes decide.
  pathology — a genuine 32-way small-partition overhead: the banded
              population is ~12k rows, and the resolve exchange +
              dense_rank window slice it into `spark.sql.shuffle
              .partitions` tasks whose per-task fixed cost exceeds the
              work.

This script measures the op END TO END (same code path as bench) in a
FRESH SparkSession per (cpus, variant) cell, best-of-N with bracketing
calibration probes, and records the AQE-final shuffle-read partition
counts of the op's plan so the "sliced 32 ways" hypothesis is checked
against what AQE actually executes, not against the static config:

  cpus x variant grid:
    base      — bench config: shuffle.partitions=cpus, AQE coalesce ON
                (what the driver measures)
    nocoalesce— AQE partition coalescing OFF: if the inversion is
                small-partition overhead, this gets WORSE at 32 cores
    sp8       — shuffle.partitions=8 at 32 cores: the "fewer shuffle
                partitions" probe; if base ~= sp8, AQE was already
                coalescing and partitioning is not the problem

Usage: python scripts/seek_scaling.py [out.json]   (env like bench.py)
Run ALONE on an idle host; interleave cells so one storm window cannot
poison exactly one cell.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402


def make_spark(cpus: int, shuffle_partitions: int, coalesce: bool):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"seek-scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled",
                "true" if coalesce else "false")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def final_partition_counts(df) -> dict:
    """EXECUTED partition count of the op's final (window) stage — a
    distinct spark_partition_id() over the plan, so AQE's runtime
    coalescing is measured, not the static shuffle.partitions config
    (an explainString of the un-executed QueryExecution reads
    isFinalPlan=false and shows nothing: df.count() builds its own
    execution)."""
    from pyspark.sql import functions as F

    return {
        "executed_final_stage_partitions": df.select(
            F.spark_partition_id().alias("p")).distinct().count(),
    }


def seek_df(bench):
    """The op's DataFrame, exactly as bench.random_seek_scan builds it."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hbase_snapshot_spark.resolve import ResolveSpec, resolve

    BLOCK, SPAN = 1000, 120
    rng = random.Random(59)
    seeks, ranges = [], []
    for i in range(100):
        s = rng.randrange(max(1, bench.n_orders - SPAN))
        ranges.append((f"{s:012d}", f"{s + SPAN:012d}"))
        for blk in range(s // BLOCK, (s + SPAN) // BLOCK + 1):
            seeks.append((i, f"{s:012d}", f"{s + SPAN:012d}", blk))
    seek = bench.spark.createDataFrame(
        seeks, "seek_id INT, start STRING, stop STRING, blk LONG")
    cells = bench._restrict_row_bands(
        bench.table.cells_for_ranges(ranges), ranges, block=SPAN
    ).withColumn("blk", F.floor(F.col("row").cast("long") / BLOCK))
    rows = resolve(cells, spec=ResolveSpec(max_versions=1))
    joined = rows.join(F.broadcast(seek), on="blk").filter(
        (F.col("row") >= F.col("start")) & (F.col("row") < F.col("stop")))
    w = Window.partitionBy("seek_id").orderBy("row")
    return joined.withColumn("rk", F.dense_rank().over(w)).filter(
        F.col("rk") <= 100)


def run_cell(cpus: int, shuffle_partitions: int, coalesce: bool,
             attempts: int) -> dict:
    spark = make_spark(cpus, shuffle_partitions, coalesce)
    spark.sparkContext.setLogLevel("ERROR")
    B.calibrate(spark)  # warmup
    workdir = tempfile.mkdtemp(prefix=f"seekscale-{cpus}-")
    bench = B.Bench(spark, B.SF_DIR, workdir)
    bench.bulk_write()  # untimed setup
    att = []
    plan = None
    for _ in range(attempts):
        pre = B.calibrate(spark)
        df = seek_df(bench)
        t0 = time.time()
        n = df.count()
        wall = round(time.time() - t0, 3)
        post = B.calibrate(spark)
        att.append({"sec": wall, "calib": pre["total"],
                    "calib_after": post["total"], "rows": n})
        if plan is None:
            plan = final_partition_counts(df)
    import shutil

    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()
    best = min(a["sec"] for a in att)
    med = sorted(a["sec"] for a in att)[len(att) // 2]
    return {"cpus": cpus, "shuffle_partitions": shuffle_partitions,
            "coalesce": coalesce, "attempts": att, "best": best,
            "median": med, "plan": plan}


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SEEK_SCALING_r15.json"
    cells = [
        ("c32_base", 32, 32, True),
        ("c8_base", 8, 8, True),
        ("c32_nocoalesce", 32, 32, False),
        ("c32_sp8", 32, 8, True),
        ("c32_base2", 32, 32, True),  # repeat guards one-window poisoning
    ]
    out = {"sf_dir": B.SF_DIR, "cells": {}}
    for name, cpus, sp, co in cells:
        out["cells"][name] = run_cell(cpus, sp, co, attempts=5)
        print(f"{name}: best={out['cells'][name]['best']} "
              f"median={out['cells'][name]['median']} "
              f"probes={[a['calib'] for a in out['cells'][name]['attempts']]}",
              flush=True)
    b32 = min(out["cells"]["c32_base"]["best"],
              out["cells"]["c32_base2"]["best"])
    out["scaling_ratio_8c_over_32c"] = round(
        out["cells"]["c8_base"]["best"] / b32, 3)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: {"best": v["best"], "median": v["median"]}
                      for k, v in out["cells"].items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
