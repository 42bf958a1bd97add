"""Quantify the TimeRangeTracker-parity win (r14): a time-bounded scan
over a many-segment edit log, pruned client vs unpruned twin.

The shape this feature exists for: WAL-append segments are unsorted by
row (row stats useless) but TIME-clustered — each commit's cells share
a ts window.  A recent-window scan (monitoring, TTL sweep, incremental
export) should open only the recent segments' files; without the
TS-ONLY manifests every file of every segment gets a Spark task just
to discard its rows.  At 100 TB an edit log is thousands of segments
and the files-kept share is the number that matters.

Builds one table with EPOCHS append_cells commits (epoch e stamped
ts = 1000·(e+1), ROWS_PER_EPOCH rows, FILES_PER_EPOCH files each),
then scans the LAST WINDOW epochs with Scan.time_range:

  pruned   — t.client().scan(...): run_scan passes resolve.ts_floor to
             cells_for_ranges, which drops whole files via the ts
             manifests
  unpruned — ClientTable(t.cells(), desc).scan(...): same plan minus
             the file pruning

Reports best-of-N wall seconds for both, the files-read counts, and
row parity.  Run ALONE on an idle host (bench discipline).
Usage: python scripts/measure_ts_prune.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402

EPOCHS = 24
ROWS_PER_EPOCH = 50_000
FILES_PER_EPOCH = 8
WINDOW = 2          # scan the last 2 epochs
ATTEMPTS = 3


def _epoch_cells(spark, n, parts, ts, epoch):
    from pyspark.sql import functions as F

    # row keys deliberately OVERLAP across epochs (the multi-version
    # edit-log shape): row stats could never carve these segments
    return spark.range(n).repartition(parts).select(
        F.format_string("%012d", F.col("id")).alias("row"),
        F.lit("f").alias("family"),
        F.lit("q").alias("qualifier"),
        F.lit(ts).cast("long").alias("ts"),
        F.lit(4).alias("type"),
        F.lit(epoch).cast("long").alias("seq"),
        F.format_string("v%d@%d", F.col("id"), F.lit(ts)).alias("value"),
    )


def main() -> int:
    from hbase_snapshot_spark.client import Scan
    from hbase_snapshot_spark.client import Table as ClientTable
    from hbase_snapshot_spark.model import FamilyDescriptor, TableDescriptor
    from hbase_snapshot_spark.table import TableStore

    spark = B.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    B.calibrate(spark)  # warmup

    base = tempfile.mkdtemp(prefix="tsprune-")
    store = TableStore(spark, base)
    t = store.create_table(
        TableDescriptor("log").add_family(FamilyDescriptor("f")))
    t0 = time.time()
    for e in range(EPOCHS):
        t.append_cells(_epoch_cells(
            spark, ROWS_PER_EPOCH, FILES_PER_EPOCH, 1000 * (e + 1), e))
    build_sec = round(time.time() - t0, 3)

    lo = 1000 * (EPOCHS - WINDOW + 1)          # last WINDOW epochs
    sc = Scan(max_versions=None, time_range=(lo, 1000 * (EPOCHS + 1)))
    cl = t.client()
    un = ClientTable(t.cells(), t.descriptor)

    pruned_df, unpruned_df = cl.scan(sc), un.scan(sc)
    n_pruned, n_unpruned = pruned_df.count(), unpruned_df.count()
    files_pruned = len(set(pruned_df.inputFiles()))
    files_total = len(set(unpruned_df.inputFiles()))

    record = {
        "epochs": EPOCHS, "rows_per_epoch": ROWS_PER_EPOCH,
        "files_per_epoch": FILES_PER_EPOCH, "window_epochs": WINDOW,
        "build_sec": build_sec,
        "rows_match": n_pruned == n_unpruned, "rows": n_pruned,
        "files_read_pruned": files_pruned, "files_read_unpruned": files_total,
        "clean_ref": B.CLEAN_CALIB_SEC,
    }
    # INTERLEAVED attempts (pruned, unpruned, pruned, ...): the host's
    # minutes-long throttle windows (BASELINE §G/§O) would otherwise
    # land asymmetrically on whichever phase runs first — the first run
    # of this script measured pruned 2.5s under 1.8-2.6x probes vs
    # unpruned 1.6s under 0.9x probes, a window artifact
    runs = {"pruned": lambda: cl.scan(sc), "unpruned": lambda: un.scan(sc)}
    secs = {n: [] for n in runs}
    calibs = {n: [] for n in runs}
    for _ in range(ATTEMPTS):
        for name, df_fn in runs.items():
            calibs[name].append(round(B.calibrate(spark)["total"], 3))
            s0 = time.time()
            df_fn().count()
            secs[name].append(round(time.time() - s0, 3))
    for name in runs:
        record[f"{name}_secs"] = secs[name]
        record[f"{name}_best"] = min(secs[name])
        record[f"{name}_calibs"] = calibs[name]
    record["speedup_best"] = round(
        record["unpruned_best"] / max(record["pruned_best"], 1e-9), 2)

    line = json.dumps(record)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
