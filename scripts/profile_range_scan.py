"""Phase profile for the range_scan family (guide §1: measure first).

range_scan_10 resolves at most ~1000 matched rows yet benches ~3.8s
while full_scan (the ENTIRE table at maxVersions=3) reads ~1.5s — the
per-op cost is NOT matched-row volume.  Split the op into cumulative
phases so the ~2.5s delta attributes to a phase, not a guess:

  scan_count      — parquet scan of the stored segment, bare count
  scan_pred       — scan + the 100-term OR row-range predicate, count
  scan_pred_noop  — same, materialized through the noop sink (all
                    columns, guide §1.4 — count() can prune)
  resolve_only    — resolve(maxv=1) over the UNfiltered cells, count
                    (the full_scan shape at this spec)
  full_op         — the shipped plan: cells_for_ranges + pred +
                    resolve + count (what bench times)
  full_op_2nd     — same DataFrame re-counted (plan/codegen warm) —
                    a big gap vs full_op means per-plan overhead
                    (planning/codegen), not data work

Run alone on an idle host.  Usage:
  python scripts/profile_range_scan.py [sf_dir] [span] [attempts]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else B.SF_DIR
    span = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    attempts = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from hbase_snapshot_spark.resolve import ResolveSpec, resolve

    spark = B.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    B.calibrate(spark)  # warmup, discarded

    import tempfile

    workdir = tempfile.mkdtemp(prefix="profrs-")
    bench = B.Bench(spark, sf_dir, workdir)
    bench.bulk_write()  # untimed setup: the stored table every scan reads

    seed = {10: 41, 100: 43, 1000: 47, 10000: 53}.get(span, 41)
    rng = random.Random(seed)
    pred = None
    ranges = []
    for _ in range(100):
        s = rng.randrange(max(1, bench.n_orders - span))
        lo, hi = f"{s:012d}", f"{s + span:012d}"
        ranges.append((lo, hi))
        p = (F.col("row") >= lo) & (F.col("row") < hi)
        pred = p if pred is None else (pred | p)

    def best_of(fn, n=attempts):
        best = 1e9
        for _ in range(n):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    out = {"sf_dir": sf_dir, "span": span, "calib": B.calibrate(spark)}

    cells = bench.table.cells()
    out["scan_count"] = best_of(lambda: cells.count())
    out["scan_pred"] = best_of(lambda: cells.filter(pred).count())
    out["scan_pred_noop"] = best_of(
        lambda: cells.filter(pred).write.format("noop")
        .mode("overwrite").save())
    out["resolve_only"] = best_of(
        lambda: resolve(cells, spec=ResolveSpec(max_versions=1)).count())

    def full_op():
        c = bench.table.cells_for_ranges(ranges).filter(pred)
        return resolve(c, spec=ResolveSpec(max_versions=1)).count()

    out["full_op"] = best_of(full_op)
    warm = resolve(bench.table.cells_for_ranges(ranges).filter(pred),
                   spec=ResolveSpec(max_versions=1))
    warm.count()
    out["full_op_2nd"] = best_of(lambda: warm.count())
    out["calib_after"] = B.calibrate(spark)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
