"""Isolate the random_seek_scan three-round creep (VERDICT r13 Wrong
#1: 1.55s r11 -> 1.75 r12 -> 2.68 r13 = 2.06x raw, the first breach of
the driver's 2x bar — with ZERO code change on the seek path in r13 and
the whole scan family moving together, the BASELINE §O host-state
signature; but unlike full_scan this op never got a same-round
clean-window re-measure, so it is marked weak until one lands).

Same design as scripts/isolate_full_scan.py (the §O template):

  solo     — random_seek_scan best-of-5 immediately after bulk_write
             setup (clean JVM state): the number a code regression
             would move.
  in_suite — the same best-of-5 AFTER the full bench prefix
             (point_get + range_scans + full_scan) has run in
             WORKLOAD_ORDER: the number the per-round bench records.

solo ~1.3-1.7s and in_suite higher  -> host/suite elevation, §O again.
solo >= 2.6s too                    -> real regression, bisect r11->r13.

Note the r14 plan change (seek bands routed through cells_for_ranges)
is a no-op at the bench's 32 files — every file is hit by the 100
bands, so cells_for_ranges returns the identical unpruned plan and
this measurement is comparable to r11-r13.

Run ALONE on an idle host (the bench.py self-contention rule).
Usage: python scripts/isolate_seek_scan.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402  (the harness itself: same spark, same ops)


def timed_attempts(bench, name: str, n: int, spark, calib_samples) -> list[dict]:
    out = []
    for _ in range(n):
        pre = B.calibrate(spark)
        calib_samples.append(pre)
        t0 = time.time()
        getattr(bench, name)()
        wall = time.time() - t0
        post = B.calibrate(spark)
        calib_samples.append(post)
        out.append({"sec": round(wall, 3), "calib": pre["total"],
                    "calib_after": post["total"]})
    return out


def main() -> int:
    spark = B.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    B.calibrate(spark)  # warmup, discarded

    workdir = tempfile.mkdtemp(prefix="isolate-seek-")
    bench = B.Bench(spark, B.SF_DIR, workdir)
    calib_samples: list[dict] = []

    # setup (untimed for this experiment): the stored table
    bench.bulk_write()

    record = {"sf_dir": B.SF_DIR, "cpus": B.CPUS}
    record["solo"] = timed_attempts(
        bench, "random_seek_scan", 5, spark, calib_samples)

    # replay the bench prefix that precedes random_seek_scan in
    # WORKLOAD_ORDER (bulk_write already ran as setup)
    prefix = ["point_get", "range_scan_10", "range_scan_100",
              "range_scan_1000", "range_scan_10000", "full_scan"]
    record["prefix"] = {}
    for name in prefix:
        att = timed_attempts(bench, name, 1, spark, calib_samples)
        record["prefix"][name] = att[0]["sec"]

    record["in_suite"] = timed_attempts(
        bench, "random_seek_scan", 5, spark, calib_samples)

    for k in ("solo", "in_suite"):
        secs = [a["sec"] for a in record[k]]
        record[f"{k}_best"] = min(secs)
        record[f"{k}_median"] = B._median(secs)
    record["probe_median"] = B._median([c["total"] for c in calib_samples])
    record["clean_ref"] = B.CLEAN_CALIB_SEC

    line = json.dumps(record)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
