"""Isolate the full_scan three-round creep (VERDICT r12 Wrong #2:
0.99s r10 -> 1.06 r11 -> 1.40 r12 with no code change on the resolve
path; stability 1.01 = consistently slow WITHIN the run, probes only
3% elevated).

Two measurements in one process, probes bracketing every attempt:

  solo     — full_scan best-of-5 immediately after bulk_write setup
             (clean JVM state, nothing else has run): the number a
             code regression would move.
  in_suite — the same full_scan best-of-5 AFTER point_get + the four
             range_scan ops have run in bench order: the number the
             per-round bench records.  The r12 hypothesis is that
             post-suite JVM/page-cache/AQE state (the BASELINE §H
             signature) explains the gap.

solo ~1.0s and in_suite ~1.4s  -> in-suite elevation, pin it in §H.
solo ~1.4s too                 -> real regression, bisect r11->r12.

Run ALONE on an idle host (the bench.py self-contention rule).
Usage: python scripts/isolate_full_scan.py [out.json]
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

    workdir = tempfile.mkdtemp(prefix="isolate-fs-")
    bench = B.Bench(spark, B.SF_DIR, workdir)
    calib_samples: list[dict] = []

    # setup (untimed for this experiment): the stored table
    bench.bulk_write()

    record = {"sf_dir": B.SF_DIR, "cpus": B.CPUS}
    record["solo"] = timed_attempts(bench, "full_scan", 5, spark, calib_samples)

    # replay the bench prefix that precedes full_scan in WORKLOAD_ORDER
    prefix = ["point_get", "range_scan_10", "range_scan_100",
              "range_scan_1000", "range_scan_10000"]
    record["prefix"] = {}
    for name in prefix:
        att = timed_attempts(bench, name, 1, spark, calib_samples)
        record["prefix"][name] = att[0]["sec"]

    record["in_suite"] = timed_attempts(
        bench, "full_scan", 5, spark, calib_samples)

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
