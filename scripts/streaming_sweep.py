"""Streaming-premium amortization sweep (VERDICT r11 Next #4).

BASELINE.md §L states the ~2.4s/drain streaming premium over the batch
front door is a FIXED per-drain cost (checkpoint/offset-log round-trips
+ state-store I/O) that amortizes against archive volume on a real
continuous feed.  This script MEASURES that claim instead of asserting
it: the SAME total archive volume (the bench's sf-equivalent WARC
corpus) arrives as 2 waves and as 4 waves; if the premium is per-drain
and fixed, total wall time should grow by ~one premium per extra wave
while the summed batch work stays constant — i.e.

    t(4 waves) - t(2 waves) ≈ 2 × premium,   premium ≈ t_drain - t_batch/waves

Prints one JSON line: per-wave drain timings for both shapes, the batch
twin's time, and the derived per-drain premium at each wave count.
Record the result as a §L.2 row in BASELINE.md.

Run ALONE on an idle host (bench discipline).  Usage:
    python scripts/streaming_sweep.py [--attempts 3]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--attempts", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import bench as B

    spark = B.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    B.calibrate(spark)  # codegen + shuffle warmup, discarded
    workdir = tempfile.mkdtemp(prefix="stream-sweep-")
    b = B.Bench(spark, args.sf_dir, workdir)
    b._warc_corpus_dir()  # corpus synthesis is setup, untimed

    out: dict = {"sf_dir": args.sf_dir, "attempts": args.attempts}

    # the batch twin: same corpus, same extract/gate/dedup, no
    # checkpoint/state machinery — the amortization reference point
    best_batch = None
    for _ in range(args.attempts):
        t0 = time.time()
        b.llm_front_door()
        best_batch = min(best_batch or 1e9, time.time() - t0)
    out["batch_total"] = round(best_batch, 3)

    for waves in (2, 4):
        best = None
        for _ in range(args.attempts):
            r = b.streaming_front_door(waves=waves)
            if best is None or r["sec"] < best["sec"]:
                best = r
        premium = (best["sec"] - best_batch) / waves
        out[f"waves{waves}"] = {
            "total": best["sec"],
            "drains": best["stages"],
            "per_drain_premium_vs_batch": round(premium, 3),
        }

    # the §L.2 claim in one number: extra waves cost ~one fixed premium
    # each (ratio ≈ 1 when the premium is per-drain and fixed)
    p2 = out["waves2"]["per_drain_premium_vs_batch"]
    p4 = out["waves4"]["per_drain_premium_vs_batch"]
    out["premium_ratio_4v2"] = round(p4 / p2, 3) if p2 > 0 else None

    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
