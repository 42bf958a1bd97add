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

    # every attempt is bracketed by the bench's calibration probes —
    # this host shows intermittent CPU/IO-throttle windows (BASELINE
    # §H) and a cross-shape comparison poisoned by one is worse than no
    # number; the probe column makes each attempt self-interpreting and
    # the reader picks the clean ones
    def attempts(fn, sec_of=None):
        log, best = [], None
        for _ in range(args.attempts):
            c = B.calibrate(spark)
            t0 = time.time()
            r = fn()
            sec = round(
                sec_of(r) if sec_of else
                (r["sec"] if isinstance(r, dict) else time.time() - t0), 3)
            entry = {"sec": sec, "calib": c["total"]}
            if isinstance(r, dict) and "stages" in r:
                entry["stages"] = r["stages"]
            log.append(entry)
            if best is None or sec < best["sec"]:
                best = entry
        return best, log

    # the batch twin of what the STREAM does per drain: ingest +
    # extract + gates + dedup (llm_front_door's ingest_plus_preprocess
    # stage — the shard-write/verify stages have no streaming
    # counterpart, the stream's sink is plain batch-partitioned parquet)
    best_batch, batch_log = attempts(
        b.llm_front_door, sec_of=lambda r: r["stages"]["ingest_plus_preprocess"])
    out["batch_work"] = best_batch["sec"]
    out["batch_attempts"] = batch_log

    for waves in (2, 4):
        best, log = attempts(lambda: b.streaming_front_door(waves=waves))
        premium = (best["sec"] - best_batch["sec"]) / waves
        out[f"waves{waves}"] = {
            "total": best["sec"],
            "drains": best.get("stages", {}),
            "per_drain_premium_vs_batch": round(premium, 3),
            "attempts": log,
        }

    # the §L.2 claim in one number: the per-drain premium should be
    # ~flat across wave counts (ratio ≈ 1) — i.e. doubling the waves
    # over the same volume adds ~2 fixed premiums, nothing volumetric
    p2 = out["waves2"]["per_drain_premium_vs_batch"]
    p4 = out["waves4"]["per_drain_premium_vs_batch"]
    out["premium_ratio_4v2"] = round(p4 / p2, 3) if p2 > 0 else None

    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
