"""Attribute the streaming front door's per-drain premium (VERDICT r14
Next #6): where do the ~1.2-1.7s of fixed per-drain cost go —
checkpoint/offset-log round-trips, file-source discovery, state-store
restore/commit, or micro-batch (re)planning of the big gate expression
trees?

Scenarios, all on the bench's sf-equivalent WARC corpus:

  drain1        — fresh checkpoint, first half of the archives: full
                  batch work + query-start cost (the bench's wave 1).
  drain2        — same checkpoint, second half: batch work + state
                  restore (the bench's wave 2).
  empty_resume  — same checkpoint again, NO new files: a pure-premium
                  drain (discovery + offset log + state init + plan,
                  zero batch work).  This is the per-drain premium,
                  measured directly.
  empty_fresh   — fresh checkpoint, EMPTY landing dir: premium minus
                  state restore.

Each drain also records Spark's own StreamingQueryProgress.durationMs
breakdown (triggerExecution / queryPlanning / walCommit /
commitOffsets / addBatch / getBatch / latestOffset) summed over its
micro-batches — the engine's attribution, not ours.

Usage: python scripts/profile_drain.py [attempts]   (env like bench.py)
"""

from __future__ import annotations

import glob as _glob
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as B


def _drain(spark, land, outd, ckpt):
    from hbase_snapshot_spark.streaming.ingest import stream_warc_ingest_corpus

    t0 = time.time()
    q = stream_warc_ingest_corpus(
        spark, land, outd, ckpt, min_quality=0.0, available_now=True)
    q.awaitTermination()
    wall = round(time.time() - t0, 3)
    dur: dict = {}
    batches = 0
    for p in q.recentProgress:
        batches += 1
        for k, v in (p.get("durationMs") or {}).items():
            dur[k] = dur.get(k, 0) + v
    return {"wall": wall, "batches": batches, "durationMs": dur}


def main() -> int:
    attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = B.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    B.calibrate(spark)
    workdir = tempfile.mkdtemp(prefix="profdrain-")
    bench = B.Bench(spark, B.SF_DIR, workdir)
    src = sorted(_glob.glob(
        os.path.join(bench._warc_corpus_dir(), "*.warc.gz")))
    half = len(src) // 2

    out: dict = {"attempts": {}}
    for a in range(attempts):
        tag = os.path.join(workdir, f"a{a}")
        land = os.path.join(tag, "land")
        outd = os.path.join(tag, "out")
        ckpt = os.path.join(tag, "ckpt")
        os.makedirs(land)
        rec: dict = {"calib_pre": B.calibrate(spark)["total"]}
        for f in src[:half]:
            os.link(f, os.path.join(land, os.path.basename(f)))
        rec["drain1"] = _drain(spark, land, outd, ckpt)
        for f in src[half:]:
            os.link(f, os.path.join(land, os.path.basename(f)))
        rec["drain2"] = _drain(spark, land, outd, ckpt)
        rec["empty_resume"] = _drain(spark, land, outd, ckpt)
        fresh = os.path.join(tag, "ckpt-fresh")
        empty_land = os.path.join(tag, "land-empty")
        os.makedirs(empty_land)
        rec["empty_fresh"] = _drain(spark, empty_land, outd + "-f", fresh)
        rec["calib_post"] = B.calibrate(spark)["total"]
        out["attempts"][f"a{a}"] = rec
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
