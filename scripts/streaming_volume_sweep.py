"""Streaming-premium VOLUME sweep (VERDICT r12 Next #6 — the dual of
§L.2): L.2 held volume fixed and varied the wave count, proving the
premium is per-drain and fixed.  This sweep holds the shape fixed (2
waves, the frozen §L arrangement) and scales the ARCHIVE VOLUME
1x/3x/10x — the direction users actually experience: as per-drain
batch work grows with volume, the fixed checkpoint/offset-log/state
premium should shrink as a SHARE of the drain, i.e.

    premium_share(R) = (t_drains(R) − t_batch_twin(R)) / t_drains(R)

should fall monotonically with R.  Record as §L.3 in BASELINE.md.

Volume scaling: the documents table replicated R times with doc_id
spreading AND a per-replica text suffix — fingerprints must stay
unique across replicas or the stream's cross-batch dedup state would
drop the copies and the batch work would NOT scale (the thing being
measured).  Archive count scales with volume (32*R files, 16*R per
wave) like a real crawl.

Run ALONE on an idle host (bench discipline).  Usage:
    python scripts/streaming_volume_sweep.py [--reps 1,3,10] [out.json]
"""

from __future__ import annotations

import argparse
import glob as _glob
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


def scaled_docs(spark, reps: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    if reps == 1:
        return docs
    max_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for r in range(reps):
        d = docs.select(
            (F.col("doc_id") + F.lit(r * max_id)).alias("doc_id"),
            # unique text per replica: cross-batch dedup must keep them
            F.concat(F.col("text"), F.lit(f" replica{r}")).alias("text"),
            "lang", "source", "n_chars")
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", default="1,3,10")
    ap.add_argument("--attempts", type=int, default=3)
    ap.add_argument("out", nargs="?", default=None)
    args = ap.parse_args()

    from hbase_snapshot_spark.sources.warc import (
        synthesize_warc_corpus,
        warc_to_documents,
    )
    from hbase_snapshot_spark.streaming.ingest import stream_warc_ingest_corpus

    spark = B.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    B.calibrate(spark)

    work = tempfile.mkdtemp(prefix="stream-vol-")
    record = {"base": BASE, "waves": 2, "scales": {}}
    run_tag = [0]
    try:
        for reps in [int(x) for x in args.reps.split(",")]:
            src_dir = os.path.join(work, f"warc{reps}x")
            synthesize_warc_corpus(scaled_docs(spark, reps), src_dir,
                                   n_files=32 * reps)
            glob = os.path.join(src_dir, "*.warc.gz")
            src = sorted(_glob.glob(glob))

            # batch twin: EXACTLY the stream tail's work minus
            # checkpoint/offset-log/state — ingest + gates + fingerprint
            # dedup + the partitioned parquet WRITE.  (The first cut of
            # this sweep used a count()-only twin and the "premium"
            # silently inherited the sink write, which scales with
            # volume — the twin must write what the stream writes.)
            from pyspark.sql import functions as F

            from hbase_snapshot_spark.operators.text import (
                fingerprint, lang_id, quality_score,
            )

            def batch_twin(out_dir):
                docs = warc_to_documents(spark, glob)
                gated = quality_score(
                    docs.withColumn("lang_detected", lang_id(F.col("text"))),
                    "text").filter(F.col("quality") >= 0.0)
                deduped = fingerprint(gated, "text").dropDuplicates(
                    ["fingerprint"])
                (deduped.repartition(F.col("lang_detected"),
                                     F.pmod(F.xxhash64("fingerprint"),
                                            F.lit(8)))
                 .write.partitionBy("lang_detected").mode("overwrite")
                 .parquet(out_dir))

            best_batch, batch_log = None, []
            for a in range(args.attempts):
                bt_out = os.path.join(work, f"bt-{reps}-{a}")
                c = B.calibrate(spark)
                t0 = time.time()
                batch_twin(bt_out)
                dt = round(time.time() - t0, 3)
                shutil.rmtree(bt_out, ignore_errors=True)
                batch_log.append({"sec": dt, "calib": c["total"]})
                best_batch = dt if best_batch is None else min(best_batch, dt)

            # streaming: 2 waves, fresh state per attempt
            best_stream, stream_log = None, []
            for _ in range(args.attempts):
                tag = run_tag[0]
                run_tag[0] += 1
                land = os.path.join(work, f"land-{tag}")
                outd = os.path.join(work, f"out-{tag}")
                ckpt = os.path.join(work, f"ckpt-{tag}")
                os.makedirs(land)
                half = len(src) // 2
                c = B.calibrate(spark)
                stages = {}
                for wave, files in enumerate((src[:half], src[half:]), 1):
                    for f in files:
                        os.link(f, os.path.join(land, os.path.basename(f)))
                    t0 = time.time()
                    q = stream_warc_ingest_corpus(
                        spark, land, outd, ckpt,
                        min_quality=0.0, available_now=True)
                    q.awaitTermination()
                    stages[f"drain{wave}"] = round(time.time() - t0, 3)
                total = round(sum(stages.values()), 3)
                stream_log.append({"sec": total, "stages": stages,
                                   "calib": c["total"]})
                if best_stream is None or total < best_stream["sec"]:
                    best_stream = stream_log[-1]
                for d in (land, outd, ckpt):
                    shutil.rmtree(d, ignore_errors=True)

            prem = best_stream["sec"] - best_batch
            record["scales"][f"{reps}x"] = {
                "files": len(src),
                "batch_twin_sec": best_batch,
                "stream_sec": best_stream["sec"],
                "drains": best_stream["stages"],
                "premium_total": round(prem, 3),
                "premium_per_drain": round(prem / 2, 3),
                "premium_share": round(prem / best_stream["sec"], 3)
                if best_stream["sec"] else None,
                "batch_attempts": batch_log,
                "stream_attempts": stream_log,
            }
            shutil.rmtree(src_dir, ignore_errors=True)
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
