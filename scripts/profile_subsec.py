"""Phase profile for the two sub-second bench ops still >1.5x raw on
the r9 idle-host confirmation run (BASELINE §H protocol): ann_topk
(0.70s vs frozen 0.4s) and text_pipeline (0.63s vs 0.4s).  Splits each
op into cumulative phases so the elevation attributes to a phase, not
a guess — the §I seek-scan treatment.

Run alone on a calm host: python scripts/profile_subsec.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def best_of(fn, n=5):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best or 1e9, time.time() - t0)
    return round(best, 3)


def main() -> int:
    import bench as B
    from pyspark.sql import functions as F

    spark = B.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    B.calibrate(spark)

    out = {}

    # ---------------- ann_topk (cosine_topk over embeddings, 5 queries)
    from hbase_snapshot_spark.operators.similarity import cosine_topk

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out["ann_scan_count"] = best_of(lambda: embs.count())
    out["ann_dot_only"] = best_of(
        lambda: embs.crossJoin(F.broadcast(q.withColumnRenamed(
            "embedding", "qe")))
        .select(F.aggregate(
            F.zip_with("embedding", "qe", lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x).alias("dot"))
        .agg(F.sum("dot")).collect())
    out["ann_full_op"] = best_of(
        lambda: cosine_topk(embs, q, k=10).count())

    # ---------------- text_pipeline (§F: lang-id + quality gate)
    from hbase_snapshot_spark.operators.text import lang_id, quality_score

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out["text_scan_count"] = best_of(lambda: docs.count())
    # force the projections (count() alone would let Catalyst prune
    # them to a bare row count)
    out["text_lang_forced"] = best_of(
        lambda: docs.select(lang_id(F.col("text")).alias("l"))
        .groupBy("l").count().collect())
    out["text_quality_forced"] = best_of(
        lambda: quality_score(docs).agg(F.sum("quality")).collect())
    out["text_as_benched_2jobs"] = best_of(
        lambda: (docs.select("doc_id", lang_id(F.col("text"))).count(),
                 quality_score(docs).count()))

    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
