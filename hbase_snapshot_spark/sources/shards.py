"""Reproducible training-shard sink: deterministic sharded corpus
output with a verifiable manifest.

The last step of a training-data pipeline is writing the corpus as N
shards a data loader streams — and the property that matters at 100 TB
is REPRODUCIBILITY: the same corpus + seed must yield the same shard
assignment and intra-shard order on any cluster size, and a re-run (or
a resumed job) must be verifiable against the manifest without eyeball
diffs.

``write_training_shards`` composes ``sampling.shard_shuffle`` (one hash
Exchange, no global sort — the plan is identical at 1 GB and 100 TB)
with a ``partitionBy('shard')`` writer, then computes a per-shard
manifest in ONE aggregation pass: row count + an order-insensitive
64-bit content checksum (``bit_xor`` of ``xxhash64`` over all columns —
overflow-free, commutative, so it is partitioning-independent; note an
EVEN number of byte-identical duplicate rows cancels in the xor, which
the row count still catches).  ``verify_training_shards`` recomputes
both from the written files and diffs against the manifest.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_snapshot_spark.operators.sampling import shard_shuffle

MANIFEST_NAME = "_shard_manifest.json"


def _shard_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """(shard, n_rows, checksum) in one map-side-combinable agg."""
    h = F.xxhash64(*[F.col(c) for c in cols])
    return df.groupBy("shard").agg(
        F.count("*").alias("n_rows"),
        F.bit_xor(h).alias("checksum"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key: Column,
    n_shards: int,
    seed: int = 0,
    format: str = "parquet",
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` as ``path/shard=K/`` partitions with deterministic
    assignment and intra-shard order (seeded xxhash64 — see
    ``shard_shuffle``), plus a ``_shard_manifest.json`` recording seed,
    shard count, and per-shard (n_rows, checksum).  Returns the
    manifest dict (driver-sized: one entry per shard)."""
    data_cols = df.columns
    sharded = shard_shuffle(df, key, n_shards, seed)
    (sharded.write.mode(mode).format(format)
     .partitionBy("shard").save(path))
    stats = _shard_stats(
        sharded.sparkSession.read.format(format).load(path), data_cols)
    manifest = {
        "seed": int(seed),
        "n_shards": int(n_shards),
        "columns": data_cols,
        "shards": {
            str(r["shard"]): {"n_rows": r["n_rows"],
                              "checksum": int(r["checksum"])}
            for r in stats.collect()
        },
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        return json.load(f)


def verify_training_shards(
    spark: SparkSession, path: str, manifest: dict | None = None,
    format: str = "parquet",
) -> list[str]:
    """Recompute per-shard counts + checksums from the written files
    and diff against the manifest.  Returns a list of human-readable
    problems (empty = verified)."""
    if manifest is None:
        manifest = read_manifest(path)
    df = spark.read.format(format).load(path)
    got = {
        str(r["shard"]): (r["n_rows"], int(r["checksum"]))
        for r in _shard_stats(df, manifest["columns"]).collect()
    }
    problems: list[str] = []
    want = manifest["shards"]
    for shard in sorted(set(want) | set(got), key=int):
        if shard not in got:
            problems.append(f"shard {shard}: missing from data")
        elif shard not in want:
            problems.append(f"shard {shard}: not in manifest")
        else:
            n, c = got[shard]
            if n != want[shard]["n_rows"]:
                problems.append(
                    f"shard {shard}: n_rows {n} != {want[shard]['n_rows']}")
            if c != want[shard]["checksum"]:
                problems.append(f"shard {shard}: checksum mismatch")
    return problems
