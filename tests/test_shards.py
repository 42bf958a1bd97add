"""Training-shard sink (sources/shards.py): deterministic assignment,
manifest verification, tamper detection, cross-parallelism stability."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from hbase_snapshot_spark.sources import shards as S


@pytest.fixture()
def corpus(spark):
    rows = [(i, f"document number {i}", i % 3) for i in range(200)]
    return spark.createDataFrame(rows, ["doc_id", "text", "grp"])


def test_write_and_verify_roundtrip(spark, corpus, tmp_path):
    path = str(tmp_path / "out")
    man = S.write_training_shards(
        corpus, path, F.col("doc_id"), n_shards=4, seed=7)
    assert man["n_shards"] == 4 and len(man["shards"]) == 4
    assert sum(v["n_rows"] for v in man["shards"].values()) == 200
    # manifest persisted next to the data
    assert S.read_manifest(path) == json.loads(json.dumps(man))
    assert S.verify_training_shards(spark, path) == []


def test_deterministic_across_parallelism(spark, corpus, tmp_path):
    p1 = str(tmp_path / "a")
    p2 = str(tmp_path / "b")
    m1 = S.write_training_shards(
        corpus.coalesce(1), p1, F.col("doc_id"), n_shards=4, seed=7)
    m2 = S.write_training_shards(
        corpus.repartition(16), p2, F.col("doc_id"), n_shards=4, seed=7)
    assert m1["shards"] == m2["shards"]
    # a different seed gives a different assignment
    m3 = S.write_training_shards(
        corpus, str(tmp_path / "c"), F.col("doc_id"), n_shards=4, seed=8)
    assert m3["shards"] != m1["shards"]


def test_verify_detects_tampering(spark, corpus, tmp_path):
    path = str(tmp_path / "out")
    man = S.write_training_shards(
        corpus, path, F.col("doc_id"), n_shards=2, seed=0)
    # corrupt the manifest's count for shard 0
    man["shards"]["0"]["n_rows"] += 1
    probs = S.verify_training_shards(spark, path, man)
    assert probs and "n_rows" in probs[0]
    # remove a shard directory entirely
    ok_man = S.read_manifest(path)
    import shutil
    shutil.rmtree(os.path.join(path, "shard=1"))
    probs = S.verify_training_shards(spark, path, ok_man)
    assert any("missing" in p for p in probs)


def test_checksum_catches_content_change(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], ["doc_id", "text"])
    path = str(tmp_path / "out")
    man = S.write_training_shards(df, path, F.col("doc_id"), n_shards=1)
    # same counts, different content → checksum must differ
    df2 = spark.createDataFrame(
        [(1, "alpha"), (2, "BETA")], ["doc_id", "text"])
    path2 = str(tmp_path / "out2")
    man2 = S.write_training_shards(df2, path2, F.col("doc_id"), n_shards=1)
    a, b = man["shards"]["0"], man2["shards"]["0"]
    assert a["n_rows"] == b["n_rows"] and a["checksum"] != b["checksum"]
