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


def test_legacy_v1_manifest_verifies_with_legacy_formula(spark, corpus,
                                                         tmp_path):
    """(r12, ADVICE) the row-hash formula changed from xxhash64(*cols)
    to xxhash64(to_json(struct(*cols))) — recomputing a v1 manifest's
    xor with the v2 formula false-failed every intact pre-existing
    shard directory.  The manifest now records hash_format (absence of
    hashsum is the legacy discriminator) and verification replays the
    formula the manifest was written with."""
    path = str(tmp_path / "out")
    S.write_training_shards(corpus, path, F.col("doc_id"), n_shards=2, seed=1)
    # synthesize the v1 manifest a pre-r11 build would have written:
    # raw-column xxhash64 xor, no hashsum, no hash_format field
    man = S.read_manifest(path)
    assert man["hash_format"] == S.HASH_FORMAT  # new manifests tagged
    df = spark.read.parquet(path)
    legacy = {
        str(r["shard"]): {"n_rows": r["n_rows"],
                          "checksum": int(r["checksum"])}
        for r in S._shard_stats(df, man["columns"], hash_format=1).collect()
    }
    v1_man = {"seed": 1, "n_shards": 2, "columns": man["columns"],
              "shards": legacy}
    # intact data verifies clean against the legacy formula
    assert S.verify_training_shards(spark, path, v1_man) == []
    # and the legacy formula still detects tampering
    v1_bad = json.loads(json.dumps(v1_man))
    v1_bad["shards"]["0"]["checksum"] ^= 1
    probs = S.verify_training_shards(spark, path, v1_bad)
    assert any("checksum" in p for p in probs)
    # unknown future formats fail loudly, not silently-mismatch
    with pytest.raises(ValueError, match="hash_format"):
        S._shard_stats(df, man["columns"], hash_format=99)
