"""Perceptual image hashing (multimodal.phash_images) + 64-bit
Hamming near-dup pairs (dedup.hamming_dup_pairs): hash stability under
re-encode, discrimination between different images, the bucketed pair
pipeline end-to-end, and the JVM-side plan pins."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hbase_snapshot_spark.operators import codecs, dedup, multimodal
from hbase_snapshot_spark.operators.multimodal import _phash_one


def _gradient_img(seed: int = 0, h: int = 64, w: int = 64) -> np.ndarray:
    """Smooth deterministic RGB test image (gradients + a blob)."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 / (w - 1)).astype(np.uint8)
    g = (yy * 255 / (h - 1)).astype(np.uint8)
    b = (((xx + (seed * 13) % w) % w) * 255 / (w - 1)).astype(np.uint8)
    img = np.stack([r, g, b], axis=2)
    img[h // 4:h // 2, w // 4:w // 2] = (seed * 37) % 256
    return img


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ------------------------------------------------------------ kernel

def test_phash_identical_and_reencode_stability():
    img = _gradient_img(0)
    h_ppm = _phash_one(codecs.decode_image(codecs.encode_ppm(img)), "dhash")
    h_png = _phash_one(codecs.decode_image(codecs.encode_png(img)), "dhash")
    # PNG is lossless → identical pixels → identical hash
    assert h_ppm == h_png
    # JPEG is lossy → near-identical hash (the whole point of phash)
    h_jpg = _phash_one(codecs.decode_image(
        codecs.encode_jpeg(img, quality=85)), "dhash")
    assert _hamming(h_ppm, h_jpg) <= 6


def test_phash_resize_invariance():
    big = _gradient_img(0, h=128, w=128)
    small = _gradient_img(0, h=32, w=32)
    assert _hamming(_phash_one(big, "dhash"),
                    _phash_one(small, "dhash")) <= 10


def test_phash_discriminates():
    h0 = _phash_one(_gradient_img(0), "dhash")
    h9 = _phash_one(_gradient_img(9), "dhash")
    assert _hamming(h0, h9) > 10


def test_ahash_and_grayscale_paths():
    img = _gradient_img(3)
    a = _phash_one(img, "ahash")
    gray = img.mean(axis=2).astype(np.uint8)
    g = _phash_one(gray, "ahash")
    assert isinstance(a, int) and isinstance(g, int)
    with pytest.raises(ValueError):
        _phash_one(img, "md5")


# --------------------------------------------------------- distributed

@pytest.fixture(scope="module")
def media(spark):
    base = _gradient_img(0)
    rows = [
        (0, "image", bytearray(codecs.encode_ppm(base)), None),
        (1, "image", bytearray(codecs.encode_png(base)), None),       # exact dup of 0
        (2, "image", bytearray(codecs.encode_jpeg(base, 85)), None),  # near dup of 0
        (3, "image", bytearray(codecs.encode_ppm(_gradient_img(9))), None),
        (4, "image", None, None),                                     # missing payload
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_phash_images_distributed(media):
    got = {r.media_id: r.phash
           for r in multimodal.phash_images(media).collect()}
    assert got[0] == got[1]
    assert _hamming(got[0], got[2]) <= 6
    assert _hamming(got[0], got[3]) > 10
    assert got[4] is None


def test_hamming_dup_pairs_end_to_end(media):
    hashes = multimodal.phash_images(media)
    pairs = {(r.a, r.b): r.hamming
             for r in dedup.hamming_dup_pairs(hashes, max_hamming=8).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 6
    assert (1, 2) in pairs
    assert all(3 not in p and 4 not in p for p in pairs)


def test_hamming_pairs_exact_verification(spark):
    # fingerprints straddling block boundaries: hamming 9 must NOT pass
    # at max_hamming=8 even though some block may collide
    # h(1,2)=8 passes, h(2,3)=1 passes, h(1,3)=9 is a block-collision
    # candidate (high blocks all zero) that exact verification rejects
    rows = [(1, 0), (2, (1 << 8) - 1), (3, (1 << 9) - 1)]
    df = spark.createDataFrame(rows, ["media_id", "phash"])
    got = {(r.a, r.b): r.hamming
           for r in dedup.hamming_dup_pairs(df, max_hamming=8).collect()}
    assert got == {(1, 2): 8, (2, 3): 1}
    # negative longs (bit 63 set) work through the unsigned shifts
    neg = spark.createDataFrame(
        [(1, -1), (2, -2), (3, 0)], ["media_id", "phash"])
    got = {(r.a, r.b): r.hamming
           for r in dedup.hamming_dup_pairs(neg, max_hamming=2).collect()}
    assert got == {(1, 2): 1}


def test_hamming_pairs_plan_jvm_side(spark):
    """The pair join is pure Catalyst: equi-joins on block columns (a
    SortMergeJoin/ShuffledHashJoin per block, no cartesian), bit_count
    verification JVM-side, zero Python."""
    df = spark.createDataFrame([(1, 5), (2, 7)], ["media_id", "phash"])
    plan = dedup.hamming_dup_pairs(df, max_hamming=3)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "CartesianProduct" not in plan
    assert "bit_count" in plan


def test_fake_path_deterministic(media):
    a = {r.media_id: r.phash
         for r in multimodal.phash_images(media, fake=True).collect()}
    b = {r.media_id: r.phash
         for r in multimodal.phash_images(media, fake=True).collect()}
    assert a == b and a[0] is not None


def test_on_error_null(spark):
    rows = [(0, "image", bytearray(b"\x00garbage-not-an-image"), None)]
    bad = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception):
        multimodal.phash_images(bad).collect()
    got = multimodal.phash_images(bad, on_error="null").collect()
    assert got[0].phash is None
