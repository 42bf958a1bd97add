"""Malformed-payload robustness: at corpus scale, corrupt payloads are
a statistical certainty, so (a) ``sniff`` must never raise, (b) every
parser/decoder must TERMINATE on truncated or bit-flipped input —
raising is fine, hanging or crashing the interpreter is not — and
(c) the Spark kernels must honor the ``on_error='null'`` policy and
``probe_media`` must mark undecodable payloads instead of failing the
batch.  All mutations are seeded — the corpus is deterministic."""

from __future__ import annotations

import numpy as np
import pytest

from hbase_snapshot_spark.operators import codecs, multimodal

from test_codecs import (  # noqa: E402 — fixture builders
    _adpcm_wav,
    _avi_fixture,
    _ima_block,
    _lossless_jpeg,
    _media_df,
    _ogg_page,
    _webm_fixture,
    make_aiff,
    make_au,
    make_bmp24,
    make_ppm,
    make_wav,
)


def _fixtures() -> dict[str, bytes]:
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, size=(8, 6, 3)).astype(np.uint8)
    pcm = (1000 * np.sin(np.arange(256) / 7.0)).astype(np.int32)
    head = (b"OpusHead" + bytes([1, 1]) + b"\x00\x00"
            + (48000).to_bytes(4, "little") + b"\x00\x00\x00")
    fixtures = {
        "ppm": make_ppm(img),
        "bmp": make_bmp24(img),
        "png": codecs.encode_png(img),
        "jpeg": codecs.encode_jpeg(img),
        "jpeg_lossless": _lossless_jpeg(
            rng.randint(0, 256, size=(6, 5)).astype(np.int64)),
        "wav": make_wav(pcm, bits=16),
        "wav_ima": _adpcm_wav(17, 1, 8000, 4 + 4,
                              [_ima_block([[4, 9, 1, 15, 0, 8, 2, 7]],
                                          [100], [30])]),
        "aiff": make_aiff(pcm.astype(">i2").tobytes()),
        "au": make_au(pcm.astype(">i2").tobytes()),
        "ogg": _ogg_page(head, htype=2) + _ogg_page(b"\x00" * 16, seq=1,
                                                    granule=48000, htype=4),
        "webm": _webm_fixture(),
        "avi": _avi_fixture(),
    }
    return fixtures


def _decoder_for(name: str):
    return {
        "ppm": codecs.decode_pnm,
        "bmp": codecs.decode_bmp,
        "png": codecs.decode_png,
        "jpeg": codecs.decode_jpeg,
        "jpeg_lossless": codecs.decode_jpeg,
        "wav": codecs.decode_wav,
        "wav_ima": codecs.decode_wav,
        "aiff": codecs.decode_aiff,
        "au": codecs.decode_au,
        "ogg": codecs.parse_ogg,
        "webm": codecs.parse_ebml,
        "avi": codecs.parse_avi,
    }[name]


def _mutations(payload: bytes, rng) -> list[bytes]:
    """Truncations at a stride + seeded single-byte flips."""
    out = []
    stride = max(1, len(payload) // 24)
    for end in range(0, len(payload), stride):
        out.append(payload[:end])
    for _ in range(40):
        i = int(rng.randint(0, len(payload)))
        flipped = bytearray(payload)
        flipped[i] ^= 1 << int(rng.randint(0, 8))
        out.append(bytes(flipped))
    return out


def test_sniff_never_raises():
    rng = np.random.RandomState(7)
    for payload in _fixtures().values():
        for m in _mutations(payload, rng):
            assert codecs.sniff(m) is None or isinstance(codecs.sniff(m), str)
    for n in (0, 1, 11, 64):
        blob = bytes(rng.randint(0, 256, n).astype(np.uint8).tobytes())
        assert codecs.sniff(blob) is None or isinstance(codecs.sniff(blob), str)


def test_decoders_terminate_on_mutations():
    """Every mutation either decodes or raises — no hangs, no
    interpreter-killing behavior.  (Exception TYPE is not asserted:
    the Spark kernels' on_error/corrupt policies catch everything.)"""
    rng = np.random.RandomState(1234)
    for name, payload in _fixtures().items():
        decode = _decoder_for(name)
        for m in _mutations(payload, rng):
            try:
                decode(m)
            except Exception:  # noqa: BLE001 — any raise is acceptable
                pass


def test_probe_media_fuzz_spark(spark):
    """One batch of mutated payloads through probe_media: a row per
    payload, never an exception — undecodable ones read format=None
    or 'corrupt'."""
    rng = np.random.RandomState(99)
    payloads = []
    for payload in _fixtures().values():
        muts = _mutations(payload, rng)
        payloads.extend(muts[:: max(1, len(muts) // 12)])
    df = _media_df(spark, payloads, kind="image")
    rows = multimodal.probe_media(df).collect()
    assert len(rows) == len(payloads)


def test_decode_images_on_error_null(spark):
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(4, 5, 3)).astype(np.uint8)
    good, bad = make_ppm(img), b"\x89PNG\r\n\x1a\n" + b"\x00" * 20
    df = _media_df(spark, [good, bad], kind="image")
    out = {r["media_id"]: r for r in
           multimodal.decode_images(df, on_error="null").collect()}
    assert (out[0]["width"], out[0]["height"]) == (5, 4)
    assert out[1]["width"] is None and out[1]["mean_intensity"] is None
    with pytest.raises(Exception):
        multimodal.decode_images(df).collect()
    with pytest.raises(ValueError):
        multimodal.decode_images(df, on_error="skip")


def test_resize_and_audio_on_error_null(spark):
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, size=(4, 5, 3)).astype(np.uint8)
    df = _media_df(spark, [make_ppm(img), b"BM" + b"\x00" * 30], kind="image")
    out = {r["media_id"]: r for r in
           multimodal.resize_images(df, 8, 8, on_error="null").collect()}
    assert out[0]["payload"] is not None and out[1]["payload"] is None
    with pytest.raises(Exception):
        multimodal.resize_images(df, 8, 8).collect()

    pcm = (500 * np.sin(np.arange(128) / 5.0)).astype(np.int32)
    adf = _media_df(spark, [make_wav(pcm, bits=16),
                            b"RIFF\x10\x00\x00\x00WAVEjunk"], kind="audio")
    out = {r["media_id"]: r for r in multimodal.extract_audio_features(
        adf, target_rate=8000, on_error="null").collect()}
    assert out[0]["n_samples"] == 128 and out[0]["rms"] > 0
    assert out[1]["n_samples"] is None and out[1]["rms"] is None
    with pytest.raises(Exception):
        multimodal.extract_audio_features(adf, target_rate=8000).collect()


def test_sample_frames_on_error_null(spark):
    # an mp4-sniffing payload with garbage boxes: parse_mp4 raises →
    # on_error='null' emits null frames, default raises
    bad_mp4 = b"\x00\x00\x00\x08ftypxxxx" + b"\x00" * 8
    rows = [(0, "video", bytearray(bad_mp4),
             ("video/mp4", 0, 0, 0, 2000))]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = multimodal.sample_frames(df, every_ms=1000,
                                   on_error="null").collect()
    assert len(out) == 2 and all(r["frame"] is None for r in out)
