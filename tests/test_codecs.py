"""Real decode kernels over generated PPM/PGM/BMP/WAV fixtures —
pure-parser unit tests plus Spark end-to-end through the mapInPandas
pipelines (decode_images / resize_images / extract_audio_features with
fake=False).
"""

import struct

import numpy as np
import pytest

from hbase_snapshot_spark.operators import codecs, multimodal


# ------------------------------------------------------------- fixtures


def make_ppm(img: np.ndarray, comment: bool = False) -> bytes:
    h, w = img.shape[:2]
    hdr = b"P6\n"
    if comment:
        hdr += b"# a comment line\n"
    hdr += b"%d %d\n255\n" % (w, h)
    return hdr + img.astype(np.uint8).tobytes()


def make_pgm(img: np.ndarray) -> bytes:
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def make_bmp24(img: np.ndarray, top_down: bool = False) -> bytes:
    """Minimal BITMAPINFOHEADER BI_RGB 24-bit BMP from (h, w, 3) RGB."""
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    raster = np.zeros((h, row_bytes), np.uint8)
    bgr = img[:, :, ::-1]
    rows = bgr if top_down else bgr[::-1]
    raster[:, : w * 3] = rows.reshape(h, w * 3)
    pixels = raster.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0,
        len(pixels), 2835, 2835, 0, 0,
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return header + info + pixels


def make_bmp8(img_idx: np.ndarray, palette: np.ndarray) -> bytes:
    """8-bit palette BMP from (h, w) indices + (n, 3) RGB palette."""
    h, w = img_idx.shape
    row_bytes = (w + 3) & ~3
    raster = np.zeros((h, row_bytes), np.uint8)
    raster[:, :w] = img_idx[::-1]
    pixels = raster.tobytes()
    n = len(palette)
    pal = np.zeros((n, 4), np.uint8)
    pal[:, :3] = palette[:, ::-1]  # stored BGRX
    off = 14 + 40 + n * 4
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(pixels), 0, 0, n, 0
    )
    header = struct.pack("<2sIHHI", b"BM", off + len(pixels), 0, 0, off)
    return header + info + pal.tobytes() + pixels


def make_wav(
    samples: np.ndarray, rate: int = 8000, bits: int = 16, channels: int = 1,
    fmt: int = 1,
) -> bytes:
    if fmt == 3:
        raw = samples.astype("<f4").tobytes()
    elif bits == 8:
        raw = (samples.astype(np.int32) + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        raw = samples.astype("<i2").tobytes()
    elif bits == 24:
        s = samples.astype(np.int32)
        b = np.zeros((len(s.ravel()), 3), np.uint8)
        flat = s.ravel() & 0xFFFFFF
        b[:, 0], b[:, 1], b[:, 2] = flat & 0xFF, (flat >> 8) & 0xFF, (flat >> 16) & 0xFF
        raw = b.tobytes()
    elif bits == 32:
        raw = samples.astype("<i4").tobytes()
    block = channels * bits // 8
    fmt_body = struct.pack(
        "<HHIIHH", fmt, channels, rate, rate * block, block, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    # an extra skippable odd-sized chunk exercises word alignment
    chunks += b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


RGB = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3) * 9 % 256


# -------------------------------------------------------- parser units


def test_ppm_roundtrip():
    img = codecs.decode_pnm(make_ppm(RGB, comment=True))
    np.testing.assert_array_equal(img, RGB)
    again = codecs.decode_pnm(codecs.encode_ppm(img))
    np.testing.assert_array_equal(again, RGB)


def test_pgm_and_16bit_ppm():
    gray = np.array([[0, 128], [255, 7]], np.uint8)
    np.testing.assert_array_equal(codecs.decode_pnm(make_pgm(gray)), gray)
    # 16-bit big-endian raster scales to 8-bit
    img16 = (RGB.astype(np.uint32) * 65535 // 255).astype(">u2")
    data = b"P6\n3 2\n65535\n" + img16.tobytes()
    np.testing.assert_array_equal(codecs.decode_pnm(data), RGB)


def test_bmp24_bottom_up_and_top_down():
    np.testing.assert_array_equal(codecs.decode_bmp(make_bmp24(RGB)), RGB)
    np.testing.assert_array_equal(
        codecs.decode_bmp(make_bmp24(RGB, top_down=True)), RGB
    )


def test_bmp8_palette():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    idx = np.array([[0, 1, 2], [3, 2, 1]], np.uint8)
    np.testing.assert_array_equal(
        codecs.decode_bmp(make_bmp8(idx, palette)), palette[idx]
    )


def test_image_codec_errors():
    with pytest.raises(NotImplementedError, match="Pillow"):
        codecs.decode_image(b"\xff\xd8\xff\xe0 jpeg-ish bytes here")
    with pytest.raises(ValueError, match="compressed"):
        bad = bytearray(make_bmp24(RGB))
        bad[30] = 1  # BI_RLE8
        codecs.decode_bmp(bytes(bad))


def test_resize_nearest():
    out = codecs.resize_nearest(RGB, 6, 4)
    assert out.shape == (4, 6, 3)
    # corners map to source corners under nearest-neighbor
    np.testing.assert_array_equal(out[0, 0], RGB[0, 0])
    np.testing.assert_array_equal(out[-1, -1], RGB[-1, -1])


def test_wav_pcm16():
    s = np.array([0, 1000, -1000, 32767, -32768], np.int32)
    rate, out = codecs.decode_wav(make_wav(s, rate=8000, bits=16))
    assert rate == 8000
    np.testing.assert_array_equal(out, s)


def test_wav_widths_and_float():
    s8 = np.array([-128, 0, 127], np.int32)
    _, out = codecs.decode_wav(make_wav(s8, bits=8))
    np.testing.assert_array_equal(out, s8 << 8)

    s24 = np.array([1 << 22, -(1 << 22), 0], np.int32)
    _, out = codecs.decode_wav(make_wav(s24, bits=24))
    np.testing.assert_array_equal(out, s24 >> 8)

    s32 = np.array([1 << 30, -(1 << 30)], np.int32)
    _, out = codecs.decode_wav(make_wav(s32, bits=32))
    np.testing.assert_array_equal(out, s32 >> 16)

    f = np.array([0.0, 0.5, -1.0], np.float32)
    _, out = codecs.decode_wav(make_wav(f, bits=32, fmt=3))
    np.testing.assert_array_equal(out, np.round(f * 32767).astype(np.int32))


def test_wav_stereo_downmix():
    stereo = np.array([100, 200, -100, -200], np.int32)  # L R L R
    _, out = codecs.decode_wav(make_wav(stereo, bits=16, channels=2))
    np.testing.assert_array_equal(out, [150, -150])


def test_resample_linear():
    s = np.array([0, 100], np.int32)
    out = codecs.resample_linear(s, 8000, 16000)
    assert len(out) == 4 and out[0] == 0 and out[1] == 50


# ------------------------------------------------------- spark e2e


def _media_df(spark, payloads, kind="image"):
    rows = [
        (i, kind, bytearray(p), ("application/octet-stream", 0, 0, 0, 0))
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_decode_images_real(spark):
    media = _media_df(spark, [make_ppm(RGB), make_bmp24(RGB), make_pgm(RGB[:, :, 0])])
    out = {r.media_id: r for r in
           multimodal.decode_images(media, fake=False).collect()}
    assert out[0].width == 3 and out[0].height == 2 and out[0].channels == 3
    assert out[1].width == 3 and out[1].channels == 3
    assert out[0].mean_intensity == out[1].mean_intensity == round(float(RGB.mean()), 4)
    assert out[2].channels == 1


def test_resize_images_real(spark):
    media = _media_df(spark, [make_ppm(RGB), make_bmp24(RGB)])
    out = multimodal.resize_images(media, width=6, height=4, fake=False).collect()
    for r in out:
        img = codecs.decode_pnm(bytes(r.payload))
        assert img.shape == (4, 6, 3)
        np.testing.assert_array_equal(img, codecs.resize_nearest(RGB, 6, 4))


def test_audio_features_real(spark):
    s = np.round(1000 * np.sin(np.arange(800) / 10.0)).astype(np.int32)
    media = _media_df(
        spark, [make_wav(s, rate=8000, bits=16)], kind="audio"
    )
    r = multimodal.extract_audio_features(media, target_rate=16000, fake=False).first()
    assert r.sample_rate == 16000
    assert r.n_samples == 1600  # 8k → 16k doubles the sample count
    resampled = codecs.resample_linear(s, 8000, 16000)
    assert r.peak == int(abs(resampled).max())
    assert r.rms == round(float((resampled.astype("float64") ** 2).mean() ** 0.5), 4)


# ------------------------------------------------------------- video/y4m


def make_y4m(n_frames: int, w: int = 4, h: int = 2, fps=(10, 1)) -> bytes:
    hdr = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420jpeg\n" % (w, h, *fps)
    size = w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)
    out = [hdr]
    for i in range(n_frames):
        out.append(b"FRAME\n" + bytes((i * 31 + j) % 256 for j in range(size)))
    return b"".join(out)


def test_y4m_parse_and_walk():
    data = make_y4m(3, w=6, h=4, fps=(30000, 1001))
    hdr = codecs.parse_y4m_header(data)
    assert (hdr["width"], hdr["height"]) == (6, 4)
    assert hdr["fps"] == (30000, 1001)
    assert hdr["frame_size"] == 6 * 4 + 2 * 3 * 2
    frames = list(codecs.y4m_frames(data))
    assert [i for i, _ in frames] == [0, 1, 2]
    assert all(len(b) == hdr["frame_size"] for _, b in frames)
    assert codecs.y4m_frame_count(data) == 3
    with pytest.raises(ValueError):
        codecs.parse_y4m_header(b"\x00\x00 not a video")


def test_sample_frames_real_y4m(spark):
    # 10 fps video, 20 frames = 2000 ms; sample every 500 ms → 4 rows,
    # source frames 0, 5, 10, 15
    data = make_y4m(20, fps=(10, 1))
    rows = [(0, "video", bytearray(data),
             ("video/x-yuv4mpeg", 4, 2, 0, 2000))]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = sorted(
        multimodal.sample_frames(media, every_ms=500, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_ms for r in out] == [0, 500, 1000, 1500]
    srcs = {i: b for i, b in codecs.y4m_frames(data)}
    for r in out:
        assert bytes(r.frame) == srcs[r.frame_ms * 10 // 1000]


def test_sample_frames_compressed_raises(spark):
    rows = [(0, "video", bytearray(b"\x00\x00\x00 ftypisom fake-mp4"),
             ("video/mp4", 0, 0, 0, 1000))]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="ffmpeg"):
        multimodal.sample_frames(media, every_ms=500, fake=False).collect()
