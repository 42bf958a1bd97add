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
    # WebP is RIFF-contained but not WAVE — still an unsupported codec
    with pytest.raises(NotImplementedError, match="Pillow"):
        codecs.decode_image(b"RIFF\x00\x01\x00\x00WEBPVP8 webp-ish bytes")
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


def test_sample_frames_gif(spark):
    # 3-frame animation, 500ms each = 1500ms; sample every 500ms →
    # rows at 0/500/1000 carrying composited frames 0, 1, 2
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   np.uint8)
    grids = [np.full((2, 3), i, np.uint8) for i in (1, 2, 3)]
    gif = make_gif(grids, pal, 3, 2, delays=[500, 500, 500])
    rows = [(0, "video", bytearray(gif), ("image/gif", 3, 2, 0, 1500))]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = sorted(
        multimodal.sample_frames(media, every_ms=500, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_ms for r in out] == [0, 500, 1000]
    expect, _ = codecs.decode_gif(gif)
    for r, want in zip(out, expect):
        assert bytes(r.frame) == want.tobytes()


def test_sample_frames_compressed_raises(spark):
    # an MKV/EBML payload is neither y4m nor ISO-BMFF → names ffmpeg
    rows = [(0, "video", bytearray(b"\x1a\x45\xdf\xa3 fake-matroska"),
             ("video/x-matroska", 0, 0, 0, 1000))]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="ffmpeg"):
        multimodal.sample_frames(media, every_ms=500, fake=False).collect()
    # a truncated MP4 (no moov) takes the container path and says why
    rows = [(0, "video", bytearray(b"\x00\x00\x00\x14ftypisom fake-mp4"),
             ("video/mp4", 0, 0, 0, 1000))]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="moov"):
        multimodal.sample_frames(media, every_ms=500, fake=False).collect()


# --------------------------------------------------- PNG (hand-rolled)


def _png_chunks(w, h, depth, color, interlace, scan, plte=None):
    """Assemble a PNG from already-filtered scanline bytes (the test's
    own chunk writer — independent of codecs.encode_png)."""
    import zlib as Z

    def chunk(t, b):
        return (
            len(b).to_bytes(4, "big") + t + b
            + (Z.crc32(t + b) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([depth, color, 0, 0, interlace])
    )
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", Z.compress(scan)) + chunk(b"IEND", b"")


def _png_forward_filter(arr: np.ndarray, bpp: int, ftypes) -> bytes:
    """Spec §6 FORWARD filters (written from the spec, independent of
    the decoder's unfilter) — recon references are the original bytes."""
    h, stride = arr.shape
    out = bytearray()
    zero = np.zeros(stride, int)
    for y, ft in enumerate(ftypes):
        cur = arr[y].astype(int)
        prev = arr[y - 1].astype(int) if y else zero
        left = np.concatenate([np.zeros(bpp, int), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, int), prev[:-bpp]])
        if ft == 0:
            f = cur
        elif ft == 1:
            f = cur - left
        elif ft == 2:
            f = cur - prev
        elif ft == 3:
            f = cur - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            f = cur - pred
        out.append(ft)
        out += bytes((f % 256).astype(np.uint8))
    return bytes(out)


def test_png_roundtrip_encode_decode():
    rng = np.random.default_rng(11)
    for shape in [(7, 5), (6, 9, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        data = codecs.encode_png(img)
        assert codecs.sniff(data) == "png"
        out = codecs.decode_png(data)
        np.testing.assert_array_equal(out, img)
        # byte-deterministic: same input → same bytes
        assert codecs.encode_png(img) == data


def test_png_all_filter_types_golden():
    """Every scanline filter (None/Sub/Up/Average/Paeth) forward-filtered
    per spec in the test, reconstructed by the decoder."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    scan = _png_forward_filter(img.reshape(5, 12), bpp=3, ftypes=[0, 1, 2, 3, 4])
    out = codecs.decode_png(_png_chunks(4, 5, 8, 2, 0, scan))
    np.testing.assert_array_equal(out, img)
    # gray single-channel through the same five filters
    g = rng.integers(0, 256, (5, 6), dtype=np.uint8)
    scan = _png_forward_filter(g, bpp=1, ftypes=[4, 3, 2, 1, 0])
    np.testing.assert_array_equal(codecs.decode_png(_png_chunks(6, 5, 8, 0, 0, scan)), g)


def test_png_palette_alpha_16bit():
    # palette: indices → PLTE rows
    idx = np.array([[0, 1], [2, 1]], np.uint8)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    scan = _png_forward_filter(idx, bpp=1, ftypes=[0, 0])
    out = codecs.decode_png(_png_chunks(2, 2, 8, 3, 0, scan, plte=plte))
    np.testing.assert_array_equal(
        out, np.array([[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [0, 255, 0]]])
    )
    # RGBA: alpha dropped
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, (3, 2, 4), dtype=np.uint8)
    scan = _png_forward_filter(rgba.reshape(3, 8), bpp=4, ftypes=[0, 2, 1])
    out = codecs.decode_png(_png_chunks(2, 3, 8, 6, 0, scan))
    np.testing.assert_array_equal(out, rgba[:, :, :3])
    # gray+alpha: alpha dropped
    ga = rng.integers(0, 256, (2, 3, 2), dtype=np.uint8)
    scan = _png_forward_filter(ga.reshape(2, 6), bpp=2, ftypes=[0, 4])
    np.testing.assert_array_equal(
        codecs.decode_png(_png_chunks(3, 2, 8, 4, 0, scan)), ga[:, :, 0]
    )
    # 16-bit gray, value 0xABAB replicated → high byte exact
    g16 = np.full((2, 2), 0xAB, np.uint8)
    raw = np.repeat(g16.reshape(2, 2), 2, axis=1)  # hi, lo both 0xAB
    scan = _png_forward_filter(raw, bpp=2, ftypes=[0, 0])
    np.testing.assert_array_equal(
        codecs.decode_png(_png_chunks(2, 2, 16, 0, 0, scan)), g16
    )


_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _adam7_forward(img: np.ndarray, bpp: int) -> bytes:
    """Spec §8.2 FORWARD interleave written in the test: split into the
    7 passes, forward-filter each sub-image independently (cycling
    filter types so every pass exercises a different one)."""
    h, w = img.shape[:2]
    px = img.reshape(h, w, bpp)
    out = bytearray()
    for i, (x0, y0, dx, dy) in enumerate(_ADAM7):
        sub = px[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        hp, wp = sub.shape[:2]
        ftypes = [(i + r) % 5 for r in range(hp)]
        out += _png_forward_filter(sub.reshape(hp, wp * bpp), bpp, ftypes)
    return bytes(out)


def test_png_adam7_interlaced():
    rng = np.random.default_rng(31)
    # sizes around the 8x8 pass grid: smaller, exact, larger, ragged
    for shape in [(3, 5), (8, 8), (13, 21, 3), (16, 9, 3), (1, 1), (2, 10, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        bpp = 1 if img.ndim == 2 else 3
        color = 0 if bpp == 1 else 2
        h, w = shape[:2]
        scan = _adam7_forward(img, bpp)
        out = codecs.decode_png(_png_chunks(w, h, 8, color, 1, scan))
        np.testing.assert_array_equal(out, img, err_msg=str(shape))


def _pack_subbyte_rows(img: np.ndarray, depth: int) -> np.ndarray:
    """(h, w) pixel values → (h, stride) packed scanline bytes,
    big-endian within each byte (spec §7.2)."""
    h, w = img.shape
    bits = np.zeros((h, w, depth), np.uint8)
    for b in range(depth):
        bits[:, :, b] = (img >> (depth - 1 - b)) & 1
    flat = bits.reshape(h, w * depth)
    pad = (-flat.shape[1]) % 8
    if pad:
        flat = np.concatenate([flat, np.zeros((h, pad), np.uint8)], axis=1)
    return np.packbits(flat, axis=1)


def test_png_1bit_gray_all_filters():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 2, size=(5, 11), dtype=np.uint8)
    packed = _pack_subbyte_rows(img, 1)
    scan = _png_forward_filter(packed, bpp=1, ftypes=[0, 1, 2, 3, 4])
    out = codecs.decode_png(_png_chunks(11, 5, 1, 0, 0, scan))
    np.testing.assert_array_equal(out, img * 255)


def test_png_2bit_gray_scaling():
    img = np.array([[0, 1, 2, 3, 3, 2, 1, 0, 2]], np.uint8)
    packed = _pack_subbyte_rows(img, 2)
    scan = _png_forward_filter(packed, bpp=1, ftypes=[0])
    out = codecs.decode_png(_png_chunks(9, 1, 2, 0, 0, scan))
    np.testing.assert_array_equal(out, img * 85)  # 255 // 3


def test_png_4bit_palette():
    rng = np.random.RandomState(7)
    idx = rng.randint(0, 16, size=(4, 7), dtype=np.uint8)
    pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    packed = _pack_subbyte_rows(idx, 4)
    scan = _png_forward_filter(packed, bpp=1, ftypes=[0, 2, 1, 4])
    out = codecs.decode_png(
        _png_chunks(7, 4, 4, 3, 0, scan, plte=pal.tobytes()))
    np.testing.assert_array_equal(out, pal[idx])


def test_png_4bit_gray_adam7():
    from hbase_snapshot_spark.operators.codecs import _ADAM7
    rng = np.random.RandomState(11)
    img = rng.randint(0, 16, size=(9, 10), dtype=np.uint8)
    scan = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        packed = _pack_subbyte_rows(sub, 4)
        scan += _png_forward_filter(
            packed, bpp=1, ftypes=[y % 5 for y in range(sub.shape[0])])
    out = codecs.decode_png(_png_chunks(10, 9, 4, 0, 1, bytes(scan)))
    np.testing.assert_array_equal(out, img.astype(int) * 255 // 15)


def test_png_subbyte_rgb_invalid():
    scan = _png_forward_filter(np.zeros((1, 3), np.uint8), 1, [0])
    with pytest.raises(ValueError, match="invalid"):
        codecs.decode_png(_png_chunks(3, 1, 4, 2, 0, scan))


# -------------------------------------------------- JPEG (hand-rolled)


def test_jpeg_roundtrip_close():
    """encode_jpeg → decode_jpeg error bound on smooth content, plus
    byte-determinism of both directions."""
    x = np.linspace(0, 255, 48)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    enc = codecs.encode_jpeg(img, quality=95)
    assert codecs.sniff(enc) == "jpeg"
    dec = codecs.decode_jpeg(enc)
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3
    assert codecs.encode_jpeg(img, quality=95) == enc
    np.testing.assert_array_equal(codecs.decode_jpeg(enc), dec)

    rgb = np.stack([img, img[::-1], img.T], axis=-1)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(rgb, quality=95))
    assert dec.shape == rgb.shape
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 6

    # odd (non-multiple-of-8) dimensions exercise the padding/crop path
    odd = np.full((19, 23, 3), 117, np.uint8)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(odd, quality=90))
    assert dec.shape == (19, 23, 3)
    assert np.abs(dec.astype(int) - 117).max() <= 2


def _handmade_jpeg_420(width, height, y_level, restart=0):
    """A 4:2:0 solid-color baseline JPEG built marker-by-marker in the
    test (independent of encode_jpeg, which only emits 4:4:4): flat
    quant 16/17, the codec module's single-length Huffman layout, DRI +
    RSTn markers when restart > 0.  Solid level makes the decode
    analytic: qdc = round(8*(L-128)/16); pixel = qdc*16/8 + 128."""
    from hbase_snapshot_spark.operators.codecs import (
        _ENC_AC_COUNTS, _ENC_AC_SYMBOLS, _ENC_DC_COUNTS, _ENC_DC_SYMBOLS,
        _enc_codes, _JpegBitWriter,
    )

    dc = _enc_codes(_ENC_DC_COUNTS, _ENC_DC_SYMBOLS)
    ac = _enc_codes(_ENC_AC_COUNTS, _ENC_AC_SYMBOLS)
    qdc = round(8 * (y_level - 128) / 16)

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([16] * 64))
    out += seg(0xDB, bytes([1]) + bytes([17] * 64))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])  # Y 2x2, Cb, Cr 1x1
    out += seg(0xC0, sof)
    for cls, counts, syms in [
        (0, _ENC_DC_COUNTS, _ENC_DC_SYMBOLS), (1, _ENC_AC_COUNTS, _ENC_AC_SYMBOLS)
    ]:
        for tid in (0, 1):
            out += seg(0xC4, bytes([(cls << 4) | tid]) + counts + syms)
    if restart:
        out += seg(0xDD, restart.to_bytes(2, "big"))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    mcus_x, mcus_y = -(-width // 16), -(-height // 16)
    n_mcus = mcus_x * mcus_y
    segments, writer, in_seg, preds = [], _JpegBitWriter(), 0, [0, 0, 0]

    def put_block(ci, value):
        diff = value - preds[ci]
        preds[ci] = value
        t = abs(diff).bit_length()
        c, ln = dc[t]
        writer.write(c, ln)
        if t:
            writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        c, ln = ac[0x00]  # EOB
        writer.write(c, ln)

    for _m in range(n_mcus):
        for _ in range(4):  # four Y blocks
            put_block(0, qdc)
        put_block(1, 0)  # Cb
        put_block(2, 0)  # Cr
        in_seg += 1
        if restart and in_seg == restart and _m < n_mcus - 1:
            segments.append(writer.flush())
            writer, in_seg, preds = _JpegBitWriter(), 0, [0, 0, 0]
    segments.append(writer.flush())
    for i, s in enumerate(segments):
        out += s
        if i < len(segments) - 1:
            out += bytes([0xFF, 0xD0 + (i % 8)])
    out += b"\xff\xd9"
    return bytes(out), qdc * 16 / 8 + 128


def test_jpeg_420_subsampling_and_restart_golden():
    """Hand-built 4:2:0 stream with restart markers; analytic output."""
    data, level = _handmade_jpeg_420(32, 16, y_level=200, restart=1)
    out = codecs.decode_jpeg(data)
    assert out.shape == (16, 32, 3)
    np.testing.assert_array_equal(out, np.full((16, 32, 3), int(level), np.uint8))
    # same stream without restarts decodes identically
    data2, _ = _handmade_jpeg_420(32, 16, y_level=200, restart=0)
    np.testing.assert_array_equal(codecs.decode_jpeg(data2), out)
    # odd-size crop with subsampling: 20x12 → MCU padding cropped away
    data3, _ = _handmade_jpeg_420(20, 12, y_level=90)
    assert codecs.decode_jpeg(data3).shape == (12, 20, 3)


def _prog_writer_codes():
    from hbase_snapshot_spark.operators.codecs import (
        _ENC_AC_COUNTS, _ENC_AC_SYMBOLS, _ENC_DC_COUNTS, _ENC_DC_SYMBOLS,
        _enc_codes, _JpegBitWriter,
    )

    return (
        _enc_codes(_ENC_DC_COUNTS, _ENC_DC_SYMBOLS),
        _enc_codes(_ENC_AC_COUNTS, _ENC_AC_SYMBOLS),
        _JpegBitWriter,
    )


def _seg(marker, body):
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _prog_headers(w, h, gray=True, quant=16):
    """SOI + DQT + SOF2 + DHT for a hand-built progressive stream."""
    from hbase_snapshot_spark.operators.codecs import (
        _ENC_AC_COUNTS, _ENC_AC_SYMBOLS, _ENC_DC_COUNTS, _ENC_DC_SYMBOLS,
    )

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([quant] * 64))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes([17] * 64))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    if gray:
        sof += bytes([1, 1, 0x11, 0])
    else:
        sof += bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _seg(0xC2, sof)
    for cls, counts, syms in [
        (0, _ENC_DC_COUNTS, _ENC_DC_SYMBOLS), (1, _ENC_AC_COUNTS, _ENC_AC_SYMBOLS)
    ]:
        for tid in (0, 1) if not gray else (0,):
            out += _seg(0xC4, bytes([(cls << 4) | tid]) + counts + syms)
    return out


def _sos(comps, ss, se, ah, al):
    body = bytes([len(comps)])
    for cid, tabs in comps:
        body += bytes([cid, tabs])
    return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))


def _put_dc(writer, dc_codes, diff):
    t = abs(diff).bit_length()
    c, ln = dc_codes[t]
    writer.write(c, ln)
    if t:
        writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)


def test_jpeg_progressive_dc_successive_approximation():
    """Solid gray 8x8 via SOF2: DC-first scan at Al=1 then DC
    refinement at Al=0 — analytic output level."""
    dc, ac, W = _prog_writer_codes()
    level = 202
    qdc = int(round(8 * (level - 128) / 16))  # 37: odd → refine bit = 1
    out = bytearray(_prog_headers(8, 8))
    # scan 1: DC first, Al=1 — sends qdc>>1
    w1 = W()
    _put_dc(w1, dc, qdc >> 1)
    out += _sos([(1, 0x00)], 0, 0, 0, 1) + w1.flush()
    # scan 2: DC refinement, Al=0 — one bit per block
    w2 = W()
    w2.write(qdc & 1, 1)
    out += _sos([(1, 0x00)], 0, 0, 1, 0) + w2.flush()
    out += b"\xff\xd9"
    img = codecs.decode_jpeg(bytes(out))
    want = int(np.clip(round(qdc * 16 / 8) + 128, 0, 255))
    np.testing.assert_array_equal(img, np.full((8, 8), want, np.uint8))


def test_jpeg_progressive_ac_spectral_and_refinement():
    """Single AC coefficient through spectral selection + successive
    approximation; expected block computed from the DCT basis in the
    test."""
    from hbase_snapshot_spark.operators.codecs import _DCT8, _ZIGZAG

    dc, ac, W = _prog_writer_codes()
    k, val = 5, 10  # zigzag index 5 (natural 2: row 0 col 2), coeff 10

    def expected():
        F = np.zeros((8, 8))
        F.flat[_ZIGZAG[k]] = val * 16  # dequantized
        spatial = _DCT8.T @ F @ _DCT8 + 128.0
        return np.clip(np.round(spatial), 0, 255).astype(np.uint8)

    # --- variant 1: one full-precision AC scan (Ss=1..63, Al=0)
    out = bytearray(_prog_headers(8, 8))
    w1 = W()
    _put_dc(w1, dc, 0)
    out += _sos([(1, 0x00)], 0, 0, 0, 0) + w1.flush()
    w2 = W()
    r, s = k - 1, abs(val).bit_length()  # 4 zeros then the value
    c, ln = ac[(r << 4) | s]
    w2.write(c, ln)
    w2.write(val if val >= 0 else val + (1 << s) - 1, s)
    c, ln = ac[0x00]  # EOB
    w2.write(c, ln)
    out += _sos([(1, 0x00)], 1, 63, 0, 0) + w2.flush()
    out += b"\xff\xd9"
    np.testing.assert_array_equal(codecs.decode_jpeg(bytes(out)), expected())

    # --- variant 2: AC first at Al=1 (sends val>>1) + refinement at
    # Al=0 (EOB with a correction bit for the nonzero-history coeff)
    out = bytearray(_prog_headers(8, 8))
    w1 = W()
    _put_dc(w1, dc, 0)
    out += _sos([(1, 0x00)], 0, 0, 0, 0) + w1.flush()
    w2 = W()
    half = val >> 1
    s = abs(half).bit_length()
    c, ln = ac[((k - 1) << 4) | s]
    w2.write(c, ln)
    w2.write(half if half >= 0 else half + (1 << s) - 1, s)
    c, ln = ac[0x00]
    w2.write(c, ln)
    out += _sos([(1, 0x00)], 1, 63, 0, 1) + w2.flush()
    w3 = W()
    c, ln = ac[0x00]  # EOB(0): covers the block, correction bits follow
    w3.write(c, ln)
    w3.write(val & 1, 1)  # correction bit for the coeff at k
    out += _sos([(1, 0x00)], 1, 63, 1, 0) + w3.flush()
    out += b"\xff\xd9"
    np.testing.assert_array_equal(codecs.decode_jpeg(bytes(out)), expected())


def test_jpeg_progressive_420_interleaved_dc_with_restarts():
    """3-component 4:2:0 progressive: interleaved DC scan with DRI=1 +
    RST markers, then per-component EOBRUN-only AC scans → analytic
    solid color."""
    dc, ac, W = _prog_writer_codes()
    level = 200
    qdc = int(round(8 * (level - 128) / 16))
    out = bytearray(_prog_headers(32, 16, gray=False))
    out += _seg(0xDD, (1).to_bytes(2, "big"))  # DRI = 1 MCU
    # interleaved DC scan, 2 MCUs, restart between (preds reset)
    segs = []
    for _ in range(2):
        w1 = W()
        _put_dc(w1, dc, qdc)       # first Y block diff
        for _ in range(3):
            _put_dc(w1, dc, 0)     # other Y blocks
        _put_dc(w1, dc, 0)         # Cb
        _put_dc(w1, dc, 0)         # Cr
        segs.append(w1.flush())
    out += _sos([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 0, 0)
    out += segs[0] + b"\xff\xd0" + segs[1]
    out += _seg(0xDD, (0).to_bytes(2, "big"))  # restarts off for AC scans
    # per-component AC scans: all zeros via one EOBRUN per scan
    for cid, tabs, nblocks in [(1, 0x00, 8), (2, 0x11, 2), (3, 0x11, 2)]:
        w2 = W()
        run = nblocks - 1  # EOB consumes this block; run covers the rest
        r = run.bit_length()
        c, ln = ac[(r << 4) | 0x00]
        w2.write(c, ln)
        w2.write(run - ((1 << r) - 1), r)
        out += _sos([(cid, tabs)], 1, 63, 0, 0) + w2.flush()
    out += b"\xff\xd9"
    img = codecs.decode_jpeg(bytes(out))
    assert img.shape == (16, 32, 3)
    want = int(np.clip(round(qdc * 16 / 8) + 128, 0, 255))
    np.testing.assert_array_equal(img, np.full((16, 32, 3), want, np.uint8))


def test_jpeg_truncated_raises():
    data, _ = _handmade_jpeg_420(32, 32, y_level=150)
    with pytest.raises(ValueError, match="truncated|Huffman|marker"):
        codecs.decode_jpeg(data[: len(data) // 2])


def test_jpeg_fill_bytes_before_markers():
    """Spec B.1.1.2: any number of 0xFF fill bytes may precede a marker.
    Inject fill bytes (a) between header segments, (b) before RSTn
    inside the entropy stream, (c) before EOI — decode must be
    unchanged."""
    x = np.linspace(0, 255, 24)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    enc = codecs.encode_jpeg(img, quality=95)
    ref = codecs.decode_jpeg(enc)

    # (a) fill bytes between header segments: right after SOI
    padded = enc[:2] + b"\xff\xff\xff" + enc[2:]
    np.testing.assert_array_equal(codecs.decode_jpeg(padded), ref)

    # (c) fill bytes before EOI terminate the entropy scan correctly
    assert enc.endswith(b"\xff\xd9")
    padded = enc[:-2] + b"\xff\xff" + enc[-2:]
    np.testing.assert_array_equal(codecs.decode_jpeg(padded), ref)

    # (b) fill bytes before every RSTn marker in a restart-interval
    # stream (raw 0xFF 0xD0-0xD7 only occur as markers — entropy 0xFF
    # data bytes are stuffed as 0xFF 0x00)
    data, expect = _handmade_jpeg_420(32, 32, y_level=150, restart=2)
    ref = codecs.decode_jpeg(data)
    out = bytearray()
    i = 0
    while i < len(data):
        if (data[i] == 0xFF and i + 1 < len(data)
                and 0xD0 <= data[i + 1] <= 0xD7):
            out += b"\xff"
        out.append(data[i])
        i += 1
    np.testing.assert_array_equal(codecs.decode_jpeg(bytes(out)), ref)


def test_decode_images_real_png_jpeg(spark):
    """PNG/JPEG payloads through the Spark mapInPandas decode pipeline."""
    png = codecs.encode_png(RGB)
    jpg = codecs.encode_jpeg(np.full((8, 8, 3), 130, np.uint8), quality=90)
    media = _media_df(spark, [png, jpg])
    out = {r.media_id: r for r in
           multimodal.decode_images(media, fake=False).collect()}
    assert out[0].width == 3 and out[0].height == 2 and out[0].channels == 3
    assert out[0].mean_intensity == round(float(RGB.mean()), 4)
    assert out[1].width == 8 and out[1].channels == 3
    assert abs(out[1].mean_intensity - 130.0) <= 2.0
    resized = multimodal.resize_images(media, width=4, height=4, fake=False).collect()
    for r in resized:
        assert codecs.decode_pnm(bytes(r.payload)).shape == (4, 4, 3)


# ------------------------------------------------- property tests


def test_png_roundtrip_property():
    """Randomized PNG roundtrips (hypothesis): exact for any uint8
    array, any shape."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=25, deadline=None)
    @given(
        st.one_of(
            arrays(np.uint8, st.tuples(st.integers(1, 12), st.integers(1, 12))),
            arrays(np.uint8, st.tuples(st.integers(1, 9), st.integers(1, 9),
                                       st.just(3))),
        )
    )
    def roundtrip(img):
        np.testing.assert_array_equal(codecs.decode_png(codecs.encode_png(img)), img)

    roundtrip()


def test_jpeg_roundtrip_property():
    """Randomized JPEG roundtrips (hypothesis): at quality 100 on
    uniform-blocks content the error stays within IDCT rounding."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 255),
           st.booleans())
    def roundtrip(h, w, level, gray):
        shape = (h, w) if gray else (h, w, 3)
        img = np.full(shape, level, np.uint8)
        dec = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=100))
        assert dec.shape == shape
        assert np.abs(dec.astype(int) - int(level)).max() <= 1

    roundtrip()


def test_wav_g711_alaw_mulaw():
    """G.711 telephony formats (WAV fmt 6 = A-law, 7 = mu-law) against
    the ITU reference expansion: the canonical codec identities
    A-law(0x55 toggle) and mu-law bias-0x84 must hold exactly."""
    # mu-law: encode a known linear value per the ITU algorithm in the
    # TEST (independent of the decoder), roundtrip through decode
    def mulaw_encode(x):
        BIAS, CLIP = 0x84, 32635
        s = 0x80 if x < 0 else 0
        x = min(abs(x), CLIP) + BIAS
        e = 7
        for i in range(7, -1, -1):
            if x & (0x4000 >> (7 - i)):
                e = i
                break
        m = (x >> (e + 3)) & 0x0F
        return ~(s | (e << 4) | m) & 0xFF

    linear = [0, 8, 100, 1000, 8000, 32000, -8, -1000, -32000]
    raw = bytes(mulaw_encode(v) for v in linear)
    wav = (b"RIFF" + (4 + 8 + 16 + 8 + len(raw)).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
           + b"data" + len(raw).to_bytes(4, "little") + raw)
    rate, out = codecs.decode_wav(wav)
    assert rate == 8000
    # mu-law quantization error bound: one step of the segment
    for got, want in zip(out, linear):
        assert abs(int(got) - want) <= max(32, abs(want) / 16), (got, want)

    # A-law: bit 7 SET means POSITIVE (ITU G.711, confirmed by the r10
    # stdlib-audioop cross-validation that caught the original sign
    # flip): code 0x55 (0x55-toggled 0, sign bit clear) is -8; code
    # 0xD5 (sign bit set) is +8
    wav = (b"RIFF" + (4 + 8 + 16 + 8 + 2).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + struct.pack("<HHIIHH", 6, 1, 8000, 8000, 1, 8)
           + b"data" + (2).to_bytes(4, "little") + bytes([0x55, 0xD5]))
    _, out = codecs.decode_wav(wav)
    assert list(out) == [-8, 8]


# ------------------------------------------------------- lossless JPEG


def _lossless_jpeg(img, predictor=1, pt=0, precision=8, restart=0,
                   interleaved=True) -> bytes:
    """Hand-written SOF3 stream (spec Annex H), the test-side twin of
    the decoder: predict per the selected mode, category-encode the
    differences (modulo 65536), one DHT with categories 0..16.
    ``img`` is in the point-transform-descaled domain."""
    from hbase_snapshot_spark.operators.codecs import (
        _JpegBitWriter, _enc_codes)

    arr = (img[:, :, None] if img.ndim == 2 else img).astype(np.int64)
    h, w, ncomp = arr.shape
    counts = bytes([0, 0, 0, 0, 17] + [0] * 11)
    symbols = bytes(range(17))
    codes = _enc_codes(counts, symbols)
    default = 1 << (precision - pt - 1)

    def predict(plane, y, x, first):
        if first:
            return default
        if y == 0:
            return int(plane[0, x - 1])
        if x == 0:
            return int(plane[y - 1, 0])
        ra, rb, rc = (int(plane[y, x - 1]), int(plane[y - 1, x]),
                      int(plane[y - 1, x - 1]))
        return {1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
                5: ra + ((rb - rc) >> 1), 6: rb + ((ra - rc) >> 1),
                7: (ra + rb) >> 1}[predictor]

    def put_diff(writer, diff):
        diff = ((diff + 32768) & 0xFFFF) - 32768  # mod-2^16 symmetric
        if diff == -32768:
            writer.write(*codes[16])  # SSSS 16: no magnitude bits
            return
        t = abs(diff).bit_length()
        writer.write(*codes[t])
        if t:
            writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)

    def entropy(comp_indexes):
        out = bytearray()
        writer = _JpegBitWriter()
        total, rst = h * w, 0
        for mcu in range(total):
            y, x = divmod(mcu, w)
            first = mcu == 0 or (restart and mcu % restart == 0)
            if restart and mcu and mcu % restart == 0:
                out += writer.flush() + bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                writer = _JpegBitWriter()
            for c in comp_indexes:
                plane = arr[:, :, c]
                put_diff(writer, int(plane[y, x]) - predict(plane, y, x, first))
        return bytes(out + writer.flush())

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    dht = seg(0xC4, bytes([0x00]) + counts + symbols)
    sof = bytes([precision]) + struct.pack(">HHB", h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])
    out = b"\xff\xd8" + dht + seg(0xC3, sof)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))

    def sos(comp_ids):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([predictor, 0, pt])
        return seg(0xDA, body)

    if interleaved or ncomp == 1:
        out += sos(list(range(1, ncomp + 1)))
        out += entropy(list(range(ncomp)))
    else:
        for c in range(ncomp):
            out += sos([c + 1]) + entropy([c])
    return out + b"\xff\xd9"


def test_jpeg_lossless_all_predictors_exact():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(9, 7), dtype=np.int64)
    for predictor in range(1, 8):
        out = codecs.decode_jpeg(_lossless_jpeg(img, predictor=predictor))
        assert out.dtype == np.uint8 and out.shape == (9, 7)
        np.testing.assert_array_equal(out, img.astype(np.uint8)), predictor


def test_jpeg_lossless_rgb_interleaved_and_separate_scans():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(6, 5, 3), dtype=np.int64)
    for interleaved in (True, False):
        out = codecs.decode_jpeg(
            _lossless_jpeg(img, predictor=4, interleaved=interleaved))
        assert out.shape == (6, 5, 3)
        np.testing.assert_array_equal(out, img.astype(np.uint8))


def test_jpeg_lossless_restart_and_point_transform():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(8, 6), dtype=np.int64)
    out = codecs.decode_jpeg(_lossless_jpeg(img, predictor=7, restart=10))
    np.testing.assert_array_equal(out, img.astype(np.uint8))
    # Pt=1: stream carries img>>1, decoder re-scales by <<1
    out = codecs.decode_jpeg(_lossless_jpeg(img >> 1, predictor=1, pt=1))
    np.testing.assert_array_equal(out, ((img >> 1) << 1).astype(np.uint8))


def test_jpeg_lossless_12bit_high_byte():
    rng = np.random.RandomState(13)
    img12 = rng.randint(0, 4096, size=(5, 5), dtype=np.int64)
    out = codecs.decode_jpeg(_lossless_jpeg(img12, predictor=2, precision=12))
    np.testing.assert_array_equal(out, (img12 >> 4).astype(np.uint8))


# ------------------------------------------------- JPEG CMYK / YCCK


def _cmyk_expected_rgb(cmyk):
    """Analytic composite: R = (255-C)(255-K)/255 etc., rounded."""
    s = 255.0 - cmyk.astype(np.float64)
    rgb = np.stack([s[..., 0] * s[..., 3], s[..., 1] * s[..., 3],
                    s[..., 2] * s[..., 3]], axis=-1) / 255.0
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def test_jpeg_cmyk_roundtrip():
    """encode_jpeg (CMYK, Adobe APP14 transform 0) → decode_jpeg
    recovers the analytic CMYK→RGB composite within DCT error."""
    cmyk = np.zeros((16, 16, 4), np.uint8)
    cmyk[:, :, 0] = 200   # heavy cyan
    cmyk[:8, :, 1] = 60   # some magenta top half
    cmyk[:, :8, 3] = 30   # light black left half
    enc = codecs.encode_jpeg(cmyk, quality=97)
    assert b"Adobe" in enc
    dec = codecs.decode_jpeg(enc)
    assert dec.shape == (16, 16, 3)
    exp = _cmyk_expected_rgb(cmyk)
    assert np.abs(dec.astype(int) - exp.astype(int)).max() <= 6


def test_jpeg_cmyk_no_adobe_marker_raw_ink():
    """Without APP14 the 4 planes are read as RAW ink.  Strip the
    marker from an encoder output: stored values are inverted ink, so
    the decoder's ink' = 255 - ink and the composite flips."""
    cmyk = np.full((8, 8, 4), 0, np.uint8)
    cmyk[:, :, 3] = 255  # solid black ink
    enc = codecs.encode_jpeg(cmyk, quality=100)
    i = enc.index(b"\xff\xee")
    seg_len = int.from_bytes(enc[i + 2 : i + 4], "big")
    stripped = enc[:i] + enc[i + 2 + seg_len :]
    assert b"Adobe" not in stripped
    dec = codecs.decode_jpeg(stripped)
    # stored planes are (255,255,255,0) = inverted ink; read raw:
    # ink=(255,255,255,0) → s=(0,0,0,255) → RGB ≈ 0
    assert dec.shape == (8, 8, 3)
    assert dec.max() <= 4
    # and WITH the marker the same file is solid black too
    # (ink K=255): both conventions agree here by construction
    assert codecs.decode_jpeg(enc).max() <= 4


def test_jpeg_ycck_transform2():
    """Patch an encoder output into YCCK: craft CMYK input whose
    inverted planes equal (Y, Cb, Cr, sK) of a target color, then flip
    the APP14 transform byte to 2 — decode must invert the YCbCr step
    first and land on the target composite."""
    sc, sm, sy, sk = 200.0, 150.0, 100.0, 220.0  # inverted-ink targets
    y = 0.299 * sc + 0.587 * sm + 0.114 * sy
    cb = -0.168736 * sc - 0.331264 * sm + 0.5 * sy + 128.0
    cr = 0.5 * sc - 0.418688 * sm - 0.081312 * sy + 128.0
    planes = np.array([y, cb, cr, sk])
    img = np.zeros((8, 8, 4), np.uint8)
    img[:, :] = np.clip(np.rint(255.0 - planes), 0, 255).astype(np.uint8)
    enc = bytearray(codecs.encode_jpeg(img, quality=100))
    t = enc.index(b"Adobe") + 11
    assert enc[t] == 0
    enc[t] = 2
    dec = codecs.decode_jpeg(bytes(enc))
    exp = np.array([sc * sk, sm * sk, sy * sk]) / 255.0
    assert np.abs(dec[4, 4].astype(float) - exp).max() <= 8.0


def test_jpeg_5_component_raises():
    img = np.zeros((8, 8, 3), np.uint8)
    enc = bytearray(codecs.encode_jpeg(img))
    i = enc.index(b"\xff\xc0")
    # ncomp byte is at SOF body offset 5 (precision 1 + h 2 + w 2)
    enc[i + 4 + 5] = 5
    with pytest.raises((NotImplementedError, ValueError, IndexError)):
        codecs.decode_jpeg(bytes(enc))


# --------------------------------------------------------------- ADPCM
#
# Scalar clean-room transcriptions of the published per-sample
# algorithms (IMA 1992 recommended practices; Microsoft WAVE standard)
# serve as the reference: the vectorized decoder in codecs.py must
# match them EXACTLY on arbitrary nibble streams, and a test-local
# encoder proves the decode is semantically right (SNR), not merely
# self-consistent with a second transcription.

_IMA_STEPS_REF = codecs._IMA_STEPS.tolist()
_IMA_INDEX_REF = [-1, -1, -1, -1, 2, 4, 6, 8]
_MS_ADAPT_REF = [230, 230, 230, 230, 307, 409, 512, 614,
                 768, 614, 512, 409, 307, 230, 230, 230]
_MS_COEFS_REF = [(256, 0), (512, -256), (0, 0), (192, 64),
                 (240, 0), (460, -208), (392, -232)]


def _ima_dec_nibble(n, pred, index):
    step = _IMA_STEPS_REF[index]
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    pred = max(-32768, min(32767, pred + (-diff if n & 8 else diff)))
    index = max(0, min(88, index + _IMA_INDEX_REF[n & 7]))
    return pred, index


def _ima_enc_nibble(sample, pred, index):
    step = _IMA_STEPS_REF[index]
    diff = sample - pred
    n = 8 if diff < 0 else 0
    diff = abs(diff)
    if diff >= step:
        n |= 4
        diff -= step
    if diff >= step >> 1:
        n |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        n |= 1
    return n


def _ima_block(nibbles_per_ch, preds, indexes):
    """Build one IMA WAV block from per-channel nibble lists (equal
    length, multiple of 8) + per-channel header state."""
    nch = len(nibbles_per_ch)
    out = bytearray()
    for c in range(nch):
        out += struct.pack("<hBB", preds[c], indexes[c], 0)
    t = len(nibbles_per_ch[0])
    for g in range(t // 8):
        for c in range(nch):
            ns = nibbles_per_ch[c][g * 8:(g + 1) * 8]
            for i in range(4):
                out.append(ns[2 * i] | (ns[2 * i + 1] << 4))
    return bytes(out)


def _adpcm_wav(fmt_tag, nch, rate, block_align, blocks, fact=None,
               fmt_ext=b""):
    raw = b"".join(blocks)
    fmt_body = struct.pack("<HHIIHH", fmt_tag, nch, rate,
                           rate * block_align, block_align, 4) + fmt_ext
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if fact is not None:
        chunks += b"fact" + struct.pack("<II", 4, fact)
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_ima_adpcm_mono_roundtrip():
    """Encode a sine with a test-local IMA encoder, decode via
    decode_wav: exact match with the scalar reference decode, and
    high SNR vs the original (proves semantic correctness)."""
    t = np.arange(1 + 8 * 63)  # one block: header sample + 504 nibbles
    sig = (6000 * np.sin(t / 7.0)).astype(np.int32)
    pred, index = int(sig[0]), 32
    nibbles, ref = [], [pred]
    p, ix = pred, index
    for s in sig[1:]:
        n = _ima_enc_nibble(int(s), p, ix)
        p, ix = _ima_dec_nibble(n, p, ix)
        nibbles.append(n)
        ref.append(p)
    wav = _adpcm_wav(17, 1, 8000, 4 + 252,
                     [_ima_block([nibbles], [pred], [index])],
                     fact=len(sig))
    rate, out = codecs.decode_wav(wav)
    assert rate == 8000
    np.testing.assert_array_equal(out, np.array(ref, np.int32))
    err = out.astype(np.float64) - sig
    snr = 10 * np.log10(np.mean(sig ** 2.0) / max(np.mean(err ** 2), 1e-9))
    assert snr > 20, snr


def test_wav_ima_adpcm_stereo_random_streams():
    """Arbitrary nibble streams, two channels, two blocks: vectorized
    decode must equal the scalar reference exactly (incl. the 4-byte
    channel-interleaved group layout and mean downmix)."""
    rng = np.random.RandomState(7)
    nch, t, nblocks = 2, 16, 2
    blocks, ref_ch = [], [[], []]
    for _ in range(nblocks):
        nibs = rng.randint(0, 16, size=(nch, t)).tolist()
        preds = [int(v) for v in rng.randint(-2000, 2000, nch)]
        idxs = [int(v) for v in rng.randint(0, 89, nch)]
        blocks.append(_ima_block(nibs, preds, idxs))
        for c in range(nch):
            p, ix = preds[c], idxs[c]
            ref_ch[c].append(p)
            for n in nibs[c]:
                p, ix = _ima_dec_nibble(n, p, ix)
                ref_ch[c].append(p)
    wav = _adpcm_wav(17, nch, 16000, nch * (4 + t // 2), blocks)
    rate, out = codecs.decode_wav(wav)
    want = np.round(np.mean(
        [np.concatenate([np.array(b) for b in ref_ch[c]], axis=None)
         for c in range(nch)], axis=0)).astype(np.int32)
    np.testing.assert_array_equal(out, want)


def _ms_dec_stream(nibbles, bpred, idelta, s1, s2):
    c1, c2 = _MS_COEFS_REF[bpred]
    out = [s2, s1]
    delta = idelta
    for n in nibbles:
        sn = n - 16 if n & 8 else n
        acc = s1 * c1 + s2 * c2
        predv = acc // 256 if acc >= 0 else -((-acc) // 256)
        predv = max(-32768, min(32767, predv + sn * delta))
        s2, s1 = s1, predv
        delta = max(16, (_MS_ADAPT_REF[n] * delta) >> 8)
        out.append(predv)
    return out


def _ms_block(nib_by_ch, bpreds, ideltas, s1s, s2s):
    nch = len(nib_by_ch)
    out = bytearray(bytes(bpreds))
    for arr in (ideltas, s1s, s2s):
        for v in arr:
            out += struct.pack("<h", v)
    stream = []
    for i in range(len(nib_by_ch[0])):
        for c in range(nch):
            stream.append(nib_by_ch[c][i])
    for i in range(0, len(stream), 2):
        out.append((stream[i] << 4) | stream[i + 1])
    return bytes(out)


def test_wav_ms_adpcm_mono_encoder_roundtrip():
    """Test-local MS ADPCM encoder (predictor 0) → decode_wav: exact
    match with the scalar reference, SNR sanity vs the original."""
    t = np.arange(2 + 2 * 40)
    sig = (5000 * np.sin(t / 5.0)).astype(np.int32)
    bpred, delta0 = 0, 100
    s2, s1 = int(sig[0]), int(sig[1])
    c1, c2 = _MS_COEFS_REF[bpred]
    nibbles = []
    p, q, delta = s1, s2, delta0
    for s in sig[2:]:
        acc = p * c1 + q * c2
        predv = acc // 256 if acc >= 0 else -((-acc) // 256)
        code = max(-8, min(7, int(round((int(s) - predv) / delta))))
        recon = max(-32768, min(32767, predv + code * delta))
        n = code & 0x0F
        nibbles.append(n)
        q, p = p, recon
        delta = max(16, (_MS_ADAPT_REF[n] * delta) >> 8)
    block = _ms_block([nibbles], [bpred], [delta0], [s1], [s2])
    wav = _adpcm_wav(2, 1, 8000, len(block), [block], fact=len(sig))
    rate, out = codecs.decode_wav(wav)
    ref = _ms_dec_stream(nibbles, bpred, delta0, s1, s2)
    np.testing.assert_array_equal(out, np.array(ref, np.int32))
    err = out.astype(np.float64) - sig
    snr = 10 * np.log10(np.mean(sig ** 2.0) / max(np.mean(err ** 2), 1e-9))
    assert snr > 20, snr


def test_wav_ms_adpcm_stereo_random_and_fmt_coefs():
    """Random nibble streams, stereo, custom coefficient table in the
    fmt extension: exact scalar-reference equality after downmix."""
    rng = np.random.RandomState(11)
    nch, t = 2, 24
    nibs = rng.randint(0, 16, size=(nch, t)).tolist()
    bpreds = [1, 3]
    ideltas, s1s, s2s = [500, 90], [1200, -800], [-300, 40]
    block = _ms_block(nibs, bpreds, ideltas, s1s, s2s)
    # fmt extension restating the standard table (exercises the parse)
    ext = struct.pack("<HHH", 2 + t, 2, 7)
    for a, b in _MS_COEFS_REF:
        ext += struct.pack("<hh", a, b)
    wav = _adpcm_wav(2, nch, 22050, len(block), [block], fmt_ext=ext)
    rate, out = codecs.decode_wav(wav)
    ch = [_ms_dec_stream(nibs[c], bpreds[c], ideltas[c], s1s[c], s2s[c])
          for c in range(nch)]
    want = np.round(np.mean(np.array(ch, np.float64), axis=0)).astype(np.int32)
    np.testing.assert_array_equal(out, want)


def test_wav_adpcm_fact_trims_padding():
    """A short final block: fact frame count trims block padding."""
    nibbles = [4, 12, 2, 9, 0, 15, 7, 8]
    block = _ima_block([nibbles], [100], [20])
    wav = _adpcm_wav(17, 1, 8000, len(block), [block], fact=5)
    _, out = codecs.decode_wav(wav)
    p, ix, ref = 100, 20, [100]
    for n in nibbles[:4]:
        p, ix = _ima_dec_nibble(n, p, ix)
        ref.append(p)
    np.testing.assert_array_equal(out, np.array(ref, np.int32))


# ------------------------------------------------- AIFF / AU containers


def _ext80(rate: int) -> bytes:
    """Encode an integer as IEEE 80-bit extended (the AIFF sampleRate)."""
    if rate == 0:
        return b"\x00" * 10
    exp, m = 16446, rate
    while m < (1 << 63):
        m <<= 1
        exp -= 1
    return struct.pack(">H", exp) + m.to_bytes(8, "big")


def make_aiff(raw: bytes, rate=8000, bits=16, channels=1, frames=None,
              comp: bytes | None = None) -> bytes:
    form = b"AIFC" if comp else b"AIFF"
    nframes = frames if frames is not None else (
        len(raw) // max(1, channels * bits // 8))
    comm = struct.pack(">HIH", channels, nframes, bits) + _ext80(rate)
    if comp:
        comm += comp + bytes([len(comp)]) + comp  # 4cc + pascal name
        if len(comm) & 1:
            comm += b"\x00"
    ssnd = struct.pack(">II", 0, 0) + raw
    chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
    if len(chunks) & 1:
        chunks += b"\x00"
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + form + chunks


def make_au(raw: bytes, encoding=3, rate=8000, channels=1) -> bytes:
    return (b".snd" + struct.pack(">IIIII", 24, len(raw), encoding,
                                  rate, channels) + raw)


def test_aiff_pcm_and_extended80():
    s = np.array([0, 1000, -1000, 32767, -32768], np.int32)
    for rate in (8000, 44100, 48000, 96000):
        aif = make_aiff(s.astype(">i2").tobytes(), rate=rate)
        got_rate, out = codecs.decode_aiff(aif)
        assert got_rate == rate
        np.testing.assert_array_equal(out, s)
    # 8-bit AIFF PCM is SIGNED (unlike WAV)
    s8 = np.array([-128, 0, 127], np.int8)
    _, out = codecs.decode_aiff(make_aiff(s8.tobytes(), bits=8))
    np.testing.assert_array_equal(out, s8.astype(np.int32) << 8)
    # 24-bit big-endian
    v = np.array([1 << 22, -(1 << 22), 0], np.int32)
    raw = b"".join(int(x & 0xFFFFFF).to_bytes(3, "big") for x in v)
    _, out = codecs.decode_aiff(make_aiff(raw, bits=24))
    np.testing.assert_array_equal(out, v >> 8)


def test_aiff_sowt_and_stereo_downmix():
    # AIFF-C 'sowt' = little-endian 16-bit PCM
    s = np.array([123, -456], np.int32)
    aif = make_aiff(s.astype("<i2").tobytes(), comp=b"sowt")
    _, out = codecs.decode_aiff(aif)
    np.testing.assert_array_equal(out, s)
    stereo = np.array([100, 200, -100, -200], np.int32)  # L R L R
    aif = make_aiff(stereo.astype(">i2").tobytes(), channels=2)
    _, out = codecs.decode_aiff(aif)
    np.testing.assert_array_equal(out, [150, -150])


def test_au_pcm_float_and_g711_cross_container():
    s = np.array([0, 1000, -32768, 32767], np.int32)
    rate, out = codecs.decode_au(make_au(s.astype(">i2").tobytes(),
                                         encoding=3, rate=16000))
    assert rate == 16000
    np.testing.assert_array_equal(out, s)
    f = np.array([0.0, 0.5, -1.0], np.float64)
    _, out = codecs.decode_au(make_au(f.astype(">f8").tobytes(), encoding=7))
    np.testing.assert_array_equal(out, np.round(f * 32767).astype(np.int32))
    # G.711 mu-law: same bytes through the .au and WAV containers must
    # decode identically (both pinned to the ITU expansion elsewhere)
    g711 = bytes(range(0, 256, 17))
    wav = (b"RIFF" + (36 + len(g711)).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
           + b"data" + len(g711).to_bytes(4, "little") + g711)
    _, want = codecs.decode_wav(wav)
    _, got = codecs.decode_au(make_au(g711, encoding=1))
    np.testing.assert_array_equal(got, want)


# ------------------------------------------------- Ogg / Matroska probes


def _ogg_page(body: bytes, serial=1, granule=0, htype=0, seq=0) -> bytes:
    segs, n = [], len(body)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)
    return (b"OggS" + bytes([0, htype]) + struct.pack("<q", granule)
            + struct.pack("<III", serial, seq, 0)
            + bytes([len(segs)]) + bytes(segs) + body)


def test_ogg_opus_duration_and_vorbis_id():
    head = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
            + struct.pack("<I", 48000) + struct.pack("<h", 0) + b"\x00")
    pages = (_ogg_page(head, htype=2, granule=0)
             + _ogg_page(b"OpusTags\x00\x00\x00\x00\x00\x00\x00\x00",
                         seq=1, granule=0)
             + _ogg_page(b"\x00" * 40, seq=2, granule=48312)
             + _ogg_page(b"\x00" * 40, seq=3, granule=96312, htype=4))
    m = codecs.parse_ogg(pages)
    assert m["codec"] == "opus"
    assert m["channels"] == 2 and m["sample_rate"] == 48000
    assert m["pre_skip"] == 312
    assert m["duration_ms"] == 2000  # (96312-312)/48000
    assert m["n_pages"] == 4

    vid = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
           + struct.pack("<I", 44100) + b"\x00" * 13 + b"\x01")
    pages = (_ogg_page(vid, htype=2)
             + _ogg_page(b"\x00" * 8, seq=1, granule=44100))
    m = codecs.parse_ogg(pages)
    assert m["codec"] == "vorbis"
    assert m["sample_rate"] == 44100 and m["channels"] == 2
    assert m["duration_ms"] == 1000


def _ebml_el(eid: int, body: bytes) -> bytes:
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    for ln in range(1, 9):
        if len(body) < (1 << (7 * ln)) - 1:
            return idb + ((1 << (7 * ln)) | len(body)).to_bytes(ln, "big") + body
    raise ValueError("body too large")


def _webm_fixture(unknown_segment_size=False) -> bytes:
    info = _ebml_el(0x1549A966,
                    _ebml_el(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
                    + _ebml_el(0x4489, struct.pack(">d", 12345.0)))
    video = _ebml_el(0xAE, _ebml_el(0x83, b"\x01")
                     + _ebml_el(0x86, b"V_VP9")
                     + _ebml_el(0xE0, _ebml_el(0xB0, struct.pack(">H", 640))
                                + _ebml_el(0xBA, struct.pack(">H", 480))))
    audio = _ebml_el(0xAE, _ebml_el(0x83, b"\x02")
                     + _ebml_el(0x86, b"A_OPUS")
                     + _ebml_el(0xE1, _ebml_el(0xB5, struct.pack(">f", 48000.0))
                                + _ebml_el(0x9F, b"\x02")))
    seg_body = info + _ebml_el(0x1654AE6B, video + audio)
    if unknown_segment_size:
        seg = (0x18538067).to_bytes(4, "big") + b"\xFF" + seg_body
    else:
        seg = _ebml_el(0x18538067, seg_body)
    return _ebml_el(0x1A45DFA3, _ebml_el(0x4282, b"webm")) + seg


def test_ebml_webm_walk():
    for unknown in (False, True):
        m = codecs.parse_ebml(_webm_fixture(unknown))
        assert m["doctype"] == "webm"
        assert m["duration_ms"] == 12345
        kinds = {t["type"]: t for t in m["tracks"]}
        assert kinds["video"]["codec"] == "V_VP9"
        assert (kinds["video"]["width"], kinds["video"]["height"]) == (640, 480)
        assert kinds["audio"]["codec"] == "A_OPUS"
        assert kinds["audio"]["sample_rate"] == 48000
        assert kinds["audio"]["channels"] == 2


def test_probe_media_containers(spark):
    """probe_media covers the container zoo end-to-end through Spark:
    AIFF, AU, Ogg/Opus, WebM, plus an ADPCM WAV (format row only)."""
    from hbase_snapshot_spark.operators.multimodal import probe_media

    s = np.arange(800, dtype=np.int32) % 2000 - 1000
    aif = make_aiff(s.astype(">i2").tobytes(), rate=8000)
    au = make_au(s.astype(">i2").tobytes(), encoding=3, rate=16000)
    head = (b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 0)
            + struct.pack("<I", 48000) + struct.pack("<h", 0) + b"\x00")
    ogg = (_ogg_page(head, htype=2)
           + _ogg_page(b"\x00" * 10, seq=1, granule=24000, htype=4))
    webm = _webm_fixture()
    df = _media_df(spark, [aif, au, ogg, webm], kind="audio")
    out = {r["media_id"]: r.asDict() for r in probe_media(df).collect()}
    assert out[0]["format"] == "aiff/NONE"
    assert out[0]["sample_rate"] == 8000 and out[0]["n_frames"] == 800
    assert out[0]["duration_ms"] == 100  # 800 frames at 8 kHz
    assert out[1]["format"] == "au/s16"
    assert out[1]["sample_rate"] == 16000 and out[1]["n_frames"] == 800
    assert out[2]["format"] == "ogg/opus"
    assert out[2]["duration_ms"] == 500
    assert out[3]["format"] == "webm/V_VP9"
    assert (out[3]["width"], out[3]["height"]) == (640, 480)
    assert out[3]["sample_rate"] == 48000 and out[3]["channels"] == 2
    assert out[3]["duration_ms"] == 12345


def _webp(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = b"WEBP"
    for cc, payload in chunks:
        body += cc + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_webp_parse_variants():
    # lossy: 3-byte frame tag, 0x9D012A start code, 14-bit dims
    vp8 = b"\x30\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240)
    m = codecs.parse_webp(_webp([(b"VP8 ", vp8 + b"\x00" * 8)]))
    assert (m["variant"], m["width"], m["height"]) == ("lossy", 320, 240)
    # lossless: 0x2F then packed (w-1, h-1, alpha, version)
    bits = (127) | (63 << 14) | (1 << 28)
    vp8l = b"\x2f" + struct.pack("<I", bits)
    m = codecs.parse_webp(_webp([(b"VP8L", vp8l + b"\x00" * 4)]))
    assert (m["variant"], m["width"], m["height"]) == ("lossless", 128, 64)
    assert m["has_alpha"]
    # extended: VP8X canvas + animation flag, 24-bit dims
    vp8x = bytes([0x12]) + b"\x00\x00\x00" + (639).to_bytes(3, "little") \
        + (479).to_bytes(3, "little")
    m = codecs.parse_webp(_webp([(b"VP8X", vp8x)]))
    assert (m["variant"], m["width"], m["height"]) == ("extended", 640, 480)
    assert m["has_alpha"] and m["has_animation"]
    with pytest.raises(ValueError):
        codecs.parse_webp(_webp([(b"ICCP", b"\x00" * 4)]))
    assert codecs.sniff(_webp([(b"VP8 ", vp8 + b"\x00" * 8)])) == "webp"
    # animated: ANMF frame headers carry per-frame duration (3 bytes LE)
    anmf = (b"\x00" * 12 + (40).to_bytes(3, "little") + b"\x00")
    anmf2 = (b"\x00" * 12 + (60).to_bytes(3, "little") + b"\x00")
    m = codecs.parse_webp(_webp([(b"VP8X", vp8x), (b"ANMF", anmf),
                                 (b"ANMF", anmf2)]))
    assert m["n_frames"] == 2 and m["duration_ms"] == 100


def test_probe_media_webp_and_mp4_brand(spark):
    vp8 = b"\x30\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 33, 21)
    payloads = [_webp([(b"VP8 ", vp8 + b"\x00" * 8)])]
    df = _media_df(spark, payloads, kind="image")
    r = multimodal.probe_media(df).first()
    assert r["format"] == "webp/lossy"
    assert (r["width"], r["height"]) == (33, 21)


def test_audio_features_cross_container(spark):
    """The same PCM through WAV, AIFF, and AU containers must yield
    identical features through the Spark kernel."""
    sig = np.round(3000 * np.sin(np.arange(1600) / 9.0)).astype(np.int32)
    payloads = [
        make_wav(sig, rate=8000, bits=16),
        make_aiff(sig.astype(">i2").tobytes(), rate=8000),
        make_au(sig.astype(">i2").tobytes(), encoding=3, rate=8000),
    ]
    df = _media_df(spark, payloads, kind="audio")
    out = multimodal.extract_audio_features(df, target_rate=8000).collect()
    assert len(out) == 3
    assert all(r["n_samples"] == 1600 for r in out)
    assert len({r["rms"] for r in out}) == 1
    assert len({r["peak"] for r in out}) == 1


def test_decode_images_real_progressive_and_adam7(spark):
    """Progressive JPEG and Adam7 PNG payloads decode inside the Spark
    mapInPandas pipeline (executor-side codepath, not just driver)."""
    # progressive JPEG: solid gray via DC successive approximation
    dc, ac, W = _prog_writer_codes()
    level = 202
    qdc = int(round(8 * (level - 128) / 16))
    prog = bytearray(_prog_headers(8, 8))
    w1 = W()
    _put_dc(w1, dc, qdc >> 1)
    prog += _sos([(1, 0x00)], 0, 0, 0, 1) + w1.flush()
    w2 = W()
    w2.write(qdc & 1, 1)
    prog += _sos([(1, 0x00)], 0, 0, 1, 0) + w2.flush()
    prog += b"\xff\xd9"
    # Adam7 PNG
    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    adam = _png_chunks(21, 13, 8, 2, 1, _adam7_forward(img, 3))

    media = _media_df(spark, [bytes(prog), adam])
    out = {r.media_id: r for r in
           multimodal.decode_images(media, fake=False).collect()}
    want = int(np.clip(round(qdc * 16 / 8) + 128, 0, 255))
    assert out[0].width == 8 and out[0].channels == 1
    assert out[0].mean_intensity == float(want)
    assert out[1].width == 21 and out[1].height == 13
    assert out[1].mean_intensity == round(float(img.mean()), 4)


# ------------------------------------------------------------------ FLAC


class _FlacW:
    """MSB-first bit writer for fixture streams."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, v, n):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self):
        if self.nbits:
            self.put(0, 8 - self.nbits)

    def rice(self, v, k):
        u = (v << 1) ^ (v >> 63) if v >= 0 else (-v << 1) - 1
        q = u >> k
        self.put(0, q) if q else None
        self.put(1, 1)
        if k:
            self.put(u & ((1 << k) - 1), k)


def _flac_streaminfo(sr, nch, bps, total, block):
    b = bytearray()
    b += block.to_bytes(2, "big") * 2          # min/max block size
    b += (0).to_bytes(3, "big") * 2            # min/max frame size
    b.append((sr >> 12) & 0xFF)
    b.append((sr >> 4) & 0xFF)
    b.append(((sr & 0xF) << 4) | ((nch - 1) << 1) | ((bps - 1) >> 4))
    b.append((((bps - 1) & 0xF) << 4) | ((total >> 32) & 0xF))
    b += (total & 0xFFFFFFFF).to_bytes(4, "big")
    b += b"\x00" * 16                          # md5 (unchecked)
    return b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(b)


def _flac_frame(w, block, subframes, frame_no=0, ch_code=None):
    """subframes: list of callables(writer) writing one subframe each;
    ch_code defaults to independent channels."""
    if ch_code is None:
        ch_code = len(subframes) - 1
    w.put(0x3FFE, 14)
    w.put(0, 1)          # reserved
    w.put(0, 1)          # fixed blocking
    w.put(7, 4)          # block size: 16-bit value follows
    w.put(0, 4)          # sample rate: from STREAMINFO
    w.put(ch_code, 4)
    w.put(0, 3)          # bps: from STREAMINFO
    w.put(0, 1)          # reserved
    w.put(frame_no & 0x7F, 8)  # utf8 frame number (small)
    w.put(block - 1, 16)
    w.put(0, 8)          # crc-8 (decoder does not verify)
    for sf in subframes:
        sf(w)
    w.align()
    w.put(0, 16)         # crc-16 (decoder does not verify)


def _sf_verbatim(samples, bps):
    def go(w):
        w.put(0, 1); w.put(1, 6); w.put(0, 1)
        for s in samples:
            w.put(int(s), bps)
    return go


def _sf_constant(value, bps):
    def go(w):
        w.put(0, 1); w.put(0, 6); w.put(0, 1)
        w.put(int(value), bps)
    return go


def _sf_fixed(samples, order, bps, k=4, wasted=0):
    """Encode `samples` (full block) as FIXED order-`order`, one rice
    partition, optional wasted bits (samples must be divisible)."""
    coefs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order]
    vals = [int(s) >> wasted for s in samples]

    def go(w):
        w.put(0, 1); w.put(8 + order, 6)
        if wasted:
            w.put(1, 1)
            w.put(0, wasted - 1) if wasted > 1 else None
            w.put(1, 1)
        else:
            w.put(0, 1)
        for s in vals[:order]:
            w.put(s, bps - wasted)
        w.put(0, 2)   # 4-bit rice
        w.put(0, 4)   # partition order 0
        w.put(k, 4)
        for i in range(order, len(vals)):
            pred = sum(c * vals[i - 1 - j] for j, c in enumerate(coefs))
            w.rice(vals[i] - pred, k)
    return go


def _sf_lpc(samples, coefs, shift, prec, bps, k=5):
    order = len(coefs)

    def go(w):
        w.put(0, 1); w.put(32 + order - 1, 6); w.put(0, 1)
        for s in samples[:order]:
            w.put(int(s), bps)
        w.put(prec - 1, 4)
        w.put(shift, 5)
        for c in coefs:
            w.put(int(c), prec)
        w.put(1, 2)   # 5-bit rice
        w.put(0, 4)
        w.put(k, 5)
        for i in range(order, len(samples)):
            pred = sum(c * int(samples[i - 1 - j]) for j, c in enumerate(coefs))
            w.rice(int(samples[i]) - (pred >> shift), k)
    return go


def test_flac_parse_and_sniff():
    data = _flac_streaminfo(44100, 2, 16, 12345, 4096)
    assert codecs.sniff(data) == "flac"
    m = codecs.parse_flac(data)
    assert (m["sample_rate"], m["channels"], m["bits_per_sample"]) == (44100, 2, 16)
    assert m["total_samples"] == 12345
    assert m["duration_ms"] == round(12345 * 1000 / 44100)
    with pytest.raises(ValueError):
        codecs.parse_flac(b"fLaX" + b"\x00" * 40)


def test_flac_verbatim_constant_roundtrip():
    rng = np.random.default_rng(9)
    pcm = rng.integers(-32768, 32767, 96, dtype=np.int64)
    w = _FlacW()
    _flac_frame(w, 96, [_sf_verbatim(pcm, 16)])
    data = _flac_streaminfo(8000, 1, 16, 96, 96) + bytes(w.out)
    sr, nch, out = codecs.decode_flac_pcm(data)
    assert (sr, nch) == (8000, 1)
    assert (out[:, 0] == pcm).all()
    w = _FlacW()
    _flac_frame(w, 64, [_sf_constant(-123, 16)])
    data = _flac_streaminfo(8000, 1, 16, 64, 64) + bytes(w.out)
    _, _, out = codecs.decode_flac_pcm(data)
    assert (out[:, 0] == -123).all()


def test_flac_fixed_orders_roundtrip():
    rng = np.random.default_rng(10)
    # smooth ramp + noise so fixed predictors leave small residuals
    base = np.cumsum(rng.integers(-40, 40, 256)) + 1000
    for order in (0, 1, 2, 3, 4):
        w = _FlacW()
        _flac_frame(w, 256, [_sf_fixed(base, order, 16)])
        data = _flac_streaminfo(16000, 1, 16, 256, 256) + bytes(w.out)
        _, _, out = codecs.decode_flac_pcm(data)
        assert (out[:, 0] == base).all(), f"order {order}"


def test_flac_lpc_and_wasted_bits():
    rng = np.random.default_rng(11)
    base = (np.cumsum(rng.integers(-30, 30, 192)) + 500).astype(np.int64)
    coefs, shift, prec = [3, -2, 1], 1, 6
    w = _FlacW()
    _flac_frame(w, 192, [_sf_lpc(base, coefs, shift, prec, 16)])
    data = _flac_streaminfo(22050, 1, 16, 192, 192) + bytes(w.out)
    _, _, out = codecs.decode_flac_pcm(data)
    assert (out[:, 0] == base).all()
    # wasted bits: samples all even by 4
    ws = (base // 4) * 4
    w = _FlacW()
    _flac_frame(w, 192, [_sf_fixed(ws, 2, 16, wasted=2)])
    data = _flac_streaminfo(22050, 1, 16, 192, 192) + bytes(w.out)
    _, _, out = codecs.decode_flac_pcm(data)
    assert (out[:, 0] == ws).all()


def test_flac_stereo_decorrelation_modes():
    rng = np.random.default_rng(12)
    left = rng.integers(-2000, 2000, 128, dtype=np.int64)
    right = rng.integers(-2000, 2000, 128, dtype=np.int64)
    side = left - right
    mid = (left + right) >> 1
    # left/side (code 8): [left bps, side bps+1]
    w = _FlacW()
    _flac_frame(w, 128, [_sf_verbatim(left, 16), _sf_verbatim(side, 17)],
                ch_code=8)
    data = _flac_streaminfo(44100, 2, 16, 128, 128) + bytes(w.out)
    _, _, out = codecs.decode_flac_pcm(data)
    assert (out[:, 0] == left).all() and (out[:, 1] == right).all()
    # right/side (code 9): [side bps+1, right bps]
    w = _FlacW()
    _flac_frame(w, 128, [_sf_verbatim(side, 17), _sf_verbatim(right, 16)],
                ch_code=9)
    data = _flac_streaminfo(44100, 2, 16, 128, 128) + bytes(w.out)
    _, _, out = codecs.decode_flac_pcm(data)
    assert (out[:, 0] == left).all() and (out[:, 1] == right).all()
    # mid/side (code 10)
    w = _FlacW()
    _flac_frame(w, 128, [_sf_verbatim(mid, 16), _sf_verbatim(side, 17)],
                ch_code=10)
    data = _flac_streaminfo(44100, 2, 16, 128, 128) + bytes(w.out)
    _, _, out = codecs.decode_flac_pcm(data)
    assert (out[:, 0] == left).all() and (out[:, 1] == right).all()


def test_extract_audio_features_flac(spark):
    import pandas as pd

    from hbase_snapshot_spark.operators.multimodal import (
        extract_audio_features,
    )

    n = 2048
    t = np.arange(n)
    pcm = np.round(4000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int64)
    w = _FlacW()
    _flac_frame(w, n, [_sf_verbatim(pcm, 16)])
    payload = _flac_streaminfo(8000, 1, 16, n, n) + bytes(w.out)
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [bytearray(payload)]}))
    row = extract_audio_features(df, target_rate=8000).collect()[0]
    assert row.sample_rate == 8000 and row.n_samples == n
    expect_rms = float((pcm.astype(np.float64) ** 2).mean() ** 0.5)
    assert abs(row.rms - expect_rms) < 0.05 * expect_rms
    assert row.peak >= 3900


def test_decode_image_gif_first_frame(spark):
    from hbase_snapshot_spark.operators.multimodal import decode_images
    import pandas as pd

    pal = np.array([[9, 9, 9], [250, 10, 10]], np.uint8)
    grid = np.zeros((5, 7), np.uint8)
    grid[2, 3] = 1
    gif = make_gif([grid], pal, 7, 5)
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [bytearray(gif)]}))
    row = decode_images(df).collect()[0]
    assert (row.width, row.height) == (7, 5)


def test_flac_multiframe_and_mono_convention():
    rng = np.random.default_rng(13)
    pcm = rng.integers(-300, 300, 256, dtype=np.int64)
    w = _FlacW()
    _flac_frame(w, 128, [_sf_verbatim(pcm[:128], 16)], frame_no=0)
    _flac_frame(w, 128, [_sf_verbatim(pcm[128:], 16)], frame_no=1)
    data = _flac_streaminfo(16000, 1, 16, 256, 128) + bytes(w.out)
    _, _, out = codecs.decode_flac_pcm(data)
    assert (out[:, 0] == pcm).all()
    sr, mono = codecs.decode_flac(data)
    assert sr == 16000 and (mono == pcm).all()
    # rice escape partition: raw 5-bit residuals
    w = _FlacW()

    def esc(wr):
        wr.put(0, 1); wr.put(8, 6); wr.put(0, 1)  # FIXED order 0
        wr.put(0, 2); wr.put(0, 4)
        wr.put(0xF, 4)      # escape
        wr.put(7, 5)        # 7-bit raw residuals
        for s in pcm[:64] % 50:
            wr.put(int(s), 7)
    _flac_frame(w, 64, [esc])
    data = _flac_streaminfo(16000, 1, 16, 64, 64) + bytes(w.out)
    _, _, out = codecs.decode_flac_pcm(data)
    assert (out[:, 0] == (pcm[:64] % 50)).all()


# ----------------------------------------- MPEG audio (MP3) frame walk


def _mp3_frame(bitrate_idx=9, sr_idx=0, padding=0, mode=3, fill=0x00):
    """A valid MPEG-1 Layer III frame built bit-by-bit: header per
    ISO 11172-3 2.4.1.3, body filled with ``fill`` bytes.  bitrate_idx
    9 @ sr_idx 0 = 128 kbps / 44100 Hz → 417+padding bytes."""
    b0 = 0xFF
    b1 = 0xE0 | (3 << 3) | (1 << 1) | 1  # MPEG-1, Layer III, no CRC
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = mode << 6
    bitrate = [None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
               224, 256, 320][bitrate_idx] * 1000
    rate = [44100, 48000, 32000][sr_idx]
    size = 144 * bitrate // rate + padding
    return bytes([b0, b1, b2, b3]) + bytes([fill]) * (size - 4)


def test_mp3_parse_cbr():
    data = b"".join(_mp3_frame() for _ in range(5))
    m = codecs.parse_mp3(data)
    assert m["format"] == "MPEG-1" and m["layer"] == 3
    assert m["sample_rate"] == 44100 and m["channels"] == 1
    assert m["n_frames"] == 5 and not m["vbr"]
    # 5 frames x 1152 samples @ 44100 Hz
    assert m["duration_ms"] == round(5 * 1152 * 1000 / 44100)
    assert m["bitrate_avg"] == pytest.approx(128_000, rel=0.01)
    # frame index carries exact offsets/sizes
    assert m["frames"][0] == (0, 417, 1152)
    assert m["frames"][1][0] == 417


def test_mp3_parse_id3_garbage_padding_vbr():
    # ID3v2 prefix (syncsafe size 100), garbage between frames, mixed
    # bitrates (VBR), a padded frame
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100]) + b"\x00" * 100
    frames = [_mp3_frame(bitrate_idx=9), _mp3_frame(bitrate_idx=11),
              _mp3_frame(bitrate_idx=9, padding=1)]
    data = id3 + frames[0] + b"\x01\x02\x03" + frames[1] + frames[2]
    m = codecs.parse_mp3(data)
    assert m["n_frames"] == 3 and m["vbr"]
    assert m["frames"][0][0] == 110  # ID3 skipped exactly
    assert m["frames"][2][1] == 418  # padding byte counted

    # Xing tag in frame 0 (mono MPEG-1: side info 17 bytes) marks VBR
    # even when later bitrates agree, and the tag frame carries no audio
    f0 = bytearray(_mp3_frame())
    off = 4 + 17
    f0[off : off + 8] = b"Xing" + (1).to_bytes(4, "big")
    f0[off + 8 : off + 12] = (2).to_bytes(4, "big")  # frame count
    m = codecs.parse_mp3(bytes(f0) + _mp3_frame() + _mp3_frame())
    assert m["vbr"] and m["n_frames"] == 2


def test_mp3_mpeg2_and_layer2():
    # MPEG-2 Layer III: 576 samples/frame, its own bitrate table
    b1 = 0xE0 | (2 << 3) | (1 << 1) | 1
    hdr = bytes([0xFF, b1, (4 << 4) | (1 << 2), 3 << 6])  # 32k/24000
    size = 72 * 32000 // 24000
    m = codecs.parse_mp3(hdr + b"\x00" * (size - 4))
    assert m["format"] == "MPEG-2" and m["sample_rate"] == 24000
    assert m["frames"][0] == (0, size, 576)

    # decode is now real (mp3dec.py) for MPEG-1; LSF streams still raise
    b1 = 0xE0 | (2 << 3) | (1 << 1) | 1
    hdr = bytes([0xFF, b1, (4 << 4) | (1 << 2), 3 << 6])
    lsf = (hdr + b"\x00" * (72 * 32000 // 24000 - 4)) * 2
    with pytest.raises(NotImplementedError, match="MPEG-2"):
        codecs.decode_mp3(lsf)
    # an all-zero-side-info MPEG-1 frame decodes to silence
    sr, samples = codecs.decode_mp3(_mp3_frame() * 2)
    assert sr == 44100 and len(samples) == 2 * 1152
    assert np.abs(samples).max() == 0
    with pytest.raises(ValueError):
        codecs.parse_mp3(b"\x00" * 64)


def test_mp3_sniff():
    assert codecs.sniff(_mp3_frame()) == "mp3"
    assert codecs.sniff(b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\x00" * 8) == "mp3"


# -------------------------------------------------------------------- GIF


def _lzw_encode(indices, min_code_size):
    """Reference GIF-LZW encoder (independent of the decoder): emits
    clear, then greedy longest-match codes with table growth, EOI."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    cur = b""
    for i in indices:
        nxt = cur + bytes([i])
        if nxt in table:
            cur = nxt
            continue
        put(table[cur])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code > (1 << code_size) and code_size < 12:
                code_size += 1
        cur = bytes([i])
    if cur:
        put(table[cur])
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(body):
    out = bytearray()
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def make_gif(frames, palette, w, h, delays=None, transparent=None,
             disposals=None, interlace=False, min_code_size=None):
    """frames: list of (h, w) uint8 index grids (full-canvas)."""
    ncol = len(palette)
    bits = max(1, (ncol - 1).bit_length())
    size_field = max(0, bits - 1)
    pal = bytes(np.asarray(palette, np.uint8).reshape(-1)) + b"\x00" * (
        ((2 << size_field) - ncol) * 3
    )
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | size_field, 0, 0]) + pal
    mcs = min_code_size if min_code_size is not None else max(2, bits)
    for fi, grid in enumerate(frames):
        if delays or transparent is not None or disposals:
            d = (delays[fi] if delays else 0) // 10
            disp = disposals[fi] if disposals else 0
            flags = (disp << 2) | (1 if transparent is not None else 0)
            out += bytes([0x21, 0xF9, 4, flags])
            out += d.to_bytes(2, "little")
            out += bytes([transparent if transparent is not None else 0, 0])
        out += b"\x2c" + b"\x00" * 4
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x40 if interlace else 0])
        g = np.asarray(grid, np.uint8)
        if interlace:
            order = np.concatenate(
                [np.arange(s, h, st) for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))]
            )
            g = g[order]
        out += bytes([mcs]) + _subblocks(_lzw_encode(g.reshape(-1).tolist(), mcs))
    out += b"\x3b"
    return bytes(out)


def test_gif_roundtrip_random():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    grid = rng.integers(0, 8, (23, 17), dtype=np.uint8)
    gif = make_gif([grid], pal, 17, 23)
    assert codecs.sniff(gif) == "gif"
    frames, durs = codecs.decode_gif(gif)
    assert frames.shape == (1, 23, 17, 3)
    assert (frames[0] == pal[grid]).all()
    # decode_image returns the first frame
    assert (codecs.decode_image(gif) == pal[grid]).all()
    # big grid exercises code-size growth past 9 bits
    big = rng.integers(0, 8, (64, 64), dtype=np.uint8)
    out, _ = codecs.decode_gif(make_gif([big], pal, 64, 64))
    assert (out[0] == pal[big]).all()


def test_gif_interlace_and_meta():
    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    grid = rng.integers(0, 4, (13, 5), dtype=np.uint8)
    gif = make_gif([grid], pal, 5, 13, interlace=True)
    out, _ = codecs.decode_gif(gif)
    assert (out[0] == pal[grid]).all()
    m = codecs.parse_gif(gif)
    assert (m["width"], m["height"], m["n_frames"]) == (5, 13, 1)


def test_gif_animation_transparency_disposal():
    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
                   np.uint8)
    f0 = np.full((4, 4), 1, np.uint8)
    f1 = np.full((4, 4), 0, np.uint8)  # index 0 = transparent
    f1[0, 0] = 2
    gif = make_gif([f0, f1], pal, 4, 4, delays=[40, 60], transparent=0,
                   disposals=[1, 1])
    frames, durs = codecs.decode_gif(gif)
    assert durs == [40, 60]
    assert (frames[0] == pal[1]).all()
    # frame 2: transparent pixels keep frame 1's red, one green pixel
    assert (frames[1][0, 0] == pal[2]).all()
    assert (frames[1][1:] == pal[1]).all()
    m = codecs.parse_gif(gif)
    assert m["duration_ms"] == 100 and m["n_frames"] == 2


def test_gif_corrupt_raises():
    with pytest.raises(ValueError):
        codecs.parse_gif(b"GIF85a" + b"\x00" * 20)
    pal = np.zeros((4, 3), np.uint8)
    gif = bytearray(make_gif([np.zeros((3, 3), np.uint8)], pal, 3, 3))
    gif[6:8] = (3).to_bytes(2, "little")  # intact
    # truncated LZW body decodes what it can (padded), no raise
    out, _ = codecs.decode_gif(bytes(gif))
    assert out.shape == (1, 3, 3, 3)


# ------------------------------------------------------------------- TIFF


def _tiff_lzw_encode(data):
    """Reference TIFF-LZW encoder (MSB-first, early change)."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    code_size = 9
    out = bytearray()
    acc = nbits = 0

    def put(code):
        nonlocal acc, nbits
        acc = (acc << code_size) | code
        nbits += code_size
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    put(256)  # clear
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        put(table[cur])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code >= (1 << code_size) - 1 and code_size < 12:
                code_size += 1  # early change
        cur = bytes([byte])
    if cur:
        put(table[cur])
    put(257)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data):
    """Simplest valid PackBits: all literal runs of <=128 bytes."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i : i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def make_tiff(img, byteorder="little", compression=1, predictor=1,
              photometric=None, rows_per_strip=None, colormap=None,
              bits=8):
    """uint8/uint16 (h, w[, ch]) + options → baseline TIFF bytes."""
    img = np.asarray(img)
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    if photometric is None:
        photometric = 2 if spp >= 3 else 1
    bo = byteorder
    raster = img.reshape(h, -1)
    if bits == 16:
        raster = raster.astype(">u2" if bo == "big" else "<u2")
    body = bytearray()
    strips = []
    rps = rows_per_strip or h
    for y0 in range(0, h, rps):
        rows = raster[y0 : y0 + rps]
        if predictor == 2:
            rows = np.diff(
                rows.reshape(rows.shape[0], -1, spp), axis=1,
                prepend=np.zeros((rows.shape[0], 1, spp), rows.dtype),
            ).astype(np.uint8).reshape(rows.shape[0], -1)
        chunk = rows.tobytes()
        if compression == 5:
            chunk = _tiff_lzw_encode(chunk)
        elif compression == 32773:
            chunk = _packbits_encode(chunk)
        strips.append((len(body), len(chunk), min(rps, h - y0)))
        body += chunk

    entries = []  # (tag, type, count, value_or_bytes)

    def ival(tag, typ, vals):
        entries.append((tag, typ, vals))

    ival(256, 4, [w]); ival(257, 4, [h])
    ival(258, 3, [bits] * spp)
    ival(259, 3, [compression])
    ival(262, 3, [photometric])
    ival(277, 3, [spp])
    ival(278, 4, [rps])
    if predictor != 1:
        ival(317, 3, [predictor])
    if colormap is not None:
        ival(320, 3, list(colormap))
    nent = len(entries) + 2  # + strip offsets/counts
    tsize = {3: 2, 4: 4}
    # layout: header(8) IFD extra-values strip-data
    ifd_off = 8
    ifd_len = 2 + 12 * nent + 4
    extra = bytearray()
    extra_off = ifd_off + ifd_len

    def entry_bytes(tag, typ, vals):
        total = tsize[typ] * len(vals)
        e = tag.to_bytes(2, bo) + typ.to_bytes(2, bo) + len(vals).to_bytes(4, bo)
        if total <= 4:
            v = b"".join(x.to_bytes(tsize[typ], bo) for x in vals)
            return e + v + b"\x00" * (4 - total)
        off = extra_off + len(extra)
        extra.extend(b"".join(x.to_bytes(tsize[typ], bo) for x in vals))
        return e + off.to_bytes(4, bo)

    # two passes: strip offsets depend on extra length, so reserve extras
    # for data tags first by building non-strip entries, then strips
    built = [entry_bytes(*e) for e in entries]
    # strip tags: values may spill to extra too
    data_off = extra_off  # placeholder; recompute after strip entries
    strip_count_entry = entry_bytes(279, 4, [c for (_o, c, _r) in strips])
    # offsets entry: needs final data base = extra_off + len(extra) + (4*n if spills)
    n = len(strips)
    spill = 4 * n > 4
    base = extra_off + len(extra) + (4 * n if spill else 0)
    strip_off_entry = entry_bytes(273, 4, [base + o for (o, _c, _r) in strips])
    all_entries = sorted(
        built + [strip_off_entry, strip_count_entry], key=lambda b: b[:2]
    )
    out = bytearray()
    out += (b"II*\x00" if bo == "little" else b"MM\x00*")
    out += ifd_off.to_bytes(4, bo)
    out += nent.to_bytes(2, bo)
    for e in all_entries:
        out += e
    out += (0).to_bytes(4, bo)
    out += extra
    out += body
    return bytes(out)


def test_tiff_roundtrip_gray_rgb_both_orders():
    rng = np.random.default_rng(21)
    gray = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    rgb = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    for bo in ("little", "big"):
        t = make_tiff(gray, byteorder=bo)
        assert codecs.sniff(t) == "tiff"
        assert (codecs.decode_tiff(t) == gray).all()
        assert (codecs.decode_image(make_tiff(rgb, byteorder=bo)) == rgb).all()
    m = codecs.parse_tiff(make_tiff(rgb))
    assert (m["width"], m["height"], m["samples_per_pixel"]) == (5, 7, 3)


def test_tiff_packbits_lzw_predictor_strips():
    rng = np.random.default_rng(22)
    # low-entropy image so LZW actually compresses
    img = (rng.integers(0, 4, (21, 16, 3)) * 60).astype(np.uint8)
    t = make_tiff(img, compression=32773, rows_per_strip=5)
    assert (codecs.decode_tiff(t) == img).all()
    t = make_tiff(img, compression=5, rows_per_strip=8)
    assert (codecs.decode_tiff(t) == img).all()
    t = make_tiff(img, compression=5, predictor=2)
    assert (codecs.decode_tiff(t) == img).all()
    # big random grid exercises LZW code widths past 10 bits
    big = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    assert (codecs.decode_tiff(make_tiff(big, compression=5)) == big).all()


def test_tiff_palette_whitezero_16bit():
    rng = np.random.default_rng(23)
    idx = rng.integers(0, 4, (6, 8), dtype=np.uint8)
    pal8 = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    cmap = [int(v) * 257 for v in np.concatenate(
        [pal8[:, 0], pal8[:, 1], pal8[:, 2]])]
    t = make_tiff(idx, photometric=3, colormap=cmap)
    assert (codecs.decode_tiff(t) == pal8[idx]).all()
    g = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    t = make_tiff(g, photometric=0)  # WhiteIsZero
    assert (codecs.decode_tiff(t) == 255 - g).all()
    g16 = (g.astype(np.uint16) << 8) | 0x7F
    for bo in ("little", "big"):
        t = make_tiff(g16, bits=16, byteorder=bo)
        assert (codecs.decode_tiff(t) == g).all(), bo
    with pytest.raises(ValueError):
        codecs.parse_tiff(b"II+\x00" + b"\x00" * 20)


# ------------------------------------------------------------ AAC / ADTS


def _adts_frame(sf_idx=4, profile=1, channels=2, size=None, blocks=1,
                mpeg2=False, fill=0xAA):
    """One ADTS frame built bit-by-bit (ISO 13818-7 / 14496-3):
    7-byte header (no CRC), body filled with ``fill``."""
    if size is None:
        size = 7 + 120
    b1 = 0xF1 | (0x08 if mpeg2 else 0)
    b2 = (profile << 6) | (sf_idx << 2) | ((channels >> 2) & 1)
    b3 = ((channels & 3) << 6) | ((size >> 11) & 3)
    b4 = (size >> 3) & 0xFF
    b5 = ((size & 7) << 5) | 0x1F  # buffer fullness high bits
    b6 = (0x3F << 2) | (blocks - 1)
    return bytes([0xFF, b1, b2, b3, b4, b5, b6]) \
        + bytes([fill]) * (size - 7)


def test_adts_parse_walk():
    data = b"".join(_adts_frame() for _ in range(5))
    m = codecs.parse_adts(data)
    assert m["format"] == "MPEG-4" and m["profile"] == "LC"
    assert m["sample_rate"] == 44100 and m["channels"] == 2
    assert m["n_frames"] == 5
    assert m["duration_ms"] == round(5 * 1024 * 1000 / 44100)
    assert m["frames"][1][0] == 127  # frame 2 starts right after frame 1
    # bitrate: bytes*8*rate/samples
    assert m["bitrate_avg"] == round(5 * 127 * 8 * 44100 / (5 * 1024))


def test_adts_variants_and_resync():
    # MPEG-2, Main profile, mono, 2 raw data blocks, 16 kHz
    f = _adts_frame(sf_idx=8, profile=0, channels=1, blocks=2, mpeg2=True)
    m = codecs.parse_adts(f)
    assert m["format"] == "MPEG-2" and m["profile"] == "Main"
    assert m["sample_rate"] == 16000 and m["channels"] == 1
    assert m["duration_ms"] == round(2048 * 1000 / 16000)
    # garbage between frames is resynced over; ID3v2 prefix skipped
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    data = id3 + _adts_frame() + b"\x00\x01\x02" + _adts_frame()
    assert codecs.parse_adts(data)["n_frames"] == 2
    # a frame length spanning the 13-bit field's byte boundaries
    big = _adts_frame(size=0x5A3)
    assert codecs.parse_adts(big)["frames"][0][1] == 0x5A3
    with pytest.raises(ValueError):
        codecs.parse_adts(b"\x00" * 64)


def test_adts_sniff_vs_mp3():
    # ADTS layer bits are 00 -> never sniffed as mp3, and vice versa
    assert codecs.sniff(_adts_frame()) == "aac"
    assert codecs.sniff(_mp3_frame()) == "mp3"


# ------------------------------------------------------- MP4 / ISO-BMFF


def _box(btype: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + btype + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + body)


def _make_mp4(sample_sizes, keyframes, deltas=100, timescale=1000,
              w=64, h=48, chunk_split=2):
    """Minimal ISO-BMFF file built box-by-box: one video track whose
    samples live in mdat split across two chunks.  ``keyframes`` are
    1-based sample numbers for stss."""
    n = len(sample_sizes)
    mdat_payload = b"".join(
        bytes([i + 1]) * s for i, s in enumerate(sample_sizes))
    # layout: ftyp + moov + mdat; chunk offsets point into mdat body
    stts = _full(b"stts", 0, 0, (1).to_bytes(4, "big")
                 + n.to_bytes(4, "big") + deltas.to_bytes(4, "big"))
    stss = _full(b"stss", 0, 0, len(keyframes).to_bytes(4, "big")
                 + b"".join(k.to_bytes(4, "big") for k in keyframes))
    stsz = _full(b"stsz", 0, 0, (0).to_bytes(4, "big")
                 + n.to_bytes(4, "big")
                 + b"".join(s.to_bytes(4, "big") for s in sample_sizes))
    # two chunks: first chunk_split samples, then the rest
    stsc = _full(b"stsc", 0, 0, (2).to_bytes(4, "big")
                 + (1).to_bytes(4, "big") + chunk_split.to_bytes(4, "big")
                 + (1).to_bytes(4, "big")
                 + (2).to_bytes(4, "big")
                 + (n - chunk_split).to_bytes(4, "big")
                 + (1).to_bytes(4, "big"))
    stsd = _full(b"stsd", 0, 0, (1).to_bytes(4, "big")
                 + _box(b"avc1", b"\x00" * 78))
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12)
    mdhd = _full(b"mdhd", 0, 0, (0).to_bytes(8, "big")
                 + timescale.to_bytes(4, "big")
                 + (n * deltas).to_bytes(4, "big") + b"\x55\xc4\x00\x00")
    tkhd_body = ((0).to_bytes(8, "big") + (1).to_bytes(4, "big")
                 + b"\x00" * 4 + (n * deltas).to_bytes(4, "big")
                 + b"\x00" * 8 + b"\x00" * 8 + b"\x00" * 36
                 + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big"))
    tkhd = _full(b"tkhd", 0, 7, tkhd_body)
    mvhd = _full(b"mvhd", 0, 0, (0).to_bytes(8, "big")
                 + timescale.to_bytes(4, "big")
                 + (n * deltas).to_bytes(4, "big") + b"\x00" * 80)
    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomavc1")

    # compute chunk offsets: mdat body starts after ftyp+moov+8
    def build(stco_offsets):
        stco = _full(b"stco", 0, 0,
                     (len(stco_offsets)).to_bytes(4, "big")
                     + b"".join(o.to_bytes(4, "big") for o in stco_offsets))
        stbl = _box(b"stbl", stsd + stts + stss + stsc + stsz + stco)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        moov = _box(b"moov", mvhd + trak)
        return ftyp + moov + _box(b"mdat", mdat_payload)

    probe = build([0, 0])
    mdat_body = len(probe) - len(mdat_payload)
    chunk2 = mdat_body + sum(sample_sizes[:chunk_split])
    return build([mdat_body, chunk2])


def test_mp4_parse_and_keyframe_index():
    sizes = [10, 20, 30, 40, 50]
    data = _make_mp4(sizes, keyframes=[1, 4], deltas=100)
    assert codecs.sniff(data) == "mp4"
    info = codecs.parse_mp4(data)
    assert info["brand"] == "isom"
    assert info["duration_ms"] == 500
    (trk,) = info["tracks"]
    assert trk["handler"] == "vide" and trk["codec"] == "avc1"
    assert (trk["width"], trk["height"]) == (64, 48)
    assert trk["n_samples"] == 5
    # per-sample decode times + keyframe flags
    assert [s[2] for s in trk["samples"]] == [0, 100, 200, 300, 400]
    assert [s[3] for s in trk["samples"]] == [True, False, False, True, False]
    # offsets resolve to the right mdat bytes (sample i filled with i+1)
    for i, (off, size, _t, _k) in enumerate(trk["samples"]):
        assert data[off : off + size] == bytes([i + 1]) * size

    kf = codecs.mp4_keyframe_index(data)
    assert [(i, t) for (i, t, _o, _s) in kf] == [(0, 0), (3, 300)]
    # keyframe bytes are the coded sample payloads
    i0, t0, o0, s0 = kf[0]
    assert data[o0 : o0 + s0] == b"\x01" * 10


def test_mp4_errors():
    with pytest.raises(ValueError):
        codecs.parse_mp4(b"\x00" * 32)
    # moof-only (fragmented) names the limitation
    frag = _box(b"ftyp", b"isom" + b"\x00" * 8) + _box(b"moof", b"")
    with pytest.raises(NotImplementedError):
        codecs.parse_mp4(frag)


def test_probe_media_real(spark):
    """probe_media over mixed payloads: mp3/mp4/wav/png/y4m/corrupt."""
    payloads = [
        b"".join(_mp3_frame() for _ in range(3)),
        _make_mp4([10, 20, 30], keyframes=[1, 3]),
        make_wav(np.arange(800, dtype=np.int32), rate=8000, bits=16),
        codecs.encode_png(RGB),
        make_y4m(4),
        # sniffs as mp3 (ID3 magic) but holds no MPEG frame → corrupt
        b"ID3\x04\x00\x00\x00\x00\x00\x04" + b"\x00" * 12,
        b"".join(_adts_frame() for _ in range(4)),
        # ID3 wrapper around ADTS: sniffs mp3, probe falls through
        b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10 + _adts_frame(),
        make_gif([np.zeros((6, 9), np.uint8)] * 2,
                 np.zeros((4, 3), np.uint8), 9, 6, delays=[30, 50]),
        _flac_streaminfo(22050, 2, 16, 11025, 4096),
    ]
    media = _media_df(spark, payloads, kind="mixed")
    out = {r.media_id: r for r in
           multimodal.probe_media(media).collect()}
    assert out[0].format == "mp3/MPEG-1-L3"
    assert out[0].sample_rate == 44100 and out[0].n_frames == 3
    assert out[1].format.startswith("mp4/")
    assert (out[1].width, out[1].height) == (64, 48)
    assert out[1].n_frames == 3 and out[1].n_keyframes == 2
    assert out[2].format == "wav" and out[2].sample_rate == 8000
    assert out[2].duration_ms == 100
    assert out[3].format == "png"
    assert (out[3].width, out[3].height) == (3, 2)
    assert out[4].format == "y4m" and out[4].n_frames == 4
    assert out[5].format == "corrupt"
    assert out[6].format == "aac/ADTS-LC"
    assert out[6].sample_rate == 44100 and out[6].channels == 2
    assert out[6].n_frames == 4
    assert out[6].duration_ms == round(4 * 1024 * 1000 / 44100)
    assert out[7].format == "aac/ADTS-LC" and out[7].n_frames == 1
    assert out[8].format == "gif"
    assert (out[8].width, out[8].height) == (9, 6)
    assert out[8].n_frames == 2 and out[8].duration_ms == 80
    assert out[9].format == "flac" and out[9].sample_rate == 22050
    assert out[9].channels == 2 and out[9].duration_ms == 500


def test_sample_frames_mp4_keyframes(spark):
    """sample_frames over an MP4: each sampled instant yields the coded
    access-unit bytes of the nearest preceding keyframe."""
    sizes = [10, 20, 30, 40, 50]
    data = _make_mp4(sizes, keyframes=[1, 4], deltas=100)  # 500ms video
    rows = [(0, "video", bytearray(data),
             ("video/mp4", 64, 48, 0, 500))]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = sorted(
        multimodal.sample_frames(media, every_ms=100, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    assert len(out) == 5
    # keyframes at t=0 (sample 1, 10 bytes of 0x01) and t=300 (sample 4,
    # 40 bytes of 0x04)
    assert bytes(out[0].frame) == b"\x01" * 10
    assert bytes(out[2].frame) == b"\x01" * 10   # t=200 → still kf@0
    assert bytes(out[3].frame) == b"\x04" * 40   # t=300 → kf@300
    assert bytes(out[4].frame) == b"\x04" * 40


def test_mp3_layer1_and_layer2_frame_sizes():
    """Layer I: (12*bitrate/rate + pad)*4 slots; Layer II:
    144*bitrate/rate — exact frame-size math per 11172-3 2.4.3.1."""
    # Layer I, 448 kbps @ 44100
    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (3 << 1) | 1, (14 << 4), 3 << 6])
    size = (12 * 448000 // 44100) * 4
    m = codecs.parse_mp3(hdr + b"\x00" * (size - 4))
    assert m["layer"] == 1 and m["frames"][0] == (0, size, 384)
    # Layer II, 384 kbps @ 44100
    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (2 << 1) | 1, (14 << 4), 3 << 6])
    size = 144 * 384000 // 44100
    m = codecs.parse_mp3(hdr + b"\x00" * (size - 4))
    assert m["layer"] == 2 and m["frames"][0] == (0, size, 1152)


def test_mp4_v0_track_id_and_probe_wav_header_only():
    """review-pass regressions: v0 tkhd track_id is parsed, and the
    WAV probe reads the container's true channel count from the fmt
    chunk (header walk, no PCM decode)."""
    data = _make_mp4([10, 20], keyframes=[1])
    (trk,) = codecs.parse_mp4(data)["tracks"]
    assert trk["track_id"] == 1


def test_probe_media_wav_stereo_channels(spark):
    stereo = np.array([100, 200, -100, -200, 1, 2], np.int32)  # L R x3
    wav = make_wav(stereo, rate=8000, bits=16, channels=2)
    media = _media_df(spark, [wav], kind="audio")
    (row,) = multimodal.probe_media(media).collect()
    assert row.format == "wav" and row.channels == 2
    assert row.sample_rate == 8000 and row.n_frames == 3  # frames, not samples
    assert row.duration_ms == round(3 * 1000 / 8000)


# ---------------------------------------------------------------- AVI


def _avi_fixture(n_frames=10, upf=40000, w=320, h=240, with_idx=True,
                 with_audio=True):
    """Minimal spec-shaped AVI: RIFF(AVI )>LIST hdrl(avih, strl vids
    [+ strl auds]) + LIST movi + idx1 flagging every 5th video frame
    a keyframe."""
    def chunk(cc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cc + struct.pack("<I", len(body)) + body + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    avih = struct.pack("<IIIIIIIIII", upf, 0, 0, 0, n_frames, 0, 0, 0, w, h)
    strh_v = (b"vids" + b"MJPG" + b"\x00" * 12
              + struct.pack("<II", 1, 25)       # scale, rate
              + struct.pack("<II", 0, n_frames))  # start, length
    strl_v = lst(b"strl", chunk(b"strh", strh_v)
                 + chunk(b"strf", b"\x00" * 40))
    hdrl_body = chunk(b"avih", avih) + strl_v
    if with_audio:
        strh_a = (b"auds" + b"\x00" * 16
                  + struct.pack("<II", 1, 44100)
                  + struct.pack("<II", 0, 44100))
        wfx = struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
        hdrl_body += lst(b"strl", chunk(b"strh", strh_a)
                         + chunk(b"strf", wfx))
    movi = lst(b"movi", b"".join(
        chunk(b"00dc", b"\xff" * 7) for _ in range(n_frames)))
    idx = b""
    if with_idx:
        entries = b""
        for i in range(n_frames):
            flags = 0x10 if i % 5 == 0 else 0
            entries += b"00dc" + struct.pack("<III", flags, 4 + i * 16, 6)
        idx = chunk(b"idx1", entries)
    body = b"AVI " + lst(b"hdrl", hdrl_body) + movi + idx
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_parse():
    m = codecs.parse_avi(_avi_fixture())
    assert (m["width"], m["height"]) == (320, 240)
    assert m["n_frames"] == 10
    assert m["duration_ms"] == 400  # 10 frames at 40 ms
    assert m["n_keyframes"] == 2    # frames 0 and 5
    kinds = {s["type"]: s for s in m["streams"]}
    assert kinds["vids"]["fourcc"] == "MJPG"
    assert kinds["vids"]["rate"] == 25.0 and kinds["vids"]["length"] == 10
    assert kinds["auds"]["sample_rate"] == 44100
    assert kinds["auds"]["channels"] == 2


def test_avi_parse_no_index_no_audio():
    m = codecs.parse_avi(_avi_fixture(with_idx=False, with_audio=False))
    assert m["n_keyframes"] is None
    assert [s["type"] for s in m["streams"]] == ["vids"]
    with pytest.raises(ValueError):
        codecs.parse_avi(b"RIFF\x00\x00\x00\x00WAVE")


def test_avi_sniff_and_probe(spark):
    avi = _avi_fixture()
    assert codecs.sniff(avi) == "avi"
    df = _media_df(spark, [avi], kind="video")
    r = multimodal.probe_media(df).first()
    assert r["format"] == "avi/MJPG"
    assert (r["width"], r["height"]) == (320, 240)
    assert r["n_frames"] == 10 and r["n_keyframes"] == 2
    assert r["duration_ms"] == 400
    assert r["sample_rate"] == 44100 and r["channels"] == 2


# ------------------------------------ multi-scan sequential JPEG (§B.2.3)


def _multiscan_from_encoder(img, quality=95):
    """Re-emit encode_jpeg's exact quantized coefficients as THREE
    single-component sequential scans (the spec's non-interleaved
    layout).  Headers and tables identical to encode_jpeg 4:4:4 — so
    the decode must equal decode(encode_jpeg(img)) EXACTLY."""
    from hbase_snapshot_spark.operators.codecs import (
        _DCT8, _ZIGZAG, _ENC_AC_COUNTS, _ENC_AC_SYMBOLS, _ENC_DC_COUNTS,
        _ENC_DC_SYMBOLS, _JPEG_Q_CHROMA, _JPEG_Q_LUMA, _enc_codes,
        _encode_block, _JpegBitWriter,
    )
    img = np.asarray(img, np.uint8)
    h, w = img.shape[:2]
    q = quality
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qtabs = [np.clip((b * scale + 50) // 100, 1, 255).astype(np.int32)
             for b in (_JPEG_Q_LUMA, _JPEG_Q_CHROMA)]
    rf, gf, bf = (img[:, :, i].astype(np.float64) for i in range(3))
    planes = [
        0.299 * rf + 0.587 * gf + 0.114 * bf,
        -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0,
        0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0,
    ]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = []
    for p in planes:
        pp = np.empty((ph, pw))
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1 : h, :]
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)
    dc = _enc_codes(_ENC_DC_COUNTS, _ENC_DC_SYMBOLS)
    ac = _enc_codes(_ENC_AC_COUNTS, _ENC_AC_SYMBOLS)

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, qtab in enumerate(qtabs):
        zz = np.empty(64, np.int32)
        zz[:] = qtab[_ZIGZAG]
        out += seg(0xDB, bytes([tid]) + bytes(int(v) for v in zz))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for ci in range(3):
        sof += bytes([ci + 1, 0x11, min(ci, 1)])
    out += seg(0xC0, sof)
    for cls, counts, syms in [(0, _ENC_DC_COUNTS, _ENC_DC_SYMBOLS),
                              (1, _ENC_AC_COUNTS, _ENC_AC_SYMBOLS)]:
        for tid in (0, 1):
            out += seg(0xC4, bytes([(cls << 4) | tid]) + counts + syms)
    # one SOS per component, blocks in the component's raster order
    for ci, p in enumerate(padded):
        tid = 0 if ci == 0 else 1
        out += seg(0xDA, bytes([1, ci + 1, (tid << 4) | tid, 0, 63, 0]))
        writer = _JpegBitWriter()
        pred = 0
        qtab = qtabs[min(ci, 1)]
        for by in range(ph // 8):
            for bx in range(pw // 8):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coeff = _DCT8 @ blk @ _DCT8.T
                zz = np.round(
                    coeff.reshape(64)[_ZIGZAG] / qtab[_ZIGZAG]).astype(np.int64)
                pred = _encode_block(writer, zz, pred, dc, ac)
        out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_multiscan_sequential_equals_interleaved():
    x = np.linspace(0, 255, 24)
    rgb = np.stack([
        np.clip(np.add.outer(x, x) / 2, 0, 255),
        np.tile(x, (24, 1)),
        np.tile(x[::-1], (24, 1)),
    ], axis=-1).astype(np.uint8)
    inter = codecs.decode_jpeg(codecs.encode_jpeg(rgb, quality=95))
    multi = codecs.decode_jpeg(_multiscan_from_encoder(rgb, quality=95))
    np.testing.assert_array_equal(multi, inter)
    # odd size exercises the padding/crop path per-component
    odd = rgb[:19, :21]
    np.testing.assert_array_equal(
        codecs.decode_jpeg(_multiscan_from_encoder(odd)),
        codecs.decode_jpeg(codecs.encode_jpeg(odd, quality=95)))


def test_jpeg_multiscan_missing_component_raises():
    rgb = np.full((8, 8, 3), 90, np.uint8)
    data = _multiscan_from_encoder(rgb)
    # drop the LAST scan: find the third SOS and cut from there to EOI
    sos = [i for i in range(len(data) - 1)
           if data[i] == 0xFF and data[i + 1] == 0xDA]
    assert len(sos) == 3
    cut = data[: sos[2]] + b"\xff\xd9"
    with pytest.raises(ValueError, match="missing components"):
        codecs.decode_jpeg(cut)


def _multiscan_420_solid(width, height, y_level):
    """Solid-color 4:2:0 frame emitted as three single-component
    scans — exercises the per-component block-raster geometry where
    the Y raster is 2x the MCU grid."""
    from hbase_snapshot_spark.operators.codecs import (
        _ENC_AC_COUNTS, _ENC_AC_SYMBOLS, _ENC_DC_COUNTS, _ENC_DC_SYMBOLS,
        _enc_codes, _JpegBitWriter,
    )
    dc = _enc_codes(_ENC_DC_COUNTS, _ENC_DC_SYMBOLS)
    ac = _enc_codes(_ENC_AC_COUNTS, _ENC_AC_SYMBOLS)
    qdc = round(8 * (y_level - 128) / 16)

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([16] * 64))
    out += seg(0xDB, bytes([1]) + bytes([17] * 64))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += seg(0xC0, sof)
    for cls, counts, syms in [(0, _ENC_DC_COUNTS, _ENC_DC_SYMBOLS),
                              (1, _ENC_AC_COUNTS, _ENC_AC_SYMBOLS)]:
        for tid in (0, 1):
            out += seg(0xC4, bytes([(cls << 4) | tid]) + counts + syms)
    mcus_x, mcus_y = -(-width // 16), -(-height // 16)
    rasters = [  # (comp id, table id, n blocks, dc value)
        (1, 0, (2 * mcus_y) * (2 * mcus_x), qdc),
        (2, 1, mcus_y * mcus_x, 0),
        (3, 1, mcus_y * mcus_x, 0),
    ]
    for cid, tid, nblocks, val in rasters:
        out += seg(0xDA, bytes([1, cid, (tid << 4) | tid, 0, 63, 0]))
        writer = _JpegBitWriter()
        pred = 0
        for _ in range(nblocks):
            diff = val - pred
            pred = val
            t = abs(diff).bit_length()
            c, ln = dc[t]
            writer.write(c, ln)
            if t:
                writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            c, ln = ac[0x00]
            writer.write(c, ln)
        out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out), qdc * 16 / 8 + 128


def test_jpeg_multiscan_420_single_component_rasters():
    data, level = _multiscan_420_solid(32, 16, y_level=200)
    out = codecs.decode_jpeg(data)
    assert out.shape == (16, 32, 3)
    np.testing.assert_array_equal(
        out, np.full((16, 32, 3), int(level), np.uint8))
    # matches the interleaved handmade stream bit-for-bit in output
    inter, _ = _handmade_jpeg_420(32, 16, y_level=200)
    np.testing.assert_array_equal(out, codecs.decode_jpeg(inter))
