"""Dependency-free media codecs for the multimodal kernels.

The container has no Pillow/libjpeg/ffmpeg, so the formats every real
training pipeline can count on here are the self-describing
uncompressed ones: binary **PPM/PGM** (netpbm P6/P5) and **BMP**
(BITMAPINFOHEADER, BI_RGB 8/24/32-bit) for images, and RIFF **WAV**
(PCM 8/16/24/32-bit int + 32-bit IEEE float) for audio.  Parsers are
pure numpy — vectorized per payload, no per-byte Python loops — and run
inside the Arrow-batched ``mapInPandas`` kernels in ``multimodal.py``.
Compressed formats (JPEG/PNG/MP3/…) still raise ``NotImplementedError``
naming the library they would need.

These cover the reference-repo test philosophy for opaque byte values
(cells are uninterpreted ``byte[]``; util/Bytes.java decodes at the
edge): the engine moves payloads untouched, and the codec is an edge
decode over the binary column.
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------------------ sniff


def sniff(data: bytes) -> str | None:
    """Cheap magic-byte format detection: 'pnm' | 'bmp' | 'wav' | None."""
    if data is None or len(data) < 12:
        return None
    if data[:2] in (b"P5", b"P6"):
        return "pnm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


# ----------------------------------------------------------------- images


def decode_pnm(data: bytes) -> np.ndarray:
    """Binary netpbm: P6 (RGB) → (h, w, 3) uint8; P5 (gray) → (h, w).
    Header = magic, width, height, maxval as whitespace-separated ASCII
    tokens with '#' comments, then ONE whitespace byte, then the raster
    (8-bit, or 16-bit big-endian when maxval > 255, scaled to 8-bit)."""
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM payload")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(data):
            c = data[pos : pos + 1]
            if c == b"#":
                while pos < len(data) and data[pos : pos + 1] not in (b"\n", b"\r"):
                    pos += 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        vals.append(int(data[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from raster
    w, h, maxval = vals
    channels = 3 if magic == b"P6" else 1
    n = w * h * channels
    if maxval < 256:
        arr = np.frombuffer(data, np.uint8, count=n, offset=pos)
    else:
        arr = (
            np.frombuffer(data, ">u2", count=n, offset=pos).astype(np.uint32)
            * 255
            // maxval
        ).astype(np.uint8)
    return arr.reshape((h, w, 3) if channels == 3 else (h, w))


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) or (h, w) uint8 → binary P6 payload (gray replicated
    to RGB so resized output has one uniform shape)."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img.astype(np.uint8)
    ).tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed BMP (BITMAPINFOHEADER+, BI_RGB) → (h, w, 3) uint8
    RGB.  Handles 24/32-bit truecolor and 8-bit palette, 4-byte row
    padding, and both bottom-up (biHeight > 0) and top-down rasters."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_offset = int.from_bytes(data[10:14], "little")
    header_size = int.from_bytes(data[14:18], "little")
    if header_size < 40:
        raise ValueError("BITMAPCOREHEADER (OS/2) BMP unsupported")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) unsupported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"{bpp}-bit BMP unsupported")
    top_down, h = h < 0, abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3
    raster = np.frombuffer(
        data, np.uint8, count=row_bytes * h, offset=pixel_offset
    ).reshape(h, row_bytes)
    if bpp == 24:
        img = raster[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    elif bpp == 32:
        img = raster[:, : w * 4].reshape(h, w, 4)[:, :, [2, 1, 0]]  # BGRA → RGB
    else:  # 8-bit palette: BGRX entries right after the info header
        ncolors = int.from_bytes(data[46:50], "little") or 256
        palette = np.frombuffer(
            data, np.uint8, count=ncolors * 4, offset=14 + header_size
        ).reshape(ncolors, 4)[:, [2, 1, 0]]
        img = palette[raster[:, :w]]
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def decode_image(data: bytes) -> np.ndarray:
    """payload bytes → uint8 array, (h, w, 3) RGB or (h, w) gray."""
    kind = sniff(data)
    if kind == "pnm":
        return decode_pnm(data)
    if kind == "bmp":
        return decode_bmp(data)
    raise NotImplementedError(
        "unsupported image codec (only uncompressed PPM/PGM/BMP decode "
        "without media libraries; JPEG/PNG require Pillow — unavailable "
        "in this container)"
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample via integer index gather — exact,
    deterministic, and allocation-minimal (one fancy-index per axis)."""
    src_h, src_w = img.shape[:2]
    rows = (np.arange(height) * src_h) // height
    cols = (np.arange(width) * src_w) // width
    return img[rows][:, cols]


# ------------------------------------------------------------------ audio


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE → (sample_rate, mono int32 samples in int16 range).
    PCM 8/16/24/32-bit int and 32-bit IEEE float; multi-channel input is
    downmixed by mean.  Chunk walk honors word alignment, so extra
    chunks (LIST/fact/cue) are skipped correctly."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = max(1, int.from_bytes(fmt[2:4], "little"))
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format == 1 and bits == 8:
        samples = (np.frombuffer(raw, np.uint8).astype(np.int32) - 128) << 8
    elif audio_format == 1 and bits == 16:
        samples = np.frombuffer(raw, "<i2").astype(np.int32)
    elif audio_format == 1 and bits == 24:
        b = np.frombuffer(raw, np.uint8)
        n = len(b) // 3
        b = b[: n * 3].reshape(n, 3).astype(np.int32)
        s = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        samples = ((s ^ 0x800000) - 0x800000) >> 8  # sign-extend, to 16-bit
    elif audio_format == 1 and bits == 32:
        samples = (np.frombuffer(raw, "<i4") >> 16).astype(np.int32)
    elif audio_format == 3 and bits == 32:
        f = np.clip(np.frombuffer(raw, "<f4"), -1.0, 1.0)
        samples = np.round(f * 32767).astype(np.int32)
    else:
        raise NotImplementedError(
            f"WAV format {audio_format}/{bits}-bit unsupported (compressed "
            "audio like MP3/AAC requires ffmpeg — unavailable here)"
        )
    if n_channels > 1:
        n = len(samples) // n_channels
        samples = (
            samples[: n * n_channels]
            .reshape(n, n_channels)
            .mean(axis=1)
            .round()
            .astype(np.int32)
        )
    return sample_rate, samples


def resample_linear(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Linear-interpolation resample — the deterministic minimal kernel
    (a production pipeline would band-limit first; that filter needs no
    extra deps either but is out of scope for level features)."""
    if src_rate == dst_rate or len(samples) == 0:
        return samples
    n_out = max(1, int(round(len(samples) * dst_rate / src_rate)))
    x_out = np.arange(n_out, dtype=np.float64) * (src_rate / dst_rate)
    return (
        np.interp(x_out, np.arange(len(samples), dtype=np.float64), samples)
        .round()
        .astype(np.int32)
    )


# ------------------------------------------------------------------ video


def sniff_y4m(data: bytes) -> bool:
    return data is not None and data[:9] == b"YUV4MPEG2"


_Y4M_FRAME_SIZES = {
    "420": lambda w, h: w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2),
    "422": lambda w, h: w * h + 2 * ((w + 1) // 2) * h,
    "444": lambda w, h: 3 * w * h,
    "mono": lambda w, h: w * h,
}


def parse_y4m_header(data: bytes) -> dict:
    """YUV4MPEG2 stream header → {width, height, fps (num, den),
    colorspace, frame_size, data_offset}.  The container is plain text
    + raw planar frames — the one video format that decodes without
    ffmpeg.  Default colorspace is C420 when absent (y4m spec)."""
    if not sniff_y4m(data):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = data.index(b"\n")
    width = height = None
    fps = (25, 1)
    cs = "420"
    for tok in data[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            width = int(t[1:])
        elif t.startswith("H"):
            height = int(t[1:])
        elif t.startswith("F"):
            num, den = t[1:].split(":")
            fps = (int(num), int(den))
        elif t.startswith("C"):
            base = t[1:]
            cs = "mono" if base.startswith("mono") else base[:3]
    if width is None or height is None:
        raise ValueError("y4m header missing W/H")
    if cs not in _Y4M_FRAME_SIZES:
        raise NotImplementedError(f"y4m colorspace C{cs} unsupported")
    return {
        "width": width,
        "height": height,
        "fps": fps,
        "colorspace": cs,
        "frame_size": _Y4M_FRAME_SIZES[cs](width, height),
        "data_offset": nl + 1,
    }


def y4m_frames(data: bytes):
    """Yield (frame_index, raw_planar_bytes) per frame.  Each frame is
    a 'FRAME[ params]\\n' marker + frame_size raw bytes; markers are
    scanned (params are legal), frame bodies are sliced — no copy of
    the whole stream."""
    hdr = parse_y4m_header(data)
    pos, size, idx = hdr["data_offset"], hdr["frame_size"], 0
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"y4m frame marker missing at offset {pos}")
        nl = data.index(b"\n", pos)
        body = data[nl + 1 : nl + 1 + size]
        if len(body) < size:
            break  # truncated tail frame
        yield idx, body
        idx += 1
        pos = nl + 1 + size


def y4m_frame_count(data: bytes) -> int:
    return sum(1 for _ in y4m_frames(data))
