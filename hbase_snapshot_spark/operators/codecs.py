"""Dependency-free media codecs for the multimodal kernels.

The container has no Pillow/libjpeg/ffmpeg, so every decoder here is
hand-rolled over stdlib + numpy:

* images — binary **PPM/PGM** (netpbm P6/P5), **BMP**
  (BITMAPINFOHEADER, BI_RGB 8/24/32-bit), **PNG** (incl. Adam7
  interlacing, all five filter types, gray/RGB/palette/alpha, 8- and
  16-bit via stdlib ``zlib``), **GIF** (87a/89a LZW + animation
  compositing), baseline **TIFF** (none/LZW/PackBits), and **JPEG** —
  baseline/extended-sequential (SOF0/SOF1), progressive (SOF2:
  spectral selection + successive approximation, spec Annex G), AND
  lossless (SOF3, Annex H predictive) — huffman entropy decode +
  dequant + IDCT + chroma upsample + YCbCr→RGB;
* audio — RIFF **WAV** (PCM 8/16/24/32-bit int, 32-bit IEEE float,
  G.711 A-law/mu-law telephony, IMA/DVI + MS **ADPCM**), **AIFF** /
  AIFF-C (incl. 'sowt'/G.711), Sun **.au**, **FLAC** (lossless rice +
  LPC), and MPEG-1 Layer III (**MP3**, mp3dec.py);
* video — **YUV4MPEG2** frame streams, animated GIF;
* container walks (probe/triage, no payload decode) — **MP4**/ISO-BMFF
  sample tables + keyframe index, **ADTS/AAC**, **Ogg**
  (Vorbis/Opus/FLAC/Theora/Speex ID headers), **Matroska/WebM** (EBML).

Parsers are numpy-vectorized per payload where the format allows
(PNG unfiltering is per-scanline vector ops; ADPCM vectorizes across
blocks; JPEG's entropy decode is inherently sequential per MCU but all
block math — dequant, IDCT, upsample, colorspace — is matrix-level
numpy) and run inside the Arrow-batched ``mapInPandas`` kernels in
``multimodal.py``.  The remaining compressed formats (arithmetic-coded
JPEG, AAC spectral decode, H.264/HEVC pixels) still raise
``NotImplementedError`` naming what they need.

These cover the reference-repo test philosophy for opaque byte values
(cells are uninterpreted ``byte[]``; util/Bytes.java decodes at the
edge): the engine moves payloads untouched, and the codec is an edge
decode over the binary column.
"""

from __future__ import annotations

import zlib

import numpy as np

# ------------------------------------------------------------------ sniff


def sniff(data: bytes) -> str | None:
    """Cheap magic-byte format detection:
    'pnm' | 'bmp' | 'png' | 'gif' | 'tiff' | 'jpeg' | 'webp' | 'avi' |
    'wav' | 'aiff' | 'au' | 'flac' | 'ogg' | 'ebml' | 'mp4' | 'aac' |
    'mp3' | None."""
    if data is None or len(data) < 12:
        return None
    if data[:2] in (b"P5", b"P6"):
        return "pnm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:4] == b"GIF8" and data[4:6] in (b"7a", b"9a"):
        return "gif"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:4] == b"fLaC":
        return "flac"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"):
        return "aiff"
    if data[:4] == b".snd":
        return "au"
    if data[:4] == b"OggS":
        return "ogg"
    if data[:4] == b"\x1a\x45\xdf\xa3":
        return "ebml"  # Matroska / WebM
    if data[4:8] == b"ftyp":
        return "mp4"
    if data[0] == 0xFF and (data[1] & 0xF6) == 0xF0:
        return "aac"  # ADTS: sync 0xFFF with layer bits 00
    if data[:3] == b"ID3" or (
        data[0] == 0xFF and (data[1] & 0xE0) == 0xE0 and (data[1] >> 1) & 3 != 0
    ):
        return "mp3"
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


# ------------------------------------------------------------------- PNG

# samples per pixel by PNG color type (0=gray 2=RGB 3=palette 4=gray+A 6=RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering (PNG spec §6).  ``raw`` is the
    inflated stream reshaped to (h, 1+stride); returns (h, stride)
    reconstructed bytes.  Up/None are whole-row vector ops; Sub is a
    cumulative sum per byte lane; Average/Paeth have a true left+up
    recurrence, walked per pixel position with vector ops over the
    ``bpp`` byte lanes."""
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_row = [0] * stride
    for y in range(h):
        ftype = int(raw[y, 0])
        if ftype == 0:  # None
            out[y] = raw[y, 1:]
            continue
        if ftype == 2:  # Up
            out[y] = raw[y, 1:] + out[y - 1] if y > 0 else raw[y, 1:]
            continue
        if ftype == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp]
            lanes = raw[y, 1:].reshape(-1, bpp)
            out[y] = np.cumsum(
                lanes, axis=0, dtype=np.int64
            ).reshape(stride) & 0xFF
            continue
        # Average/Paeth have a true left+up recurrence: walked per byte
        # with PYTHON ints (r7: numpy scalar indexing here measured
        # ~1us/byte — the list walk is ~10x faster)
        line = raw[y, 1:].tolist()
        prev = out[y - 1].tolist() if y > 0 else zero_row
        if ftype == 3:  # Average
            for x in range(bpp):
                line[x] = (line[x] + (prev[x] >> 1)) & 0xFF
            for x in range(bpp, stride):
                line[x] = (line[x] + ((line[x - bpp] + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(bpp):
                b = prev[x]  # a = c = 0: predictor reduces to b (or a=0 when b=0)
                line[x] = (line[x] + b) & 0xFF
            for x in range(bpp, stride):
                a = line[x - bpp]
                b = prev[x]
                c = prev[x - bpp]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype} on scanline {y}")
        out[y] = line
    return out


def _png_unpack_subbyte(rows: np.ndarray, w: int, depth: int) -> np.ndarray:
    """(h, stride) reconstructed scanline bytes → (h, w) pixel values
    for 1/2/4-bit depths: big-endian within each byte (PNG spec §7.2,
    leftmost pixel in the high bits), trailing pad bits dropped."""
    h = rows.shape[0]
    bits = np.unpackbits(rows, axis=1)[:, : w * depth]
    if depth == 1:
        return bits
    groups = bits.reshape(h, w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (groups * weights).sum(axis=2).astype(np.uint8)


# Adam7 pass geometry: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def decode_png(data: bytes) -> np.ndarray:
    """PNG (non-interlaced AND Adam7-interlaced) → uint8 array:
    (h, w) gray or (h, w, 3) RGB (alpha dropped, palette expanded,
    16-bit scaled to 8-bit, 1/2/4-bit gray scaled up and palette
    indices expanded)."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(data):
        size = int.from_bytes(data[pos : pos + 4], "big")
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IEND":
            break
        pos += 12 + size  # length + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, _comp, _filt, interlace = ihdr[8], ihdr[9], ihdr[10], ihdr[11], ihdr[12]
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {color}")
    subbyte = depth in (1, 2, 4)
    if subbyte:
        if color not in (0, 3):  # spec §11.2.2: only gray/palette
            raise ValueError(f"{depth}-bit color-type-{color} PNG invalid")
    elif depth not in (8, 16) or (color == 3 and depth != 8):
        raise NotImplementedError(f"{depth}-bit color-type-{color} PNG unsupported")
    ch = _PNG_CHANNELS[color]
    # filter unit: bytes per complete pixel; sub-byte depths filter on
    # whole bytes (spec §9.2 "bpp is rounded up to one")
    bpp = 1 if subbyte else ch * depth // 8
    stride = (w * depth + 7) // 8 if subbyte else w * bpp
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if interlace == 1:  # Adam7: 7 independently-filtered sub-images
        recon = np.zeros((h, w, bpp), np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            sp = (wp * depth + 7) // 8 if subbyte else wp * bpp
            need = hp * (sp + 1)
            if pos + need > len(raw):
                raise ValueError("truncated PNG pixel stream")
            sub = _png_unfilter(
                raw[pos : pos + need].reshape(hp, sp + 1), hp, sp, bpp
            )
            pos += need
            rows = np.arange(hp) * dy + y0
            cols = np.arange(wp) * dx + x0
            if subbyte:
                sub = _png_unpack_subbyte(sub, wp, depth)[:, :, None]
            recon[np.ix_(rows, cols)] = sub.reshape(hp, wp, bpp)
        if subbyte:
            img = recon
        else:
            if depth == 16:  # high byte, as below
                recon = recon.reshape(h, w, ch, 2)[:, :, :, 0]
            img = recon.reshape(h, w, ch)
    else:
        if len(raw) < h * (stride + 1):
            raise ValueError("truncated PNG pixel stream")
        recon = _png_unfilter(
            raw[: h * (stride + 1)].reshape(h, stride + 1), h, stride, bpp
        )
        if subbyte:
            img = _png_unpack_subbyte(recon, w, depth)[:, :, None]
        else:
            if depth == 16:  # high byte (exact for 0xhhhh replication)
                recon = recon.reshape(h, w, ch, 2)[:, :, :, 0]
            img = recon.reshape(h, w, ch)
    if subbyte and color == 0:  # scale to full 8-bit range (spec §12.5)
        img = (img.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    if color == 3:  # palette → RGB
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        return np.ascontiguousarray(pal[img[:, :, 0]])
    if color == 0:
        return np.ascontiguousarray(img[:, :, 0])
    if color == 4:  # gray+alpha → gray
        return np.ascontiguousarray(img[:, :, 0])
    return np.ascontiguousarray(img[:, :, :3])  # RGB / RGBA→RGB


# ------------------------------------------------------------------ JPEG

# zigzag index → natural (row-major) 8x8 position (JPEG spec Fig. A.6)
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II basis: _DCT8[k, n] = c_k/2 * cos((2n+1)kπ/16);
# IDCT of an 8x8 coefficient block F is  _DCT8.T @ F @ _DCT8.
_DCT8 = np.array([
    [(0.35355339059327373 if k == 0 else 0.5)
     * np.cos((2 * n + 1) * k * np.pi / 16.0) for n in range(8)]
    for k in range(8)
])
# (k=0 row: 1/(2*sqrt(2)) = 0.353553...; exact value inlined so module
# import does not depend on float expression evaluation order)


def _build_huffman(counts: bytes, symbols: bytes) -> list:
    """Canonical JPEG Huffman table (spec Annex C) compiled to a
    peek-16 lookup table: lut[next_16_bits] = (symbol << 5) | code_len,
    0 for an invalid prefix.  One list index replaces the former
    bit-by-bit dict walk — the entropy decoder's hot operation (r7:
    table-driven decode measured the whole-image decode 4x faster)."""
    lut = [0] * 65536
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            packed = (symbols[k] << 5) | length
            base = code << (16 - length)
            lut[base : base + (1 << (16 - length))] = \
                [packed] * (1 << (16 - length))
            code += 1
            k += 1
        code <<= 1
    return lut


# bit-accumulator trim masks: _MASKS[n] = (1 << n) - 1
_MASKS = [(1 << n) - 1 for n in range(64)]


class _JpegBitReader:
    """MSB-first bit reader over one entropy-coded segment (stuffed
    0xFF 0x00 bytes already collapsed by the segment splitter).  An
    int accumulator refilled 4 bytes at a time; past the end the spec's
    1-bit padding is synthesized, so a peek never over-consumes."""

    __slots__ = ("buf", "pos", "n", "acc", "nbits")

    def __init__(self, buf: bytes):
        self.buf, self.pos, self.n = buf, 0, len(buf)
        self.acc, self.nbits = 0, 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos < self.n:
                chunk = self.buf[self.pos : self.pos + 4]
                self.pos += len(chunk)
                self.acc = (self.acc << (8 * len(chunk))) | int.from_bytes(
                    chunk, "big"
                )
                self.nbits += 8 * len(chunk)
            else:  # spec pads with 1-bits past the segment end
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill(1)
        self.nbits -= 1
        v = (self.acc >> self.nbits) & 1
        # trim consumed bits — an untrimmed accumulator grows into a
        # bignum over a long segment and every shift turns O(len)
        self.acc &= _MASKS[self.nbits]
        return v

    def read_bits(self, n: int) -> int:
        if self.nbits < n:
            self._fill(n)
        self.nbits -= n
        v = (self.acc >> self.nbits) & _MASKS[n]
        self.acc &= _MASKS[self.nbits]
        return v

    def decode_huffman(self, lut: list) -> int:
        if self.nbits < 16:
            self._fill(16)
        packed = lut[(self.acc >> (self.nbits - 16)) & 0xFFFF]
        if packed == 0:
            raise ValueError("invalid JPEG Huffman code")
        self.nbits -= packed & 31
        self.acc &= _MASKS[self.nbits]
        return packed >> 5


def _extend(v: int, t: int) -> int:
    """DC/AC value extension (spec F.2.2.1): t-bit magnitude → signed."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _split_entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Walk the entropy-coded stream from ``pos``: collapse 0xFF 0x00
    stuffing, split at RSTn markers (each restart segment decodes with
    fresh DC predictors and byte alignment), stop at any other marker.
    Returns (segments, position_of_terminating_marker)."""
    segs, cur = [], bytearray()
    n = len(data)
    while pos < n:
        # bulk-copy up to the next 0xFF (the common case is long
        # marker-free runs — the former per-byte walk was a decode
        # hot spot on large scans)
        ff = data.find(0xFF, pos)
        if ff < 0:
            cur += data[pos:]
            pos = n
            break
        cur += data[pos:ff]
        pos = ff
        nxt = data[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif nxt == 0xFF:  # fill byte before a marker (spec B.1.1.2)
            pos += 1
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # real marker: end of scan
            break
    segs.append(bytes(cur))
    return segs, pos


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline/extended-sequential (SOF0/SOF1), progressive (SOF2),
    AND lossless (SOF3, Annex H) JPEG → uint8 array: (h, w, 3) RGB for
    YCbCr (components as-is for lossless — no color transform there),
    (h, w) for grayscale.  Full huffman entropy decode (spectral
    selection + successive approximation for progressive, spec Annex
    G; predictive differences for lossless) + dequantization +
    orthonormal IDCT + nearest chroma upsample + JFIF YCbCr→RGB, all
    dependency-free.  4-component CMYK/YCCK (Adobe APP14, TN #5116)
    composites to RGB.  >8-bit lossless samples map to the high byte
    (the 16-bit PNG/TIFF convention).  Arithmetic-coded and
    hierarchical streams raise NotImplementedError.  Entropy decode is
    sequential per MCU (the format is a bit-serial prefix code); the
    per-block math is numpy."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, [(comp_id, h_samp, v_samp, tq)])
    progressive = False
    coef = None  # progressive coefficient state: cid -> (bh, bw, 64) zigzag
    lossless = False
    precision = 8
    planes = None  # lossless sample planes: cid -> (h, w) int32
    restart_interval = 0
    adobe = None  # APP14 color transform: 0=CMYK/RGB, 1=YCbCr, 2=YCCK
    seq_coef = None  # multi-scan sequential coefficient state
    seq_seen: set = set()
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {pos}")
        while pos + 2 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1  # fill bytes before a marker (spec B.1.1.2)
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RSTn/TEM: no body
            pos += 2
            continue
        if pos + 2 + seg_len > len(data):
            raise ValueError("truncated JPEG segment")
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                i += 1
                if prec:  # 16-bit table
                    tab = np.frombuffer(body[i : i + 128], ">u2").astype(np.int32)
                    i += 128
                else:
                    tab = np.frombuffer(body[i : i + 64], np.uint8).astype(np.int32)
                    i += 64
                qt[tid] = tab
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                counts = body[i + 1 : i + 17]
                nsym = sum(counts)
                symbols = body[i + 17 : i + 17 + nsym]
                (huff_ac if cls else huff_dc)[tid] = _build_huffman(counts, symbols)
                i += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1 seq, SOF2 prog,
            precision = body[0]                   # SOF3 lossless
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            if len(comps) not in (1, 3, 4):
                raise NotImplementedError(
                    f"{len(comps)}-component JPEG unsupported"
                )
            if len(comps) == 4 and marker == 0xC3:
                raise NotImplementedError("4-component lossless JPEG unsupported")
            frame = (h, w, comps)
            if marker == 0xC2:
                progressive = True
                max_h = max(c[1] for c in comps)
                max_v = max(c[2] for c in comps)
                mcus_x, mcus_y = -(-w // (8 * max_h)), -(-h // (8 * max_v))
                coef = {
                    cid: np.zeros((mcus_y * cv, mcus_x * ch, 64), np.int32)
                    for cid, ch, cv, _tq in comps
                }
            elif marker == 0xC3:
                lossless = True
                planes = {cid: np.zeros((h, w), np.int32)
                          for cid, _ch, _cv, _tq in comps}
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02x} (hierarchical/arithmetic) "
                "unsupported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_comps = []  # [(cid, dc_table, ac_table)] in scan order
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cid, tabs >> 4, tabs & 0x0F))
            h, w, comps = frame
            segs, end = _split_entropy_segments(data, pos + 2 + seg_len)
            if lossless:
                pred_sel = body[1 + 2 * ns]  # Ss = predictor selection
                p_t = body[3 + 2 * ns] & 0x0F  # Al = point transform
                _jpeg_lossless_scan(
                    frame, scan_comps, pred_sel, p_t, precision,
                    huff_dc, segs, restart_interval, planes,
                )
                pos = end
                continue
            if not progressive:
                if ns == len(comps) and seq_coef is None:
                    return _jpeg_decode_scan(
                        h, w, comps, {c: (d, a) for c, d, a in scan_comps},
                        qt, huff_dc, huff_ac, segs, restart_interval, adobe,
                    )
                # multi-scan sequential (§B.2.3): components split
                # across scans — accumulate, IDCT once at EOI
                if seq_coef is None:
                    max_h = max(c[1] for c in comps)
                    max_v = max(c[2] for c in comps)
                    mx, my = -(-w // (8 * max_h)), -(-h // (8 * max_v))
                    seq_coef = {
                        cid: np.zeros((my * cv, mx * ch, 64), np.int32)
                        for cid, ch, cv, _tq in comps
                    }
                _jpeg_sequential_partial_scan(
                    frame, scan_comps, seq_coef, huff_dc, huff_ac,
                    segs, restart_interval,
                )
                seq_seen.update(c for c, _d, _a in scan_comps)
                pos = end
                continue
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            _jpeg_progressive_scan(
                frame, scan_comps, ss, se, ah, al, coef,
                huff_dc, huff_ac, segs, restart_interval,
            )
            pos = end
            continue
        elif marker == 0xEE and body[:5] == b"Adobe":  # APP14 (TN #5116)
            adobe = body[11] if len(body) >= 12 else 0
        # other APPn / COM: skip
        pos += 2 + seg_len
    if progressive and coef is not None:
        return _jpeg_progressive_finish(frame, qt, coef, adobe)
    if seq_coef is not None:
        h, w, comps = frame
        missing = {c[0] for c in comps} - seq_seen
        if missing:
            raise ValueError(
                f"multi-scan sequential JPEG missing components {missing}")
        return _jpeg_idct_assemble(h, w, comps, qt, seq_coef, adobe)
    if lossless and planes is not None:
        h, w, comps = frame
        chans = [planes[cid] for cid, *_ in comps]
        arr = chans[0] if len(chans) == 1 else np.stack(chans, axis=-1)
        if precision > 8:  # high byte, the 16-bit PNG/TIFF convention
            arr = arr >> (precision - 8)
        return np.clip(arr, 0, 255).astype(np.uint8)
    raise ValueError("JPEG stream ended without SOS scan")


def _jpeg_decode_scan(
    h, w, comps, scan_tables, qt, huff_dc, huff_ac, segs, restart_interval,
    adobe=None,
) -> np.ndarray:
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    n_mcus = mcus_x * mcus_y
    # entropy decode accumulates ZIGZAG coefficients per block; all
    # block math (dequant + IDCT + reassembly) runs batched afterwards
    # (one einsum per component — same shape the progressive path uses)
    coef = {
        cid: np.zeros((mcus_y * cv, mcus_x * ch, 64), np.int32)
        for cid, ch, cv, _tq in comps
    }

    # per-component decode context hoisted out of the MCU loop
    ctx = [
        (cid, ch, cv, huff_dc[scan_tables[cid][0]],
         huff_ac[scan_tables[cid][1]], coef[cid])
        for cid, ch, cv, _tq in comps
    ]
    mcu = 0
    for seg_i, seg in enumerate(segs):
        reader = _JpegBitReader(seg)
        decode, bits = reader.decode_huffman, reader.read_bits
        pred = {cid: 0 for cid, *_ in comps}
        seg_mcus = (
            min(restart_interval, n_mcus - mcu) if restart_interval else n_mcus - mcu
        )
        for _ in range(seg_mcus):
            my, mx = divmod(mcu, mcus_x)
            for cid, ch, cv, dc_tab, ac_tab, carr in ctx:
                for by in range(cv):
                    for bx in range(ch):
                        zz = [0] * 64
                        t = decode(dc_tab)
                        diff = _extend(bits(t), t) if t else 0
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = decode(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC coefficient overrun")
                            zz[k] = _extend(bits(s), s)
                            k += 1
                        carr[my * cv + by, mx * ch + bx] = zz
            mcu += 1
        if mcu >= n_mcus:
            break
    if mcu < n_mcus:
        raise ValueError(f"truncated JPEG scan: {mcu}/{n_mcus} MCUs decoded")
    return _jpeg_idct_assemble(h, w, comps, qt, coef, adobe)


def _seq_decode_block(decode, bits, dc_tab, ac_tab, pred, cid):
    """One full sequential block (DC diff + 63 AC) → zigzag list."""
    zz = [0] * 64
    t = decode(dc_tab)
    diff = _extend(bits(t), t) if t else 0
    pred[cid] += diff
    zz[0] = pred[cid]
    k = 1
    while k < 64:
        rs = decode(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            break
        k += r
        if k > 63:
            raise ValueError("JPEG AC coefficient overrun")
        zz[k] = _extend(bits(s), s)
        k += 1
    return zz


def _jpeg_sequential_partial_scan(
    frame, scan_comps, coef, huff_dc, huff_ac, segs, restart_interval
):
    """A sequential scan covering a SUBSET of the frame components
    (spec §B.2.3 allows each sequential frame to split its components
    across scans): ns==1 walks the component's own block raster,
    ns>1 the frame MCU grid restricted to the scan's components.
    Coefficients accumulate into the shared ``coef`` arrays; the IDCT
    runs once after the last scan."""
    h, w, comps = frame
    by_id = {cid: (ch, cv) for cid, ch, cv, _tq in comps}
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x, mcus_y = -(-w // (8 * max_h)), -(-h // (8 * max_v))
    single = len(scan_comps) == 1
    if single:
        cid0, _d, _a = scan_comps[0]
        ch0, cv0 = by_id[cid0]
        bw = _ceil_div(_ceil_div(w * ch0, max_h), 8)
        bh = _ceil_div(_ceil_div(h * cv0, max_v), 8)
        n_units = bw * bh
    else:
        n_units = mcus_x * mcus_y
    unit = 0
    for seg in segs:
        reader = _JpegBitReader(seg)
        decode, bits = reader.decode_huffman, reader.read_bits
        pred = {cid: 0 for cid, _d, _a in scan_comps}
        seg_units = (
            min(restart_interval, n_units - unit)
            if restart_interval else n_units - unit
        )
        for _ in range(seg_units):
            if single:
                cid, dtab, atab = scan_comps[0]
                y, x = divmod(unit, bw)
                coef[cid][y, x] = _seq_decode_block(
                    decode, bits, huff_dc[dtab], huff_ac[atab], pred, cid)
            else:
                my, mx = divmod(unit, mcus_x)
                for cid, dtab, atab in scan_comps:
                    ch, cv = by_id[cid]
                    for by in range(cv):
                        for bx in range(ch):
                            coef[cid][my * cv + by, mx * ch + bx] = (
                                _seq_decode_block(
                                    decode, bits, huff_dc[dtab],
                                    huff_ac[atab], pred, cid))
            unit += 1
        if unit >= n_units:
            break
    if unit < n_units:
        raise ValueError(
            f"truncated JPEG partial scan: {unit}/{n_units} units")


def _jpeg_progressive_scan(
    frame, scan_comps, ss, se, ah, al, coef, huff_dc, huff_ac,
    segs, restart_interval,
):
    """One progressive scan (spec Annex G): DC scans may interleave all
    components on the MCU grid; AC scans are single-component over the
    component's own block raster.  Successive approximation: first
    scans (Ah=0) deliver coefficients shifted by Al; refinement scans
    (Ah>0) deliver one correction bit per coefficient."""
    h, w, comps = frame
    by_id = {cid: (cid, ch, cv, tq) for cid, ch, cv, tq in comps}
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x, mcus_y = -(-w // (8 * max_h)), -(-h // (8 * max_v))

    if ss == 0:  # ---------------------------------------- DC scan
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        n_units = mcus_x * mcus_y if len(scan_comps) > 1 else None
        if n_units is None:
            _cid, ch, cv, _tq = by_id[scan_comps[0][0]]
            bw = _ceil_div(_ceil_div(w * ch, max_h), 8)
            bh = _ceil_div(_ceil_div(h * cv, max_v), 8)
            n_units = bw * bh
        unit = 0
        for seg in segs:
            reader = _JpegBitReader(seg)
            preds = {cid: 0 for cid, _d, _a in scan_comps}
            seg_units = (
                min(restart_interval, n_units - unit)
                if restart_interval else n_units - unit
            )
            for _ in range(seg_units):
                if len(scan_comps) > 1:  # interleaved MCU
                    my, mx = divmod(unit, mcus_x)
                    for cid, dtab, _atab in scan_comps:
                        _c, ch, cv, _tq = by_id[cid]
                        for by in range(cv):
                            for bx in range(ch):
                                blk = coef[cid][my * cv + by, mx * ch + bx]
                                _prog_dc_block(
                                    reader, blk, preds, cid, ah, al,
                                    huff_dc.get(dtab),
                                )
                else:  # single component: its own block raster
                    cid, dtab, _atab = scan_comps[0]
                    _c, ch, cv, _tq = by_id[cid]
                    bw = _ceil_div(_ceil_div(w * ch, max_h), 8)
                    y, x = divmod(unit, bw)
                    _prog_dc_block(
                        reader, coef[cid][y, x], preds, cid, ah, al,
                        huff_dc.get(dtab),
                    )
                unit += 1
            if unit >= n_units:
                break
        if unit < n_units:
            raise ValueError(f"truncated progressive DC scan: {unit}/{n_units}")
        return

    # ------------------------------------------------------ AC scan
    if len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    cid, _dtab, atab = scan_comps[0]
    _c, ch, cv, _tq = by_id[cid]
    bw = _ceil_div(_ceil_div(w * ch, max_h), 8)
    bh = _ceil_div(_ceil_div(h * cv, max_v), 8)
    n_units = bw * bh
    table = huff_ac[atab]
    unit = 0
    for seg in segs:
        reader = _JpegBitReader(seg)
        eobrun = 0
        seg_units = (
            min(restart_interval, n_units - unit)
            if restart_interval else n_units - unit
        )
        for _ in range(seg_units):
            y, x = divmod(unit, bw)
            blk = coef[cid][y, x]
            if ah == 0:
                eobrun = _prog_ac_first(reader, blk, ss, se, al, table, eobrun)
            else:
                eobrun = _prog_ac_refine(reader, blk, ss, se, al, table, eobrun)
            unit += 1
        if unit >= n_units:
            break
    if unit < n_units:
        raise ValueError(f"truncated progressive AC scan: {unit}/{n_units}")


def _jpeg_lossless_scan(frame, scan_comps, pred_sel, p_t, precision,
                        huff_dc, segs, restart_interval, planes) -> None:
    """Lossless JPEG scan (spec Annex H): per sample, a DC-style
    Huffman SSSS category + magnitude bits give a difference from the
    selected predictor (1..7 over Ra/Rb/Rc neighbors); the first
    sample of the scan and of each restart interval predicts from
    2^(P-Pt-1), the rest of the first line from Ra, line starts from
    Rb.  Reconstruction is modulo-65536.  Decoded samples are left
    shifted by the point transform at scan end."""
    h, w, comps = frame
    byid = {cid: (ch, cv) for cid, ch, cv, _tq in comps}
    if any(byid[cid] != (1, 1) for cid, _d, _a in scan_comps):
        raise NotImplementedError("subsampled lossless JPEG unsupported")
    if not 1 <= pred_sel <= 7:
        raise NotImplementedError(
            f"lossless predictor {pred_sel} unsupported (1-7 only)")
    tables = [(planes[cid], huff_dc[d]) for cid, d, _a in scan_comps]
    default = 1 << (precision - p_t - 1)
    total = h * w
    mcu = 0
    for seg in segs:
        reader = _JpegBitReader(seg)
        count = min(restart_interval or total, total - mcu)
        for i in range(count):
            y, x = divmod(mcu, w)
            restart_first = i == 0 and mcu != 0
            for plane, lut in tables:
                t = reader.decode_huffman(lut)
                if t == 16:  # SSSS 16: difference is 32768, no bits
                    diff = 32768
                elif t:
                    diff = _extend(reader.read_bits(t), t)
                else:
                    diff = 0
                if mcu == 0 or restart_first:
                    px = default
                elif y == 0:
                    px = int(plane[0, x - 1])  # first line: Ra
                elif x == 0:
                    px = int(plane[y - 1, 0])  # line start: Rb
                else:
                    ra = int(plane[y, x - 1])
                    rb = int(plane[y - 1, x])
                    if pred_sel == 1:
                        px = ra
                    elif pred_sel == 2:
                        px = rb
                    elif pred_sel == 3:
                        px = int(plane[y - 1, x - 1])
                    elif pred_sel == 4:
                        px = ra + rb - int(plane[y - 1, x - 1])
                    elif pred_sel == 5:
                        px = ra + ((rb - int(plane[y - 1, x - 1])) >> 1)
                    elif pred_sel == 6:
                        px = rb + ((ra - int(plane[y - 1, x - 1])) >> 1)
                    else:
                        px = (ra + rb) >> 1
                plane[y, x] = (px + diff) & 0xFFFF
            mcu += 1
        if mcu >= total:
            break
    if mcu < total:
        raise ValueError("truncated lossless JPEG scan")
    if p_t:
        for plane, _lut in tables:
            plane <<= p_t


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _prog_dc_block(reader, blk, preds, cid, ah, al, dc_table):
    if ah == 0:  # first scan: huffman diff of (DC >> Al)
        t = reader.decode_huffman(dc_table)
        diff = _extend(reader.read_bits(t), t) if t else 0
        preds[cid] += diff
        blk[0] = preds[cid] << al
    else:  # refinement: one bit
        blk[0] |= reader.read_bit() << al


def _prog_ac_first(reader, blk, ss, se, al, table, eobrun) -> int:
    """AC first scan for one block (G.1.2.2): run-length + EOBRUN."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huffman(table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            return (1 << r) - 1 + reader.read_bits(r)  # EOBRUN (this block done)
        k += r
        if k > se:
            raise ValueError("progressive AC coefficient overrun")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _prog_ac_refine(reader, blk, ss, se, al, table, eobrun) -> int:
    """AC refinement for one block (G.1.2.3, the IJG
    decode_mcu_AC_refine control flow): newly-nonzero coefficients
    arrive as ±1<<Al; already-nonzero coefficients receive correction
    bits as the zero-run walk passes over them."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_huffman(table)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:
                    # refinement EOB keeps THIS block in the run (the
                    # correction-bit pass below consumes it): 2^r+bits,
                    # NOT the first-scan's 2^r-1+bits (IJG
                    # decode_mcu_AC_refine vs decode_mcu_AC_first)
                    eobrun = (1 << r) + reader.read_bits(r)
                    break
                val = 0  # ZRL: pass over 16 zero-history coefficients
            else:
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit():
                        if (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        if val != 0:
                            blk[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if reader.read_bit():
                    if (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_progressive_finish(frame, qt, coef, adobe=None) -> np.ndarray:
    h, w, comps = frame
    return _jpeg_idct_assemble(h, w, comps, qt, coef, adobe)


def _jpeg_idct_assemble(h, w, comps, qt, coef, adobe=None) -> np.ndarray:
    """All coefficients decoded (sequential or progressive): dequantize
    the accumulated zigzag coefficients, batched IDCT (one einsum per
    component), reassemble planes, upsample + color-convert."""
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    planes = {}
    for cid, _ch, _cv, tq in comps:
        zz = coef[cid].astype(np.float64) * qt[tq]  # both zigzag order
        bh, bw = zz.shape[:2]
        nat = np.zeros_like(zz)
        nat[:, :, _ZIGZAG] = zz
        blocks = nat.reshape(bh, bw, 8, 8)
        # batched two-stage IDCT: matmul broadcasts over the block grid
        # (BLAS) and keeps the exact summation order of the former
        # per-block  _DCT8.T @ blk @ _DCT8
        spatial = _DCT8.T @ blocks @ _DCT8 + 128.0
        planes[cid] = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return _jpeg_reconstruct(h, w, comps, planes, max_h, max_v, adobe)


def _ycc_to_rgb(y, cb, cr):
    """JFIF YCbCr→RGB (CCIR 601 constants)."""
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return r, g, b


def _jpeg_reconstruct(h, w, comps, planes, max_h, max_v, adobe=None) -> np.ndarray:
    """Component planes → output image: nearest chroma upsample (the
    box replicate JFIF decoders use for 2x factors), crop to (h, w),
    JFIF YCbCr→RGB for 3 components.  4 components = CMYK/YCCK per
    the Adobe APP14 transform (TN #5116): transform 2 applies the
    YCbCr math to the first three planes first; with the Adobe marker
    present the stored values are INVERTED ink (the Photoshop
    convention), without it they are raw ink.  Output composites to
    (h, w, 3) RGB: R = (255-C)(255-K)/255 etc."""
    full = []
    for cid, ch, cv, _tq in comps:
        plane = planes[cid]
        rows = np.minimum(np.arange(h) * cv // max_v, plane.shape[0] - 1)
        cols = np.minimum(np.arange(w) * ch // max_h, plane.shape[1] - 1)
        full.append(plane[rows][:, cols])
    if len(full) == 1:
        return _round_clip_u8(full[0])
    if len(full) == 3:
        r, g, b = _ycc_to_rgb(full[0], full[1] - 128.0, full[2] - 128.0)
        return _round_clip_u8(np.stack([r, g, b], axis=-1))
    # 4-component CMYK family
    if adobe == 2:  # YCCK: first three planes carry YCbCr(255-ink CMY)
        sc, sm, sy = _ycc_to_rgb(full[0], full[1] - 128.0, full[2] - 128.0)
        sk = full[3]
    elif adobe is not None:  # Adobe CMYK: stored inverted (255-ink)
        sc, sm, sy, sk = full
    else:  # bare 4-component: raw ink values
        sc, sm, sy, sk = (255.0 - p for p in full)
    # s* are (255-ink); composite: R = sC*sK/255
    r = sc * sk / 255.0
    g = sm * sk / 255.0
    b = sy * sk / 255.0
    return _round_clip_u8(np.stack([r, g, b], axis=-1))


def _round_clip_u8(x: np.ndarray) -> np.ndarray:
    """round-half-even then clamp to [0,255] uint8 — same values as
    np.clip(np.round(x), 0, 255).astype(uint8), but the clamp runs on
    int64 (float64 scalar-bound np.clip measured 8x slower; int64 so a
    pathological coefficient stream can't wrap the cast)."""
    i = np.rint(x).astype(np.int64)
    np.clip(i, 0, 255, out=i)
    return i.astype(np.uint8)


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → non-interlaced PNG (filter
    type 0 per scanline, one zlib IDAT)."""
    img = np.ascontiguousarray(img.astype(np.uint8))
    if img.ndim == 2:
        color, ch = 0, 1
        raster = img[:, :, None]
    else:
        color, ch = 2, 3
        raster = img[:, :, :3]
    h, w = raster.shape[:2]
    scan = np.concatenate(
        [np.zeros((h, 1), np.uint8), raster.reshape(h, w * ch)], axis=1
    ).tobytes()

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big")
            + ctype
            + body
            + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color, 0, 0, 0])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan, 6))
        + chunk(b"IEND", b"")
    )


# JPEG Annex K.1/K.2 base quantization tables (natural order)
_JPEG_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_JPEG_Q_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.int32,
)

# Encoder Huffman layout: single-length canonical tables (12 DC symbols
# at 5 bits; the 162 RRRRSSSS AC symbols at 8 bits).  Deliberately
# suboptimal but spec-valid — the DHT segments describe them fully, so
# any conformant decoder reads the stream; optimal per-image tables are
# a compression-ratio concern, not a correctness one.
_ENC_DC_COUNTS = bytes([0, 0, 0, 0, 12] + [0] * 11)
_ENC_DC_SYMBOLS = bytes(range(12))
_ENC_AC_SYMBOLS = bytes(
    [0x00, 0xF0]
    + [r << 4 for r in range(1, 15)]  # EOB1..EOB14 (progressive EOBRUN)
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_ENC_AC_COUNTS = bytes([0] * 7 + [len(_ENC_AC_SYMBOLS)] + [0] * 8)


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF 0x00 byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.nbits = 0, 0

    def flush(self) -> bytes:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad 1s
        return bytes(self.out)


def _enc_codes(counts: bytes, symbols: bytes) -> dict:
    """symbol → (code, length) for the encoder-side canonical tables."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_block(writer, zz, pred, dc_codes, ac_codes) -> int:
    """One quantized zigzag block → entropy stream; returns new DC pred."""
    diff = int(zz[0]) - pred
    t = abs(diff).bit_length()
    code, length = dc_codes[t]
    writer.write(code, length)
    if t:
        writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max(np.nonzero(zz)[0], default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            writer.write(c, ln)
            run -= 16
        s = abs(v).bit_length()
        c, ln = ac_codes[(run << 4) | s]
        writer.write(c, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]
        writer.write(c, ln)
    return int(zz[0])


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """uint8 (h, w) gray, (h, w, 3) RGB, or (h, w, 4) CMYK (raw ink
    values) → baseline JFIF JPEG (SOF0, 4:4:4, quality-scaled Annex K
    quant tables).  CMYK writes the Adobe APP14 marker (transform 0)
    and stores inverted ink per the Photoshop convention — what
    :func:`decode_jpeg` expects back.  The complement of
    :func:`decode_jpeg` for thumbnail re-encode pipelines."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    cmyk = img.ndim == 3 and img.shape[2] == 4
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    # IJG quality → table scale
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qtabs = []
    for base in ([_JPEG_Q_LUMA] if gray else [_JPEG_Q_LUMA, _JPEG_Q_CHROMA]):
        qtabs.append(np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32))

    if gray:
        planes = [img.astype(np.float64)]
    elif cmyk:
        # inverted-ink storage; all four planes share the luma table
        planes = [255.0 - img[:, :, c].astype(np.float64) for c in range(4)]
        qtabs = qtabs[:1]
    else:
        rf = img[:, :, 0].astype(np.float64)
        gf = img[:, :, 1].astype(np.float64)
        bf = img[:, :, 2].astype(np.float64)
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
        pp[h:, :w] = p[h - 1 : h, :]  # edge replicate
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)

    dc_codes = _enc_codes(_ENC_DC_COUNTS, _ENC_DC_SYMBOLS)
    ac_codes = _enc_codes(_ENC_AC_COUNTS, _ENC_AC_SYMBOLS)
    writer = _JpegBitWriter()
    preds = [0] * len(planes)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci, p in enumerate(padded):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coeff = _DCT8 @ blk @ _DCT8.T
                qtab = qtabs[min(ci, len(qtabs) - 1)]
                zz = np.round(coeff.reshape(64)[_ZIGZAG] / qtab[_ZIGZAG]).astype(
                    np.int64
                )
                preds[ci] = _encode_block(writer, zz, preds[ci], dc_codes, ac_codes)
    entropy = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if cmyk:  # Adobe APP14, transform 0 (no color transform applied)
        out += seg(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0]))
    for tid, qtab in enumerate(qtabs):
        zz_tab = np.empty(64, np.int32)
        zz_tab[:] = qtab[_ZIGZAG]  # DQT stores zigzag order
        out += seg(0xDB, bytes([tid]) + bytes(int(v) for v in zz_tab))
    ncomp = len(planes)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, min(ci, len(qtabs) - 1)])
    out += seg(0xC0, sof)
    for cls in (0, 1):
        counts = _ENC_DC_COUNTS if cls == 0 else _ENC_AC_COUNTS
        syms = _ENC_DC_SYMBOLS if cls == 0 else _ENC_AC_SYMBOLS
        for tid in range(1 if gray else 2):
            out += seg(0xC4, bytes([(cls << 4) | tid]) + counts + syms)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 0 if (gray or ci == 0) else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------------- GIF
#
# GIF87a/89a (the format is fully algorithmic — LZW + palettes, no spec
# constant tables): header/extension walk, variable-width LSB-first LZW,
# interlace reorder, frame compositing with GCE transparency + disposal
# methods 0-3.  Common enough in scraped corpora to be first-class next
# to PNG/JPEG.


def _gif_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate the data sub-blocks at ``pos`` → (bytes, end_pos)."""
    out = bytearray()
    n = len(data)
    while pos < n:
        sz = data[pos]
        pos += 1
        if sz == 0:
            break
        out += data[pos : pos + sz]
        pos += sz
    return bytes(out), pos


def _gif_lzw(min_code_size: int, data: bytes, npix: int) -> bytes:
    """GIF-variant LZW (LSB-first, variable 3-12 bit codes, clear/EOI,
    deferred-clear when the table is full) → palette-index bytes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    acc = nbits = pos = 0
    n = len(data)
    prev = None
    while len(out) < npix:
        while nbits < code_size:
            if pos >= n:
                return bytes(out)  # truncated stream: keep what decoded
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF LZW stream")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        prev = entry
        if len(table) >= (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out[:npix])


def parse_gif(data: bytes) -> dict:
    """Header walk only (no LZW decode): {width, height, n_frames,
    durations_ms, loop_count, frames: [(left, top, w, h, interlaced,
    transparent_idx, disposal, delay_ms)], ...}."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    w = int.from_bytes(data[6:8], "little")
    h = int.from_bytes(data[8:10], "little")
    packed, bg = data[10], data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        ncolors = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, ncolors * 3, pos).reshape(-1, 3)
        pos += ncolors * 3
    frames = []
    loop_count = None
    transparent = disposal = None
    delay_ms = 0
    n = len(data)
    while pos < n:
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            if label == 0xF9 and data[pos + 2] >= 4:  # graphic control
                p = data[pos + 3]
                disposal = (p >> 2) & 0x07
                delay_ms = int.from_bytes(data[pos + 4 : pos + 6], "little") * 10
                transparent = data[pos + 6] if (p & 1) else None
            body, pos2 = _gif_subblocks(data, pos + 2)
            if label == 0xFF and body[:11] == b"NETSCAPE2.0" and len(body) >= 14:
                loop_count = int.from_bytes(body[12:14], "little")
            pos = pos2
            continue
        if b == 0x2C:  # image descriptor
            left = int.from_bytes(data[pos + 1 : pos + 3], "little")
            top = int.from_bytes(data[pos + 3 : pos + 5], "little")
            fw = int.from_bytes(data[pos + 5 : pos + 7], "little")
            fh = int.from_bytes(data[pos + 7 : pos + 9], "little")
            fpacked = data[pos + 9]
            pos += 10
            lct_off = None
            if fpacked & 0x80:
                lct_off = pos
                pos += (2 << (fpacked & 0x07)) * 3
            min_code = data[pos]
            lzw_off = pos + 1
            _body, pos = _gif_subblocks(data, pos + 1)
            frames.append({
                "left": left, "top": top, "w": fw, "h": fh,
                "interlaced": bool(fpacked & 0x40),
                "lct_off": lct_off, "lct_bits": fpacked & 0x07,
                "min_code": min_code, "lzw_off": lzw_off,
                "transparent_idx": transparent, "disposal": disposal or 0,
                "delay_ms": delay_ms,
            })
            transparent = disposal = None
            delay_ms = 0
            continue
        raise ValueError(f"bad GIF block 0x{b:02x} at offset {pos}")
    return {
        "width": w, "height": h, "n_frames": len(frames),
        "durations_ms": [f["delay_ms"] for f in frames],
        "duration_ms": sum(f["delay_ms"] for f in frames),
        "loop_count": loop_count, "background": bg,
        "global_palette": gct, "frames": frames,
    }


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes, max_frames: int | None = None
               ) -> tuple[np.ndarray, list[int]]:
    """GIF → (frames (n, h, w, 3) uint8, per-frame delays in ms).
    Full compositing: local/global palettes, interlace reorder, GCE
    transparency, disposal 0/1 (keep), 2 (restore background),
    3 (restore previous)."""
    meta = parse_gif(data)
    w, h = meta["width"], meta["height"]
    gct = meta["global_palette"]
    if gct is not None and meta["background"] < len(gct):
        bg_rgb = gct[meta["background"]]
    else:
        bg_rgb = np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
    frames = []
    durations = []
    todo = meta["frames"][:max_frames] if max_frames else meta["frames"]
    for f in todo:
        pal = gct
        if f["lct_off"] is not None:
            ncol = 2 << f["lct_bits"]
            pal = np.frombuffer(
                data, np.uint8, ncol * 3, f["lct_off"]
            ).reshape(-1, 3)
        if pal is None:
            raise ValueError("GIF frame with no color table")
        body, _end = _gif_subblocks(data, f["lzw_off"])
        idx = np.frombuffer(
            _gif_lzw(f["min_code"], body, f["w"] * f["h"]), np.uint8
        )
        if len(idx) < f["w"] * f["h"]:  # truncated: pad with background
            idx = np.concatenate(
                [idx, np.zeros(f["w"] * f["h"] - len(idx), np.uint8)]
            )
        grid = idx.reshape(f["h"], f["w"])
        if f["interlaced"]:
            order = np.concatenate(
                [np.arange(start, f["h"], step) for start, step in _GIF_INTERLACE]
            )
            un = np.empty_like(grid)
            un[order] = grid
            grid = un
        before = canvas.copy() if f["disposal"] == 3 else None
        y0, x0 = f["top"], f["left"]
        y1, x1 = min(h, y0 + f["h"]), min(w, x0 + f["w"])
        region = grid[: y1 - y0, : x1 - x0]
        rgb = pal[np.minimum(region, len(pal) - 1)]
        target = canvas[y0:y1, x0:x1]
        if f["transparent_idx"] is not None:
            mask = region != f["transparent_idx"]
            target[mask] = rgb[mask]
        else:
            target[:] = rgb
        frames.append(canvas.copy())
        durations.append(f["delay_ms"])
        if f["disposal"] == 2:  # restore background in the frame rect
            canvas[y0:y1, x0:x1] = bg_rgb
        elif f["disposal"] == 3 and before is not None:
            canvas = before
    if not frames:
        raise ValueError("GIF with no image frames")
    return np.stack(frames), durations


# ------------------------------------------------------------------ TIFF
#
# Baseline TIFF 6.0 (Adobe spec, public): II/MM byte orders, IFD tag
# walk, strip assembly, compressions 1 (none), 5 (TIFF-LZW: MSB-first
# codes with the early-change increment), 32773 (PackBits), horizontal-
# differencing predictor, photometric gray (incl. WhiteIsZero), RGB(A),
# and palette.  The scan/scientific-corpus sibling of PNG: fully
# algorithmic, no spec constant tables.


def _tiff_lzw(data: bytes, max_out: int) -> bytes:
    """TIFF-variant LZW: MSB-first variable 9-12 bit codes, clear=256,
    EOI=257, and the EARLY code-size change (one code before the GIF
    variant, TIFF 6.0 p.61)."""
    clear, eoi = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    code_size = 9
    out = bytearray()
    acc = nbits = pos = 0
    n = len(data)
    prev = None
    while len(out) < max_out:
        while nbits < code_size:
            if pos >= n:
                return bytes(out)
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= code_size
        code = (acc >> nbits) & ((1 << code_size) - 1)
        acc &= (1 << nbits) - 1
        if code == clear:
            table = list(base)
            code_size = 9
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt TIFF LZW stream")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        prev = entry
        # early change (TIFF6 p.61): the writer widens after ITS insert
        # reaches 2^n - 1, and the reader lags the writer by exactly one
        # insert (no insert on the first code after clear), so the
        # reader widens at table length 2^n - 2
        if len(table) >= (1 << code_size) - 2 and code_size < 12:
            code_size += 1
    return bytes(out[:max_out])


def _packbits(data: bytes, max_out: int) -> bytes:
    """PackBits RLE (TIFF 6.0 §9)."""
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n and len(out) < max_out:
        c = data[pos]
        pos += 1
        if c < 128:  # literal run of c+1 bytes
            out += data[pos : pos + c + 1]
            pos += c + 1
        elif c > 128:  # repeat next byte 257-c times
            if pos < n:
                out += bytes([data[pos]]) * (257 - c)
                pos += 1
        # c == 128: no-op
    return bytes(out[:max_out])


def parse_tiff(data: bytes) -> dict:
    """First-IFD tag walk → {width, height, bits_per_sample,
    samples_per_pixel, compression, photometric, predictor, strips:
    [(offset, byte_count, rows)], colormap, byteorder}."""
    if data[:4] == b"II*\x00":
        bo = "little"
    elif data[:4] == b"MM\x00*":
        bo = "big"
    else:
        raise ValueError("not a TIFF payload")

    def rd(off, size):
        return int.from_bytes(data[off : off + size], bo)

    _TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 8: 2, 9: 4}

    def values(entry_off):
        tag = rd(entry_off, 2)
        typ = rd(entry_off + 2, 2)
        count = rd(entry_off + 4, 4)
        tsz = _TYPE_SIZE.get(typ)
        if tsz is None:
            return tag, None
        total = tsz * count
        voff = entry_off + 8 if total <= 4 else rd(entry_off + 8, 4)
        return tag, [rd(voff + i * tsz, tsz) for i in range(count)]

    ifd = rd(4, 4)
    nent = rd(ifd, 2)
    tags = {}
    for i in range(nent):
        tag, vals = values(ifd + 2 + 12 * i)
        if vals is not None:
            tags[tag] = vals
    try:
        w = tags[256][0]
        h = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as ex:
        raise ValueError(f"TIFF missing required tag {ex}") from None
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [1] * spp)
    rows_per_strip = tags.get(278, [h])[0] or h
    strips = []
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        rows = min(rows_per_strip, h - i * rows_per_strip)
        strips.append((off, cnt, rows))
    return {
        "width": w, "height": h, "bits_per_sample": bits,
        "samples_per_pixel": spp,
        "compression": tags.get(259, [1])[0],
        "photometric": tags.get(262, [1])[0],
        "predictor": tags.get(317, [1])[0],
        "strips": strips, "colormap": tags.get(320),
        "byteorder": bo,
    }


def decode_tiff(data: bytes) -> np.ndarray:
    """Baseline TIFF → uint8 (h, w) gray or (h, w, 3) RGB."""
    m = parse_tiff(data)
    w, h, spp = m["width"], m["height"], m["samples_per_pixel"]
    bits = m["bits_per_sample"]
    if any(b not in (8, 16) for b in bits[:spp]):
        raise NotImplementedError(
            f"{bits}-bit TIFF unsupported (8/16-bit samples only)"
        )
    bpp = sum(b // 8 for b in bits[:spp])
    stride = w * bpp
    comp = m["compression"]
    raster = bytearray()
    for off, cnt, rows in m["strips"]:
        body = data[off : off + cnt]
        need = rows * stride
        if comp == 1:
            chunk = body[:need]
        elif comp == 5:
            chunk = _tiff_lzw(body, need)
        elif comp == 32773:
            chunk = _packbits(body, need)
        else:
            raise NotImplementedError(
                f"TIFF compression {comp} unsupported (none/LZW/PackBits)"
            )
        if len(chunk) < need:
            chunk = chunk + b"\x00" * (need - len(chunk))
        raster += chunk
    arr = np.frombuffer(bytes(raster[: h * stride]), np.uint8).reshape(h, stride)
    if m["predictor"] == 2:  # horizontal differencing, per byte lane
        arr = np.cumsum(
            arr.reshape(h, w, bpp), axis=1, dtype=np.int64
        ).astype(np.uint8).reshape(h, stride)
    px = arr.reshape(h, w, bpp)
    if 16 in bits[:spp]:  # take each sample's high byte (like PNG)
        hi = 0 if m["byteorder"] == "big" else 1
        px = px.reshape(h, w, spp, 2)[:, :, :, hi]
    else:
        px = px.reshape(h, w, spp)
    photo = m["photometric"]
    if photo == 3:  # palette: 16-bit colormap, R then G then B planes
        cm = m["colormap"]
        if not cm:
            raise ValueError("palette TIFF missing ColorMap")
        ncol = len(cm) // 3
        pal = (np.array(cm, np.uint32).reshape(3, ncol).T // 257).astype(np.uint8)
        return np.ascontiguousarray(pal[np.minimum(px[:, :, 0], ncol - 1)])
    if spp == 1:
        g = px[:, :, 0]
        return np.ascontiguousarray(255 - g if photo == 0 else g)
    if photo == 2 and spp >= 3:
        return np.ascontiguousarray(px[:, :, :3])  # RGB / RGBA→RGB
    raise NotImplementedError(
        f"TIFF photometric {photo} with {spp} samples unsupported"
    )


def parse_webp(data: bytes) -> dict:
    """WebP header walk → {variant, width, height, has_alpha,
    has_animation}: dimensions from the VP8 lossy keyframe tag
    (0x9D012A start code, 14-bit w/h), the VP8L packed header
    (0x2F signature), or the VP8X canvas — the triage layer; pixel
    decode needs libwebp and stays out of dependency-free scope."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    out = {"variant": None, "width": None, "height": None,
           "has_alpha": False, "has_animation": False,
           "n_frames": None, "duration_ms": None}
    while pos + 8 <= len(data):
        cc = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cc == b"ANMF" and len(body) >= 16:  # animation frame header
            out["n_frames"] = (out["n_frames"] or 0) + 1
            out["duration_ms"] = ((out["duration_ms"] or 0)
                                  + int.from_bytes(body[12:15], "little"))
        elif cc == b"VP8X" and len(body) >= 10:
            out["variant"] = out["variant"] or "extended"
            out["has_alpha"] |= bool(body[0] & 0x10)
            out["has_animation"] = bool(body[0] & 0x02)
            if out["width"] is None:
                out["width"] = int.from_bytes(body[4:7], "little") + 1
                out["height"] = int.from_bytes(body[7:10], "little") + 1
        elif cc == b"VP8 " and len(body) >= 10:
            out["variant"] = out["variant"] or "lossy"
            if body[3:6] == b"\x9d\x01\x2a" and out["width"] is None:
                out["width"] = int.from_bytes(body[6:8], "little") & 0x3FFF
                out["height"] = int.from_bytes(body[8:10], "little") & 0x3FFF
        elif cc == b"VP8L" and len(body) >= 5:
            out["variant"] = out["variant"] or "lossless"
            if body[0] == 0x2F and out["width"] is None:
                bits = int.from_bytes(body[1:5], "little")
                out["width"] = (bits & 0x3FFF) + 1
                out["height"] = ((bits >> 14) & 0x3FFF) + 1
                out["has_alpha"] |= bool((bits >> 28) & 1)
        elif cc == b"ALPH":
            out["has_alpha"] = True
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if out["variant"] is None:
        raise ValueError("WebP missing VP8/VP8L/VP8X chunk")
    return out


def decode_image(data: bytes) -> np.ndarray:
    """payload bytes → uint8 array, (h, w, 3) RGB or (h, w) gray."""
    kind = sniff(data)
    if kind == "pnm":
        return decode_pnm(data)
    if kind == "bmp":
        return decode_bmp(data)
    if kind == "png":
        return decode_png(data)
    if kind == "jpeg":
        return decode_jpeg(data)
    if kind == "gif":
        return decode_gif(data, max_frames=1)[0][0]
    if kind == "tiff":
        return decode_tiff(data)
    raise NotImplementedError(
        "unsupported image codec (PPM/PGM/BMP/PNG/baseline-JPEG decode "
        "dependency-free here; other formats require Pillow/ffmpeg — "
        "unavailable in this container)"
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample via integer index gather — exact,
    deterministic, and allocation-minimal (one fancy-index per axis)."""
    src_h, src_w = img.shape[:2]
    rows = (np.arange(height) * src_h) // height
    cols = (np.arange(width) * src_w) // width
    return img[rows][:, cols]


# ------------------------------------------------------------------ audio


def _alaw_expand(raw: bytes) -> np.ndarray:
    """G.711 A-law bytes → int32 linear (ITU-T G.711 segment expansion).

    Sign: A-law bit 7 SET means POSITIVE (the opposite of mu-law's
    complemented convention) — r10's stdlib-audioop cross-validation
    caught this inverted in the original transcription (magnitudes
    matched, every sign flipped; the analytic fixtures shared the
    error, which is exactly why an independent decoder matters)."""
    b = np.frombuffer(raw, np.uint8).astype(np.int32) ^ 0x55
    sign = np.where(b & 0x80, 1, -1)
    e = (b >> 4) & 7
    m = b & 0x0F
    mag = np.where(e == 0, (m << 4) + 8, ((m << 4) + 0x108) << (e - 1))
    return (sign * mag).astype(np.int32)


def _mulaw_expand(raw: bytes) -> np.ndarray:
    """G.711 mu-law bytes → int32 linear (bias-0x84 expansion)."""
    u = (~np.frombuffer(raw, np.uint8)).astype(np.int32) & 0xFF
    sign = np.where(u & 0x80, -1, 1)
    e = (u >> 4) & 7
    m = u & 0x0F
    mag = (((m << 3) + 0x84) << e) - 0x84
    return (sign * mag).astype(np.int32)


def _downmix(samples: np.ndarray, n_channels: int) -> np.ndarray:
    """Interleaved multi-channel int32 → mono by mean (frame-truncating)."""
    if n_channels <= 1:
        return samples
    n = len(samples) // n_channels
    return (samples[: n * n_channels].reshape(n, n_channels)
            .mean(axis=1).round().astype(np.int32))


# IMA/DVI ADPCM (WAV format 17) — published step/index tables from the
# IMA Digital Audio Focus Group "Recommended Practices for Enhancing
# Digital Audio Compatibility" (1992), the same public-standard-constant
# status as the G.711 segment math above.
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767], np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)

# MS ADPCM (WAV format 2) — coefficient pairs (8.8 fixed point) and the
# delta adaptation table from the Microsoft WAVE multimedia standard.
_MS_COEFS = np.array([(256, 0), (512, -256), (0, 0), (192, 64),
                      (240, 0), (460, -208), (392, -232)], np.int32)
_MS_ADAPT = np.array([230, 230, 230, 230, 307, 409, 512, 614,
                      768, 614, 512, 409, 307, 230, 230, 230], np.int32)


def _decode_ima_adpcm(raw: bytes, nch: int, block_align: int) -> np.ndarray:
    """IMA ADPCM WAV data chunk → interleaved int32 samples.

    Blocks are independent (each carries its own predictor + step-index
    header), so the decode vectorizes across (block, channel) streams;
    the only sequential loop is the within-block sample position —
    exactly the batch shape a mapInPandas kernel wants."""
    nblocks = len(raw) // block_align
    if nblocks == 0:
        return np.empty(0, np.int32)
    buf = np.frombuffer(raw[: nblocks * block_align], np.uint8)
    buf = buf.reshape(nblocks, block_align)
    hdr = buf[:, : 4 * nch].reshape(nblocks, nch, 4).astype(np.int32)
    pred = ((hdr[:, :, 0] | (hdr[:, :, 1] << 8)) ^ 0x8000) - 0x8000
    index = np.clip(hdr[:, :, 2], 0, 88)
    body = buf[:, 4 * nch:]
    ngroups = body.shape[1] // (4 * nch)  # 4-byte groups per channel pass
    body = body[:, : ngroups * 4 * nch].reshape(nblocks, ngroups, nch, 4)
    # within each 4-byte group: low nibble of byte i is sample 2i,
    # high nibble is sample 2i+1
    nib = np.empty((nblocks, ngroups, nch, 8), np.uint8)
    nib[..., 0::2] = body & 0x0F
    nib[..., 1::2] = body >> 4
    nib = nib.transpose(0, 2, 1, 3).reshape(nblocks, nch, ngroups * 8)
    t_total = ngroups * 8
    out = np.empty((nblocks, nch, 1 + t_total), np.int32)
    out[:, :, 0] = pred
    for t in range(t_total):
        n = nib[:, :, t].astype(np.int32)
        step = _IMA_STEPS[index]
        diff = ((step >> 3)
                + np.where(n & 1, step >> 2, 0)
                + np.where(n & 2, step >> 1, 0)
                + np.where(n & 4, step, 0))
        pred = np.clip(pred + np.where(n & 8, -diff, diff), -32768, 32767)
        index = np.clip(index + _IMA_INDEX[n & 7], 0, 88)
        out[:, :, t + 1] = pred
    # interleave channels: (block, sample, channel) → flat frame stream
    return out.transpose(0, 2, 1).reshape(-1)


def _decode_ms_adpcm(raw: bytes, nch: int, block_align: int,
                     fmt: bytes) -> np.ndarray:
    """MS ADPCM WAV data chunk → interleaved int32 samples.  Same
    vectorization shape as the IMA path (parallel across blocks and
    channels, sequential only within a block)."""
    coefs = _MS_COEFS
    if len(fmt) >= 22:  # extension: wSamplesPerBlock, wNumCoef, pairs
        ncoef = int.from_bytes(fmt[20:22], "little")
        if ncoef and len(fmt) >= 22 + 4 * ncoef:
            c = np.frombuffer(fmt[22: 22 + 4 * ncoef], "<i2")
            coefs = c.reshape(ncoef, 2).astype(np.int32)
    nblocks = len(raw) // block_align
    if nblocks == 0:
        return np.empty(0, np.int32)
    buf = np.frombuffer(raw[: nblocks * block_align], np.uint8)
    buf = buf.reshape(nblocks, block_align)
    bpred = np.minimum(buf[:, :nch].astype(np.int32), len(coefs) - 1)
    c1 = coefs[bpred, 0]
    c2 = coefs[bpred, 1]

    def s16(col0):  # nch little-endian int16s starting at byte col0
        b = buf[:, col0: col0 + 2 * nch].reshape(nblocks, nch, 2)
        v = b[:, :, 0].astype(np.int32) | (b[:, :, 1].astype(np.int32) << 8)
        return (v ^ 0x8000) - 0x8000

    delta = s16(nch)
    s1 = s16(3 * nch)
    s2 = s16(5 * nch)
    body = buf[:, 7 * nch:]
    # high nibble first; nibble i (in stream order) belongs to channel i%nch
    seq = np.empty((nblocks, body.shape[1] * 2), np.uint8)
    seq[:, 0::2] = body >> 4
    seq[:, 1::2] = body & 0x0F
    t_total = seq.shape[1] // nch
    nib = seq[:, : t_total * nch].reshape(nblocks, t_total, nch)
    nib = nib.transpose(0, 2, 1)  # (block, channel, sample)
    out = np.empty((nblocks, nch, 2 + t_total), np.int32)
    out[:, :, 0] = s2
    out[:, :, 1] = s1
    for t in range(t_total):
        n = nib[:, :, t].astype(np.int32)
        sn = n - ((n & 8) << 1)  # sign-extend the 4-bit code
        acc = s1 * c1 + s2 * c2
        predv = np.where(acc >= 0, acc >> 8, -((-acc) >> 8))  # C trunc /256
        predv = np.clip(predv + sn * delta, -32768, 32767)
        s2, s1 = s1, predv
        delta = np.maximum(16, (_MS_ADAPT[n] * delta) >> 8)
        out[:, :, t + 2] = predv
    return out.transpose(0, 2, 1).reshape(-1)


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE → (sample_rate, mono int32 samples in int16 range).
    PCM 8/16/24/32-bit int, 32-bit IEEE float, G.711 A-law/mu-law, and
    the two standard 4-bit ADPCM families (IMA/DVI format 17, MS
    format 2, both vectorized across blocks); multi-channel input is
    downmixed by mean.  Chunk walk honors word alignment, so extra
    chunks (LIST/cue) are skipped correctly; ``fact`` trims ADPCM
    block padding to the true frame count."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, raw, fact_frames = 12, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        elif cid == b"fact" and size >= 4:  # total frames (ADPCM blocks pad)
            fact_frames = int.from_bytes(body[0:4], "little")
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
    elif audio_format == 6 and bits == 8:  # G.711 A-law (telephony)
        samples = _alaw_expand(raw)
    elif audio_format == 7 and bits == 8:  # G.711 mu-law (telephony)
        samples = _mulaw_expand(raw)
    elif audio_format == 17 and bits == 4:  # IMA/DVI ADPCM
        block_align = int.from_bytes(fmt[12:14], "little")
        if block_align < 4 * n_channels + 4:
            raise ValueError("IMA ADPCM block_align too small")
        samples = _decode_ima_adpcm(raw, n_channels, block_align)
    elif audio_format == 2 and bits == 4:  # MS ADPCM
        block_align = int.from_bytes(fmt[12:14], "little")
        if block_align < 7 * n_channels + 1:
            raise ValueError("MS ADPCM block_align too small")
        samples = _decode_ms_adpcm(raw, n_channels, block_align, fmt)
    else:
        raise NotImplementedError(
            f"WAV format {audio_format}/{bits}-bit unsupported (compressed "
            "audio like MP3/AAC requires ffmpeg — unavailable here)"
        )
    if fact_frames is not None and audio_format in (2, 17):
        samples = samples[: fact_frames * n_channels]
    return sample_rate, _downmix(samples, n_channels)


def _read_extended80(b: bytes) -> float:
    """IEEE 754 80-bit extended float (big-endian) — the AIFF COMM
    sampleRate encoding.  sign/15-bit exponent/64-bit mantissa with an
    explicit integer bit; common rates are exact."""
    se = int.from_bytes(b[0:2], "big")
    mant = int.from_bytes(b[2:10], "big")
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    sign = -1.0 if se & 0x8000 else 1.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def parse_aiff(data: bytes) -> dict:
    """AIFF / AIFF-C header walk → {channels, n_frames, bits,
    sample_rate, compression, ssnd} — big-endian IFF chunks; ssnd is
    the (offset, length) of the sample bytes inside ``data``."""
    if data[:4] != b"FORM" or data[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF/AIFF-C payload")
    pos, comm, ssnd = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "big")
        if cid == b"COMM":
            comm = data[pos + 8 : pos + 8 + size]
        elif cid == b"SSND" and size >= 8:
            off = int.from_bytes(data[pos + 8 : pos + 12], "big")
            ssnd = (pos + 16 + off, size - 8 - off)
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if comm is None or len(comm) < 18:
        raise ValueError("AIFF missing COMM chunk")
    comp = b"NONE"
    if data[8:12] == b"AIFC" and len(comm) >= 22:
        comp = comm[18:22]
    return {
        "channels": max(1, int.from_bytes(comm[0:2], "big")),
        "n_frames": int.from_bytes(comm[2:6], "big"),
        "bits": int.from_bytes(comm[6:8], "big"),
        "sample_rate": int(round(_read_extended80(comm[8:18]))),
        "compression": comp.decode("latin-1"),
        "ssnd": ssnd,
    }


def decode_aiff(data: bytes) -> tuple[int, np.ndarray]:
    """AIFF/AIFF-C → (sample_rate, mono int32 samples in int16 range),
    the :func:`decode_wav` convention.  PCM 8/16/24/32-bit big-endian
    (AIFF 8-bit is SIGNED, unlike WAV), AIFF-C 'sowt' (little-endian
    16-bit) and G.711 'ulaw'/'alaw'."""
    m = parse_aiff(data)
    if m["ssnd"] is None:
        raise ValueError("AIFF missing SSND chunk")
    off, length = m["ssnd"]
    raw = data[off : off + length]
    comp, bits = m["compression"].strip().lower(), m["bits"]
    if comp in ("ulaw", "\xb5law"):  # 'ULAW'/'ulaw' / Apple 'µlaw'
        samples = _mulaw_expand(raw)
    elif comp == "alaw":
        samples = _alaw_expand(raw)
    elif comp == "sowt" and bits == 16:
        samples = np.frombuffer(raw[: len(raw) // 2 * 2], "<i2").astype(np.int32)
    elif comp in ("none", ""):
        if bits == 8:
            samples = np.frombuffer(raw, np.int8).astype(np.int32) << 8
        elif bits == 16:
            samples = np.frombuffer(raw[: len(raw) // 2 * 2], ">i2").astype(np.int32)
        elif bits == 24:
            b = np.frombuffer(raw, np.uint8)
            n = len(b) // 3
            b = b[: n * 3].reshape(n, 3).astype(np.int32)
            s = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
            samples = ((s ^ 0x800000) - 0x800000) >> 8
        elif bits == 32:
            samples = (np.frombuffer(raw[: len(raw) // 4 * 4], ">i4") >> 16
                       ).astype(np.int32)
        else:
            raise NotImplementedError(f"{bits}-bit AIFF PCM unsupported")
    else:
        raise NotImplementedError(
            f"AIFF-C compression {m['compression']!r} unsupported "
            "(PCM/sowt/ulaw/alaw decode natively; others need ffmpeg)"
        )
    return m["sample_rate"], _downmix(samples, m["channels"])


# Sun/NeXT audio (.au/.snd) encoding ids — the public Sun audio file
# format header (also RFC 1890's audio/basic is encoding 1 at 8 kHz)
_AU_ENCODINGS = {1: "ulaw", 2: "s8", 3: "s16", 4: "s24", 5: "s32",
                 6: "f32", 7: "f64", 27: "alaw"}


def parse_au(data: bytes) -> dict:
    """Sun/NeXT .au header → {encoding, sample_rate, channels,
    data_offset, data_size} (all header fields big-endian)."""
    if data[:4] != b".snd" or len(data) < 24:
        raise ValueError("not a Sun/NeXT audio payload")
    off = int.from_bytes(data[4:8], "big")
    size = int.from_bytes(data[8:12], "big")
    enc = int.from_bytes(data[12:16], "big")
    avail = max(0, len(data) - off)
    return {
        "encoding": enc,
        "encoding_name": _AU_ENCODINGS.get(enc),
        "sample_rate": int.from_bytes(data[16:20], "big"),
        "channels": max(1, int.from_bytes(data[20:24], "big")),
        "data_offset": off,
        "data_size": avail if size == 0xFFFFFFFF else min(size, avail),
    }


def decode_au(data: bytes) -> tuple[int, np.ndarray]:
    """Sun/NeXT .au → (sample_rate, mono int32 in int16 range):
    G.711 mu-law/A-law and linear PCM 8/16/24/32-bit + float 32/64
    (big-endian, per the format)."""
    m = parse_au(data)
    raw = data[m["data_offset"] : m["data_offset"] + m["data_size"]]
    enc = m["encoding"]
    if enc == 1:
        samples = _mulaw_expand(raw)
    elif enc == 27:
        samples = _alaw_expand(raw)
    elif enc == 2:
        samples = np.frombuffer(raw, np.int8).astype(np.int32) << 8
    elif enc == 3:
        samples = np.frombuffer(raw[: len(raw) // 2 * 2], ">i2").astype(np.int32)
    elif enc == 4:
        b = np.frombuffer(raw, np.uint8)
        n = len(b) // 3
        b = b[: n * 3].reshape(n, 3).astype(np.int32)
        s = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
        samples = ((s ^ 0x800000) - 0x800000) >> 8
    elif enc == 5:
        samples = (np.frombuffer(raw[: len(raw) // 4 * 4], ">i4") >> 16
                   ).astype(np.int32)
    elif enc in (6, 7):
        dt = ">f4" if enc == 6 else ">f8"
        w = 4 if enc == 6 else 8
        f = np.clip(np.frombuffer(raw[: len(raw) // w * w], dt), -1.0, 1.0)
        samples = np.round(f * 32767).astype(np.int32)
    else:
        raise NotImplementedError(
            f".au encoding {enc} unsupported (G.711/PCM/float natively; "
            "compressed encodings need ffmpeg)"
        )
    return m["sample_rate"], _downmix(samples, m["channels"])


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


# ------------------------------------------------------------------ FLAC
#
# Free Lossless Audio Codec (the public xiph.org spec / RFC 9639):
# fully algorithmic — rice-coded residuals over fixed or LPC
# predictors, no codebook tables — so a dependency-free decoder is
# EXACT (lossless: a decode is bit-for-bit the original PCM, which
# makes every test a strict equality).  Covers the second-most-common
# lossless audio payload of real corpora after WAV.


class _FlacBits:
    """MSB-first bit reader (the FLAC bit order, opposite of GIF)."""

    __slots__ = ("buf", "pos", "n", "acc", "nbits")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf, self.pos, self.n = buf, pos, len(buf)
        self.acc, self.nbits = 0, 0

    def read(self, nbits: int) -> int:
        while self.nbits < nbits:
            if self.pos >= self.n:
                raise EOFError("FLAC bitstream exhausted")
            self.acc = (self.acc << 8) | self.buf[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= nbits
        v = (self.acc >> self.nbits) & ((1 << nbits) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.nbits -= self.nbits % 8
        self.acc &= (1 << self.nbits) - 1

    def byte_pos(self) -> int:
        return self.pos - self.nbits // 8


def parse_flac(data: bytes) -> dict:
    """STREAMINFO walk → {sample_rate, channels, bits_per_sample,
    total_samples, duration_ms, min/max_block_size, md5,
    frames_offset}.  Header-only: no frame decode."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos, info = 4, None
    while pos + 4 <= len(data):
        hdr = data[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + size]
        if btype == 0:  # STREAMINFO
            info = body
        pos += 4 + size
        if last:
            break
    if info is None or len(info) < 34:
        raise ValueError("FLAC missing STREAMINFO")
    sr = (info[10] << 12) | (info[11] << 4) | (info[12] >> 4)
    nch = ((info[12] >> 1) & 0x07) + 1
    bps = (((info[12] & 1) << 4) | (info[13] >> 4)) + 1
    total = ((info[13] & 0x0F) << 32) | int.from_bytes(info[14:18], "big")
    return {
        "sample_rate": sr,
        "channels": nch,
        "bits_per_sample": bps,
        "total_samples": total,
        "duration_ms": round(total * 1000 / sr) if sr and total else None,
        "min_block_size": int.from_bytes(info[0:2], "big"),
        "max_block_size": int.from_bytes(info[2:4], "big"),
        "md5": info[18:34],
        "frames_offset": pos,
    }


# frame-header lookup tables (RFC 9639 §9.1)
_FLAC_BLOCK = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
               8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
               13: 8192, 14: 16384, 15: 32768}
_FLAC_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_FLAC_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
# fixed-predictor coefficients by order (RFC 9639 §10.2.2)
_FLAC_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _flac_utf8_number(bits: _FlacBits) -> int:
    """The frame number's extended-UTF-8 coded integer (§9.1.5)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x40
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 1 or nbytes > 6:
        raise ValueError("bad FLAC frame-number coding")
    v = b0 & (mask - 1)
    for _ in range(nbytes):
        c = bits.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("bad FLAC frame-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _flac_residual(bits: _FlacBits, block_size: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = bits.read(4)
    if block_size % (1 << porder):
        raise ValueError("FLAC partition order does not divide block size")
    out = []
    for p in range(1 << porder):
        count = (block_size >> porder) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        k = bits.read(pbits)
        if k == escape:
            raw = bits.read(5)
            out.extend(
                bits.read_signed(raw) if raw else 0 for _ in range(count)
            )
        else:
            for _ in range(count):
                q = bits.unary()
                v = (q << k) | bits.read(k)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _flac_subframe(bits: _FlacBits, block_size: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):  # wasted-bits-per-sample flag: unary count - 1
        wasted = bits.unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        out = np.full(block_size, bits.read_signed(bps), np.int64)
    elif stype == 1:  # VERBATIM
        out = np.fromiter(
            (bits.read_signed(bps) for _ in range(block_size)),
            np.int64, block_size)
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        warm = [bits.read_signed(bps) for _ in range(order)]
        res = _flac_residual(bits, block_size, order)
        coefs = _FLAC_FIXED[order]
        samples = list(warm)
        for r in res:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(pred + r)
        out = np.array(samples, np.int64)
    elif stype >= 32:  # LPC, order = stype - 31
        order = stype - 31
        warm = [bits.read_signed(bps) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        res = _flac_residual(bits, block_size, order)
        samples = list(warm)
        for r in res:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append((pred >> shift) + r)
        out = np.array(samples, np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    return out << wasted if wasted else out


def decode_flac_pcm(data: bytes, max_frames: int | None = None
                    ) -> tuple[int, int, np.ndarray]:
    """FLAC → (sample_rate, channels, (n, channels) int32 PCM at the
    stream's native bit depth).  Exact: frames walk STREAMINFO's
    declared layout, subframes cover CONSTANT/VERBATIM/FIXED/LPC with
    wasted bits, and all four channel assignments (independent,
    left/side, right/side, mid/side) are undone in integer math."""
    meta = parse_flac(data)
    sr0, nch, bps0 = meta["sample_rate"], meta["channels"], meta["bits_per_sample"]
    bits = _FlacBits(data, meta["frames_offset"])
    chunks = []
    n_frames = 0
    while bits.byte_pos() < bits.n:
        try:
            sync = bits.read(14)
        except EOFError:
            break
        if sync != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        bps_code = bits.read(3)
        bits.read(1)  # reserved
        _flac_utf8_number(bits)
        if bs_code == 6:
            block_size = bits.read(8) + 1
        elif bs_code == 7:
            block_size = bits.read(16) + 1
        elif bs_code in _FLAC_BLOCK:
            block_size = _FLAC_BLOCK[bs_code]
        else:
            raise ValueError("reserved FLAC block-size code")
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample-rate code")
        bps = _FLAC_BPS.get(bps_code, bps0)
        bits.read(8)  # header CRC-8 (not verified)
        if ch_code < 8:
            if ch_code + 1 != nch:
                raise ValueError("FLAC frame channel count != STREAMINFO")
            chans = [_flac_subframe(bits, block_size, bps)
                     for _ in range(nch)]
        elif ch_code in (8, 9, 10):  # stereo decorrelation; side has +1 bit
            if nch != 2:
                raise ValueError("decorrelated FLAC frame in non-stereo stream")
            if ch_code == 8:  # left/side
                left = _flac_subframe(bits, block_size, bps)
                side = _flac_subframe(bits, block_size, bps + 1)
                chans = [left, left - side]
            elif ch_code == 9:  # right/side
                side = _flac_subframe(bits, block_size, bps + 1)
                right = _flac_subframe(bits, block_size, bps)
                chans = [right + side, right]
            else:  # mid/side
                mid = _flac_subframe(bits, block_size, bps)
                side = _flac_subframe(bits, block_size, bps + 1)
                m2 = (mid << 1) | (side & 1)
                chans = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("reserved FLAC channel assignment")
        bits.align()
        bits.read(16)  # frame CRC-16 (not verified)
        chunks.append(np.stack(chans, axis=1))
        n_frames += 1
        if max_frames is not None and n_frames >= max_frames:
            break
    if not chunks:
        raise ValueError("FLAC stream has no frames")
    pcm = np.concatenate(chunks).astype(np.int64)
    if meta["total_samples"]:
        pcm = pcm[: meta["total_samples"]]
    return sr0, nch, pcm.astype(np.int32)


def decode_flac(data: bytes) -> tuple[int, np.ndarray]:
    """FLAC → (sample_rate, mono int32 samples in int16 range) — the
    same convention as :func:`decode_wav` (multi-channel downmixed by
    mean, other bit depths scaled to 16-bit)."""
    sr, _nch, pcm = decode_flac_pcm(data)
    bps = parse_flac(data)["bits_per_sample"]
    mono = pcm.astype(np.float64).mean(axis=1)
    if bps > 16:
        mono = mono / (1 << (bps - 16))
    elif bps < 16:
        mono = mono * (1 << (16 - bps))
    return sr, np.round(mono).astype(np.int32)


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


# ------------------------------------------------------------ MPEG audio (MP3)
#
# Frame-level parsing of MPEG-1/2/2.5 audio streams (ISO/IEC 11172-3 /
# 13818-3 headers): sync walk, bitrate/samplerate tables, Xing/Info and
# VBRI VBR tags, ID3v2 skip — duration / bitrate / channel metadata and
# a frame index over real MP3 corpora.  PCM decode of MPEG-1 Layer III
# is in mp3dec.py (the ISO constant tables are transcribed from the
# public standard and mechanically verified — see its docstring).

_MP3_BITRATE = {
    # (version_group, layer) -> kbps by bitrate index 1..14 (0=free, 15=bad)
    # version_group: 1 = MPEG-1, 2 = MPEG-2/2.5 (they share tables)
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

_MP3_SAMPLERATE = {
    # version field (2 bits) -> rates by samplerate index 0..2
    3: [44100, 48000, 32000],   # MPEG-1
    2: [22050, 24000, 16000],   # MPEG-2
    0: [11025, 12000, 8000],    # MPEG-2.5
}


def _mp3_frame_at(data: bytes, pos: int):
    """Parse a frame header at ``pos``; returns dict or None if the 4
    bytes there are not a valid header."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 3          # 0=2.5, 1=reserved, 2=MPEG-2, 3=MPEG-1
    layer_bits = (b1 >> 1) & 3       # 3=I, 2=II, 1=III, 0=reserved
    if version == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits           # 1, 2, 3
    bitrate_idx = (b2 >> 4) & 0x0F
    sr_idx = (b2 >> 2) & 3
    if bitrate_idx in (0, 15) or sr_idx == 3:
        return None                  # free-format unsupported, bad = invalid
    vgroup = 1 if version == 3 else 2
    bitrate = _MP3_BITRATE[(vgroup, layer)][bitrate_idx - 1] * 1000
    sample_rate = _MP3_SAMPLERATE[version][sr_idx]
    padding = (b2 >> 1) & 1
    mode = (b3 >> 6) & 3             # 0=stereo 1=joint 2=dual 3=mono
    if layer == 1:
        samples = 384
        size = (12 * bitrate // sample_rate + padding) * 4
    elif layer == 2:
        samples = 1152
        size = 144 * bitrate // sample_rate + padding
    else:  # Layer III
        samples = 1152 if vgroup == 1 else 576
        per = 144 if vgroup == 1 else 72
        size = per * bitrate // sample_rate + padding
    return {
        "version": {3: "MPEG-1", 2: "MPEG-2", 0: "MPEG-2.5"}[version],
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": sample_rate,
        "channels": 1 if mode == 3 else 2,
        "mode": mode,
        "crc": (b1 & 1) == 0,
        "samples": samples,
        "size": size,
        "offset": pos,
    }


def _skip_id3v2(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    # syncsafe 28-bit size, header excluded; footer adds 10 more
    size = ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
    return 10 + size + (10 if data[5] & 0x10 else 0)


def parse_mp3(data: bytes, max_frames: int | None = None) -> dict:
    """Walk every MPEG audio frame: returns stream metadata
    {format, layer, sample_rate, channels, n_frames, duration_ms,
    bitrate_avg, vbr, frames: [(offset, size, samples)]}.  Honors ID3v2
    prefix, Xing/Info and VBRI VBR tags (the tag frame is counted by
    its own header but flagged), resyncs over garbage between frames.
    ``max_frames`` bounds the walk for probe-only use."""
    pos = _skip_id3v2(data)
    frames = []
    meta = None
    vbr = None
    n = len(data)
    while pos + 4 <= n:
        f = _mp3_frame_at(data, pos)
        if f is None:
            pos += 1  # resync byte-by-byte (broadcast-stream behavior)
            continue
        if meta is None:
            meta = f
            # Xing/Info (LAME) sits after the side info of frame 0;
            # VBRI always at header+36 (Fraunhofer)
            if f["version"] == "MPEG-1":
                side = 17 if f["channels"] == 1 else 32
            else:
                side = 9 if f["channels"] == 1 else 17
            tag_off = pos + 4 + (2 if f["crc"] else 0) + side
            tag = data[tag_off : tag_off + 4]
            if tag in (b"Xing", b"Info"):
                flags = int.from_bytes(data[tag_off + 4 : tag_off + 8], "big")
                p = tag_off + 8
                vbr = {"tag": tag.decode(), "vbr": tag == b"Xing"}
                if flags & 1:
                    vbr["frames"] = int.from_bytes(data[p : p + 4], "big")
                    p += 4
                if flags & 2:
                    vbr["bytes"] = int.from_bytes(data[p : p + 4], "big")
            elif data[pos + 4 + 32 : pos + 4 + 36] == b"VBRI":
                p = pos + 4 + 36
                vbr = {
                    "tag": "VBRI", "vbr": True,
                    "bytes": int.from_bytes(data[p + 6 : p + 10], "big"),
                    "frames": int.from_bytes(data[p + 10 : p + 14], "big"),
                }
        frames.append((f["offset"], f["size"], f["samples"], f["bitrate"]))
        pos += max(f["size"], 4)
        if max_frames is not None and len(frames) >= max_frames:
            break
    if meta is None:
        raise ValueError("no MPEG audio frame found")
    # skip the VBR tag frame in the duration math (it carries no audio)
    audio = frames[1:] if vbr is not None and len(frames) > 1 else frames
    total_samples = sum(s for (_o, _sz, s, _b) in audio)
    duration_ms = round(total_samples * 1000 / meta["sample_rate"])
    total_bytes = sum(sz for (_o, sz, _s, _b) in audio)
    bitrates = {b for (_o, _sz, _s, b) in audio}
    return {
        "format": meta["version"],
        "layer": meta["layer"],
        "sample_rate": meta["sample_rate"],
        "channels": meta["channels"],
        "n_frames": len(audio),
        "duration_ms": duration_ms,
        "bitrate_avg": (
            round(total_bytes * 8 * meta["sample_rate"]
                  / max(1, total_samples))
            if audio else meta["bitrate"]
        ),
        "vbr": (vbr["vbr"] if vbr is not None else len(bitrates) > 1),
        "frames": [(o, sz, s) for (o, sz, s, _b) in frames],
    }


def decode_mp3(data: bytes, stats: dict | None = None
               ) -> tuple[int, np.ndarray]:
    """MPEG-1 Layer III → (sample_rate, mono int32 samples in int16
    range) — the same convention as :func:`decode_wav`.  Full PCM
    decode lives in mp3dec.py (side info, scalefactors, Huffman,
    requantize, stereo, alias reduction, IMDCT, polyphase synthesis);
    see its docstring for the transcription-verification policy on the
    ISO constant tables and the r9 per-granule degradation of
    unshipped Huffman tables (``stats`` passes through to the
    degradation ledger).  MPEG-2/2.5 LSF and Layer II raise
    NotImplementedError; frame-level metadata for those remains
    available via :func:`parse_mp3`."""
    from hbase_snapshot_spark.operators import mp3dec

    return mp3dec.decode_mp3_mono(data, stats=stats)


# ------------------------------------------------------------ AAC / ADTS
#
# ISO/IEC 13818-7 / 14496-3 ADTS transport: fixed+variable header walk
# (profile, sampling-frequency index, channel configuration, frame
# length, raw-data-block count), byte-resync over garbage — the audio
# sibling of parse_mp3, so probe_media yields real metadata for the
# second-most-common audio payload of a real corpus instead of
# format=None.
#
# AAC spectral decode: VERIFIED ABSENT (r9 disposition under the
# mp3dec transcription-verification policy).  The payload needs the 11
# ISO 13818-7 Annex A spectrum codebooks (plus the 121-entry
# scalefactor codebook); this container has no copy of the standard
# and no reference decoder, and an unaided transcription of
# multi-hundred-entry Huffman tables cannot be distinguished from a
# PERMUTED but Kraft-valid one — it would pass the mechanical
# completeness/prefix checks and still silently corrupt PCM (the same
# conclusion as mp3dec's big-values tables 10-31, which ARE
# re-attempted and documented there).  So the honest tier is: full
# ADTS transport walk (below) + probe_media metadata; spectral decode
# raises NotImplementedError naming the Annex A codebooks.  H.264/HEVC
# pixels are out of dependency-free scope the same way.
#
# r10: the two-transcription protocol reached the same terminal state
# as mp3dec's (see mp3dec module docstring) — no Annex A transcription
# could be produced at per-entry confidence, and same-memory
# transcriptions are correlated, so their agreement proves nothing.
# tests/test_codec_crossval.py is the activation path if an
# independent decoder ever lands.

_ADTS_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000, 7350)
_ADTS_PROFILES = ("Main", "LC", "SSR", "LTP")


def _adts_frame_at(data: bytes, pos: int):
    if pos + 7 > len(data):
        return None
    b = data[pos : pos + 7]
    if b[0] != 0xFF or (b[1] & 0xF6) != 0xF0:
        return None  # syncword 0xFFF + layer must be 00
    sf_idx = (b[2] >> 2) & 0x0F
    if sf_idx >= len(_ADTS_RATES):
        return None
    size = ((b[3] & 0x03) << 11) | (b[4] << 3) | (b[5] >> 5)
    if size < 7:
        return None
    crc_absent = b[1] & 1
    if not crc_absent and size < 9:
        return None
    return {
        "mpeg_version": 2 if (b[1] & 0x08) else 4,
        "profile": _ADTS_PROFILES[(b[2] >> 6) & 3],
        "sample_rate": _ADTS_RATES[sf_idx],
        "channels": ((b[2] & 1) << 2) | (b[3] >> 6),
        "crc": not crc_absent,
        "n_blocks": (b[6] & 0x03) + 1,  # raw_data_blocks + 1
        "size": size,
        "offset": pos,
    }


def parse_adts(data: bytes, max_frames: int | None = None) -> dict:
    """Walk ADTS frames → {format, profile, sample_rate, channels,
    n_frames, duration_ms, bitrate_avg, frames: [(offset, size,
    samples)]}.  Each raw data block is 1024 samples; resyncs
    byte-by-byte over garbage like the MP3 walk."""
    pos = _skip_id3v2(data)
    frames = []
    meta = None
    n = len(data)
    while pos + 7 <= n:
        f = _adts_frame_at(data, pos)
        if f is None:
            pos += 1
            continue
        if meta is None:
            meta = f
        frames.append((f["offset"], f["size"], 1024 * f["n_blocks"]))
        pos += f["size"]
        if max_frames is not None and len(frames) >= max_frames:
            break
    if meta is None:
        raise ValueError("no ADTS frame found")
    total_samples = sum(s for (_o, _sz, s) in frames)
    total_bytes = sum(sz for (_o, sz, _s) in frames)
    return {
        "format": f"MPEG-{meta['mpeg_version']}",
        "profile": meta["profile"],
        "sample_rate": meta["sample_rate"],
        "channels": meta["channels"],
        "n_frames": len(frames),
        "duration_ms": round(total_samples * 1000 / meta["sample_rate"]),
        "bitrate_avg": round(total_bytes * 8 * meta["sample_rate"]
                             / max(1, total_samples)),
        "frames": frames,
    }


# ------------------------------------------------------- MP4 / ISO-BMFF
#
# Dependency-free ISO/IEC 14496-12 box parsing: track headers, sample
# tables (stts/stss/stsc/stsz/stco/co64), and a derived per-sample
# index (offset, size, decode time, keyframe flag) — the container
# layer a frame sampler needs.  Codec payload decode (H.264/HEVC/AAC)
# stays behind NotImplementedError; keyframe EXTRACTION (the coded
# access-unit bytes at the right offsets) is real.

def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in [start, end).
    Handles 64-bit largesize and size==0 (extends to end)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            break  # malformed/truncated: stop rather than loop
        yield btype, body, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, *path: bytes):
    for btype, b, e in _iter_boxes(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return b, e
            return _find_box(data, b, e, *path[1:])
    return None


def _full_box(data: bytes, pos: int) -> tuple[int, int, int]:
    """version, flags, first payload offset"""
    return data[pos], int.from_bytes(data[pos + 1 : pos + 4], "big"), pos + 4


def _u32s(data: bytes, pos: int, n: int):
    import struct

    return struct.unpack_from(f">{n}I", data, pos)


def parse_mp4(data: bytes) -> dict:
    """ISO-BMFF structure → {brand, timescale, duration_ms, tracks}.
    Each track: {track_id, handler, codec, width, height, timescale,
    duration_ms, n_samples, samples: [(offset, size, time, keyframe)]}
    with time in the TRACK timescale.  Fragmented files (moof) raise
    NotImplementedError — the sample tables live in the fragments."""
    if data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload")
    brand = data[8:12].decode("latin-1")
    moov = _find_box(data, 0, len(data), b"moov")
    if moov is None:
        if _find_box(data, 0, len(data), b"moof") is not None:
            raise NotImplementedError(
                "fragmented MP4 (moof) unsupported — sample tables live "
                "in the fragments"
            )
        raise ValueError("MP4 missing moov box")
    ms, me = moov
    out = {"brand": brand, "timescale": None, "duration_ms": None,
           "tracks": []}
    mvhd = _find_box(data, ms, me, b"mvhd")
    if mvhd is not None:
        v, _fl, p = _full_box(data, mvhd[0])
        if v == 1:
            ts = int.from_bytes(data[p + 16 : p + 20], "big")
            dur = int.from_bytes(data[p + 20 : p + 28], "big")
        else:
            ts = int.from_bytes(data[p + 8 : p + 12], "big")
            dur = int.from_bytes(data[p + 12 : p + 16], "big")
        out["timescale"] = ts
        out["duration_ms"] = round(dur * 1000 / ts) if ts else None
    for btype, b, e in _iter_boxes(data, ms, me):
        if btype == b"trak":
            out["tracks"].append(_parse_trak(data, b, e))
    return out


def _parse_trak(data: bytes, start: int, end: int) -> dict:
    t: dict = {"track_id": None, "handler": None, "codec": None,
               "width": None, "height": None, "timescale": None,
               "duration_ms": None, "n_samples": 0, "samples": []}
    tkhd = _find_box(data, start, end, b"tkhd")
    if tkhd is not None:
        v, _fl, p = _full_box(data, tkhd[0])
        if v == 1:
            t["track_id"] = int.from_bytes(data[p + 16 : p + 20], "big")
            # times(8+8) id(4) reserved(4) duration(8) reserved(8)
            # layer+alt+volume+reserved(2*4) matrix(36) → width at +84
            p_dim = p + 84
        else:
            # times(4+4) id(4) reserved(4) duration(4) reserved(8)
            # layer+alt+volume+reserved(2*4) matrix(36) → width at +72
            t["track_id"] = int.from_bytes(data[p + 8 : p + 12], "big")
            p_dim = p + 72
        # width/height are 16.16 fixed point at the end of tkhd
        t["width"] = int.from_bytes(data[p_dim : p_dim + 4], "big") >> 16
        t["height"] = int.from_bytes(data[p_dim + 4 : p_dim + 8], "big") >> 16
    mdia = _find_box(data, start, end, b"mdia")
    if mdia is None:
        return t
    mdhd = _find_box(data, mdia[0], mdia[1], b"mdhd")
    if mdhd is not None:
        v, _fl, p = _full_box(data, mdhd[0])
        if v == 1:
            ts = int.from_bytes(data[p + 16 : p + 20], "big")
            dur = int.from_bytes(data[p + 20 : p + 28], "big")
        else:
            ts = int.from_bytes(data[p + 8 : p + 12], "big")
            dur = int.from_bytes(data[p + 12 : p + 16], "big")
        t["timescale"] = ts
        t["duration_ms"] = round(dur * 1000 / ts) if ts else None
    hdlr = _find_box(data, mdia[0], mdia[1], b"hdlr")
    if hdlr is not None:
        _v, _fl, p = _full_box(data, hdlr[0])
        t["handler"] = data[p + 4 : p + 8].decode("latin-1")
    stbl = _find_box(data, mdia[0], mdia[1], b"minf", b"stbl")
    if stbl is None:
        return t
    sb, se = stbl
    stsd = _find_box(data, sb, se, b"stsd")
    if stsd is not None:
        _v, _fl, p = _full_box(data, stsd[0])
        n_entries = int.from_bytes(data[p : p + 4], "big")
        if n_entries:
            t["codec"] = data[p + 8 : p + 12].decode("latin-1")

    def table(name: bytes):
        box = _find_box(data, sb, se, name)
        if box is None:
            return None
        _v, _fl, p = _full_box(data, box[0])
        return p

    # decode times (stts) expanded per sample
    times = []
    p = table(b"stts")
    if p is not None:
        (cnt,) = _u32s(data, p, 1)
        tcur = 0
        q = p + 4
        for _ in range(cnt):
            scount, sdelta = _u32s(data, q, 2)
            for _i in range(scount):
                times.append(tcur)
                tcur += sdelta
            q += 8
    # sizes (stsz)
    sizes = []
    p = table(b"stsz")
    if p is not None:
        fixed, cnt = _u32s(data, p, 2)
        sizes = [fixed] * cnt if fixed else list(_u32s(data, p + 8, cnt))
    # keyframes (stss); absent stss = every sample is a sync sample
    p = table(b"stss")
    if p is not None:
        (cnt,) = _u32s(data, p, 1)
        sync = set(_u32s(data, p + 4, cnt))  # 1-based sample numbers
    else:
        sync = None
    # chunk offsets (stco / co64)
    offsets = []
    p = table(b"stco")
    if p is not None:
        (cnt,) = _u32s(data, p, 1)
        offsets = list(_u32s(data, p + 4, cnt))
    else:
        box = _find_box(data, sb, se, b"co64")
        if box is not None:
            _v, _fl, p = _full_box(data, box[0])
            (cnt,) = _u32s(data, p, 1)
            import struct

            offsets = list(struct.unpack_from(f">{cnt}Q", data, p + 4))
    # sample→chunk (stsc): runs of (first_chunk, samples_per_chunk, _)
    runs = []
    p = table(b"stsc")
    if p is not None:
        (cnt,) = _u32s(data, p, 1)
        q = p + 4
        for _ in range(cnt):
            first, per, _desc = _u32s(data, q, 3)
            runs.append((first, per))
            q += 12
    samples = []
    si = 0
    for ci, chunk_off in enumerate(offsets, start=1):
        per = 0
        for first, n in runs:
            if first <= ci:
                per = n
            else:
                break
        off = chunk_off
        for _ in range(per):
            if si >= len(sizes):
                break
            samples.append((
                off,
                sizes[si],
                times[si] if si < len(times) else 0,
                (si + 1 in sync) if sync is not None else True,
            ))
            off += sizes[si]
            si += 1
    t["n_samples"] = len(samples)
    t["samples"] = samples
    return t


def mp4_keyframe_index(data: bytes) -> list:
    """Keyframe index of the FIRST video track:
    [(sample_idx, time_ms, offset, size)] — the container-level seek
    index a frame sampler binds to (nearest preceding keyframe per
    sample instant)."""
    info = parse_mp4(data)
    for trk in info["tracks"]:
        if trk["handler"] == "vide" and trk["samples"]:
            ts = trk["timescale"] or 1
            return [
                (i, round(t * 1000 / ts), off, size)
                for i, (off, size, t, key) in enumerate(trk["samples"])
                if key
            ]
    return []


# ---------------------------------------------------------- Ogg container
#
# RFC 3533 Ogg page walk + the public codec ID headers (Vorbis I spec,
# RFC 7845 OpusHead, the FLAC-in-Ogg mapping, Theora VP3.2 ID header,
# Speex manual).  Header/metadata only — the triage layer of a corpus
# probe; codec payload decode is a separate concern.


def _ogg_pages(data: bytes):
    """Yield (header_type, granule, serial, body) per page; stops at
    the first malformed page (a probe prefers truncation to raising)."""
    pos = 0
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != b"OggS" or data[pos + 4] != 0:
            break
        htype = data[pos + 5]
        granule = int.from_bytes(data[pos + 6 : pos + 14], "little",
                                 signed=True)
        serial = int.from_bytes(data[pos + 14 : pos + 18], "little")
        nsegs = data[pos + 26]
        lacing = data[pos + 27 : pos + 27 + nsegs]
        if len(lacing) < nsegs:
            break
        body_len = sum(lacing)
        start = pos + 27 + nsegs
        if start + body_len > len(data):
            break
        yield htype, granule, serial, data[start : start + body_len]
        pos = start + body_len


def parse_ogg(data: bytes) -> dict:
    """Ogg walk → {codec, sample_rate, channels, duration_ms, width,
    height, n_pages, pre_skip}.  Codec identified from the first
    packet of each beginning-of-stream page; duration from the last
    granule position of the identified stream (PCM samples for
    Vorbis/FLAC, 48 kHz ticks minus pre-skip for Opus)."""
    if data[:4] != b"OggS":
        raise ValueError("not an Ogg payload")
    out = {"codec": None, "sample_rate": None, "channels": None,
           "duration_ms": None, "width": None, "height": None,
           "n_pages": 0, "pre_skip": 0}
    stream_serial = None
    last_granule = None
    for htype, granule, serial, body in _ogg_pages(data):
        out["n_pages"] += 1
        if htype & 0x02 and out["codec"] is None:  # beginning of stream
            if body[:7] == b"\x01vorbis" and len(body) >= 30:
                out.update(codec="vorbis", channels=body[11],
                           sample_rate=int.from_bytes(body[12:16], "little"))
                stream_serial = serial
            elif body[:8] == b"OpusHead" and len(body) >= 19:
                out.update(codec="opus", channels=body[9],
                           sample_rate=48000,  # Opus always decodes at 48k
                           pre_skip=int.from_bytes(body[10:12], "little"))
                stream_serial = serial
            elif body[:5] == b"\x7fFLAC" and len(body) >= 13:
                # mapping: magic, maj/min, nheaders, then a whole
                # fLaC + STREAMINFO stream — reuse the FLAC parser
                try:
                    si = parse_flac(body[9:])
                    out.update(codec="flac",
                               sample_rate=si["sample_rate"],
                               channels=si["channels"])
                    stream_serial = serial
                except ValueError:
                    pass
            elif body[:7] == b"\x80theora" and len(body) >= 26:
                out.update(
                    codec="theora",
                    width=int.from_bytes(body[14:17], "big"),
                    height=int.from_bytes(body[17:20], "big"))
                stream_serial = serial
            elif body[:8] == b"Speex   " and len(body) >= 56:
                out.update(codec="speex",
                           sample_rate=int.from_bytes(body[36:40], "little"),
                           channels=int.from_bytes(body[48:52], "little"))
                stream_serial = serial
        if serial == stream_serial and granule >= 0:
            last_granule = granule
    if last_granule is not None and out["sample_rate"]:
        ticks = last_granule - (out["pre_skip"] if out["codec"] == "opus"
                                else 0)
        out["duration_ms"] = max(0, round(ticks * 1000 / out["sample_rate"]))
    return out


# -------------------------------------------------- Matroska / WebM (EBML)
#
# EBML (RFC 8794) varint walk over the public Matroska element IDs —
# Info (timecode scale + duration) and Tracks (codec, dimensions,
# audio params).  Cluster payloads are skipped, not parsed: this is
# the probe layer.

_EBML_HEADER = 0x1A45DFA3
_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TRACKS = 0x1654AE6B


def _ebml_read(data: bytes, pos: int, keep_marker: bool):
    """Read one EBML varint at pos → (value, next_pos).  Element IDs
    keep the length-marker bits (the conventional 0x1A45DFA3 form);
    sizes strip them.  An all-ones size means 'unknown' → None."""
    if pos >= len(data):
        raise ValueError("EBML truncated")
    b0 = data[pos]
    if b0 == 0:
        raise ValueError("bad EBML varint")
    length = 8 - b0.bit_length() + 1
    if pos + length > len(data):
        raise ValueError("EBML truncated")
    raw = int.from_bytes(data[pos : pos + length], "big")
    if keep_marker:
        return raw, pos + length
    val = raw & ((1 << (7 * length)) - 1)
    if val == (1 << (7 * length)) - 1:
        return None, pos + length  # unknown size (streaming)
    return val, pos + length


def _ebml_children(data: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) for children in
    [start, end); unknown-size masters extend to the parent end."""
    pos = start
    while pos < end:
        try:
            eid, p1 = _ebml_read(data, pos, keep_marker=True)
            size, p2 = _ebml_read(data, p1, keep_marker=False)
        except ValueError:
            return
        body_end = end if size is None else min(end, p2 + size)
        yield eid, p2, body_end
        pos = body_end


def _ebml_uint(data: bytes, s: int, e: int) -> int:
    return int.from_bytes(data[s:e], "big") if e > s else 0


def _ebml_float(data: bytes, s: int, e: int) -> float | None:
    import struct as _struct
    if e - s == 4:
        return _struct.unpack(">f", data[s:e])[0]
    if e - s == 8:
        return _struct.unpack(">d", data[s:e])[0]
    return None


def parse_ebml(data: bytes) -> dict:
    """Matroska/WebM walk → {doctype, duration_ms, tracks: [{type,
    codec, width, height, sample_rate, channels}]}."""
    if data[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("not an EBML payload")
    doctype, duration_ms, tracks = None, None, []
    tscale = 1_000_000  # default: timestamps in milliseconds
    duration_units = None
    for eid, s, e in _ebml_children(data, 0, len(data)):
        if eid == _EBML_HEADER:
            for cid, cs, ce in _ebml_children(data, s, e):
                if cid == 0x4282:  # DocType
                    doctype = data[cs:ce].split(b"\x00")[0].decode(
                        "ascii", "replace")
        elif eid == _MKV_SEGMENT:
            for cid, cs, ce in _ebml_children(data, s, e):
                if cid == _MKV_INFO:
                    for iid, i_s, i_e in _ebml_children(data, cs, ce):
                        if iid == 0x2AD7B1:  # TimecodeScale (ns per unit)
                            tscale = _ebml_uint(data, i_s, i_e) or tscale
                        elif iid == 0x4489:  # Duration (float, units)
                            duration_units = _ebml_float(data, i_s, i_e)
                elif cid == _MKV_TRACKS:
                    for tid, t_s, t_e in _ebml_children(data, cs, ce):
                        if tid != 0xAE:  # TrackEntry
                            continue
                        trk = {"type": None, "codec": None, "width": None,
                               "height": None, "sample_rate": None,
                               "channels": None}
                        for fid, f_s, f_e in _ebml_children(data, t_s, t_e):
                            if fid == 0x83:  # TrackType
                                t = _ebml_uint(data, f_s, f_e)
                                trk["type"] = {1: "video", 2: "audio",
                                               17: "subtitle"}.get(t, t)
                            elif fid == 0x86:  # CodecID
                                trk["codec"] = data[f_s:f_e].split(
                                    b"\x00")[0].decode("ascii", "replace")
                            elif fid == 0xE0:  # Video
                                for vid, v_s, v_e in _ebml_children(
                                        data, f_s, f_e):
                                    if vid == 0xB0:
                                        trk["width"] = _ebml_uint(
                                            data, v_s, v_e)
                                    elif vid == 0xBA:
                                        trk["height"] = _ebml_uint(
                                            data, v_s, v_e)
                            elif fid == 0xE1:  # Audio
                                for aid, a_s, a_e in _ebml_children(
                                        data, f_s, f_e):
                                    if aid == 0xB5:
                                        sr = _ebml_float(data, a_s, a_e)
                                        trk["sample_rate"] = (
                                            round(sr) if sr else None)
                                    elif aid == 0x9F:
                                        trk["channels"] = _ebml_uint(
                                            data, a_s, a_e)
                        tracks.append(trk)
    if duration_units is not None:
        duration_ms = round(duration_units * tscale / 1_000_000)
    return {"doctype": doctype, "duration_ms": duration_ms,
            "tracks": tracks}


# --------------------------------------------------------- AVI (RIFF)
# AVI 1.0 (Microsoft "AVI RIFF File Reference", public): RIFF chunks
# with nested LIST containers — hdrl carries avih (main header) and
# one strl per stream (strh/strf); the optional idx1 index flags
# keyframes (AVIIF_KEYFRAME = 0x10).  Header walk only — the video
# payloads (MJPEG/MPEG-4/DV fourccs) stay opaque, same policy as
# MP4/Matroska.


def parse_avi(data: bytes) -> dict:
    """AVI walk → {duration_ms, n_frames, width, height, streams:
    [{type, fourcc, rate, length, sample_rate, channels}],
    n_keyframes (None without an idx1 index)}."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    avih = None
    streams: list[dict] = []
    n_keyframes = None

    def walk(start: int, end: int, in_strl: bool) -> None:
        nonlocal avih, n_keyframes
        pos = start
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            size = int.from_bytes(data[pos + 4 : pos + 8], "little")
            body_s, body_e = pos + 8, min(pos + 8 + size, end)
            if cid == b"LIST":
                ltype = data[body_s : body_s + 4]
                walk(body_s + 4, body_e, ltype == b"strl")
            elif cid == b"avih" and size >= 40:
                b = data[body_s:body_e]
                avih = {
                    "usec_per_frame": int.from_bytes(b[0:4], "little"),
                    "total_frames": int.from_bytes(b[16:20], "little"),
                    "width": int.from_bytes(b[32:36], "little"),
                    "height": int.from_bytes(b[36:40], "little"),
                }
            elif cid == b"strh" and in_strl and size >= 36:
                b = data[body_s:body_e]
                scale = int.from_bytes(b[20:24], "little")
                rate = int.from_bytes(b[24:28], "little")
                streams.append({
                    "type": b[0:4].decode("latin-1"),
                    "fourcc": b[4:8].rstrip(b"\x00").decode("latin-1"),
                    "rate": (rate / scale) if scale else None,
                    "length": int.from_bytes(b[32:36], "little"),
                    "sample_rate": None, "channels": None,
                })
            elif cid == b"strf" and in_strl and streams and size >= 16:
                if streams[-1]["type"] == "auds":  # WAVEFORMATEX
                    b = data[body_s:body_e]
                    streams[-1]["channels"] = int.from_bytes(b[2:4], "little")
                    streams[-1]["sample_rate"] = int.from_bytes(
                        b[4:8], "little")
            elif cid == b"idx1":
                nk = 0
                for i in range(body_s, body_e - 15, 16):
                    two_cc = data[i + 2 : i + 4]
                    flags = int.from_bytes(data[i + 4 : i + 8], "little")
                    if two_cc in (b"dc", b"db") and flags & 0x10:
                        nk += 1
                n_keyframes = nk
            pos += 8 + size + (size & 1)  # chunks are word-aligned

    walk(12, min(len(data), 8 + int.from_bytes(data[4:8], "little")), False)
    n_frames = avih["total_frames"] if avih else None
    upf = avih["usec_per_frame"] if avih else 0
    return {
        "width": avih["width"] if avih else None,
        "height": avih["height"] if avih else None,
        "n_frames": n_frames,
        "n_keyframes": n_keyframes,
        "duration_ms": round(n_frames * upf / 1000)
        if n_frames is not None and upf else None,
        "streams": streams,
    }
