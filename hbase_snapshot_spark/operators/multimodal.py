"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``
pipelines.

The Spark-side plumbing — schema, partitioning, Pandas-UDF signatures,
batch shapes — is real and tested.  Decode kernels are REAL for
PPM/PGM, BMP, PNG (incl. Adam7/16-bit), JPEG (baseline, progressive,
AND lossless SOF3), GIF, and baseline TIFF images; RIFF WAV
(PCM/float/G.711/IMA+MS ADPCM), AIFF/AIFF-C, Sun .au, FLAC, and MPEG-1
Layer III audio; and YUV4MPEG2 + animated-GIF video — dependency-free
numpy/stdlib codecs in ``codecs.py``.  CONTAINER-level parsing is
real for MP3, ADTS/AAC, MP4/ISO-BMFF, Ogg (Vorbis/Opus/FLAC/Theora/
Speex ID headers), and Matroska/WebM: probe_media and the
sample_frames MP4 path run on it.  The codec PAYLOADS the video
containers carry (H.264/HEVC pixels, AAC PCM) require media libraries
NOT in this container and raise a clearly-marked
``NotImplementedError``.  Every kernel also keeps a deterministic fake
(``fake=True``) that exercises the identical dataflow on synthetic
payloads for tests/benchmarks, and an ``on_error='null'`` policy that
turns per-payload decode failures into null rows — at corpus scale a
batch must survive corrupt payloads.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class _SkipPayload(Exception):
    """Internal: payload is absent — emit null rows, not an error."""


MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("payload", T.BinaryType(), True),     # opaque encoded bytes
    T.StructField("meta", T.StructType([                # typed metadata
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])


def documents_as_media(df: DataFrame, kind: str = "image") -> DataFrame:
    """deterministic media table from the documents fixture: payload =
    utf-8 bytes of the text (a stand-in blob), metadata derived from
    byte lengths — lets every pipeline stage run end-to-end without
    codec libraries."""
    payload = F.encode(F.col("text"), "utf-8")
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.length(payload) % 512).cast("int").alias("width"),
            (F.length(payload) % 384).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.length(payload) * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


# -------------------------------------------------------- byte features

_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("digest", T.StringType(), True),
    T.StructField("head_hex", T.StringType(), True),
])


def extract_byte_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload —
    the shape every real decoder UDF follows (mapInPandas: Iterator of
    pandas batches in, batches out; no per-row Python dispatch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": payloads.map(lambda b: len(b) if b is not None else None),
                "digest": payloads.map(
                    lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                ),
                "head_hex": payloads.map(
                    lambda b: bytes(b[:8]).hex() if b is not None else None
                ),
            })

    return media.mapInPandas(run, schema=_FEATURE_SCHEMA)


# -------------------------------------------------------- decode (stubbed)

_DECODE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("mean_intensity", T.DoubleType(), True),
])


def _check_on_error(on_error: str) -> None:
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")


def decode_images(media: DataFrame, fake: bool = False,
                  on_error: str = "raise") -> DataFrame:
    """Image decode + cheap stats.  Real path decodes PPM/PGM/BMP/
    PNG/JPEG (baseline + progressive) payloads (codecs.decode_image —
    numpy + stdlib zlib, no media libs); the remaining formats (WebP,
    …) raise NotImplementedError naming Pillow.
    ``fake=True`` runs a deterministic byte-statistics decoder through
    the identical mapInPandas pipeline (same schema, same batching).
    ``on_error='null'`` turns per-payload decode failures into null
    feature rows instead of failing the batch — the policy a 100 TB
    corpus run wants, where some corrupt payloads are a certainty."""
    _check_on_error(on_error)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hbase_snapshot_spark.operators import codecs

        for pdf in batches:
            payloads = pdf["payload"]
            if fake:
                yield pd.DataFrame({
                    "media_id": pdf["media_id"],
                    "width": payloads.map(
                        lambda b: len(b) % 512 if b is not None else None),
                    "height": payloads.map(
                        lambda b: len(b) % 384 if b is not None else None),
                    "channels": 3,
                    "mean_intensity": payloads.map(
                        lambda b: round(sum(b) / len(b), 4) if b else 0.0
                    ),
                })
                continue
            rows = {k: [] for k in
                    ("media_id", "width", "height", "channels", "mean_intensity")}
            for mid, b in zip(pdf["media_id"], payloads):
                rows["media_id"].append(mid)
                img = None
                if b is not None:
                    try:
                        img = codecs.decode_image(bytes(b))
                    except Exception:  # noqa: BLE001 — corrupt payload
                        if on_error == "raise":
                            raise
                if img is None:
                    for k in ("width", "height", "channels", "mean_intensity"):
                        rows[k].append(None)
                    continue
                rows["width"].append(img.shape[1])
                rows["height"].append(img.shape[0])
                rows["channels"].append(img.shape[2] if img.ndim == 3 else 1)
                rows["mean_intensity"].append(round(float(img.mean()), 4))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=_DECODE_SCHEMA)


_FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_ms", T.LongType(), False),
    T.StructField("frame", T.BinaryType(), True),
])


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = False,
                  on_error: str = "raise") -> DataFrame:
    """Video frame sampling: expand each video into frame rows at a
    fixed cadence (JVM-side sequence+explode for the row fan-out), then
    decode each sampled frame via mapInPandas.  Real path decodes
    **YUV4MPEG2 (y4m)** — plain-text header + raw planar frames, the one
    video container that needs no ffmpeg (codecs.parse_y4m_header /
    y4m_frames); each output row carries the raw planar bytes of the
    source frame nearest the sample instant (fps-aware), None past the
    stream end.  **MP4/ISO-BMFF** samples at the container level
    (codecs.mp4_keyframe_index): each row carries the coded access-unit
    bytes of the nearest preceding keyframe — the seek target a real
    decoder starts from; H.264/HEVC pixel decode is out of scope
    (needs ffmpeg).  **Animated GIF** decodes natively: each row
    carries the composited RGB frame bytes at the GCE delay timeline.
    Other compressed containers (MKV/...) raise a documented
    NotImplementedError.  ``fake=True`` keeps the deterministic digest
    decoder over the identical dataflow.  ``on_error='null'`` emits
    null frames for unparseable payloads instead of failing the
    batch."""
    _check_on_error(on_error)
    frames = media.select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.col("meta.duration_ms") / every_ms).cast("int") - 1, F.lit(0)),
            )
        ).alias("frame_idx"),
    ).withColumn("frame_ms", (F.col("frame_idx").cast("long") * every_ms))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hbase_snapshot_spark.operators import codecs

        for pdf in batches:
            if fake:
                yield pd.DataFrame({
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_ms": pdf["frame_ms"],
                    "frame": [
                        hashlib.md5(
                            bytes(p) + int(i).to_bytes(4, "big")
                        ).digest() if p is not None else None
                        for p, i in zip(pdf["payload"], pdf["frame_idx"])
                    ],
                })
                continue
            # parse each payload once per batch: group the sample rows
            # by media, decode the stream in one forward walk, pick the
            # source frame nearest each sample instant
            out = {"media_id": [], "frame_idx": [], "frame_ms": [], "frame": []}
            for _mid, grp in pdf.groupby("media_id", sort=False):
                payload = grp["payload"].iloc[0]
                hdr = keyframes = gif_frames = None
                try:
                    if payload is None:
                        raise _SkipPayload
                    data = bytes(payload)
                    if codecs.sniff_y4m(data):
                        hdr = codecs.parse_y4m_header(data)
                        num, den = hdr["fps"]
                        wanted = {
                            int(ms) * num // (1000 * den)
                            for ms in grp["frame_ms"]
                        }
                        frames_by_src = {
                            i: b for i, b in codecs.y4m_frames(data)
                            if i in wanted
                        }
                    elif codecs.sniff(data) == "mp4":
                        # container-level sampling: the coded access-unit
                        # bytes of the nearest PRECEDING keyframe (the
                        # seek target a real decoder would start from);
                        # H.264/HEVC pixel decode stays out of scope
                        keyframes = codecs.mp4_keyframe_index(data)
                    elif codecs.sniff(data) == "gif":
                        # animated GIF decodes natively: composited RGB
                        # frames, sampled by the GCE delay timeline
                        # (0-delay frames tick at the 100ms players use)
                        arr, delays = codecs.decode_gif(data)
                        starts, t0 = [], 0
                        for d in delays:
                            starts.append(t0)
                            t0 += d if d > 0 else 100
                        gif_frames = (starts, arr)
                    else:
                        raise NotImplementedError(
                            "compressed video decode requires ffmpeg — "
                            "unavailable here (YUV4MPEG2/y4m and GIF "
                            "decode natively; MP4 samples at keyframe "
                            "access-unit level)"
                        )
                except _SkipPayload:
                    pass
                except Exception:  # noqa: BLE001 — corrupt payload
                    if on_error == "raise":
                        raise
                    hdr = keyframes = gif_frames = None
                for _, r in grp.iterrows():
                    out["media_id"].append(r["media_id"])
                    out["frame_idx"].append(r["frame_idx"])
                    out["frame_ms"].append(r["frame_ms"])
                    if hdr is not None:
                        src = int(r["frame_ms"]) * hdr["fps"][0] // (
                            1000 * hdr["fps"][1]
                        )
                        out["frame"].append(frames_by_src.get(src))
                    elif keyframes is not None:
                        best = None
                        for _i, t_ms, off, size in keyframes:
                            if t_ms <= int(r["frame_ms"]):
                                best = (off, size)
                            else:
                                break
                        out["frame"].append(
                            data[best[0] : best[0] + best[1]]
                            if best is not None else None
                        )
                    elif gif_frames is not None:
                        starts, arr = gif_frames
                        best = None
                        for i, t_ms in enumerate(starts):
                            if t_ms <= int(r["frame_ms"]):
                                best = i
                            else:
                                break
                        out["frame"].append(
                            arr[best].tobytes() if best is not None else None
                        )
                    else:
                        out["frame"].append(None)
            yield pd.DataFrame(out)

    return frames.mapInPandas(run, schema=_FRAME_SCHEMA)


_RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),
])


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, fake: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Image resize to a fixed training resolution.  Real path:
    PPM/PGM/BMP/PNG/JPEG decode → nearest-neighbor resample →
    re-encode as binary P6 PPM (codecs.py — numpy + stdlib zlib);
    unsupported inputs (WebP, …) raise NotImplementedError naming
    Pillow.  ``fake=True`` emits a
    deterministic digest-sized payload through the identical
    mapInPandas pipeline (same schema, same batching).
    ``on_error='null'`` nulls the payload for corrupt inputs instead
    of failing the batch."""
    _check_on_error(on_error)

    def _resize_one(codecs, p):
        if p is None:
            return None
        try:
            return codecs.encode_ppm(codecs.resize_nearest(
                codecs.decode_image(bytes(p)), width, height))
        except Exception:  # noqa: BLE001 — corrupt payload
            if on_error == "raise":
                raise
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hbase_snapshot_spark.operators import codecs

        for pdf in batches:
            if fake:
                yield pd.DataFrame({
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": [
                        hashlib.md5(
                            bytes(p) + width.to_bytes(2, "big")
                            + height.to_bytes(2, "big")
                        ).digest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                })
                continue
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": width,
                "height": height,
                "payload": [_resize_one(codecs, p) for p in pdf["payload"]],
            })

    return media.mapInPandas(run, schema=_RESIZE_SCHEMA)


_AUDIO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("peak", T.IntegerType(), True),
])


def extract_audio_features(
    media: DataFrame, target_rate: int = 16000, fake: bool = False,
    on_error: str = "raise", with_decode_stats: bool = False,
) -> DataFrame:
    """Audio decode/resample + level features (RMS, peak).  Real path
    decodes RIFF WAV (PCM int 8/16/24/32 + float32, G.711, IMA/MS
    ADPCM, multi-channel downmix), AIFF/AIFF-C, Sun .au, FLAC
    (rice+LPC, exact), and MPEG-1 Layer III (mp3dec.py)
    and linear-resamples to
    ``target_rate`` — codecs.py, numpy only; other compressed audio
    raises NotImplementedError naming ffmpeg.  ``fake=True`` treats the
    payload bytes as 8-bit samples — deterministic, same dataflow.
    ``on_error='null'`` nulls the feature row for corrupt payloads
    instead of failing the batch.  ``with_decode_stats`` (r9) adds a
    ``decode_gaps`` column — for MP3, the count of channel-granules
    that degraded to silence because they selected an unshipped
    Huffman table (mp3dec's per-granule fallback); 0 for clean decodes
    and non-MP3 formats; null when the whole row nulled — the triage
    signal that separates fully-decoded audio from gap-filled audio in
    a corpus pass."""
    _check_on_error(on_error)
    schema = _AUDIO_SCHEMA
    if with_decode_stats:
        schema = T.StructType(
            _AUDIO_SCHEMA.fields
            + [T.StructField("decode_gaps", T.IntegerType(), True)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hbase_snapshot_spark.operators import codecs

        for pdf in batches:
            payloads = pdf["payload"]
            if fake:
                out = {
                    "media_id": pdf["media_id"],
                    "sample_rate": target_rate,
                    "n_samples": payloads.map(
                        lambda b: len(b) if b is not None else None),
                    "rms": payloads.map(
                        lambda b: round((sum(x * x for x in b) / len(b)) ** 0.5, 4)
                        if b else 0.0
                    ),
                    "peak": payloads.map(lambda b: max(b) if b else 0),
                }
                if with_decode_stats:
                    out["decode_gaps"] = 0
                yield pd.DataFrame(out)
                continue
            cols = ["media_id", "sample_rate", "n_samples", "rms", "peak"]
            if with_decode_stats:
                cols.append("decode_gaps")
            rows = {k: [] for k in cols}
            for mid, b in zip(pdf["media_id"], payloads):
                rows["media_id"].append(mid)
                samples, gaps = None, None
                if b is not None:
                    try:
                        kind = codecs.sniff(bytes(b))
                        gaps = 0
                        if kind == "wav":
                            src_rate, samples = codecs.decode_wav(bytes(b))
                        elif kind == "aiff":
                            src_rate, samples = codecs.decode_aiff(bytes(b))
                        elif kind == "au":
                            src_rate, samples = codecs.decode_au(bytes(b))
                        elif kind == "mp3":
                            dstats: dict = {}
                            src_rate, samples = codecs.decode_mp3(
                                bytes(b), stats=dstats)
                            gaps = int(dstats.get("degraded", 0))
                        elif kind == "flac":
                            src_rate, samples = codecs.decode_flac(bytes(b))
                        else:
                            raise NotImplementedError(
                                "audio decode supports RIFF WAV, AIFF, "
                                "Sun .au, FLAC, and MPEG-1 Layer III "
                                "natively; other codecs (AAC/Opus/...) "
                                "require ffmpeg/soundfile — unavailable here"
                            )
                    except Exception:  # noqa: BLE001 — corrupt payload
                        if on_error == "raise":
                            raise
                        samples, gaps = None, None
                if samples is None:
                    rows["sample_rate"].append(None)
                    rows["n_samples"].append(None)
                    rows["rms"].append(None)
                    rows["peak"].append(None)
                    if with_decode_stats:
                        rows["decode_gaps"].append(gaps)
                    continue
                samples = codecs.resample_linear(samples, src_rate, target_rate)
                rows["sample_rate"].append(target_rate)
                rows["n_samples"].append(len(samples))
                rows["rms"].append(
                    round(float((samples.astype("float64") ** 2).mean() ** 0.5), 4)
                    if len(samples) else 0.0
                )
                rows["peak"].append(
                    int(abs(samples).max()) if len(samples) else 0
                )
                if with_decode_stats:
                    rows["decode_gaps"].append(gaps)
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=schema)


_PROBE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("format", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("bitrate", T.IntegerType(), True),
    T.StructField("n_frames", T.LongType(), True),
    T.StructField("n_keyframes", T.LongType(), True),
])


def probe_media(media: DataFrame) -> DataFrame:
    """Container-level media probe (the ffprobe analogue a corpus
    triage pass needs BEFORE spending decode cycles): per payload —
    format, dimensions, sample rate/channels/bitrate/duration, frame
    and keyframe counts.  All header-walk only, no pixel/PCM decode:
    MP3 via codecs.parse_mp3 (MPEG frame walk + Xing/VBRI), AAC via
    codecs.parse_adts (ADTS header walk), MP4 via
    codecs.parse_mp4 (ISO-BMFF sample tables + stss keyframe index),
    GIF via codecs.parse_gif (block walk, no LZW decode), FLAC via
    codecs.parse_flac (STREAMINFO), Ogg via codecs.parse_ogg (page walk
    + Vorbis/Opus/FLAC/Theora/Speex ID headers), Matroska/WebM via
    codecs.parse_ebml (Info + Tracks), AVI via codecs.parse_avi (hdrl
    stream headers + idx1 keyframe index), AIFF/AU via their header
    walks, WAV/y4m/PNG/BMP/JPEG/PNM via their native headers.  Unknown
    payloads yield format=None rather than raising — a probe must
    never kill the batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hbase_snapshot_spark.operators import codecs

        cols = [f.name for f in _PROBE_SCHEMA.fields]

        def probe(data):
            row = dict.fromkeys(cols[1:])
            if data is None:
                return row
            data = bytes(data)
            if codecs.sniff_y4m(data):
                hdr = codecs.parse_y4m_header(data)
                n = codecs.y4m_frame_count(data)
                num, den = hdr["fps"]
                row.update(format="y4m", width=hdr["width"],
                           height=hdr["height"],
                           n_frames=n, n_keyframes=n,
                           duration_ms=round(n * 1000 * den / num)
                           if num else None)
                return row
            kind = codecs.sniff(data)
            row["format"] = kind
            if kind in ("mp3", "aac"):
                # an ID3v2 prefix sniffs as mp3 but may wrap ADTS; an
                # MPEG resync inside an ADTS body can also false-lock —
                # prefer whichever format syncs EXACTLY at the tag end
                start = codecs._skip_id3v2(data)
                if codecs._adts_frame_at(data, start) is not None:
                    kind = "aac"
                m = None
                if kind == "mp3":
                    try:
                        m = codecs.parse_mp3(data)
                    except ValueError:
                        m = None
                if m is not None:
                    row.update(format=f"mp3/{m['format']}-L{m['layer']}",
                               sample_rate=m["sample_rate"],
                               channels=m["channels"],
                               duration_ms=m["duration_ms"],
                               bitrate=m["bitrate_avg"],
                               n_frames=m["n_frames"])
                else:
                    a = codecs.parse_adts(data)
                    row.update(
                        format=f"aac/ADTS-{a['profile']}",
                        sample_rate=a["sample_rate"],
                        channels=a["channels"],
                        duration_ms=a["duration_ms"],
                        bitrate=a["bitrate_avg"],
                        n_frames=a["n_frames"])
            elif kind == "mp4":
                m = codecs.parse_mp4(data)
                # ftyp major brand distinguishes video (isom/mp42) from
                # the image-in-BMFF formats (heic/avif) at triage time
                row.update(format=f"mp4/{m['brand']}" if m.get("brand")
                           else "mp4",
                           duration_ms=m["duration_ms"])
                for trk in m["tracks"]:
                    if trk["handler"] == "vide":
                        row.update(width=trk["width"], height=trk["height"],
                                   n_frames=trk["n_samples"],
                                   n_keyframes=sum(
                                       1 for s in trk["samples"] if s[3]))
                        break
            elif kind == "wav":
                # header walk only (fmt + data chunk sizes) — a probe
                # must not decode PCM; channels is the CONTAINER's real
                # channel count, frames = data bytes / block align
                pos, fmt_b, data_len = 12, None, None
                while pos + 8 <= len(data):
                    cid = data[pos : pos + 4]
                    size = int.from_bytes(data[pos + 4 : pos + 8], "little")
                    if cid == b"fmt ":
                        fmt_b = data[pos + 8 : pos + 8 + size]
                    elif cid == b"data":
                        data_len = size
                    pos += 8 + size + (size & 1)
                if fmt_b is not None:
                    n_ch = max(1, int.from_bytes(fmt_b[2:4], "little"))
                    rate = int.from_bytes(fmt_b[4:8], "little")
                    block = max(1, int.from_bytes(fmt_b[12:14], "little"))
                    frames = (data_len // block) if data_len else None
                    row.update(
                        sample_rate=rate, channels=n_ch, n_frames=frames,
                        duration_ms=round(frames * 1000 / rate)
                        if frames is not None and rate else None)
            elif kind == "aiff":
                m = codecs.parse_aiff(data)
                rate, frames = m["sample_rate"], m["n_frames"]
                row.update(
                    format=f"aiff/{m['compression'].strip() or 'NONE'}",
                    sample_rate=rate, channels=m["channels"],
                    n_frames=frames,
                    duration_ms=round(frames * 1000 / rate)
                    if rate else None)
            elif kind == "au":
                m = codecs.parse_au(data)
                rate, nch = m["sample_rate"], m["channels"]
                widths = {2: 1, 3: 2, 4: 3, 5: 4, 6: 4, 7: 8}
                w = widths.get(m["encoding"], 1)
                frames = m["data_size"] // (w * nch) if nch else None
                row.update(
                    format=f"au/{m['encoding_name'] or m['encoding']}",
                    sample_rate=rate, channels=nch, n_frames=frames,
                    duration_ms=round(frames * 1000 / rate)
                    if frames is not None and rate else None)
            elif kind == "ogg":
                m = codecs.parse_ogg(data)
                row.update(
                    format=f"ogg/{m['codec']}" if m["codec"] else "ogg",
                    sample_rate=m["sample_rate"], channels=m["channels"],
                    width=m["width"], height=m["height"],
                    duration_ms=m["duration_ms"])
            elif kind == "ebml":
                m = codecs.parse_ebml(data)
                vid = next((t for t in m["tracks"]
                            if t["type"] == "video"), None)
                aud = next((t for t in m["tracks"]
                            if t["type"] == "audio"), None)
                codec = (vid or aud or {}).get("codec")
                row.update(
                    format=f"{m['doctype'] or 'matroska'}/{codec}"
                    if codec else (m["doctype"] or "matroska"),
                    duration_ms=m["duration_ms"])
                if vid:
                    row.update(width=vid["width"], height=vid["height"])
                if aud:
                    row.update(sample_rate=aud["sample_rate"],
                               channels=aud["channels"])
            elif kind == "avi":
                m = codecs.parse_avi(data)
                vid = next((s for s in m["streams"]
                            if s["type"] == "vids"), None)
                aud = next((s for s in m["streams"]
                            if s["type"] == "auds"), None)
                fourcc = vid["fourcc"] if vid and vid["fourcc"] else None
                row.update(
                    format=f"avi/{fourcc}" if fourcc else "avi",
                    width=m["width"], height=m["height"],
                    n_frames=m["n_frames"], n_keyframes=m["n_keyframes"],
                    duration_ms=m["duration_ms"])
                if aud:
                    row.update(sample_rate=aud["sample_rate"],
                               channels=aud["channels"])
            elif kind == "webp":
                m = codecs.parse_webp(data)
                row.update(format=f"webp/{m['variant']}",
                           width=m["width"], height=m["height"],
                           n_frames=m["n_frames"],
                           n_keyframes=m["n_frames"],
                           duration_ms=m["duration_ms"])
            elif kind == "png":
                row.update(width=int.from_bytes(data[16:20], "big"),
                           height=int.from_bytes(data[20:24], "big"))
            elif kind == "bmp":
                row.update(
                    width=int.from_bytes(data[18:22], "little"),
                    height=abs(int.from_bytes(data[22:26], "little",
                                              signed=True)))
            elif kind == "jpeg":
                pos = 2
                while pos + 4 <= len(data):
                    if data[pos] != 0xFF:
                        break
                    while pos + 2 <= len(data) and data[pos + 1] == 0xFF:
                        pos += 1
                    marker = data[pos + 1]
                    if marker == 0xD9:
                        break
                    if 0xD0 <= marker <= 0xD7 or marker == 0x01:
                        pos += 2
                        continue
                    seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
                    if marker in (0xC0, 0xC1, 0xC2):
                        row.update(
                            height=int.from_bytes(
                                data[pos + 5 : pos + 7], "big"),
                            width=int.from_bytes(
                                data[pos + 7 : pos + 9], "big"))
                        break
                    if marker == 0xDA:
                        break
                    pos += 2 + seg_len
            elif kind == "gif":
                m = codecs.parse_gif(data)
                row.update(width=m["width"], height=m["height"],
                           n_frames=m["n_frames"],
                           n_keyframes=m["n_frames"],
                           duration_ms=m["duration_ms"] or None)
            elif kind == "flac":
                m = codecs.parse_flac(data)
                row.update(sample_rate=m["sample_rate"],
                           channels=m["channels"],
                           n_frames=m["total_samples"] or None,
                           duration_ms=m["duration_ms"])
            elif kind == "tiff":
                m = codecs.parse_tiff(data)
                row.update(width=m["width"], height=m["height"])
            elif kind == "pnm":
                try:
                    img = codecs.decode_pnm(data)
                    row.update(width=img.shape[1], height=img.shape[0])
                except Exception:  # noqa: BLE001
                    pass
            return row

        for pdf in batches:
            rows = {k: [] for k in cols}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                rows["media_id"].append(mid)
                try:
                    r = probe(b)
                except Exception:  # noqa: BLE001 — malformed payload
                    r = dict.fromkeys(cols[1:])
                    r["format"] = "corrupt"
                for k in cols[1:]:
                    rows[k].append(r[k])
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=_PROBE_SCHEMA)


# ------------------------------------------------- perceptual hashing

_PHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("phash", T.LongType(), True),
])


def _luma(img) -> "np.ndarray":  # noqa: F821 — numpy imported in kernel
    import numpy as np

    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 2:
        return a
    if a.shape[2] == 1:
        return a[:, :, 0]
    # ITU-R BT.601 luma over the first three channels (alpha ignored)
    return (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2])


def _area_mean_grid(gray, out_h: int, out_w: int) -> "np.ndarray":  # noqa: F821
    """Exact area-average downsample to (out_h, out_w) via the integral
    image — deterministic, no interpolation-library dependence."""
    import numpy as np

    h, w = gray.shape
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = gray.cumsum(0).cumsum(1)
    ys = np.linspace(0, h, out_h + 1).round().astype(int)
    xs = np.linspace(0, w, out_w + 1).round().astype(int)
    out = np.empty((out_h, out_w), dtype=np.float64)
    for r in range(out_h):
        y0, y1 = ys[r], max(ys[r + 1], ys[r] + 1)
        y1 = min(y1, h)
        y0 = min(y0, y1 - 1)
        for c in range(out_w):
            x0, x1 = xs[c], max(xs[c + 1], xs[c] + 1)
            x1 = min(x1, w)
            x0 = min(x0, x1 - 1)
            area = (y1 - y0) * (x1 - x0)
            out[r, c] = (ii[y1, x1] - ii[y0, x1]
                         - ii[y1, x0] + ii[y0, x0]) / area
    return out


def _phash_one(img, method: str) -> int:
    """64-bit perceptual hash of a decoded image array.

    dhash: 9x8 area-mean grid, bit r*8+c = grid[r,c] > grid[r,c+1]
    (horizontal gradient sign — robust to re-encode/resize/brightness).
    ahash: 8x8 grid, bit = cell > grid mean.
    Returned as a SIGNED 64-bit int (Spark LongType two's complement).
    """
    import numpy as np

    gray = _luma(img)
    if method == "dhash":
        g = _area_mean_grid(gray, 8, 9)
        bits = (g[:, 1:] > g[:, :-1])
    elif method == "ahash":
        g = _area_mean_grid(gray, 8, 8)
        bits = g > g.mean()
    else:
        raise ValueError(f"method must be 'dhash' or 'ahash', got {method!r}")
    v = np.uint64(0)
    for i, b in enumerate(bits.ravel()):
        if b:
            v |= np.uint64(1) << np.uint64(i)
    return int(np.int64(v))


def phash_images(media: DataFrame, method: str = "dhash",
                 fake: bool = False, on_error: str = "raise") -> DataFrame:
    """Perceptual 64-bit image hash over DECODED pixels — the image
    sibling of text simhash, and the standard image-dedup signal of a
    multimodal corpus pipeline (near-identical images re-encoded at
    different qualities/sizes collide within a few bits).

    Real path decodes via codecs.decode_image (PPM/PGM/BMP/PNG/JPEG/
    GIF/TIFF); ``fake=True`` hashes a deterministic byte-statistics
    stand-in through the identical mapInPandas dataflow.  Pair finding
    is NOT here — feed the output to ``dedup.hamming_dup_pairs``,
    which pigeonholes to equi-joins (never all-pairs).
    """
    if method not in ("dhash", "ahash"):
        raise ValueError(f"method must be 'dhash' or 'ahash', got {method!r}")
    _check_on_error(on_error)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from hbase_snapshot_spark.operators import codecs

        for pdf in batches:
            ids, hashes = [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                h = None
                if b is not None:
                    try:
                        if fake:
                            arr = np.frombuffer(
                                bytes(b[:4096]), dtype=np.uint8)
                            side = max(int(len(arr) ** 0.5), 8)
                            arr = np.resize(arr, side * side)
                            img = arr.reshape(side, side)
                        else:
                            img = codecs.decode_image(bytes(b))
                        h = _phash_one(img, method)
                    except Exception:  # noqa: BLE001 — corrupt payload
                        if on_error == "raise":
                            raise
                hashes.append(h)
            yield pd.DataFrame(
                {"media_id": ids,
                 "phash": pd.array(hashes, dtype="Int64")})

    return media.mapInPandas(run, schema=_PHASH_SCHEMA)
