"""MPEG-1 Layer I decode (mp3dec._decode_layer1) — every constant is a
closed form, so the tests pin the full chain: hand-built frames against
analytically expected subband values through the shared polyphase
synthesis, plus perfect reconstruction of a real tone through the
test-side analysis filterbank with a Layer I quantize/encode step."""

import numpy as np
import pytest

from hbase_snapshot_spark.operators import mp3dec
from tests.test_mp3_decode import _BitW, _analysis_filterbank


def _l1_header(nch=1, mode=None, mode_ext=0, bitrate_idx=14, sr_idx=2,
               padding=0):
    """MPEG-1 Layer I header: default mono 448 kbps @ 32 kHz (672 B)."""
    if mode is None:
        mode = 3 if nch == 1 else 0
    b1 = 0xFF  # sync low, MPEG-1, Layer I, no CRC
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = (mode << 6) | (mode_ext << 4)
    return bytes([0xFF, b1, b2, b3])


_BITRATE_L1 = {1: 32, 14: 448}  # kbps by index, the two used here
_SR = {2: 32000}


def _l1_frame(alloc, scf_idx, codes, nch=1, mode=None, mode_ext=0,
              bitrate_idx=14, sr_idx=2):
    """Build one Layer I frame.  alloc/scf_idx: [nch][32];
    codes[s][sb] = int (shared above bound) or [per-ch ints] below."""
    if mode is None:
        mode = 3 if nch == 1 else 0
    bound = (mode_ext + 1) * 4 if (nch == 2 and mode == 1) else 32
    w = _BitW()
    for sb in range(32):
        if sb < bound:
            for ch in range(nch):
                w.put(alloc[ch][sb], 4)
        else:
            w.put(alloc[0][sb], 4)
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch][sb]:
                w.put(scf_idx[ch][sb], 6)
    for s in range(12):
        for sb in range(32):
            if sb >= bound and nch == 2:
                if alloc[0][sb]:
                    w.put(codes[s][sb], alloc[0][sb] + 1)
            else:
                for ch in range(nch):
                    if alloc[ch][sb]:
                        c = codes[s][sb]
                        c = c[ch] if isinstance(c, (list, tuple)) else c
                        w.put(c, alloc[ch][sb] + 1)
    size = (12 * _BITRATE_L1[bitrate_idx] * 1000 // _SR[sr_idx]) * 4
    return _l1_header(nch, mode, mode_ext, bitrate_idx, sr_idx) \
        + w.to_bytes(size - 4)


def _l1_quant(v, nb):
    """Inverse of mp3dec._l1_requant: nearest grid code for v ∈ (−1,1),
    never emitting the forbidden all-ones code."""
    half = 1 << (nb - 1)
    factor = (2 * half) / (2 * half - 1.0)
    signed = int(round((v / factor) * half - 1.0))
    signed = max(-half, min(half - 2, signed))
    inv = signed + 2 * half if signed < 0 else signed
    return inv ^ half


def _dequant(code, nb):
    half = 1 << (nb - 1)
    inv = code ^ half
    signed = inv - 2 * half if inv >= half else inv
    return ((2 * half) / (2 * half - 1.0)) * (signed / half + 1.0 / half)


def _empty(nch=1):
    return ([[0] * 32 for _ in range(nch)],
            [[0] * 32 for _ in range(nch)])


def test_l1_requant_grid():
    # nb=2: the three used codes give the symmetric mid-tread grid
    assert [round(_dequant(c, 2), 10) for c in (0, 1, 2)] == [
        round(-2 / 3, 10), 0.0, round(2 / 3, 10)]
    assert mp3dec._l1_requant(1, 2) == 0.0
    assert mp3dec._l1_requant(0, 2) == pytest.approx(-2 / 3)
    # zero code exists at every width
    for nb in range(2, 16):
        assert mp3dec._l1_requant((1 << (nb - 1)) - 1, nb) == 0.0


def test_l1_silence_decodes_to_zeros():
    alloc, scf = _empty()
    data = _l1_frame(alloc, scf, [[0] * 32 for _ in range(12)]) * 3
    sr, nch, pcm = mp3dec.decode(data)
    assert (sr, nch) == (32000, 1)
    assert pcm.shape == (3 * 384, 1)
    assert np.abs(pcm).max() == 0


def test_l1_direct_subband_exact():
    """Decoded PCM must equal the shared synthesis run on the
    analytically dequantized subband values, bit for bit."""
    alloc, scf = _empty()
    nb = 15
    alloc[0][5] = nb - 1
    scf[0][5] = 3  # scalefactor 2*2^-1 = 1.0 exactly
    vals = [0.5, -0.25, 0.125, 0.7, -0.7, 0.0, 0.3, -0.3, 0.9, -0.9,
            0.05, -0.05]
    codes = [[0] * 32 for _ in range(12)]
    for s, v in enumerate(vals):
        codes[s][5] = _l1_quant(v, nb)
    data = _l1_frame(alloc, scf, codes)
    sr, nch, pcm = mp3dec.decode(data)
    sub = np.zeros((12, 32))
    for s, v in enumerate(vals):
        sub[s, 5] = _dequant(_l1_quant(v, nb), nb)
    expected = mp3dec._Synth().run(sub)
    exp16 = np.clip(np.round(expected * 32767.0), -32768, 32767)
    assert np.array_equal(pcm[:, 0], exp16.astype(np.int16))
    # and the dequantized values are within one quantization step
    assert all(abs(_dequant(_l1_quant(v, nb), nb) - v) < 2.0 ** (1 - nb)
               for v in vals)


def test_l1_perfect_reconstruction_tone():
    """tone → analysis filterbank → Layer I quantize (nb=12) → frames →
    decode: the reconstruction at the canonical 481-sample delay must
    sit near the 12-bit quantization floor."""
    sr = 32000
    nframes = 8
    n = 384 * nframes
    t = np.arange(n + 512)
    x = 0.5 * np.sin(2 * np.pi * 1000.0 * t / sr)
    sub = _analysis_filterbank(x)  # (steps, 32)
    nb = 12
    alloc = [[nb - 1] * 32]
    scf = [[3] * 32]  # 1.0 everywhere
    frames = []
    for f in range(nframes):
        codes = [[_l1_quant(np.clip(sub[f * 12 + s, sb], -0.99, 0.99), nb)
                  for sb in range(32)] for s in range(12)]
        frames.append(_l1_frame(alloc, scf, codes))
    srd, nch, pcm = mp3dec.decode(b"".join(frames))
    assert (srd, nch) == (32000, 1)
    y = pcm[:, 0].astype(np.float64) / 32767.0
    ref = x[: len(y) - 481]
    seg = y[481 : 481 + len(ref)]
    err = seg - ref
    snr = 10 * np.log10(np.dot(ref, ref) / max(np.dot(err, err), 1e-30))
    assert snr > 45, f"Layer I reconstruction SNR {snr:.1f} dB"


def test_l1_joint_stereo_shared_code_per_channel_scf():
    """Above the intensity bound one code feeds both channels, scaled by
    each channel's own scalefactor."""
    nch = 2
    alloc, scf = _empty(nch)
    nb = 15
    sb = 10  # above bound=4 (mode_ext=0)
    alloc[0][sb] = alloc[1][sb] = nb - 1
    scf[0][sb] = 3   # 1.0
    scf[1][sb] = 9   # 2*2^-3 = 0.25
    vals = [0.6, -0.4, 0.2, 0.0, 0.8, -0.8, 0.1, -0.1, 0.5, -0.5,
            0.3, -0.3]
    codes = [[0] * 32 for _ in range(12)]
    for s, v in enumerate(vals):
        codes[s][sb] = _l1_quant(v, nb)
    data = _l1_frame(alloc, scf, codes, nch=nch, mode=1, mode_ext=0)
    sr, got_nch, pcm = mp3dec.decode(data)
    assert got_nch == 2
    subL = np.zeros((12, 32))
    subR = np.zeros((12, 32))
    for s, v in enumerate(vals):
        d = _dequant(_l1_quant(v, nb), nb)
        subL[s, sb] = 1.0 * d
        subR[s, sb] = 0.25 * d
    expL = np.clip(np.round(mp3dec._Synth().run(subL) * 32767.0),
                   -32768, 32767).astype(np.int16)
    expR = np.clip(np.round(mp3dec._Synth().run(subR) * 32767.0),
                   -32768, 32767).astype(np.int16)
    assert np.array_equal(pcm[:, 0], expL)
    assert np.array_equal(pcm[:, 1], expR)


def test_l1_stereo_independent_below_bound():
    nch = 2
    alloc, scf = _empty(nch)
    nb = 15
    alloc[0][2] = alloc[1][2] = nb - 1
    scf[0][2] = scf[1][2] = 3
    codes = [[0] * 32 for _ in range(12)]
    for s in range(12):
        codes[s][2] = [_l1_quant(0.5, nb), _l1_quant(-0.5, nb)]
    data = _l1_frame(alloc, scf, codes, nch=nch, mode=0)
    _, _, pcm = mp3dec.decode(data)
    # channels carry opposite signals
    assert np.array_equal(pcm[:, 0], -pcm[:, 1])
    assert np.abs(pcm).max() > 1000


def test_l1_forbidden_allocation_drops_frame():
    alloc, scf = _empty()
    good = _l1_frame(alloc, scf, [[0] * 32 for _ in range(12)])
    bad = bytearray(good)
    bad[4] = 0xF0  # allocation 15 in subband 0
    sr, nch, pcm = mp3dec.decode(bytes(bad) + good)
    assert pcm.shape[0] == 384  # only the good frame decoded


def test_layer2_still_raises_named():
    hdr = bytes([0xFF, 0xFD, 0x90, 0xC0])  # MPEG-1 Layer II
    size = 144 * 128000 // 44100
    data = (hdr + b"\x00" * (size - 4)) * 3
    with pytest.raises(NotImplementedError, match="Layer II"):
        mp3dec.decode(data)


def test_l1_decode_mp3_mono_convention():
    alloc, scf = _empty()
    nb = 15
    alloc[0][0] = nb - 1
    scf[0][0] = 3
    codes = [[_l1_quant(0.4, nb)] + [0] * 31 for _ in range(12)]
    data = _l1_frame(alloc, scf, codes) * 2
    sr, mono = mp3dec.decode_mp3_mono(data)
    assert sr == 32000
    assert mono.shape == (768,)
    assert mono.dtype == np.int32
