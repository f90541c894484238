"""From-scratch FLAC codec (functions/flac.py) — spec-stream tests.

Round-trips run through our own encoder (real FLAC bitstreams: fixed
subframes, Rice partitions, stereo decorrelation, CRCs, STREAMINFO MD5).
Decoder-only paths the encoder never emits (LPC subframes, Rice2 method,
escape partitions, wasted bits) are exercised by HAND-BUILT streams
assembled bit-by-bit from the spec, same pattern as test_pure_codec's
hand-built PNG/JPEG streams.
"""

import hashlib
import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from fetcho_spark.functions.flac import (
    _BitWriter, _crc8, _crc16, _pcm_bytes, decode_flac, encode_flac,
)


def _sine_noise(n, amp=6000, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (amp * np.sin(t / 19.0)
            + rng.integers(-250, 250, n)).astype(np.int64)


# ------------------------------------------------------------- round-trips

@pytest.mark.parametrize("bps,block", [(8, 256), (16, 1024), (16, 4091),
                                       (24, 4096)])
def test_mono_roundtrip(bps, block):
    amp = (1 << (bps - 2)) - 1
    x = np.clip(_sine_noise(9001, amp=amp), -(1 << (bps - 1)),
                (1 << (bps - 1)) - 1)
    blob = encode_flac(x, 16000, bps, block_size=block)
    dec, rate, got_bps = decode_flac(blob)
    assert (rate, got_bps) == (16000, bps)
    assert np.array_equal(dec[:, 0], x)


@pytest.mark.parametrize("mode", ["independent", "mid_side", "left_side",
                                  "right_side"])
@pytest.mark.parametrize("porder", [0, 2])
def test_stereo_modes_roundtrip(mode, porder):
    left = _sine_noise(4096 + 513, seed=5)
    right = _sine_noise(4096 + 513, seed=6) // 2 + 7   # odd sums: mid floor
    x = np.stack([left, right], axis=1)
    blob = encode_flac(x, 44100, 16, block_size=512, stereo_mode=mode,
                       partition_order=porder)
    dec, _, _ = decode_flac(blob)
    assert np.array_equal(dec, x), mode


def test_constant_and_many_frames_utf8_numbers():
    # 300 frames: frame numbers cross the 1-byte UTF-8 boundary (128+)
    x = np.full(300 * 192, -12, dtype=np.int64)
    blob = encode_flac(x, 8000, 16, block_size=192)
    dec, _, _ = decode_flac(blob)
    assert np.array_equal(dec[:, 0], x)
    # constant frames compress to almost nothing (proves CONSTANT emitted:
    # ~14 bytes/frame of header+footer, not 2 bytes/sample)
    assert len(blob) < len(x) * 2 // 25


def test_verbatim_fallback_on_noise():
    rng = np.random.default_rng(11)
    x = rng.integers(-32768, 32767, 2000).astype(np.int64)
    blob = encode_flac(x, 8000, 16, block_size=512)
    dec, _, _ = decode_flac(blob)
    assert np.array_equal(dec[:, 0], x)


def test_md5_and_crc_guard_every_byte_flip():
    x = _sine_noise(2048)
    blob = bytearray(encode_flac(x, 8000, 16, block_size=1024))
    # flip one bit in: an MD5 byte (PCM check), a mid-frame audio byte
    # (CRC-16), a final CRC byte. (A flip in STREAMINFO's bps field is
    # deliberately NOT here: frame headers carry explicit sample size, so
    # that flip is semantically invisible per spec.)
    for pos in (30, len(blob) - 300, len(blob) - 3):
        bad = bytearray(blob)
        bad[pos] ^= 0x10
        with pytest.raises(ValueError):
            decode_flac(bytes(bad))


def test_truncation_fails_cleanly_everywhere():
    x = _sine_noise(1500)
    blob = encode_flac(x, 8000, 16, block_size=512)
    for cut in range(0, len(blob), 97):
        with pytest.raises(ValueError):
            decode_flac(blob[:cut])


def test_max_samples_early_stop():
    x = _sine_noise(8192)
    blob = encode_flac(x, 8000, 16, block_size=1024)
    dec, _, _ = decode_flac(blob, max_samples=2048)
    assert len(dec) == 2048
    assert np.array_equal(dec[:, 0], x[:2048])


@settings(derandomize=True, max_examples=25, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=700),
       st.sampled_from([64, 192, 577]))
def test_roundtrip_property(vals, block):
    x = np.array(vals, dtype=np.int64)
    blob = encode_flac(x, 8000, 16, block_size=block)
    dec, _, _ = decode_flac(blob)
    assert np.array_equal(dec[:, 0], x)


# ------------------------------------------- hand-built decoder-only paths

def _manual_stream(x2d: np.ndarray, rate: int, bps: int,
                   write_body) -> bytes:
    """STREAMINFO + ONE frame whose subframe bits come from write_body(bw)
    — bit-exact container so decoder-only features are testable."""
    n, nch = x2d.shape
    md5 = hashlib.md5(_pcm_bytes(x2d.astype(np.int64), bps)).digest()
    si = bytearray()
    si += struct.pack(">HH", max(n, 16), max(n, 16))
    si += b"\x00\x00\x00" * 2
    bits = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | n
    si += bits.to_bytes(8, "big")
    si += md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    bw = _BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)                      # reserved + fixed-blocksize
    bw.write(7, 4)                      # blocksize: 16-bit at end
    bw.write(0, 4)                      # rate from STREAMINFO
    bw.write(nch - 1, 4)                # independent channels
    bw.write({8: 1, 16: 4, 24: 6}[bps], 3)
    bw.write(0, 1)
    bw.write(0, 8)                      # frame number 0
    bw.write(n - 1, 16)
    bw.write(_crc8(bytes(bw.buf)), 8)
    write_body(bw)
    bw.align()
    bw.write(_crc16(bytes(bw.buf)), 16)
    return bytes(out + bw.bytes())


def test_lpc_subframe_decodes():
    """LPC order-2: s[i] = ((3*s[i-1] - 1*s[i-2]) >> 1) + r[i], built
    bit-by-bit per spec (precision/shift/coefficients/Rice residual)."""
    n, order, prec, shift = 64, 2, 5, 1
    coefs = [3, -1]
    rng = np.random.default_rng(2)
    resid = rng.integers(-20, 20, n - order)
    s = np.zeros(n, dtype=np.int64)
    s[0], s[1] = 100, 105
    for i in range(order, n):
        pred = (coefs[0] * s[i - 1] + coefs[1] * s[i - 2]) >> shift
        s[i] = pred + resid[i - order]

    def body(bw):
        bw.write(0, 1)
        bw.write(32 | (order - 1), 6)   # LPC, order 2
        bw.write(0, 1)                  # no wasted bits
        for v in s[:order]:
            bw.swrite(int(v), 16)
        bw.write(prec - 1, 4)
        bw.swrite(shift, 5)
        for cf in coefs:
            bw.swrite(cf, prec)
        bw.write(0, 2)                  # Rice method 0
        bw.write(0, 4)                  # partition order 0
        bw.write(6, 4)                  # Rice parameter
        for v in resid:
            v = int(v)
            z = (v << 1) if v >= 0 else ((-v) << 1) - 1
            bw.write(1, (z >> 6) + 1)
            bw.write(z & 63, 6)

    blob = _manual_stream(s[:, None], 8000, 16, body)
    dec, _, _ = decode_flac(blob)
    assert np.array_equal(dec[:, 0], s)


def test_rice2_method_decodes():
    """Residual coding method 1 (5-bit Rice2 parameters)."""
    n = 32
    s = np.arange(n, dtype=np.int64) * 3 + 7    # order-1 fixed, resid = 3

    def body(bw):
        bw.write(0, 1)
        bw.write(8 + 1, 6)              # FIXED order 1
        bw.write(0, 1)
        bw.swrite(int(s[0]), 16)
        bw.write(1, 2)                  # Rice2
        bw.write(0, 4)
        bw.write(2, 5)                  # 5-bit param = 2
        for _ in range(n - 1):
            z = 3 << 1                  # resid 3 zigzag = 6
            bw.write(1, (z >> 2) + 1)
            bw.write(z & 3, 2)

    blob = _manual_stream(s[:, None], 8000, 16, body)
    dec, _, _ = decode_flac(blob)
    assert np.array_equal(dec[:, 0], s)


def test_escape_partition_decodes():
    """Rice escape code: raw nbits-coded residuals instead of Rice."""
    n = 16
    rng = np.random.default_rng(4)
    resid = rng.integers(-100, 100, n - 1)
    s = np.zeros(n, dtype=np.int64)
    s[0] = 50
    for i in range(1, n):
        s[i] = s[i - 1] + resid[i - 1]

    def body(bw):
        bw.write(0, 1)
        bw.write(8 + 1, 6)              # FIXED order 1
        bw.write(0, 1)
        bw.swrite(int(s[0]), 16)
        bw.write(0, 2)
        bw.write(0, 4)
        bw.write(15, 4)                 # 4-bit escape
        bw.write(9, 5)                  # 9 raw bits per residual
        for v in resid:
            bw.swrite(int(v), 9)

    blob = _manual_stream(s[:, None], 8000, 16, body)
    dec, _, _ = decode_flac(blob)
    assert np.array_equal(dec[:, 0], s)


def test_wasted_bits_decode():
    """Wasted-bits-per-sample: samples stored >>2, shifted back on output."""
    n = 24
    s = (np.arange(n, dtype=np.int64) - 12) * 4   # all multiples of 4

    def body(bw):
        bw.write(0, 1)
        bw.write(1, 6)                  # VERBATIM
        bw.write(1, 1)                  # wasted flag
        bw.write(1, 2)                  # unary 1 -> wasted = 2
        for v in s >> 2:
            bw.swrite(int(v), 14)       # bps minus wasted

    blob = _manual_stream(s[:, None], 8000, 16, body)
    dec, _, _ = decode_flac(blob)
    assert np.array_equal(dec[:, 0], s)


# ------------------------------------------------------- spark integration

@pytest.mark.spark
def test_audio_features_flac_real_decode(spark):
    """audio_features: a FLAC row now yields FULL features (err null) that
    match the SAME samples through the WAV path bit-for-bit; mp3/ogg stay
    metadata-only/needs-ffmpeg."""
    import io
    import wave

    from fetcho_spark.operators import multimodal as MM

    rate = 8000
    t = np.arange(rate * 2)
    pcm = (0.5 * 32767 * np.sin(2 * np.pi * 440.0 * t / rate)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    flac_blob = encode_flac(pcm.astype(np.int64), rate, 16)
    df = spark.createDataFrame(
        [("wav", bytearray(buf.getvalue())),
         ("flac", bytearray(flac_blob)),
         ("mp3", bytearray(b"ID3\x04not-really"))],
        "audio_id string, bytes binary")
    got = {r["audio_id"]: r for r in MM.audio_features(df).collect()}
    assert got["flac"]["err"] is None
    for k in ("duration_s", "rms", "zcr"):
        assert got["flac"][k] == pytest.approx(got["wav"][k], abs=1e-12), k
    assert got["flac"]["sample_rate"] == rate
    assert got["flac"]["n_channels"] == 1
    assert got["mp3"]["err"] in ("needs-ffmpeg", "metadata-only")
