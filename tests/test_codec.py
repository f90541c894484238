"""Payload codec invariants (BASELINE.json input_hint; SURVEY.md §2.8 C12)."""

import numpy as np
import pytest

from fetcho_spark.functions.codec import (
    available_codecs, decode, encode, get_codec, hamming64, phash64, psnr,
    ref_sample_bytes, ref_sample_decode, sample_grid)


def _pixels(seed: int, s: int = 64) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (s, s, 3), dtype=np.uint8)


def test_png_lossless_roundtrip():
    px = _pixels(1)
    dec, fmt = decode(encode(px, "png"))
    assert fmt == "png"
    assert (dec == px).all()
    assert psnr(dec, px) == float("inf")


def test_jpeg_lossy_psnr_over_40db():
    px = _pixels(2)
    dec, fmt = decode(encode(px, "jpeg"))
    assert fmt == "jpeg"
    assert not (dec == px).all()          # genuinely lossy
    assert psnr(dec, px) >= 40.0          # the input_hint invariant


def test_jpeg_decode_deterministic():
    px = _pixels(3)
    data = encode(px, "jpeg")
    a, _ = decode(data)
    b, _ = decode(data)
    assert (a == b).all()


def test_phash_stable_and_discriminative():
    a, b = _pixels(4), _pixels(5)
    assert phash64(a) == phash64(a)
    assert hamming64(phash64(a), phash64(b)) > 4


def test_phash_robust_to_lossy_roundtrip():
    px = _pixels(6)
    dec, _ = decode(encode(px, "jpeg"))
    assert hamming64(phash64(px), phash64(dec)) <= 2


def test_phash_various_sizes():
    for s in (8, 32, 64, 128, 100):
        v = phash64(_pixels(7, s))
        assert -(1 << 63) <= v < (1 << 63)


def test_unknown_format_stubbed():
    with pytest.raises(NotImplementedError):
        encode(_pixels(8), "webp")


def test_ref_sample_roundtrip_and_psnr():
    px = _pixels(9, 100)
    rs = ref_sample_decode(ref_sample_bytes(px))
    assert rs.shape == (16, 16, 3)
    assert (rs == sample_grid(px)).all()
    # lossy decode vs the original sample: finite and over the invariant
    dec, _ = decode(encode(px, "jpeg"))
    p = psnr(sample_grid(dec), rs)
    assert 40.0 <= p < float("inf")


# ----------------------------------------------------------- codec contract
# Every registered-and-available codec must satisfy the payload invariants
# through the REAL Spark verify path — so swapping in PIL (or any future
# codec) is a config flip against an existing green gate. In this container
# only the stand-in is available; the parametrization auto-extends the day
# PIL appears.

@pytest.mark.spark
@pytest.mark.parametrize("codec_name", available_codecs())
def test_codec_contract_payload_invariants(spark, codec_name):
    from fetcho_spark import fixtures as fx
    from fetcho_spark.operators.fetch import verify_payload
    codec = get_codec(codec_name)
    df = spark.createDataFrame(fx.gen_images(12, codec=codec),
                               fx.IMAGES_SCHEMA)
    got = verify_payload(df, codec=codec).collect()
    assert len(got) == 12
    for r in got:
        assert r["decode_ok"] and r["dims_ok"] and r["phash_ok"], r
        assert r["psnr_ok"] and r["psnr_db"] >= 40.0, r
        if r["fmt"] == "png":
            assert r["psnr_db"] == float("inf")
        else:
            assert r["psnr_db"] < float("inf")  # genuinely lossy


@pytest.mark.spark
def test_codec_injection_reaches_executors(spark):
    """An arbitrary codec OBJECT passed to verify_payload must be the one
    executors actually run (cloudpickle closure, not module state): a
    trivially-different wire format proves the injected decode executed."""
    import zlib

    from fetcho_spark import fixtures as fx
    from fetcho_spark.operators.fetch import verify_payload

    class XorCodec:
        name = "xor-test"
        MAGIC = b"XORC"

        @staticmethod
        def encode(pixels, fmt):
            h, w = pixels.shape[:2]
            body = zlib.compress(bytes(b ^ 0x5A for b in pixels.tobytes()))
            return (XorCodec.MAGIC + bytes([0 if fmt == "png" else 1])
                    + w.to_bytes(2, "little") + h.to_bytes(2, "little")
                    + body)

        @staticmethod
        def decode(data):
            if data[:4] != XorCodec.MAGIC:
                raise ValueError("not an XORC payload")
            fmt = "png" if data[4] == 0 else "jpeg"
            w = int.from_bytes(data[5:7], "little")
            h = int.from_bytes(data[7:9], "little")
            raw = bytes(b ^ 0x5A for b in zlib.decompress(data[9:]))
            return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3), fmt

        phash64 = staticmethod(phash64)

    df = spark.createDataFrame(fx.gen_images(6, codec=XorCodec),
                               fx.IMAGES_SCHEMA)
    got = verify_payload(df, codec=XorCodec).collect()
    assert all(r["decode_ok"] and r["phash_ok"] and r["psnr_ok"]
               for r in got)
    # cross-check: the DEFAULT (stand-in) codec cannot decode these bytes,
    # proving the injected codec — not module state — did the work above
    bad = verify_payload(df).collect()
    assert all(not r["decode_ok"] for r in bad)


def test_get_codec_resolution(monkeypatch):
    assert get_codec().name == "standin"
    monkeypatch.setenv("FETCHO_SPARK_CODEC", "standin")
    assert get_codec().name == "standin"
    with pytest.raises(KeyError):
        get_codec("no-such-codec")
    monkeypatch.setenv("FETCHO_SPARK_CODEC", "nope")
    with pytest.raises(KeyError):
        get_codec()


def test_corruption_detected():
    """The invariant must actually be able to fail (VERDICT r1 'What's
    wrong' #2): a payload that decodes fine but to the WRONG pixels must
    produce PSNR far below 40 dB vs the stored reference sample."""
    px = _pixels(10)
    ref = ref_sample_decode(ref_sample_bytes(px))
    other, _ = decode(encode(_pixels(11), "jpeg"))  # same dims, wrong content
    assert psnr(sample_grid(other), ref) < 20.0
    # and a 1-byte flip in the compressed stream must fail decode outright
    data = bytearray(encode(px, "jpeg"))
    data[len(data) // 2] ^= 0xFF
    with pytest.raises(Exception):
        decode(bytes(data))
