"""Deterministic image codec + perceptual hash + PSNR (numpy, vectorizable).

Three codecs ride the seam below: the vectorized deterministic STAND-IN
(this module — fast, used by the bench fixtures), the REAL from-scratch
``pure`` codec (functions/pure_codec.py — spec-compliant PNG + baseline
JFIF/JPEG, decodes actual ``\\x89PNG``/``\\xff\\xd8`` bytes with no PIL;
entropy coding is sequential Python, so it trades throughput for format
reality), and ``pil`` (auto-available the day Pillow lands). The Spark-side
plumbing, schemas, batch shapes and invariants are identical across all
three and contract-tested per codec (tests/test_codec.py).

**Codec seam**: every encode/decode/phash call resolves through
:func:`get_codec` — pick the implementation with the ``FETCHO_SPARK_CODEC``
env var (read on the DRIVER; the chosen codec object ships to executors
inside the Arrow-UDF closure, so no executor env plumbing is needed) or by
passing a codec object explicitly (any object with ``encode(pixels, fmt) ->
bytes``, ``decode(bytes) -> (pixels, fmt)``, ``phash64(pixels) -> int``).
A :class:`PILCodec` is pre-registered and activates automatically if PIL
ever lands in the container (``FETCHO_SPARK_CODEC=pil``); the payload
contract test (tests/test_codec.py) runs the full invariant suite against
every available codec, so the swap is a config flip with an existing green
gate. The stand-in:

- ``png``  — lossless: zlib-compressed raw RGB8 + 16-byte header.
- ``jpeg`` — lossy: channel quantization to multiples of Q=4 then zlib.
  Max per-pixel error 2 → PSNR vs the original ≈ 46-48 dB, comfortably over
  the ≥40 dB invariant from BASELINE.json input_hint, while still exercising
  a genuine lossy round-trip (decode ≠ original bytes' source pixels).

The per-row invariant mirrors the north rule: re-decode of ``bytes`` matches
stored ``(w, h, fmt)``, recomputed phash == stored ``phash``, PSNR ≥ 40 dB for
lossy formats, caption byte-equal. The reference *blocks* image fetches
(/root/reference/common/ResourceFetchers/DefaultBlockProvider.cs:46-53); this
build inverts that predicate — the corpus IS images (SURVEY.md §2.2 P4).
"""

from __future__ import annotations

import importlib.util
import os
import struct
import zlib

import numpy as np

MAGIC = b"FSIM"  # fetcho_spark image
_JPEG_Q = 4


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: (h, w, 3) uint8 → bytes in the stand-in container format."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    if fmt == "png":
        payload = pixels.tobytes()
        code = 0
    elif fmt == "jpeg":
        q = (pixels.astype(np.uint16) + _JPEG_Q // 2) // _JPEG_Q
        payload = np.minimum(q, 255 // _JPEG_Q).astype(np.uint8).tobytes()
        code = 1
    else:
        raise NotImplementedError(f"format {fmt!r} (real codecs need PIL)")
    return MAGIC + struct.pack("<BHH", code, w, h) + zlib.compress(payload, 6)


def decode(data: bytes) -> tuple[np.ndarray, str]:
    """bytes → ((h, w, 3) uint8 pixels, fmt)."""
    if data[:4] != MAGIC:
        raise ValueError("not a FSIM payload (real JPEG/PNG decode needs PIL)")
    code, w, h = struct.unpack("<BHH", data[4:9])
    raw = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8)
    px = raw.reshape(h, w, 3)
    if code == 0:
        return px.copy(), "png"
    if code == 1:
        return (px.astype(np.uint16) * _JPEG_Q).clip(0, 255).astype(np.uint8), "jpeg"
    raise ValueError(f"unknown codec id {code}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf when identical."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0.0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


_SAMPLE_GRID = 16


def sample_grid(pixels: np.ndarray, g: int = _SAMPLE_GRID) -> np.ndarray:
    """Deterministic g×g strided pixel sample of an (h, w, 3) image —
    the fixture stores this of the ORIGINAL (pre-encode) pixels so the
    fetch-side verify can compute a real PSNR of its decode against the
    reference without shipping full reference frames."""
    h, w = pixels.shape[:2]
    gy, gx = min(g, h), min(g, w)
    ys = (np.arange(gy) * h) // gy
    xs = (np.arange(gx) * w) // gx
    return pixels[np.ix_(ys, xs)]


def ref_sample_bytes(pixels: np.ndarray, g: int = _SAMPLE_GRID) -> bytes:
    """Serialized reference sample: 2-byte (gy, gx) header + raw uint8 RGB."""
    s = sample_grid(pixels, g)
    return struct.pack("<BB", s.shape[0], s.shape[1]) + s.tobytes()


def ref_sample_decode(data: bytes) -> np.ndarray:
    gy, gx = struct.unpack("<BB", data[:2])
    return np.frombuffer(data[2:], dtype=np.uint8).reshape(gy, gx, 3)


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: 8×8 block-mean of grayscale vs global mean.

    Deterministic average-hash (public technique); signed int64 so it round
    trips through a Spark LongType column.
    """
    g = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = g.shape
    # integral-image block means for exact determinism at any size ≥ 8
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    ii = np.zeros((h + 1, w + 1))
    ii[1:, 1:] = g.cumsum(0).cumsum(1)
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            y0, y1, x0, x1 = ys[i], ys[i + 1], xs[j], xs[j + 1]
            blocks[i, j] = (ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]) / (
                (y1 - y0) * (x1 - x0)
            )
    bits = (blocks > blocks.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= 1 << 63 else v


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


# --------------------------------------------------------------- codec seam

class StandinCodec:
    """The deterministic zlib+quantization stand-in (module functions)."""
    name = "standin"
    encode = staticmethod(encode)
    decode = staticmethod(decode)
    phash64 = staticmethod(phash64)


class PILCodec:
    """Real JPEG/PNG codec via Pillow — registered but only *available*
    when PIL is importable (it is not in this container; the contract test
    auto-includes it the day it appears). Same pixel-space phash."""
    name = "pil"

    @staticmethod
    def encode(pixels: np.ndarray, fmt: str) -> bytes:
        import io

        from PIL import Image
        if pixels.dtype != np.uint8 or pixels.ndim != 3 \
                or pixels.shape[2] != 3:
            raise ValueError("expected (h, w, 3) uint8")
        buf = io.BytesIO()
        pil_fmt = {"png": "PNG", "jpeg": "JPEG"}.get(fmt)
        if pil_fmt is None:
            raise NotImplementedError(f"format {fmt!r}")
        kw = {"quality": 95} if pil_fmt == "JPEG" else {}
        Image.fromarray(pixels, "RGB").save(buf, format=pil_fmt, **kw)
        return buf.getvalue()

    @staticmethod
    def decode(data: bytes) -> tuple[np.ndarray, str]:
        import io

        from PIL import Image
        im = Image.open(io.BytesIO(data))
        fmt = {"PNG": "png", "JPEG": "jpeg"}.get(im.format or "",
                                                 (im.format or "?").lower())
        return np.asarray(im.convert("RGB"), dtype=np.uint8), fmt

    phash64 = staticmethod(phash64)


def _pure_codec():
    from .pure_codec import PureCodec
    return PureCodec


class _PureCodecProxy:
    """Lazy import indirection so codec.py stays import-light; resolves to
    pure_codec.PureCodec — REAL from-scratch PNG + baseline JPEG (round 4:
    actual ``\\x89PNG``/``\\xff\\xd8`` bytes decode in this container with
    no PIL; see pure_codec.py for the honest scope/throughput notes)."""
    name = "pure"
    encode = staticmethod(lambda pixels, fmt: _pure_codec().encode(pixels, fmt))
    decode = staticmethod(lambda data: _pure_codec().decode(data))
    phash64 = staticmethod(phash64)


_CODECS = {"standin": StandinCodec, "pil": PILCodec,
           "pure": _PureCodecProxy}


def available_codecs() -> list[str]:
    out = ["standin", "pure"]
    if importlib.util.find_spec("PIL") is not None:
        out.append("pil")
    return out


def get_codec(name: str | None = None):
    """Resolve the active codec: explicit name > ``FETCHO_SPARK_CODEC`` env
    (driver-side) > the stand-in. Called on the DRIVER; the resolved object
    is shipped to executors in the UDF closure, so mid-session env changes
    and custom codec objects both behave predictably."""
    name = name or os.environ.get("FETCHO_SPARK_CODEC", "standin")
    if name not in _CODECS:
        raise KeyError(
            f"unknown codec {name!r}; registered: {sorted(_CODECS)}")
    if name == "pil" and importlib.util.find_spec("PIL") is None:
        raise RuntimeError("FETCHO_SPARK_CODEC=pil but PIL is not installed")
    return _CODECS[name]
