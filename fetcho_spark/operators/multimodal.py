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


def audio_features(audio: DataFrame, id_col: str = "audio_id",
                   bytes_col: str = "bytes") -> DataFrame:
    """STUB: audio decode needs libsndfile/ffmpeg — absent here. The op
    exists so the schema contract is pinned; it raises on use."""
    raise NotImplementedError(
        "audio decode requires libsndfile/ffmpeg (not in this container); "
        "plumbing contract: (audio_id string, bytes binary) → "
        "(audio_id, duration_s double, rms double, zcr double)")
