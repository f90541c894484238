"""Container-metadata probes (functions/mediameta.py) against HAND-BUILT
byte streams from the public specs — MP3 frame headers, FLAC STREAMINFO,
Ogg/Vorbis + Opus pages, ISO-BMFF boxes — plus the Spark operators that
ride them (audio_features metadata-only rows, video_metadata)."""

import struct

import numpy as np
import pytest

from fetcho_spark.functions import mediameta as MM
from fetcho_spark.operators import multimodal as MO


# ----------------------------------------------------------- builders

def build_mp3(n_frames=10, bitrate_idx=9, rate_idx=0, id3=False):
    """MPEG-1 Layer III CBR: 0xFFFB sync, 128 kbps (idx 9), 44.1 kHz."""
    hdr = bytes([0xFF, 0xFB, (bitrate_idx << 4) | (rate_idx << 2), 0x00])
    frame_len = 144 * 128_000 // 44100            # no padding bit
    frame = hdr + b"\x00" * (frame_len - 4)
    out = frame * n_frames
    if id3:
        tag_body = b"\x00" * 100
        out = (b"ID3\x04\x00\x00" + bytes([0, 0, 100 >> 7, 100 & 0x7F])
               + tag_body + out)
    return out


def build_flac(rate=44100, channels=2, total=441_000):
    bits = (rate << 44) | ((channels - 1) << 41) | (15 << 36) | total
    streaminfo = (struct.pack(">HH", 4096, 4096) + b"\x00" * 6
                  + bits.to_bytes(8, "big") + b"\x00" * 16)
    assert len(streaminfo) == 34
    return (b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
            + streaminfo)


def _ogg_page(body: bytes, granule: int, htype=0):
    segs = [255] * (len(body) // 255) + [len(body) % 255]
    return (b"OggS" + bytes([0, htype]) + struct.pack("<q", granule)
            + b"\x00" * 8 + b"\x00" * 4 + bytes([len(segs)]) + bytes(segs)
            + body)


def build_ogg_vorbis(rate=22050, channels=2, total_granule=220_500):
    ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
             + struct.pack("<I", rate) + b"\x00" * 16)
    return _ogg_page(ident, 0, htype=2) + _ogg_page(b"\x05" * 20,
                                                    total_granule, htype=4)


def build_ogg_opus(channels=2, total_granule=96_000):
    head = (b"OpusHead" + bytes([1, channels]) + struct.pack("<H", 312)
            + struct.pack("<I", 48000) + b"\x00" * 3)
    return _ogg_page(head, 0, htype=2) + _ogg_page(b"x" * 10,
                                                   total_granule, htype=4)


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def build_mp4(timescale=1000, duration=12_000, w=640, h=360,
              codec=b"avc1", mvhd_v1=False):
    if mvhd_v1:
        mvhd = (b"\x01\x00\x00\x00" + b"\x00" * 16
                + struct.pack(">IQ", timescale, duration) + b"\x00" * 80)
    else:
        mvhd = (b"\x00\x00\x00\x00" + b"\x00" * 8
                + struct.pack(">II", timescale, duration) + b"\x00" * 80)
    tkhd = (b"\x00\x00\x00\x0f" + b"\x00" * 72
            + struct.pack(">II", w << 16, h << 16))
    entry = _box(codec, b"\x00" * 20)
    stsd = _box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry)
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", minf)
    trak = _box(b"trak", _box(b"tkhd", tkhd) + mdia)
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak)
    return _box(b"ftyp", b"isom\x00\x00\x00\x00mp42") + moov


# ------------------------------------------------------------ probes

def test_probe_mp3_cbr_and_id3():
    m = MM.probe_mp3(build_mp3(10))
    assert (m["format"], m["sample_rate"], m["channels"],
            m["bitrate_kbps"]) == ("mp3", 44100, 2, 128)
    assert abs(m["duration_s"] - 10 * 1152 / 44100) < 1e-9
    m2 = MM.probe_mp3(build_mp3(10, id3=True))
    assert abs(m2["duration_s"] - m["duration_s"]) < 1e-9
    with pytest.raises(ValueError):
        MM.probe_mp3(b"\xff\xfbgarbage-not-frames")


def test_probe_flac_exact_duration():
    m = MM.probe_flac(build_flac())
    assert (m["sample_rate"], m["channels"]) == (44100, 2)
    assert m["duration_s"] == 10.0
    with pytest.raises(ValueError):
        MM.probe_flac(b"fLaX-nope")


def test_probe_ogg_vorbis_and_opus():
    m = MM.probe_ogg(build_ogg_vorbis())
    assert (m["format"], m["sample_rate"], m["channels"]) \
        == ("ogg-vorbis", 22050, 2)
    assert m["duration_s"] == 10.0
    o = MM.probe_ogg(build_ogg_opus())
    assert (o["format"], o["sample_rate"]) == ("ogg-opus", 48000)
    assert o["duration_s"] == 2.0
    with pytest.raises(ValueError):
        MM.probe_ogg(b"OggS" + b"\x00" * 30)


def test_probe_mp4_v0_v1_and_avi():
    m = MM.probe_mp4(build_mp4())
    assert (m["format"], m["brand"]) == ("mp4", "isom")
    assert m["duration_s"] == 12.0
    assert (m["width"], m["height"], m["codec"]) == (640, 360, "avc1")
    v1 = MM.probe_mp4(build_mp4(timescale=90_000, duration=450_000,
                                mvhd_v1=True))
    assert v1["duration_s"] == 5.0
    avi = MO.mjpeg_avi([b"\xff\xd8x\xff\xd9"] * 50, w=32, h=24, fps=25)
    a = MM.probe_avi(avi)
    assert (a["format"], a["width"], a["height"], a["codec"]) \
        == ("avi", 32, 24, "MJPG")
    assert abs(a["duration_s"] - 2.0) < 1e-6


def test_probe_dispatch():
    assert MM.probe_audio(build_flac())["format"] == "flac"
    assert MM.probe_audio(build_ogg_vorbis())["format"] == "ogg-vorbis"
    assert MM.probe_audio(build_mp3(3))["format"] == "mp3"
    assert MM.probe_video(build_mp4())["format"] == "mp4"
    with pytest.raises(ValueError):
        MM.probe_audio(b"\x00\x01\x02 junk")
    with pytest.raises(ValueError):
        MM.probe_video(b"\x00\x01\x02 junk")


# ------------------------------------------------------ Spark operators

@pytest.mark.spark
def test_audio_features_metadata_only_rows(spark):
    """Compressed audio with parseable containers now yields REAL
    rate/channels/duration with err='metadata-only' (rms/zcr stay null —
    those need a decoder); unparseable compressed stays 'needs-ffmpeg'."""
    rows = [("mp3", bytearray(build_mp3(20))),
            ("flac", bytearray(build_flac())),
            ("ogg", bytearray(build_ogg_vorbis())),
            ("bad", bytearray(b"ID3\x04rest-of-an-mp3"))]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    got = {r["audio_id"]: r for r in MO.audio_features(df).collect()}
    m = got["mp3"]
    assert m["err"] == "metadata-only" and m["sample_rate"] == 44100
    assert m["rms"] is None and abs(m["duration_s"] - 20 * 1152 / 44100) < 1e-6
    f = got["flac"]
    assert (f["err"], f["sample_rate"], f["n_channels"],
            f["duration_s"]) == ("metadata-only", 44100, 2, 10.0)
    assert got["ogg"]["sample_rate"] == 22050
    assert got["bad"]["err"] == "needs-ffmpeg"


@pytest.mark.spark
def test_video_metadata_operator(spark):
    frames = [np.zeros((8, 8, 3), dtype=np.uint8)] * 4
    rows = [("mp4", bytearray(build_mp4())),
            ("avi", bytearray(MO.mjpeg_avi([b"\xff\xd8x\xff\xd9"] * 50,
                                           w=32, h=24, fps=25))),
            ("fsvd", bytearray(MO.fake_video(frames))),
            ("junk", bytearray(b"not-a-video"))]
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    got = {r["video_id"]: r for r in MO.video_metadata(df).collect()}
    assert (got["mp4"]["container"], got["mp4"]["width"],
            got["mp4"]["codec"]) == ("mp4", 640, "avc1")
    assert got["mp4"]["duration_s"] == 12.0 and got["mp4"]["err"] is None
    assert (got["avi"]["container"], got["avi"]["codec"]) == ("avi", "MJPG")
    assert got["fsvd"]["container"] == "fsvd" and got["fsvd"]["duration_s"] == 4.0
    assert got["junk"]["err"] == "unrecognized"
