"""BMP + baseline TIFF codecs (functions/bmp_tiff.py) — spec-stream tests.

Round trips run through our own encoders; decoder-only paths (palette /
1-4 bit / RLE BMPs, LZW / gray / palette TIFFs) use HAND-BUILT streams
assembled from the specs, the test_pure_codec pattern.
"""

import struct
import zlib

import numpy as np
import pytest

from fetcho_spark.functions.bmp_tiff import (
    _packbits_encode, bmp_decode, bmp_encode, tiff_decode, tiff_encode,
)


def _img(h=13, w=17, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


# ------------------------------------------------------------------- BMP

def test_bmp_roundtrip():
    px = _img()
    assert np.array_equal(bmp_decode(bmp_encode(px)), px)


def test_bmp_roundtrip_odd_width_padding():
    px = _img(5, 3, seed=1)                   # stride padding exercised
    assert np.array_equal(bmp_decode(bmp_encode(px)), px)


def _bmp_manual(w, h, bpp, palette, pixel_bytes, comp=0, top_down=False,
                masks=b""):
    n_colors = len(palette)
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1,
                       bpp, comp, len(pixel_bytes), 0, 0, n_colors, 0)
    off = 14 + 40 + len(masks) + len(pal)
    hdr = struct.pack("<2sIHHI", b"BM", off + len(pixel_bytes), 0, 0, off)
    return hdr + info + masks + pal + pixel_bytes


def test_bmp_8bit_palette_bottom_up():
    # 2x3, palette ids row0=[0,1,2] row1=[2,1,0]; rows stored bottom-up,
    # each padded to 4 bytes
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    rows_disk = bytes([2, 1, 0, 0]) + bytes([0, 1, 2, 0])   # bottom first
    blob = _bmp_manual(3, 2, 8, pal, rows_disk)
    px = bmp_decode(blob)
    assert px.shape == (2, 3, 3)
    assert tuple(px[0, 0]) == (255, 0, 0)
    assert tuple(px[0, 2]) == (0, 0, 255)
    assert tuple(px[1, 0]) == (0, 0, 255)


def test_bmp_4bit_and_1bit():
    pal4 = [(i * 16, 0, 0) for i in range(16)]
    # 3 px/row, 4-bit: packed hi-nibble first -> row [1,2,3] = 0x12 0x30
    blob = _bmp_manual(3, 1, 4, pal4, bytes([0x12, 0x30, 0, 0]))
    px = bmp_decode(blob)
    assert [int(p[0]) for p in px[0]] == [16, 32, 48]
    pal1 = [(0, 0, 0), (255, 255, 255)]
    # 10 px row of alternating bits: 0b10101010 0b10xxxxxx
    blob = _bmp_manual(10, 1, 1, pal1, bytes([0xAA, 0x80, 0, 0]))
    px = bmp_decode(blob)
    assert [int(p[0]) for p in px[0]] == [255, 0] * 5


def test_bmp_top_down_and_32bit():
    # 32-bit BI_RGB, top-down: first disk row IS the top row
    row0 = struct.pack("<II", 0x00FF0000, 0x0000FF00)   # BGRX: red, green
    row1 = struct.pack("<II", 0x000000FF, 0x00FFFFFF)
    blob = _bmp_manual(2, 2, 32, [], row0 + row1, top_down=True)
    px = bmp_decode(blob)
    assert tuple(px[0, 0]) == (255, 0, 0)
    assert tuple(px[0, 1]) == (0, 255, 0)
    assert tuple(px[1, 0]) == (0, 0, 255)
    assert tuple(px[1, 1]) == (255, 255, 255)


def test_bmp_bitfields():
    masks = struct.pack("<III", 0x000000FF, 0x0000FF00, 0x00FF0000)  # RGBX
    row = struct.pack("<I", 0x00C08040)       # R=0x40 G=0x80 B=0xC0
    blob = _bmp_manual(1, 1, 32, [], row, comp=3, masks=masks)
    assert tuple(bmp_decode(blob)[0, 0]) == (0x40, 0x80, 0xC0)


def test_bmp_rle8():
    pal = [(9, 9, 9), (1, 2, 3), (4, 5, 6)]
    # disk row0 (bottom): run of 3 x idx1; EOL; disk row1: absolute-mode
    # pixels [2,1,0] (absolute needs >= 3 px per spec; 3 bytes + 1 pad);
    # EOB
    rle = bytes([3, 1]) + bytes([0, 0]) + bytes([0, 3, 2, 1, 0, 0]) \
        + bytes([0, 1])
    blob = _bmp_manual(3, 2, 8, pal, rle, comp=1)
    px = bmp_decode(blob)
    assert [tuple(p) for p in px[1]] == [(1, 2, 3)] * 3      # bottom row
    assert tuple(px[0, 0]) == (4, 5, 6)
    assert tuple(px[0, 1]) == (1, 2, 3)
    assert tuple(px[0, 2]) == (9, 9, 9)


def test_bmp_garbage_and_truncation():
    with pytest.raises(ValueError):
        bmp_decode(b"BMnot-a-real-bitmap")
    blob = bmp_encode(_img())
    for cut in (10, 30, 60, len(blob) - 5):
        with pytest.raises(ValueError):
            bmp_decode(blob[:cut])


# ------------------------------------------------------------------ TIFF

@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("comp", ["none", "packbits", "deflate"])
@pytest.mark.parametrize("pred", [False, True])
def test_tiff_roundtrip(bo, comp, pred):
    px = _img(21, 9, seed=2)
    blob = tiff_encode(px, compression=comp, byte_order=bo,
                       rows_per_strip=8, predictor=pred)
    assert np.array_equal(tiff_decode(blob), px)


def test_tiff_single_strip_roundtrip():
    px = _img(4, 4, seed=3)
    blob = tiff_encode(px, rows_per_strip=64)    # one strip: inline offsets
    assert np.array_equal(tiff_decode(blob), px)


def _lzw_encode_literals(data: bytes) -> bytes:
    """Spec-valid TIFF LZW stream that emits only literal codes (plus
    Clear/EOI) with the early width bump — exercises the decoder's table
    growth and width schedule without a full encoder."""
    out = bytearray()
    acc = nbits = 0

    def put(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    width, table_len = 9, 258
    put(256, width)                           # Clear
    for i, b in enumerate(data):
        put(b, width)
        if i > 0:
            table_len += 1                    # decoder adds one entry/code
        if table_len + 1 >= (1 << width) and width < 12:
            width += 1
    put(257, width)                           # EOI
    if nbits:
        put(0, 8 - nbits)
    return bytes(out)


def test_tiff_lzw_decodes():
    px = _img(23, 31, seed=4)                 # >510 bytes: width bumps
    base = tiff_encode(px, rows_per_strip=64)
    raw = px.tobytes()
    lzw = _lzw_encode_literals(raw)
    # patch the uncompressed single-strip file into an LZW one
    blob = bytearray(tiff_encode(px, rows_per_strip=64))
    idx = blob.find(raw)
    assert idx > 0
    patched = blob[:idx] + lzw + blob[idx + len(raw):]
    # fix Compression tag (259) and StripByteCounts (279), and shift every
    # offset that pointed past the strip
    delta = len(lzw) - len(raw)
    out = bytearray(patched)
    (ifd_off,) = struct.unpack_from("<I", base, 4)
    struct.pack_into("<I", out, 4, ifd_off + delta)
    (n_tags,) = struct.unpack_from("<H", base, ifd_off)
    new_ifd = ifd_off + delta
    for i in range(n_tags):
        e = new_ifd + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from("<HHI", out, e)
        if tag == 259:
            struct.pack_into("<HHII", out, e, 259, 3, 1, 5)
        elif tag == 279:
            struct.pack_into("<I", out, e + 8, len(lzw))
        elif tag in (258,):                   # BitsPerSample data pointer
            (off,) = struct.unpack_from("<I", out, e + 8)
            if off > idx:
                struct.pack_into("<I", out, e + 8, off + delta)
    assert np.array_equal(tiff_decode(bytes(out)), px)


def _tiff_gray(photo: int) -> bytes:
    g = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16
    strip = g.tobytes()
    entries = []

    def entry(tag, typ, cnt, val):
        entries.append(struct.pack("<HHII", tag, typ, cnt, val))

    entry(256, 4, 1, 4)
    entry(257, 4, 1, 4)
    entry(258, 3, 1, 8)
    entry(259, 3, 1, 1)
    entry(262, 3, 1, photo)
    entry(273, 4, 1, 8)
    entry(277, 3, 1, 1)
    entry(278, 4, 1, 4)
    entry(279, 4, 1, len(strip))
    ifd_off = 8 + len(strip)
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) \
        + struct.pack("<I", 0)
    return (b"II*\x00" + struct.pack("<I", ifd_off) + strip + ifd), g


def test_tiff_grayscale_both_polarities():
    blob, g = _tiff_gray(1)
    px = tiff_decode(blob)
    assert np.array_equal(px[:, :, 0], g)
    assert np.array_equal(px[:, :, 0], px[:, :, 2])
    blob0, g = _tiff_gray(0)                  # 0 = white-is-zero
    px = tiff_decode(blob0)
    assert np.array_equal(px[:, :, 0], 255 - g)


def test_tiff_palette():
    idx = np.array([[0, 1], [2, 3]], np.uint8)
    strip = idx.tobytes()
    cmap = []
    for ch in range(3):
        vals = [0] * 256
        for i in range(4):
            vals[i] = (i * 20 + ch) * 257     # 16-bit TIFF colormap scale
        cmap += vals
    cmap_bytes = struct.pack("<768H", *cmap)
    entries = []

    def entry(tag, typ, cnt, val):
        entries.append(struct.pack("<HHII", tag, typ, cnt, val))

    cmap_off = 8 + len(strip)
    entry(256, 4, 1, 2)
    entry(257, 4, 1, 2)
    entry(258, 3, 1, 8)
    entry(259, 3, 1, 1)
    entry(262, 3, 1, 3)
    entry(273, 4, 1, 8)
    entry(277, 3, 1, 1)
    entry(278, 4, 1, 2)
    entry(279, 4, 1, len(strip))
    entry(320, 3, 768, cmap_off)
    ifd_off = cmap_off + len(cmap_bytes)
    blob = (b"II*\x00" + struct.pack("<I", ifd_off) + strip + cmap_bytes
            + struct.pack("<H", len(entries)) + b"".join(entries)
            + struct.pack("<I", 0))
    px = tiff_decode(blob)
    assert tuple(px[0, 0]) == (0, 1, 2)
    assert tuple(px[1, 1]) == (60, 61, 62)


def test_tiff_garbage_and_truncation():
    with pytest.raises(ValueError):
        tiff_decode(b"II*\x00garbage-here")
    blob = tiff_encode(_img(), compression="packbits")
    # len-20 cuts INTO the IFD entries; cutting only the trailing
    # next-IFD pointer is legitimately decodable, so it is not here
    for cut in (6, 20, 100, len(blob) - 20):
        with pytest.raises(ValueError):
            tiff_decode(blob[:cut])


def test_packbits_encoder_spec_cases():
    from fetcho_spark.functions.bmp_tiff import _packbits_decode
    for payload in (b"", b"A", b"AAAB", b"ABCABC", b"A" * 300,
                    bytes(range(256)) * 2):
        assert _packbits_decode(_packbits_encode(payload)) == payload


def test_probe_image_tiff_dims():
    from fetcho_spark.functions.mediameta import probe_image
    px = _img(11, 7, seed=6)
    for bo in ("<", ">"):
        m = probe_image(tiff_encode(px, byte_order=bo))
        assert (m["format"], m["width"], m["height"]) == ("tiff", 7, 11)
    m = probe_image(bmp_encode(px))
    assert (m["format"], m["width"], m["height"]) == ("bmp", 7, 11)


def test_pure_codec_dispatches_bmp_tiff():
    from fetcho_spark.functions.pure_codec import PureCodec
    px = _img(8, 8, seed=5)
    for fmt in ("bmp", "tiff"):
        blob = PureCodec.encode(px, fmt)
        dec, got = PureCodec.decode(blob)
        assert got == fmt
        assert np.array_equal(dec, px)
