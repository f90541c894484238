"""From-scratch BMP and baseline TIFF codecs — no PIL.

Written from the public specifications (BMP: Windows BITMAPINFOHEADER
layout; TIFF: TIFF 6.0 spec), the same pattern as this repo's
PNG/JPEG/GIF/WebP/FLAC codecs. Registered through the pure codec's
magic dispatch so C12 payload paths and `image_features` can decode
actual ``BM`` / ``II*`` / ``MM*`` bytes.

Scope (honest):
- BMP decode: BITMAPINFOHEADER (and the larger V4/V5 headers), 1/4/8-bit
  palette, 24/32-bit BGR(A), bottom-up and top-down rows, BI_RGB and
  RLE8/RLE4 compression. BI_BITFIELDS handles the common 8-bits-per-
  channel masks. Encode: 24-bit BI_RGB.
- TIFF decode: both byte orders, first IFD; 8-bit grayscale / RGB(A) /
  palette; strips with Compression = none(1) / LZW(5) / deflate(8) /
  PackBits(32773); horizontal-difference Predictor(2); chunky planar
  config only. Encode: uncompressed or PackBits chunky RGB (fixture
  builder for round-trip tests).

TIFF's LZW is NOT GIF's: MSB-first code packing, fixed 8-bit symbols,
code width grows one code EARLY (at 511/1023/2047), 256=ClearCode,
257=EOI — implemented per TIFF 6.0 section 13.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ================================================================== BMP

def bmp_encode(pixels: np.ndarray) -> bytes:
    """8-bit RGB array (h, w, 3) → 24-bit bottom-up BI_RGB BMP."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    pad = b"\x00" * (stride - w * 3)
    for row in px[::-1]:                     # bottom-up
        body += row[:, ::-1].tobytes()       # RGB → BGR
        body += pad
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    return hdr + info + bytes(body)


def _bmp_palette(data: bytes, off: int, n: int) -> np.ndarray:
    pal = np.frombuffer(data[off:off + 4 * n], np.uint8).reshape(-1, 4)
    return pal[:, [2, 1, 0]].copy()          # BGRX → RGB


def _bmp_rle(data: bytes, w: int, h: int, four_bit: bool) -> np.ndarray:
    """RLE8/RLE4 per the Windows spec: runs, absolute mode, EOL/EOB/delta."""
    out = np.zeros((h, w), np.uint8)
    x = y = pos = 0
    while pos + 1 < len(data) and y < h:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt:                              # encoded run
            if four_bit:
                pair = [(val >> 4) & 0xF, val & 0xF]
                for i in range(cnt):
                    if x < w:
                        out[y, x] = pair[i & 1]
                    x += 1
            else:
                end = min(x + cnt, w)
                out[y, x:end] = val
                x += cnt
        elif val == 0:                       # end of line
            x, y = 0, y + 1
        elif val == 1:                       # end of bitmap
            break
        elif val == 2:                       # delta
            if pos + 1 >= len(data):
                raise ValueError("bmp: truncated RLE delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:                                # absolute mode: val pixels
            if four_bit:
                nbytes = (val + 1) // 2
                chunk = data[pos:pos + nbytes]
                for i in range(val):
                    b = chunk[i // 2]
                    v = (b >> 4) & 0xF if i % 2 == 0 else b & 0xF
                    if x < w:
                        out[y, x] = v
                    x += 1
                pos += nbytes + (nbytes & 1)  # word-aligned
            else:
                for i in range(val):
                    if x < w:
                        out[y, x] = data[pos + i]
                    x += 1
                pos += val + (val & 1)
    return out


def bmp_decode(data: bytes) -> np.ndarray:
    """BMP → (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("bmp: bad magic/truncated header")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (isize,) = struct.unpack_from("<I", data, 14)
    if isize < 40:
        raise ValueError("bmp: pre-BITMAPINFOHEADER formats unsupported")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    _planes, bpp = struct.unpack_from("<HH", data, 26)
    (comp,) = struct.unpack_from("<I", data, 30)
    (n_colors,) = struct.unpack_from("<I", data, 46)
    top_down = h_raw < 0
    h = abs(h_raw)
    if w <= 0 or h == 0 or w * h > 64_000_000:
        raise ValueError("bmp: bad dimensions")
    pal_off = 14 + isize
    if comp == 3 and isize == 40:
        pal_off += 12                        # legacy bitfields masks
    if comp in (1, 2):                       # RLE8 / RLE4
        if (comp == 1 and bpp != 8) or (comp == 2 and bpp != 4):
            raise ValueError("bmp: RLE bpp mismatch")
        pal = _bmp_palette(data, pal_off, n_colors or (1 << bpp))
        idx = _bmp_rle(data[pix_off:], w, h, four_bit=(comp == 2))
        if idx.max(initial=0) >= len(pal):
            raise ValueError("bmp: palette index out of range")
        out = pal[idx]
        return out if top_down else out[::-1].copy()
    if comp == 3:
        rm, gm, bm = struct.unpack_from("<III", data, 54)
        masks = {0x00FF0000: 16, 0x0000FF00: 8, 0x000000FF: 0,
                 0xFF000000: 24}
        if not all(m in masks for m in (rm, gm, bm)) or bpp != 32:
            raise ValueError("bmp: only 8-bit-per-channel bitfields")
        shifts = (masks[rm], masks[gm], masks[bm])
    elif comp != 0:
        raise ValueError(f"bmp: unsupported compression {comp}")
    stride = ((w * bpp + 31) // 32) * 4
    need = stride * h
    raw = data[pix_off:pix_off + need]
    if len(raw) < need:
        raise ValueError("bmp: truncated pixel data")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride)
    if bpp == 24:
        px = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]
    elif bpp == 32:
        u32 = rows.view("<u4")[:, :w]
        if comp == 3:
            px = np.stack([(u32 >> s) & 0xFF for s in shifts],
                          axis=2).astype(np.uint8)
        else:
            px = rows.reshape(h, stride // 4, 4)[:, :w, [2, 1, 0]]
    elif bpp in (1, 4, 8):
        pal = _bmp_palette(data, pal_off, n_colors or (1 << bpp))
        if bpp == 8:
            idx = rows[:, :w]
        elif bpp == 4:
            hi = rows >> 4
            lo = rows & 0xF
            idx = np.stack([hi, lo], axis=2).reshape(h, -1)[:, :w]
        else:
            bits = np.unpackbits(rows, axis=1)
            idx = bits[:, :w]
        if idx.max(initial=0) >= len(pal):
            raise ValueError("bmp: palette index out of range")
        px = pal[idx]
    else:
        raise ValueError(f"bmp: unsupported bpp {bpp}")
    px = np.ascontiguousarray(px)
    return px if top_down else px[::-1].copy()


# ================================================================== TIFF

_TT_BYTE, _TT_ASCII, _TT_SHORT, _TT_LONG = 1, 2, 3, 4
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _tiff_lzw_decode(data: bytes) -> bytes:
    """TIFF 6.0 section-13 LZW: MSB-first packing, ClearCode 256, EOI 257,
    width bump one code early (when next code would be 511/1023/2047)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                reset()
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("tiff: bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("tiff: LZW code out of range")
            out += entry
            prev = entry
            # TIFF bumps EARLY: when the NEXT add would not fit
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n < 128:                          # literal run of n+1
            out += data[pos:pos + n + 1]
            pos += n + 1
        elif n > 128:                        # repeat next byte 257-n times
            if pos >= len(data):
                raise ValueError("tiff: truncated PackBits")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    return bytes(out)


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i += run
        else:
            j = i + 1
            while (j < n and j - i < 128
                   and not (j + 1 < n and row[j] == row[j + 1])):
                j += 1
            out += bytes([j - i - 1]) + row[i:j]
            i = j
    return bytes(out)


def tiff_decode(data: bytes) -> np.ndarray:
    """Baseline TIFF → (h, w, 3) uint8 RGB (first IFD)."""
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("tiff: bad magic")
    if len(data) < 8:
        raise ValueError("tiff: truncated header")
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    if ifd_off + 2 > len(data):
        raise ValueError("tiff: truncated IFD offset")
    (n_tags,) = struct.unpack_from(bo + "H", data, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        e = ifd_off + 2 + 12 * i
        if e + 12 > len(data):
            raise ValueError("tiff: truncated IFD")
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, e)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * cnt
        off = e + 8 if total <= 4 else struct.unpack_from(bo + "I",
                                                          data, e + 8)[0]
        if off + total > len(data):
            raise ValueError("tiff: tag value out of bounds")
        fmtc = {1: "B", 2: "B", 3: "H", 4: "I"}.get(typ)
        if fmtc is None:
            vals = [struct.unpack_from(bo + "II", data,
                                       off + 8 * k)[0] for k in range(cnt)]
        else:
            vals = list(struct.unpack_from(bo + str(cnt) + fmtc, data, off))
        tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"tiff: missing tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise ValueError("tiff: bad dimensions")
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bps = tags.get(258, [8] * spp)
    if any(b != 8 for b in bps):
        raise ValueError("tiff: only 8 bits per sample")
    if one(284, 1) != 1:
        raise ValueError("tiff: planar configuration 2 unsupported")
    predictor = one(317, 1)
    rows_per_strip = one(278, h)
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("tiff: missing strip tables")

    decomp = {1: lambda b: b, 5: _tiff_lzw_decode,
              8: zlib.decompress, 32773: _packbits_decode}.get(comp)
    if decomp is None:
        raise ValueError(f"tiff: unsupported compression {comp}")
    raw = bytearray()
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(data):
            raise ValueError("tiff: strip out of bounds")
        strip = decomp(data[off:off + cnt])
        need = min(rows_per_strip, h - len(raw) // (w * spp)) * w * spp
        if len(strip) < need:
            raise ValueError("tiff: short strip")
        raw += strip[:need]
    if len(raw) < h * w * spp:
        raise ValueError("tiff: not enough strip data")
    arr = np.frombuffer(bytes(raw[:h * w * spp]),
                        np.uint8).reshape(h, w, spp)
    if predictor == 2:                       # undo horizontal differencing
        arr = np.cumsum(arr, axis=1, dtype=np.uint8)
    elif predictor != 1:
        raise ValueError(f"tiff: unsupported predictor {predictor}")
    if photo in (0, 1) and spp == 1:         # grayscale (0 = inverted)
        g = arr[:, :, 0]
        if photo == 0:
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2).copy()
    if photo == 3 and spp == 1:              # palette
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("tiff: missing/short ColorMap")
        pal = (np.array(cmap[:3 * 256], np.uint32)
               .reshape(3, 256).T // 257).astype(np.uint8)
        return pal[arr[:, :, 0]]
    if photo == 2 and spp >= 3:              # RGB(A) — drop alpha
        return arr[:, :, :3].copy()
    raise ValueError(f"tiff: unsupported photometric {photo}/spp {spp}")


def tiff_encode(pixels: np.ndarray, compression: str = "none",
                byte_order: str = "<", rows_per_strip: int = 64,
                predictor: bool = False) -> bytes:
    """8-bit RGB (h, w, 3) → chunky TIFF. ``compression``: ``none`` /
    ``packbits`` / ``deflate``. Fixture builder for decoder tests (both
    byte orders, multi-strip, optional horizontal predictor)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    bo = byte_order
    if bo not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")
    src = px
    if predictor:
        d = px.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        src = (d & 0xFF).astype(np.uint8)
    strips = []
    for y0 in range(0, h, rows_per_strip):
        body = src[y0:y0 + rows_per_strip].tobytes()
        if compression == "packbits":
            body = _packbits_encode(body)
        elif compression == "deflate":
            body = zlib.compress(body)
        elif compression != "none":
            raise ValueError("compression must be none/packbits/deflate")
        strips.append(body)
    comp_code = {"none": 1, "packbits": 32773, "deflate": 8}[compression]

    header = bytearray(8)
    header[:4] = b"II*\x00" if bo == "<" else b"MM\x00*"
    data_blobs = bytearray()
    data_start = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(data_start + len(data_blobs))
        data_blobs += s
    bps_off = data_start + len(data_blobs)
    data_blobs += struct.pack(bo + "3H", 8, 8, 8)
    extra_off = bps_off + 6
    n_strips = len(strips)
    so_off = sc_off = None
    if n_strips > 1:
        so_off = extra_off
        data_blobs += struct.pack(bo + f"{n_strips}I", *strip_offsets)
        sc_off = so_off + 4 * n_strips
        data_blobs += struct.pack(bo + f"{n_strips}I",
                                  *[len(s) for s in strips])
        extra_off = sc_off + 4 * n_strips
    ifd_off = data_start + len(data_blobs)
    struct.pack_into(bo + "I", header, 4, ifd_off)

    def entry(tag, typ, cnt, val):
        return struct.pack(bo + "HHI", tag, typ, cnt) + val

    def long_val(v):
        return struct.pack(bo + "I", v)

    def short_val(v):
        # a SHORT in the 4-byte value slot occupies the FIRST two bytes
        # (file byte order), zero-padded — both endians (TIFF 6.0 p.15)
        return struct.pack(bo + "H", v) + b"\x00\x00"

    entries = [
        entry(256, _TT_LONG, 1, long_val(w)),
        entry(257, _TT_LONG, 1, long_val(h)),
        entry(258, _TT_SHORT, 3, long_val(bps_off)),
        entry(259, _TT_SHORT, 1, short_val(comp_code)),
        entry(262, _TT_SHORT, 1, short_val(2)),
        entry(273, _TT_LONG, n_strips,
              long_val(strip_offsets[0] if n_strips == 1 else so_off)),
        entry(277, _TT_SHORT, 1, short_val(3)),
        entry(278, _TT_LONG, 1, long_val(rows_per_strip)),
        entry(279, _TT_LONG, n_strips,
              long_val(len(strips[0]) if n_strips == 1 else sc_off)),
        entry(284, _TT_SHORT, 1, short_val(1)),
    ]
    if predictor:
        entries.append(entry(317, _TT_SHORT, 1, short_val(2)))
    entries.sort(key=lambda e: struct.unpack(bo + "H", e[:2])[0])
    ifd = struct.pack(bo + "H", len(entries)) + b"".join(entries) \
        + struct.pack(bo + "I", 0)
    return bytes(header) + bytes(data_blobs) + ifd
