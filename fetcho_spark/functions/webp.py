"""WebP VP8L (lossless) decoder, from scratch per the public
"WebP Lossless Bitstream Specification" — no libwebp. Covers the full
format: LSB-first bitstream, simple and full canonical prefix codes
(including the code-length-code bootstrap), meta prefix images, the color
cache, LZ77 backward references with the 2D distance mapping, and all
four transforms (predictor, color, subtract-green, color-indexing with
pixel packing). Lossy VP8 frames genuinely need a full predictive video
intra decoder and raise.

Registered through pure_codec.PureCodec.decode for ``RIFF….WEBPVP8L``
payloads; ``webp_encode_lossless`` emits a minimal spec-valid stream
(literal-only, simple codes where possible) used by round-trip tests —
hand-built streams in tests cover the transform/LZ77/cache paths the
simple writer never produces.
"""

from __future__ import annotations

import struct

import numpy as np


class _LsbReader:
    """VP8L bitstream: LSB-first within bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0                      # bit position

    def read(self, n: int) -> int:
        v = 0
        d, p = self.data, self.pos
        for i in range(n):
            byte = d[(p + i) >> 3]
            v |= ((byte >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v


# canonical prefix code: decode via (length, code-in-MSB-order) table like
# the JPEG tables, but VP8L reads bits LSB-first per the spec's canonical
# construction (kCodeLengthCodeOrder etc.)

_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
              14, 15]


class _Prefix:
    """Canonical prefix code from code lengths (spec 'BuildHuffmanTable'
    semantics, bit-reversed reads)."""

    __slots__ = ("table", "max_len", "single")

    def __init__(self, lengths):
        lengths = list(lengths)
        used = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
        if len(used) == 1:
            self.single = used[0][0]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        # canonical assignment: shorter codes first, then symbol order
        code = 0
        self.table = {}
        self.max_len = max(ln for _s, ln in used)
        next_code = {}
        bl_count = {}
        for _s, ln in used:
            bl_count[ln] = bl_count.get(ln, 0) + 1
        for ln in range(1, self.max_len + 1):
            code = (code + bl_count.get(ln - 1, 0)) << 1
            next_code[ln] = code
        for s, ln in used:
            c = next_code[ln]
            next_code[ln] += 1
            # store with bits REVERSED (VP8L reads LSB-first)
            rc = int(format(c, f"0{ln}b")[::-1], 2)
            self.table[(ln, rc)] = s

    def read(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code |= br.read(1) << (ln - 1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("vp8l: invalid prefix code")


def _read_prefix_code(br: _LsbReader, alphabet_size: int) -> _Prefix:
    if br.read(1):                         # simple code
        n_syms = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        syms = [s0]
        if n_syms == 2:
            syms.append(br.read(8))
        lengths = [0] * alphabet_size
        for s in syms:
            if s >= alphabet_size:
                raise ValueError("vp8l: symbol out of range")
        if n_syms == 1:
            lengths[syms[0]] = 1
            p = _Prefix(lengths)
            p.single = syms[0]             # 0-bit code
            return p
        lengths[syms[0]] = 1
        lengths[syms[1]] = 1
        return _Prefix(lengths)
    # full code: code-length code first
    num_codes = br.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Prefix(clc_lengths)
    # then the real code's lengths via the CLC
    lengths = [0] * alphabet_size
    if br.read(1):                         # limited symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev_len = s
        elif s == 16:
            for _ in range(3 + br.read(2)):
                if i < alphabet_size:
                    lengths[i] = prev_len
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:                              # 18
            i += 11 + br.read(7)
    return _Prefix(lengths)


def _lz77_extra(br: _LsbReader, code: int) -> int:
    """Length/distance prefix symbol → value (spec: 4 + extra bits)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + 1 + br.read(extra)


# 2D neighborhood mapping for distance codes 1..120 (spec table)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7)]


def _plane_code_to_distance(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dy * xsize + dx
    return max(d, 1)


def _read_argb_image(br: _LsbReader, w: int, h: int,
                     allow_meta: bool):
    """Spatially-coded ARGB image (the entropy-coded core, used for the
    main image AND transform/meta sub-images) → (h, w, 4) uint8 ARGB.
    Every image level carries its own optional color cache; only the meta
    prefix image is level-0-only (libwebp DecodeImageStream semantics)."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: bad color cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    n_groups = 1
    meta = None
    meta_bits = 0
    if allow_meta and br.read(1):          # meta prefix image
        meta_bits = br.read(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta = _read_argb_image(br, mw, mh, False)
        # meta group index = (green << 8) | red (libwebp convention)
        n_groups = int((meta[:, :, 2].astype(np.int32) << 8
                        | meta[:, :, 1]).max()) + 1

    groups = []
    lit_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, lit_size),     # green/length/cache
            _read_prefix_code(br, 256),          # red
            _read_prefix_code(br, 256),          # blue
            _read_prefix_code(br, 256),          # alpha
            _read_prefix_code(br, 40),           # distance
        ))

    out = np.zeros(w * h * 4, dtype=np.uint8).reshape(h, w, 4)
    flat = out.reshape(-1, 4)
    pos = 0
    total = w * h
    while pos < total:
        if meta is not None:
            y, x = divmod(pos, w)
            mp = meta[y >> meta_bits, x >> meta_bits]
            g = groups[(int(mp[2]) << 8) | int(mp[1])]
        else:
            g = groups[0]
        gcode, rcode, bcode, acode, dcode = g
        sym = gcode.read(br)
        if sym < 256:                       # literal pixel
            green = sym
            red = rcode.read(br)
            blue = bcode.read(br)
            alpha = acode.read(br)
            flat[pos] = (alpha, red, green, blue)
            if cache is not None:
                argb = (alpha << 24) | (red << 16) | (green << 8) | blue
                cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
            pos += 1
        elif sym < 256 + 24:                # LZ77 backward reference
            length = _lz77_extra(br, sym - 256)
            dist_code = _lz77_extra(br, dcode.read(br))
            dist = _plane_code_to_distance(w, dist_code)
            if dist > pos or pos + length > total:
                raise ValueError("vp8l: bad back-reference")
            for i in range(length):
                flat[pos + i] = flat[pos + i - dist]
                if cache is not None:
                    a, r, gg, b = flat[pos + i]
                    argb = (int(a) << 24) | (int(r) << 16) \
                        | (int(gg) << 8) | int(b)
                    cache[(0x1E35A7BD * argb & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = argb
            pos += length
        else:                               # color-cache hit
            argb = cache[sym - 256 - 24]
            flat[pos] = ((argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                         (argb >> 8) & 0xFF, argb & 0xFF)
            pos += 1
    return out


# ------------------------------------------------------------- transforms

def _predictor_px(mode, L, T, TL, TR):
    """One predictor-transform mode (spec 4.2.2), per channel int arrays."""
    if mode == 0:
        return np.array([255, 0, 0, 0], np.int32)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return ((L + TR) // 2 + T) // 2
    if mode == 6:
        return (L + TL) // 2
    if mode == 7:
        return (L + T) // 2
    if mode == 8:
        return (TL + T) // 2
    if mode == 9:
        return (T + TR) // 2
    if mode == 10:
        return ((L + TL) // 2 + (T + TR) // 2) // 2
    if mode == 11:                          # Select
        p = L + T - TL
        perr = np.abs(p - L).sum() - np.abs(p - T).sum()
        return L if perr <= 0 else T
    if mode == 12:                          # ClampAddSubtractFull
        return np.clip(L + T - TL, 0, 255)
    if mode == 13:                          # ClampAddSubtractHalf
        avg = (L + T) // 2
        return np.clip(avg + (avg - TL) // 2, 0, 255)
    raise ValueError(f"vp8l: predictor mode {mode}")


def _apply_predictor(img, tile_bits, tiles):
    h, w = img.shape[:2]
    px = img.astype(np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], np.int32)
            elif y == 0:
                pred = px[0, x - 1]                  # L
            elif x == 0:
                pred = px[y - 1, 0]                  # T
            else:
                mode = int(tiles[y >> tile_bits, x >> tile_bits, 2])
                L = px[y, x - 1]
                T = px[y - 1, x]
                TL = px[y - 1, x - 1]
                TR = px[y - 1, x + 1] if x + 1 < w else px[y - 1, 0]
                pred = _predictor_px(mode, L, T, TL, TR)
            px[y, x] = (px[y, x] + pred) & 0xFF
    return px.astype(np.uint8)


def _to_signed(v):
    return v - 256 if v >= 128 else v


def _apply_color_transform(img, tile_bits, tiles):
    h, w = img.shape[:2]
    px = img.astype(np.int32)
    for y in range(h):
        for x in range(w):
            t = tiles[y >> tile_bits, x >> tile_bits]
            g2r = _to_signed(int(t[3]))              # blue channel of tile
            g2b = _to_signed(int(t[2]))              # green channel
            r2b = _to_signed(int(t[1]))              # red channel
            a, r, g, b = px[y, x]
            r = (r + ((g2r * _to_signed(g)) >> 5)) & 0xFF
            px[y, x, 1] = r
            b = (b + ((g2b * _to_signed(g)) >> 5)
                 + ((r2b * _to_signed(r)) >> 5)) & 0xFF
            px[y, x, 3] = b
    return px.astype(np.uint8)


def _clean(fn):
    """Truncated/corrupt web bytes → ValueError, never IndexError (same
    contract as pure_codec's decoders)."""
    import functools

    @functools.wraps(fn)
    def wrapped(data, *a, **k):
        try:
            return fn(data, *a, **k)
        except (ValueError, NotImplementedError):
            raise
        except (IndexError, struct.error) as e:
            raise ValueError(
                f"vp8l: truncated/corrupt stream ({type(e).__name__})")                 from e
    return wrapped


@_clean
def vp8l_decode(data: bytes) -> np.ndarray:
    """VP8L chunk payload (after the 'VP8L' fourcc + size) → (h, w, 3)
    uint8 RGB (alpha dropped)."""
    if not data or data[0] != 0x2F:
        raise ValueError("vp8l: bad signature byte")
    br = _LsbReader(data)
    br.pos = 8
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                              # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("vp8l: unknown version")
    transforms = []
    seen_types = set()
    palette = None
    packed_w = w
    while br.read(1):                       # transform list
        ttype = br.read(2)
        if ttype in seen_types:
            raise ValueError("vp8l: duplicate transform")
        seen_types.add(ttype)
        if ttype in (0, 1):                 # predictor / color
            tile_bits = br.read(3) + 2
            tw = -(-packed_w // (1 << tile_bits))
            th = -(-h // (1 << tile_bits))
            tiles = _read_argb_image(br, tw, th, False)
            transforms.append((ttype, tile_bits, tiles))
        elif ttype == 2:                    # subtract green
            transforms.append((2, None, None))
        else:                               # color indexing
            n_colors = br.read(8) + 1
            pal_img = _read_argb_image(br, n_colors, 1, False)
            pal = pal_img[0].astype(np.int32)
            for i in range(1, n_colors):    # palette is delta-coded
                pal[i] = (pal[i] + pal[i - 1]) & 0xFF
            palette = pal.astype(np.uint8)
            if n_colors <= 2:
                pack_bits = 3
            elif n_colors <= 4:
                pack_bits = 2
            elif n_colors <= 16:
                pack_bits = 1
            else:
                pack_bits = 0
            transforms.append((3, pack_bits, None))
            packed_w = -(-w // (1 << pack_bits))
    img = _read_argb_image(br, packed_w, h, True)
    for ttype, p1, p2 in reversed(transforms):
        if ttype == 3:                      # color indexing / unpack
            pack_bits = p1
            if pack_bits:
                ppp = 1 << pack_bits        # pixels per packed green byte
                bits_pp = 8 >> pack_bits
                idx = np.zeros((h, w), np.int32)
                greens = img[:, :, 2].astype(np.int32)
                for x in range(w):
                    src = greens[:, x >> pack_bits]
                    shift = (x & (ppp - 1)) * bits_pp
                    idx[:, x] = (src >> shift) & ((1 << bits_pp) - 1)
            else:
                idx = img[:, :, 2].astype(np.int32)
            if (idx >= len(palette)).any():
                idx = np.minimum(idx, len(palette) - 1)
            img = palette[idx]
        elif ttype == 2:                    # subtract green: add back
            g = img[:, :, 2].astype(np.int32)
            img = img.copy()
            img[:, :, 1] = ((img[:, :, 1] + g) & 0xFF).astype(np.uint8)
            img[:, :, 3] = ((img[:, :, 3] + g) & 0xFF).astype(np.uint8)
        elif ttype == 1:
            img = _apply_color_transform(img, p1, p2)
        else:
            img = _apply_predictor(img, p1, p2)
    return img[:, :, 1:4].copy()            # ARGB → RGB


@_clean
def webp_decode(data: bytes) -> np.ndarray:
    """RIFF/WEBP container → RGB for VP8L payloads (lossy VP8 raises)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if fourcc == b"VP8L":
            return vp8l_decode(body)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "webp: lossy VP8 needs a full intra video decoder")
        pos += 8 + size + (size & 1)
    raise ValueError("webp: no image chunk")


# ----------------------------------------------------------------- writer

class _LsbWriter:
    def __init__(self):
        self.bits: list[tuple[int, int]] = []

    def write(self, v: int, n: int) -> None:
        self.bits.append((v, n))

    def bytes(self) -> bytes:
        out = bytearray()
        acc = nacc = 0
        for v, n in self.bits:
            acc |= (v & ((1 << n) - 1)) << nacc
            nacc += n
            while nacc >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8
        if nacc:
            out.append(acc & 0xFF)
        return bytes(out)


class _LsbWriterImage:
    """Test-grade sub-image writer: a 1-row literal ARGB image with flat
    per-channel simple/2-symbol codes is overkill — emit each channel as a
    full flat-8-bit code via the main writer's machinery is circular, so
    this emits the simplest universally-valid form: four FULL flat codes
    are unnecessary because sub-images may use any code; we use per-pixel
    literal emission under four 256-ary flat codes built inline."""

    def __init__(self, bw: _LsbWriter):
        self.bw = bw

    def emit_literal_row(self, argb_row_rgb: np.ndarray) -> None:
        bw = self.bw
        bw.write(0, 1)                      # no color cache (sub-image
        #                                     header has no meta bit here:
        #                                     transform sub-images disallow
        #                                     meta — reader matches)
        maps = []
        for ch in range(4):                 # g, r, b, a emit order decided
            pass
        # build the four codes over the actual bytes present
        row = argb_row_rgb
        g = row[:, 1]
        r = row[:, 0]
        b = row[:, 2]
        a = np.full(len(row), 255, np.uint8)

        def simple_or_flat(values, alphabet=256):
            distinct = sorted(set(int(v) for v in values))
            if len(distinct) == 1:
                bw.write(1, 1); bw.write(0, 1); bw.write(1, 1)
                bw.write(distinct[0], 8)
                return {distinct[0]: (0, 0)}
            if len(distinct) == 2:
                bw.write(1, 1); bw.write(1, 1); bw.write(1, 1)
                bw.write(distinct[0], 8); bw.write(distinct[1], 8)
                return {distinct[0]: (0, 1), distinct[1]: (1, 1)}
            # flat full code over 256 byte values; alphabets past 256
            # (green carries 24 length symbols) zero-fill via symbol 18
            bw.write(0, 1)
            bw.write(15, 4)
            clc_lengths = {8: 1, 16: 2, 18: 2}
            for sym in _CLC_ORDER:
                bw.write(clc_lengths.get(sym, 0), 3)
            clc_codes = {8: (0b0, 1), 16: (0b10, 2), 18: (0b11, 2)}

            def emit_clc(sym):
                c, ln = clc_codes[sym]
                bw.write(int(format(c, f"0{ln}b")[::-1], 2), ln)
            bw.write(0, 1)
            emit_clc(8)
            n = 1
            while n < 256:
                run = min(6, 256 - n)
                emit_clc(16)
                bw.write(run - 3, 2)
                n += run
            rem = alphabet - 256
            if rem:
                emit_clc(18)
                bw.write(rem - 11, 7)
            return {s: (s, 8) for s in range(256)}

        gm = simple_or_flat(g, alphabet=256 + 24)
        rm = simple_or_flat(r)
        bm = simple_or_flat(b)
        am = simple_or_flat(a)
        bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(0, 8)

        def emit(mapping, v):
            c, ln = mapping[int(v)]
            if ln:
                bw.write(int(format(c, f"0{ln}b")[::-1], 2), ln)
        for gg, rr, bb, aa in zip(g, r, b, a):
            emit(gm, gg); emit(rm, rr); emit(bm, bb); emit(am, aa)


def webp_encode_lossless(pixels: np.ndarray,
                         transform: str | None = None) -> bytes:
    """Minimal spec-valid VP8L: no transforms, no cache, one prefix-code
    group, all four channel codes FULL canonical codes over the byte
    histogram (length-limited by construction: literal-only, so depth ≤
    15 comes from capping at 8-bit lengths via the simple-code fallback
    when needed). Used by tests; real deployments read far more than they
    write."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    bw = _LsbWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                          # no alpha hint
    bw.write(0, 3)                          # version
    px = pixels
    if transform == "subtract-green":
        bw.write(1, 1)
        bw.write(2, 2)                      # transform type 2
        g = px[:, :, 1].astype(np.int32)
        px = px.copy().astype(np.int32)
        px[:, :, 0] = (px[:, :, 0] - g) & 0xFF
        px[:, :, 2] = (px[:, :, 2] - g) & 0xFF
        px = px.astype(np.uint8)
    elif transform == "predictor-T":
        # one global tile, mode 2 (predict = pixel above); residuals
        # computed forward exactly as the decoder inverts them
        bw.write(1, 1)
        bw.write(0, 2)                      # transform type 0
        bw.write(7 - 2, 3)                  # tile_bits 7 → one tile
        # tile sub-image: 1x1, mode in GREEN channel: literal ARGB with
        # simple codes (green=2, red/blue/alpha=0)
        bw.write(0, 1)                      # no color cache (sub-image)
        for val in (2, 0, 0, 0):            # g, r, b, a single-symbol
            bw.write(1, 1)                  # simple
            bw.write(0, 1)                  # one symbol
            bw.write(1, 1)                  # 8-bit
            bw.write(val, 8)
        bw.write(1, 1)                      # distance: simple
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(0, 8)
        res = px.astype(np.int32).copy()
        for y in range(h - 1, -1, -1):
            for x in range(w - 1, -1, -1):
                if x == 0 and y == 0:
                    pred = np.array([255, 0, 0, 0], np.int32)[1:]
                elif y == 0:
                    pred = px[0, x - 1].astype(np.int32)
                elif x == 0:
                    pred = px[y - 1, 0].astype(np.int32)
                else:
                    pred = px[y - 1, x].astype(np.int32)   # mode 2: T
                res[y, x] = (res[y, x] - pred) & 0xFF
        px = res.astype(np.uint8)
    elif transform == "palette":
        bw.write(1, 1)
        bw.write(3, 2)                      # transform type 3
        flat = px.reshape(-1, 3)
        pal, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(pal) > 256:
            raise ValueError("palette transform needs ≤256 colors")
        bw.write(len(pal) - 1, 8)
        # palette sub-image: 1 x n_colors, DELTA-coded literals
        deltas = pal.astype(np.int32).copy()
        deltas[1:] = (deltas[1:] - pal[:-1].astype(np.int32)) & 0xFF
        sub = _LsbWriterImage(bw)
        sub.emit_literal_row(deltas.astype(np.uint8))
        idx = inv.reshape(h, w)
        if len(pal) <= 2:
            pack_bits = 3
        elif len(pal) <= 4:
            pack_bits = 2
        elif len(pal) <= 16:
            pack_bits = 1
        else:
            pack_bits = 0
        if pack_bits:
            ppp = 1 << pack_bits
            bits_pp = 8 >> pack_bits
            pw = -(-w // ppp)
            packed = np.zeros((h, pw), np.int32)
            for x in range(w):
                packed[:, x >> pack_bits] |= idx[:, x] << (
                    (x & (ppp - 1)) * bits_pp)
            green = packed.astype(np.uint8)
        else:
            green = idx.astype(np.uint8)
        px = np.zeros((h, green.shape[1], 3), np.uint8)
        px[:, :, 1] = green
        w = green.shape[1]                  # packed width for main image
    elif transform is not None:
        raise ValueError(f"unknown transform {transform!r}")
    bw.write(0, 1)                          # end of transforms
    bw.write(0, 1)                          # no color cache
    bw.write(0, 1)                          # no meta prefix image

    def write_simple_or_flat(values, alphabet):
        """Simple code when ≤2 distinct symbols, else a flat 8-bit code:
        all 256 byte values get length 8 (a complete canonical code;
        code == symbol), emitted through a CLC of {8:len1, 16:len2,
        18:len2}; alphabets >256 zero-fill the tail with symbol 18."""
        distinct = sorted(set(int(v) for v in values))
        if len(distinct) == 1:
            bw.write(1, 1)                  # simple
            bw.write(0, 1)                  # one symbol
            bw.write(1, 1)                  # 8-bit symbol
            bw.write(distinct[0], 8)
            return {distinct[0]: (0, 0)}
        if len(distinct) == 2:
            bw.write(1, 1)
            bw.write(1, 1)                  # two symbols
            bw.write(1, 1)
            bw.write(distinct[0], 8)
            bw.write(distinct[1], 8)
            return {distinct[0]: (0, 1), distinct[1]: (1, 1)}
        bw.write(0, 1)                      # full code
        bw.write(15, 4)                     # all 19 CLC slots present
        clc_lengths = {8: 1, 16: 2, 18: 2}  # complete: 1/2+1/4+1/4
        for sym in _CLC_ORDER:
            bw.write(clc_lengths.get(sym, 0), 3)
        # canonical: 8→'0' (len1); len2 in symbol order: 16→'10', 18→'11'
        clc_codes = {8: (0b0, 1), 16: (0b10, 2), 18: (0b11, 2)}

        def emit_clc(sym):
            c, ln = clc_codes[sym]
            bw.write(int(format(c, f"0{ln}b")[::-1], 2), ln)

        bw.write(0, 1)                      # no max-symbol cap
        emit_clc(8)                         # symbol 0: length 8
        n = 1
        while n < 256:                      # 255 = 42×6 + 3 (all runs ≥3)
            run = min(6, 256 - n)
            emit_clc(16)
            bw.write(run - 3, 2)
            n += run
        rem = alphabet - 256
        while rem > 0:                      # zero-fill tail via symbol 18
            run = min(138, max(11, rem))
            if rem < 11:
                # pad with symbol 17 (3-10 zeros)
                run = rem if rem >= 3 else 3
                emit_clc_17 = None
                raise ValueError("vp8l writer: tail <11 unsupported")
            emit_clc(18)
            bw.write(run - 11, 7)
            rem -= run
        return {s: (s, 8) for s in range(256)}

    planes = {
        "g": px[:, :, 1].reshape(-1),
        "r": px[:, :, 0].reshape(-1),
        "b": px[:, :, 2].reshape(-1),
        "a": np.full(px.shape[0] * px.shape[1], 255, np.uint8),
    }
    gmap = write_simple_or_flat(planes["g"], 256 + 24)
    rmap = write_simple_or_flat(planes["r"], 256)
    bmap = write_simple_or_flat(planes["b"], 256)
    amap = write_simple_or_flat(planes["a"], 256)
    # distance code: unused but must be present — simple 1-symbol
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)                          # symbol 0, 1-bit field

    def emit(mapping, v):
        c, ln = mapping[int(v)]
        if ln:
            bw.write(int(format(c, f"0{ln}b")[::-1], 2), ln)

    for g, r, b, a in zip(planes["g"], planes["r"], planes["b"],
                          planes["a"]):
        emit(gmap, g)
        emit(rmap, r)
        emit(bmap, b)
        emit(amap, a)
    payload = bw.bytes()
    if len(payload) & 1:
        payload += b"\x00"
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    return (b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk)
