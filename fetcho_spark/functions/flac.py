"""From-scratch FLAC codec — no ffmpeg/libsndfile/libFLAC.

Implements the public FLAC bitstream format (RFC 9639 / xiph.org spec),
stdlib + numpy only, the same way this repo's PNG/JPEG/GIF/WebP codecs are
written from their specs:

- :func:`decode_flac` — full decoder: STREAMINFO, frame headers (all
  blocksize/rate/sample-size codes, UTF-8-coded frame/sample numbers),
  subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), wasted
  bits, Rice/Rice2 residual partitions incl. escape codes, stereo
  decorrelation (left/side, right/side, mid/side), CRC-8 + CRC-16
  verification per frame and the STREAMINFO MD5 check over the decoded
  PCM — the format's own end-to-end integrity proof.
- :func:`encode_flac` — a real (subset) encoder used by tests and fixture
  builders: fixed-blocksize frames, constant/verbatim/fixed(0-4)
  subframes with per-partition Rice parameter search, optional
  mid/side / left/side / right/side stereo decorrelation, correct CRCs
  and PCM MD5. The encoder exists so decoder tests exercise real spec
  streams (same pattern as the progressive-JPEG writer).

Scale note: this is a per-row decoder invoked from Arrow-batched
``mapInPandas`` (operators/multimodal.audio_features) — the Spark plan
around it is unchanged; rows decode independently inside executors.

Reference context: nullabork/fetcho treats all non-text payloads as
opaque bytes (common/ResourceFetchers/DefaultBlockProvider.cs blocks
media); this engine's north rule makes media decode first-class instead.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ---------------------------------------------------------------- CRC / bits

_CRC8_TBL = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TBL.append(_c)

_CRC16_TBL = []
for _i in range(256):
    _c = _i << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 \
            else (_c << 1) & 0xFFFF
    _CRC16_TBL.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TBL[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TBL[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


class _BitReader:
    """MSB-first bit reader over bytes (the FLAC stream convention)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, bytepos: int = 0):
        self.data = data
        self.bitpos = bytepos * 8

    def read(self, n: int) -> int:
        """n-bit unsigned, MSB first."""
        out, pos = 0, self.bitpos
        data = self.data
        end = pos + n
        if end > len(data) * 8:
            raise ValueError("flac: truncated stream")
        while n > 0:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < n else n
            out = (out << take) | ((byte >> (avail - take))
                                   & ((1 << take) - 1))
            pos += take
            n -= take
        self.bitpos = pos
        return out

    def sread(self, n: int) -> int:
        """n-bit two's-complement signed."""
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        """Count 0 bits up to the terminating 1 bit."""
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    @property
    def bytepos(self) -> int:
        return self.bitpos >> 3


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def swrite(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


# ----------------------------------------------------------------- decoding

_BLOCKSIZE_FIXED = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_FIXED = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_SSIZE_FIXED = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# fixed-predictor coefficients, order 0..4 (the spec's polynomial
# predictors: residual = s[i] - sum(coef[j] * s[i-1-j]))
_FIXED_COEFS = [[], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1]]


def _read_utf8_number(br: _BitReader) -> int:
    """FLAC's UTF-8-style variable-length number (extended to 36 bits)."""
    first = br.read(8)
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise ValueError("flac: bad UTF-8-coded number")
    val = first & (mask - 1)
    for _ in range(n_follow):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("flac: bad UTF-8 continuation")
        val = (val << 6) | (b & 0x3F)
    return val


def _read_residual(br: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("flac: partition order does not divide block")
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("flac: bad partition layout")
        param = br.read(plen)
        if param == escape:
            nbits = br.read(5)
            for i in range(n):
                out[idx + i] = br.sread(nbits) if nbits else 0
        else:
            for i in range(n):
                q = br.unary()
                r = br.read(param) if param else 0
                z = (q << param) | r
                out[idx + i] = (z >> 1) ^ -(z & 1)   # zigzag → signed
        idx += n
    return out


def _read_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("flac: subframe padding bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):                       # wasted-bits-per-sample flag
        wasted = 1 + br.unary()
        bps -= wasted
    if ftype == 0:                       # CONSTANT
        out = np.full(blocksize, br.sread(bps), dtype=np.int64)
    elif ftype == 1:                     # VERBATIM
        out = np.array([br.sread(bps) for _ in range(blocksize)],
                       dtype=np.int64)
    elif 8 <= ftype <= 12:               # FIXED, order 0-4
        order = ftype - 8
        warm = [br.sread(bps) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            pred = 0
            for j, cf in enumerate(coefs):
                pred += cf * out[i - 1 - j]
            out[i] = pred + resid[i - order]
    elif ftype >= 32:                    # LPC, order 1-32
        order = (ftype & 31) + 1
        warm = [br.sread(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("flac: invalid LPC precision")
        prec += 1
        shift = br.sread(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [br.sread(prec) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            pred = 0
            for j in range(order):
                pred += coefs[j] * int(out[i - 1 - j])
            out[i] = (pred >> shift) + resid[i - order]
    else:
        raise ValueError(f"flac: reserved subframe type {ftype}")
    if wasted:
        out <<= wasted
    return out


def decode_flac(data: bytes, check_md5: bool = True,
                max_samples: int | None = None):
    """Decode a FLAC stream → ``(samples, sample_rate, bits_per_sample)``.

    ``samples`` is int32, shape ``(n_samples, n_channels)``. Each frame's
    CRC-8 (header) and CRC-16 (frame) are verified; if STREAMINFO carries
    a non-zero MD5, the decoded PCM's MD5 must match it (``check_md5``).
    ``max_samples`` stops after that many decoded samples (cheap feature
    probes over huge files).
    """
    if data[:4] != b"fLaC":
        raise ValueError("flac: bad magic")
    pos, info = 4, None
    while pos + 4 <= len(data):
        hdr = data[pos]
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        if (hdr & 0x7F) == 0:
            body = data[pos + 4:pos + 4 + blen]
            if len(body) < 34:
                raise ValueError("flac: truncated STREAMINFO")
            bits = int.from_bytes(body[10:18], "big")
            info = {"rate": (bits >> 44) & 0xFFFFF,
                    "channels": ((bits >> 41) & 0x7) + 1,
                    "bps": ((bits >> 36) & 0x1F) + 1,
                    "total": bits & ((1 << 36) - 1),
                    "md5": body[18:34]}
        pos += 4 + blen
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("flac: no STREAMINFO block")
    if not info["rate"]:
        raise ValueError("flac: invalid sample rate")

    chunks: list[np.ndarray] = []
    n_out = 0
    br = _BitReader(data, pos)
    while br.bytepos < len(data) and (max_samples is None
                                      or n_out < max_samples):
        frame_start = br.bytepos
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("flac: lost frame sync")
        if br.read(1):
            raise ValueError("flac: reserved frame-header bit set")
        br.read(1)                       # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("flac: reserved frame-header bit set")
        _read_utf8_number(br)            # frame/sample number
        if bs_code == 0:
            raise ValueError("flac: reserved blocksize code")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_FIXED[bs_code]
        if sr_code == 0:
            rate = info["rate"]
        elif sr_code in _RATE_FIXED:
            rate = _RATE_FIXED[sr_code]
        elif sr_code == 12:
            rate = br.read(8) * 1000
        elif sr_code == 13:
            rate = br.read(16)
        elif sr_code == 14:
            rate = br.read(16) * 10
        else:
            raise ValueError("flac: invalid sample-rate code")
        if ss_code == 0:
            bps = info["bps"]
        elif ss_code in _SSIZE_FIXED:
            bps = _SSIZE_FIXED[ss_code]
        else:
            raise ValueError("flac: reserved sample-size code")
        br.align()  # header is whole bytes; align before crc slice
        hdr_bytes = data[frame_start:br.bytepos]
        crc8 = br.read(8)
        if _crc8(hdr_bytes) != crc8:
            raise ValueError("flac: frame header CRC-8 mismatch")

        if ch_code <= 7:
            nch = ch_code + 1
            subs = [_read_subframe(br, blocksize, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            # one channel of a decorrelated pair (the side) carries +1 bit
            bps_pair = {8: (bps, bps + 1), 9: (bps + 1, bps),
                        10: (bps, bps + 1)}[ch_code]
            a = _read_subframe(br, blocksize, bps_pair[0])
            b = _read_subframe(br, blocksize, bps_pair[1])
            if ch_code == 8:             # left/side: right = left - side
                subs = [a, a - b]
            elif ch_code == 9:           # right/side: left = side + right
                subs = [a + b, b]
            else:                        # mid/side (libFLAC reconstruction)
                mid = (a << 1) | (b & 1)
                subs = [(mid + b) >> 1, (mid - b) >> 1]
        else:
            raise ValueError("flac: reserved channel assignment")
        if info["channels"] != nch:
            raise ValueError("flac: channel count changed mid-stream")

        br.align()
        frame_bytes = data[frame_start:br.bytepos]
        crc16 = br.read(16)
        if _crc16(frame_bytes) != crc16:
            raise ValueError("flac: frame CRC-16 mismatch")

        lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
        frame = np.stack(subs, axis=1)
        if frame.min() < lo or frame.max() > hi:
            raise ValueError("flac: decoded sample out of range")
        chunks.append(frame)
        n_out += blocksize

    if not chunks:
        raise ValueError("flac: no audio frames")
    out = np.concatenate(chunks, axis=0)
    if info["total"] and max_samples is None:
        if len(out) != info["total"]:
            raise ValueError("flac: total-sample count mismatch")
    if check_md5 and max_samples is None and info["md5"] != b"\x00" * 16:
        if hashlib.md5(_pcm_bytes(out, info["bps"])).digest() != info["md5"]:
            raise ValueError("flac: PCM MD5 mismatch")
    return out.astype(np.int32), info["rate"], info["bps"]


def _pcm_bytes(samples: np.ndarray, bps: int) -> bytes:
    """Interleaved little-endian signed PCM, the layout FLAC's STREAMINFO
    MD5 is defined over (bps rounded up to whole bytes)."""
    nbytes = (bps + 7) // 8
    flat = samples.reshape(-1).astype(np.int64)
    if nbytes == 1:
        return (flat & 0xFF).astype(np.uint8).tobytes()
    if nbytes == 2:
        return flat.astype("<i2").tobytes()
    if nbytes == 3:
        as32 = flat.astype("<i4").tobytes()
        arr = np.frombuffer(as32, np.uint8).reshape(-1, 4)
        return arr[:, :3].tobytes()
    return flat.astype("<i4").tobytes()


# ----------------------------------------------------------------- encoding

def _rice_cost(resid: np.ndarray, param: int) -> int:
    z = (np.abs(resid * 2) - (resid < 0)).astype(np.int64)  # zigzag
    return int(np.sum(z >> param)) + len(z) * (1 + param)


def _write_rice(bw: _BitWriter, resid: np.ndarray, param: int) -> None:
    for v in resid:
        v = int(v)
        z = (v << 1) if v >= 0 else ((-v) << 1) - 1
        q = z >> param
        bw.write(1, q + 1)               # q zeros then a 1
        if param:
            bw.write(z & ((1 << param) - 1), param)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int,
                     partition_order: int) -> None:
    x = x.astype(np.int64)
    n = len(x)
    if n and np.all(x == x[0]):          # CONSTANT
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.swrite(int(x[0]), bps)
        return
    # pick the fixed order (0-4) with the cheapest order-0-partition cost
    best = None
    for order in range(min(5, n)):
        resid = x.copy()
        for _ in range(order):
            resid = np.diff(resid)       # k-th diff == fixed predictor k
        params_cost = min((_rice_cost(resid, p), p) for p in range(15))
        cost = order * bps + params_cost[0]
        if best is None or cost < best[0]:
            best = (cost, order, resid, params_cost[1])
    cost, order, resid, _p = best
    if cost >= n * bps:                  # VERBATIM beats prediction
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.swrite(int(v), bps)
        return
    nparts = 1 << partition_order
    if n % nparts or (n >> partition_order) <= order:
        partition_order = 0
        nparts = 1
    bw.write(0, 1)
    bw.write(8 + order, 6)               # FIXED subframe
    bw.write(0, 1)                       # no wasted bits
    for v in x[:order]:
        bw.swrite(int(v), bps)
    bw.write(0, 2)                       # residual method: 4-bit Rice
    bw.write(partition_order, 4)
    idx = 0
    for p in range(nparts):
        cnt = (n >> partition_order) - (order if p == 0 else 0)
        part = resid[idx:idx + cnt]
        param = min((_rice_cost(part, q), q) for q in range(15))[1]
        bw.write(param, 4)
        _write_rice(bw, part, param)
        idx += cnt
    return


def encode_flac(samples: np.ndarray, sample_rate: int,
                bits_per_sample: int = 16, block_size: int = 4096,
                stereo_mode: str = "independent",
                partition_order: int = 0) -> bytes:
    """Encode integer PCM → a spec-conformant FLAC stream.

    ``samples``: int array, shape ``(n,)`` or ``(n, channels)``, values in
    the ``bits_per_sample`` signed range. ``stereo_mode`` (2-channel only):
    ``independent`` / ``mid_side`` / ``left_side`` / ``right_side`` —
    decorrelation modes emitted so decoder tests cover every
    reconstruction path. Lossless by construction (tests assert
    round-trip equality and the decoder re-verifies via STREAMINFO MD5).
    """
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    if not 1 <= nch <= 8:
        raise ValueError("flac: 1-8 channels")
    lo, hi = -(1 << (bits_per_sample - 1)), (1 << (bits_per_sample - 1)) - 1
    if n and (x.min() < lo or x.max() > hi):
        raise ValueError("flac: samples exceed bits_per_sample range")
    if stereo_mode != "independent" and nch != 2:
        raise ValueError("flac: decorrelation modes need exactly 2 channels")

    md5 = hashlib.md5(_pcm_bytes(x, bits_per_sample)).digest()
    last_bs = (n % block_size) or block_size
    min_bs = min(block_size, last_bs) if n else block_size
    max_bs = min(block_size, n) if n else block_size
    si = bytearray()
    si += struct.pack(">HH", max(min_bs, 16), max(max_bs, 16))
    si += b"\x00\x00\x00" * 2            # min/max frame size unknown
    bits = (sample_rate << 44) | ((nch - 1) << 41) \
        | ((bits_per_sample - 1) << 36) | n
    si += bits.to_bytes(8, "big")
    si += md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    for fno, off in enumerate(range(0, max(n, 1), block_size)):
        blk = x[off:off + block_size]
        bs = len(blk)
        if bs == 0:
            break
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)                   # fixed-blocksize strategy
        bw.write(7, 4)                   # blocksize: 16-bit at end
        bw.write(0, 4)                   # rate: from STREAMINFO
        if stereo_mode == "independent":
            bw.write(nch - 1, 4)
        else:
            bw.write({"left_side": 8, "right_side": 9,
                      "mid_side": 10}[stereo_mode], 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
                 [bits_per_sample], 3)
        bw.write(0, 1)
        # UTF-8-coded frame number (subset: < 2^31 always holds here)
        fb = fno
        if fb < 0x80:
            bw.write(fb, 8)
        else:
            tmp = []
            nbytes = 2
            while fb >= (1 << (nbytes * 5 + 1)) and nbytes < 6:
                nbytes += 1
            for i in range(nbytes - 1):
                tmp.append(0x80 | (fb & 0x3F))
                fb >>= 6
            lead = (0xFF00 >> nbytes) & 0xFF
            bw.write(lead | fb, 8)
            for b in reversed(tmp):
                bw.write(b, 8)
        bw.write(bs - 1, 16)
        hdr = bytes(bw.buf)
        bw.write(_crc8(hdr), 8)

        if stereo_mode == "independent":
            for ch in range(nch):
                _encode_subframe(bw, blk[:, ch], bits_per_sample,
                                 partition_order)
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if stereo_mode == "left_side":
                _encode_subframe(bw, left, bits_per_sample, partition_order)
                _encode_subframe(bw, side, bits_per_sample + 1,
                                 partition_order)
            elif stereo_mode == "right_side":
                _encode_subframe(bw, side, bits_per_sample + 1,
                                 partition_order)
                _encode_subframe(bw, right, bits_per_sample, partition_order)
            else:                        # mid/side
                mid = (left + right) >> 1
                _encode_subframe(bw, mid, bits_per_sample, partition_order)
                _encode_subframe(bw, side, bits_per_sample + 1,
                                 partition_order)
        bw.align()
        frame = bytes(bw.buf)
        bw.write(_crc16(frame), 16)
        out += bw.bytes()
    return bytes(out)
