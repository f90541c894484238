"""Cuckoo-filter core for the URL-seen set (north star: "partitioned
bloom/cuckoo-filter URL-seen set").

The reference's seen-set is exact (Postgres ``WebResource.urihash`` probes,
common/Database.cs:270-310) behind a FIFO cache (common/FastLookupCache.cs);
our rebuild routes frontier rows through a per-bucket approximate filter
before the exact anti-join (operators/seen.py). This module is the second
filter backend beside the bloom: a partial-key cuckoo filter (Fan et al.,
CoNLL'14 public design) with 16-bit fingerprints and 4-way buckets.

Why offer it at all when the bloom works: **deletion**. A bloom can only
saturate as TTL-expired hashes accumulate over a long crawl — the only fix
is a full rebuild. A cuckoo filter removes individual fingerprints, so
:meth:`fetcho_spark.operators.seen.SeenSet.expire` can shed expired keys
incrementally and keep the false-positive rate flat for the crawl's whole
lifetime at 10^10 scale.

Correctness contract (same as the bloom): the filter is ONLY a router —
"maybe seen" rows pay the exact join, "definitely unseen" rows skip it —
so false positives never change results. No-false-negative is guaranteed
for inserted keys; after deletions it is RESTORED by the caller
re-probing survivors (seen.py ``expire`` does), because deleting key A can
remove key B's fingerprint when fp+bucket collide (the standard cuckoo
deletion caveat, handled explicitly here rather than ignored).

Layout: ``buf = [1-byte saturation flag] + uint16[n_entries * 4]``. A
filter that cannot place a key after ``MAX_KICKS`` evictions flips the
flag and answers "maybe" for everything from then on — graceful
degradation to the exact join, never an aborted job mid-crawl.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import splitmix64

SLOTS = 4
MAX_KICKS = 500
_HEADER = 1  # saturation flag byte


def _fingerprints(keys: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints from signed-int64 keys (0 marks empty)."""
    u = keys.astype(np.int64).view(np.uint64)
    fp = (splitmix64(u) & np.uint64(0xFFFF)).astype(np.uint16)
    return np.where(fp == 0, np.uint16(1), fp)


def _index1(keys: np.ndarray, n_entries: int) -> np.ndarray:
    u = keys.astype(np.int64).view(np.uint64)
    return (splitmix64(splitmix64(u)) & np.uint64(n_entries - 1)).astype(
        np.int64)


def _alt_index(idx: np.ndarray, fp: np.ndarray, n_entries: int) -> np.ndarray:
    """Partial-key alternate bucket: i2 = i1 XOR hash(fp) — involutive, so
    either index recovers the other from the stored fingerprint alone."""
    h = splitmix64(fp.astype(np.uint64)) & np.uint64(n_entries - 1)
    return (idx.astype(np.uint64) ^ h).astype(np.int64)


class CuckooCore:
    """Filter-core strategy for :class:`~fetcho_spark.operators.seen.SeenSet`.

    ``size_bits`` (the SeenSet-level sizing knob shared with the bloom) maps
    to the largest power-of-two entry count whose table fits in
    ``size_bits`` bits: ``n_entries * SLOTS * 16 <= size_bits``. At the
    default ``1 << 20`` that is 16384 entries = 64k slots ≈ 62k keys at the
    0.95 load factor 4-way cuckoo sustains.
    """

    name = "cuckoo"
    supports_delete = True

    @staticmethod
    def n_entries(size_bits: int) -> int:
        n = 1
        while n * 2 * SLOTS * 16 <= size_bits:
            n *= 2
        return n

    def empty(self, size_bits: int) -> np.ndarray:
        n = self.n_entries(size_bits)
        return np.zeros(_HEADER + n * SLOTS * 2, dtype=np.uint8)

    @staticmethod
    def _table(buf: np.ndarray) -> np.ndarray:
        t = buf[_HEADER:].view(np.uint16)
        return t.reshape(len(t) // SLOTS, SLOTS)

    @staticmethod
    def is_saturated(buf: np.ndarray) -> bool:
        return bool(buf[0])

    # ------------------------------------------------------------------ ops
    def insert(self, buf: np.ndarray, size_bits: int,
               keys: np.ndarray) -> np.ndarray:
        """Insert keys; one fingerprint copy per distinct key (an already-
        present fp in either candidate bucket is not duplicated, which makes
        one ``delete`` per distinct key the correct pairing). Mutates and
        returns ``buf``; flips the saturation flag instead of failing when a
        key cannot be placed."""
        if buf[0]:
            return buf
        table = self._table(buf)
        n = len(table)
        fps = _fingerprints(keys)
        i1s = _index1(keys, n)
        for j in range(len(keys)):
            fp, i1 = fps[j], i1s[j]
            i2 = int(_alt_index(np.array([i1]), np.array([fp]), n)[0])
            row1, row2 = table[i1], table[i2]
            if (row1 == fp).any() or (row2 == fp).any():
                continue
            placed = False
            for row in (row1, row2):
                empty = np.flatnonzero(row == 0)
                if len(empty):
                    row[empty[0]] = fp
                    placed = True
                    break
            if placed:
                continue
            # evict: deterministic kick path (crawl state must be a pure
            # function of data — no RNG)
            cur_fp, cur_i = int(fp), int(i1)
            for kick in range(MAX_KICKS):
                slot = (kick + cur_fp) % SLOTS
                victim = int(table[cur_i, slot])
                table[cur_i, slot] = cur_fp
                cur_fp = victim
                cur_i = int(_alt_index(np.array([cur_i]),
                                       np.array([np.uint16(cur_fp)]), n)[0])
                row = table[cur_i]
                empty = np.flatnonzero(row == 0)
                if len(empty):
                    row[empty[0]] = cur_fp
                    placed = True
                    break
            if not placed:
                # park the homeless victim anywhere correct is impossible —
                # saturate: every probe answers "maybe" (exact join decides)
                buf[0] = 1
                return buf
        return buf

    def contains(self, buf: np.ndarray, size_bits: int,
                 keys: np.ndarray) -> np.ndarray:
        if buf[0]:
            return np.ones(len(keys), dtype=bool)
        table = self._table(buf)
        n = len(table)
        fps = _fingerprints(keys)
        i1 = _index1(keys, n)
        i2 = _alt_index(i1, fps, n)
        col = fps[:, None]
        return ((table[i1] == col).any(axis=1)
                | (table[i2] == col).any(axis=1))

    def delete(self, buf: np.ndarray, size_bits: int,
               keys: np.ndarray) -> int:
        """Remove ONE fingerprint copy per key (first match wins, bucket 1
        before bucket 2, lowest slot first — deterministic). Returns the
        number actually removed. Only call for keys known inserted; the
        caller restores the no-false-negative invariant for survivors (see
        ``SeenSet.expire``). No-op on a saturated filter (its contents are
        already unreachable)."""
        if buf[0]:
            return 0
        table = self._table(buf)
        n = len(table)
        fps = _fingerprints(keys)
        i1s = _index1(keys, n)
        removed = 0
        for j in range(len(keys)):
            fp = fps[j]
            for idx in (int(i1s[j]),
                        int(_alt_index(i1s[j:j + 1], fps[j:j + 1], n)[0])):
                hit = np.flatnonzero(table[idx] == fp)
                if len(hit):
                    table[idx, hit[0]] = 0
                    removed += 1
                    break
        return removed


class BloomCore:
    """The original per-bucket bloom as a strategy object (insert-only;
    superset-safe: TTL-expired keys stay resident until a full rebuild)."""

    name = "bloom"
    supports_delete = False

    def __init__(self, n_hashes: int = 7):
        self.k = n_hashes

    @staticmethod
    def is_saturated(buf: np.ndarray) -> bool:
        return False

    def empty(self, size_bits: int) -> np.ndarray:
        return np.zeros(size_bits // 8, dtype=np.uint8)

    def insert(self, buf: np.ndarray, size_bits: int,
               keys: np.ndarray) -> np.ndarray:
        from .seen import _positions, _set_bits
        _set_bits(buf, _positions(keys, self.k, size_bits))
        return buf

    def contains(self, buf: np.ndarray, size_bits: int,
                 keys: np.ndarray) -> np.ndarray:
        from .seen import _positions, _test_bits
        return _test_bits(buf, _positions(keys, self.k, size_bits))


def get_core(name: str, n_hashes: int = 7):
    if name == "bloom":
        return BloomCore(n_hashes)
    if name == "cuckoo":
        return CuckooCore()
    raise ValueError(f"unknown seen-filter backend: {name!r}")
