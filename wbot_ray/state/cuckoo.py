"""Cuckoo filter — approximate membership with deletion-free inserts.

The north rule calls for a bloom/cuckoo URL-seen structure. The engine uses
this filter as a *negative fast path* in front of the exact per-shard hash
set (``wbot_ray.state.seen``): a "definitely not seen" answer skips the
exact-set probe; a "maybe seen" answer falls through to the exact set, so
false positives never drop URLs and crawl correctness stays exact.

Layout: ``buckets × 4`` slots of uint16 fingerprints in one numpy array
(fingerprint 0 = empty; fingerprints are forced non-zero). Two candidate
buckets per item, partial-key cuckoo kicking with a bounded eviction chain;
on chain overflow the item goes to a small overflow set (exactness of the
*filter's* "maybe" answer is irrelevant — only "no" must be reliable).

~2.1 bytes/entry at 95% load vs 80+ bytes/entry for a Python set of hex
strings: this is what makes 10^10 seen-URLs per-shard state feasible.
"""

from __future__ import annotations

import numpy as np

__all__ = ["CuckooFilter"]

_SLOTS = 4
_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 0x5EED) -> None:
        # size to ~95% max load factor, power-of-two buckets
        n_buckets = 1
        while n_buckets * _SLOTS * 0.95 < capacity:
            n_buckets <<= 1
        self._mask = n_buckets - 1
        self._table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        self._overflow: set[int] = set()
        self._rng = np.random.default_rng(seed)
        self.count = 0
        self.capacity = int(n_buckets * _SLOTS * 0.95)  # growth trigger point

    @staticmethod
    def _fingerprint(h: int) -> int:
        fp = (h >> 48) & 0xFFFF
        return fp if fp else 1

    def _buckets(self, h: int) -> tuple[int, int, int]:
        fp = self._fingerprint(h)
        b1 = h & self._mask
        # partial-key: alt bucket = b1 xor hash(fp)
        b2 = (b1 ^ (fp * 0x5BD1E995)) & self._mask
        return fp, b1, b2

    def _overflow_key(self, b: int, fp: int) -> tuple[int, int]:
        """Canonical (bucket-pair, fingerprint) key: the pair is
        recoverable from either side via the partial-key involution."""
        alt = (b ^ (fp * 0x5BD1E995)) & self._mask
        return (min(b, alt), fp)

    def contains(self, h: int) -> bool:
        fp, b1, b2 = self._buckets(h)
        if fp in self._table[b1] or fp in self._table[b2]:
            return True
        return self._overflow_key(b1, fp) in self._overflow

    def add(self, h: int) -> None:
        fp, b1, b2 = self._buckets(h)
        for b in (b1, b2):
            row = self._table[b]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return
        # evict: bounded cuckoo-kick chain
        b = b1
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(_SLOTS))
            fp, self._table[b, slot] = int(self._table[b, slot]), fp
            b = (b ^ (fp * 0x5BD1E995)) & self._mask
            row = self._table[b]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return
        # chain failed: the HOMELESS entry is the last displaced
        # fingerprint (not necessarily the inserted item) — park its
        # (bucket-pair, fp) so its owner can never go false-negative
        self._overflow.add(self._overflow_key(b, fp))
        self.count += 1

    def contains_many(self, hs: np.ndarray) -> np.ndarray:
        """Vectorized bulk probe: both candidate buckets for all items at
        once (the hot path for per-batch membership checks)."""
        hs = hs.astype(np.uint64, copy=False)
        fp = ((hs >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        b1 = (hs & np.uint64(self._mask)).astype(np.int64)
        b2 = ((b1 ^ (fp.astype(np.int64) * 0x5BD1E995)) & self._mask).astype(np.int64)
        hit = (self._table[b1] == fp[:, None]).any(axis=1)
        hit |= (self._table[b2] == fp[:, None]).any(axis=1)
        if self._overflow:
            miss = np.flatnonzero(~hit)
            for i in miss:
                if self._overflow_key(int(b1[i]), int(fp[i])) in self._overflow:
                    hit[i] = True
        return hit
