"""Bloom filter — the second approximate-membership option the north
rule names ("bloom/cuckoo URL-seen").

Drop-in alternative to :class:`wbot_ray.state.cuckoo.CuckooFilter` in
the seen-set shards (same contract: ``contains_many`` vectorized
negative fast path, ``add``, ``count``/``capacity`` growth trigger,
rebuildable via ``type(f)(new_capacity)``): a "definitely not seen"
answer skips the exact-set probe; "maybe" falls through, so false
positives never drop URLs.

Layout: one ``uint64`` word array of ``m`` bits, ``k = 7`` probes per
item via double hashing (Kirsch–Mitzenmacher: ``pos_i = h1 + i·h2``) —
~10 bits/entry ≈ 1.25 bytes/entry at the sizing point (vs the cuckoo's
~2.1 B/entry; the trade: no deletion, FP rate degrades smoothly past
capacity instead of overflowing, probes touch k cache lines instead of
2). ``contains_many`` is k vectorized gathers over the word array — no
Python loop over hashes.
"""

from __future__ import annotations

import numpy as np

__all__ = ["BloomFilter"]

_K = 7
_BITS_PER_ENTRY = 10
# odd multiplier for the second hash (splitmix64 constant)
_H2_MULT = np.uint64(0x9E3779B97F4A7C15)


class BloomFilter:
    def __init__(self, capacity: int, seed: int = 0x5EED) -> None:
        m_bits = 1 << max(6, (int(capacity) * _BITS_PER_ENTRY - 1).bit_length())
        self._bit_mask = np.uint64(m_bits - 1)
        self._words = np.zeros(m_bits >> 6, dtype=np.uint64)
        self._seed = np.uint64(seed)
        self.count = 0
        # same growth-trigger contract as CuckooFilter: past this point
        # the owner rebuilds at 2× from its exact set
        self.capacity = int(capacity)

    @staticmethod
    def _fmix64(x: np.ndarray) -> np.ndarray:
        """murmur3 finalizer — full avalanche, so bucket positions
        depend on ALL 64 input bits. Without it, ``(h·odd) & mask``
        preserves the low bits and any two keys sharing them share the
        whole probe sequence (a measured 4% guaranteed-FP floor)."""
        x = x ^ (x >> np.uint64(33))
        x = x * np.uint64(0xFF51AFD7ED558CCD)
        x = x ^ (x >> np.uint64(33))
        x = x * np.uint64(0xC4CEB9FE1A85EC53)
        return x ^ (x >> np.uint64(33))

    def _h12(self, hs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h1 = self._fmix64(hs ^ self._seed)
        h2 = self._fmix64(hs * _H2_MULT) | np.uint64(1)  # odd => full period
        return h1, h2

    def contains_many(self, hs: np.ndarray) -> np.ndarray:
        """Vectorized membership: True = maybe present, False = definitely
        absent. ``hs`` is a uint64 array."""
        hs = hs.astype(np.uint64, copy=False)
        with np.errstate(over="ignore"):  # uint64 wraparound IS the hash
            h1, h2 = self._h12(hs)
            out = np.ones(len(hs), dtype=bool)
            for i in range(_K):
                pos = (h1 + np.uint64(i) * h2) & self._bit_mask
                bit = (self._words[(pos >> np.uint64(6)).astype(np.int64)]
                       >> (pos & np.uint64(63))) & np.uint64(1)
                out &= bit.astype(bool)
        return out

    def contains(self, h: int) -> bool:
        return bool(self.contains_many(np.array([h], dtype=np.uint64))[0])

    def add(self, h: int) -> None:
        hs = np.array([h], dtype=np.uint64)
        with np.errstate(over="ignore"):
            h1, h2 = self._h12(hs)
            for i in range(_K):
                pos = int((h1[0] + np.uint64(i) * h2[0]) & self._bit_mask)
                self._words[pos >> 6] |= np.uint64(1) << np.uint64(pos & 63)
        self.count += 1
