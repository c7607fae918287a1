"""Flat numpy digest set — the exact backing store of a seen-set shard.

A Python ``set[bytes]`` costs ~250 B per 32-byte sha256 digest (object
header + hash-table slot + bytes object). At the north rule's 10^10-URL
frontier that's TBs of aggregate actor heap for state that is logically
a packed array of digests. This store keeps digests as a CHUNKED sorted
numpy run (~32 B/entry, >7x smaller), probed with vectorized
``searchsorted``:

* ``contains`` = ``np.searchsorted`` against each chunk + the (small,
  sorted) pending run — no per-key Python anywhere;
* ``add`` appends to pending (one vectorized 2-way merge); when pending
  outgrows its cap it merges INTO the chunk list one chunk at a time,
  freeing each source chunk as its replacement lands — so the merge
  transient is ~2 chunks (+ pending), NOT 2x the whole store. A
  monolithic sorted array costs 3x the store at merge time (old + new +
  sort workspace), which is exactly the peak-RSS cliff the chunking
  removes;
* 2-way merges use the searchsorted positional scatter (O(n), no sort,
  no sort workspace);
* digests compare as 4 uint64 fields over the big-endian byte layout —
  exact 256-bit identity, no truncation.

Records are full sha256 digests, so two distinct URLs never collide
(the approximate filter in front of this store only short-circuits
definite misses; THIS structure is why the visited set is exact).
"""

from __future__ import annotations

import numpy as np

__all__ = ["DigestStore", "DIGEST_DT", "keys_from_bytes"]

# 32-byte digest as 4 big-endian u64 fields: field-order comparison ==
# byte-lexicographic comparison, and field "a" IS the 8-byte prefix the
# approximate filters fingerprint
DIGEST_DT = np.dtype([("a", ">u8"), ("b", ">u8"), ("c", ">u8"), ("d", ">u8")])
# internal storage uses NATIVE field order (np.concatenate and friends
# convert to it anyway, values preserved); serialize via
# .astype(DIGEST_DT) so the raw bytes are the original digests
_NATIVE_DT = np.dtype([("a", "u8"), ("b", "u8"), ("c", "u8"), ("d", "u8")])

# ~16 MB of digests per chunk: the unit of merge transient
_CHUNK_ENTRIES = 1 << 19


def keys_from_bytes(raw: bytes) -> np.ndarray:
    """View a concatenation of 32-byte digests as a key array."""
    return np.frombuffer(raw, dtype=DIGEST_DT)


def _merge2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Merge two sorted, disjoint key arrays in O(n) with no sort
    workspace: scatter ``b`` to its searchsorted positions, fill the
    rest with ``a``."""
    if len(a) == 0:
        return b
    if len(b) == 0:
        return a
    pos_b = np.searchsorted(a, b) + np.arange(len(b))
    out = np.empty(len(a) + len(b), a.dtype)
    mask = np.ones(len(out), dtype=bool)
    mask[pos_b] = False
    out[pos_b] = b
    out[mask] = a
    return out


class DigestStore:
    """Chunked-sorted-run exact membership set over 32-byte digests."""

    def __init__(self) -> None:
        # ordered, disjoint-range, individually sorted chunks of one
        # logical sorted run (correctness only needs each chunk sorted)
        self._chunks: list[np.ndarray] = []
        self._pend = np.empty(0, _NATIVE_DT)  # sorted, disjoint from chunks
        self._n = 0
        # routing index: last key of each chunk (chunks are ordered and
        # range-disjoint, so ONE searchsorted against this array sends
        # every probe key to its single owning chunk). Rebuilt lazily
        # after merges.
        self._maxes: np.ndarray | None = None

    def __len__(self) -> int:
        return self._n

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership mask for ``keys`` (DIGEST_DT array).

        Chunks form one globally sorted, range-disjoint run, so each key
        has exactly one owning chunk: one searchsorted over the chunk
        max-keys routes every key, then only the chunks that actually
        own probe keys are binary-searched — O(log n) per probe overall
        instead of O(num_chunks · log chunk) (~20k chunks/shard at the
        10^10-URL design point)."""
        out = np.zeros(len(keys), dtype=bool)
        if len(keys) == 0:
            return out
        keys = keys.astype(_NATIVE_DT, copy=False)
        chunks = self._chunks
        if chunks:
            if self._maxes is None:
                self._maxes = np.array([c[-1] for c in chunks], _NATIVE_DT)
            owner = np.searchsorted(self._maxes, keys, side="left")
            routable = np.nonzero(owner < len(chunks))[0]
            for ci in np.unique(owner[routable]):
                sel = routable[owner[routable] == ci]
                run = chunks[ci]
                pos = np.searchsorted(run, keys[sel])
                pos = np.clip(pos, 0, len(run) - 1)
                out[sel] |= run[pos] == keys[sel]
        pend = self._pend
        if len(pend):
            pos = np.searchsorted(pend, keys)
            pos = np.clip(pos, 0, len(pend) - 1)
            out |= pend[pos] == keys
        return out

    def add(self, keys: np.ndarray) -> None:
        """Insert ``keys`` (caller guarantees they are NOT already
        present — the shard checks membership first); duplicates within
        the batch collapse here."""
        if len(keys) == 0:
            return
        ks = np.unique(keys.astype(_NATIVE_DT, copy=False))
        self._pend = _merge2(self._pend, ks)
        self._n = sum(len(c) for c in self._chunks) + len(self._pend)
        # cap pending at ~1 chunk (or store/8 when small): bounds both
        # the per-probe extra run and the merge transient
        cap = max(1 << 16, min((self._n - len(self._pend)) >> 3, _CHUNK_ENTRIES))
        if len(self._pend) > cap:
            self._merge_pend()

    def _merge_pend(self) -> None:
        """Fold pending into the chunk list, chunk by chunk, freeing
        each source chunk as soon as its replacement exists — peak
        transient ~2 chunks + pending, independent of store size."""
        pend = self._pend
        self._pend = np.empty(0, _NATIVE_DT)
        out: list[np.ndarray] = []
        for i, chunk in enumerate(self._chunks):
            if len(pend) == 0:
                out.extend(self._chunks[i:])
                break
            # pend keys belonging to this chunk's range (last chunk
            # takes everything left)
            is_last = i == len(self._chunks) - 1
            cut = len(pend) if is_last else int(
                np.searchsorted(pend, chunk[-1], side="right")
            )
            merged = _merge2(chunk, pend[:cut])
            pend = pend[cut:]
            self._chunks[i] = np.empty(0, _NATIVE_DT)  # free source early
            # keep chunks near the target size so the transient stays
            # bounded as the store grows
            if len(merged) > 2 * _CHUNK_ENTRIES:
                half = len(merged) // 2
                out.append(merged[:half].copy())
                out.append(merged[half:].copy())
            else:
                out.append(merged)
        else:
            if len(pend):
                for s in range(0, len(pend), _CHUNK_ENTRIES):
                    out.append(pend[s : s + _CHUNK_ENTRIES].copy())
        self._chunks = out
        self._maxes = None  # chunk boundaries moved — rebuild on next probe

    def prefixes(self) -> np.ndarray:
        """All stored 8-byte big-endian prefix VALUES (uint64) — the
        filter rebuild input."""
        parts = [run["a"] for run in (*self._chunks, self._pend) if len(run)]
        if not parts:
            return np.empty(0, np.uint64)
        return np.concatenate(parts).astype(np.uint64)

    def nbytes(self) -> int:
        return int(sum(c.nbytes for c in self._chunks) + self._pend.nbytes)
