"""Sharded URL-seen set — the engine's cross-round dedup state.

Replaces the reference's global mutex map
(``/root/reference/pkg/services/store/in_memory.go:10-33``) with a pool of
shard actors: shard = ``int(url_hash[:8], 16) % num_shards`` (sha256-hex
prefix — deterministic, independent of PYTHONHASHSEED). Each candidate
url_hash is owned by exactly one shard, so check-and-set needs no
cross-actor coordination, and each dedup task (one per shard per round,
see ``wbot_ray.stages.dedup``) makes exactly ONE ordered call per round —
which is what makes first-wins semantics deterministic regardless of Ray
scheduling.

Per shard: a cuckoo filter over the 64-bit hash prefix as negative fast
path (~2 bytes/entry — the 10^10-scale structure the north rule asks for)
backed by an exact set of 16-byte digests (no false drops, ever). New
hashes accumulate in a per-round delta, flushed to Parquet by the actor
itself (``seen/round=<d>/shard=<s>.parquet``) for checkpoint/resume —
restore replays the deltas of completed rounds back into the shards.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from wbot_ray.state.cuckoo import CuckooFilter

__all__ = ["SeenSet", "shard_of", "SHARD_PREFIX_LEN"]

SHARD_PREFIX_LEN = 8


def shard_of(url_hash: str, num_shards: int) -> int:
    """Deterministic shard id of a sha256-hex url hash."""
    return int(url_hash[:SHARD_PREFIX_LEN], 16) % num_shards


@ray.remote
class _SeenShard:
    """One shard of the URL-seen set. All methods are called either by the
    driver (flush/load/stats) or by exactly one dedup task per round
    (check_and_set) — the actor's mailbox serializes them."""

    def __init__(
        self, shard_id: int, capacity_hint: int = 1 << 16, filter_kind: str = "cuckoo"
    ) -> None:
        self.shard_id = shard_id
        self._exact: set[bytes] = set()
        if filter_kind == "bloom":
            from wbot_ray.state.bloom import BloomFilter

            self._cuckoo = BloomFilter(capacity_hint)
        elif filter_kind == "cuckoo":
            self._cuckoo = CuckooFilter(capacity_hint)
        else:
            raise ValueError(f"unknown seen_filter {filter_kind!r}")
        # per-round deltas: flushes are addressed BY round, so a delayed
        # flush of round d can never swallow hashes inserted by round
        # d+1's check_and_set (the driver overlaps round-d flushes with
        # round d+1's pipeline)
        self._delta: dict[int, list[str]] = {}
        # replay cache: (last round served, its decision mask) — see
        # check_and_set's idempotency contract
        self._last_round: int | None = None
        self._last_mask: np.ndarray | None = None

    def check_and_set(self, round_id: int, hashes: list[str]) -> np.ndarray:
        """First-wins check-and-set over an *ordered* hash list (the order
        defines which duplicate within the call wins). Returns a bool mask:
        True = newly inserted (crawl it), False = already seen.

        Idempotent per ``round_id``: the shard receives exactly one call
        per crawl round, so a repeat of the last round_id is a replay
        (e.g. a Ray task retry after a worker died AFTER the actor call
        succeeded) — the recorded decision mask is returned without
        re-mutating state, preserving the identical-visited-set invariant
        under task retries."""
        if round_id == self._last_round:
            return self._last_mask
        n = len(hashes)
        if n == 0:
            mask = np.empty(0, dtype=bool)
            self._last_round, self._last_mask = round_id, mask
            return mask
        digests = [bytes.fromhex(h) for h in hashes]
        joined = b"".join(digests)
        prefixes = np.frombuffer(
            b"".join(d[:8] for d in digests), dtype=">u8"
        ).astype(np.uint64)
        # vectorized probe: cuckoo negative fast path, then exact-set
        # membership only for the maybe-present rows (no per-hash loop
        # over definite misses)
        maybe = self._cuckoo.contains_many(prefixes)
        dig_view = np.frombuffer(joined, dtype=np.dtype((np.void, len(digests[0]))))
        _, first_idx = np.unique(dig_view, return_index=True)
        is_first = np.zeros(n, dtype=bool)
        is_first[first_idx] = True
        in_exact = np.zeros(n, dtype=bool)
        exact = self._exact
        for i in np.nonzero(maybe)[0]:
            in_exact[i] = digests[i] in exact
        mask = is_first & ~in_exact
        new_idx = np.nonzero(mask)[0]
        for i in new_idx:
            exact.add(digests[i])
            self._cuckoo.add(int(prefixes[i]))
        self._delta.setdefault(round_id, []).extend(hashes[i] for i in new_idx)
        self._maybe_grow()
        self._last_round, self._last_mask = round_id, mask
        return mask

    def _maybe_grow(self) -> None:
        """Rebuild the cuckoo filter at 2× when load approaches capacity —
        without this, a filter past its sizing hint silently degrades into
        the Python overflow set (~80 B/entry vs ~2 B/entry), which is an
        OOM cliff at frontier scale. The exact digest set holds the full
        keys, so the rebuild is a plain re-insertion scan (amortized
        O(1)/insert)."""
        cu = self._cuckoo
        if cu.count <= cu.capacity:
            return
        new_cap = max(cu.capacity * 2, len(self._exact) * 2)
        fresh = type(cu)(new_cap)
        for d in self._exact:
            fresh.add(int.from_bytes(d[:8], "big"))
        self._cuckoo = fresh

    def flush_delta(self, round_id: int, path: str) -> int:
        """Write ``round_id``'s newly-seen hashes to Parquet and drop
        them from the delta map. The actor writes its own file — deltas
        never transit the driver."""
        delta = self._delta.pop(round_id, [])
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(pa.table({"url_hash": pa.array(delta, pa.string())}), path)
        return len(delta)

    def load_hashes(self, paths: list[str]) -> int:
        """Replay checkpoint deltas (resume path) — no delta recording."""
        for p in paths:
            for h in pq.read_table(p, columns=["url_hash"]).column("url_hash").to_pylist():
                d = bytes.fromhex(h)
                if d not in self._exact:
                    self._exact.add(d)
                    self._cuckoo.add(int.from_bytes(d[:8], "big"))
        self._maybe_grow()
        return len(self._exact)

    def size(self) -> int:
        return len(self._exact)

    def memory_stats(self) -> dict:
        """Per-shard memory accounting for capacity planning: exact-set
        cardinality, filter capacity/bytes, and the actor process RSS
        (the ground truth a cluster memory budget is written against)."""
        import resource

        cu = self._cuckoo
        return {
            "shard_id": self.shard_id,
            "n_exact": len(self._exact),
            "filter_kind": type(cu).__name__,
            "filter_capacity": int(cu.capacity),
            "filter_count": int(cu.count),
            "rss_mb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
            ),
        }


class SeenSet:
    """Driver-side handle over the shard actor pool."""

    def __init__(
        self,
        num_shards: int,
        capacity_hint: int = 1 << 16,
        filter_kind: str = "cuckoo",
    ) -> None:
        self.num_shards = num_shards
        self.shards = [
            _SeenShard.remote(s, capacity_hint, filter_kind)
            for s in range(num_shards)
        ]

    def flush_deltas_async(self, round_id: int, round_dir: str) -> list:
        """Submit every shard's round-``round_id`` delta flush; returns
        the futures so the caller can overlap the writes with the next
        round's pipeline and ``ray.get`` them before committing the
        round to the manifest."""
        return [
            sh.flush_delta.remote(
                round_id, os.path.join(round_dir, f"shard={s}.parquet")
            )
            for s, sh in enumerate(self.shards)
        ]

    def flush_deltas(self, round_id: int, round_dir: str) -> int:
        """Checkpoint every shard's delta under ``round_dir`` (parallel,
        blocking)."""
        return int(sum(ray.get(self.flush_deltas_async(round_id, round_dir))))

    def restore(self, round_dirs: list[str]) -> int:
        """Replay deltas from completed rounds into the shards (parallel)."""
        futs = []
        for s, sh in enumerate(self.shards):
            paths = [
                os.path.join(d, f"shard={s}.parquet")
                for d in round_dirs
                if os.path.exists(os.path.join(d, f"shard={s}.parquet"))
            ]
            futs.append(sh.load_hashes.remote(paths))
        return int(sum(ray.get(futs)))

    def total_size(self) -> int:
        return int(sum(ray.get([sh.size.remote() for sh in self.shards])))

    def memory_stats(self) -> list[dict]:
        return ray.get([sh.memory_stats.remote() for sh in self.shards])

    def shutdown(self) -> None:
        for sh in self.shards:
            ray.kill(sh)
        self.shards = []
