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
backed by an exact store of full 32-byte digests (no false drops, ever).
The exact store is a flat sorted numpy array (``state/digestset.py``,
~32 B/entry vs ~250 B/entry for a Python ``set[bytes]`` — the round-3
stress measured 252 B/entry RSS, dominated by set overhead), probed with
vectorized ``searchsorted``. New hashes accumulate in a per-round delta
(packed digest arrays, hexlified only at write time), flushed to Parquet
by the actor itself (``seen/round=<d>/shard=<s>.parquet``) for
checkpoint/resume — restore replays the deltas of completed rounds back
into the shards.
"""

from __future__ import annotations

import binascii
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from wbot_ray import fsio
from wbot_ray.state.cuckoo import CuckooFilter
from wbot_ray.state.digestset import DIGEST_DT, DigestStore, keys_from_bytes

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
        # pin glibc's mmap threshold: by default it adapts UPWARD after
        # early large frees, after which the round's multi-MB numpy
        # transients come from brk arenas and linger as RSS slack;
        # pinned at 1 MB every big transient is mmap'd and returned to
        # the OS at free (measured: ~55 MB lower peak, flat steady RSS)
        import ctypes

        try:
            ctypes.CDLL("libc.so.6").mallopt(-3, 1 << 20)  # M_MMAP_THRESHOLD
        except Exception:
            pass
        self.shard_id = shard_id
        self._exact = DigestStore()
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
        # round d+1's pipeline). Values are packed digest arrays —
        # hex strings exist only inside the Parquet file.
        self._delta: dict[int, list[np.ndarray]] = {}
        # replay cache: (last round served, its decision mask, a digest
        # of the packed input it answered) — see check_and_set's
        # idempotency contract. The input digest guards the replay path:
        # serving the cached mask is only correct for the SAME candidate
        # batch, which holds when fetch/extract is deterministic; a
        # non-deterministic upstream (live HTTP re-fetch yielding
        # different candidates) must fail loudly, not silently apply a
        # stale mask to a different group.
        self._last_round: int | None = None
        self._last_mask: np.ndarray | None = None
        self._last_digest: bytes | None = None

    def check_and_set(self, round_id: int, hashes) -> np.ndarray:
        """First-wins check-and-set over an *ordered* candidate batch (the
        order defines which duplicate within the call wins). Returns a bool
        mask: True = newly inserted (crawl it), False = already seen.

        ``hashes`` is either a list of sha256-hex strings, or the PACKED
        form: one ``bytes`` of concatenated 32-byte digests. Callers at
        scale send the packed form — it serializes as one buffer through
        the object store instead of millions of Python strings (the hex
        list was the dominant transient in the shard's peak RSS).

        Idempotent per ``round_id``: the shard receives exactly one call
        per crawl round, so a repeat of the last round_id is a replay
        (e.g. a Ray task retry after a worker died AFTER the actor call
        succeeded) — the recorded decision mask is returned without
        re-mutating state, preserving the identical-visited-set invariant
        under task retries. A replay whose input differs from the
        recorded call (possible only with a non-deterministic fetch
        stage, e.g. live HTTP in strict mode) raises instead of serving
        the stale mask — the caller should restart with
        ``crawl(resume=True)`` to replay deterministically."""
        if isinstance(hashes, (bytes, bytearray, memoryview)):
            raw = bytes(hashes)
        else:
            raw = binascii.unhexlify("".join(hashes))
        digest = hashlib.md5(raw).digest()
        if round_id == self._last_round:
            if digest != self._last_digest:
                raise RuntimeError(
                    f"seen shard replay of round {round_id} with a "
                    "different candidate batch than the recorded call — "
                    "upstream fetch/extract is not deterministic; restart "
                    "with crawl(resume=True)"
                )
            return self._last_mask
        keys = keys_from_bytes(raw)
        n = len(keys)
        if n == 0:
            mask = np.empty(0, dtype=bool)
            self._last_round, self._last_mask = round_id, mask
            self._last_digest = digest
            return mask
        prefixes = keys["a"].astype(np.uint64)
        # vectorized probe: cuckoo negative fast path, then ONE
        # searchsorted over the flat store for the maybe-present rows
        # (no per-hash loop anywhere)
        maybe = self._cuckoo.contains_many(prefixes)
        _, first_idx = np.unique(keys, return_index=True)
        is_first = np.zeros(n, dtype=bool)
        is_first[first_idx] = True
        in_exact = np.zeros(n, dtype=bool)
        mi = np.nonzero(maybe)[0]
        if mi.size:
            in_exact[mi] = self._exact.contains(keys[mi])
        mask = is_first & ~in_exact
        new_idx = np.nonzero(mask)[0]
        new_keys = keys[new_idx]  # fancy index = owned copy
        self._exact.add(new_keys)
        for p in prefixes[new_idx]:
            self._cuckoo.add(int(p))
        self._delta.setdefault(round_id, []).append(new_keys)
        self._maybe_grow()
        self._last_round, self._last_mask = round_id, mask
        self._last_digest = digest
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
        for p in self._exact.prefixes():
            fresh.add(int(p))
        self._cuckoo = fresh

    def flush_delta(self, round_id: int, path: str) -> int:
        """Write ``round_id``'s newly-seen hashes to Parquet and drop
        them from the delta map. The actor writes its own file — deltas
        never transit the driver."""
        arrs = self._delta.pop(round_id, [])
        fsio.makedirs(fsio.dirname(path))
        n_total = sum(len(a) for a in arrs)
        schema = pa.schema([("url_hash", pa.string())])
        chunk = 1 << 18  # bound the hexlify/arrow transient per row group
        writer = fsio.parquet_writer(path, schema)
        try:
            if n_total == 0:
                writer.write_table(schema.empty_table())
            for a in arrs:
                for s in range(0, len(a), chunk):
                    # fields may be NATIVE order after merges (values
                    # preserved) — force the declared big-endian layout
                    # so the serialized bytes are the original digests
                    seg = a[s : s + chunk].astype(DIGEST_DT, copy=False)
                    hx = np.frombuffer(
                        binascii.hexlify(np.ascontiguousarray(seg).tobytes()),
                        dtype="S64",
                    )
                    writer.write_table(
                        pa.table(
                            {"url_hash": pa.array(hx).cast(pa.string())},
                            schema=schema,
                        )
                    )
        finally:
            writer.close()
        self._trim()  # round boundary: release the hexlify/write arenas
        return n_total

    def load_hashes(self, paths: list[str]) -> int:
        """Replay checkpoint deltas (resume path) — no delta recording."""
        for p in paths:
            pf = fsio.parquet_file(p)
            # stream record batches: a restore of millions of hashes must
            # not hold the whole hex column as Python strings at once
            for rb in pf.iter_batches(columns=["url_hash"], batch_size=1 << 18):
                keys = keys_from_bytes(
                    binascii.unhexlify("".join(rb.column(0).to_pylist()))
                )
                if not len(keys):
                    continue
                fresh = np.unique(keys[~self._exact.contains(keys)])
                self._exact.add(fresh)
                for pref in fresh["a"].astype(np.uint64):
                    self._cuckoo.add(int(pref))
            pf.close()
        self._maybe_grow()
        self._trim()
        return len(self._exact)

    @staticmethod
    def _trim() -> None:
        """Return freed glibc arenas to the OS. A long-lived state actor
        churns medium-size numpy transients every round; without an
        explicit trim the allocator retains them as fragmented arenas
        and the actor's RSS creeps far above its live data (measured:
        ~215 MB of slack over a 139 MB store after 25 rounds)."""
        import ctypes

        try:
            ctypes.CDLL("libc.so.6").malloc_trim(0)
        except Exception:
            pass  # non-glibc platform: nothing to trim

    def size(self) -> int:
        return len(self._exact)

    def memory_stats(self) -> dict:
        """Per-shard memory accounting for capacity planning: exact-set
        cardinality, filter capacity/bytes, and the actor process RSS
        (the ground truth a cluster memory budget is written against)."""
        import resource

        with open("/proc/self/statm") as f:
            rss_now_mb = int(f.read().split()[1]) * 4096 / 1048576
        # PSS: shared pages (Ray's plasma segments mapped into this
        # process for incoming zero-copy args, shared libs) prorated —
        # the fair per-actor figure for cluster capacity planning
        pss_now_mb = None
        try:
            with open("/proc/self/smaps_rollup") as f:
                for line in f:
                    if line.startswith("Pss:"):
                        pss_now_mb = int(line.split()[1]) / 1024
                        break
        except OSError:
            pass
        cu = self._cuckoo
        return {
            "shard_id": self.shard_id,
            "n_exact": len(self._exact),
            "store_bytes": self._exact.nbytes(),
            "rss_now_mb": round(rss_now_mb, 1),
            "pss_now_mb": round(pss_now_mb, 1) if pss_now_mb is not None else None,
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
        self.capacity_hint = capacity_hint
        self.filter_kind = filter_kind
        self.shards = [
            _SeenShard.remote(s, capacity_hint, filter_kind)
            for s in range(num_shards)
        ]

    def dead_shards(self) -> list[int]:
        """Probe every shard; ids whose actor no longer answers."""
        dead = []
        for s, sh in enumerate(self.shards):
            try:
                ray.get(sh.size.remote())
            except ray.exceptions.RayActorError:
                dead.append(s)
        return dead

    def heal(self, round_dirs: list[str]) -> list[int]:
        """Recreate dead shard actors and replay their committed-round
        deltas (per-partition lineage: each shard's state is exactly the
        union of its own ``shard=<s>.parquet`` delta files, so recovery
        touches only the dead shard — survivors keep their in-memory
        state AND their current-round replay cache). Returns healed ids."""
        healed = []
        for s in self.dead_shards():
            fresh = _SeenShard.remote(s, self.capacity_hint, self.filter_kind)
            paths = [
                fsio.join(d, f"shard={s}.parquet")
                for d in round_dirs
                if fsio.exists(fsio.join(d, f"shard={s}.parquet"))
            ]
            ray.get(fresh.load_hashes.remote(paths))
            self.shards[s] = fresh
            healed.append(s)
        return healed

    def flush_deltas_async(self, round_id: int, round_dir: str) -> list:
        """Submit every shard's round-``round_id`` delta flush; returns
        the futures so the caller can overlap the writes with the next
        round's pipeline and ``ray.get`` them before committing the
        round to the manifest."""
        return [
            sh.flush_delta.remote(
                round_id, fsio.join(round_dir, f"shard={s}.parquet")
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
                fsio.join(d, f"shard={s}.parquet")
                for d in round_dirs
                if fsio.exists(fsio.join(d, f"shard={s}.parquet"))
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
