"""Unit tests for the seen-set state structures (cuckoo filter + shards)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from wbot_ray.state.cuckoo import CuckooFilter


def _hashes(n: int, seed: int = 0) -> list[int]:
    return [
        int.from_bytes(hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=8).digest(), "big")
        for i in range(n)
    ]


class TestCuckooFilter:
    def test_no_false_negatives(self):
        cf = CuckooFilter(capacity=1000)
        hs = _hashes(900)
        for h in hs:
            cf.add(h)
        assert all(cf.contains(h) for h in hs)
        arr = np.array(hs, dtype=np.uint64)
        assert cf.contains_many(arr).all()

    def test_low_false_positive_rate(self):
        cf = CuckooFilter(capacity=2000)
        for h in _hashes(1500, seed=1):
            cf.add(h)
        probe = np.array(_hashes(5000, seed=2), dtype=np.uint64)
        fp_rate = cf.contains_many(probe).mean()
        assert fp_rate < 0.02  # 16-bit fingerprints, 2x4 slots

    def test_overflow_correctness_past_capacity(self):
        cf = CuckooFilter(capacity=64)
        hs = _hashes(500, seed=3)
        for h in hs:
            cf.add(h)
        assert all(cf.contains(h) for h in hs)  # "no" must stay reliable


@pytest.mark.usefixtures("ray_session")
class TestShardGrowth:
    def test_filter_grows_past_hint(self):
        """A shard sized with a tiny hint must not degrade into the
        overflow set — the filter rebuilds at 2x from the exact set."""
        import ray

        from wbot_ray.state.seen import _SeenShard

        shard = _SeenShard.remote(0, capacity_hint=256)
        hashes = [hashlib.sha256(f"u{i}".encode()).hexdigest() for i in range(5000)]
        mask = ray.get(shard.check_and_set.remote(hashes))
        assert mask.all()  # all new
        mask2 = ray.get(shard.check_and_set.remote(hashes))
        assert not mask2.any()  # all seen, despite 20x past the hint
        assert ray.get(shard.size.remote()) == 5000
        ray.kill(shard)
