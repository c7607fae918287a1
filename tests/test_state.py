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


class TestBloomFilter:
    def test_no_false_negatives(self):
        from wbot_ray.state.bloom import BloomFilter

        bf = BloomFilter(capacity=1000)
        hs = _hashes(900, seed=4)
        for h in hs:
            bf.add(h)
        assert all(bf.contains(h) for h in hs)
        assert bf.contains_many(np.array(hs, dtype=np.uint64)).all()

    def test_low_false_positive_rate(self):
        from wbot_ray.state.bloom import BloomFilter

        bf = BloomFilter(capacity=2000)
        for h in _hashes(1500, seed=5):
            bf.add(h)
        probe = np.array(_hashes(5000, seed=6), dtype=np.uint64)
        assert bf.contains_many(probe).mean() < 0.02  # ~10 bits/entry, k=7

    def test_rebuild_contract_matches_cuckoo(self):
        """The shard growth path constructs ``type(f)(new_capacity)`` and
        re-adds — the bloom must honor the same contract."""
        from wbot_ray.state.bloom import BloomFilter

        bf = BloomFilter(capacity=64)
        hs = _hashes(200, seed=7)
        for h in hs:
            bf.add(h)
        assert bf.count > bf.capacity  # growth would trigger
        fresh = type(bf)(1000)
        for h in hs:
            fresh.add(h)
        assert all(fresh.contains(h) for h in hs)

    def test_bloom_shard_identical_decisions(self, ray_session):
        """A bloom-backed shard returns the same check-and-set masks as
        the cuckoo-backed shard on the same ordered stream (the exact
        set is authoritative either way)."""
        import hashlib as _h

        import ray

        from wbot_ray.state.seen import _SeenShard

        hashes = [_h.sha256(f"u{i % 700}".encode()).hexdigest() for i in range(1000)]
        a = _SeenShard.remote(0, capacity_hint=256, filter_kind="cuckoo")
        b = _SeenShard.remote(0, capacity_hint=256, filter_kind="bloom")
        for rid in range(3):
            chunk = hashes[rid * 300 : (rid + 1) * 300]
            ma = ray.get(a.check_and_set.remote(rid, chunk))
            mb = ray.get(b.check_and_set.remote(rid, chunk))
            assert (ma == mb).all()


@pytest.mark.usefixtures("ray_session")
class TestShardGrowth:
    def test_filter_grows_past_hint(self):
        """A shard sized with a tiny hint must not degrade into the
        overflow set — the filter rebuilds at 2x from the exact set."""
        import ray

        from wbot_ray.state.seen import _SeenShard

        shard = _SeenShard.remote(0, capacity_hint=256)
        hashes = [hashlib.sha256(f"u{i}".encode()).hexdigest() for i in range(5000)]
        mask = ray.get(shard.check_and_set.remote(0, hashes))
        assert mask.all()  # all new
        mask2 = ray.get(shard.check_and_set.remote(1, hashes))
        assert not mask2.any()  # all seen, despite 20x past the hint
        assert ray.get(shard.size.remote()) == 5000
        ray.kill(shard)

    def test_check_and_set_round_replay_is_idempotent(self):
        """A repeated call with the SAME round_id (what a Ray task retry
        looks like after the actor call already succeeded) must return
        the recorded decision mask, not an all-seen mask — otherwise a
        retried dedup task silently drops its shard's next frontier."""
        import ray

        from wbot_ray.state.seen import _SeenShard

        shard = _SeenShard.remote(0)
        hashes = [hashlib.sha256(f"r{i}".encode()).hexdigest() for i in range(100)]
        mask = ray.get(shard.check_and_set.remote(0, hashes))
        assert mask.all()
        replay = ray.get(shard.check_and_set.remote(0, hashes))
        assert replay.all()  # replay, NOT "all already seen"
        nxt = ray.get(shard.check_and_set.remote(1, hashes))
        assert not nxt.any()  # a new round sees them as duplicates
        assert ray.get(shard.size.remote()) == 100
        ray.kill(shard)

    def test_round_replay_with_different_input_raises(self):
        """The replay cache is only valid for the SAME candidate batch:
        a repeat of the last round_id with a different input (possible
        only when upstream fetch is non-deterministic, e.g. live HTTP)
        must fail loudly instead of silently applying the stale mask to
        a re-generated group with different/reordered URLs."""
        import ray

        from wbot_ray.state.seen import _SeenShard

        shard = _SeenShard.remote(0)
        hashes = [hashlib.sha256(f"g{i}".encode()).hexdigest() for i in range(50)]
        ray.get(shard.check_and_set.remote(0, hashes))
        # same length, reordered — the dangerous silent-corruption case
        reordered = list(reversed(hashes))
        with pytest.raises(Exception, match="different candidate batch"):
            ray.get(shard.check_and_set.remote(0, reordered))
        # the shard itself is still healthy for the NEXT round
        nxt = ray.get(shard.check_and_set.remote(1, hashes))
        assert not nxt.any()
        ray.kill(shard)

    def test_check_and_set_within_call_first_wins(self):
        """Duplicates inside one ordered call: only the first occurrence
        wins (the reference's check-and-set order over the FIFO list)."""
        import ray

        from wbot_ray.state.seen import _SeenShard

        shard = _SeenShard.remote(0)
        a = hashlib.sha256(b"a").hexdigest()
        b = hashlib.sha256(b"b").hexdigest()
        mask = ray.get(shard.check_and_set.remote(0, [a, b, a, a, b]))
        assert mask.tolist() == [True, True, False, False, False]
        ray.kill(shard)


@pytest.mark.usefixtures("ray_session")
class TestDedupStageRetry:
    def test_dedup_stage_rerun_returns_identical_survivors(self):
        """Simulate a Ray task retry at the STAGE level: running the
        dedup function twice on the same group (same round) must return
        identical survivors and leave the shard state as after one run —
        the retried task's frontier contribution is not dropped."""
        import pyarrow as pa
        import ray

        from wbot_ray.state.seen import SeenSet
        from wbot_ray.stages.dedup import make_dedup_fn

        seen = SeenSet(2)
        try:
            hashes = [hashlib.sha256(f"u{i}".encode()).hexdigest() for i in range(40)]
            shard0 = [h for h in hashes if int(h[:8], 16) % 2 == 0][:10]
            group = pa.table(
                {
                    "url_hash": pa.array(shard0 + shard0[:3], pa.string()),
                    "ord64": pa.array(list(range(13)), pa.int64()),
                    "root": pa.array(["r.com"] * 13, pa.string()),
                    "seen_shard": pa.array([0] * 13, pa.int32()),
                }
            )
            fn = make_dedup_fn(seen.shards, round_id=0)
            out1 = fn(group)
            out2 = fn(group)  # the retry replay
            assert out1.column("url_hash").to_pylist() == out2.column("url_hash").to_pylist()
            assert out1.num_rows == 10  # within-round dups dropped once
            assert ray.get(seen.shards[0].size.remote()) == 10  # no double insert
        finally:
            seen.shutdown()
