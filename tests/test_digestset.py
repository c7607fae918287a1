"""Unit tests for the flat numpy digest store (state/digestset.py) and
the shard serialization paths built on it.

The byteorder test pins a real regression found in round 4:
``np.concatenate`` silently converts big-endian structured fields to
NATIVE order (values preserved, raw bytes byteswapped), so serializing
concatenated keys without forcing the declared layout wrote byteswapped
hex to the checkpoint — restore then rebuilt a disjoint seen set and
the crawl re-visited every URL.
"""

from __future__ import annotations

import binascii
import hashlib

import numpy as np
import pytest

from wbot_ray.state.digestset import DIGEST_DT, DigestStore, keys_from_bytes


def _keys(n: int, seed: int = 0) -> np.ndarray:
    return keys_from_bytes(np.random.default_rng(seed).bytes(32 * n))


class TestDigestStore:
    def test_set_semantics(self):
        st = DigestStore()
        k = _keys(1000)
        st.add(np.unique(k[:600]))
        got = st.contains(k)
        assert got[:600].all() and not got[600:].any()
        st.add(np.unique(k[600:]))
        assert st.contains(k).all()
        assert len(st) == 1000

    def test_no_false_positives_across_merges(self):
        st = DigestStore()
        rng = np.random.default_rng(7)
        inserted = []
        for _ in range(60):
            b = keys_from_bytes(rng.bytes(32 * 5000)).copy()
            fresh = np.unique(b[~st.contains(b)])
            st.add(fresh)
            inserted.append(b)
        allk = np.concatenate(inserted)
        assert st.contains(allk).all()
        assert len(st) == len(np.unique(allk))
        miss = keys_from_bytes(rng.bytes(32 * 20000))
        assert st.contains(miss).sum() == 0  # 2^-128 collision odds

    def test_chunk_bound_holds(self):
        from wbot_ray.state.digestset import _CHUNK_ENTRIES

        st = DigestStore()
        rng = np.random.default_rng(3)
        for _ in range(40):
            b = np.unique(keys_from_bytes(rng.bytes(32 * 60000)))
            st.add(b[~st.contains(b)])
        assert st._chunks, "store should have promoted pending to chunks"
        assert max(len(c) for c in st._chunks) <= 2 * _CHUNK_ENTRIES

    def test_concatenate_byteorder_regression(self):
        # np.concatenate flips structured fields to native order; the
        # VALUES survive but tobytes() does not — serialization must go
        # through astype(DIGEST_DT)
        k = _keys(4)
        cat = np.concatenate([k[:2], k[2:]])
        assert (np.sort(cat) == np.sort(k.astype(cat.dtype, copy=False))).all()
        assert cat.astype(DIGEST_DT, copy=False).tobytes() == k.tobytes()
        if cat.dtype != DIGEST_DT:  # numpy converted to native order
            assert cat.tobytes() != k.tobytes()


@pytest.mark.usefixtures("ray_session")
class TestShardSerialization:
    def test_flush_hex_is_canonical_and_restores(self, tmp_path):
        from wbot_ray.state import seen as seenmod

        cls = seenmod._SeenShard.__ray_metadata__.modified_class
        hashes = [hashlib.sha256(f"u{i}".encode()).hexdigest() for i in range(500)]
        sh = cls(0)
        mask = sh.check_and_set(0, binascii.unhexlify("".join(hashes)))
        assert mask.all()
        p = str(tmp_path / "shard=0.parquet")
        assert sh.flush_delta(0, p) == 500
        import pyarrow.parquet as pq

        col = pq.read_table(p).column("url_hash").to_pylist()
        assert set(col) == set(hashes)  # canonical hex, not byteswapped
        fresh = cls(0)
        assert fresh.load_hashes([p]) == 500
        again = fresh.check_and_set(1, binascii.unhexlify("".join(hashes)))
        assert not again.any()  # everything recognized after restore

    def test_packed_and_hex_calls_agree(self):
        from wbot_ray.state import seen as seenmod

        cls = seenmod._SeenShard.__ray_metadata__.modified_class
        hashes = [hashlib.sha256(f"v{i}".encode()).hexdigest() for i in range(64)]
        dup_stream = hashes + hashes[:10]
        a = cls(0).check_and_set(0, dup_stream)
        b = cls(0).check_and_set(0, binascii.unhexlify("".join(dup_stream)))
        assert (a == b).all() and a[:64].all() and not a[64:].any()
