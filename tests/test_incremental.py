"""Incremental materialized view: exactly-once per shard, tick merge ==
full recompute, crash-safe commit."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from wbot_ray.pipelines.incremental import (
    _state_path,
    read_lang_stats,
    update_lang_stats,
)


def _write_shard(d, name, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        os.path.join(d, name),
    )


class TestIncrementalLangStats:
    def test_ticks_equal_full_recompute(self, ray_session, tmp_path):
        shards = tmp_path / "shards"
        shards.mkdir()
        state = str(tmp_path / "state")
        _write_shard(shards, "a.parquet", [(0, "aa bb", "en"), (1, "x y z", "de")])
        t1 = update_lang_stats(str(shards), state)
        assert t1.to_pylist() == [
            {"lang": "de", "n_docs": 1, "n_chars": 5, "n_tokens": 3},
            {"lang": "en", "n_docs": 1, "n_chars": 5, "n_tokens": 2},
        ]

        # tick 2: one new shard; only it is folded in
        _write_shard(shards, "b.parquet", [(2, "cc dd ee", "en")])
        t2 = update_lang_stats(str(shards), state)
        en = [r for r in t2.to_pylist() if r["lang"] == "en"][0]
        assert (en["n_docs"], en["n_chars"], en["n_tokens"]) == (2, 13, 5)

        # no new shards → identical view, state untouched
        before = open(_state_path(state)).read()
        t3 = update_lang_stats(str(shards), state)
        assert t3.equals(t2)
        assert open(_state_path(state)).read() == before

        # processed-shard list is the exactly-once record
        st = json.loads(before)
        assert st["shards"] == ["a.parquet", "b.parquet"]

    def test_view_readable_without_scan(self, ray_session, tmp_path):
        shards = tmp_path / "shards"
        shards.mkdir()
        state = str(tmp_path / "state")
        _write_shard(shards, "a.parquet", [(0, "hello world", "en")])
        update_lang_stats(str(shards), state)
        v = read_lang_stats(state)
        assert v.to_pylist() == [
            {"lang": "en", "n_docs": 1, "n_chars": 11, "n_tokens": 2}
        ]

    def test_crash_leftover_tmp_is_ignored_and_no_double_count(
        self, ray_session, tmp_path
    ):
        shards = tmp_path / "shards"
        shards.mkdir()
        state = str(tmp_path / "state")
        _write_shard(shards, "a.parquet", [(0, "aa bb", "en")])
        update_lang_stats(str(shards), state)
        # simulate a crash mid-commit of a later tick: stale tmp on disk
        with open(_state_path(state) + ".tmp", "w") as f:
            f.write('{"shards": ["a.parquet", "b.parquet"], "rows": {"en": [9, 9, 9]}}')
        _write_shard(shards, "b.parquet", [(1, "cc", "en")])
        t = update_lang_stats(str(shards), state)  # reads COMMITTED state only
        en = t.to_pylist()[0]
        assert (en["n_docs"], en["n_chars"], en["n_tokens"]) == (2, 7, 3)
