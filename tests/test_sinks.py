"""Resumable partitioned sink: atomic per-partition commit, resume
skips finished partitions, crash leftovers are redone."""

from __future__ import annotations

import os

import pyarrow as pa

from wbot_ray.sinks import finished_partitions, read_partitioned, write_partitioned


def _ds(n=60):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array([i % 3 for i in range(n)], pa.int64()),
                "v": pa.array(range(n), pa.int64()),
            }
        )
    )


class TestPartitionedSink:
    def test_write_and_read_back(self, tmp_path, ray_session):
        out = str(tmp_path / "out")
        m = write_partitioned(_ds(), out, "k")
        assert m == {"0": 20, "1": 20, "2": 20}
        assert finished_partitions(out) == m
        back = read_partitioned(out)
        assert back.count() == 60
        assert sorted(r["v"] for r in back.take_all()) == list(range(60))

    def test_resume_skips_finished(self, tmp_path, ray_session):
        out = str(tmp_path / "out")
        write_partitioned(_ds(), out, "k")
        # record mtimes, then resume: nothing should be rewritten
        mt = {
            p: os.path.getmtime(os.path.join(out, f"part={p}", "data.parquet"))
            for p in ("0", "1", "2")
        }
        m = write_partitioned(_ds(), out, "k", resume=True)
        assert m == {"0": 20, "1": 20, "2": 20}
        for p, t in mt.items():
            assert os.path.getmtime(os.path.join(out, f"part={p}", "data.parquet")) == t

    def test_crash_leftover_redone(self, tmp_path, ray_session):
        out = str(tmp_path / "out")
        write_partitioned(_ds(), out, "k")
        # simulate a crash: partition 1 lost its marker mid-commit
        os.remove(os.path.join(out, "part=1", "_SUCCESS"))
        m = write_partitioned(_ds(), out, "k", resume=True)
        assert m == {"0": 20, "1": 20, "2": 20}
        assert finished_partitions(out)["1"] == 20
        assert read_partitioned(out, ["1"]).count() == 20
