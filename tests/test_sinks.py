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


class TestCompaction:
    """sinks.plan_compaction / compact_dir: deterministic plan, lossless
    merge, exactly-once resume, stale/changed-input handling."""

    @staticmethod
    def _make_shards(d, n_files=10, rows_per=20):
        import pyarrow.parquet as pq

        os.makedirs(d, exist_ok=True)
        for i in range(n_files):
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array(
                            range(i * rows_per, (i + 1) * rows_per), pa.int64()
                        ),
                        "text": pa.array(
                            [f"doc {i} row {j}" for j in range(rows_per)], pa.string()
                        ),
                    }
                ),
                os.path.join(d, f"shard-{i:03d}.parquet"),
            )

    def test_plan_deterministic_and_bounded(self):
        from wbot_ray.sinks import plan_compaction

        sizes = [(f"f{i:02d}", 10) for i in range(10)]
        g = plan_compaction(sizes, 35)
        assert g == plan_compaction(list(reversed(sizes)), 35)  # order-free
        assert [len(x) for x in g] == [3, 3, 3, 1]
        # oversized single file still gets its own group
        assert plan_compaction([("big", 100), ("tiny", 1)], 35) == [["big"], ["tiny"]]
        # name order preserved inside and across groups
        assert [f for grp in g for f in grp] == sorted(f for f, _ in sizes)

    def test_compact_lossless_and_resume(self, tmp_path, ray_session):
        import pyarrow.parquet as pq

        from wbot_ray.sinks import compact_dir

        ind, outd = str(tmp_path / "in"), str(tmp_path / "out")
        self._make_shards(ind)
        size = os.stat(os.path.join(ind, "shard-000.parquet")).st_size
        s1 = compact_dir(ind, outd, target_bytes=size * 4)
        assert s1["n_input_files"] == 10 and s1["n_rows"] == 200
        assert s1["n_groups"] < 10 and s1["n_written"] == s1["n_groups"]
        parts = sorted(p for p in os.listdir(outd) if p.endswith(".parquet"))
        assert len(parts) == s1["n_groups"]
        got = pa.concat_tables(
            pq.read_table(os.path.join(outd, p)) for p in parts
        ).sort_by("doc_id")
        want = pa.concat_tables(
            pq.read_table(os.path.join(ind, f)) for f in sorted(os.listdir(ind))
        ).sort_by("doc_id")
        assert got.equals(want)  # byte-lossless

        # resume: nothing re-done, outputs untouched
        mtimes = {p: os.stat(os.path.join(outd, p)).st_mtime_ns for p in parts}
        s2 = compact_dir(ind, outd, target_bytes=size * 4)
        assert s2["n_written"] == 0 and s2["n_skipped"] == s1["n_groups"]
        assert s2["n_rows"] == 200
        assert all(os.stat(os.path.join(outd, p)).st_mtime_ns == mtimes[p] for p in parts)

    def test_changed_input_and_crash_leftovers(self, tmp_path, ray_session):
        import pyarrow.parquet as pq

        from wbot_ray.sinks import compact_dir

        ind, outd = str(tmp_path / "in"), str(tmp_path / "out")
        self._make_shards(ind)
        size = os.stat(os.path.join(ind, "shard-000.parquet")).st_size
        s1 = compact_dir(ind, outd, target_bytes=size * 4)

        # crash leftover tmp is removed and the run still succeeds
        stray = os.path.join(outd, "part-00000.parquet.tmp")
        open(stray, "w").write("junk")
        # mtime-only touch: the plan is unchanged, so ONLY the touched
        # file's group rebuilds (fingerprint includes mtime)
        os.utime(os.path.join(ind, "shard-000.parquet"))
        s2 = compact_dir(ind, outd, target_bytes=size * 4)
        assert not os.path.exists(stray)
        assert s2["n_written"] == 1
        assert s2["n_skipped"] == s1["n_groups"] - 1
        assert s2["n_rows"] == 200

        # content rewrite changes sizes -> the plan reflows and the
        # output reflects the new corpus exactly
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0], pa.int64()),
                    "text": pa.array(["rewritten"], pa.string()),
                }
            ),
            os.path.join(ind, "shard-000.parquet"),
        )
        s3 = compact_dir(ind, outd, target_bytes=size * 4)
        assert s3["n_rows"] == 200 - 20 + 1
        parts = sorted(p for p in os.listdir(outd) if p.endswith(".parquet"))
        got = pa.concat_tables(
            pq.read_table(os.path.join(outd, p)) for p in parts
        ).sort_by("doc_id")
        want = pa.concat_tables(
            pq.read_table(os.path.join(ind, f))
            for f in sorted(os.listdir(ind))
            if f.endswith(".parquet")
        ).sort_by("doc_id")
        assert got.equals(want)

    def test_missing_marker_redone(self, tmp_path, ray_session):
        from wbot_ray.sinks import compact_dir

        ind, outd = str(tmp_path / "in"), str(tmp_path / "out")
        self._make_shards(ind)
        size = os.stat(os.path.join(ind, "shard-000.parquet")).st_size
        s1 = compact_dir(ind, outd, target_bytes=size * 4)
        os.unlink(os.path.join(outd, "part-00001.done"))
        s2 = compact_dir(ind, outd, target_bytes=size * 4)
        assert s2["n_written"] == 1 and s2["n_skipped"] == s1["n_groups"] - 1
        assert s2["n_rows"] == 200
