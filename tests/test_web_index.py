"""Web index: build-path equivalence and point-lookup correctness."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wbot_ray.sources.fixtures import gen_pages
from wbot_ray.web_index import build_web_index, lookup_pages


@pytest.mark.usefixtures("ray_session")
class TestIndexBuild:
    def test_file_and_shard_builds_equivalent(self, tmp_path):
        """The shuffle build (single file) and the shuffle-free build
        (sharded dir) must produce identical bucket contents."""
        pages = gen_pages("tiny")
        f = tmp_path / "pages.parquet"
        pq.write_table(pages, str(f))
        d = tmp_path / "pages_dir"
        d.mkdir()
        # shard arbitrarily (4 slices) — shard path must handle mixed-root files
        n = pages.num_rows
        for i in range(4):
            pq.write_table(pages.slice(i * n // 4, (i + 1) * n // 4 - i * n // 4),
                           str(d / f"shard-{i}.parquet"))

        idx_a = str(tmp_path / "idx_file")
        idx_b = str(tmp_path / "idx_dir")
        build_web_index(str(f), idx_a, num_buckets=4)
        build_web_index(str(d), idx_b, num_buckets=4)

        for b in range(4):
            da = os.path.join(idx_a, f"bucket={b}")
            db = os.path.join(idx_b, f"bucket={b}")
            ma = os.path.join(da, "meta.parquet")
            mb = os.path.join(db, "meta.parquet")
            if not os.path.exists(ma) or not os.path.exists(mb):
                assert not os.path.exists(ma) and not os.path.exists(mb)
                continue
            urls_a = pq.read_table(ma, columns=["url"]).column("url").to_pylist()
            urls_b = pq.read_table(mb, columns=["url"]).column("url").to_pylist()
            # both are url-sorted; compare full contents incl. payloads
            assert urls_a == urls_b
            ta = lookup_pages(da, urls_a, ["url", "html", "warc_ts", "lang"])
            tb = lookup_pages(db, urls_b, ["url", "html", "warc_ts", "lang"])
            assert ta.column("url").to_pylist() == tb.column("url").to_pylist()
            assert ta.column("html").to_pylist() == tb.column("html").to_pylist()
            assert ta.column("warc_ts").to_pylist() == tb.column("warc_ts").to_pylist()
            assert ta.column("lang").to_pylist() == tb.column("lang").to_pylist()

    def test_lookup_prunes_and_is_exact(self, tmp_path):
        pages = gen_pages("tiny")
        d = tmp_path / "p.parquet"
        pq.write_table(pages, str(d))
        idx = str(tmp_path / "idx")
        build_web_index(str(d), idx, num_buckets=2)

        urls = pages.column("url").to_pylist()
        want = [urls[0], urls[5], "https://not-in-corpus.com/x"]
        for b in range(2):
            t = lookup_pages(os.path.join(idx, f"bucket={b}"), want, ["url", "html"])
            if t is None:
                continue
            got = set(t.column("url").to_pylist())
            assert got <= set(want)  # exact filter: nothing extra
            assert "https://not-in-corpus.com/x" not in got

    def test_lookup_missing_bucket_dir(self):
        assert lookup_pages("/tmp/definitely/not/here", ["https://x.com/"], ["url"]) is None
