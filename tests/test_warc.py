"""WARC-lite connector: byte-exact roundtrip of the pages table through
the record-stream format, shard determinism, and malformed input."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wbot_ray.sources.warc import _decode_file, read_warcish, write_warcish


def _canon(t: pa.Table) -> pa.Table:
    return t.sort_by("url").combine_chunks()


class TestWarcRoundtrip:
    def test_pages_roundtrip_byte_exact(self, ray_session, tmp_path):
        import ray.data

        from wbot_ray.sources.fixtures import write_pages

        pages_path = write_pages(str(tmp_path / "pages.parquet"), "tiny")
        orig = pq.read_table(pages_path)
        out = str(tmp_path / "warcs")
        manifest = write_warcish(
            ray.data.read_parquet(pages_path), out
        ).take_all()
        assert sum(r["n_records"] for r in manifest) == orig.num_rows
        assert all(os.path.exists(os.path.join(out, r["shard"])) for r in manifest)

        back = pa.Table.from_pylist(
            read_warcish(out).take_all(),
            schema=orig.schema,
        )
        a, b = _canon(orig), _canon(back)
        assert a.equals(b)  # byte-exact: html binary, text, ts, lang, url

    def test_shard_names_deterministic(self, ray_session, tmp_path):
        import ray.data

        from wbot_ray.sources.fixtures import write_pages

        pages_path = write_pages(str(tmp_path / "pages.parquet"), "tiny")
        d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w2")
        m1 = sorted(
            r["shard"] for r in write_warcish(ray.data.read_parquet(pages_path), d1).take_all()
        )
        m2 = sorted(
            r["shard"] for r in write_warcish(ray.data.read_parquet(pages_path), d2).take_all()
        )
        assert m1 == m2  # content-keyed names: re-runs overwrite, never duplicate

    def test_binary_payload_safe(self):
        # html containing the record magic, newlines and NULs must survive
        from wbot_ray.sources.warc import _encode_batch

        evil = b"WARC-Lite/1.0\n\x00\nurl: fake\n\n\n"
        t = pa.table(
            {
                "url": pa.array(["https://a.com/x"], pa.string()),
                "warc_ts": pa.array([1234567], pa.int64()).cast(pa.timestamp("us")),
                "html": pa.array([evil], pa.binary()),
                "text": pa.array(["päge \n text"], pa.string()),
                "lang": pa.array(["en"], pa.string()),
            }
        )
        back = _decode_file(_encode_batch(t))
        assert back.column("html").to_pylist() == [evil]
        assert back.column("text").to_pylist() == ["päge \n text"]

    def test_bad_magic_raises(self):
        with pytest.raises(ValueError, match="magic"):
            _decode_file(b"NOT-A-WARC\n")
