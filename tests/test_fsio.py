"""Unit tests for the workdir IO seam (wbot_ray/fsio.py).

The e2e contract (crawl + resume on a ``file://`` workdir) lives in
test_engine.py; these pin the helper semantics themselves on a second
fsspec protocol (``memory://`` — in-process, so no Ray involved) and
the local fast path, so a regression in URL routing is caught without
driving a crawl.
"""

from __future__ import annotations

import pyarrow as pa

from wbot_ray import fsio


def _roundtrip(base: str) -> None:
    d = fsio.join(base, "frontier", "round=3")
    fsio.makedirs(d)
    assert fsio.exists(d)

    # atomic json publish + read-back
    fsio.write_json_atomic({"rows": 7}, fsio.join(d, "meta.json"))
    assert fsio.read_json(fsio.join(d, "meta.json")) == {"rows": 7}
    # the temp name must not survive the publish
    leftovers = [p for p in fsio.glob(fsio.join(d, "*.tmp"))]
    assert leftovers == []

    # atomic parquet publish + read-back + metadata probe
    tbl = pa.table({"url": pa.array(["a", "b"]), "depth": pa.array([0, 1])})
    fsio.write_parquet_atomic(tbl, fsio.join(d, "part-0.parquet"))
    assert fsio.parquet_num_rows(fsio.join(d, "part-0.parquet")) == 2
    got = fsio.read_parquet_table(fsio.join(d, "part-0.parquet"))
    assert got.equals(tbl)

    # streaming writer + ParquetFile reader
    w = fsio.parquet_writer(fsio.join(d, "part-1.parquet"), tbl.schema)
    w.write_table(tbl)
    w.close()
    pf = fsio.parquet_file(fsio.join(d, "part-1.parquet"))
    assert pf.metadata.num_rows == 2
    pf.close()

    # glob keeps the caller's path flavor so results round-trip
    files = fsio.glob(fsio.join(base, "frontier", "round=*", "*.parquet"))
    assert len(files) == 2
    for f in files:
        assert fsio.parquet_num_rows(f) == 2
        assert f.startswith(base.split("://", 1)[0]) or "://" not in base

    # rmtree + exists
    fsio.rmtree(fsio.join(base, "frontier"))
    assert not fsio.exists(d)


def test_memory_url_roundtrip():
    _roundtrip("memory://fsio_test_wd")


def test_local_path_roundtrip(tmp_path):
    _roundtrip(str(tmp_path / "wd"))


def test_join_and_names():
    assert fsio.join("memory://a", "b", 3) == "memory://a/b/3"
    assert fsio.basename("memory://a/b/c.json") == "c.json"
    assert fsio.dirname("memory://a/b/c.json") == "memory://a/b"
    assert not fsio.is_url("/tmp/x")
    assert fsio.is_url("s3://bucket/x")
