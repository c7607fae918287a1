"""Workdir IO seam — the shared-storage contract of the checkpoint layout.

Every path under a crawl's ``workdir`` (frontier rounds, results,
seen-set deltas, metrics sidecars, MANIFEST) is touched through these
helpers. A bare local path uses the plain ``os``/``shutil``/``pyarrow``
primitives (no behavior change, no fsspec import); a path with a
protocol (``file://...``, ``s3://...``, ``memory://...``) routes through
fsspec — which is what lets a multi-node cluster keep checkpoint state
on storage every node can reach, and a failed driver resume from any
machine. The north rule's "resumable from checkpoint with per-partition
lineage" only holds on a real cluster if the workdir is NOT a private
local disk; this seam is that guarantee, e2e-tested with a ``file://``
workdir (the one fsspec protocol that is also visible to Ray's worker
processes — ``memory://`` is per-process by design).

Atomic write contract (both modes): payloads land under a dot-prefixed
temp name in the final directory, then rename. Readers glob for the
final names only, so a concurrent reader never sees a torn file.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = [
    "is_url",
    "get_fs",
    "join",
    "basename",
    "makedirs",
    "rmtree",
    "exists",
    "glob",
    "open_file",
    "rename",
    "write_json_atomic",
    "read_json",
    "write_parquet_atomic",
    "parquet_writer",
    "parquet_file",
    "read_parquet_table",
    "parquet_num_rows",
    "pa_filesystem",
]


def is_url(path: str) -> bool:
    return "://" in path


def get_fs(path: str):
    """(fsspec filesystem, bare path) for a protocol path."""
    import fsspec

    fs, p = fsspec.core.url_to_fs(path)
    return fs, p


def _proto_prefix(path: str) -> str:
    return path.split("://", 1)[0] + "://"


def join(base: str, *parts) -> str:
    if is_url(base):
        return "/".join([base.rstrip("/")] + [str(p) for p in parts])
    return os.path.join(base, *(str(p) for p in parts))


def basename(path: str) -> str:
    return path.rstrip("/").rsplit("/", 1)[-1]


def dirname(path: str) -> str:
    if is_url(path):
        return path.rstrip("/").rsplit("/", 1)[0]
    return os.path.dirname(path)


def makedirs(path: str) -> None:
    if is_url(path):
        fs, p = get_fs(path)
        fs.makedirs(p, exist_ok=True)
    else:
        os.makedirs(path, exist_ok=True)


def rmtree(path: str) -> None:
    if is_url(path):
        fs, p = get_fs(path)
        try:
            fs.rm(p, recursive=True)
        except FileNotFoundError:
            pass
    else:
        shutil.rmtree(path, ignore_errors=True)


def exists(path: str) -> bool:
    if is_url(path):
        fs, p = get_fs(path)
        return fs.exists(p)
    return os.path.exists(path)


def glob(pattern: str) -> list[str]:
    """Sorted matches; protocol paths keep their protocol prefix so the
    results round-trip through every other helper here."""
    if is_url(pattern):
        fs, p = get_fs(pattern)
        pref = _proto_prefix(pattern)
        return sorted(pref + m for m in fs.glob(p))
    return sorted(_glob.glob(pattern))


def open_file(path: str, mode: str = "r"):
    if is_url(path):
        fs, p = get_fs(path)
        return fs.open(p, mode)
    return open(path, mode)


def rename(src: str, dst: str) -> None:
    """Same-directory rename (the atomic-publish step)."""
    if is_url(src):
        fs, p_src = get_fs(src)
        _, p_dst = get_fs(dst)
        fs.mv(p_src, p_dst)
    else:
        os.replace(src, dst)


def write_json_atomic(obj, path: str) -> None:
    tmp = join(dirname(path), "." + basename(path) + ".tmp")
    with open_file(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    rename(tmp, path)


def read_json(path: str):
    with open_file(path) as f:
        return json.load(f)


def write_parquet_atomic(tbl: pa.Table, path: str) -> None:
    tmp = join(dirname(path), "." + basename(path) + ".tmp")
    if is_url(tmp):
        fs, p = get_fs(tmp)
        with fs.open(p, "wb") as f:
            pq.write_table(tbl, f)
    else:
        pq.write_table(tbl, tmp)
    rename(tmp, path)


def parquet_writer(path: str, schema: pa.Schema) -> pq.ParquetWriter:
    """Streaming Parquet writer at ``path`` (written in place — callers
    that need atomic publish write a temp name and ``rename``)."""
    if is_url(path):
        fs, p = get_fs(path)
        return pq.ParquetWriter(fs.open(p, "wb"), schema)
    return pq.ParquetWriter(path, schema)


def parquet_file(path: str) -> pq.ParquetFile:
    if is_url(path):
        fs, p = get_fs(path)
        return pq.ParquetFile(fs.open(p, "rb"))
    return pq.ParquetFile(path)


def read_parquet_table(path: str, columns: list[str] | None = None) -> pa.Table:
    if is_url(path):
        fs, p = get_fs(path)
        with fs.open(p, "rb") as f:
            return pq.read_table(f, columns=columns)
    return pq.read_table(path, columns=columns)


def parquet_num_rows(path: str) -> int:
    if is_url(path):
        with parquet_file(path) as pf:
            return pf.metadata.num_rows
    return pq.read_metadata(path).num_rows


def pa_filesystem(path: str):
    """(pyarrow filesystem or None, bare path) — how Ray Data
    ``read_parquet``/``write_parquet`` route through the same fsspec
    instance as everything else. The wrapped filesystem pickles into
    tasks (fsspec filesystems are serializable)."""
    if is_url(path):
        from pyarrow.fs import FSSpecHandler, PyFileSystem

        fs, p = get_fs(path)
        return PyFileSystem(FSSpecHandler(fs)), p
    return None, path
