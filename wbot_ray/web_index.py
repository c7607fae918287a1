"""Bucketed web index — the simulated internet as a random-access store.

"Fetching" a URL in this sandbox means looking it up in the Parquet pages
corpus (``url, warc_ts, html, text, lang`` — the `input_hint` schema). At
100 TB the wrong design is a full-corpus join per crawl round; the right
design is an *index lookup join*: the corpus is laid out once as
hive-partitioned Parquet, ``bucket = crc32(registrable_domain(url)) % B``
(falling back to the raw host when the domain doesn't validate), and each
fetch task reads ONLY its bucket's files, with an Arrow ``url IN (...)``
filter for row-group pruning.

Partitioning by registrable domain (not plain url hash) is deliberate: it
is the same key the frontier is grouped by for fetching, so one fetch task
owns *all* pages of its roots — politeness state per root never crosses
tasks (SURVEY §2.4 T1), mirroring the reference's per-root token buckets
(``/root/reference/limiter.go:16-59``) without any cross-actor
coordination. Hot roots are salt-split at the frontier side only
(``wbot_ray.stages.fetch``); the index layout never changes.

``text`` is intentionally *dropped* from the index: the engine must
re-extract text from ``html`` itself (the byte-identity invariant is
checked against the original corpus, never copied from it).
"""

from __future__ import annotations

import os
import zlib

import pyarrow as pa
import ray.data

from wbot_ray.urlnorm import URLError, registrable_domain

__all__ = ["bucket_of_root", "root_of_url_host", "build_web_index"]


def bucket_of_root(root: str, num_buckets: int) -> int:
    """Deterministic bucket of a registrable domain (crc32 — stable across
    processes, unlike builtin ``hash``)."""
    return zlib.crc32(root.encode("utf-8")) % num_buckets


def root_of_url_host(url: str) -> str:
    """Registrable domain of a url string, falling back to its raw host
    (corpus urls are expected valid; the fallback keeps index builds total)."""
    host = url.split("://", 1)[-1].split("/", 1)[0]
    try:
        return registrable_domain(host)
    except URLError:
        return host.lower()


def build_web_index(
    pages_path: str, index_dir: str, num_buckets: int
) -> str:
    """Lay the pages corpus out as ``index_dir/bucket=<b>/*.parquet``.

    One streaming pass: read (column-pruned: no ``text``), add the bucket
    column per batch, write hive-partitioned. Scales to any corpus size —
    nothing is materialized.
    """
    if os.path.exists(os.path.join(index_dir, "_DONE")):
        return index_dir
    ds = ray.data.read_parquet(pages_path, columns=["url", "warc_ts", "html", "lang"])

    B = num_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = [
            bucket_of_root(root_of_url_host(u), B)
            for u in batch.column("url").to_pylist()
        ]
        return batch.append_column("bucket", pa.array(buckets, pa.int32()))

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    ds.write_parquet(index_dir, partition_cols=["bucket"])
    with open(os.path.join(index_dir, "_DONE"), "w") as f:
        f.write("ok")
    return index_dir
