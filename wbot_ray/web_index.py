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

__all__ = ["bucket_of_root", "root_of_url_host", "build_web_index", "lookup_pages"]


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


INDEX_ROW_GROUP = 64  # rows per row group — the lookup-pruning granule
INDEX_FORMAT = 2  # bump when the on-disk bucket layout changes


def _url_hash64(url: str) -> int:
    """64-bit membership hash for the per-bucket url filter (blake2b-8;
    stable across processes — never builtin ``hash``)."""
    import hashlib
    import struct

    return struct.unpack("<Q", hashlib.blake2b(url.encode(), digest_size=8).digest())[0]


def _write_bucket_urlfilter(dir_: str, urls: list[str]) -> None:
    """Sorted uint64 url-hash sidecar: a fetch task probes it FIRST so a
    missing url (a failed request) costs a binary search, not a row-group
    read+decompress — miss-heavy frontier partitions were the measured
    stragglers (3s vs 0.3s median at bench scale). ~8 B/url."""
    import numpy as np

    arr = np.sort(
        np.fromiter((_url_hash64(u) for u in urls), dtype=np.uint64, count=len(urls))
    )
    tmp = os.path.join(dir_, ".urlhash64.tmp.npy")
    np.save(tmp, arr)
    os.replace(tmp, os.path.join(dir_, "urlhash64.npy"))


def build_web_index(
    pages_path: str, index_dir: str, num_buckets: int
) -> str:
    """Lay the pages corpus out as ``index_dir/bucket=<b>/*.parquet``,
    each bucket SORTED BY URL with small row groups.

    One shuffle (groupby bucket), then each bucket task sorts its slice
    and writes one file. The url-sorted layout + per-row-group min/max
    statistics turn a fetch into a row-group-pruned point lookup: a
    round that needs 3 urls from a 200 MB bucket reads a few hundred
    rows, not the bucket (``lookup_pages``). Nothing is materialized
    driver-side — scales to any corpus size.
    """
    if os.path.exists(os.path.join(index_dir, f"_DONE-v{INDEX_FORMAT}")):
        return index_dir
    if os.path.isdir(pages_path):
        # sharded corpus (e.g. one file per host): a shard's rows mostly
        # map to one bucket, so the index builds WITHOUT the all-to-all
        # shuffle — each bucket task reads just its assigned shard files
        return _build_index_from_shards(pages_path, index_dir, num_buckets)
    ds = ray.data.read_parquet(pages_path, columns=["url", "warc_ts", "html", "lang"])

    B = num_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = [
            bucket_of_root(root_of_url_host(u), B)
            for u in batch.column("url").to_pylist()
        ]
        return batch.append_column("bucket", pa.array(buckets, pa.int32()))

    def write_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        if group.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int32()), "rows": pa.array([], pa.int64())})
        b = int(group.column("bucket")[0].as_py())
        sub = group.sort_by("url").drop_columns(["bucket"])
        d = os.path.join(index_dir, f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, ".part-0.tmp")
        pq.write_table(sub, tmp, row_group_size=INDEX_ROW_GROUP)
        os.replace(tmp, os.path.join(d, "part-0.parquet"))
        _write_bucket_urlfilter(d, sub.column("url").to_pylist())
        return pa.table({"bucket": pa.array([b], pa.int32()), "rows": pa.array([group.num_rows], pa.int64())})

    (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .materialize()
    )
    with open(os.path.join(index_dir, f"_DONE-v{INDEX_FORMAT}"), "w") as f:
        f.write("ok")
    return index_dir


def _build_index_from_shards(pages_dir: str, index_dir: str, num_buckets: int) -> str:
    """Shuffle-free index build for a sharded corpus directory.

    Pass 1 (one Ray task per shard file): read ONLY the url column and
    compute which buckets the shard feeds (a per-host shard feeds exactly
    one; mixed shards feed a few) — the driver handles O(shards) bucket
    lists, never url data. Pass 2 (one Ray task per bucket): read the
    assigned files column-pruned, keep the bucket's rows, sort by url,
    write the bucket file. The corpus' html bytes move exactly once,
    straight into their final sorted location."""
    import glob as _glob

    import pyarrow.parquet as pq
    import ray

    B = num_buckets
    files = sorted(_glob.glob(os.path.join(pages_dir, "*.parquet")))

    @ray.remote
    def buckets_of_shard(f: str) -> list[int]:
        urls = pq.read_table(f, columns=["url"]).column("url").to_pylist()
        return sorted({bucket_of_root(root_of_url_host(u), B) for u in urls})

    by_bucket: dict[int, list[str]] = {}
    for f, bl in zip(files, ray.get([buckets_of_shard.remote(f) for f in files])):
        for b in bl:
            by_bucket.setdefault(b, []).append(f)

    @ray.remote
    def build_bucket(b: int, srcs: list[str]) -> None:
        import pyarrow.compute as _pc

        pieces = []
        for f in srcs:
            t = pq.read_table(f, columns=["url", "warc_ts", "html", "lang"])
            mask = [
                bucket_of_root(root_of_url_host(u), B) == b
                for u in t.column("url").to_pylist()
            ]
            pieces.append(t.filter(pa.array(mask, pa.bool_())))
        tbl = pa.concat_tables(pieces).combine_chunks().sort_by("url")
        d = os.path.join(index_dir, f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, ".part-0.tmp")
        pq.write_table(tbl, tmp, row_group_size=INDEX_ROW_GROUP)
        _write_bucket_urlfilter(d, tbl.column("url").to_pylist())
        os.replace(tmp, os.path.join(d, "part-0.parquet"))

    ray.get([build_bucket.remote(b, srcs) for b, srcs in sorted(by_bucket.items())])
    with open(os.path.join(index_dir, f"_DONE-v{INDEX_FORMAT}"), "w") as f:
        f.write("ok")
    return index_dir


def lookup_pages(
    bucket_dir: str, urls: list[str], columns: list[str]
) -> "pa.Table | None":
    """Row-group-pruned point lookup: select only row groups whose
    [min,max] url range can contain a requested url (files are
    url-sorted), read those, then exact-filter. Explicit pruning via
    parquet metadata — guaranteed, not planner-dependent."""
    import glob as _glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    files = sorted(_glob.glob(os.path.join(bucket_dir, "*.parquet")))
    if not files:
        return None
    want = sorted(set(urls))
    # membership pre-filter: urls absent from the bucket (failed
    # requests) must not trigger row-group reads — miss-heavy frontier
    # partitions were the measured stragglers. 64-bit hash false
    # positives only cost a redundant row-group read; the exact url
    # filter below keeps correctness.
    filt_path = os.path.join(bucket_dir, "urlhash64.npy")
    if os.path.exists(filt_path):
        import numpy as np

        member = np.load(filt_path)
        if len(want) and len(member):
            h = np.fromiter(
                (_url_hash64(u) for u in want), dtype=np.uint64, count=len(want)
            )
            idx = np.searchsorted(member, h)
            idx[idx >= len(member)] = len(member) - 1
            present = member[idx] == h
            want = [u for u, p in zip(want, present) if p]
        else:
            want = []
        if not want:
            return None
    url_set = pa.array(want, pa.string())
    pieces = []
    for f in files:
        pf = pq.ParquetFile(f)
        md = pf.metadata
        url_idx = md.schema.to_arrow_schema().get_field_index("url")
        selected = []
        import bisect

        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(url_idx).statistics
            if stats is None or stats.min is None:
                selected.append(rg)
                continue
            lo, hi = stats.min, stats.max
            # any wanted url within [lo, hi]?
            i = bisect.bisect_left(want, lo)
            if i < len(want) and want[i] <= hi:
                selected.append(rg)
        if not selected:
            continue
        # use_threads=False: the LOOKUP is already the unit of
        # parallelism (one fetch task per partition) — letting every
        # task decompress with the global Arrow pool (defaults to all
        # cores) oversubscribes the node as tasks × cores threads
        t = pf.read_row_groups(selected, columns=columns, use_threads=False)
        pieces.append(t.filter(pc.is_in(t.column("url"), value_set=url_set)))
    if not pieces:
        return None
    return pa.concat_tables(pieces)
