"""Bucketed web index — the simulated internet as a random-access store.

"Fetching" a URL in this sandbox means looking it up in the Parquet pages
corpus (``url, warc_ts, html, text, lang`` — the `input_hint` schema). At
100 TB the wrong design is a full-corpus join per crawl round; the right
design is an *index lookup join*: the corpus is laid out once under
``bucket = crc32(registrable_domain(url)) % B`` (falling back to the raw
host when the domain doesn't validate), and each fetch task reads ONLY
the bytes of the pages it fetches.

Bucket layout (format v3 — the WARC+CDX shape real crawl archives use
for random access):

    bucket=<b>/payload.bin     per-record zlib-compressed html, in
                               url-sorted order (a "WARC" of members)
    bucket=<b>/meta.parquet    url-sorted (url, warc_ts, lang, off, len)
                               — the "CDX": byte offsets into payload.bin
    bucket=<b>/urlhash64.npy   sorted 64-bit url hashes (miss filter)

A point lookup is: probe the hash filter (misses cost a binary search),
binary-search the meta urls, then ONE coalesced range read per run of
wanted records — exactly the wanted bytes, decompressed per record. The
v2 layout (url-sorted Parquet with 64-row row groups) paid a ~64x read
amplification on scattered lookups: every hit decoded its whole row
group, and at bench4x density each crawl round effectively decoded the
entire index (measured: ``read_row_groups`` was 48% of fused-fetch CPU).
At 100 TB the meta sidecar is ~0.2% of payload bytes; size
``num_buckets`` so a bucket's meta fits a worker heap (the payload never
loads whole). On object storage the range read maps 1:1 to a ranged GET.

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


INDEX_ROW_GROUP = 8192  # meta.parquet row-group size (tiny rows)
INDEX_FORMAT = 3  # bump when the on-disk bucket layout changes
_PAYLOAD_GAP = 1 << 17  # coalesce range reads across gaps up to 128 KiB


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


def _write_bucket_files(dir_: str, sub: pa.Table) -> None:
    """Write one bucket's (url-sorted) rows as payload.bin + meta.parquet
    + urlhash64.npy (format v3). ``sub`` columns: url, warc_ts, html,
    lang. Per-record zlib (level 1 — build-once cost, decompress is what
    the crawl pays) so a lookup decompresses exactly the wanted records;
    atomic tmp+rename per file, meta LAST so a reader that sees meta can
    trust the payload bytes it points into."""
    import pyarrow.parquet as pq

    os.makedirs(dir_, exist_ok=True)
    urls = sub.column("url").to_pylist()
    html_type = sub.schema.field("html").type
    html_is_str = pa.types.is_string(html_type) or pa.types.is_large_string(html_type)
    offs: list[int] = []
    lens: list[int] = []
    tmp_payload = os.path.join(dir_, ".payload.tmp")
    pos = 0
    with open(tmp_payload, "wb") as f:
        for s in sub.column("html").to_pylist():
            blob = zlib.compress(s.encode("utf-8") if html_is_str else s, 1)
            f.write(blob)
            offs.append(pos)
            lens.append(len(blob))
            pos += len(blob)
    os.replace(tmp_payload, os.path.join(dir_, "payload.bin"))
    _write_bucket_urlfilter(dir_, urls)
    meta = pa.table(
        {
            "url": sub.column("url"),
            "warc_ts": sub.column("warc_ts"),
            "lang": sub.column("lang"),
            "off": pa.array(offs, pa.int64()),
            "len": pa.array(lens, pa.int32()),
        }
    )
    # the payload's logical type (binary per the input_hint schema, but
    # string corpora round-trip too) rides in the meta schema metadata
    meta = meta.replace_schema_metadata(
        {"html_type": "string" if html_is_str else "binary"}
    )
    tmp_meta = os.path.join(dir_, ".meta.tmp")
    pq.write_table(meta, tmp_meta, row_group_size=INDEX_ROW_GROUP)
    os.replace(tmp_meta, os.path.join(dir_, "meta.parquet"))


def build_web_index(
    pages_path: str, index_dir: str, num_buckets: int
) -> str:
    """Lay the pages corpus out as v3 buckets (payload blob + CDX meta —
    see module docstring), each bucket SORTED BY URL.

    One shuffle (groupby bucket), then each bucket task sorts its slice
    and writes its files. A fetch becomes an offset-indexed range read:
    a round that needs 3 urls from a 200 MB bucket reads ~3 records'
    bytes, not the bucket (``lookup_pages``). Nothing is materialized
    driver-side — scales to any corpus size.
    """
    if os.path.exists(os.path.join(index_dir, f"_DONE-v{INDEX_FORMAT}")):
        return index_dir
    if os.path.isdir(index_dir):
        # an index in an older format (or a half-built one): rebuild from
        # scratch so stale layout files can't shadow the new ones
        import shutil as _shutil

        _shutil.rmtree(index_dir, ignore_errors=True)
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
        if group.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int32()), "rows": pa.array([], pa.int64())})
        b = int(group.column("bucket")[0].as_py())
        sub = group.sort_by("url").drop_columns(["bucket"])
        _write_bucket_files(os.path.join(index_dir, f"bucket={b}"), sub)
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
        _write_bucket_files(os.path.join(index_dir, f"bucket={b}"), tbl)

    ray.get([build_bucket.remote(b, srcs) for b, srcs in sorted(by_bucket.items())])
    with open(os.path.join(index_dir, f"_DONE-v{INDEX_FORMAT}"), "w") as f:
        f.write("ok")
    return index_dir


_META_CACHE: "dict[str, tuple[tuple[int, int], dict]]" = {}
_META_CACHE_MAX = 64  # buckets; meta is ~100 B/url, so ~64 MB at 10^7 urls/bkt


def _bucket_meta(bucket_dir: str) -> "dict | None":
    """Per-process cache of a bucket's CDX: url list (sorted), off/len
    arrays, metadata columns. Fetch tasks hit the same bucket across
    rounds within a worker process — the meta read amortizes to once.
    Keyed by (mtime_ns, size) so an index rebuild invalidates."""
    import pyarrow.parquet as pq

    path = os.path.join(bucket_dir, "meta.parquet")
    try:
        st = os.stat(path)
    except OSError:
        return None
    key = (st.st_mtime_ns, st.st_size)
    hit = _META_CACHE.get(bucket_dir)
    if hit is not None and hit[0] == key:
        return hit[1]
    # use_threads=False: the LOOKUP is already the unit of parallelism
    # (one fetch task per partition) — the global Arrow pool would
    # oversubscribe the node as tasks x cores threads
    t = pq.read_table(path, use_threads=False)
    md = t.schema.metadata or {}
    meta = {
        "urls": t.column("url").to_pylist(),  # sorted; bisect-probed
        "warc_ts": t.column("warc_ts"),
        "lang": t.column("lang"),
        "off": t.column("off").to_numpy(),
        "len": t.column("len").to_numpy(),
        "html_str": md.get(b"html_type") == b"string",
    }
    if len(_META_CACHE) >= _META_CACHE_MAX:
        _META_CACHE.pop(next(iter(_META_CACHE)))
    _META_CACHE[bucket_dir] = (key, meta)
    return meta


def lookup_pages(
    bucket_dir: str, urls: list[str], columns: list[str]
) -> "pa.Table | None":
    """Offset-indexed point lookup (format v3): probe the hash filter,
    binary-search the bucket's CDX meta for each wanted url, then read
    the payload blob with COALESCED range reads (gaps under
    ``_PAYLOAD_GAP`` merge into one read) and decompress exactly the
    wanted records. IO is O(wanted bytes), never O(bucket)."""
    import bisect

    meta = _bucket_meta(bucket_dir)
    if meta is None:
        return None
    want = sorted(set(urls))
    # membership pre-filter: urls absent from the bucket (failed
    # requests) cost a binary search, never a payload read — miss-heavy
    # frontier partitions were the measured stragglers. 64-bit hash
    # false positives only cost the bisect below; the exact url match
    # keeps correctness.
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
    mu = meta["urls"]
    rows: list[int] = []
    hits: list[str] = []
    for u in want:
        i = bisect.bisect_left(mu, u)
        if i < len(mu) and mu[i] == u:
            rows.append(i)
            hits.append(u)
    if not rows:
        return None
    out: dict[str, pa.Array] = {}
    take = None
    for c in columns:
        if c == "url":
            out[c] = pa.array(hits, pa.string())
        elif c == "html":
            continue  # payload pass below
        else:
            if take is None:
                take = pa.array(rows, pa.int64())
            out[c] = meta[c].take(take)
    if "html" in columns:
        offs, lens = meta["off"], meta["len"]
        # rows ascend (want and meta share the url sort) → one forward
        # pass over the payload, merging near-adjacent records
        runs: list[list] = []  # [start, end, rows]
        for r in rows:
            o, n = int(offs[r]), int(lens[r])
            if runs and o - runs[-1][1] <= _PAYLOAD_GAP:
                runs[-1][1] = o + n
                runs[-1][2].append(r)
            else:
                runs.append([o, o + n, [r]])
        htmls: list = []
        with open(os.path.join(bucket_dir, "payload.bin"), "rb") as f:
            for start, end, rs in runs:
                f.seek(start)
                buf = f.read(end - start)
                for r in rs:
                    o, n = int(offs[r]) - start, int(lens[r])
                    htmls.append(zlib.decompress(buf[o : o + n]))
        if meta["html_str"]:
            out["html"] = pa.array([b.decode("utf-8") for b in htmls], pa.string())
        else:
            out["html"] = pa.array(htmls, pa.binary())
    return pa.table({c: out[c] for c in columns})
