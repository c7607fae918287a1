"""Storage-maintenance query surface — drives ``sinks.compact_dir``
(the small-file compaction pass) at the driver gate.

``compact_corpus`` proves the whole maintenance cycle LOSSLESS end to
end: the documents table is sharded into many small parquet files (the
shape a crawl round / streaming sink / incremental tick leaves behind),
compacted into a handful of target-size files, and the compacted layout
is re-scanned into ``(doc_id, text_md5)`` — which the DuckDB oracle
recomputes from the ORIGINAL table, so any lost / duplicated / mangled
row fails the value gate.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["compact_corpus", "LAST_COMPACT_STATS"]

_CACHE_VERSION = 1

# compaction accounting of the most recent compact_corpus call
LAST_COMPACT_STATS: dict = {}


def _sharded_corpus(sf_dir: str, n_shards: int) -> str:
    """Deterministic small-file fixture: the documents table cut into
    ``n_shards`` row-contiguous parquet shards (cached per source file
    fingerprint — built once, compacted many times)."""
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    fp = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    d = f"/tmp/wbot_ray_compact/v{_CACHE_VERSION}/{fp}/shards{n_shards}"
    if os.path.exists(os.path.join(d, "_DONE")):
        return d
    os.makedirs(d, exist_ok=True)
    t = pq.read_table(src, columns=["doc_id", "text"])
    step = -(-t.num_rows // n_shards)  # ceil
    for i in range(n_shards):
        part = t.slice(i * step, step)
        if part.num_rows == 0:
            break
        tmp = os.path.join(d, f".shard-{i:04d}.tmp")
        pq.write_table(part, tmp)
        os.replace(tmp, os.path.join(d, f"shard-{i:04d}.parquet"))
    with open(os.path.join(d, "_DONE"), "w") as f:
        f.write("ok")
    return d


def compact_corpus(sf_dir: str, n_shards: int = 32, merge_factor: int = 6):
    """Shard → compact → verify-scan. ``target_bytes`` is derived from
    the input total so roughly ``merge_factor`` shards fold into each
    output file regardless of scale; the returned Dataset streams the
    COMPACTED layout only (the original table never enters the result
    path — parity with the oracle is what proves losslessness)."""
    import glob

    import ray.data as rd

    from wbot_ray.sinks import compact_dir

    shards = _sharded_corpus(sf_dir, n_shards)
    sizes = [os.stat(p).st_size for p in glob.glob(os.path.join(shards, "*.parquet"))]
    target = (sum(sizes) // max(len(sizes) // merge_factor, 1)) + 1
    out_dir = os.path.join(os.path.dirname(shards), f"compacted{n_shards}m{merge_factor}")
    stats = compact_dir(shards, out_dir, target_bytes=target)
    LAST_COMPACT_STATS.clear()
    LAST_COMPACT_STATS.update(stats)
    print(
        f"[compact_corpus] {stats['n_input_files']} shards -> "
        f"{stats['n_groups']} files ({stats['n_skipped']} cached), "
        f"{stats['n_rows']} rows"
    )

    def verify(batch: pa.Table) -> pa.Table:
        md5s = [
            hashlib.md5(t.encode()).hexdigest() for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "text_md5": pa.array(md5s, pa.string())}
        )

    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    return rd.read_parquet(files).map_batches(verify, batch_format="pyarrow")
