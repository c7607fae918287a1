"""Global BFS rank assignment — dense ``crawl_ord`` over a sorted frontier.

The next round's frontier must carry the exact pop rank the reference's
FIFO queue would produce (SURVEY §2.7): after ``sort("ord64")`` the row
*order* is right, but ranks must become a concrete int64 column (children's
``ord64`` is built from the parent's rank).

Ray Data has no zipWithIndex, so this uses the block-offset pattern: sort →
materialize → read per-block row counts from block *metadata* (no data
fetched) → cumulative offsets → one tiny remote task per block appends
``crawl_ord = base + offset + arange(len(block))``. No row ever moves
through the driver, so the frontier can be arbitrarily large. Falls back to
a driver-side ordered pass if the developer block API is unavailable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

__all__ = ["assign_crawl_ord"]


@ray.remote
def _add_ord(block, offset: int) -> pa.Table:
    if not isinstance(block, pa.Table):
        block = pa.Table.from_pandas(block, preserve_index=False)
    n = block.num_rows
    return block.append_column(
        "crawl_ord", pa.array(np.arange(offset, offset + n), pa.int64())
    )


def assign_crawl_ord(
    sorted_ds: "ray.data.Dataset", base: int
) -> tuple["ray.data.Dataset", int]:
    """Append a dense ``crawl_ord`` column (``base``, ``base+1``, …) to an
    already-sorted dataset. Returns ``(dataset, num_rows)``."""
    mds = sorted_ds.materialize()
    try:
        bundles = list(mds.iter_internal_ref_bundles())
        refs, counts = [], []
        for b in bundles:
            for ref, meta in zip(b.block_refs, b.metadata):
                refs.append(ref)
                counts.append(meta.num_rows)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) if counts else []
        out_refs = [
            _add_ord.remote(ref, int(base + off)) for ref, off in zip(refs, offsets)
        ]
        total = int(sum(counts))
        if not out_refs:
            return mds, 0
        return ray.data.from_arrow_refs(out_refs), total
    except AttributeError:
        # fallback: ordered driver-side pass (small frontiers only)
        tables = []
        off = base
        for batch in mds.iter_batches(batch_size=None, batch_format="pyarrow"):
            n = batch.num_rows
            tables.append(
                batch.append_column("crawl_ord", pa.array(np.arange(off, off + n), pa.int64()))
            )
            off += n
        if not tables:
            return mds, 0
        return ray.data.from_arrow(pa.concat_tables(tables)), off - base
