"""Candidate explosion — results' nested ``next`` column → flat candidate rows.

Reads back the round's results Parquet with column pruning (``next`` +
parent metadata only — the wide ``text`` column never moves), then
vectorized Arrow kernels (``list_flatten`` / ``list_parent_indices``) turn
one row per page into one row per accepted candidate link.

Output ordering key: ``ord64 = parent_ord * 2^20 + link_idx`` — the
lexicographic (parent pop order, document link order) rank that replicates
the reference's FIFO enqueue order (``/root/reference/crawler.go:276-285``
+ ``queue.go:29-36``). 2^20 link slots per page bounds pages at ~1M
extracted links (far beyond any real page); parent ords stay < 2^43.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from wbot_ray.config import CrawlConfig
from wbot_ray.state.seen import shard_of

__all__ = ["make_explode_fn", "CANDIDATE_COLUMNS", "CANDIDATE_SCHEMA", "ORD_LINK_BITS"]

ORD_LINK_BITS = 20

# columns the explode stage needs from the results parquet (pruned read)
CANDIDATE_COLUMNS = [
    "crawl_ord", "depth", "user_agent", "proxy", "referer",
    "max_body_size", "timeout_ms", "next",
]

CANDIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.string()),
        ("host", pa.string()),
        ("root", pa.string()),
        ("depth", pa.int32()),
        ("parent_ord", pa.int64()),
        ("link_idx", pa.int32()),
        ("ord64", pa.int64()),
        ("seen_shard", pa.int32()),
        ("user_agent", pa.string()),
        ("proxy", pa.string()),
        ("referer", pa.string()),
        ("max_body_size", pa.int64()),
        ("timeout_ms", pa.int64()),
    ]
)


def make_explode_fn(cfg: CrawlConfig):
    num_shards = cfg.seen_shards

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # empty input must keep the TYPED schema — struct_field over an
            # empty column degrades to null-typed arrays, whose tables
            # cannot concat with real candidate blocks
            return CANDIDATE_SCHEMA.empty_table()
        nxt = batch.column("next")
        if isinstance(nxt, pa.ChunkedArray):
            nxt = nxt.combine_chunks()
        flat = pc.list_flatten(nxt)
        if len(flat) == 0:
            return CANDIDATE_SCHEMA.empty_table()
        parent_idx = pc.list_parent_indices(nxt)

        parent_ord = pc.take(batch.column("crawl_ord"), parent_idx)
        parent_depth = pc.take(batch.column("depth"), parent_idx)
        ua = pc.take(batch.column("user_agent"), parent_idx)
        proxy = pc.take(batch.column("proxy"), parent_idx)
        referer = pc.take(batch.column("referer"), parent_idx)
        # children inherit the parent's Param verbatim (crawler.go:276-280)
        mbs = pc.take(batch.column("max_body_size"), parent_idx)
        tmo = pc.take(batch.column("timeout_ms"), parent_idx)

        link_idx = pc.cast(pc.struct_field(flat, "link_idx"), pa.int64())
        ord64 = pc.add(
            pc.shift_left(pc.cast(parent_ord, pa.int64()), ORD_LINK_BITS), link_idx
        )
        hashes = pc.struct_field(flat, "hash")
        shards = pa.array(
            [shard_of(h, num_shards) for h in hashes.to_pylist()], pa.int32()
        )
        return pa.table(
            {
                "url": pc.struct_field(flat, "url"),
                "url_hash": hashes,
                "host": pc.struct_field(flat, "host"),
                "root": pc.struct_field(flat, "root"),
                "depth": pc.cast(pc.add(parent_depth, 1), pa.int32()),
                "parent_ord": parent_ord,
                "link_idx": pc.cast(link_idx, pa.int32()),
                "ord64": ord64,
                "seen_shard": shards,
                "user_agent": ua,
                "proxy": proxy,
                "referer": referer,
                "max_body_size": mbs,
                "timeout_ms": tmo,
            },
            schema=CANDIDATE_SCHEMA,
        )

    return explode
