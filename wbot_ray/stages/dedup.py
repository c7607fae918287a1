"""Candidate dedup — within-round first-wins + cross-round seen-set.

``candidates.groupby("seen_shard").map_groups(dedup_fn)``: one task per
seen-set shard per round. Inside a task everything is vectorized:

1. within-round first-wins = sort by ``ord64`` + ``drop_duplicates`` on
   ``url_hash`` (keep first) — exactly the reference's check-and-set order
   over the FIFO discovery sequence
   (``/root/reference/pkg/services/store/in_memory.go:22-33`` at
   ``crawler.go:268-274``),
2. cross-round membership = ONE ordered ``check_and_set`` call to the
   shard's actor (``wbot_ray.state.seen``). Exactly one call per shard per
   round ⇒ deterministic first-wins regardless of Ray scheduling.

Duplicates are *dropped* here; the driver recovers the duplicated-link
metric as ``candidates − survivors`` from round counts (no per-row metric
plumbing).
"""

from __future__ import annotations

import pyarrow as pa
import ray

__all__ = ["make_dedup_fn"]


def make_dedup_fn(shard_handles: list, stats_dir: str | None = None):
    """``stats_dir``: when set, each shard task also writes a sidecar
    JSON of its survivors' per-root counts — the next round's hot-host
    (skew) detection piggybacks on this instead of re-scanning the
    frontier (atomic tmp+rename; deterministic content, retry-safe)."""

    def dedup(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            if "seen_shard" in group.column_names:
                group = group.drop_columns(["seen_shard"])
            return group
        df = group.to_pandas()
        df = df.sort_values("ord64", kind="mergesort").drop_duplicates(
            "url_hash", keep="first"
        )
        shard = int(df["seen_shard"].iloc[0])
        mask = ray.get(
            shard_handles[shard].check_and_set.remote(df["url_hash"].tolist())
        )
        df = df[mask]
        if stats_dir is not None:
            import json
            import os

            counts = df["root"].value_counts().to_dict()
            tmp = os.path.join(stats_dir, f".rootstats-{shard:03d}.tmp")
            with open(tmp, "w") as f:
                json.dump({str(k): int(v) for k, v in counts.items()}, f)
            os.replace(tmp, os.path.join(stats_dir, f"rootstats-{shard:03d}.json"))
        # pin the schema: an empty (all-duplicates) survivor frame would
        # otherwise degrade string columns to null type and break concat
        out_schema = pa.schema([f for f in group.schema if f.name != "seen_shard"])
        return pa.Table.from_pandas(
            df.drop(columns=["seen_shard"]), schema=out_schema, preserve_index=False
        )

    return dedup
