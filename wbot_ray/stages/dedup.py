"""Candidate dedup — within-round first-wins + cross-round seen-set.

``candidates.groupby("seen_shard").map_groups(dedup_fn)``: one task per
seen-set shard per round. Inside a task everything is vectorized and
Arrow-native (no pandas round-trip):

1. within-round first-wins = ``sort_by(ord64)`` + a numpy
   first-occurrence mask over dictionary-encoded ``url_hash`` — exactly
   the reference's check-and-set order over the FIFO discovery sequence
   (``/root/reference/pkg/services/store/in_memory.go:22-33`` at
   ``crawler.go:268-274``),
2. cross-round membership = ONE ordered ``check_and_set(round_id, ...)``
   call to the shard's actor (``wbot_ray.state.seen``). Exactly one call
   per shard per round ⇒ deterministic first-wins regardless of Ray
   scheduling; the actor replays its recorded mask if a task retry
   repeats the round's call, so retries can't corrupt the visited set.

Duplicates are *dropped* here; the driver recovers the duplicated-link
metric as ``candidates − survivors`` from round counts (no per-row metric
plumbing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

__all__ = ["make_dedup_fn"]


def make_dedup_fn(shard_handles: list, round_id: int, stats_dir: str | None = None):
    """``stats_dir``: when set, each shard task also writes a sidecar
    JSON of its survivors' per-root counts — the next round's hot-host
    (skew) detection piggybacks on this instead of re-scanning the
    frontier (atomic tmp+rename; deterministic content, retry-safe)."""

    def dedup(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            if "seen_shard" in group.column_names:
                group = group.drop_columns(["seen_shard"])
            return group
        tbl = group.combine_chunks().sort_by("ord64")
        # within-round first-wins: keep the first (lowest-ord64) row of
        # every url_hash — dictionary codes + np.unique, no pandas
        codes = pc.dictionary_encode(tbl.column("url_hash")).combine_chunks().indices.to_numpy()
        if len(np.unique(codes)) != len(codes):
            keep = np.zeros(len(codes), dtype=bool)
            keep[np.unique(codes, return_index=True)[1]] = True
            tbl = tbl.filter(pa.array(keep))
        shard = tbl.column("seen_shard")[0].as_py()
        # packed digest batch: ONE bytes buffer to the actor, not a list
        # of per-row Python hex strings (which dominated shard peak RSS)
        import binascii

        packed = binascii.unhexlify("".join(tbl.column("url_hash").to_pylist()))
        mask = ray.get(shard_handles[shard].check_and_set.remote(round_id, packed))
        if not mask.all():
            tbl = tbl.filter(pa.array(mask))
        if stats_dir is not None:
            from wbot_ray import fsio

            vc = pc.value_counts(tbl.column("root"))
            counts = {
                str(v): int(c)
                for v, c in zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist())
            }
            fsio.write_json_atomic(
                counts, fsio.join(stats_dir, f"rootstats-{shard:03d}.json")
            )
        return tbl.drop_columns(["seen_shard"])

    return dedup
