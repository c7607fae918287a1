"""Seen-set stress bench: drive >=10^8 synthetic candidate hashes
through the REAL sharded cuckoo/bloom seen-set actors and measure
check-and-set throughput + per-shard memory — evidence for the
10^10-URL-frontier claim beyond extrapolation (the crawl gate corpora
only dedup a few hundred k candidates).

Protocol per round (matches the crawl's dedup stage exactly: ONE
ordered ``check_and_set`` call per shard per round, actor-written
delta flush): a feed task deterministically generates the round's
candidate digests (keys drawn from a bounded universe, so the stream
has a realistic duplicate rate), partitions them by ``shard_of``, calls
every shard, then flushes the round's deltas to Parquet (the
checkpoint path) and deletes them. Feed tasks overlap like crawl
rounds overlap flushes.

Usage:
    python tools/seen_stress.py [--total 100000000] [--rounds 25]
        [--shards 16] [--universe 150000000] [--filter cuckoo]
Prints one JSON line; record the table in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wbot_ray.state.seen import SeenSet  # noqa: E402

MIX1 = np.uint64(0x9E3779B97F4A7C15)
MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)
MIX3 = np.uint64(0x165667B19E3779F9)


def _gen_hashes(round_id: int, n: int, universe: int, num_shards: int) -> dict[int, bytes]:
    """Deterministic candidate digests for one round, partitioned by
    shard as PACKED 32-byte-record buffers (the at-scale check_and_set
    calling convention — one bytes object per shard, no per-candidate
    Python strings). Keys ~ Uniform[0, universe) -> realistic duplicate
    rate both within and across rounds; digest is an invertible 32-byte
    expansion of the key (same key == same digest, distinct keys
    differ)."""
    rng = np.random.default_rng(0xBEEF + round_id)
    keys = rng.integers(0, universe, size=n, dtype=np.uint64)
    dig = np.empty((n, 4), dtype=np.uint64)
    dig[:, 0] = keys * MIX1 + np.uint64(1)  # mixed word first: uniform shard prefix
    dig[:, 1] = keys
    dig[:, 2] = keys ^ MIX2
    dig[:, 3] = keys * MIX3
    # shard_of(h) = int(h[:8], 16) % S over the hex form; the first 8 hex
    # chars spell the digest's first 4 bytes big-endian = byteswap of
    # dig[:,0]'s low 32 bits (little-endian tobytes) — vectorized
    prefix = (dig[:, 0] & np.uint64(0xFFFFFFFF)).astype(np.uint32).byteswap()
    shard = prefix % np.uint32(num_shards)
    order = np.argsort(shard, kind="stable")
    bounds = np.searchsorted(shard[order], np.arange(num_shards + 1))
    out: dict[int, bytes] = {}
    for s in range(num_shards):
        idx = order[bounds[s] : bounds[s + 1]]
        out[s] = dig[idx].tobytes()
    return out


@ray.remote
def feed_round(shards, round_id: int, n: int, universe: int, flush_dir: str) -> dict:
    """One crawl round's worth of dedup traffic."""
    t0 = time.perf_counter()
    parts = _gen_hashes(round_id, n, universe, len(shards))
    t_gen = time.perf_counter() - t0
    t0 = time.perf_counter()
    masks = ray.get(
        [sh.check_and_set.remote(round_id, parts[s]) for s, sh in enumerate(shards)]
    )
    t_probe = time.perf_counter() - t0
    n_new = int(sum(m.sum() for m in masks))
    rd = os.path.join(flush_dir, f"round={round_id}")
    t0 = time.perf_counter()
    ray.get(
        [
            sh.flush_delta.remote(round_id, os.path.join(rd, f"shard={s}.parquet"))
            for s, sh in enumerate(shards)
        ]
    )
    t_flush = time.perf_counter() - t0
    shutil.rmtree(rd, ignore_errors=True)  # checkpoint path exercised; space reclaimed
    return {"round": round_id, "n": n, "n_new": n_new,
            "gen_s": round(t_gen, 2), "probe_s": round(t_probe, 2),
            "flush_s": round(t_flush, 2)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--total", type=int, default=100_000_000)
    ap.add_argument("--rounds", type=int, default=25)
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--universe", type=int, default=150_000_000)
    ap.add_argument("--filter", type=str, default="cuckoo", choices=["cuckoo", "bloom"])
    ap.add_argument("--inflight", type=int, default=4)
    ap.add_argument("--capacity-hint", type=int, default=1 << 20)
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )
    flush_dir = "/tmp/wbot_seen_stress"
    shutil.rmtree(flush_dir, ignore_errors=True)
    seen = SeenSet(args.shards, capacity_hint=args.capacity_hint, filter_kind=args.filter)
    per_round = args.total // args.rounds

    t_start = time.perf_counter()
    pending, results = [], []
    for r in range(args.rounds):
        pending.append(
            feed_round.remote(seen.shards, r, per_round, args.universe, flush_dir)
        )
        # bound in-flight feed tasks (memory) like the crawl bounds rounds
        while len(pending) >= args.inflight:
            done, pending = ray.wait(pending, num_returns=1)
            results.extend(ray.get(done))
    results.extend(ray.get(pending))
    wall = time.perf_counter() - t_start

    mem = seen.memory_stats()
    total = per_round * args.rounds
    unique = seen.total_size()
    out = {
        "metric": "seen_set_stress",
        "candidates": total,
        "unique_inserted": unique,
        "dup_rate": round(1 - unique / total, 3),
        "wall_sec": round(wall, 1),
        "candidates_per_sec": int(total / wall),
        "per_shard_candidates_per_sec": int(total / wall / args.shards),
        "shards": args.shards,
        "filter": args.filter,
        "rounds": args.rounds,
        "probe_sec_per_round_mean": round(
            float(np.mean([r["probe_s"] for r in results])), 2
        ),
        "rss_mb_per_shard_max": max(m["rss_mb"] for m in mem),
        "rss_now_mb_per_shard_max": max(m["rss_now_mb"] for m in mem),
        "exact_entries_per_shard_max": max(m["n_exact"] for m in mem),
        "filter_capacity_per_shard": max(m["filter_capacity"] for m in mem),
        # peak (ru_maxrss, the r3-comparable number) and steady-state
        # (current RSS after the last round's trim) per unique entry,
        # plus the pure data-structure footprint
        "bytes_per_entry_rss": round(
            sum(m["rss_mb"] for m in mem) * 1048576 / max(unique, 1), 1
        ),
        "bytes_per_entry_rss_steady": round(
            sum(m["rss_now_mb"] for m in mem) * 1048576 / max(unique, 1), 1
        ),
        "bytes_per_entry_pss_steady": round(
            sum(m["pss_now_mb"] or m["rss_now_mb"] for m in mem) * 1048576 / max(unique, 1), 1
        ),
        "bytes_per_entry_structure": round(
            sum(m["store_bytes"] for m in mem) / max(unique, 1), 1
        ),
    }
    seen.shutdown()
    shutil.rmtree(flush_dir, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
