"""Node-loss fault injection (round-4 verdict ask #4): remove a WHOLE
node — not just one actor — from a simulated 4-node Ray cluster mid-
crawl, with seen-set shards (and scheduled fetch tasks) living on it,
then recover and finish; the final visited set / results / metrics must
be byte-identical to an uninterrupted run of the identical job.

This is the real multi-node story the in-crawl actor-kill test
(tests/test_engine.py::TestFaultInjection) approximates: a raylet dying
takes every actor AND every queued/running task on that node with it,
plus any object-store primaries it held. Recovery exercises, in order:

1. the driver's heal-and-retry envelope (recreate ONLY the dead shards
   from their per-partition delta lineage, re-run the round — survivors
   answer the repeated round from their input-digest-guarded replay
   cache), when the dead shards' committed deltas are durable;
2. failing that (deltas in flight died with the node), the loud
   unflushed-deltas error -> ``crawl(resume=True)`` replays from the
   last committed round with a fresh shard pool on the surviving nodes.

Either path must land on the identical output. The workdir lives on the
shared disk all sim nodes see — the same shared-storage contract the
fsspec workdir seam (wbot_ray/fsio.py) provides on a real cluster.

Usage:
    python tools/nodeloss_sim.py            # orchestrates both phases
    python tools/nodeloss_sim.py --phase ref|loss    # internal
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK_ROOT = "/tmp/wbot_ray_nodeloss"
KILL_ROUND = 2


def _mk_cluster():
    from ray.cluster_utils import Cluster

    cluster = Cluster(
        initialize_head=True,
        head_node_args={
            "num_cpus": 8,
            "object_store_memory": 1024**3,
            "include_dashboard": False,
        },
    )
    workers = [
        cluster.add_node(num_cpus=8, object_store_memory=1024**3) for _ in range(3)
    ]
    return cluster, workers


def _fixture(tag: str) -> tuple[str, list[str]]:
    from wbot_ray.sources.fixtures import seeds_for_scale, write_pages

    os.makedirs(WORK_ROOT, exist_ok=True)
    pages = write_pages(os.path.join(WORK_ROOT, f"pages_{tag}.parquet"), "small")
    return pages, seeds_for_scale("small", 3)


def _cfg(**extra):
    from wbot_ray.config import CrawlConfig

    return CrawlConfig(
        max_depth=4,
        num_buckets=8,
        seen_shards=8,
        # force every round through the distributed pipeline so fetch
        # tasks are genuinely spread over the nodes when one dies
        local_round_threshold=0,
        driver_order_threshold=0,
        **extra,
    )


def _digest(run) -> dict:
    v = run.visited_table()
    r = run.results_table()
    h = hashlib.sha256()
    for col in ("crawl_ord", "url", "depth"):
        h.update(str(v.column(col).to_pylist()).encode())
    rh = hashlib.sha256()
    for col in ("crawl_ord", "url", "text"):
        rh.update(str(r.column(col).to_pylist()).encode())
    return {
        "visited_rows": v.num_rows,
        "visited_hash": h.hexdigest()[:16],
        "results_rows": r.num_rows,
        "results_hash": rh.hexdigest()[:16],
        "metrics": run.metrics_total(),
    }


def _shard_nodes() -> dict[str, int]:
    """node_id -> live _SeenShard actor count (GCS actor table — the
    dashboard state API is unavailable in this container)."""
    import ray._private.state as st

    out: dict[str, int] = {}
    for info in st.actors().values():
        if info.get("ActorClassName") == "_SeenShard" and info.get("State") == "ALIVE":
            nid = info.get("Address", {}).get("NodeID", "")
            out[nid] = out.get(nid, 0) + 1
    return out



def _await_node_dead(node_id: str, timeout: float = 60.0) -> None:
    """Block until GCS marks ``node_id`` dead. remove_node is abrupt;
    without this, recovery paths can schedule fresh actors onto the
    dying node during the heartbeat-miss window — a scheduler race, not
    the fault being injected."""
    import time

    import ray

    deadline = time.time() + timeout
    while time.time() < deadline:
        if not any(n["NodeID"] == node_id and n["Alive"] for n in ray.nodes()):
            return
        time.sleep(0.5)
    raise RuntimeError(f"node {node_id[:8]} still alive after {timeout}s")


def phase_ref() -> dict:
    import ray

    from wbot_ray.driver import Crawler

    cluster, _ = _mk_cluster()
    ray.init(address=cluster.address, include_dashboard=False)
    pages, seeds = _fixture("ref")
    run = Crawler(_cfg(), workdir=os.path.join(WORK_ROOT, "ref_run")).crawl(
        seeds=seeds, pages_path=pages
    )
    rec = {"phase": "ref", "nodes": 4, **_digest(run)}
    ray.shutdown()
    cluster.shutdown()
    return rec


class _KillNodeAfterFlushSeen:
    """SeenSet subclass factory for the heal phase: after round
    KILL_ROUND's deltas are DURABLE, remove a worker node hosting a
    shard — the crawl must heal the dead shard in-process from its
    per-partition lineage and finish."""

    def __new__(cls, *a, **kw):  # pragma: no cover - thin dispatch
        from wbot_ray.state.seen import SeenSet

        class KillSeen(SeenSet):
            def flush_deltas_async(self, round_id, round_dir):
                futs = super().flush_deltas_async(round_id, round_dir)
                import builtins as _b

                reg = getattr(_b, "_nodeloss_registry", None)
                if reg is None:
                    return futs
                st = reg["state"]
                if round_id == KILL_ROUND and not st["killed"]:
                    import ray as _ray

                    _ray.get(futs)  # deltas durable BEFORE the failure
                    shard_nodes = reg["shard_nodes"]()
                    for w in reg["workers"]:
                        nid = w.node_id
                        if shard_nodes.get(nid):
                            st.update(
                                killed=True,
                                victim=nid[:8],
                                victim_shards=shard_nodes[nid],
                            )
                            reg["cluster"].remove_node(w, allow_graceful=False)
                            _await_node_dead(nid)
                            break
                return futs

        return KillSeen(*a, **kw)


def phase_heal() -> dict:
    import builtins

    import ray

    from wbot_ray.driver import Crawler

    cluster, workers = _mk_cluster()
    ray.init(address=cluster.address, include_dashboard=False)
    pages, seeds = _fixture("heal")
    state = {"killed": False, "victim": None, "victim_shards": 0}
    builtins._nodeloss_registry = {
        "cluster": cluster,
        "workers": workers,
        "state": state,
        "shard_nodes": _shard_nodes,
    }
    wd = os.path.join(WORK_ROOT, "heal_run")
    outcome = None
    try:
        run = Crawler(
            _cfg(store_factory=lambda c: _KillNodeAfterFlushSeen(c.seen_shards)),
            workdir=wd,
        ).crawl(seeds=seeds, pages_path=pages)
        outcome = "healed_in_crawl"
    except Exception as exc:
        outcome = f"resumed_after: {type(exc).__name__}: {str(exc)[:140]}"
        run = Crawler(_cfg(), workdir=wd).crawl(resume=True)
    rec = {
        "phase": "heal",
        "outcome": outcome,
        "killed": state["killed"],
        "victim_node": state["victim"],
        "victim_shards": state["victim_shards"],
        **_digest(run),
    }
    ray.shutdown()
    cluster.shutdown()
    return rec


def phase_loss() -> dict:
    import ray

    from wbot_ray.driver import Crawler

    cluster, workers = _mk_cluster()
    ray.init(address=cluster.address, include_dashboard=False)
    pages, seeds = _fixture("loss")

    # the monitor factory rides inside CrawlConfig, which is pickled
    # into every fetch task — so the hook class must NOT close over the
    # (unserializable) Cluster/Node handles. Driver-only state goes
    # through a builtins registry that exists only in this process;
    # worker-side deserialized copies see None and do nothing (on_round
    # is only ever invoked by the driver anyway).
    import builtins

    state = {"killed": False, "victim": None, "victim_shards": 0}
    builtins._nodeloss_registry = {
        "cluster": cluster,
        "workers": workers,
        "state": state,
        "shard_nodes": _shard_nodes,
    }

    class NodeKiller:
        """Reference-seam monitor (§2.10 metrics_factory) doubling as
        the chaos hook: after round KILL_ROUND commits its counters,
        abruptly remove a WORKER node that hosts seen shards."""

        def on_round(self, round_id, counters):
            import builtins as _b

            reg = getattr(_b, "_nodeloss_registry", None)
            if reg is None:
                return
            st = reg["state"]
            if round_id == KILL_ROUND and not st["killed"]:
                shard_nodes = reg["shard_nodes"]()
                for w in reg["workers"]:
                    nid = w.node_id
                    if shard_nodes.get(nid):
                        st.update(
                            killed=True,
                            victim=nid[:8],
                            victim_shards=shard_nodes[nid],
                        )
                        reg["cluster"].remove_node(w, allow_graceful=False)
                        _await_node_dead(nid)
                        return

        def metrics(self):
            return {}

    wd = os.path.join(WORK_ROOT, "loss_run")
    outcome = None
    try:
        run = Crawler(
            _cfg(metrics_factory=NodeKiller), workdir=wd
        ).crawl(seeds=seeds, pages_path=pages)
        outcome = "healed_in_crawl"
    except Exception as exc:  # unflushed-delta path -> resume
        outcome = f"resumed_after: {type(exc).__name__}: {str(exc)[:140]}"
        run = Crawler(_cfg(), workdir=wd).crawl(resume=True)
    rec = {
        "phase": "loss",
        "outcome": outcome,
        "killed": state["killed"],
        "victim_node": state["victim"],
        "victim_shards": state["victim_shards"],
        "nodes_left": sum(1 for n in ray.nodes() if n["Alive"]),
        **_digest(run),
    }
    ray.shutdown()
    cluster.shutdown()
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["ref", "loss", "heal"], default=None)
    args = ap.parse_args()
    if args.phase:
        rec = {"ref": phase_ref, "loss": phase_loss, "heal": phase_heal}[args.phase]()
        print("PHASE_JSON " + json.dumps(rec))
        return 0

    recs = {}
    for mode in ("ref", "loss", "heal"):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", mode],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("PHASE_JSON ")]
        if not line:
            print(p.stdout[-3000:])
            print(p.stderr[-3000:])
            raise RuntimeError(f"phase {mode} produced no record (rc={p.returncode})")
        recs[mode] = json.loads(line[-1][len("PHASE_JSON ") :])

    ref = recs["ref"]
    keys = ("visited_rows", "visited_hash", "results_rows", "results_hash", "metrics")
    out = {
        "metric": "nodeloss_sim",
        "ref": ref,
        "loss": recs["loss"],
        "heal": recs["heal"],
        "fault_fired": {m: recs[m]["killed"] for m in ("loss", "heal")},
        "identical": {
            m: {k: ref[k] == recs[m][k] for k in keys} for m in ("loss", "heal")
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
