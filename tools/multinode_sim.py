"""Multi-node execution evidence (round-4 verdict ask #2): run the
bench crawl and the most expensive queries on a SIMULATED 4-node Ray
cluster (``ray.cluster_utils.Cluster``, 4 x 8 CPUs) and verify zero
correctness drift vs the single-node run of the identical job.

What this does and does not prove:

* DOES: the engine's pipelines, actor placement (seen shards, encoder
  pools), shuffles and checkpoint/commit protocol run correctly when
  tasks and actors are spread over multiple Ray nodes with separate
  object stores (inter-node object transfer on every shuffle edge);
  identical visited set / metrics; per-node object-store spill
  recorded.
* DOES NOT: exercise a real network or per-node filesystems — all sim
  nodes share this host's disk. The engine's checkpoint dirs
  (workdir/...) assume SHARED storage (NFS/S3/GCS via fsspec paths) on
  a real cluster; that assumption is documented in BASELINE.md.

Usage:
    python tools/multinode_sim.py            # orchestrates both phases
    python tools/multinode_sim.py --phase single|multi   # internal
Prints one JSON line per phase; the orchestrator prints the combined
record for BASELINE.md.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = "bench"
QUERIES = [
    "q3_shipping",
    "prepare_corpus",
    "order_priority_revenue",
    "embed_docs",
    "bloom_semi_join",
]
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _visited_hash(workdir: str) -> tuple[int, str]:
    import pyarrow.compute as pc  # noqa: F401

    from wbot_ray.driver import CrawlRun

    with open(os.path.join(workdir, "MANIFEST.json")) as f:
        manifest = json.load(f)
    t = CrawlRun(workdir, manifest).visited_table()
    h = hashlib.sha256()
    for col in ("crawl_ord", "url", "depth"):
        h.update(str(t.column(col).to_pylist()).encode())
    return t.num_rows, h.hexdigest()[:16]


def _spill_bytes() -> str:
    """Object-store spill counters from the raylet debug_state dumps
    (the gRPC state API isn't available in this container)."""
    import glob

    lines: list[str] = []
    for f in sorted(
        glob.glob("/tmp/ray/*/session_latest/logs/debug_state.txt")
        + glob.glob("/tmp/ray/session_latest/logs/debug_state.txt")
    ):
        try:
            with open(f, errors="replace") as fh:
                lines.extend(
                    line.strip().lstrip("- ")
                    for line in fh
                    if "cumulative spill requests" in line
                    or "num bytes currently spilled" in line
                )
        except OSError:
            pass
    return "; ".join(lines) if lines else "no spill counters found"


def _run_queries() -> dict[str, float]:
    import time

    import pyarrow as pa
    import ray.data as rd

    import __ray_entry__ as entry

    qs = entry.queries()
    out = {}
    for name in QUERIES:
        t0 = time.perf_counter()
        r = qs[name](SF_DIR)
        if isinstance(r, rd.Dataset):
            n = r.count()
        elif isinstance(r, pa.Table):
            n = r.num_rows
        else:
            n = len(r)
        out[name] = {"sec": round(time.perf_counter() - t0, 2), "rows": int(n)}
    return out


def phase(mode: str) -> dict:
    import ray

    if mode == "multi":
        from ray.cluster_utils import Cluster

        cluster = Cluster(
            initialize_head=True,
            head_node_args={
                "num_cpus": 8,
                "object_store_memory": 2 * 1024**3,
                "include_dashboard": False,
            },
        )
        for _ in range(3):
            cluster.add_node(num_cpus=8, object_store_memory=2 * 1024**3)
        ray.init(address=cluster.address, include_dashboard=False)
        label = "multi4x8"
    else:
        ray.init(address="local", num_cpus=32, include_dashboard=False)
        label = "single32"

    nodes = [
        {"node_id": n["NodeID"][:8], "cpus": n["Resources"].get("CPU", 0)}
        for n in ray.nodes()
        if n["Alive"]
    ]

    import bench as B

    crawl = B.run_crawl_bench(num_cpus=0, scale=SCALE, n_seeds=B.N_SEEDS)
    wd = os.path.join(B._bench_root(SCALE), "run_cpus0")
    n_visited, vhash = _visited_hash(wd)

    queries = _run_queries()
    rec = {
        "phase": label,
        "nodes": nodes,
        "crawl": crawl,
        "visited_rows": n_visited,
        "visited_hash": vhash,
        "queries": queries,
        "spill": _spill_bytes(),
    }
    ray.shutdown()
    if mode == "multi":
        cluster.shutdown()
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["single", "multi"], default=None)
    args = ap.parse_args()
    if args.phase:
        print("PHASE_JSON " + json.dumps(phase(args.phase)))
        return 0

    recs = {}
    for mode in ("single", "multi"):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", mode],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [
            ln for ln in p.stdout.splitlines() if ln.startswith("PHASE_JSON ")
        ]
        if not line:
            print(p.stdout[-3000:])
            print(p.stderr[-3000:])
            raise RuntimeError(f"phase {mode} produced no record (rc={p.returncode})")
        recs[mode] = json.loads(line[-1][len("PHASE_JSON ") :])

    s, m = recs["single"], recs["multi"]
    out = {
        "metric": "multinode_sim",
        "single": s,
        "multi": m,
        "correctness_drift": {
            "visited_hash_match": s["visited_hash"] == m["visited_hash"],
            "visited_rows_match": s["visited_rows"] == m["visited_rows"],
            "metrics_match": {
                k: s["crawl"][k] == m["crawl"][k]
                for k in ("pages", "successful", "links_seen", "rounds")
            },
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
