"""Memory-pressure run (round-4 verdict ask #3): generate a multi-GB
synthetic ``documents`` corpus, cap the object store at ~4 GiB, and run
the three heaviest document pipelines end-to-end —

* ``prepare_corpus``  (filter -> dedup -> join chain),
* ``dedup_minhash`` -> ``dedup_keep`` (sketch + LSH + anti-join),
* ``global_shuffle`` (full all-to-all),

recording object-store spill and that STREAMING execution completes
without OOM when the working set exceeds the store several times over.

The corpus is deterministic (seeded per shard), schema-identical to the
driver's ``documents`` table, with a planted ~3% near-duplicate rate so
the dedup chain does real work.

Usage: python tools/mempressure.py [--gb 4] [--store-gb 4]
Prints one JSON line; record in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/wbot_mempressure"
WORDS = np.array(
    [f"w{i:04d}" for i in range(4096)]
    + "the a and of to in is on hash join merge sort scan".split()
)


def gen_corpus(target_gb: float, n_shards: int = 64) -> str:
    """Sharded parquet documents corpus of ~target_gb (in-memory bytes),
    written shard-by-shard so generation itself stays bounded."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(ROOT, "sfbig")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    doc_bytes = 2048
    n_docs = int(target_gb * (1 << 30) / doc_bytes)
    per_shard = n_docs // n_shards
    langs = np.array(["en", "de", "fr", "es", "zh"])
    sources = np.array(["src0", "src1", "src2", "src3"])
    writer = None
    for s in range(n_shards):
        rng = np.random.default_rng(1000 + s)
        toks = rng.choice(WORDS, size=(per_shard, doc_bytes // 6))
        texts = [" ".join(row) for row in toks]
        # planted near-dups: ~3% of docs copy the previous doc's text
        dup = rng.random(per_shard) < 0.03
        for i in np.nonzero(dup)[0]:
            if i:
                texts[i] = texts[i - 1]
        ids = np.arange(s * per_shard, (s + 1) * per_shard, dtype=np.int64)
        tbl = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs[ids % len(langs)], pa.string()),
                "source": pa.array(sources[ids % len(sources)], pa.string()),
                "n_chars": pa.array(
                    np.fromiter((len(t) for t in texts), np.int64, per_shard),
                    pa.int64(),
                ),
            }
        )
        pq.write_table(tbl, os.path.join(out, f"documents-{s:03d}.parquet"))
    del writer
    # the pipelines read <sf_dir>/documents.parquet — provide the multi-
    # file layout under that name (a directory works for read_parquet)
    os.rename(out, os.path.join(ROOT, "stage"))
    os.makedirs(os.path.join(ROOT, "sfbig"))
    os.rename(os.path.join(ROOT, "stage"), os.path.join(ROOT, "sfbig", "documents.parquet"))
    return os.path.join(ROOT, "sfbig")


def _spill_lines() -> list[str]:
    """Object-store spill counters from the raylet's debug_state dump
    (the gRPC state API isn't available in this container)."""
    import glob

    out: list[str] = []
    for f in sorted(
        glob.glob("/tmp/ray/*/session_latest/logs/debug_state.txt")
        + glob.glob("/tmp/ray/session_latest/logs/debug_state.txt")
    ):
        try:
            with open(f, errors="replace") as fh:
                out.extend(
                    line.strip().lstrip("- ")
                    for line in fh
                    if "cumulative spill requests" in line
                    or "num bytes currently spilled" in line
                    or "Spilled objects" in line
                )
        except OSError:
            pass
    return out or ["no spill counters found"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=4.0)
    ap.add_argument("--store-gb", type=float, default=4.0)
    args = ap.parse_args()

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        object_store_memory=int(args.store_gb * (1 << 30)),
        include_dashboard=False,
    )

    t0 = time.perf_counter()
    sf = gen_corpus(args.gb)
    gen_s = round(time.perf_counter() - t0, 1)

    from wbot_ray.pipelines.dedup import dedup_keep, dedup_minhash
    from wbot_ray.pipelines.training import global_shuffle, prepare_corpus

    runs = {}

    def timed(name, fn):
        t = time.perf_counter()
        n = fn()
        runs[name] = {
            "sec": round(time.perf_counter() - t, 1),
            "rows": int(n),
            "spill_after": _spill_lines(),
        }
        print(f"[mempressure] {name}: {runs[name]}", file=sys.stderr)

    out_dir = os.path.join(ROOT, "out")
    shutil.rmtree(out_dir, ignore_errors=True)

    def _rows_written(d: str) -> int:
        import glob

        import pyarrow.parquet as pq

        return sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(d, "*.parquet"))
        )

    # every consumer is streaming (write_parquet / count) — nothing
    # materializes the corpus driver-side
    timed(
        "prepare_corpus",
        lambda: prepare_corpus(sf).write_parquet(os.path.join(out_dir, "prep"))
        or _rows_written(os.path.join(out_dir, "prep")),
    )
    timed(
        "dedup_minhash_pairs",
        lambda: dedup_minhash(sf, small_verify_threshold=0).count(),
    )
    timed(
        "dedup_keep",
        lambda: dedup_keep(sf).write_parquet(os.path.join(out_dir, "keep"))
        or _rows_written(os.path.join(out_dir, "keep")),
    )
    timed(
        "global_shuffle",
        lambda: global_shuffle(sf).write_parquet(os.path.join(out_dir, "shuf"))
        or _rows_written(os.path.join(out_dir, "shuf")),
    )

    out = {
        "metric": "mempressure",
        "corpus_gb": args.gb,
        "object_store_gb": args.store_gb,
        "gen_sec": gen_s,
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
        "runs": runs,
        "spill_final": _spill_lines(),
        "oom": False,  # reaching this line means streaming completed
    }
    ray.shutdown()
    shutil.rmtree(ROOT, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
