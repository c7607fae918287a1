"""Resumable partitioned Parquet sink — the generic form of the
per-round checkpointing the crawl driver does (``driver.py`` writes
round manifests; this writes per-partition ones).

Contract for 100-TB runs: output is one directory per partition key,
each committed ATOMICALLY (write to a tmp name, fsync-free rename,
then a ``_SUCCESS`` marker carrying the row count). A re-run with
``resume=True`` lists the finished markers FIRST and filters those
partitions out of the pipeline before any work happens — a failed job
re-does only the partitions whose markers are missing, and a partial
(un-renamed / marker-less) directory from a crash is overwritten, so
the output is exactly-once per partition regardless of retries.

Never one giant file: each partition writes its own parquet, so the
sink parallelizes with the partition count and a reader can prune by
partition directory.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = [
    "write_partitioned",
    "finished_partitions",
    "read_partitioned",
    "plan_compaction",
    "compact_dir",
]

_MARKER = "_SUCCESS"


def _part_dir(out_dir: str, value) -> str:
    return os.path.join(out_dir, f"part={value}")


def finished_partitions(out_dir: str) -> dict[str, int]:
    """Partition value (as string) → committed row count, read from the
    ``_SUCCESS`` markers. A directory without a marker is NOT finished
    (crash leftover) and will be redone."""
    done: dict[str, int] = {}
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        marker = os.path.join(out_dir, name, _MARKER)
        if name.startswith("part=") and os.path.exists(marker):
            with open(marker) as f:
                done[name[len("part=") :]] = json.load(f)["n_rows"]
    return done


def write_partitioned(ds, out_dir: str, partition_col: str, resume: bool = True) -> dict:
    """Write ``ds`` as one parquet directory per distinct value of
    ``partition_col``. Returns ``{partition: n_rows}`` for the FULL
    output (committed this run + previously committed).

    Ray shape: ``groupby(partition_col).map_groups`` — one task per
    partition owns its whole directory, writes tmp → rename → marker.
    With ``resume``, already-committed partitions are filtered out of
    the stream up front (the filter runs in the first map stage, so
    their rows never reach the shuffle)."""
    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)
    done = finished_partitions(out_dir) if resume else {}

    if done:
        skip = set(done)

        def drop_done(batch: pa.Table) -> pa.Table:
            col = batch.column(partition_col)
            mask = pa.array(
                [str(v) not in skip for v in col.to_pylist()], pa.bool_()
            )
            return batch.filter(mask)

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    def commit_group(group: pa.Table) -> pa.Table:
        value = group.column(partition_col)[0].as_py()
        pdir = _part_dir(out_dir, value)
        tmp = pdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(pdir, ignore_errors=True)  # crash leftover, no marker
        os.makedirs(tmp)
        pq.write_table(group, os.path.join(tmp, "data.parquet"))
        os.replace(tmp, pdir)
        with open(os.path.join(pdir, _MARKER + ".tmp"), "w") as f:
            json.dump({"n_rows": group.num_rows}, f)
        os.replace(os.path.join(pdir, _MARKER + ".tmp"), os.path.join(pdir, _MARKER))
        return pa.table(
            {
                "partition": pa.array([str(value)], pa.string()),
                "n_rows": pa.array([group.num_rows], pa.int64()),
            }
        )

    written = (
        ds.groupby(partition_col)
        .map_groups(commit_group, batch_format="pyarrow")
        .take_all()
    )
    out = dict(done)
    for r in written:
        out[r["partition"]] = int(r["n_rows"])
    return out


def read_partitioned(out_dir: str, partitions: list[str] | None = None):
    """Read back committed partitions only (optionally a subset) as a
    Ray Dataset — unfinished/crashed directories are never read."""
    import ray.data as rd

    done = finished_partitions(out_dir)
    names = partitions if partitions is not None else sorted(done)
    paths = [
        os.path.join(_part_dir(out_dir, p), "data.parquet") for p in names if p in done
    ]
    return rd.read_parquet(paths)


# -- small-file compaction (storage maintenance) --------------------------


def plan_compaction(sizes: list[tuple[str, int]], target_bytes: int) -> list[list[str]]:
    """Deterministic greedy packing: files in NAME order, cut a group
    when adding the next file would exceed ``target_bytes`` (every
    group gets at least one file, so an oversized input still
    compacts). Name order — not size order — keeps each output file's
    row order a contiguous slice of the input order, so compaction
    never reorders a sorted layout."""
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_b = 0
    for path, b in sorted(sizes):
        if cur and cur_b + b > target_bytes:
            groups.append(cur)
            cur, cur_b = [], 0
        cur.append(path)
        cur_b += b
    if cur:
        groups.append(cur)
    return groups


def compact_dir(
    in_dir: str,
    out_dir: str,
    target_bytes: int = 128 << 20,
    pattern: str = "*.parquet",
    resume: bool = True,
) -> dict:
    """Compact a directory of many small parquet shards into
    ~``target_bytes`` files — the small-file maintenance pass every
    long-running 100-TB ingest needs (a crawl round, a streaming sink,
    or an incremental tick each leave O(partitions) little files; query
    scans want big row groups).

    The driver does METADATA work only (file sizes → a deterministic
    plan); one Ray task per output group reads its inputs and commits
    ``part-<i>.parquet`` atomically (tmp → rename → ``.done`` marker
    carrying the group's input fingerprint + row count). Re-runs skip
    groups whose marker matches the fingerprint, redo groups whose
    inputs changed, delete stale outputs beyond the current plan, and
    ignore crash-leftover tmp files — exactly-once per group across
    crashes and retries. Input files are never touched."""
    import glob as _glob
    import hashlib

    import ray

    files = sorted(_glob.glob(os.path.join(in_dir, pattern)))
    if not files:
        raise FileNotFoundError(f"no {pattern} under {in_dir}")
    sizes = [(p, os.stat(p).st_size) for p in files]
    groups = plan_compaction(sizes, target_bytes)
    os.makedirs(out_dir, exist_ok=True)

    def group_fp(paths: list[str]) -> str:
        st = [(os.path.basename(p), os.stat(p).st_size, os.stat(p).st_mtime_ns) for p in paths]
        return hashlib.md5(json.dumps(st).encode()).hexdigest()[:16]

    # crash leftovers + outputs beyond the current plan
    for name in os.listdir(out_dir):
        p = os.path.join(out_dir, name)
        if name.endswith(".tmp"):
            os.unlink(p)
        elif name.startswith("part-"):
            idx = int(name.split("-")[1].split(".")[0])
            if idx >= len(groups):
                os.unlink(p)

    @ray.remote(num_cpus=1)
    def merge(paths: list[str], out_path: str, marker: str, fp: str) -> int:
        tables = [pq.read_table(p) for p in paths]
        t = pa.concat_tables(tables)
        tmp = out_path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, out_path)
        mtmp = marker + ".tmp"
        with open(mtmp, "w") as f:
            json.dump({"fp": fp, "n_rows": t.num_rows}, f)
        os.replace(mtmp, marker)
        return t.num_rows

    pending, rows, skipped = [], 0, 0
    for i, g in enumerate(groups):
        out_path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        marker = os.path.join(out_dir, f"part-{i:05d}.done")
        fp = group_fp(g)
        if resume and os.path.exists(marker) and os.path.exists(out_path):
            with open(marker) as f:
                m = json.load(f)
            if m.get("fp") == fp:
                rows += int(m["n_rows"])
                skipped += 1
                continue
        pending.append(merge.remote(g, out_path, marker, fp))
    rows += sum(ray.get(pending))
    return {
        "n_input_files": len(files),
        "n_groups": len(groups),
        "n_written": len(groups) - skipped,
        "n_skipped": skipped,
        "n_rows": rows,
    }
