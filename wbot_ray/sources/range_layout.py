"""Range-partitioned sorted layout with zone-map pruning — the
build-once / scan-many storage pattern for RANGE predicates, completing
the repo's layout family: hash buckets (``web_index``), centroid
buckets (IVF), term buckets (inverted index), and now sorted ranges.

Build: one distributed sort on the key (the only all-to-all), then each
output block writes its own shard atomically (tmp→rename) and emits a
manifest row ``(shard, key_min, key_max, n_rows)``; the driver commits
the tiny manifest LAST (tmp→replace) — the commit point, so a crashed
build leaves no readable layout and a re-run overwrites the same
directory cleanly.

Scan: a ``[lo, hi)`` range query consults the manifest (O(shards)
driver work) and reads ONLY the shards whose ``[key_min, key_max]``
zone intersects the range — plus one residual vectorized filter for the
partial boundary shards. ``LAST_SCAN_STATS`` records shards/rows
read vs total ("no silent caps": the pruned fraction is observable,
same contract as the IVF probe accounting).

At 100 TB: the sort is paid once; every subsequent range query is
O(selectivity), not O(corpus) — this is what parquet row-group zone
maps do inside one file, lifted to the shard level so pruning happens
before any file is opened.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

__all__ = ["build_range_layout", "range_scan", "LAST_SCAN_STATS"]

_MANIFEST = "_MANIFEST.json"

# filled by range_scan: shards_read / shards_total / rows_read_est
LAST_SCAN_STATS: dict = {}


def build_range_layout(ds: "ray.data.Dataset", key: str, out_dir: str) -> dict:
    """Sort ``ds`` by ``key`` (int64) and lay it out as sorted shards +
    a zone-map manifest. Returns the manifest dict."""
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "shard": pa.array([], pa.string()),
                    "key_min": pa.array([], pa.int64()),
                    "key_max": pa.array([], pa.int64()),
                    "n_rows": pa.array([], pa.int64()),
                }
            )
        k = batch.column(key)
        kmin, kmax = k[0].as_py(), k[-1].as_py()  # batch is sorted
        name = f"part-{kmin}-{kmax}-{batch.num_rows}.parquet"
        tmp = os.path.join(out_dir, f".tmp-{name}")
        pq.write_table(batch, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {
                "shard": pa.array([name], pa.string()),
                "key_min": pa.array([kmin], pa.int64()),
                "key_max": pa.array([kmax], pa.int64()),
                "n_rows": pa.array([batch.num_rows], pa.int64()),
            }
        )

    rows = ds.sort(key).map_batches(write_shard, batch_format="pyarrow").take_all()
    manifest = {"key": key, "shards": sorted(rows, key=lambda r: r["key_min"])}
    tmp = os.path.join(out_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))  # commit point
    return manifest


def range_scan(layout_dir: str, lo: int, hi: int) -> "ray.data.Dataset":
    """Rows with ``lo <= key < hi``: manifest-pruned shard read + one
    residual boundary filter (interior shards pass through whole)."""
    import pyarrow.compute as pc

    with open(os.path.join(layout_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    key = manifest["key"]
    hit = [
        s
        for s in manifest["shards"]
        if s["key_max"] >= lo and s["key_min"] < hi
    ]
    LAST_SCAN_STATS.clear()
    LAST_SCAN_STATS.update(
        {
            "shards_read": len(hit),
            "shards_total": len(manifest["shards"]),
            "rows_read": sum(s["n_rows"] for s in hit),
            "rows_total": sum(s["n_rows"] for s in manifest["shards"]),
        }
    )
    if not hit:
        return ray.data.from_arrow(pa.table({}))

    def residual(batch: pa.Table) -> pa.Table:
        k = batch.column(key)
        return batch.filter(
            pc.and_(pc.greater_equal(k, pa.scalar(lo)), pc.less(k, pa.scalar(hi)))
        )

    return ray.data.read_parquet(
        [os.path.join(layout_dir, s["shard"]) for s in hit]
    ).map_batches(residual, batch_format="pyarrow")
