"""Distributed k-means over the embedding table — the iterative
model-fitting loop (Lloyd's algorithm) as Ray Data passes.

Training-data curation uses k-means constantly (domain balancing,
semantic dedup buckets, curriculum binning). The distributed shape per
iteration:

1. **assign + combine** — one ``map_batches`` pass: each batch computes
   integer squared-L2 distances to the k broadcast centroids (one int64
   matmul against the centroid matrix, argmin with smallest-id
   tie-break) and emits ≤ k partial rows (cluster, count, per-dim
   component sums) — the map-side combine that keeps the exchange at
   O(k × batches) rows at ANY corpus size,
2. **update** — a k-key ``groupby(cluster)`` finishes the sums; the
   driver pulls k slim rows (k × dim int64s — KBs) and refreshes the
   broadcast centroids: ``floor(sum / count)`` per component, empty
   clusters keep their previous centroid.

After ``iters`` updates, one final assignment pass emits
``(vec_id, cluster_id, dist_q)``. The corpus is re-read per pass
(streaming) — ``iters + 2`` narrow scans total: one seed-selection
pass (per-batch bottom-k candidates, a tiny driver merge), ``iters``
update passes, one final assignment pass.

Bit-determinism (the repo's oracle contract): components live on the
``floor(x · 2^20)`` integer grid (same as ``dedup_embed`` / ``knn_ivf``),
distances are exact int64 sums of squares, the centroid update is exact
integer floor division, and the seed centroids are the k vectors with
the smallest ``md5_lower64('kmc:' || vec_id)`` — so the DuckDB oracle
(``kmeans_oracle_sql``) re-runs every iteration unrolled in SQL and
reproduces every assignment and distance value-exactly, the same
pattern as the PageRank oracle (``wbot_ray.pipelines.graph``).

The reference crawler has no ML ops (SURVEY §2.6) — this is part of the
beyond-reference training-data surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from wbot_ray.pipelines.common import md5_lower64, read_table

__all__ = ["kmeans_clusters", "kmeans_oracle_sql", "KM_QUANT"]

KM_QUANT = 1 << 20  # component grid, shared with dedup_embed / knn_ivf
_DIM = 64


def _quant(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
    v = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
    return ids, np.floor(v * float(KM_QUANT)).astype(np.int64)


def _assign(q: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Nearest centroid per row by exact int64 squared L2 (argmin ties →
    smallest cluster id, matching the oracle's ``ORDER BY dist, cl``)."""
    # |q - c|^2 = |q|^2 - 2 q·c + |c|^2, all int64 (components < 2^21,
    # dots < 2^48 — no overflow)
    d = (
        (q * q).sum(axis=1, keepdims=True)
        - 2 * (q @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )
    cl = np.argmin(d, axis=1)
    return cl.astype(np.int64), d[np.arange(len(q)), cl]


def _seed_centroids(sf_dir: str, k: int) -> np.ndarray:
    """The k corpus vectors with smallest ``md5_lower64('kmc:'||vec_id)``
    (tie vec_id), quantized, ordered by that key — cluster id = rank.
    Distributed partial top-k per batch; the driver merges a tiny union."""

    def cands(batch: pa.Table) -> pa.Table:
        ids, q = _quant(batch)
        keys = np.fromiter(
            (md5_lower64(f"kmc:{int(v)}") for v in ids), dtype=np.uint64, count=len(ids)
        )
        order = np.lexsort((ids, keys))[:k]
        return pa.table(
            {
                "ckey": pa.array(keys[order], pa.uint64()),
                "vec_id": pa.array(ids[order], pa.int64()),
                "q": pa.array(q[order].astype(np.int32).tolist(), pa.list_(pa.int32())),
            }
        )

    rows = (
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(cands, batch_format="pyarrow")
        .take_all()
    )
    rows.sort(key=lambda r: (int(r["ckey"]), int(r["vec_id"])))
    return np.asarray([r["q"] for r in rows[:k]], dtype=np.int64)


def kmeans_clusters(sf_dir: str, k: int = 8, iters: int = 2):
    """Final assignment Dataset ``(vec_id, cluster_id, dist_q)`` after
    ``iters`` Lloyd updates from the md5-seeded centroids."""
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = _seed_centroids(sf_dir, k)

    for _ in range(iters):
        cref = ray.put(cents)

        def partial(batch: pa.Table, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            _, q = _quant(batch)
            cl, _d = _assign(q, c)
            sums = np.zeros((k, _DIM), np.int64)
            np.add.at(sums, cl, q)
            counts = np.bincount(cl, minlength=k).astype(np.int64)
            nz = np.nonzero(counts)[0]
            return pa.table(
                {
                    "cluster": pa.array(nz, pa.int64()),
                    "n": pa.array(counts[nz], pa.int64()),
                    "s": pa.array(sums[nz].tolist(), pa.list_(pa.int64())),
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            s = np.asarray(group.column("s").to_pylist(), dtype=np.int64).sum(axis=0)
            return pa.table(
                {
                    "cluster": group.column("cluster").slice(0, 1),
                    "n": pa.array(
                        [int(sum(group.column("n").to_pylist()))], pa.int64()
                    ),
                    "s": pa.array([s.tolist()], pa.list_(pa.int64())),
                }
            )

        rows = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(fold, batch_format="pyarrow")
            .take_all()
        )
        nxt = cents.copy()  # empty clusters keep their previous centroid
        for r in rows:
            nxt[r["cluster"]] = np.asarray(r["s"], dtype=np.int64) // int(r["n"])
        cents = nxt

    cref = ray.put(cents)

    def final(batch: pa.Table, _cref=cref) -> pa.Table:
        c = ray.get(_cref)
        ids, q = _quant(batch)
        cl, d = _assign(q, c)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(cl, pa.int64()),
                "dist_q": pa.array(d, pa.int64()),
            }
        )

    return ds.map_batches(final, batch_format="pyarrow")


def kmeans_oracle_sql(k: int = 8, iters: int = 2) -> str:
    """The identical iteration unrolled in SQL. Floor division with
    DuckDB's truncating ``//`` via the canonical-mod identity
    ``(s - (((s % n) + n) % n)) // n`` (numpy's ``//`` floors)."""
    q = float(KM_QUANT)
    parts = [
        f"""
        WITH g AS (SELECT vec_id, list_transform(embedding,
                              x -> CAST(floor(x * {q}) AS BIGINT)) AS q
                   FROM embeddings),
        dims AS (SELECT unnest(generate_series(1, {_DIM})) AS i),
        qv AS (SELECT vec_id, i, q[i] AS qv FROM g CROSS JOIN dims),
        sel AS (SELECT vec_id,
                       row_number() OVER (
                         ORDER BY md5_number_lower('kmc:' || vec_id), vec_id
                       ) - 1 AS cl
                FROM g ORDER BY md5_number_lower('kmc:' || vec_id), vec_id
                LIMIT {k}),
        c0 AS (SELECT s.cl, v.i, v.qv FROM sel s JOIN qv v ON v.vec_id = s.vec_id)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""
        a{t} AS (SELECT vec_id, cl, dist,
                       row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
                FROM (SELECT v.vec_id, c.cl,
                             SUM((v.qv - c.qv) * (v.qv - c.qv)) AS dist
                      FROM qv v JOIN c{t - 1} c ON c.i = v.i
                      GROUP BY v.vec_id, c.cl)),
        s{t} AS (SELECT a.cl, v.i, SUM(v.qv) AS s, COUNT(DISTINCT a.vec_id) AS n
                FROM a{t} a JOIN qv v ON v.vec_id = a.vec_id
                WHERE a.rn = 1 GROUP BY a.cl, v.i),
        c{t} AS (SELECT cl, i,
                       CAST((s - (((s % n) + n) % n)) // n AS BIGINT) AS qv
                FROM s{t}
                UNION ALL
                SELECT c.cl, c.i, c.qv FROM c{t - 1} c
                WHERE c.cl NOT IN (SELECT DISTINCT cl FROM s{t}))"""
        )
    parts.append(
        f"""
        fin AS (SELECT vec_id, cl, dist,
                      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
               FROM (SELECT v.vec_id, c.cl,
                            SUM((v.qv - c.qv) * (v.qv - c.qv)) AS dist
                     FROM qv v JOIN c{iters} c ON c.i = v.i
                     GROUP BY v.vec_id, c.cl))
        SELECT vec_id, CAST(cl AS BIGINT) AS cluster_id,
               CAST(dist AS BIGINT) AS dist_q
        FROM fin WHERE rn = 1"""
    )
    return ",".join(parts)
