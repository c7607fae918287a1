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

__all__ = [
    "kmeans_clusters",
    "kmeans_oracle_sql",
    "pq_codes",
    "pq_oracle_sql",
    "pq_search",
    "pq_search_oracle_sql",
    "KM_QUANT",
]

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
                # int64 transport: floor(x * 2^20) overflows int32 for
                # |x| >= 2048, which would silently desync seeds from
                # the SQL oracle; k rows, so the width is free
                "q": pa.array(q[order].astype(np.int64).tolist(), pa.list_(pa.int64())),
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


def pq_codes(sf_dir: str, m: int = 8, k: int = 16, iters: int = 1):
    """Product quantization (Jégou et al. 2011) — the vector-compression
    layout behind billion-scale ANN: the 64-dim embedding is split into
    ``m`` contiguous subspaces, each trained with its own ``k``-centroid
    Lloyd's codebook, and every vector is stored as ``m`` small codes
    (here 8×4 bits = 4 bytes instead of 256 — the step that makes a
    100 TB embedding corpus fit an in-RAM ANN index; search then uses
    per-subspace lookup tables against the codes, cf. ``knn_ivf``).

    Distributed shape = :func:`kmeans_clusters` with the cluster key
    widened to ``(sub, cl)``: one ``map_batches`` pass per iteration
    computes ALL m assignments on the same scan (the subspace loop is
    m tiny matmuls over data already in cache — no extra read) and
    emits ≤ m·k combined partial rows per batch; a ``groupby((sub,
    cl))`` exchange of m·k slim rows finishes the update driver-side;
    codebooks travel by ``ray.put`` broadcast. Encoding is one final
    stateless pass.

    Bit-determinism: the ``floor(x·2^20)`` grid, exact int64 squared-L2,
    argmin ties to the smallest code, floor-div centroid update, and
    seed codebook = sub-vectors of the k corpus vectors with smallest
    ``md5_lower64('pqc:'||vec_id)`` (the :func:`kmeans_clusters` rule
    under a different salt, shared across subspaces) — so
    :func:`pq_oracle_sql` replays everything value-exactly.

    Output: one row per (vec_id, subspace): ``(vec_id, sub, code,
    dist_q)`` with ``dist_q`` the exact int64 squared quantization error
    in that subspace (sum over subs = the vector's total PQ error)."""
    sd = _DIM // m
    ds, cents = _pq_train(sf_dir, m, k, iters)
    cref = ray.put(cents)

    def encode(batch: pa.Table, _cref=cref) -> pa.Table:
        c = ray.get(_cref)
        ids, q = _quant(batch)
        codes, dists = _pq_assign_all(q, c, m, sd)
        n = len(ids)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, m), pa.int64()),
                "sub": pa.array(np.tile(np.arange(m, dtype=np.int64), n), pa.int64()),
                "code": pa.array(codes.reshape(-1), pa.int64()),
                "dist_q": pa.array(dists.reshape(-1), pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def _pq_assign_all(
    q: np.ndarray, c: np.ndarray, m: int, sd: int
) -> tuple[np.ndarray, np.ndarray]:
    """codes, dists: (n, m) each — per-subspace argmin (ties → code 0-first)."""
    qs = q.reshape(len(q), m, sd)
    codes = np.empty((len(q), m), dtype=np.int64)
    dists = np.empty((len(q), m), dtype=np.int64)
    for j in range(m):
        cl, d = _assign(qs[:, j, :], c[j])
        codes[:, j], dists[:, j] = cl, d
    return codes, dists


def _pq_train(sf_dir: str, m: int, k: int, iters: int):
    """Train the m per-subspace codebooks (see :func:`pq_codes` for the
    determinism contract). Returns ``(embeddings Dataset, cents)`` with
    ``cents[sub]`` a (k, sd) int64 codebook."""
    assert _DIM % m == 0
    sd = _DIM // m
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def seed_cands(batch: pa.Table) -> pa.Table:
        ids, q = _quant(batch)
        keys = np.fromiter(
            (md5_lower64(f"pqc:{int(v)}") for v in ids), dtype=np.uint64, count=len(ids)
        )
        order = np.lexsort((ids, keys))[:k]
        return pa.table(
            {
                "ckey": pa.array(keys[order], pa.uint64()),
                "vec_id": pa.array(ids[order], pa.int64()),
                # int64 transport: floor(x * 2^20) overflows int32 for
                # |x| >= 2048, which would silently desync seeds from
                # the SQL oracle; k rows, so the width is free
                "q": pa.array(q[order].astype(np.int64).tolist(), pa.list_(pa.int64())),
            }
        )

    rows = ds.map_batches(seed_cands, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (int(r["ckey"]), int(r["vec_id"])))
    # cents[sub] is that subspace's codebook: (k, sd) int64
    cents = (
        np.asarray([r["q"] for r in rows[:k]], dtype=np.int64)
        .reshape(k, m, sd)
        .transpose(1, 0, 2)
        .copy()
    )

    for _ in range(iters):
        cref = ray.put(cents)

        def partial(batch: pa.Table, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            _, q = _quant(batch)
            codes, _d = _pq_assign_all(q, c, m, sd)
            qs = q.reshape(len(q), m, sd)
            out_sub, out_cl, out_n, out_s = [], [], [], []
            for j in range(m):
                sums = np.zeros((k, sd), np.int64)
                np.add.at(sums, codes[:, j], qs[:, j, :])
                counts = np.bincount(codes[:, j], minlength=k).astype(np.int64)
                nz = np.nonzero(counts)[0]
                out_sub.extend([j] * len(nz))
                out_cl.extend(nz.tolist())
                out_n.extend(counts[nz].tolist())
                out_s.extend(sums[nz].tolist())
            return pa.table(
                {
                    "sub": pa.array(out_sub, pa.int64()),
                    "cluster": pa.array(out_cl, pa.int64()),
                    "n": pa.array(out_n, pa.int64()),
                    "s": pa.array(out_s, pa.list_(pa.int64())),
                }
            )

        def fold(group: pa.Table) -> pa.Table:
            s = np.asarray(group.column("s").to_pylist(), dtype=np.int64).sum(axis=0)
            return pa.table(
                {
                    "sub": group.column("sub").slice(0, 1),
                    "cluster": group.column("cluster").slice(0, 1),
                    "n": pa.array([int(sum(group.column("n").to_pylist()))], pa.int64()),
                    "s": pa.array([s.tolist()], pa.list_(pa.int64())),
                }
            )

        urows = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["sub", "cluster"])
            .map_groups(fold, batch_format="pyarrow")
            .take_all()
        )
        nxt = cents.copy()  # empty cells keep their previous centroid
        for r in urows:
            nxt[int(r["sub"]), int(r["cluster"])] = (
                np.asarray(r["s"], dtype=np.int64) // int(r["n"])
            )
        cents = nxt

    return ds, cents


def pq_search(sf_dir: str, n_queries: int = 8, k_top: int = 10, m: int = 8, k: int = 16, iters: int = 1):
    """ANN search by ASYMMETRIC DISTANCE COMPUTATION over PQ codes — the
    query phase of the PQ index (Jégou et al. 2011): each query builds
    an m×k lookup table of exact int64 squared-L2 distances from its
    sub-vectors to every codebook centroid, and a corpus vector's
    approximate distance is the SUM of m table lookups on its codes —
    never a full-dimension distance against raw vectors. Per 1-byte-ish
    code the scan does one add: this is what makes ANN over a 100 TB
    embedding corpus memory- and compute-feasible (the raw vectors stay
    on disk; only 4-byte codes stream).

    Ray shape: codebooks from :func:`_pq_train` (broadcast), queries =
    ``vec_id < n_queries`` (the :func:`~wbot_ray.pipelines.similarity.
    knn_brute` convention); one stateless ``map_batches`` scan encodes
    each batch and gathers LUT partial top-k rows (``dist_adc`` asc,
    ``n_id`` asc, self excluded); a per-query ``groupby`` merge emits
    the global top-``k_top``. All integers — the DuckDB twin replays
    codebooks, codes, LUTs and the final ranking value-exactly.

    Output: ``(q_id, n_id, dist_adc, adc_rank)``."""
    sd = _DIM // m
    ds, cents = _pq_train(sf_dir, m, k, iters)

    import os as _os

    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    qt = _pq.read_table(
        _os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    qt = qt.filter(_pc.less(qt.column("vec_id"), n_queries))
    q_ids = np.asarray(qt.column("vec_id").to_pylist(), dtype=np.int64)
    order = np.argsort(q_ids)
    q_ids = q_ids[order]
    q_int = np.floor(
        np.asarray(qt.column("embedding").to_pylist(), dtype=np.float64)[order]
        * float(KM_QUANT)
    ).astype(np.int64)
    # LUT[qi, j, c] = exact |q_sub - centroid|^2
    qs = q_int.reshape(len(q_ids), m, sd)
    lut = np.empty((len(q_ids), m, k), dtype=np.int64)
    for j in range(m):
        diff = qs[:, j, None, :] - cents[j][None, :, :]
        lut[:, j, :] = (diff * diff).sum(axis=2)
    bc = ray.put((q_ids, lut, cents))

    out_schema = pa.schema(
        [("q_id", pa.int64()), ("n_id", pa.int64()), ("dist_adc", pa.int64())]
    )

    def batch_topk(batch: pa.Table, _bc=bc) -> pa.Table:
        qids, qlut, c = ray.get(_bc)
        ids, qv = _quant(batch)
        codes, _d = _pq_assign_all(qv, c, m, sd)
        # dist[qi, row] = sum_j LUT[qi, j, codes[row, j]]
        dist = np.zeros((len(qids), len(ids)), dtype=np.int64)
        for j in range(m):
            dist += qlut[:, j, codes[:, j]]
        out_q, out_n, out_dist = [], [], []
        for qi in range(len(qids)):
            j_idx = np.nonzero(ids != qids[qi])[0]
            if len(j_idx) > k_top:  # partial top-k: dist asc, n_id asc
                o = np.lexsort((ids[j_idx], dist[qi, j_idx]))[:k_top]
                j_idx = j_idx[o]
            out_q.extend([int(qids[qi])] * len(j_idx))
            out_n.extend(ids[j_idx].tolist())
            out_dist.extend(dist[qi, j_idx].tolist())
        return pa.table(
            {
                "q_id": pa.array(out_q, pa.int64()),
                "n_id": pa.array(out_n, pa.int64()),
                "dist_adc": pa.array(out_dist, pa.int64()),
            },
            schema=out_schema,
        )

    def merge(group: pa.Table) -> pa.Table:
        qid = int(group.column("q_id")[0].as_py())
        nid = np.asarray(group.column("n_id").to_pylist(), dtype=np.int64)
        d = np.asarray(group.column("dist_adc").to_pylist(), dtype=np.int64)
        o = np.lexsort((nid, d))[:k_top]
        return pa.table(
            {
                "q_id": pa.array([qid] * len(o), pa.int64()),
                "n_id": pa.array(nid[o], pa.int64()),
                "dist_adc": pa.array(d[o], pa.int64()),
                "adc_rank": pa.array(np.arange(1, len(o) + 1), pa.int64()),
            }
        )

    return (
        ds.map_batches(batch_topk, batch_format="pyarrow")
        .groupby("q_id")
        .map_groups(merge, batch_format="pyarrow")
    )


def pq_search_oracle_sql(
    n_queries: int = 8, k_top: int = 10, m: int = 8, k: int = 16, iters: int = 1
) -> str:
    """The full ADC pipeline replayed in SQL: codebook CTEs from
    :func:`_pq_codebook_ctes`, corpus codes, per-query LUTs, and the
    summed-lookup ranking."""
    parts = _pq_codebook_ctes(m, k, iters)
    parts.append(
        f"""
        codes AS (SELECT vec_id, sub, cl AS code
                 FROM (SELECT vec_id, sub, cl, dist,
                              row_number() OVER (PARTITION BY vec_id, sub
                                                 ORDER BY dist, cl) AS rn
                       FROM (SELECT v.vec_id, v.sub, c.cl,
                                    SUM((v.qv - c.qv) * (v.qv - c.qv)) AS dist
                             FROM qv v JOIN c{iters} c ON c.i = v.i
                             GROUP BY v.vec_id, v.sub, c.cl))
                 WHERE rn = 1),
        lut AS (SELECT v.vec_id AS q_id, c.cl, v.sub,
                       SUM((v.qv - c.qv) * (v.qv - c.qv)) AS dist
                FROM qv v JOIN c{iters} c ON c.i = v.i
                WHERE v.vec_id < {n_queries}
                GROUP BY v.vec_id, v.sub, c.cl),
        adc AS (SELECT l.q_id, f.vec_id AS n_id, SUM(l.dist) AS dist_adc
               FROM codes f JOIN lut l ON l.sub = f.sub AND l.cl = f.code
               WHERE f.vec_id <> l.q_id
               GROUP BY l.q_id, f.vec_id),
        ranked AS (SELECT q_id, n_id, dist_adc,
                          row_number() OVER (PARTITION BY q_id
                                             ORDER BY dist_adc, n_id) AS rn
                  FROM adc)
        SELECT q_id, n_id, CAST(dist_adc AS BIGINT) AS dist_adc,
               CAST(rn AS BIGINT) AS adc_rank
        FROM ranked WHERE rn <= {k_top}"""
    )
    return ",".join(parts)


def pq_oracle_sql(m: int = 8, k: int = 16, iters: int = 1) -> str:
    """:func:`kmeans_oracle_sql` with the cluster key widened to
    ``(sub, cl)`` — the identical per-subspace iteration unrolled."""
    parts = _pq_codebook_ctes(m, k, iters)
    parts.append(
        f"""
        fin AS (SELECT vec_id, sub, cl, dist,
                      row_number() OVER (PARTITION BY vec_id, sub
                                         ORDER BY dist, cl) AS rn
               FROM (SELECT v.vec_id, v.sub, c.cl,
                            SUM((v.qv - c.qv) * (v.qv - c.qv)) AS dist
                     FROM qv v JOIN c{iters} c ON c.i = v.i
                     GROUP BY v.vec_id, v.sub, c.cl))
        SELECT vec_id, sub, CAST(cl AS BIGINT) AS code,
               CAST(dist AS BIGINT) AS dist_q
        FROM fin WHERE rn = 1"""
    )
    return ",".join(parts)


def _pq_codebook_ctes(m: int = 8, k: int = 16, iters: int = 1) -> list[str]:
    """The shared PQ codebook CTE chain: quantized dims → seed selection
    → ``iters`` unrolled per-subspace Lloyd updates, ending at
    ``c{iters}`` = (sub, cl, i, qv)."""
    q = float(KM_QUANT)
    sd = _DIM // m
    parts = [
        f"""
        WITH g AS (SELECT vec_id, list_transform(embedding,
                              x -> CAST(floor(x * {q}) AS BIGINT)) AS q
                   FROM embeddings),
        dims AS (SELECT unnest(generate_series(1, {_DIM})) AS i),
        qv AS (SELECT vec_id, i, CAST((i - 1) // {sd} AS BIGINT) AS sub, q[i] AS qv
               FROM g CROSS JOIN dims),
        sel AS (SELECT vec_id,
                       row_number() OVER (
                         ORDER BY md5_number_lower('pqc:' || vec_id), vec_id
                       ) - 1 AS cl
                FROM g ORDER BY md5_number_lower('pqc:' || vec_id), vec_id
                LIMIT {k}),
        c0 AS (SELECT v.sub, s.cl, v.i, v.qv
               FROM sel s JOIN qv v ON v.vec_id = s.vec_id)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""
        a{t} AS (SELECT vec_id, sub, cl, dist,
                       row_number() OVER (PARTITION BY vec_id, sub
                                          ORDER BY dist, cl) AS rn
                FROM (SELECT v.vec_id, v.sub, c.cl,
                             SUM((v.qv - c.qv) * (v.qv - c.qv)) AS dist
                      FROM qv v JOIN c{t - 1} c ON c.i = v.i
                      GROUP BY v.vec_id, v.sub, c.cl)),
        s{t} AS (SELECT a.sub, a.cl, v.i, SUM(v.qv) AS s,
                        COUNT(DISTINCT a.vec_id) AS n
                FROM a{t} a JOIN qv v ON v.vec_id = a.vec_id AND v.sub = a.sub
                WHERE a.rn = 1 GROUP BY a.sub, a.cl, v.i),
        c{t} AS (SELECT sub, cl, i,
                       CAST((s - (((s % n) + n) % n)) // n AS BIGINT) AS qv
                FROM s{t}
                UNION ALL
                SELECT c.sub, c.cl, c.i, c.qv FROM c{t - 1} c
                WHERE NOT EXISTS (SELECT 1 FROM s{t} s
                                  WHERE s.sub = c.sub AND s.cl = c.cl))"""
        )
    return parts


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
