"""Similarity search over the ``embeddings`` table.

* ``knn_brute`` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put`` → read in every task), each batch computes a local
  numpy matmul top-k, and a final tiny ``groupby(q_id)`` merges the
  per-batch candidates into the global top-k. The shuffle carries
  O(k × queries × batches) candidate rows — never the corpus.
* ``knn_ivf``   — the scale path: deterministic k-means-lite coarse
  centroids (fit on a driver-side sample), corpus bucketed by nearest
  centroid, queries probe only ``nprobe`` buckets. Approximate;
  verified by a recall test against ``knn_brute``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from wbot_ray.pipelines.common import read_table

__all__ = ["knn_brute", "knn_ivf"]

CAND_SCHEMA = pa.schema(
    [("q_id", pa.int64()), ("n_id", pa.int64()), ("sim", pa.float64())]
)
OUT_SCHEMA = pa.schema(
    [("q_id", pa.int64()), ("n_id", pa.int64()), ("knn_rank", pa.int64())]
)


def _vecs(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    return np.asarray(batch.column(col).to_pylist(), dtype=np.float64)


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _topk_of_group(group: pa.Table, k: int) -> pa.Table:
    """Merge a query's candidate rows into its global top-k.
    Order: similarity desc, then n_id asc (deterministic tie-break)."""
    qid = int(group.column("q_id")[0].as_py())
    nid = np.asarray(group.column("n_id").to_pylist(), dtype=np.int64)
    sim = np.asarray(group.column("sim").to_pylist(), dtype=np.float64)
    order = np.lexsort((nid, -sim))[:k]
    return pa.table(
        {
            "q_id": pa.array([qid] * len(order), pa.int64()),
            "n_id": pa.array(nid[order], pa.int64()),
            "knn_rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        },
        schema=OUT_SCHEMA,
    )


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """The benchmark query set: the first ``n_queries`` vectors (a tiny
    driver-side read — at scale this is the user-provided query matrix)."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    import os

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    t = t.filter(pc.less(t.column("vec_id"), n_queries))
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    return ids[order], _unit(vecs[order])


def knn_brute(sf_dir: str, n_queries: int = 8, k: int = 10):
    """Exact cosine top-k of each query vector against the whole corpus
    (excluding itself)."""
    q_ids, q_unit = _load_queries(sf_dir, n_queries)
    q_ref = ray.put((q_ids, q_unit))

    def batch_topk(batch: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        unit = _unit(_vecs(batch))
        sims = qm @ unit.T  # (nq, batch)
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, len(ids))  # +1: self may be in-batch
        for qi in range(len(qids)):
            s = sims[qi]
            idx = np.argpartition(-s, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
            for j in idx:
                if ids[j] == qids[qi]:
                    continue
                out_q.append(qids[qi])
                out_n.append(ids[j])
                out_s.append(s[j])
        return pa.table(
            {"q_id": pa.array(out_q, pa.int64()), "n_id": pa.array(out_n, pa.int64()),
             "sim": pa.array(out_s, pa.float64())},
            schema=CAND_SCHEMA,
        )

    return (
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(batch_topk, batch_format="pyarrow")
        .groupby("q_id")
        .map_groups(lambda g: _topk_of_group(g, k), batch_format="pyarrow")
    )


def _fit_centroids(sample: np.ndarray, n_centroids: int, iters: int = 5) -> np.ndarray:
    """Deterministic k-means-lite: first-n init, fixed iteration count.
    At 100 TB the sample comes from ``ds.limit(...)`` — the fit is always
    driver-side and tiny; only assignment is distributed."""
    c = sample[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ c.T, axis=1)
        for j in range(n_centroids):
            members = sample[assign == j]
            if len(members):
                m = members.mean(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    c[j] = m / norm
    return c


def knn_ivf(sf_dir: str, n_queries: int = 8, k: int = 10, n_centroids: int = 16, nprobe: int = 4):
    """IVF approximate top-k: corpus rows keep only buckets their
    centroid assignment puts them in; a query scans just its ``nprobe``
    closest buckets. Same output schema as ``knn_brute``."""
    q_ids, q_unit = _load_queries(sf_dir, n_queries)

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    sample = _unit(_vecs(pa.table(
        {"embedding": pa.array([r["embedding"] for r in ds.limit(2048).take_all()])}
    )))
    cents = _fit_centroids(sample, min(n_centroids, len(sample)))
    probe = np.argsort(-(q_unit @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probed = {int(q_ids[qi]): set(int(b) for b in probe[qi]) for qi in range(len(q_ids))}
    bcast = ray.put((q_ids, q_unit, cents, probed))

    def batch_topk(batch: pa.Table) -> pa.Table:
        qids, qm, c, pr = ray.get(bcast)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        unit = _unit(_vecs(batch))
        assign = np.argmax(unit @ c.T, axis=1)
        sims = qm @ unit.T
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            mask = np.fromiter((int(a) in pr[int(qids[qi])] for a in assign), bool, len(assign))
            mask &= ids != qids[qi]
            j_idx = np.nonzero(mask)[0]
            if len(j_idx) > k:
                j_idx = j_idx[np.argpartition(-sims[qi, j_idx], k - 1)[:k]]
            for j in j_idx:
                out_q.append(qids[qi])
                out_n.append(ids[j])
                out_s.append(sims[qi, j])
        return pa.table(
            {"q_id": pa.array(out_q, pa.int64()), "n_id": pa.array(out_n, pa.int64()),
             "sim": pa.array(out_s, pa.float64())},
            schema=CAND_SCHEMA,
        )

    return (
        ds.map_batches(batch_topk, batch_format="pyarrow")
        .groupby("q_id")
        .map_groups(lambda g: _topk_of_group(g, k), batch_format="pyarrow")
    )
