"""Similarity search over the ``embeddings`` table.

* ``knn_brute`` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put`` → read in every task), each batch computes a local
  numpy matmul top-k, and a final tiny ``groupby(q_id)`` merges the
  per-batch candidates into the global top-k. The shuffle carries
  O(k × queries × batches) candidate rows — never the corpus.
* ``knn_ivf``   — the scale path: deterministic coarse centroids (the
  ``n_centroids`` corpus vectors with the smallest md5 keys — the
  classic sampled-Voronoi quantizer), the corpus laid out ONCE as
  bucket-partitioned Parquet (``build_ivf_index`` — same pattern as the
  web index), queries read ONLY their ``nprobe`` closest buckets. The
  pruned-read fraction is logged every run (no silent caps).

Ranking determinism: BOTH paths are **bit-exact cross-engine** (each
has a full DuckDB oracle): vector components are quantized to the
integer grid ``floor(x * 2^20)`` and every cosine is the fixed IEEE
tree ``floor(dot / (sqrt(na) * sqrt(nb)) * 2^20)`` over exact integer
dots (< 2^53) — the same machinery as ``dedup_embed``. Ranking is
``pm`` desc, ``n_id`` asc. (knn_brute originally ranked raw float
cosines rounded to 1e6 — multi-term float accumulation whose summation
order differs between numpy and DuckDB, so near-tied similarities
could flip ranks across engines; the component grid removes the float
sum entirely.) Zero quantized vectors are neither queried nor answered
(cosine undefined).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray

from wbot_ray.pipelines.common import read_table

__all__ = ["knn_brute", "knn_ivf", "build_ivf_index"]

OUT_SCHEMA = pa.schema(
    [("q_id", pa.int64()), ("n_id", pa.int64()), ("knn_rank", pa.int64())]
)


def _vecs(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    return np.asarray(batch.column(col).to_pylist(), dtype=np.float64)


def _load_queries_raw(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Like ``_load_queries`` but UN-normalized float64 components (exact
    float32→float64 widening) — the IVF path quantizes these to the
    integer grid itself."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    t = t.filter(pc.less(t.column("vec_id"), n_queries))
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    return ids[order], vecs[order]


def knn_brute(sf_dir: str, n_queries: int = 8, k: int = 10):
    """Exact cosine top-k of each query vector against the whole corpus
    (excluding itself), on the bit-deterministic integer grid: query
    and corpus components are quantized ``floor(x * 2^20)``, dots are
    exact int64 matmuls, and the cosine is the fixed IEEE tree of
    ``_qcos_pm`` — the DuckDB oracle recomputes the identical ``pm``
    integers, so rank order can never flip across engines. Zero
    quantized vectors (cosine undefined) are excluded on both sides,
    matching the oracle's ``nn > 0`` gates."""
    q_ids, q_raw = _load_queries_raw(sf_dir, n_queries)
    q_int = _quant(q_raw)
    q_nn = (q_int * q_int).sum(axis=1)
    nzq = q_nn > 0
    q_ids, q_int, q_nn = q_ids[nzq], q_int[nzq], q_nn[nzq]
    if len(q_ids) == 0:
        return ray.data.from_arrow(OUT_SCHEMA.empty_table())
    q_ref = ray.put((q_ids, q_int, q_nn))

    def batch_topk(batch: pa.Table) -> pa.Table:
        qids, qm, qnn = ray.get(q_ref)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        g = _quant(_vecs(batch))
        nn = (g * g).sum(axis=1)
        pm = _qcos_pm(qm @ g.T, qnn[:, None], nn[None, :])  # (nq, batch)
        out_q, out_n, out_pm = [], [], []
        for qi in range(len(qids)):
            j_idx = np.nonzero((nn > 0) & (ids != qids[qi]))[0]
            if len(j_idx) > k:  # per-batch partial top-k: pm desc, n_id asc
                order = np.lexsort((ids[j_idx], -pm[qi, j_idx]))[:k]
                j_idx = j_idx[order]
            for j in j_idx:
                out_q.append(int(qids[qi]))
                out_n.append(int(ids[j]))
                out_pm.append(int(pm[qi, j]))
        return pa.table(
            {"q_id": pa.array(out_q, pa.int64()), "n_id": pa.array(out_n, pa.int64()),
             "pm": pa.array(out_pm, pa.int64())},
            schema=CAND_PM_SCHEMA,
        )

    return (
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(batch_topk, batch_format="pyarrow")
        .groupby("q_id")
        .map_groups(lambda g: _merge_topk_pm(g, k), batch_format="pyarrow")
    )


def _merge_topk_pm(group: pa.Table, k: int) -> pa.Table:
    """Merge one query's candidate rows into its global top-k
    (``pm`` desc, ``n_id`` asc)."""
    qid = int(group.column("q_id")[0].as_py())
    nid = np.asarray(group.column("n_id").to_pylist(), dtype=np.int64)
    pm = np.asarray(group.column("pm").to_pylist(), dtype=np.int64)
    order = np.lexsort((nid, -pm))[:k]
    return pa.table(
        {
            "q_id": pa.array([qid] * len(order), pa.int64()),
            "n_id": pa.array(nid[order], pa.int64()),
            "knn_rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        },
        schema=OUT_SCHEMA,
    )


IVF_QUANT = 1 << 20  # component grid AND cosine grid (same as dedup_embed)

CAND_PM_SCHEMA = pa.schema(
    [("q_id", pa.int64()), ("n_id", pa.int64()), ("pm", pa.int64())]
)


def _quant(vecs: np.ndarray) -> np.ndarray:
    """Integer-grid components ``floor(x * 2^20)`` — one correctly-rounded
    multiply + exact floor, identical in numpy and SQL."""
    return np.floor(vecs * float(IVF_QUANT)).astype(np.int64)


def _qcos_pm(dots: np.ndarray, na: np.ndarray, nb: np.ndarray) -> np.ndarray:
    """Bit-deterministic quantized cosine: the fixed IEEE expression tree
    ``floor(dot / (sqrt(na) * sqrt(nb)) * 2^20)`` over exact integer
    inputs < 2^53 — every op is a single correctly-rounded IEEE-754
    operation, so DuckDB computes the identical int64. ``na``/``nb``
    broadcast against ``dots`` (callers pass column/row shapes)."""
    sim = dots.astype(np.float64) / (np.sqrt(na.astype(np.float64)) * np.sqrt(nb.astype(np.float64)))
    return np.floor(sim * float(IVF_QUANT)).astype(np.int64)


def _select_centroids(sf_dir: str, n_centroids: int) -> np.ndarray:
    """The ``n_centroids`` nonzero corpus vectors with the smallest
    ``md5_lower64('ivfc:' || vec_id)`` (tie-break vec_id), as quantized
    int64 rows ordered by that key — a deterministic sampled-Voronoi
    quantizer the SQL oracle re-derives with
    ``ORDER BY md5_number_lower('ivfc:'||vec_id), vec_id LIMIT n``.

    Distributed partial top-k: each batch emits at most ``n_centroids``
    candidate rows, the driver merges the tiny union — no full-corpus
    materialization."""
    from wbot_ray.pipelines.common import md5_lower64

    def batch_cands(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        q = _quant(_vecs(batch))
        nz = (q * q).sum(axis=1) > 0  # zero vectors: cosine undefined
        ids, q = ids[nz], q[nz]
        keys = np.fromiter(
            (md5_lower64(f"ivfc:{int(v)}") for v in ids), dtype=np.uint64, count=len(ids)
        )
        order = np.lexsort((ids, keys))[:n_centroids]
        return pa.table(
            {
                "ckey": pa.array(keys[order], pa.uint64()),
                "vec_id": pa.array(ids[order], pa.int64()),
                "q": pa.array(q[order].astype(np.int32).tolist(), pa.list_(pa.int32())),
            }
        )

    rows = (
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(batch_cands, batch_format="pyarrow")
        .take_all()
    )
    rows.sort(key=lambda r: (int(r["ckey"]), int(r["vec_id"])))
    return np.asarray([r["q"] for r in rows[:n_centroids]], dtype=np.int64)


def build_ivf_index(sf_dir: str, index_dir: str, n_centroids: int = 16) -> str:
    """One-time IVF corpus layout: deterministic md5-sampled centroids,
    then ONE shuffle (``groupby(ivf_bucket)``) writes each bucket's
    QUANTIZED vectors to ``index_dir/bucket=<b>/part-0.parquet`` (the
    ``ivf_bucket`` column is kept IN the file so bucket reads need no
    hive inference; the files carry the int32 grid vector ``q`` — 256
    B/row — not raw floats, so probe reads never re-quantize). The same
    bucketed-parquet pattern as the web index: built once, probed many
    times; nothing materializes driver-side. Zero quantized vectors are
    NOT indexed (cosine undefined — documented semantics, mirrored by
    the oracle). Idempotent via ``_DONE``."""
    if os.path.exists(os.path.join(index_dir, "_DONE")):
        return index_dir
    os.makedirs(index_dir, exist_ok=True)

    cents = _select_centroids(sf_dir, n_centroids)
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    c_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)  # (C, dim) int64 grid vectors
        cn = (c * c).sum(axis=1)  # exact int64 norms
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        q = _quant(_vecs(batch))
        nn = (q * q).sum(axis=1)
        nz = nn > 0
        ids, q, nn = ids[nz], q[nz], nn[nz]
        pm = _qcos_pm(q @ c.T, nn[:, None], cn[None, :])  # (n, C)
        b = np.argmax(pm, axis=1).astype(np.int32)  # ties → smallest cidx
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "q": pa.array(q.astype(np.int32).tolist(), pa.list_(pa.int32())),
                "ivf_bucket": pa.array(b, pa.int32()),
            }
        )

    def write_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        if group.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int32()), "rows": pa.array([], pa.int64())})
        b = int(group.column("ivf_bucket")[0].as_py())
        d = os.path.join(index_dir, f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, ".part-0.tmp")
        pq.write_table(group, tmp)
        os.replace(tmp, os.path.join(d, "part-0.parquet"))
        return pa.table({"bucket": pa.array([b], pa.int32()), "rows": pa.array([group.num_rows], pa.int64())})

    (
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("ivf_bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .materialize()
    )
    with open(os.path.join(index_dir, "_DONE"), "w") as f:
        f.write("ok")
    return index_dir


_IVF_CACHE_VERSION = 2  # v2: quantized-grid vectors + md5-sampled centroids

# prune accounting of the most recent knn_ivf call (driver-side only)
LAST_PRUNE_STATS: dict = {}


def knn_ivf(
    sf_dir: str,
    n_queries: int = 8,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    index_dir: str | None = None,
):
    """IVF approximate top-k: each query reads ONLY its ``nprobe``
    closest centroid buckets from the one-time ``build_ivf_index``
    layout — I/O and compute scale with the probed fraction, not the
    corpus. Same output schema as ``knn_brute``.

    Bit-exact cross-engine (full DuckDB oracle —
    ``__ray_entry__._ivf_oracle_sql``): centroids, bucket assignment,
    probe sets and ranking are all deterministic functions of the
    integer component grid ``floor(x * 2^20)`` and the fixed-tree
    quantized cosine (see module docstring). Ranking: ``pm`` desc,
    ``n_id`` asc. Zero quantized vectors are neither indexed nor
    answered (cosine undefined)."""
    import glob as _glob

    import pyarrow.parquet as pq

    if index_dir is None:
        import hashlib

        src = os.path.join(sf_dir, "embeddings.parquet")
        st = os.stat(src)
        # content fingerprint: a rebuilt corpus at the same path must not
        # silently reuse a stale layout
        fp = hashlib.md5(
            f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}".encode()
        ).hexdigest()[:12]
        index_dir = f"/tmp/wbot_ray_ivf/v{_IVF_CACHE_VERSION}/{fp}/c{n_centroids}"
    build_ivf_index(sf_dir, index_dir, n_centroids)
    cents = np.load(os.path.join(index_dir, "centroids.npy"))  # (C, dim) int64
    cn = (cents * cents).sum(axis=1)

    q_ids, q_raw = _load_queries_raw(sf_dir, n_queries)
    q_int = _quant(q_raw)
    q_nn = (q_int * q_int).sum(axis=1)
    nzq = q_nn > 0  # zero quantized queries: cosine undefined → no rows
    q_ids, q_int, q_nn = q_ids[nzq], q_int[nzq], q_nn[nzq]
    if len(q_ids) == 0:
        return ray.data.from_arrow(OUT_SCHEMA.empty_table())

    c_pm = _qcos_pm(q_int @ cents.T, q_nn[:, None], cn[None, :])  # (nq, C)
    # probe order: pm desc, centroid index asc (matches the oracle's
    # row_number() ORDER BY pm DESC, cidx)
    cidx = np.arange(c_pm.shape[1])
    probe = [np.lexsort((cidx, -c_pm[qi]))[:nprobe] for qi in range(len(q_ids))]
    probed = {int(q_ids[qi]): {int(b) for b in probe[qi]} for qi in range(len(q_ids))}
    used = sorted(set().union(*probed.values()))

    # pruned-read accounting from parquet METADATA only (no data read)
    rows_of = {}
    for d in _glob.glob(os.path.join(index_dir, "bucket=*")):
        b = int(os.path.basename(d).split("=")[1])
        rows_of[b] = sum(
            pq.read_metadata(f).num_rows
            for f in _glob.glob(os.path.join(d, "*.parquet"))
        )
    total = sum(rows_of.values())
    probed_rows = sum(rows_of.get(b, 0) for b in used)
    frac = probed_rows / total if total else 0.0
    print(
        f"[knn_ivf] probing {len(used)}/{len(rows_of)} buckets = "
        f"{probed_rows}/{total} rows ({frac:.1%} of corpus read)"
    )
    # machine-readable prune accounting for bench/BASELINE records
    LAST_PRUNE_STATS.clear()
    LAST_PRUNE_STATS.update(
        {
            "buckets_probed": len(used),
            "buckets_total": len(rows_of),
            "rows_probed": int(probed_rows),
            "rows_total": int(total),
            "read_fraction": round(frac, 4),
        }
    )

    bcast = ray.put((q_ids, q_int, q_nn, probed))
    files = sorted(
        f
        for b in used
        for f in _glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet"))
    )

    def batch_topk(batch: pa.Table) -> pa.Table:
        qids, qm, qnn, pr = ray.get(bcast)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        buckets = np.asarray(batch.column("ivf_bucket").to_pylist(), dtype=np.int64)
        qv = np.asarray(batch.column("q").to_pylist(), dtype=np.int64)
        nn = (qv * qv).sum(axis=1)  # >0 by construction (index skips zeros)
        pm = _qcos_pm(qm @ qv.T, qnn[:, None], nn[None, :])  # (nq, batch)
        out_q, out_n, out_pm = [], [], []
        for qi in range(len(qids)):
            qid = int(qids[qi])
            mask = np.isin(buckets, list(pr[qid])) & (ids != qid)
            j_idx = np.nonzero(mask)[0]
            if len(j_idx) > k:  # per-batch partial top-k: pm desc, n_id asc
                order = np.lexsort((ids[j_idx], -pm[qi, j_idx]))[:k]
                j_idx = j_idx[order]
            for j in j_idx:
                out_q.append(qid)
                out_n.append(ids[j])
                out_pm.append(int(pm[qi, j]))
        return pa.table(
            {"q_id": pa.array(out_q, pa.int64()), "n_id": pa.array(out_n, pa.int64()),
             "pm": pa.array(out_pm, pa.int64())},
            schema=CAND_PM_SCHEMA,
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        qid = int(group.column("q_id")[0].as_py())
        nid = np.asarray(group.column("n_id").to_pylist(), dtype=np.int64)
        pm = np.asarray(group.column("pm").to_pylist(), dtype=np.int64)
        order = np.lexsort((nid, -pm))[:k]
        return pa.table(
            {
                "q_id": pa.array([qid] * len(order), pa.int64()),
                "n_id": pa.array(nid[order], pa.int64()),
                "knn_rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            },
            schema=OUT_SCHEMA,
        )

    return (
        ray.data.read_parquet(files)
        .map_batches(batch_topk, batch_format="pyarrow")
        .groupby("q_id")
        .map_groups(merge_topk, batch_format="pyarrow")
    )
