"""Batched model inference over the ``documents`` table — the
actor-pool pattern every model-scoring stage at 100 TB uses: the model
loads ONCE per actor (``__init__``), every batch is one vectorized
forward pass (``__call__``), and ``map_batches(Cls, concurrency=N)``
sizes the pool to the cluster.

The "model" here is a deterministic feature-hashing text encoder
(the hashing-trick bag-of-words projection): token ``t`` scatters its
term frequency into dimension ``md5_lower64('emb:'+t) % dim`` with
sign ``±1`` from bit 32 of the same hash. All-integer outputs, so the
DuckDB oracle recomputes the embedding bit-for-bit — a real encoder
(fastText / a transformer) plugs into the identical actor seam with
zero pipeline changes (that substitution is the point of the seam;
this container ships no model weights).

Output is LONG format ``(doc_id, dim_i, val)`` — one row per dimension
the document's tokens touch (a zero sum from cancelling signs still
emits its row; untouched dimensions do not) — exactly what the
SQL twin produces.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from wbot_ray.pipelines.common import md5_lower64, read_table

__all__ = ["HashEncoder", "embed_docs", "EMBED_DIM"]

EMBED_DIM = 64


class HashEncoder:
    """Actor-pool encoder: hash-table 'model' state built once per
    actor, per-batch vectorized scatter-add.

    The forward pass is fully columnar: Arrow ``split_pattern`` +
    ``list_flatten`` tokenizes the whole batch in C, dictionary
    encoding collapses the flat token stream to its per-batch
    vocabulary (md5 is computed once per NEW unique token and cached
    across batches), and the (doc, dim) scatter-add is one packed-key
    ``np.unique`` + ``np.bincount`` — no per-row / per-token Python in
    the hot path."""

    def __init__(self, dim: int = EMBED_DIM):
        self.dim = dim
        self._cache: dict[str, tuple[int, int]] = {}  # token -> (dim_i, sign)

    def _proj_unique(self, toks: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """(dim_i, sign) arrays for a batch's unique-token vocabulary.
        Only cache misses pay the md5; steady-state batches hit ~100%."""
        dim, cache = self.dim, self._cache
        dims = np.empty(len(toks), dtype=np.int64)
        signs = np.empty(len(toks), dtype=np.int64)
        for i, tok in enumerate(toks):
            hit = cache.get(tok)
            if hit is None:
                h = md5_lower64("emb:" + tok)
                hit = (h % dim, 1 if (h >> 32) & 1 else -1)
                cache[tok] = hit
            dims[i], signs[i] = hit
        return dims, signs

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "dim_i": pa.array([], pa.int64()),
                    "val": pa.array([], pa.int64()),
                }
            )
        tok_lists = pc.split_pattern(batch.column("text"), pattern=" ")
        if isinstance(tok_lists, pa.ChunkedArray):
            tok_lists = tok_lists.combine_chunks()
        lens = pc.list_value_length(tok_lists).to_numpy(zero_copy_only=False)
        doc = np.repeat(
            batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64),
            lens,
        )
        flat = tok_lists.flatten()
        denc = pc.dictionary_encode(flat)
        codes = denc.indices.to_numpy(zero_copy_only=False)
        u_dim, u_sign = self._proj_unique(denc.dictionary.to_pylist())
        # one occurrence contributes `sign` at `dim_i`; summing over
        # occurrences == summing sign * tf over unique tokens
        packed = doc * np.int64(self.dim) + u_dim[codes]
        uk, inv = np.unique(packed, return_inverse=True)
        vals = np.bincount(inv, weights=u_sign[codes], minlength=len(uk)).astype(
            np.int64
        )
        return pa.table(
            {
                "doc_id": pa.array(uk // self.dim, pa.int64()),
                "dim_i": pa.array(uk % self.dim, pa.int64()),
                "val": pa.array(vals, pa.int64()),
            }
        )


def encoder_pool_size(default: int = 4) -> int:
    """Upper bound for the encoder actor pool: follow the cluster's CPU
    count instead of a hard cap, so a 32-CPU (or 256-node) cluster gets
    a proportionally larger pool. Falls back to ``default`` when Ray
    isn't initialised yet (the pipeline is still lazy at build time)."""
    import ray

    if not ray.is_initialized():
        return default
    return max(default, int(ray.cluster_resources().get("CPU", default)))


def embed_docs(sf_dir: str, dim: int = EMBED_DIM, concurrency: int | None = None):
    """Feature-hashed document embeddings via an actor pool — setup
    (model load) once per actor, batched forward passes, no shuffle at
    all (pure per-batch map). ``concurrency=(1, N)`` autoscales the
    pool DOWN when the cluster is smaller than N — a fixed-size pool
    can grab every CPU and starve the upstream read. N defaults to the
    cluster CPU count (``encoder_pool_size``)."""
    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        HashEncoder,
        fn_constructor_kwargs={"dim": dim},
        concurrency=(1, concurrency or encoder_pool_size()),
        batch_format="pyarrow",
    )
