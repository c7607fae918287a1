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

from collections import Counter

import numpy as np
import pyarrow as pa

from wbot_ray.pipelines.common import md5_lower64, read_table

__all__ = ["HashEncoder", "embed_docs", "EMBED_DIM"]

EMBED_DIM = 64


class HashEncoder:
    """Actor-pool encoder: hash-table 'model' state built once per
    actor, per-batch vectorized scatter-add."""

    def __init__(self, dim: int = EMBED_DIM):
        self.dim = dim
        self._cache: dict[str, tuple[int, int]] = {}  # token -> (dim_i, sign)

    def _proj(self, tok: str) -> tuple[int, int]:
        hit = self._cache.get(tok)
        if hit is None:
            h = md5_lower64("emb:" + tok)
            hit = (h % self.dim, 1 if (h >> 32) & 1 else -1)
            self._cache[tok] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        o_id, o_dim, o_val = [], [], []
        for did, txt in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            acc: dict[int, int] = {}
            for tok, tf in Counter(txt.split(" ")).items():
                d, s = self._proj(tok)
                acc[d] = acc.get(d, 0) + s * tf
            for d in sorted(acc):
                o_id.append(did)
                o_dim.append(d)
                o_val.append(acc[d])
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "dim_i": pa.array(o_dim, pa.int64()),
                "val": pa.array(o_val, pa.int64()),
            }
        )


def embed_docs(sf_dir: str, dim: int = EMBED_DIM, concurrency: int = 4):
    """Feature-hashed document embeddings via an actor pool — setup
    (model load) once per actor, batched forward passes, no shuffle at
    all (pure per-batch map). ``concurrency=(1, N)`` autoscales the
    pool DOWN when the cluster is smaller than N — a fixed-size pool
    can grab every CPU and starve the upstream read."""
    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        HashEncoder,
        fn_constructor_kwargs={"dim": dim},
        concurrency=(1, concurrency),
        batch_format="pyarrow",
    )
