"""Semantic search — the inference × similarity COMPOSITION: encode a
query with the same model seam ``embed_docs`` uses, score every
document by inner product in the hashed embedding space, return the
top-k. This is the end-to-end "search the corpus by meaning" pipeline
(encoder → MIPS top-k) with the deterministic hashing encoder standing
in for real weights behind the identical seam.

Ray shape (one all-lazy DAG):

1. the query vector is tiny — encoded driver-side with the SAME
   ``HashEncoder`` projection and closed over by the batch UDF (a real
   system would ``ray.put`` a query batch; at one query the closure IS
   the broadcast).
2. ``embed_docs``'s actor-pool encoder streams long-format
   ``(doc_id, dim_i, val)`` rows; a fused stateless pass multiplies
   each row by the query's weight at its dimension and pre-sums per
   doc_id within the batch — so the keyed exchange carries ≤ one slim
   row per (doc, batch), never the embeddings.
3. ``groupby(doc_id)`` finishes the exact integer dot products; a
   per-block top-k + ≤ k·blocks driver merge ranks (score desc,
   doc_id asc) — no global sort for k rows.

Scores are exact int64 (integer embeddings × integer query weights),
so the DuckDB oracle — which re-derives doc AND query embeddings from
md5 in SQL — matches bit-for-bit. Docs sharing no touched dimension
with the query score 0 and are not emitted (both engines).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from wbot_ray.pipelines.common import md5_lower64, read_table
from wbot_ray.pipelines.inference import EMBED_DIM, HashEncoder, encoder_pool_size

__all__ = ["semantic_search", "encode_query", "DEFAULT_QUERY"]

# corpus-vocabulary query (the synthetic documents speak SQL-engine
# words); a config constant, not derived from the data
DEFAULT_QUERY = "hash join merge sort"


def encode_query(query: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Dense integer query vector under the HashEncoder projection."""
    v = np.zeros(dim, dtype=np.int64)
    for tok, tf in Counter(query.split(" ")).items():
        h = md5_lower64("emb:" + tok)
        v[h % dim] += (1 if (h >> 32) & 1 else -1) * tf
    return v


def semantic_search(
    sf_dir: str, query: str = DEFAULT_QUERY, k: int = 10, dim: int = EMBED_DIM
):
    """Top-``k`` documents by inner product against the encoded query
    (ties → smaller doc_id). Returns a pyarrow Table."""
    from ray.data.aggregate import Sum

    qv = encode_query(query, dim)

    def score_partial(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        dim_i = batch.column("dim_i").to_numpy(zero_copy_only=False)
        val = batch.column("val").to_numpy(zero_copy_only=False)
        contrib = val * qv[dim_i]
        keep = contrib != 0
        doc, contrib = doc[keep], contrib[keep]
        order = np.argsort(doc, kind="stable")
        doc, contrib = doc[order], contrib[order]
        uk, starts = np.unique(doc, return_index=True)
        return pa.table(
            {
                "doc_id": pa.array(uk, pa.int64()),
                "score": pa.array(np.add.reduceat(contrib, starts), pa.int64())
                if len(uk)
                else pa.array([], pa.int64()),
            }
        )

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        s = t.column("score").to_numpy(zero_copy_only=False)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.take(pa.array(np.lexsort((d, -s))[:k]))

    scored = (
        read_table(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            HashEncoder,
            fn_constructor_kwargs={"dim": dim},
            concurrency=(1, encoder_pool_size()),
            batch_format="pyarrow",
        )
        .map_batches(score_partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("score", alias_name="score"))
        .map_batches(block_topk, batch_format="pyarrow")
    )
    cand = pa.Table.from_pylist(scored.take_all())
    if cand.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.int64())}
        )
    cand = cand.select(["doc_id", "score"])
    s = cand.column("score").to_numpy(zero_copy_only=False)
    d = cand.column("doc_id").to_numpy(zero_copy_only=False)
    return cand.take(pa.array(np.lexsort((d, -s))[: min(k, cand.num_rows)]))
