"""Exact text search over the ``documents`` table — the inverted-index
complement to the ANN family in ``pipelines.similarity``.

* ``build_term_index`` — one-time posting-list layout: one shuffle
  (``groupby(term_bucket)``) writes each bucket's ``(token, doc_id,
  tf)`` postings to ``index_dir/bucket=<b>/part-0.parquet`` — the same
  bucketed-parquet build-once/probe-many pattern as the web index and
  the IVF layout.
* ``term_search``   — conjunctive (AND) term query: reads ONLY the
  query terms' buckets (pruned-read fraction logged every run — no
  silent caps), filters to the query tokens, and one slim keyed
  exchange on ``doc_id`` intersects the posting lists. Documents
  containing ALL terms are returned with ``tf_total`` (summed term
  frequency). I/O scales with the probed buckets, never the corpus.

Deterministic and fully DuckDB-oracle-checked (the oracle recomputes
postings from the raw text with the identical single-space
tokenization).
"""

from __future__ import annotations

import glob
import os
from collections import Counter

import pyarrow as pa
import ray

from wbot_ray.pipelines.common import md5_lower64, read_table

__all__ = ["build_term_index", "term_search", "DEFAULT_TERMS", "LAST_PRUNE_STATS"]

DEFAULT_TERMS = ("join", "filter")

_INDEX_CACHE_VERSION = 1

# prune accounting of the most recent term_search call (driver-side only)
LAST_PRUNE_STATS: dict = {}


def _term_bucket(token: str, num_buckets: int) -> int:
    return md5_lower64("term:" + token) % num_buckets


def build_term_index(sf_dir: str, index_dir: str, num_buckets: int = 64) -> str:
    """One-time inverted-index layout: per-batch partial term counts
    (one ``(token, doc_id, tf)`` row per distinct token per doc — never
    one per occurrence), then ONE shuffle groups postings by term
    bucket and writes ``bucket=<b>/part-0.parquet``. Built once, probed
    many times; idempotent via ``_DONE``."""
    import pyarrow.parquet as pq

    if os.path.exists(os.path.join(index_dir, "_DONE")):
        return index_dir
    os.makedirs(index_dir, exist_ok=True)

    def postings(batch: pa.Table) -> pa.Table:
        o_tb, o_tok, o_id, o_tf = [], [], [], []
        for did, txt in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for tok, tf in Counter(txt.split(" ")).items():
                o_tb.append(_term_bucket(tok, num_buckets))
                o_tok.append(tok)
                o_id.append(did)
                o_tf.append(tf)
        return pa.table(
            {
                "tb": pa.array(o_tb, pa.int64()),
                "token": pa.array(o_tok, pa.string()),
                "doc_id": pa.array(o_id, pa.int64()),
                "tf": pa.array(o_tf, pa.int64()),
            }
        )

    def write_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "rows": pa.array([], pa.int64())}
            )
        b = int(group.column("tb")[0].as_py())
        d = os.path.join(index_dir, f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, ".part-0.tmp")
        pq.write_table(group, tmp)
        os.replace(tmp, os.path.join(d, "part-0.parquet"))
        return pa.table(
            {"bucket": pa.array([b], pa.int64()), "rows": pa.array([group.num_rows], pa.int64())}
        )

    (
        read_table(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(postings, batch_format="pyarrow")
        .groupby("tb")
        .map_groups(write_bucket, batch_format="pyarrow")
        .materialize()
    )
    with open(os.path.join(index_dir, "_DONE"), "w") as f:
        f.write("ok")
    return index_dir


def term_search(
    sf_dir: str,
    terms: tuple[str, ...] = DEFAULT_TERMS,
    num_buckets: int = 64,
    index_dir: str | None = None,
):
    """Documents containing ALL of ``terms`` (conjunctive boolean
    search), with ``tf_total`` = summed occurrences of the query terms.
    Reads only the terms' posting buckets from the one-time
    ``build_term_index`` layout."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if index_dir is None:
        import hashlib

        src = os.path.join(sf_dir, "documents.parquet")
        st = os.stat(src)
        fp = hashlib.md5(
            f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}".encode()
        ).hexdigest()[:12]
        index_dir = f"/tmp/wbot_ray_terms/v{_INDEX_CACHE_VERSION}/{fp}/b{num_buckets}"
    build_term_index(sf_dir, index_dir, num_buckets)

    used = sorted({_term_bucket(t, num_buckets) for t in terms})
    rows_of = {}
    for d in glob.glob(os.path.join(index_dir, "bucket=*")):
        b = int(os.path.basename(d).split("=")[1])
        rows_of[b] = sum(
            pq.read_metadata(f).num_rows for f in glob.glob(os.path.join(d, "*.parquet"))
        )
    total = sum(rows_of.values())
    probed = sum(rows_of.get(b, 0) for b in used)
    frac = probed / total if total else 0.0
    print(
        f"[term_search] probing {len(used)}/{len(rows_of)} buckets = "
        f"{probed}/{total} posting rows ({frac:.1%} of index read)"
    )
    LAST_PRUNE_STATS.clear()
    LAST_PRUNE_STATS.update(
        {
            "buckets_probed": len(used),
            "buckets_total": len(rows_of),
            "rows_probed": int(probed),
            "rows_total": int(total),
            "read_fraction": round(frac, 4),
        }
    )

    out_schema = pa.schema([("doc_id", pa.int64()), ("tf_total", pa.int64())])
    files = sorted(
        f
        for b in used
        for f in glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet"))
    )
    if not files:
        return ray.data.from_arrow(out_schema.empty_table())

    term_set = pa.array(sorted(set(terms)), pa.string())
    n_terms = len(set(terms))

    def match(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch.column("token"), value_set=term_set))
        return t.select(["doc_id", "tf"])

    def intersect(group: pa.Table) -> pa.Table:
        # a term appears at most once per doc in the postings, so
        # rowcount == n_terms ⇔ the doc contains every query term
        did = int(group.column("doc_id")[0].as_py())
        if group.num_rows != n_terms:
            return out_schema.empty_table()
        tf = sum(group.column("tf").to_pylist())
        return pa.table(
            {"doc_id": pa.array([did], pa.int64()), "tf_total": pa.array([tf], pa.int64())},
            schema=out_schema,
        )

    return (
        ray.data.read_parquet(files)
        .map_batches(match, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(intersect, batch_format="pyarrow")
    )
