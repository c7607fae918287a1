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

__all__ = [
    "build_term_index",
    "term_search",
    "build_pos_index",
    "phrase_search",
    "phrase_oracle_sql",
    "DEFAULT_TERMS",
    "DEFAULT_PHRASE",
    "LAST_PRUNE_STATS",
]

DEFAULT_TERMS = ("join", "filter")
DEFAULT_PHRASE = ("table", "scan")

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

    # typed empty union: an all-empty result must keep the schema
    return ray.data.from_arrow(out_schema.empty_table()).union(
        ray.data.read_parquet(files)
        .map_batches(match, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(intersect, batch_format="pyarrow")
    )

_POS_CACHE_VERSION = 1


def build_pos_index(sf_dir: str, index_dir: str, num_buckets: int = 64) -> str:
    """One-time POSITIONAL inverted-index layout: one ``(token, doc_id,
    positions)`` row per distinct token per doc (positions = 1-based
    token offsets as ``list<int32>``), bucketed by token hash exactly
    like ``build_term_index``. The positional payload is what phrase /
    proximity queries need and the tf-only index cannot answer; total
    index size stays O(corpus tokens) — the standard positional-index
    bound. Built once, probed many times; idempotent via ``_DONE``."""
    import pyarrow.parquet as pq

    if os.path.exists(os.path.join(index_dir, "_DONE")):
        return index_dir
    os.makedirs(index_dir, exist_ok=True)

    pos_type = pa.list_(pa.int32())

    def postings(batch: pa.Table) -> pa.Table:
        o_tb, o_tok, o_id, o_pos = [], [], [], []
        for did, txt in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            by_tok: dict[str, list[int]] = {}
            for i, tok in enumerate(txt.split(" "), start=1):
                by_tok.setdefault(tok, []).append(i)
            for tok, ps in by_tok.items():
                o_tb.append(_term_bucket(tok, num_buckets))
                o_tok.append(tok)
                o_id.append(did)
                o_pos.append(ps)
        return pa.table(
            {
                "tb": pa.array(o_tb, pa.int64()),
                "token": pa.array(o_tok, pa.string()),
                "doc_id": pa.array(o_id, pa.int64()),
                "positions": pa.array(o_pos, pos_type),
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
            {
                "bucket": pa.array([b], pa.int64()),
                "rows": pa.array([group.num_rows], pa.int64()),
            }
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


def phrase_search(
    sf_dir: str,
    phrase: tuple[str, ...] = DEFAULT_PHRASE,
    num_buckets: int = 64,
    index_dir: str | None = None,
):
    """Exact PHRASE query (consecutive-token match) over the positional
    index: documents where ``phrase`` appears as adjacent whitespace
    tokens, with ``n_matches`` = number of occurrences.

    Reads ONLY the phrase tokens' posting buckets (pruned-read fraction
    logged — no silent caps), then ONE slim keyed exchange on
    ``doc_id``: a doc's candidate rows meet in one task, where the
    match count is a numpy position-list intersection — start
    positions ``p`` with ``p + j ∈ positions(token_j)`` for every
    offset ``j`` (duplicate phrase tokens handled by offset lists, so
    ``("batch", "batch")`` is exact too). I/O scales with the probed
    buckets, never the corpus."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    assert len(phrase) >= 2
    if index_dir is None:
        import hashlib

        src = os.path.join(sf_dir, "documents.parquet")
        st = os.stat(src)
        fp = hashlib.md5(
            f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}".encode()
        ).hexdigest()[:12]
        index_dir = f"/tmp/wbot_ray_pos/v{_POS_CACHE_VERSION}/{fp}/b{num_buckets}"
    build_pos_index(sf_dir, index_dir, num_buckets)

    # offsets per DISTINCT token: ("a", "b", "a") -> {"a": [0, 2], "b": [1]}
    offsets: dict[str, list[int]] = {}
    for j, tok in enumerate(phrase):
        offsets.setdefault(tok, []).append(j)
    n_distinct = len(offsets)

    used = sorted({_term_bucket(t, num_buckets) for t in offsets})
    rows_of = {}
    for d in glob.glob(os.path.join(index_dir, "bucket=*")):
        b = int(os.path.basename(d).split("=")[1])
        rows_of[b] = sum(
            pq.read_metadata(f).num_rows for f in glob.glob(os.path.join(d, "*.parquet"))
        )
    total = sum(rows_of.values())
    probed = sum(rows_of.get(b, 0) for b in used)
    print(
        f"[phrase_search] probing {len(used)}/{len(rows_of)} buckets = "
        f"{probed}/{total} posting rows "
        f"({probed / total if total else 0.0:.1%} of index read)"
    )

    out_schema = pa.schema([("doc_id", pa.int64()), ("n_matches", pa.int64())])
    files = sorted(
        f
        for b in used
        for f in glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet"))
    )
    if not files:
        return ray.data.from_arrow(out_schema.empty_table())

    token_set = pa.array(sorted(offsets), pa.string())

    def match(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch.column("token"), value_set=token_set))
        return t.select(["doc_id", "token", "positions"])

    def count_phrase(group: pa.Table) -> pa.Table:
        if group.num_rows != n_distinct:  # some phrase token absent
            return out_schema.empty_table()
        pos_of = {
            tok: np.asarray(ps, np.int64)
            for tok, ps in zip(
                group.column("token").to_pylist(), group.column("positions").to_pylist()
            )
        }
        starts: np.ndarray | None = None
        for tok, offs in offsets.items():
            for j in offs:
                cand = pos_of[tok] - j
                starts = cand if starts is None else starts[np.isin(starts, cand)]
                if starts.size == 0:
                    return out_schema.empty_table()
        n = int((starts >= 1).sum())
        if n == 0:
            return out_schema.empty_table()
        did = int(group.column("doc_id")[0].as_py())
        return pa.table(
            {
                "doc_id": pa.array([did], pa.int64()),
                "n_matches": pa.array([n], pa.int64()),
            },
            schema=out_schema,
        )

    # typed empty union: an all-empty result must keep the schema
    return ray.data.from_arrow(out_schema.empty_table()).union(
        ray.data.read_parquet(files)
        .map_batches(match, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(count_phrase, batch_format="pyarrow")
    )


def phrase_oracle_sql(phrase: tuple[str, ...] = DEFAULT_PHRASE) -> str:
    """DuckDB oracle: re-derive every phrase occurrence from the raw
    text with the identical single-space tokenization — 1-based list
    indexing over ``string_split``, one predicate per phrase offset."""
    k = len(phrase)
    conds = " AND ".join(
        f"toks[i + {j}] = '{tok}'" for j, tok in enumerate(phrase)
    )
    return f"""
        SELECT doc_id, n_matches FROM (
          SELECT doc_id,
                 CAST(len(list_filter(range(1, len(toks) - {k - 2}),
                                      i -> {conds})) AS BIGINT) AS n_matches
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        ) WHERE n_matches >= 1
    """
