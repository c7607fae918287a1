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
    "build_doclen_table",
    "bm25_search",
    "bm25_oracle_sql",
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


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (integer fixed-point)
# ---------------------------------------------------------------------------

_DL_CACHE_VERSION = 1

# fixed-point scales of the integer BM25 variant (shared verbatim with
# the SQL twin — every division is int64 floor division in both engines)
BM25_IDF_SCALE = 1_000_000
BM25_TF_SCALE = 1_000

# k1 = 6/5, b = 3/4 as exact rationals folded into the closed form below


def _corpus_fp(sf_dir: str) -> str:
    import hashlib

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    return hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]


def build_doclen_table(
    sf_dir: str, dl_dir: str, num_buckets: int = 64
) -> tuple[int, int]:
    """One-time doc-length side table for ranked retrieval: one
    streaming pass writes ``(doc_id, dl)`` bucket-partitioned by
    ``md5_lower64(doc_id) % num_buckets`` (``write_parquet(
    partition_cols)`` — no shuffle, the staged-edge layout of
    ``graph.link_pagerank``), plus a ``stats.json`` with the two
    global scalars BM25 needs (corpus size ``n_docs`` and total token
    count ``sum_dl``). Built once, probed many times; idempotent via
    ``_DONE``. Returns ``(n_docs, sum_dl)``."""
    import json

    import pyarrow.compute as pc

    stats_path = os.path.join(dl_dir, "stats.json")
    if os.path.exists(os.path.join(dl_dir, "_DONE")):
        with open(stats_path) as f:
            st = json.load(f)
        return st["n_docs"], st["sum_dl"]
    os.makedirs(dl_dir, exist_ok=True)

    def doclens(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        # dl = single-space token count = spaces + 1 (DuckDB
        # len(string_split(text,' ')) computes the identical value,
        # including 1 for the empty string)
        dl = pc.add(
            pc.count_substring(batch.column("text"), pattern=" "), 1
        ).cast(pa.int64())
        bucket = pa.array(
            [
                md5_lower64(str(d)) % num_buckets
                for d in ids.to_pylist()
            ],
            pa.int64(),
        )
        return pa.table({"bucket": bucket, "doc_id": ids, "dl": dl})

    data_dir = os.path.join(dl_dir, "data")
    (
        read_table(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(doclens, batch_format="pyarrow")
        .write_parquet(data_dir, partition_cols=["bucket"])
    )
    slim = ray.data.read_parquet(data_dir, columns=["dl"])
    n_docs = slim.count()
    sum_dl = int(slim.sum("dl"))
    tmp = stats_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"n_docs": int(n_docs), "sum_dl": sum_dl}, f)
    os.replace(tmp, stats_path)
    with open(os.path.join(dl_dir, "_DONE"), "w") as f:
        f.write("ok")
    return int(n_docs), sum_dl


def bm25_search(
    sf_dir: str,
    terms: tuple[str, ...] = DEFAULT_TERMS,
    num_buckets: int = 64,
    index_dir: str | None = None,
    dl_dir: str | None = None,
):
    """Disjunctive (OR) ranked retrieval: every document containing at
    least one query term, scored with an INTEGER fixed-point BM25
    (k1 = 6/5, b = 3/4 folded into one closed form so both engines
    evaluate the identical int64 expression — the repo's
    float-determinism rule):

        idf_fp(t)  = IDF_SCALE * (N - df_t + 1) // (df_t + 1)
        tfc_fp(d,t)= 44 * tf * SUM_DL * TF_SCALE
                     // (20 * tf * SUM_DL + 6 * SUM_DL + 18 * dl_d * N)
        score(d)   = Σ_t idf_fp(t) * tfc_fp(d, t)

    (the tfc closed form is tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with avgdl = SUM_DL/N, multiplied through by 20·SUM_DL; the idf is
    the rational (N−df+1)/(df+1) — same monotonicity as the Robertson
    log idf without transcendental functions. int64 envelope:
    44·tf·SUM_DL·TF_SCALE must fit in 2^63 — holds to ~10^12 corpus
    tokens; beyond that drop TF_SCALE a decade.)

    Physical plan — nothing touches the raw corpus at query time:
    probe ONLY the query terms' posting buckets (pruned-read fraction
    logged), a tiny per-term aggregate computes exact global df (a
    term's postings live wholly in its bucket), then ONE slim keyed
    exchange on ``md5_lower64(doc_id) % B`` lands each doc's rows on
    its doc-length bucket, where the build-once ``build_doclen_table``
    layout supplies ``dl`` locally (the web-index lookup-join pattern:
    the O(N) doc-length table is never shuffled).

    Output: ``(doc_id, n_terms, bm25_fp)``, one row per matching doc.
    """
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    fp = _corpus_fp(sf_dir)
    if index_dir is None:
        index_dir = f"/tmp/wbot_ray_terms/v{_INDEX_CACHE_VERSION}/{fp}/b{num_buckets}"
    if dl_dir is None:
        dl_dir = f"/tmp/wbot_ray_doclen/v{_DL_CACHE_VERSION}/{fp}/b{num_buckets}"
    build_term_index(sf_dir, index_dir, num_buckets)
    n_docs, sum_dl = build_doclen_table(sf_dir, dl_dir, num_buckets)

    qterms = sorted(set(terms))
    used = sorted({_term_bucket(t, num_buckets) for t in qterms})
    files = sorted(
        f
        for b in used
        for f in glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet"))
    )
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_terms", pa.int64()), ("bm25_fp", pa.int64())]
    )
    if not files:
        return ray.data.from_arrow(out_schema.empty_table())

    n_bucket_dirs = len(glob.glob(os.path.join(index_dir, "bucket=*")))
    print(
        f"[bm25_search] probing {len(used)}/{n_bucket_dirs} term buckets "
        f"for {len(qterms)} terms (corpus untouched at query time)"
    )

    term_set = pa.array(qterms, pa.string())

    def match(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch.column("token"), value_set=term_set))
        return t.select(["token", "doc_id", "tf"])

    matched = ray.data.read_parquet(files).map_batches(
        match, batch_format="pyarrow"
    )

    # exact global df per query term: a term's postings all live in its
    # bucket, and the probe read them all — a ≤|terms|-row aggregate
    df_rows = matched.groupby("token").count().take_all()
    dfs = {r["token"]: int(r["count()"]) for r in df_rows}
    if not dfs:
        return ray.data.from_arrow(out_schema.empty_table())
    idf_fp = {
        t: BM25_IDF_SCALE * (n_docs - d + 1) // (d + 1) for t, d in dfs.items()
    }

    def route(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch.column("token"), value_set=term_set))
        idf = pa.array(
            [idf_fp[tok] for tok in t.column("token").to_pylist()], pa.int64()
        )
        bucket = pa.array(
            [md5_lower64(str(d)) % num_buckets for d in t.column("doc_id").to_pylist()],
            pa.int64(),
        )
        return pa.table(
            {
                "bucket": bucket,
                "doc_id": t.column("doc_id"),
                "tf": t.column("tf"),
                "idf_fp": idf,
            }
        )

    def score_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        b = int(group.column("bucket")[0].as_py())
        d = os.path.join(dl_dir, "data", f"bucket={b}")
        dl_tab = pq.read_table(d, columns=["doc_id", "dl"])
        # align dl to the group's rows via sorted binary search
        dl_ids = dl_tab.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(dl_ids, kind="stable")
        dl_ids = dl_ids[order]
        dl_vals = dl_tab.column("dl").to_numpy(zero_copy_only=False).astype(np.int64)[order]
        ids = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(dl_ids, ids)
        dl = dl_vals[pos]
        tf = group.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        idf = group.column("idf_fp").to_numpy(zero_copy_only=False).astype(np.int64)
        num = 44 * tf * sum_dl * BM25_TF_SCALE
        den = 20 * tf * sum_dl + 6 * sum_dl + 18 * dl * n_docs
        term_score = idf * (num // den)
        # per-doc fold: the exchange landed ALL of a doc's rows here
        t = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "s": pa.array(term_score, pa.int64()),
            }
        )
        agg = t.group_by("doc_id").aggregate([("s", "sum"), ("s", "count")])
        return pa.table(
            {
                "doc_id": agg.column("doc_id"),
                "n_terms": agg.column("s_count").cast(pa.int64()),
                "bm25_fp": agg.column("s_sum"),
            },
            schema=out_schema,
        )

    # typed empty union: an all-empty result must keep the schema
    return ray.data.from_arrow(out_schema.empty_table()).union(
        ray.data.read_parquet(files)
        .map_batches(route, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(score_bucket, batch_format="pyarrow")
    )


def bm25_oracle_sql(terms: tuple[str, ...] = DEFAULT_TERMS) -> str:
    """DuckDB twin: recompute postings, df, doc lengths and the two
    global scalars from the raw text with the identical single-space
    tokenization, then evaluate the SAME int64 fixed-point BM25
    closed form (``//`` floor division placement matches the engine
    exactly)."""
    qterms = sorted(set(terms))
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in qterms)
    return f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        dl AS (
          SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks),
        c AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
        tf AS (
          SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, unnest(toks) AS tok FROM toks)
          WHERE tok IN ({in_list}) GROUP BY doc_id, tok),
        df AS (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
        s AS (
          SELECT tf.doc_id,
                 ({BM25_IDF_SCALE} * (c.n - df.df + 1) // (df.df + 1))
                 * ((44 * tf.tf * c.sumdl * {BM25_TF_SCALE})
                    // (20 * tf.tf * c.sumdl + 6 * c.sumdl
                        + 18 * dl.dl * c.n)) AS term_score
          FROM tf
          JOIN df USING (tok)
          JOIN dl ON tf.doc_id = dl.doc_id, c)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(term_score) AS BIGINT) AS bm25_fp
        FROM s GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# Checksummed postings-list build (the index-construction audit pass)

POSTINGS_MIN_DF = 5


def inverted_postings(sf_dir: str, min_df: int = POSTINGS_MIN_DF):
    """Full inverted-index CONSTRUCTION pass with verifiable output:
    one row per term with document frequency, total term frequency,
    and two order-independent postings-list checksums (sum and XOR of
    the member doc_ids) — the audit table an index build emits so a
    reader can verify a posting shard against the corpus without
    shipping the lists themselves. (``build_term_index`` writes real
    posting lists for serving; this pass is how you CHECK one at
    100 TB: checksums are integers, so any lost/duplicated posting
    changes them.)

    Ray shape: each batch tokenizes its documents entirely inside
    Arrow (``split_pattern`` → ``list_parent_indices`` — no Python
    loop over rows or tokens), folds to per-(term, doc) term
    frequencies, then to per-term BATCH PARTIALS (df / tf / sum / xor
    over its docs — docs never straddle batches, so a (term, doc)
    pair lives in exactly one partial). The ``groupby(term)`` exchange
    therefore carries one slim row per term per batch — never a
    posting. XOR is not a built-in Dataset aggregate, so the per-term
    finish is a ``map_groups`` fold (sums for df/tf/sum, XOR for xor
    — both associative+commutative, so block arrival order cannot
    matter). ``min_df`` bounds the output to terms worth auditing
    (the long unique-term tail is noise; the SQL twin shares the
    HAVING gate)."""
    import numpy as np
    import pyarrow.compute as pc

    def partials(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ").combine_chunks()
        flat = toks.flatten()
        parent = pc.list_parent_indices(toks)
        doc_ids = batch.column("doc_id").take(parent)
        td = (
            pa.table({"term": flat, "doc_id": doc_ids})
            .group_by(["term", "doc_id"])
            .aggregate([("doc_id", "count")])
            .rename_columns(["term", "doc_id", "tf"])
        )
        g = td.group_by("term").aggregate(
            [("doc_id", "count"), ("tf", "sum"), ("doc_id", "sum")]
        )
        # per-term XOR of this batch's doc_ids: sort by term, XOR-reduce
        # each contiguous run (np.bitwise_xor.reduceat — vectorized)
        td_sorted = td.sort_by("term")
        codes = pc.dictionary_encode(td_sorted.column("term")).combine_chunks()
        idx = codes.indices.to_numpy()
        starts = np.concatenate(([0], np.flatnonzero(np.diff(idx)) + 1))
        ids = td_sorted.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        xor = np.bitwise_xor.reduceat(ids, starts)
        xor_terms = codes.dictionary.take(pa.array(idx[starts]))
        xt = pa.table({"term": xor_terms, "xor_p": pa.array(xor, pa.int64())})
        gt = pa.table(
            {
                "term": g.column("term"),
                "df_p": pc.cast(g.column("doc_id_count"), pa.int64()),
                "tf_p": pc.cast(g.column("tf_sum"), pa.int64()),
                "sum_p": pc.cast(g.column("doc_id_sum"), pa.int64()),
            }
        )
        joined = gt.join(xt, keys=["term"])
        return joined.select(["term", "df_p", "tf_p", "sum_p", "xor_p"])

    def finish(group: pa.Table) -> pa.Table:
        df = int(pc.sum(group.column("df_p")).as_py())
        if df < min_df:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "tf_sum": pa.array([], pa.int64()),
                    "postings_sum": pa.array([], pa.int64()),
                    "postings_xor": pa.array([], pa.int64()),
                }
            )
        import numpy as np

        xor = int(
            np.bitwise_xor.reduce(
                group.column("xor_p").to_numpy(zero_copy_only=False).astype(np.int64)
            )
        )
        return pa.table(
            {
                "term": pa.array([group.column("term")[0].as_py()], pa.string()),
                "df": pa.array([df], pa.int64()),
                "tf_sum": pa.array([int(pc.sum(group.column("tf_p")).as_py())], pa.int64()),
                "postings_sum": pa.array(
                    [int(pc.sum(group.column("sum_p")).as_py())], pa.int64()
                ),
                "postings_xor": pa.array([xor], pa.int64()),
            }
        )

    return (
        read_table(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("term")
        .map_groups(finish, batch_format="pyarrow")
    )


def inverted_postings_oracle_sql(min_df: int = POSTINGS_MIN_DF) -> str:
    """DuckDB twin: identical single-space tokenization, identical
    checksums (BIT_XOR / SUM over the distinct member doc_ids)."""
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents),
        td AS (
          SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
          FROM tok GROUP BY term, doc_id)
        SELECT term,
               CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(tf) AS BIGINT) AS tf_sum,
               CAST(SUM(doc_id) AS BIGINT) AS postings_sum,
               CAST(BIT_XOR(doc_id) AS BIGINT) AS postings_xor
        FROM td GROUP BY term
        HAVING COUNT(*) >= {min_df}
    """
