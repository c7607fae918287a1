"""Anchor-text aggregation over the web corpus — the per-target
anchor summary a search/ranking pipeline stores next to the link
graph (anchor text is the classic external description of a page;
aggregating it per destination URL is a standard webgraph product).

``anchor_texts(sf_dir)`` → one row per canonical destination URL:

* ``n_anchors`` — total ``<a href>`` occurrences pointing at it,
* ``n_texts``   — distinct anchor strings used,
* ``top_anchor`` / ``top_cnt`` — the most frequent anchor string
  (ties broken lexicographically — engine-independent).

Scalar facts come from the engine's own pure functions —
``html.find_anchors`` (unit-pinned in ``tests/test_html.py``) and the
``resolve_url``/``parse_url`` canonicalization the crawl core uses
(byte-vector-pinned in ``tests/test_urlnorm.py``) — over the body
truncated to the query config's ``max_body_size``, exactly the M7
truncation the crawl applies before extraction
(``/root/reference/http_client.go:117``).

Ray shape — partial-aggregate before the shuffle (the host_graph
pattern): each pages batch is parsed ONCE (stateless ``map_batches``
task over a two-column pruned read), reduced batch-locally to
``(dst_url, anchor, cnt)`` triples, and keyed by ``hash(dst_url) %
num_buckets`` so one ``groupby(bucket).map_groups`` task per bucket
finishes every destination exactly: re-sum cnt per (dst, anchor),
then per-dst fold (Σcnt, distinct count, sort-first top). The
exchange carries distinct (dst, anchor) pairs per batch — bounded by
distinct anchor vocabulary, not link occurrences; hot destinations
(every page linking "/") concentrate one dst's PAIRS in a bucket,
already first-level aggregates, so the group is O(distinct anchors).

Oracle: a cached side table ``anchors.parquet`` — one row per (page,
resolvable anchor) written by the same chunked writer machinery as
the crawl-oracle link table (``crawl_oracle.write_crawl_oracle_tables``
precedent: per-row facts from unit-pinned scalars, ALL orchestration
— dedup, counting, arg-max — recomputed independently in DuckDB SQL).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from wbot_ray.config import CrawlConfig
from wbot_ray.html import find_anchors
from wbot_ray.urlnorm import URLError, parse_url, resolve_url

__all__ = ["anchor_texts", "anchor_texts_oracle_sql", "write_anchor_table"]

ANCHORS_SCHEMA = pa.schema(
    [
        ("src_url", pa.string()),
        ("dst_url", pa.string()),
        ("anchor", pa.string()),
    ]
)


def _page_anchors(url: str, html: bytes, max_body: int) -> list[tuple[str, str]]:
    """(canonical dst_url, anchor text) for one page — unresolvable
    hrefs are skipped, same rule as the link-graph expansion."""
    out = []
    for href, text in find_anchors(html[:max_body]):
        try:
            out.append((parse_url(resolve_url(url, href)).url, text))
        except URLError:
            continue
    return out


def _expand_anchors(tbl: pa.Table, max_body: int) -> pa.Table:
    src, dst, anc = [], [], []
    for url, html in zip(tbl.column("url").to_pylist(), tbl.column("html").to_pylist()):
        for d, t in _page_anchors(url, html, max_body):
            src.append(url)
            dst.append(d)
            anc.append(t)
    return pa.table({"src_url": src, "dst_url": dst, "anchor": anc}, schema=ANCHORS_SCHEMA)


def write_anchor_table(
    pages_path: str, out_dir: str, cfg: CrawlConfig, chunk_rows: int = 2048
) -> str:
    """Write ``anchors.parquet`` under ``out_dir``; idempotent (atomic
    rename, skips when present); chunks fan out as Ray tasks when a
    runtime is up."""
    out = os.path.join(out_dir, "anchors.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(out_dir, exist_ok=True)
    corpus = pq.read_table(pages_path, columns=["url", "html"])
    chunks = [
        corpus.slice(off, chunk_rows) for off in range(0, corpus.num_rows, chunk_rows)
    ]
    import ray

    if ray.is_initialized() and len(chunks) > 1:
        expand = ray.remote(_expand_anchors)
        parts = ray.get([expand.remote(c, cfg.max_body_size) for c in chunks])
    else:
        parts = [_expand_anchors(c, cfg.max_body_size) for c in chunks]
    tmp = out + ".tmp"
    pq.write_table(pa.concat_tables(parts), tmp)
    os.replace(tmp, out)
    return out


def _default_paths(sf_dir: str) -> tuple[str, int]:
    from wbot_ray.pipelines.crawlq import _pages_path, _query_cfg, scale_for_sf

    return _pages_path(scale_for_sf(sf_dir)), _query_cfg().max_body_size


def _anchors_path(sf_dir: str) -> str:
    """The cached anchors side table for this scale (oracle input)."""
    from wbot_ray.pipelines.crawlq import _CACHE_ROOT, _pages_path, _query_cfg, scale_for_sf

    scale = scale_for_sf(sf_dir)
    return write_anchor_table(
        _pages_path(scale), os.path.join(_CACHE_ROOT, scale, "oracle"), _query_cfg()
    )


OUT_SCHEMA = pa.schema(
    [
        ("dst_url", pa.string()),
        ("n_anchors", pa.int64()),
        ("n_texts", pa.int64()),
        ("top_anchor", pa.string()),
        ("top_cnt", pa.int64()),
    ]
)


def anchor_texts(
    sf_dir: str,
    num_buckets: int = 32,
    pages_path: str | None = None,
    max_body: int | None = None,
):
    """Per-destination anchor-text summary (see module docstring)."""
    default_pages, default_body = _default_paths(sf_dir)
    pages_path = pages_path or default_pages
    max_body = max_body if max_body is not None else default_body
    pages = rd.read_parquet(pages_path, columns=["url", "html"])

    def to_pairs(batch: pa.Table) -> pa.Table:
        import polars as pl

        # src urls never leave the task — only (dst, anchor) counts do
        dst, anc = [], []
        for url, html in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            for d, t in _page_anchors(url, html, max_body):
                dst.append(d)
                anc.append(t)
        if not dst:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "dst_url": pa.array([], pa.string()),
                    "anchor": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        df = (
            pl.DataFrame({"dst_url": dst, "anchor": anc})
            .group_by(["dst_url", "anchor"])
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
            .with_columns(
                bucket=(pl.col("dst_url").hash(seed=0) % np.uint64(num_buckets)).cast(
                    pl.Int64
                )
            )
        )
        return df.select(["bucket", "dst_url", "anchor", "cnt"]).to_arrow().cast(
            pa.schema(
                [
                    ("bucket", pa.int64()),
                    ("dst_url", pa.string()),
                    ("anchor", pa.string()),
                    ("cnt", pa.int64()),
                ]
            )
        )

    def fold(group: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(group.select(["dst_url", "anchor", "cnt"]))
            .group_by(["dst_url", "anchor"])
            .agg(pl.col("cnt").sum())
            .sort(["dst_url", "cnt", "anchor"], descending=[False, True, False])
            .group_by("dst_url", maintain_order=True)
            .agg(
                n_anchors=pl.col("cnt").sum(),
                n_texts=pl.len().cast(pl.Int64),
                top_anchor=pl.col("anchor").first(),
                top_cnt=pl.col("cnt").first(),
            )
        )
        return df.to_arrow().cast(OUT_SCHEMA)

    result = (
        pages.map_batches(to_pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )
    return rd.from_arrow(OUT_SCHEMA.empty_table()).union(result)


def anchor_texts_oracle_sql(anchors_path: str) -> str:
    """DuckDB oracle: counting, distinct fold and tie-broken arg-max
    recomputed from the per-link side table."""
    return f"""
        WITH c AS (
          SELECT dst_url, anchor, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM read_parquet('{anchors_path}')
          GROUP BY 1, 2
        ),
        a AS (
          SELECT dst_url,
                 CAST(SUM(cnt) AS BIGINT) AS n_anchors,
                 CAST(COUNT(*) AS BIGINT) AS n_texts
          FROM c GROUP BY 1
        ),
        t AS (
          SELECT dst_url, anchor AS top_anchor, cnt AS top_cnt,
                 ROW_NUMBER() OVER (
                   PARTITION BY dst_url ORDER BY cnt DESC, anchor
                 ) AS rn
          FROM c
        )
        SELECT a.dst_url, a.n_anchors, a.n_texts, t.top_anchor, t.top_cnt
        FROM a JOIN t ON t.dst_url = a.dst_url AND t.rn = 1
    """
