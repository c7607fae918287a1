"""Crawl pipelines exposed as driver queries.

The crawl's input is the Common-Crawl-style pages table of
``BASELINE.json``'s input_hint — not one of the TPC-H-ish testdata
tables — so the corpus is synthesized deterministically per scale
(``wbot_ray.sources.fixtures``, pure function of (seed, scale)).

Correctness gate: ``oracle_entries()`` materializes the fixture link
graph as side tables and returns DuckDB SQL that re-derives the BFS
visited set / results / per-round metrics independently
(``wbot_ray.pipelines.crawl_oracle``), so the driver can hash-compare
the crawl core like any relational query. The sequential reference
simulator (``tests/oracle.py``) remains the semantic oracle in pytest.

Runs are cached per scale under /tmp so the visited/results queries
share one crawl. The query surface STREAMS: visited/results return
sorted Datasets — no driver-side materialization of the crawl.
"""

from __future__ import annotations

import os

from wbot_ray.config import CrawlConfig
from wbot_ray.driver import Crawler, CrawlRun
from wbot_ray.pipelines.crawl_oracle import crawl_oracle_sqls, write_crawl_oracle_tables
from wbot_ray.sources.fixtures import seeds_for_scale, write_pages

__all__ = [
    "scale_for_sf",
    "crawl_run_for",
    "crawl_visited",
    "crawl_results",
    "crawl_metrics",
    "crawl_depth_hist",
    "crawl_text_stats",
    "host_text_stats",
    "index_lookup",
    "export_corpus",
    "oracle_entries",
]

# bump when engine semantics or fixture content change — invalidates any
# cached crawl from an older code version
_CACHE_VERSION = 4
_CACHE_ROOT = f"/tmp/wbot_ray_q/v{_CACHE_VERSION}"

# the config every crawl query (and its oracle) runs under
_QUERY_MAX_DEPTH = 4
_QUERY_MAX_BODY = 16 * 1024


def _query_cfg() -> CrawlConfig:
    return CrawlConfig(max_depth=_QUERY_MAX_DEPTH, max_body_size=_QUERY_MAX_BODY)


def scale_for_sf(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return {"sf0.001": "tiny", "sf0.01": "small", "sf0.1": "medium"}.get(name, "small")


def _pages_path(scale: str) -> str:
    root = os.path.join(_CACHE_ROOT, scale)
    os.makedirs(root, exist_ok=True)
    pages = os.path.join(root, "pages.parquet")
    if not os.path.exists(pages):
        write_pages(pages, scale)
    return pages


def crawl_run_for(sf_dir: str, max_depth: int = _QUERY_MAX_DEPTH) -> CrawlRun:
    scale = scale_for_sf(sf_dir)
    root = os.path.join(_CACHE_ROOT, scale)
    workdir = os.path.join(root, "run")
    manifest = os.path.join(workdir, "MANIFEST.json")
    if os.path.exists(manifest):
        import json

        with open(manifest) as f:
            m = json.load(f)
        if m.get("done"):
            return CrawlRun(workdir, m)
    pages = _pages_path(scale)
    cfg = _query_cfg()
    cfg.max_depth = max_depth
    return Crawler(cfg, workdir=workdir).crawl(
        seeds=seeds_for_scale(scale), pages_path=pages
    )


def crawl_visited(sf_dir: str):
    """Every fetched URL in exact BFS crawl order (sorted Dataset — the
    caller streams or writes it; nothing materializes driver-side)."""
    return crawl_run_for(sf_dir).visited_dataset()


def crawl_depth_hist(sf_dir: str):
    """Frontier-growth profile: per BFS depth, how many URLs were
    fetched and the contiguous ``crawl_ord`` range they occupy (BFS
    order means each depth owns one dense ord interval — the profile a
    crawl operator watches to size the next round). Ray shape: batch-
    local partials over the streamed visited Dataset (depth, n, min,
    max per batch) → one tiny keyed fold; no row reaches the driver."""
    import pyarrow as pa

    ds = crawl_run_for(sf_dir).visited_dataset()

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["depth", "crawl_ord"]).group_by("depth").aggregate(
            [("crawl_ord", "count"), ("crawl_ord", "min"), ("crawl_ord", "max")]
        )
        return pa.table(
            {
                "depth": g.column("depth").cast(pa.int64()),
                "n": g.column("crawl_ord_count").cast(pa.int64()),
                "mn": g.column("crawl_ord_min").cast(pa.int64()),
                "mx": g.column("crawl_ord_max").cast(pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        g = group.group_by("depth").aggregate(
            [("n", "sum"), ("mn", "min"), ("mx", "max")]
        )
        return pa.table(
            {
                "depth": g.column("depth").cast(pa.int64()),
                "n_urls": g.column("n_sum").cast(pa.int64()),
                "first_ord": g.column("mn_min").cast(pa.int64()),
                "last_ord": g.column("mx_max").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("depth")
        .map_groups(fold, batch_format="pyarrow")
    )


def crawl_results(sf_dir: str):
    """Successful fetches with byte-identical extracted text (sorted
    Dataset)."""
    return crawl_run_for(sf_dir).results_dataset_ordered(
        ["crawl_ord", "url", "depth", "status", "text", "lang", "n_links"]
    )


def crawl_metrics(sf_dir: str):
    """Per-round metrics lineage (the reference's 7 counters + politeness
    budget per round) as a table — the north rule's per-stage metrics
    surface."""
    import pyarrow as pa

    run = crawl_run_for(sf_dir)
    rounds = run.manifest["rounds"]
    keys = [
        "total_requests", "successful_requests", "failed_requests",
        "total_link", "crawled_link", "skipped_link", "duplicated_link",
    ]
    cols: dict = {"round": pa.array([r["round"] for r in rounds], pa.int64())}
    for k in keys:
        cols[k] = pa.array([r["metrics"][k] for r in rounds], pa.int64())
    cols["virtual_politeness_sec"] = pa.array(
        [float(r["metrics"]["virtual_politeness_sec"]) for r in rounds], pa.float64()
    )
    return pa.table(cols)


def crawl_text_stats(sf_dir: str):
    """Cross-domain composition: per-document text statistics (the SAME
    vectorized kernel ``textops.text_stats`` uses) over the corpus THE
    CRAWL ITSELF fetched, streamed straight off the results parquet —
    the crawl core and the training-data ops share one data plane, no
    export step in between. One row per successful fetch, keyed by url
    (a seed revisited via the reference's seed-revisit quirk appears
    twice, exactly as it is fetched twice)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wbot_ray.pipelines.textops import _stats_batch

    run = crawl_run_for(sf_dir)
    ds = run.results_dataset(columns=["url", "status", "text", "lang"])

    def stats(batch: pa.Table) -> pa.Table:
        ok = batch.filter(pc.equal(batch.column("status"), 200))
        s = _stats_batch(
            pa.table(
                {
                    "doc_id": ok.column("url"),
                    "text": ok.column("text"),
                    "lang": ok.column("lang"),
                }
            )
        )
        return s.drop_columns(["lang"]).rename_columns(
            ["url", "n_chars", "n_tokens", "n_uniq", "n_bpe", "stop_cnt", "stopword_ratio"]
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def host_text_stats(sf_dir: str, num_buckets: int = 32):
    """Per-HOST fetched-text volume over the crawl's own results — the
    per-site yield table a crawl operator reads after a run (which
    sites produced how much text): ``(host, n_pages, total_chars,
    total_tokens)`` for successful fetches. Host = lowercased URL
    authority via the shared ``HOST_RE`` (cross-engine exact). Batch-
    local partials over the streamed results, one tiny keyed fold."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    run = crawl_run_for(sf_dir)
    ds = run.results_dataset(columns=["url", "status", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        ok = batch.filter(pc.equal(batch.column("status"), 200))
        from wbot_ray.pipelines.graph import HOST_RE

        df = (
            pl.from_arrow(ok.select(["url", "text"]))
            .with_columns(
                host=pl.col("url")
                .str.extract(HOST_RE, 1)
                .fill_null("")
                .str.to_lowercase(),
                nc=pl.col("text").str.len_chars().cast(pl.Int64),
                nt=(pl.col("text").str.count_matches(" ", literal=True) + 1).cast(
                    pl.Int64
                ),
            )
            .group_by("host")
            .agg(
                n=pl.len().cast(pl.Int64),
                c=pl.col("nc").sum(),
                t=pl.col("nt").sum(),
            )
            .with_columns(
                bucket=(pl.col("host").hash(seed=0) % np.uint64(num_buckets)).cast(
                    pl.Int64
                )
            )
        )
        return df.select(["bucket", "host", "n", "c", "t"]).to_arrow().cast(
            pa.schema(
                [
                    ("bucket", pa.int64()),
                    ("host", pa.string()),
                    ("n", pa.int64()),
                    ("c", pa.int64()),
                    ("t", pa.int64()),
                ]
            )
        )

    def fold(group: pa.Table) -> pa.Table:
        g = group.group_by("host").aggregate(
            [("n", "sum"), ("c", "sum"), ("t", "sum")]
        )
        return pa.table(
            {
                "host": g.column("host"),
                "n_pages": g.column("n_sum").cast(pa.int64()),
                "total_chars": g.column("c_sum").cast(pa.int64()),
                "total_tokens": g.column("t_sum").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def index_lookup(sf_dir: str, num_buckets: int = 32):
    """CDX-server-style POINT READS over the bucketed url-sorted web
    index (``web_index.build_web_index`` layout — the same storage the
    crawl's fetch join reads): resolve a deterministic probe set of
    URLs (plus guaranteed misses) to ``(url, lang, n_html)`` rows via
    row-group-pruned lookups, one Ray task per index bucket.

    Probe set (shared with the SQL twin): corpus urls whose
    ``md5(url)`` hex starts with ``'0'`` (~1/16 of the corpus), plus
    32 synthetic never-crawled urls that MUST resolve to nothing (the
    urlhash64 membership filter short-circuits them before any
    row-group read). The oracle is a plain filtered scan of the pages
    parquet — if the index layout lost, duplicated or mis-bucketed any
    row, the value gate fails. Raw Ray tasks are the right tool here:
    a point lookup is one bounded IO per bucket, not a batch
    transform."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as _pq
    import ray

    from wbot_ray.web_index import (
        build_web_index,
        bucket_of_root,
        lookup_pages,
        root_of_url_host,
    )

    scale = scale_for_sf(sf_dir)
    pages = _pages_path(scale)
    index_dir = os.path.join(_CACHE_ROOT, scale, "index")
    build_web_index(pages, index_dir, num_buckets)  # cached (_DONE marker)

    urls = _pq.read_table(pages, columns=["url"]).column("url").to_pylist()
    probes = [u for u in urls if hashlib.md5(u.encode()).hexdigest().startswith("0")]
    probes += [f"https://site0.com/never-crawled/{i}" for i in range(32)]

    by_bucket: dict[int, list[str]] = {}
    for u in probes:
        by_bucket.setdefault(
            bucket_of_root(root_of_url_host(u), num_buckets), []
        ).append(u)

    def probe_bucket(bucket_dir: str, want: list[str]) -> pa.Table:
        # the index stores (url, warc_ts, html, lang) — text is dropped by
        # design (the engine re-extracts); probe html, the payload column
        t = lookup_pages(bucket_dir, want, ["url", "lang", "html"])
        if t is None or t.num_rows == 0:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "lang": pa.array([], pa.string()),
                    "n_html": pa.array([], pa.int64()),
                }
            )
        import pyarrow.compute as pc

        return pa.table(
            {
                "url": t.column("url"),
                "lang": t.column("lang"),
                "n_html": pc.cast(pc.binary_length(t.column("html")), pa.int64()),
            }
        )

    task = ray.remote(probe_bucket)
    parts = ray.get(
        [
            task.remote(os.path.join(index_dir, f"bucket={b}"), want)
            for b, want in sorted(by_bucket.items())
        ]
    )
    return pa.concat_tables(parts)


def export_corpus(sf_dir: str):
    """Crawl → training-data handoff ON DISK: the crawl's successful
    fetches exported as a documents-shaped corpus
    (``doc_id = crawl_ord``, ``text``, ``lang``, ``n_chars``,
    ``source = root``) in RESUMABLE partitioned Parquet — one directory
    per language, atomic per-partition commit + ``_SUCCESS`` markers
    via ``wbot_ray.sinks.write_partitioned``, so a failed export
    re-does only unfinished partitions. Returns the per-partition row
    counts as a table (the driver-checkable summary; the corpus itself
    lands on disk for the ``textops``/``dedup``/``training`` pipelines
    to read)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from wbot_ray.sinks import write_partitioned

    run = crawl_run_for(sf_dir)
    ds = run.results_dataset(
        columns=["crawl_ord", "url", "root", "status", "text", "lang"]
    )

    def to_docs(batch: pa.Table) -> pa.Table:
        ok = batch.filter(pc.equal(batch.column("status"), 200))
        return pa.table(
            {
                "doc_id": ok.column("crawl_ord"),
                "text": ok.column("text"),
                "lang": ok.column("lang"),
                "n_chars": pc.cast(pc.utf8_length(ok.column("text")), pa.int64()),
                "source": ok.column("root"),
            }
        )

    out_dir = os.path.join(
        _CACHE_ROOT, scale_for_sf(sf_dir), "export_corpus"
    )
    counts = write_partitioned(
        ds.map_batches(to_docs, batch_format="pyarrow"), out_dir, "lang"
    )
    parts = sorted(counts)
    return pa.table(
        {
            "part": pa.array(parts, pa.string()),
            "n_rows": pa.array([counts[p] for p in parts], pa.int64()),
        }
    )


def oracle_entries(scale: str = "small") -> dict[str, str]:
    """DuckDB oracle SQL for the crawl queries at ``scale`` (the driver
    compares at sf0.01 → "small"). Ensures the fixture corpus and the
    link-graph side tables exist first; both are deterministic pure
    functions of the scale, so this is idempotent and cached."""
    from wbot_ray.pipelines.common import STOPWORDS
    from wbot_ray.pipelines.textops import TOKEN_PATTERN

    pages = _pages_path(scale)
    cfg = _query_cfg()
    oracle_dir = os.path.join(_CACHE_ROOT, scale, "oracle")
    pages_oracle, links = write_crawl_oracle_tables(pages, oracle_dir, cfg)
    sqls = crawl_oracle_sqls(seeds_for_scale(scale), cfg, pages_oracle, links)
    stop_sql = "(" + ",".join(f"'{w}'" for w in STOPWORDS) + ")"
    # stats over the independently-derived BFS fetch set: the results
    # oracle as a subquery, the text_stats expressions on top
    sqls["export_corpus"] = f"""
        SELECT lang AS part, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM ({sqls['crawl_results']}) GROUP BY lang
    """
    sqls["index_lookup"] = f"""
        SELECT url, lang, CAST(octet_length(html) AS BIGINT) AS n_html
        FROM read_parquet('{pages}')
        WHERE md5(url) LIKE '0%'
    """
    sqls["crawl_depth_hist"] = f"""
        SELECT CAST(depth AS BIGINT) AS depth,
               CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(MIN(crawl_ord) AS BIGINT) AS first_ord,
               CAST(MAX(crawl_ord) AS BIGINT) AS last_ord
        FROM ({sqls['crawl_visited']}) GROUP BY depth
    """
    from wbot_ray.pipelines.graph import HOST_RE

    sqls["host_text_stats"] = f"""
        SELECT lower(COALESCE(regexp_extract(url, '{HOST_RE}', 1), '')) AS host,
               CAST(COUNT(*) AS BIGINT) AS n_pages,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        FROM ({sqls['crawl_results']}) GROUP BY 1
    """
    sqls["crawl_text_stats"] = f"""
        SELECT url,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
               CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS BIGINT) AS n_bpe,
               CAST(len(list_filter(string_split(text, ' '), w -> w IN {stop_sql})) AS BIGINT) AS stop_cnt,
               CAST(len(list_filter(string_split(text, ' '), w -> w IN {stop_sql})) AS DOUBLE)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio
        FROM ({sqls['crawl_results']})
    """
    return sqls
