"""Crawl pipelines exposed as driver queries.

The crawl's input is the Common-Crawl-style pages table of
``BASELINE.json``'s input_hint — not one of the TPC-H-ish testdata
tables — so the corpus is synthesized deterministically per scale
(``wbot_ray.sources.fixtures``, pure function of (seed, scale)) and the
crawl queries are rows-only checked by the driver; their *semantic*
oracle is the sequential reference simulator exercised by
``tests/test_engine.py``.

Runs are cached per scale under /tmp so the visited/results queries
share one crawl.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from wbot_ray.config import CrawlConfig
from wbot_ray.driver import Crawler, CrawlRun
from wbot_ray.sources.fixtures import seeds_for_scale, write_pages

__all__ = ["scale_for_sf", "crawl_run_for", "crawl_visited", "crawl_results", "crawl_metrics"]

# bump when engine semantics or fixture content change — invalidates any
# cached crawl from an older code version
_CACHE_VERSION = 2
_CACHE_ROOT = f"/tmp/wbot_ray_q/v{_CACHE_VERSION}"


def scale_for_sf(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return {"sf0.001": "tiny", "sf0.01": "small", "sf0.1": "medium"}.get(name, "small")


def crawl_run_for(sf_dir: str, max_depth: int = 4) -> CrawlRun:
    scale = scale_for_sf(sf_dir)
    root = os.path.join(_CACHE_ROOT, scale)
    os.makedirs(root, exist_ok=True)
    pages = os.path.join(root, "pages.parquet")
    workdir = os.path.join(root, "run")
    manifest = os.path.join(workdir, "MANIFEST.json")
    if os.path.exists(manifest):
        import json

        with open(manifest) as f:
            m = json.load(f)
        if m.get("done"):
            return CrawlRun(workdir, m)
    if not os.path.exists(pages):
        write_pages(pages, scale)
    cfg = CrawlConfig(max_depth=max_depth, max_body_size=16 * 1024)
    return Crawler(cfg, workdir=workdir).crawl(
        seeds=seeds_for_scale(scale), pages_path=pages
    )


def crawl_visited(sf_dir: str):
    """Every fetched URL in exact BFS crawl order."""
    return crawl_run_for(sf_dir).visited_table()


def crawl_results(sf_dir: str):
    """Successful fetches with byte-identical extracted text."""
    run = crawl_run_for(sf_dir)
    return run.results_table().select(
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
