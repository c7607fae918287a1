"""Seed intake — reference ``Run()`` seed parse + ``add()``
(``/root/reference/crawler.go:109-147,173-194``).

Any invalid seed aborts the whole run (``crawler.go:124-126``), seeds get
depth 0 and the deterministic UA/proxy/referrer rotation
(``crawler.go:176-182``), and — reference quirk — seeds are NOT inserted
into the URL-seen set, so a page linking back to a seed re-crawls it.

The frontier row schema here is the engine's unit of work (SURVEY §1.3):
``crawl_ord`` is the global BFS rank (== the sequential oracle's pop
order), assigned per round by ``wbot_ray.stages.order``.
"""

from __future__ import annotations

import pyarrow as pa

from wbot_ray.config import CrawlConfig
from wbot_ray.urlnorm import parse_url

__all__ = ["seeds_to_frontier", "FRONTIER_SCHEMA"]

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.string()),
        ("host", pa.string()),
        ("root", pa.string()),
        ("depth", pa.int32()),
        ("crawl_ord", pa.int64()),
        ("parent_ord", pa.int64()),
        ("link_idx", pa.int32()),
        ("user_agent", pa.string()),
        ("proxy", pa.string()),
        ("referer", pa.string()),
    ]
)


def seeds_to_frontier(seeds: list[str], cfg: CrawlConfig) -> pa.Table:
    """Round-0 frontier table. Raises ``URLError`` on any bad seed, like
    the reference's ``Run``."""
    parsed = [parse_url(s) for s in seeds]  # abort-on-invalid
    rows = {
        "url": [p.url for p in parsed],
        "url_hash": [p.hash for p in parsed],
        "host": [p.host for p in parsed],
        "root": [p.root for p in parsed],
        "depth": [0] * len(parsed),
        "crawl_ord": list(range(len(parsed))),
        "parent_ord": [-1] * len(parsed),
        "link_idx": list(range(len(parsed))),
        "user_agent": [cfg.user_agent_for_seed(i) for i in range(len(parsed))],
        "proxy": [cfg.proxy_for_seed(i) for i in range(len(parsed))],
        "referer": [cfg.referrer_for_seed(i) for i in range(len(parsed))],
    }
    return pa.table(rows, schema=FRONTIER_SCHEMA)
