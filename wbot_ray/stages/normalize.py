"""Seed intake — reference ``Run()`` seed parse + ``add()``
(``/root/reference/crawler.go:109-147,173-194``).

Any invalid seed aborts the whole run (``crawler.go:124-126``), seeds get
depth 0, the deterministic UA/proxy/referrer rotation
(``crawler.go:176-182``) and the request ``Param`` limits
(``max_body_size`` / ``timeout_ms``, ``api.Param`` at
``crawler.go:174-179``) as columns — children inherit their parent's
Param verbatim (``crawler.go:276-280``). The reference assigns the same
config-wide limits to every seed; ``params`` allows per-seed overrides
as an extension. Reference quirk kept: seeds are NOT inserted into the
URL-seen set, so a page linking back to a seed re-crawls it.

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
        ("max_body_size", pa.int64()),
        ("timeout_ms", pa.int64()),
    ]
)


def seeds_to_frontier(
    seeds: list[str], cfg: CrawlConfig, params: list[dict] | None = None
) -> pa.Table:
    """Round-0 frontier table. Raises ``URLError`` on any bad seed, like
    the reference's ``Run``. ``params`` (optional, one dict per seed) may
    override the Param limits ``max_body_size`` / ``timeout_ms`` per
    seed; defaults are the config-wide values, exactly like the
    reference's ``add()``."""
    parsed = [parse_url(s) for s in seeds]  # abort-on-invalid
    n = len(parsed)
    params = params or [{}] * n
    if len(params) != n:
        raise ValueError("params must have one entry per seed")
    rows = {
        "url": [p.url for p in parsed],
        "url_hash": [p.hash for p in parsed],
        "host": [p.host for p in parsed],
        "root": [p.root for p in parsed],
        "depth": [0] * n,
        "crawl_ord": list(range(n)),
        "parent_ord": [-1] * n,
        "link_idx": list(range(n)),
        "user_agent": [cfg.user_agent_for_seed(i) for i in range(n)],
        "proxy": [cfg.proxy_for_seed(i) for i in range(n)],
        "referer": [cfg.referrer_for_seed(i) for i in range(n)],
        "max_body_size": [
            int(params[i].get("max_body_size", cfg.max_body_size)) for i in range(n)
        ],
        "timeout_ms": [
            int(params[i].get("timeout_ms", cfg.timeout_ms)) for i in range(n)
        ],
    }
    return pa.table(rows, schema=FRONTIER_SCHEMA)
