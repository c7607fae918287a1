"""Sequential oracle — replicates the reference crawler at ``parallel=1``.

A direct, single-threaded simulation of the reference's worker loop
(``/root/reference/crawler.go:195-291``): FIFO queue
(``pkg/services/queue/queue.go:37-49``), check-and-set visited store
(``pkg/services/store/in_memory.go:22-33``), fetch = exact-URL lookup into
the pages corpus with body truncation before extraction
(``pkg/services/fetcher/http_client.go:117-136``), then the candidate chain
scope → robots → filter → dedup (``crawler.go:249-288``) with the metrics
increments at the reference's exact points.

This is the conformance target for the Ray engine: identical visited set,
identical crawl order, byte-identical text, identical metrics counters.
It shares only the *pure* per-record functions (urlnorm/html/filters) with
the engine — the control flow here is the reference's, not Ray's.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import pyarrow as pa

from wbot_ray.config import CrawlConfig
from wbot_ray.filters import RuleFilter, in_scope
from wbot_ray.html import extract_text, find_links
from wbot_ray.robots import RobotsGate
from wbot_ray.urlnorm import URLError, ParsedURL, parse_url, resolve_url

__all__ = ["OracleResult", "run_oracle"]


@dataclass
class OracleResult:
    # one row per *successful* fetch, in stream order: crawler.go:236-237
    results: list[dict] = field(default_factory=list)
    # one row per pop (every request), in pop order: crawler.go:214-219
    visited: list[dict] = field(default_factory=list)
    metrics: dict[str, int] = field(default_factory=dict)

    def results_table(self) -> pa.Table:
        cols = ["url", "url_hash", "root", "depth", "status", "text", "lang", "n_links", "crawl_ord"]
        return pa.table({c: [r[c] for r in self.results] for c in cols})


def run_oracle(
    pages: pa.Table,
    seeds: list[str],
    config: CrawlConfig | None = None,
) -> OracleResult:
    cfg = config or CrawlConfig()
    corpus: dict[str, dict] = {}
    for i in range(pages.num_rows):
        row = {name: pages.column(name)[i].as_py() for name in pages.column_names}
        corpus[row["url"]] = row

    rule_filter = RuleFilter(cfg.filter_rules)
    robots = RobotsGate(cfg.mode, cfg.robots_bodies)

    m = {
        "total_requests": 0,
        "successful_requests": 0,
        "failed_requests": 0,
        "total_link": 0,
        "crawled_link": 0,
        "skipped_link": 0,
        "duplicated_link": 0,
    }

    # seed intake (crawler.go:109-147): any invalid seed aborts the run
    targets: list[ParsedURL] = []
    for link in seeds:
        targets.append(parse_url(link))  # raises URLError like Run()

    # queue entries: (target, depth, user_agent, proxy)
    queue: deque[tuple[ParsedURL, int, str, str]] = deque()
    for i, t in enumerate(targets):
        # UA/proxy rotation at seed-add time (crawler.go:173-182); NOTE:
        # seeds are NOT marked visited (no HasVisited call in add()).
        queue.append((t, 0, cfg.user_agent_for_seed(i), cfg.proxy_for_seed(i)))

    seen: set[str] = set()
    out = OracleResult()
    crawl_ord = 0

    while queue:
        target, depth, ua, proxy = queue.popleft()
        m["total_requests"] += 1

        out.visited.append(
            {"url": target.url, "url_hash": target.hash, "depth": depth, "crawl_ord": crawl_ord}
        )
        crawl_ord += 1

        # fetch = exact url-string lookup into the corpus
        page = corpus.get(target.url)
        if page is None:
            m["failed_requests"] += 1  # crawler.go:230-234; URL dropped
            continue

        body = page["html"][: cfg.max_body_size]  # truncation BEFORE extraction
        text = extract_text(body)
        hrefs = find_links(body)

        # resolve + re-validate inline (http_client.go:123-136): errors skipped
        next_urls: list[ParsedURL] = []
        for href in hrefs:
            try:
                abs_url = resolve_url(target.url, href)
                next_urls.append(parse_url(abs_url))
            except URLError:
                continue

        m["successful_requests"] += 1
        out.results.append(
            {
                "url": target.url,
                "url_hash": target.hash,
                "root": target.root,
                "depth": depth,
                "status": 200,
                "text": text,
                "lang": page["lang"],
                "n_links": len(next_urls),
                "crawl_ord": crawl_ord - 1,
            }
        )

        next_depth = depth + 1
        if next_depth > cfg.max_depth:  # crawler.go:244-246
            continue

        for child in next_urls:
            m["total_link"] += 1

            if not in_scope(target.root, child.host, cfg.mode):  # crawler.go:252
                m["skipped_link"] += 1
                continue
            # robots tests the PARENT url (crawler.go:257 quirk)
            if not robots.allowed(ua, target.url):
                m["skipped_link"] += 1
                continue
            if not rule_filter.allow(child.root, child.path, child.url):  # crawler.go:263
                m["skipped_link"] += 1
                continue
            if child.hash in seen:  # check-and-set (in_memory.go:22-33)
                m["duplicated_link"] += 1
                continue
            seen.add(child.hash)

            queue.append((child, next_depth, ua, proxy))
            m["crawled_link"] += 1

    out.metrics = m
    return out
