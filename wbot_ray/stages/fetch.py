"""Fetch + extract — the engine's hot stage.

One round's fetch is ``frontier.groupby("fetch_part").map_groups(fetch_fn)``:
a partitioned index-lookup join against the bucketed web index
(``wbot_ray.web_index``) that replicates the reference fetcher
(``/root/reference/pkg/services/fetcher/http_client.go:55-145``) plus the
candidate-link gates of the worker loop (``crawler.go:242-265``):

- fetch = exact url lookup in the task's corpus bucket (missing ⇒ status 0,
  a failed request, url dropped — ``crawler.go:230-234``),
- body truncated to ``max_body_size`` BEFORE extraction (``io.CopyN``,
  ``http_client.go:117``),
- links extracted in the reference's selector-group order and resolved +
  re-validated inline (``http_client.go:123-136``; invalid urls silently
  dropped, they never reach the metrics),
- per child (only when ``depth+1 <= max_depth``, ``crawler.go:244-246``):
  scope (``crawler.go:252``) → robots on the PARENT url (``crawler.go:257``
  quirk) → extension/rule filter (``filter.go:30-57``); rejects are counted
  as skipped, survivors become ``next`` candidates for the dedup stage.

Partitioning: ``fetch_part = bucket(root) + B * salt``. Every task owns
disjoint registrable domains (politeness locality, SURVEY §2.4 T1); roots
flagged hot by the driver (frontier rows > ``hot_host_threshold``) are
salt-split into sub-parts that read the same corpus bucket — skew splits
never change the on-disk index. Per-root politeness is "virtual" by
default: the pacing *budget* is reported in metrics instead of sleeping,
keeping rounds deterministic; ``politeness="real"`` makes each task pace
its per-root fetches with a token bucket (rate semantics of
``limiter.go:52-59``).
"""

from __future__ import annotations

import math
import os
import time
import zlib

import pyarrow as pa

from functools import lru_cache

from wbot_ray import fsio
from wbot_ray.config import CrawlConfig
from wbot_ray.filters import RuleFilter, in_scope
from wbot_ray.html import parse_page
from wbot_ray.robots import RobotsGate
from wbot_ray.urlnorm import URLError, parse_url, resolve_url
from wbot_ray.web_index import bucket_of_root, lookup_pages

# parse_url is a pure function of the url string and ParsedURL is an
# immutable record, so memoizing is semantics-free. It pays because a
# fetch task owns whole sites and a site's pages link into the same
# small target set — most resolved urls repeat within one worker.
# lru_cache does not cache raised URLErrors; invalid urls (the
# minority) just recompute. (A named wrapper, not lru_cache(parse_url):
# the bare wrapper inherits parse_url's qualname, which breaks
# cloudpickle's serialize-by-reference.)
@lru_cache(maxsize=1 << 17)
def _parse_url_cached(raw: str):
    return parse_url(raw)

__all__ = ["make_assign_fetch_part", "make_fetch_group_fn", "make_fused_fetch_fn", "NEXT_TYPE", "RESULT_SCHEMA"]

NEXT_TYPE = pa.list_(
    pa.struct(
        [
            ("url", pa.string()),
            ("hash", pa.string()),
            ("host", pa.string()),
            ("root", pa.string()),
            ("link_idx", pa.int32()),
        ]
    )
)

RESULT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.string()),
        ("root", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("crawl_ord", pa.int64()),
        ("status", pa.int32()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("n_links", pa.int32()),
        ("n_links_total", pa.int32()),
        ("n_skipped", pa.int32()),
        ("elapsed_ms", pa.int64()),
        ("user_agent", pa.string()),
        ("proxy", pa.string()),
        ("referer", pa.string()),
        ("max_body_size", pa.int64()),
        ("timeout_ms", pa.int64()),
        ("next", NEXT_TYPE),
    ]
)


def make_assign_fetch_part(cfg: CrawlConfig, hot_roots: dict[str, int]):
    """Batch UDF adding the ``fetch_part`` column. ``hot_roots`` maps a
    registrable domain to its salt count (1 = no split); computed by the
    driver from per-root frontier counts each round."""
    B = cfg.num_buckets

    def assign(batch: pa.Table) -> pa.Table:
        roots = batch.column("root").to_pylist()
        hashes = batch.column("url_hash").to_pylist()
        parts = []
        for root, h in zip(roots, hashes):
            b = bucket_of_root(root, B)
            k = hot_roots.get(root, 1)
            salt = zlib.crc32(h.encode()) % k if k > 1 else 0
            parts.append(b + B * salt)
        return batch.append_column("fetch_part", pa.array(parts, pa.int64()))

    return assign


def make_headless_fetcher(index_dir: str, cfg: CrawlConfig):
    """Headless-browser fetcher seam — the reference ships this as an
    empty ChromeDP stub (``pkg/services/fetcher/headless.go:1-7``); kept
    here with the same pluggable signature (``cfg.fetcher_factory``) so a
    real browser pool can be dropped in as an actor-pool stage."""

    def fetch_group(group: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "headless fetching is a stub in the reference and here; "
            "plug a browser-pool fetcher via cfg.fetcher_factory"
        )

    return fetch_group


class _TokenBucket:
    """Real-politeness pacing (reference ``limiter.go:52-59`` semantics:
    blocking take at ``rate`` per ``interval``)."""

    def __init__(self, rate: int, interval_s: float) -> None:
        self.per_req = interval_s / max(1, rate)
        self.next_free = 0.0

    def take(self) -> None:
        now = time.monotonic()
        if self.next_free > now:
            time.sleep(self.next_free - now)
            now = self.next_free
        self.next_free = now + self.per_req


def make_fetch_group_fn(
    index_dir: str,
    cfg: CrawlConfig,
    hot_roots: dict[str, int] | None = None,
    fetch_one=None,
):
    """Build the per-group fetch function. Stateless across tasks; all
    broadcastable state (config, rules, robots) rides the closure once per
    task submission — never per row.

    ``hot_roots`` (root → salt count): a salted root's frontier rows are
    split across ``k`` concurrent sub-partitions, so in real-politeness
    mode each sub-partition's token bucket runs at ``rate / k`` — the
    aggregate pacing stays at the configured per-root rate instead of
    silently multiplying it by the salt factor.

    ``fetch_one``: transport seam. None = the built-in simulated fetch
    (exact url lookup in the task's corpus index bucket). Otherwise a
    callable ``(url, user_agent, referer, proxy, timeout_ms,
    max_body_size) -> (body: bytes, lang, warc_ts, status) | None``
    invoked per row AFTER the politeness take (None = transport error →
    status 0); everything downstream — truncation-before-extract, link
    parse, scope/robots/rule gates, depth expansion — is byte-identical
    between transports."""
    B = cfg.num_buckets
    max_depth = cfg.max_depth
    mode = cfg.mode
    hot_roots = hot_roots or {}

    def fetch_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return RESULT_SCHEMA.empty_table()
        # many fetch tasks run concurrently per node; per-task Arrow
        # IO/CPU fan-out must stay bounded or threads thrash at high
        # concurrency (defaults are per-process = all cores; tasks are
        # the parallelism here)
        if pa.io_thread_count() > 4:
            pa.set_io_thread_count(4)
        if pa.cpu_count() > 2:
            pa.set_cpu_count(2)
        rule_filter = RuleFilter(cfg.filter_rules)
        robots = RobotsGate(mode, cfg.robots_bodies)
        bucket = int(group.column("fetch_part")[0].as_py()) % B

        urls = group.column("url").to_pylist()
        pages: dict[str, tuple[bytes, str, int]] = {}
        if fetch_one is None:
            bucket_dir = os.path.join(index_dir, f"bucket={bucket}")
            tbl = lookup_pages(bucket_dir, urls, ["url", "html", "lang", "warc_ts"])
            if tbl is not None:
                u_col = tbl.column("url").to_pylist()
                h_col = tbl.column("html").to_pylist()
                l_col = tbl.column("lang").to_pylist()
                t_col = tbl.column("warc_ts").to_pylist()
                pages = {u: (h, l, t) for u, h, l, t in zip(u_col, h_col, l_col, t_col)}

        hashes = group.column("url_hash").to_pylist()
        roots = group.column("root").to_pylist()
        hosts = group.column("host").to_pylist()
        depths = group.column("depth").to_pylist()
        ords = group.column("crawl_ord").to_pylist()
        uas = group.column("user_agent").to_pylist()
        proxies = group.column("proxy").to_pylist()
        referers = group.column("referer").to_pylist()
        # per-request Param limits (api.Param, crawler.go:174-179);
        # inherited parent→child, so each row may differ
        mbs = group.column("max_body_size").to_pylist()
        tmo = group.column("timeout_ms").to_pylist()

        limiters: dict[str, _TokenBucket] = {}
        real_politeness = cfg.politeness == "real"

        out = {name: [] for name in RESULT_SCHEMA.names}
        for i, url in enumerate(urls):
            root = roots[i]
            depth = depths[i]
            if real_politeness:
                tb = limiters.get(root)
                if tb is None:
                    rate, interval = cfg.rate_for_root(root)
                    # salted root: k sub-partitions pace concurrently, so
                    # each runs at rate/k (interval stretched k×)
                    k = hot_roots.get(root, 1)
                    tb = limiters[root] = _TokenBucket(rate, interval * k)
                tb.take()
            t0 = time.perf_counter()
            if fetch_one is None:
                page = pages.get(url)
                status = 200 if page is not None else 0
            else:
                fetched = fetch_one(url, uas[i], referers[i], proxies[i], tmo[i], mbs[i])
                if fetched is None:
                    page, status = None, 0
                else:
                    page, status = fetched[:3], fetched[3]
            out["url"].append(url)
            out["url_hash"].append(hashes[i])
            out["root"].append(root)
            out["host"].append(hosts[i])
            out["depth"].append(depth)
            out["crawl_ord"].append(ords[i])
            out["user_agent"].append(uas[i])
            out["proxy"].append(proxies[i])
            out["referer"].append(referers[i])
            out["max_body_size"].append(mbs[i])
            out["timeout_ms"].append(tmo[i])
            if page is None:
                # failed request: counted, url dropped (crawler.go:230-234)
                out["status"].append(0)
                out["text"].append(None)
                out["lang"].append(None)
                out["warc_ts"].append(None)
                out["n_links"].append(0)
                out["n_links_total"].append(0)
                out["n_skipped"].append(0)
                out["next"].append([])
                out["elapsed_ms"].append(int((time.perf_counter() - t0) * 1000))
                continue
            html, lang, warc_ts = page
            body = html[: mbs[i]]  # per-request truncation BEFORE extraction (M7)
            hrefs, text = parse_page(body)  # links + text, ONE parse
            # resolve + re-validate inline; errors silently dropped
            children = []
            for href in hrefs:
                try:
                    children.append(_parse_url_cached(resolve_url(url, href)))
                except URLError:
                    continue
            out["status"].append(status)
            out["text"].append(text)
            out["lang"].append(lang)
            out["warc_ts"].append(warc_ts)
            out["n_links"].append(len(children))

            nxt = []
            n_total = n_skipped = 0
            if depth + 1 <= max_depth:  # F6 expansion gate
                for li, child in enumerate(children):
                    n_total += 1
                    if not in_scope(root, child.host, mode):  # F3
                        n_skipped += 1
                        continue
                    if not robots.allowed(uas[i], url):  # F4: parent url quirk
                        n_skipped += 1
                        continue
                    if not rule_filter.allow(child.root, child.path, child.url):  # F1/F2
                        n_skipped += 1
                        continue
                    nxt.append(
                        {
                            "url": child.url,
                            "hash": child.hash,
                            "host": child.host,
                            "root": child.root,
                            "link_idx": li,
                        }
                    )
            out["n_links_total"].append(n_total)
            out["n_skipped"].append(n_skipped)
            out["next"].append(nxt)
            out["elapsed_ms"].append(int((time.perf_counter() - t0) * 1000))

        return pa.table(out, schema=RESULT_SCHEMA)

    return fetch_group


def _group_vmax(roots: list[str], cfg: CrawlConfig) -> float:
    """Virtual politeness budget of one fetch group: wall seconds a
    really-paced crawl would need for the group's slowest root this round
    (``limiter.go:52-59`` token-bucket semantics on a virtual clock).

    A group owns ALL frontier rows of its roots EXCEPT salted hot roots,
    whose rows span k sub-partitions — a group sees only ~n/k of them, so
    its value understates the hot root's true budget. The driver
    compensates: it knows every hot root's exact round count and takes the
    max of this group-local vmax with the exact driver-side hot-root
    budget (``Crawler._hot_vsec``), so the reported metric is exact."""
    if cfg.politeness == "off":
        return 0.0
    counts: dict[str, int] = {}
    for r in roots:
        counts[r] = counts.get(r, 0) + 1
    vmax = 0.0
    for r, n in counts.items():
        rate, interval = cfg.rate_for_root(r)
        vmax = max(vmax, math.ceil(n / rate) * interval)
    return vmax


def make_fused_fetch_fn(
    index_dir: str,
    cfg: CrawlConfig,
    results_dir: str,
    metrics_dir: str,
    hot_roots: dict[str, int] | None = None,
):
    """The fused per-round hot stage: fetch + extract + results sink +
    metrics sidecar + candidate explode, all in ONE ``map_groups`` task
    per fetch partition — the round executes as a single streaming
    pipeline instead of four (fetch, metrics pass, results re-read,
    explode), which removes three pipeline launches and one full
    round-trip of the results through the object store.

    Side-effect sinks are safe under task retry: file names are
    deterministic per ``fetch_part`` and writes are tmp + atomic rename
    of identical (deterministic) content.
    """
    import json

    from wbot_ray.stages.explode import make_explode_fn

    if cfg.fetcher_factory is not None:  # pluggable Fetcher seam (§2.10)
        fetch_group = cfg.fetcher_factory(index_dir, cfg)
    else:
        fetch_group = make_fetch_group_fn(index_dir, cfg, hot_roots)
    explode = make_explode_fn(cfg)
    max_depth = cfg.max_depth
    on_response = cfg.on_response

    def fused(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if group.num_rows == 0:
            return explode(RESULT_SCHEMA.empty_table())
        part = int(group.column("fetch_part")[0].as_py())
        t0 = time.perf_counter()
        results = fetch_group(group)
        if on_response is not None:  # OnReponse equivalent (§2.10)
            results = on_response(results)
        t_fetch = time.perf_counter() - t0

        t0 = time.perf_counter()
        out_path = fsio.join(results_dir, f"part-{part:05d}.parquet")
        # combine_chunks: canonical single-chunk layout so the parquet
        # BYTES are a pure function of the logical content — identical
        # logical tables with different upstream chunking (cache-warm
        # retry runs concat differently) must rewrite identical files
        # for the retry contract (byte-level idempotency, test-pinned).
        # The nested `next` candidate lists are dropped from the FILE:
        # they exist for the in-memory explode below and nothing reads
        # them back (measured 44 s of a 184 cpu-s round spent
        # serializing them at bench scale); the counters
        # (n_links/n_links_total/n_skipped) keep the lineage audit.
        fsio.write_parquet_atomic(
            results.drop_columns(["next"]).combine_chunks(), out_path
        )
        t_write = time.perf_counter() - t0

        # success = any HTTP response (the reference publishes non-2xx
        # responses too — client.Do semantics); failure = transport
        # error (status 0). Sim-fetch statuses are only {0, 200}, so
        # this is identical there.
        ok = pc.sum(pc.cast(pc.greater(results.column("status"), 0), pa.int64())).as_py() or 0
        sidecar = {
            "n": results.num_rows,
            "ok": int(ok),
            "total_link": int(pc.sum(results.column("n_links_total")).as_py() or 0),
            "skipped": int(pc.sum(results.column("n_skipped")).as_py() or 0),
            "vmax": _group_vmax(group.column("root").to_pylist(), cfg),
            # per-part phase timings (fetch+extract vs results write) —
            # the task-level profile for straggler/IO analysis
            "sec_fetch": round(t_fetch, 4),
            "sec_write": round(t_write, 4),
        }
        fsio.write_json_atomic(sidecar, fsio.join(metrics_dir, f"part-{part:05d}.json"))

        # candidates: explode the in-memory results (never re-read from disk).
        # Depth gate already applied inside fetch (empty `next` rows vanish
        # in list_flatten); max_depth kept here only as a cheap short-circuit.
        if results.num_rows == 0 or (
            int(results.column("depth")[0].as_py()) + 1 > max_depth
        ):
            return explode(RESULT_SCHEMA.empty_table())
        return explode(results)

    return fused
