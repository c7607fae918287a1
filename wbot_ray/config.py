"""Crawl configuration.

Mirrors the reference's functional-options surface
(``/root/reference/option.go:14-63`` + defaults ``config.go:10-66``) as a
plain dataclass. ``Param`` rotation (user-agents / referrers / proxies,
``crawler.go:173-194``) is reproduced deterministically: seed ``i`` gets
``user_agents[i % len(user_agents)]`` — exactly what the reference's
round-robin spinner yields over the seed sequence.
"""

from __future__ import annotations

from dataclasses import dataclass, field

DEFAULT_USER_AGENT = "WBotRay/0.1 (+ray-data rebuild)"
DEFAULT_REFERRER = "https://www.google.com/search"
DEFAULT_MAX_BODY_SIZE = 5 * 1024 * 1024  # config.go:14
DEFAULT_TIMEOUT_MS = 10_000  # config.go:13
DEFAULT_RATE_LIMIT = "10/1s"  # limiter.go:13


@dataclass
class FilterRule:
    """Per-root allow/deny regex rule (``pkg/api/wbot.go:98-102``).
    ``hostname == "*"`` is the wildcard fallback (``filter.go:35-41``)."""

    hostname: str
    allow: list[str] = field(default_factory=list)
    disallow: list[str] = field(default_factory=list)


@dataclass
class RateLimit:
    """Per-root rate "N/<int><s|m|h>" (``pkg/api/wbot.go:104-107``)."""

    hostname: str
    rate: str


def parse_rate_limit(s: str) -> tuple[int, float]:
    """Parse "N/<int><s|m|h>" → (requests, interval_seconds); any malformed
    input falls back to the default 10/1s (``limiter.go:61-90``)."""
    default = (10, 1.0)
    parts = s.split("/")
    if len(parts) != 2:
        return default
    try:
        rate = int(parts[0])
    except ValueError:
        return default
    tail = parts[1]
    if not tail:
        return default
    try:
        value = int(tail[:-1])
    except ValueError:
        return default
    unit = tail[-1]
    if unit in "sS":
        return rate, float(value)
    if unit in "mM":
        return rate, value * 60.0
    if unit in "hH":
        return rate, value * 3600.0
    return default


@dataclass
class CrawlConfig:
    """All knobs of the crawl pipeline. Defaults match the reference
    (``config.go:29-66``): ``max_depth=10``, 5 MiB body cap, 10 s timeout.

    ``mode``:
      * ``"fidelity"`` — replicate the reference's observable quirks:
        substring scope check (``crawler.go:252``), always-allow robots
        (``robot.go:32-41`` with its never-fed cache), seeds not pre-marked
        visited (``crawler.go:173-194``).
      * ``"strict"`` — the same pipeline with proper suffix-match scoping
        and real per-host robots.txt gating.

    ``politeness``:
      * ``"virtual"`` — per-root budget accounting on a virtual clock
        (deterministic; no sleeping; reported in metrics).
      * ``"real"``    — fetch actors actually pace requests per root.
      * ``"off"``     — no politeness accounting.
    """

    max_depth: int = 10
    max_body_size: int = DEFAULT_MAX_BODY_SIZE
    timeout_ms: int = DEFAULT_TIMEOUT_MS
    user_agents: list[str] = field(default_factory=lambda: [DEFAULT_USER_AGENT])
    referrers: list[str] = field(default_factory=lambda: [DEFAULT_REFERRER])
    proxies: list[str] = field(default_factory=list)
    rate_limits: list[RateLimit] = field(default_factory=list)
    filter_rules: list[FilterRule] = field(default_factory=list)
    mode: str = "fidelity"  # "fidelity" | "strict"
    politeness: str = "virtual"  # "virtual" | "real" | "off"
    robots_bodies: dict = field(default_factory=dict)  # host -> robots.txt (strict mode)

    # Ray-execution knobs (no reference equivalent; scale levers)
    fetch_concurrency: int | None = None  # actors in the fetch pool
    num_buckets: int = 32  # web-index buckets = fetch-join partitions
    seen_shards: int = 8  # URL-seen set actor shards
    # approximate-membership fast path per shard: "cuckoo" (default —
    # ~2.1 B/entry, 2-bucket probes) or "bloom" (~1.25 B/entry, k=7
    # probes, no overflow cliff). Either way an exact digest set backs
    # the filter, so the visited set is identical bit-for-bit.
    seen_filter: str = "cuckoo"
    batch_size: int = 1024  # rows per fetch/extract batch
    # memory guard on the distributed round's exchange width: one block
    # carries at most this many frontier rows (its candidate explode is
    # ~10x that, still tens of MB of slim rows). Width otherwise stays
    # at 4 tasks/CPU — the bench10x run showed exchange fixed cost grows
    # superlinearly with partition count (852 partitions = 123 s of a
    # 126 s round), so width must track the executor, not the row count.
    max_block_rows: int = 65_536
    hot_host_threshold: int = 100_000  # frontier rows per root before salting
    # next-frontier ordering: below this row count the driver k-way merges
    # the (per-shard pre-sorted) candidates itself — a distributed sort of
    # a few-MB frontier is pure shuffle overhead; above it, the full
    # ``Dataset.sort`` + block-offset rank assignment path runs
    driver_order_threshold: int = 1_000_000
    # rounds with at most this many frontier rows run entirely in the
    # driver process (same stage functions, no Ray pipeline): launching a
    # distributed pipeline for a 200-row seed round costs ~3 s of pure
    # overhead. 0 disables (always distributed).
    local_round_threshold: int = 4096

    # -- user-extension surface (reference option.go:14-63 + OnReponse,
    #    crawler.go:148-165, re-expressed Ray-Data-first) -------------
    # priority_fn: frontier-scheduling priority — the north rule's
    # "priority queue" seam made explicit. Given a candidate-frontier
    # Arrow table (FRONTIER_SCHEMA columns incl. ord64), returns an
    # orderable array: LOWER fires first within the round (ties broken
    # by ord64, the BFS rank). Depth ordering always dominates — rounds
    # stay strictly by depth ("depth-prioritized frontier"), and the
    # visited SET is unaffected (dedup precedes ordering); only the
    # within-round fetch order / crawl_ord change. None = pure BFS
    # (the reference's FIFO order, crawler.go:195-291).
    priority_fn: object | None = None
    # on_response: batch UDF applied to each fetch group's RESULT table
    # (the Response stream equivalent) before it is written — must return
    # a table with at least the RESULT_SCHEMA columns. Runs inside the
    # fetch task: zero extra passes.
    on_response: object | None = None
    # fetcher_factory: swap the fetch implementation (reference Fetcher
    # seam, pkg/api/wbot.go:38-41). Called as
    # ``fetcher_factory(index_dir, cfg) -> (group: pa.Table) -> pa.Table``
    # returning RESULT_SCHEMA rows; None = built-in index-lookup fetcher.
    # A real-socket implementation ships in-tree:
    # ``wbot_ray.stages.httpfetch.make_http_fetcher`` (per-request
    # UA/Referer/proxy/timeout_ms/max_body_size, http_client.go parity).
    fetcher_factory: object | None = None
    # store_factory: swap the URL-seen store (reference Store seam,
    # pkg/api/wbot.go:43-46 via WithStore, option.go:49-53). Called as
    # ``store_factory(cfg) -> store`` where the store implements the
    # ``wbot_ray.state.seen.SeenSet`` protocol: ``.shards`` (actor
    # handles with idempotent per-round ``check_and_set``),
    # ``flush_deltas_async`` / ``flush_deltas``, ``restore``,
    # ``total_size``, ``shutdown``. None = built-in sharded cuckoo+exact
    # actor pool.
    store_factory: object | None = None
    # queue_factory: swap the frontier (the reference Queue seam,
    # pkg/api/wbot.go:48-53 via WithQueue, option.go:54-58). Called as
    # ``queue_factory(workdir, cfg) -> queue`` implementing the
    # ``wbot_ray.state.frontier.ParquetFrontier`` protocol (push = write
    # round d+1, pop = read round d). None = built-in Parquet rounds.
    queue_factory: object | None = None
    # metrics_factory: swap-in metrics monitor (reference MetricsMonitor,
    # pkg/api/wbot.go:55-66). Called once per crawl as
    # ``metrics_factory() -> monitor``; after every round the driver
    # calls ``monitor.on_round(round_id, counters)`` with the SAME seven
    # reference counters the manifest records (the batch-granular
    # re-expression of the per-request ``Inc*`` methods: one delta dict
    # per round, identical totals), and ``monitor.metrics()`` returns
    # the accumulated totals (the reference's ``Metrics()``). None =
    # counters go to the manifest/sidecars only. A StatsD/Prometheus
    # exporter plugs in here without post-processing the manifest;
    # ``wbot_ray.metrics.CounterMonitor`` is the in-tree reference
    # implementation.
    metrics_factory: object | None = None
    # log_level: level name for the "wbot_ray" logger tree (reference
    # WithLogLevel, option.go:59-63): "debug" | "info" | "warning" |
    # "error" | "critical". None = leave logging config untouched.
    log_level: str | None = None

    def __post_init__(self) -> None:
        if self.max_depth <= 0:  # config.go:30-32
            self.max_depth = 10
        if not self.user_agents:
            self.user_agents = [DEFAULT_USER_AGENT]
        # fail FAST on malformed filter regexes: the reference takes
        # pre-compiled *regexp.Regexp (can't be invalid); string patterns
        # must not explode later inside every fetch task
        import re as _re

        for rule in self.filter_rules:
            for pat in list(rule.allow) + list(rule.disallow):
                try:
                    _re.compile(pat)
                except _re.error as e:
                    raise ValueError(
                        f"invalid filter regex {pat!r} for host {rule.hostname!r}: {e}"
                    ) from None

    def user_agent_for_seed(self, seed_ord: int) -> str:
        return self.user_agents[seed_ord % len(self.user_agents)]

    def proxy_for_seed(self, seed_ord: int) -> str:
        if not self.proxies:
            return ""
        return self.proxies[seed_ord % len(self.proxies)]

    def referrer_for_seed(self, seed_ord: int) -> str:
        if not self.referrers:
            return ""
        return self.referrers[seed_ord % len(self.referrers)]

    def rate_for_root(self, root: str) -> tuple[int, float]:
        """Token-bucket (rate, interval_s) for a root; wildcard fallback,
        default 10/1s (``limiter.go:22-59``)."""
        table = {rl.hostname: rl.rate for rl in self.rate_limits}
        if root in table:
            return parse_rate_limit(table[root])
        if "*" in table:
            return parse_rate_limit(table["*"])
        return parse_rate_limit(DEFAULT_RATE_LIMIT)
