"""wbot_ray — a Ray-Data-native web-crawl / data-processing engine.

A from-scratch rebuild of the query & data-processing capabilities of the
``twiny/wbot`` Go crawler (reference, read-only) on top of ``ray.data``:

- frontier rounds are ``ray.data.Dataset`` pipelines of ``map_batches`` over
  zero-copy Arrow batches,
- stateful stages (URL-seen set, politeness) are actor pools,
- wide steps (dedup, ordering) are ``groupby`` / ``sort`` shuffles.

Nothing here is a port: the reference's goroutine/queue/channel execution is
replaced by Ray Data's streaming executor; only the *observable semantics*
(URL canonicalization, filter precedence, BFS crawl order, metrics counters)
are replicated. Reference citations use ``file:line`` into ``/root/reference``.
"""

from wbot_ray.config import CrawlConfig, FilterRule, RateLimit

__all__ = ["CrawlConfig", "FilterRule", "RateLimit"]
__version__ = "0.1.0"
