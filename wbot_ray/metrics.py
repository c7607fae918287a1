"""Metrics-monitor seam (reference ``MetricsMonitor``,
``pkg/api/wbot.go:55-66``, re-expressed batch-first).

The reference interface is seven per-request ``Inc*`` methods plus a
``Metrics()`` snapshot. In a streaming batch engine the natural
granularity is the ROUND: the driver computes the seven counters per
round anyway (fetch-sidecar sums + dedup survivors), so a monitor
receives one delta dict per round via ``on_round`` — same totals,
~10^6× fewer calls at crawl scale, and the monitor runs driver-side
(no per-task RPC). ``CrawlConfig(metrics_factory=...)`` wires it in.

Protocol a monitor must implement::

    on_round(round_id: int, counters: dict[str, int]) -> None
    metrics() -> dict[str, int]   # accumulated totals

``CounterMonitor`` below is the in-tree reference implementation (what
the Go default monitor does: accumulate and expose). An exporter
(StatsD, Prometheus pushgateway, a CSV log) subclasses it and overrides
``on_round`` — call ``super().on_round(...)`` to keep the totals.
"""

from __future__ import annotations

COUNTER_KEYS = (
    "total_requests",
    "successful_requests",
    "failed_requests",
    "total_link",
    "crawled_link",
    "skipped_link",
    "duplicated_link",
)


class CounterMonitor:
    """Accumulating monitor: the reference's default atomic counters
    (``metrics.go:8-17``) as one dict, fed per-round."""

    def __init__(self) -> None:
        self._totals: dict[str, int] = dict.fromkeys(COUNTER_KEYS, 0)
        self.rounds: list[tuple[int, dict[str, int]]] = []

    def on_round(self, round_id: int, counters: dict[str, int]) -> None:
        delta = {k: int(counters.get(k, 0)) for k in COUNTER_KEYS}
        for k, v in delta.items():
            self._totals[k] += v
        self.rounds.append((round_id, delta))

    def metrics(self) -> dict[str, int]:
        """Snapshot of accumulated totals (reference ``Metrics()``)."""
        return dict(self._totals)
