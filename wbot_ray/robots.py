"""robots.txt gating.

The reference's robot manager (``/root/reference/robot.go``) keys its cache
by the *full URL string* (``robot.go:33``, a "Simplification" per its own
comment), tests the **parent** URL rather than the candidate link
(``crawler.go:257``), and nothing ever calls ``AddRobotsTxt`` — so its
observable behavior is *always allow*. Fidelity mode reproduces exactly
that. Strict mode implements a real per-host gate with a broadcastable
rules table (host → robots.txt body), matched with the stdlib parser.

The rules table is a small dict loaded once per actor/worker (broadcast via
closure capture / ``ray.put``), never re-shipped per batch.
"""

from __future__ import annotations

from urllib.parse import urlsplit
from urllib.robotparser import RobotFileParser

__all__ = ["RobotsGate", "fetch_robots_http"]


def fetch_robots_http(
    hosts: list[str],
    user_agent: str = "",
    proxy: str = "",
    timeout_ms: int = 5000,
    scheme: str = "https",
    max_body: int = 512 * 1024,
    schemes: dict[str, str] | None = None,
) -> dict[str, str]:
    """Populate a strict-mode ``robots_bodies`` table over real sockets:
    one ``GET {scheme}://host/robots.txt`` per host (Ray-parallel, via
    the same transport as ``stages.httpfetch``), keeping only 200
    responses — hosts without a fetchable robots.txt stay absent, which
    the gate treats as allow-all (the robots RFC default). The result is
    the small broadcast dict ``CrawlConfig(robots_bodies=...)`` expects;
    at cluster scale the fetch is one bounded task per DISTINCT host,
    not per url. ``schemes`` overrides the scheme per host (so http://
    seeds fetch robots over http, not a failing https attempt); hosts
    whose robots.txt could not be fetched are logged, making the
    allow-all fallback visible instead of silent."""
    import logging

    import ray

    from wbot_ray.stages.httpfetch import http_fetch_one

    @ray.remote
    def one(h: str, sch: str):
        got = http_fetch_one(
            f"{sch}://{h}/robots.txt", user_agent, "", proxy, timeout_ms, max_body
        )
        if got is None or got[3] != 200:
            return h, None
        return h, got[0].decode("utf-8", "replace")

    per_host = schemes or {}
    uniq = list(dict.fromkeys(hosts))
    pairs = ray.get([one.remote(h, per_host.get(h, scheme)) for h in uniq])
    missing = [h for h, body in pairs if body is None]
    if missing:
        logging.getLogger("wbot_ray").warning(
            "robots.txt unfetchable for %d host(s) (strict gate falls back "
            "to allow-all for them): %s",
            len(missing),
            ", ".join(missing[:10]),
        )
    return {h: body for h, body in pairs if body is not None}


class RobotsGate:
    def __init__(self, mode: str = "fidelity", robots_bodies: dict[str, str] | None = None) -> None:
        """``robots_bodies``: host → robots.txt content (strict mode only)."""
        self.mode = mode
        self._parsers: dict[str, RobotFileParser] = {}
        if mode == "strict":
            for host, body in (robots_bodies or {}).items():
                p = RobotFileParser()
                p.parse(body.splitlines())
                self._parsers[host] = p

    def allowed(self, user_agent: str, url: str) -> bool:
        """Is ``url`` fetchable for ``user_agent``? Fidelity: always True
        (matches the reference's never-populated cache, ``robot.go:35-38``).
        Strict: real per-host match; hosts without a robots.txt allow."""
        if self.mode != "strict":
            return True
        host = urlsplit(url).netloc
        p = self._parsers.get(host)
        if p is None:
            return True
        return p.can_fetch(user_agent, url)
