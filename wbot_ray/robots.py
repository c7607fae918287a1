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

__all__ = ["RobotsGate"]


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
