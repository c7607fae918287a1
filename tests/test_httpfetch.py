"""Real-socket HTTP fetcher (stages/httpfetch.py) against an
in-process HTTP server — no external network.

The server speaks proxy-style GET (absolute URL in the request line),
so the crawl uses REAL hostnames (validated by the TLD allowlist like
any crawl) while every socket lands on 127.0.0.1 — which also makes the
per-request ``proxy`` column a load-bearing, tested input, matching the
reference's per-request proxy transport
(``pkg/services/fetcher/http_client.go:95-97,145-171``).
"""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wbot_ray.config import CrawlConfig
from wbot_ray.driver import Crawler
from wbot_ray.html import extract_text
from wbot_ray.stages.httpfetch import http_fetch_one, make_http_fetcher

PAGES: dict[str, bytes] = {
    "http://alpha-site.com/p/0": (
        b'<html><body><a href="/p/1">a</a> <a href="/p/2">b</a>'
        b' <a href="http://beta-site.org/p/0">x</a>'
        b"<p>alpha zero body text</p></body></html>"
    ),
    "http://alpha-site.com/p/1": (
        b'<html><body><a href="/p/2">c</a> <a href="/p/3">d</a>'
        b"<p>alpha one body text</p></body></html>"
    ),
    "http://alpha-site.com/p/2": b"<html><body><p>alpha two leaf</p></body></html>",
    "http://alpha-site.com/p/3": (
        b'<html><body><a href="/p/0">e</a><p>alpha three cycles</p></body></html>'
    ),
    "http://beta-site.org/p/0": (
        b'<html><body><a href="/p/1">f</a><p>beta zero body</p></body></html>'
    ),
    "http://beta-site.org/p/1": b"<html><body><p>beta one leaf</p></body></html>",
}
SEEDS = ["http://alpha-site.com/p/0", "http://beta-site.org/p/0"]


class _Handler(BaseHTTPRequestHandler):
    seen: list[tuple[str, str | None, str | None]] = []

    def do_GET(self):  # noqa: N802 (http.server API)
        url = self.path
        if not url.startswith("http"):
            url = "http://alpha-site.com" + url  # direct (non-proxy) form
        type(self).seen.append(
            (url, self.headers.get("User-Agent"), self.headers.get("Referer"))
        )
        if url.endswith("/slow"):
            time.sleep(0.6)
            body = b"<html><body><p>slow page</p></body></html>"
            code = 200
        elif url.endswith("/trickle"):
            # headers arrive fast, then the body trickles: each chunk is
            # inside any per-socket-op timeout, but the WHOLE body takes
            # ~2s — only an overall wall-clock deadline catches it
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(20 * 100))
            self.end_headers()
            try:
                for _ in range(20):
                    self.wfile.write(b"x" * 100)
                    self.wfile.flush()
                    time.sleep(0.1)
            except Exception:
                pass  # client hung up at its deadline
            return
        elif url == "http://alpha-site.com/robots.txt":
            body = b"User-agent: *\nDisallow: /p/1\n"
            code = 200
        else:
            body = PAGES.get(url)
            code = 200 if body is not None else 404
            if body is None:
                body = b'<html><body><a href="/p/0">back</a>not found</body></html>'
        self.send_response(code)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    """The same pages as a parquet corpus for the index fetcher."""
    d = tmp_path_factory.mktemp("httpcorpus")
    p = str(d / "pages.parquet")
    urls = sorted(PAGES)
    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(
                    [1_700_000_000_000_000 + i for i in range(len(urls))],
                    pa.timestamp("us"),
                ),
                "html": pa.array([PAGES[u] for u in urls], pa.binary()),
                "text": pa.array([extract_text(PAGES[u]) for u in urls], pa.string()),
                "lang": pa.array(["en"] * len(urls), pa.string()),
            }
        ),
        p,
    )
    return p


def _cfg(**kw) -> CrawlConfig:
    return CrawlConfig(
        max_depth=3,
        num_buckets=2,
        seen_shards=2,
        user_agents=["TestUA/1.0"],
        referrers=["http://referrer-site.com/"],
        **kw,
    )


class TestHttpFetchOne:
    def test_basic_get_and_headers(self, server):
        _Handler.seen.clear()
        body, lang, ts, status = http_fetch_one(
            f"{server}/p/0", "UA-X", "http://r.example/", "", 5000, 1 << 20
        )
        assert status == 200 and body == PAGES["http://alpha-site.com/p/0"]
        assert lang is None and ts is None
        assert _Handler.seen[-1] == ("http://alpha-site.com/p/0", "UA-X", "http://r.example/")

    def test_max_body_truncation(self, server):
        body, _, _, status = http_fetch_one(f"{server}/p/0", "", "", "", 5000, 10)
        assert status == 200 and body == PAGES["http://alpha-site.com/p/0"][:10]

    def test_timeout_consumed(self, server):
        # 100 ms budget vs a 600 ms page: transport error (status 0 path)
        assert http_fetch_one(f"{server}/slow", "", "", "", 100, 1 << 20) is None
        got = http_fetch_one(f"{server}/slow", "", "", "", 5000, 1 << 20)
        assert got is not None and got[3] == 200

    def test_trickling_body_hits_overall_deadline(self, server):
        # urllib's timeout is per-socket-op; a server trickling 100 B
        # every 100 ms never trips it. The overall wall-clock deadline
        # (reference context.WithTimeout, http_client.go:60-61) must
        # abort the fetch ~at timeout_ms, not after the full 2 s body.
        t0 = time.monotonic()
        assert http_fetch_one(f"{server}/trickle", "", "", "", 500, 1 << 20) is None
        assert time.monotonic() - t0 < 1.5
        # generous budget: the same trickling body completes fine
        got = http_fetch_one(f"{server}/trickle", "", "", "", 10_000, 1 << 20)
        assert got is not None and got[3] == 200 and len(got[0]) == 2000

    def test_non_2xx_is_a_response_not_an_error(self, server):
        # client.Do semantics: 404 body + links still come back
        body, _, _, status = http_fetch_one(f"{server}/nope", "", "", "", 5000, 1 << 20)
        assert status == 404 and b"/p/0" in body

    def test_proxy_consumed(self, server):
        # absolute-form GET through the proxy: real hostname, local socket
        body, _, _, status = http_fetch_one(
            "http://alpha-site.com/p/2", "", "", server, 5000, 1 << 20
        )
        assert status == 200 and body == PAGES["http://alpha-site.com/p/2"]
        # dead proxy -> transport error, NOT a direct fallback
        assert (
            http_fetch_one("http://alpha-site.com/p/2", "", "", "http://127.0.0.1:9/", 500, 1 << 20)
            is None
        )


class TestHttpCrawlE2E:
    def test_same_results_as_index_fetcher(
        self, server, corpus_path, tmp_path, ray_session
    ):
        """The north-star check: a crawl over real sockets emits the
        SAME visited set, crawl order, and byte-identical extracted text
        as the index fetcher on the same pages."""
        _Handler.seen.clear()
        base = Crawler(_cfg(), workdir=str(tmp_path / "idx")).crawl(
            seeds=SEEDS, pages_path=corpus_path
        )
        http = Crawler(
            _cfg(fetcher_factory=make_http_fetcher, proxies=[server]),
            workdir=str(tmp_path / "http"),
        ).crawl(seeds=SEEDS, pages_path=corpus_path)

        tb = base.results_table().sort_by("crawl_ord")
        th = http.results_table().sort_by("crawl_ord")
        assert tb.column("url").to_pylist() == th.column("url").to_pylist()
        assert tb.column("depth").to_pylist() == th.column("depth").to_pylist()
        # byte-identical extracted text per url (the input_hint invariant)
        assert tb.column("text").to_pylist() == th.column("text").to_pylist()
        assert set(th.column("status").to_pylist()) == {200}
        assert base.metrics_total() == http.metrics_total()
        # every socket request carried the rotator-stamped headers
        assert _Handler.seen and all(ua == "TestUA/1.0" for _, ua, _ in _Handler.seen)
        assert all(ref == "http://referrer-site.com/" for _, _, ref in _Handler.seen)

    def test_strict_robots_fetched_over_http(
        self, server, corpus_path, tmp_path, ray_session
    ):
        """fetch_robots_http populates the strict gate from real
        sockets, and the resulting crawl matches a strict crawl given
        the same robots bodies by hand (index fetcher). The gate tests
        the PARENT url (reference crawler.go:257 quirk, preserved in
        strict mode): /p/1 is still visited, but nothing expands FROM
        it, so alpha /p/3 (reachable only via /p/1) never appears."""
        from wbot_ray.robots import fetch_robots_http

        bodies = fetch_robots_http(
            ["alpha-site.com", "beta-site.org"], proxy=server, scheme="http"
        )
        assert set(bodies) == {"alpha-site.com"}  # beta has no robots.txt
        assert "Disallow: /p/1" in bodies["alpha-site.com"]

        http = Crawler(
            _cfg(
                mode="strict",
                robots_bodies=bodies,
                fetcher_factory=make_http_fetcher,
                proxies=[server],
            ),
            workdir=str(tmp_path / "http_strict"),
        ).crawl(seeds=SEEDS, pages_path=corpus_path)
        base = Crawler(
            _cfg(mode="strict", robots_bodies=dict(bodies)),
            workdir=str(tmp_path / "idx_strict"),
        ).crawl(seeds=SEEDS, pages_path=corpus_path)

        got = http.results_table().sort_by("crawl_ord").column("url").to_pylist()
        want = base.results_table().sort_by("crawl_ord").column("url").to_pylist()
        assert got == want
        assert "http://alpha-site.com/p/1" in got  # visited...
        assert "http://alpha-site.com/p/3" not in got  # ...but never expanded

    def test_cli_http_fetch(self, server, corpus_path, tmp_path):
        """``python -m wbot_ray --http-fetch --proxy`` end to end (own
        Ray session in a subprocess, like the ray-job-submit path)."""
        import json
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        p = subprocess.run(
            [
                sys.executable, "-m", "wbot_ray",
                "--pages", corpus_path,
                "--seeds", *SEEDS,
                "--workdir", str(tmp_path / "cli_http"),
                "--max-depth", "3", "--num-buckets", "2", "--seen-shards", "2",
                "--http-fetch", "--proxy", server,
            ],
            capture_output=True, text=True, timeout=280,
            env=dict(os.environ, PYTHONPATH=repo), cwd=repo,
        )
        assert p.returncode == 0, p.stderr[-2000:]
        out = json.loads(p.stdout.strip().splitlines()[-1])
        m = out["metrics"]
        # >=: the seed-revisit quirk (crawler.go:173-194, preserved)
        # re-fetches a seed linked back from /p/3
        assert m["successful_requests"] >= len(PAGES)  # all pages reached
        assert m["failed_requests"] == 0

    def test_cli_robots_from_http_uses_seed_scheme(
        self, server, corpus_path, tmp_path
    ):
        """``--robots-from-http`` with http:// seeds must fetch
        robots.txt over http (each seed's own scheme), not a failing
        https attempt that silently degrades strict mode to allow-all
        (ADVICE r3: the CLI wiring was untested)."""
        import json
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        p = subprocess.run(
            [
                sys.executable, "-m", "wbot_ray",
                "--pages", corpus_path,
                "--seeds", *SEEDS,
                "--workdir", str(tmp_path / "cli_robots"),
                "--max-depth", "3", "--num-buckets", "2", "--seen-shards", "2",
                "--mode", "strict", "--robots-from-http",
                "--http-fetch", "--proxy", server,
            ],
            capture_output=True, text=True, timeout=280,
            env=dict(os.environ, PYTHONPATH=repo), cwd=repo,
        )
        assert p.returncode == 0, p.stderr[-2000:]
        out = json.loads(p.stdout.strip().splitlines()[-1])
        m = out["metrics"]
        # alpha's robots (Disallow: /p/1) was fetched over http and
        # ENFORCED: /p/1 never expands, so /p/3 (only reachable via
        # /p/1) is never requested — with allow-all every page is hit
        assert 0 < m["successful_requests"] < len(PAGES)
        # the unfetchable host (beta has no robots.txt) fell back to
        # allow-all and was crawled
        assert m["successful_requests"] >= 4

    def test_404_is_published_and_expanded(self, server, tmp_path, ray_session):
        """client.Do semantics end to end: a 404 in the frontier counts
        as a successful request (a response, not a transport error),
        appears in the results stream with its real status, and its
        extracted links are followed."""
        import pyarrow.parquet as _pq

        # gamma links to a path the server 404s; the 404 body links
        # back to /p/0 (the _Handler not-found body)
        gpages = {
            "http://alpha-site.com/p/0": PAGES["http://alpha-site.com/p/0"],
            "http://alpha-site.com/gone": b"",  # only so the index builds
        }
        p = str(tmp_path / "gpages.parquet")
        _pq.write_table(
            pa.table(
                {
                    "url": pa.array(sorted(gpages), pa.string()),
                    "warc_ts": pa.array([0, 1], pa.timestamp("us")),
                    "html": pa.array([gpages[u] for u in sorted(gpages)], pa.binary()),
                    "text": pa.array(["", ""], pa.string()),
                    "lang": pa.array(["en", "en"], pa.string()),
                }
            ),
            p,
        )
        run = Crawler(
            _cfg(fetcher_factory=make_http_fetcher, proxies=[server]),
            workdir=str(tmp_path / "run404"),
        ).crawl(seeds=["http://alpha-site.com/gone"], pages_path=p)
        t = run.results_table()
        by_url = {u: s for u, s in zip(t.column("url").to_pylist(), t.column("status").to_pylist())}
        assert by_url["http://alpha-site.com/gone"] == 404  # published
        assert by_url["http://alpha-site.com/p/0"] == 200  # its link followed
        m = run.metrics_total()
        assert m["failed_requests"] == 0  # a 404 is not a transport error

    def test_dead_proxy_fails_all(self, corpus_path, tmp_path, ray_session):
        run = Crawler(
            _cfg(fetcher_factory=make_http_fetcher, proxies=["http://127.0.0.1:9/"], timeout_ms=300),
            workdir=str(tmp_path / "deadproxy"),
        ).crawl(seeds=SEEDS, pages_path=corpus_path)
        m = run.metrics_total()
        assert m["successful_requests"] == 0
        assert m["failed_requests"] == m["total_requests"] == len(SEEDS)
