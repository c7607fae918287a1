"""Real-socket HTTP fetcher — the first thing a production user plugs
into the ``cfg.fetcher_factory`` seam.

Mirrors the reference HTTP client's request semantics
(``pkg/services/fetcher/http_client.go:55-145``):

* GET with per-request ``User-Agent`` and ``Referer`` headers
  (``http_client.go:92-94`` — the values the UA/referrer rotators
  stamped on the frontier row at seed time, inherited parent→child);
* per-request proxy (``http_client.go:95-97`` + ``newHTTPTransport``):
  the row's ``proxy`` column, applied for both http and https;
* per-request overall timeout (``http_client.go:60-61``): the row's
  ``timeout_ms`` column caps the socket ops of the fetch;
* body truncation at ``max_body_size`` bytes during the read — the
  ``io.CopyN`` limit (``http_client.go:117``), never buffering more;
* non-2xx responses are NOT transport errors: like Go's
  ``client.Do``, the body comes back with its real status code and its
  links are extracted and followed (``http_client.go:99-109``);
  transport errors (refused, DNS, timeout) are status 0 = failed
  request (``crawler.go:230-234``).

Everything downstream of the transport — truncation-before-extract,
one-pass link+text parse, scope/robots/rule gates, depth expansion,
politeness pacing (the token-bucket ``take`` happens BEFORE the socket
op, so real crawls pace real requests) — is the SAME code path as the
simulated index fetcher (``make_fetch_group_fn``), so an e2e crawl over
a local HTTP server emits byte-identical RESULT rows to the index
fetcher on the same pages (pinned by ``tests/test_httpfetch.py``).

Scale shape: the fetcher is still a per-``fetch_part`` group task —
politeness and hot-root salting work unchanged; at cluster scale each
task holds at most one in-flight connection per row sequentially (the
reference's per-worker loop), and parallelism comes from the partition
count, not per-task fan-out.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request

from wbot_ray.config import CrawlConfig
from wbot_ray.stages.fetch import make_fetch_group_fn

__all__ = ["make_http_fetcher", "http_fetch_one"]

# reference transport defaults (http_client.go:31-47 / config.go:13)
DEFAULT_TIMEOUT_MS = 10_000

# chunk size for deadline-aware body reads: small enough that a
# trickling server can't extend the fetch much past its deadline
# between checks, large enough to keep syscall overhead negligible
_READ_CHUNK = 64 * 1024


def _read_with_deadline(resp, max_body_size: int, deadline: float) -> bytes | None:
    """Read up to ``max_body_size`` bytes, aborting once the wall-clock
    ``deadline`` passes. urllib's ``timeout`` is per-socket-OPERATION —
    a server trickling one byte per second keeps ``read()`` alive
    forever — whereas the reference wraps the WHOLE request in
    ``context.WithTimeout`` (``http_client.go:60-61``). Chunked reads
    with a deadline check reproduce the overall-deadline semantics.
    Returns None when the deadline expired mid-body (transport error).

    Uses ``read1`` (at most ONE underlying socket read) when the
    response supports it — plain ``read(n)`` loops internally until n
    bytes arrive, which would let a trickling server run far past the
    deadline inside a single call."""
    read1 = getattr(resp, "read1", None)
    chunks: list[bytes] = []
    remaining = max_body_size
    while remaining > 0:
        if time.monotonic() > deadline:
            return None
        n = min(_READ_CHUNK, remaining)
        chunk = read1(n) if read1 is not None else resp.read(n)
        if not chunk:
            break
        chunks.append(chunk)
        remaining -= len(chunk)
    return b"".join(chunks)


def http_fetch_one(
    url: str,
    user_agent: str,
    referer: str,
    proxy: str,
    timeout_ms: int,
    max_body_size: int,
):
    """One GET over a real socket; returns ``(body, lang, warc_ts,
    status)`` or None on transport error. lang/warc_ts are None — a live
    fetch has no corpus annotations; downstream schema is nullable."""
    headers = {}
    if user_agent:
        headers["User-Agent"] = user_agent
    if referer:
        headers["Referer"] = referer
    req = urllib.request.Request(url, headers=headers, method="GET")
    handlers = []
    if proxy:
        # per-request proxy, both schemes (newHTTPTransport semantics)
        handlers.append(urllib.request.ProxyHandler({"http": proxy, "https": proxy}))
    else:
        # explicit no-proxy: ignore environment (reference uses
        # ProxyFromEnvironment only on the proxy transport path)
        handlers.append(urllib.request.ProxyHandler({}))
    opener = urllib.request.build_opener(*handlers)
    timeout = (timeout_ms or DEFAULT_TIMEOUT_MS) / 1000.0
    deadline = time.monotonic() + timeout  # overall request deadline
    try:
        with opener.open(req, timeout=timeout) as resp:
            # io.CopyN truncation + context.WithTimeout overall deadline
            body = _read_with_deadline(resp, max_body_size, deadline)
            if body is None:
                return None  # deadline expired mid-body → transport error
            return body, None, None, int(resp.status)
    except urllib.error.HTTPError as e:
        # 4xx/5xx: a response, not an error (client.Do semantics)
        body = None
        try:
            body = _read_with_deadline(e, max_body_size, deadline)
        except Exception:
            body = b""
        if body is None:
            return None
        return body, None, None, int(e.code)
    except Exception:
        return None  # transport error → failed request (status 0)


def make_http_fetcher(index_dir: str, cfg: CrawlConfig, hot_roots=None):
    """``fetcher_factory`` entry point: pass
    ``CrawlConfig(fetcher_factory=make_http_fetcher)`` and the crawl
    fetches every frontier row over a real socket instead of the
    parquet index (``index_dir`` is ignored). All politeness, filter,
    robots and depth semantics are shared with the built-in fetcher."""
    return make_fetch_group_fn(index_dir, cfg, hot_roots, fetch_one=http_fetch_one)
