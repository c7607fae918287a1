"""URL parsing, canonicalization and hashing.

Replicates the observable semantics of the reference's URL layer
(``/root/reference/pkg/api/wbot.go``):

- ``parse_url``      ~ Go ``url.Parse`` + scheme/TLD validation (`wbot.go:132-164`)
- ``hash_link``      ~ ``hashLink`` canonical sha256 (`wbot.go:219-238`)
- ``registrable_domain`` ~ ``publicsuffix.Domain`` + TLD allowlist
  (`wbot.go:198-217`)
- ``resolve_url``    ~ ``Request.ResolveURL`` (`wbot.go:110-123`)
- ``go_url_string``  ~ Go ``url.URL.String()`` serialization (used by the
  filter, which matches regexes against the serialized URL, `filter.go:45,51`).

Fidelity notes (all load-bearing for URL-seen identity):

* Go's ``url.Parse`` stores a decoded ``Path`` plus ``RawPath`` (the original
  escaped spelling, kept only when it differs from ``escape(Path)``).
  ``URL.String()`` re-emits ``RawPath`` when it is still a valid encoding of
  ``Path``. Consequence: ``hashLink`` collapses *double*-encoded paths
  (``%2541`` → ``A``) but leaves *single*-encoded spellings (``%41``) as
  their own identity — we model RawPath to reproduce exactly that.
* ``hashLink`` (`wbot.go:219-238`): drop scheme, strip leading ``www.`` from
  host, ``PathUnescape`` the already-decoded path (the double-decode),
  serialize, trim trailing ``/``, trim leading ``//``, sha256-hex.

Everything in this module is a pure function — safe to call from vectorized
``map_batches`` UDFs on any worker.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import lru_cache
from importlib import resources
from urllib.parse import urljoin, urlsplit

__all__ = [
    "ParsedURL",
    "URLError",
    "parse_url",
    "hash_link",
    "registrable_domain",
    "resolve_url",
    "go_url_string",
    "tld_allowlist",
    "display_url",
]


def display_url(link: str) -> str:
    """Log-display form of a URL: truncated to 64 BYTES (M6 — the
    reference's ``ParsedURL.String``, ``pkg/api/wbot.go:124-130``,
    slices the Go string, i.e. bytes). Canonical URLs here are
    %-escaped ASCII (``go_url_string``), so byte and character
    truncation coincide; non-ASCII input still truncates on the byte
    boundary like Go, dropping any split codepoint."""
    b = link.encode("utf-8")
    if len(b) <= 64:
        return link
    return b[:64].decode("utf-8", "ignore")


class URLError(ValueError):
    """Raised when a URL fails parsing/validation (maps to the reference's
    error returns from ``NewURL`` / ``Hostname``)."""


@lru_cache(maxsize=1)
def tld_allowlist() -> frozenset[str]:
    """The 451-entry TLD allowlist the reference embeds (same data as
    ``pkg/api/tlds.json``, stored here as one TLD per line)."""
    data = resources.files("wbot_ray.data").joinpath("tlds.txt").read_text()
    return frozenset(line.strip() for line in data.splitlines() if line.strip())


# Full Mozilla Public Suffix List for eTLD+1 extraction — the same data
# publicsuffix-go embeds for the reference's ``publicsuffix.Domain``
# (``wbot.go:143-146``). ``public_suffix_list.dat`` is the public
# MPL-2.0-licensed data file (ICANN + private sections, like
# publicsuffix-go's DefaultList with DefaultFindOptions).


def _idna_ascii(rule: str) -> str | None:
    """Punycode (IDNA) form of a PSL rule, label-by-label; None when a
    label can't be encoded. Hosts reaching the engine are ASCII (Go's
    ``url.Hostname()`` of a fetched URL), so unicode rules are indexed by
    their ASCII form too."""
    try:
        labels = [
            lb if all(ord(c) < 128 for c in lb) else lb.encode("idna").decode("ascii")
            for lb in rule.split(".")
        ]
    except (UnicodeError, UnicodeDecodeError):
        return None
    return ".".join(labels)


@lru_cache(maxsize=1)
def _psl_rules() -> tuple[frozenset, frozenset, frozenset]:
    """``(exact, wildcard_bases, exception_suffixes)`` parsed from the
    embedded PSL. ``exception_suffixes`` maps a matching exception rule to
    its public suffix (the rule minus its leftmost label) implicitly: the
    stored string is the full rule; the matcher derives the suffix."""
    data = resources.files("wbot_ray.data").joinpath("public_suffix_list.dat").read_text(
        encoding="utf-8"
    )
    exact, wild, exc = set(), set(), set()
    for line in data.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        rule = line.split()[0].lower()
        if rule.startswith("!"):
            bucket, rule = exc, rule[1:]
        elif rule.startswith("*."):
            bucket, rule = wild, rule[2:]
        else:
            bucket = exact
        bucket.add(rule)
        if any(ord(c) >= 128 for c in rule):
            a = _idna_ascii(rule)
            if a is not None:
                bucket.add(a)
    return frozenset(exact), frozenset(wild), frozenset(exc)


def _public_suffix_label_count(labels: list[str]) -> int:
    """Number of labels in the public suffix per the PSL algorithm
    (https://publicsuffix.org/list/): an exception rule prevails; else the
    longest matching rule; else the default rule ``*`` (last label). A
    wildcard ``*.base`` consumes one extra host label."""
    exact, wild, exc = _psl_rules()
    n = len(labels)
    best = 1  # default rule "*"
    for i in range(n):
        s = ".".join(labels[i:])
        if s in exc:
            # exception: public suffix = the rule minus its leftmost label
            return n - i - 1
        if s in exact and n - i > best:
            best = n - i
        if i > 0 and s in wild and n - i + 1 > best:
            best = n - i + 1
    return best


# --- Go-compatible percent-escaping -------------------------------------
# Mirrors net/url shouldEscape for encodePath / encodeFragment so that
# go_url_string serializes the same bytes Go's URL.String() would.

_UNRESERVED = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_.~")
_PATH_SAFE = _UNRESERVED | set("$&+,/:;=@")  # '?' and '#' escape in path mode
_FRAGMENT_SAFE = _UNRESERVED | set("$&+,/:;=?@!()*")


def _escape(s: str, safe: set[str]) -> str:
    # surrogateescape: round-trip raw non-UTF-8 bytes exactly like Go,
    # whose strings are byte slices ("%80" decodes to byte 0x80 and must
    # re-escape to "%80", never crash)
    out = []
    for b in s.encode("utf-8", "surrogateescape"):
        c = chr(b)
        out.append(c if c in safe else "%%%02X" % b)
    return "".join(out)


def _unescape(s: str) -> str:
    """Go ``unescape(s, encodePath)`` / ``PathUnescape``: decode every %XX;
    raise URLError on malformed sequences; ``+`` is left alone."""
    if "%" not in s:
        return s
    raw = bytearray()
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%":
            if i + 3 > n:
                raise URLError(f"invalid URL escape {s[i:]!r}")
            hx = s[i + 1 : i + 3]
            try:
                raw.append(int(hx, 16))
            except ValueError:
                raise URLError(f"invalid URL escape {s[i:i+3]!r}") from None
            i += 3
        else:
            raw.extend(c.encode("utf-8"))
            i += 1
    return raw.decode("utf-8", "surrogateescape")


def _escaped_path(path: str, raw_path: str) -> str:
    """Go ``URL.EscapedPath()``: prefer ``raw_path`` when it is a valid
    encoding of ``path``; otherwise re-escape ``path``."""
    if raw_path:
        try:
            if _unescape(raw_path) == path:
                return raw_path
        except URLError:
            pass
    return _escape(path, _PATH_SAFE)


def _strip_port(host: str) -> str:
    if host.startswith("["):  # [v6]:port
        end = host.find("]")
        return host[1:end] if end >= 0 else host
    i = host.rfind(":")
    if i >= 0 and host[i + 1 :].isdigit():
        return host[:i]
    return host


@dataclass
class ParsedURL:
    """Engine equivalent of the reference's ``ParsedURL``
    (``pkg/api/wbot.go:84-89``): canonical ``hash`` (sha256 hex), ``root``
    (registrable domain), plus the parsed components (with ``raw_path``
    modeling Go's ``URL.RawPath``) needed for faithful re-serialization."""

    hash: str
    root: str
    scheme: str
    host: str  # netloc, original case, may include port
    path: str  # decoded path
    raw_path: str  # original escaped spelling ("" when escape(path) == raw)
    query: str  # raw query, serialized verbatim
    fragment: str = ""
    url: str = ""  # Go-style serialized absolute URL

    @property
    def hostname(self) -> str:
        return _strip_port(self.host)


def registrable_domain(host: str) -> str:
    """eTLD+1 of ``host`` (reference ``Hostname``, ``wbot.go:198-217``):
    public-suffix extraction, then the final label must be in the embedded
    TLD allowlist. Raises ``URLError`` otherwise."""
    hostname = _strip_port(host).strip(".").lower()
    if not hostname or "." not in hostname:
        raise URLError(f"failed to extract domain: {host!r}")
    labels = hostname.split(".")
    if any(not lb for lb in labels):
        raise URLError(f"failed to extract domain: {host!r}")
    ps = _public_suffix_label_count(labels)
    if len(labels) <= ps:
        # host IS a public suffix ("github.io", "co.uk") — publicsuffix-go
        # returns an error here, and so does the reference
        raise URLError(f"failed to extract domain: {host!r}")
    domain = ".".join(labels[-(ps + 1):])
    tld = labels[-1]
    if tld not in tld_allowlist():
        raise URLError(f"invalid TLD: {tld}")
    return domain


def go_url_string(
    scheme: str,
    host: str,
    path: str,
    query: str,
    fragment: str = "",
    raw_path: str = "",
) -> str:
    """Serialize components the way Go ``url.URL.String()`` does (no user
    info / opaque part, which the engine never produces)."""
    buf = []
    if scheme:
        buf.append(scheme + ":")
    if scheme or host:
        buf.append("//")
    if host:
        buf.append(host)
    p = _escaped_path(path, raw_path)
    if p and not p.startswith("/") and host:
        buf.append("/")
    buf.append(p)
    if query:
        buf.append("?" + query)
    if fragment:
        buf.append("#" + _escape(fragment, _FRAGMENT_SAFE))
    return "".join(buf)


def hash_link(
    scheme: str,
    host: str,
    path: str,
    query: str,
    fragment: str = "",
    raw_path: str = "",
) -> str:
    """Canonical URL hash — the URL-seen identity key (``wbot.go:219-238``).

    Takes the *parsed* components (decoded ``path`` + original ``raw_path``),
    applies: scheme drop, leading-``www.`` strip, ``PathUnescape`` on the
    decoded path (double-decode; only changes double-encoded paths — and when
    it does, ``raw_path`` stops being a valid encoding so the serialization
    falls back to the re-escaped decoded path), serialize, trim trailing
    ``/`` then leading ``//``, sha256 hex.
    """
    host = host[4:] if host.startswith("www.") else host
    path = _unescape(path)  # may raise URLError, like PathUnescape
    cleaned = go_url_string("", host, path, query, fragment, raw_path=raw_path)
    cleaned = cleaned.rstrip("/")
    if cleaned.startswith("//"):
        cleaned = cleaned[2:]
    return hashlib.sha256(cleaned.encode("utf-8", "surrogateescape")).hexdigest()


def parse_url(raw: str) -> ParsedURL:
    """Parse + validate an absolute URL (reference ``NewURL``,
    ``wbot.go:132-164``): scheme must be http/https, registrable domain must
    resolve with an allowed TLD, then the canonical hash. Raises
    ``URLError`` on any failure."""
    try:
        parts = urlsplit(raw)
    except ValueError as e:
        raise URLError(str(e)) from None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        raise URLError(f"invalid scheme: {scheme}")
    host = parts.netloc
    root = registrable_domain(host)
    # Go url.Parse: Path = unescape(raw path) (error on bad escapes);
    # RawPath kept only when escape(Path) round-trip differs.
    path = _unescape(parts.path)
    raw_path = "" if _escape(path, _PATH_SAFE) == parts.path else parts.path
    h = hash_link(scheme, host, path, parts.query, parts.fragment, raw_path=raw_path)
    return ParsedURL(
        hash=h,
        root=root,
        scheme=scheme,
        host=host,
        path=path,
        raw_path=raw_path,
        query=parts.query,
        fragment=parts.fragment,
        url=go_url_string(scheme, host, path, parts.query, parts.fragment, raw_path=raw_path),
    )


def hostname_of(link: str) -> str:
    """Registrable domain of a URL string (reference ``Hostname``,
    ``wbot.go:198-217``). Unlike ``parse_url`` this performs **no scheme
    check** — ``ftp://example.site`` resolves fine (and "site" *is* in the
    embedded allowlist, so the reference's own commented expectation in
    ``test_wbot.go:19`` is wrong against its own data; we match the actual
    behavior)."""
    try:
        parts = urlsplit(link)
    except ValueError as e:
        raise URLError(str(e)) from None
    return registrable_domain(parts.netloc)


@lru_cache(maxsize=4096)
def _scheme_netloc(base_url: str) -> str:
    """``scheme://netloc`` of a base URL, as ``urljoin`` would emit it
    (scheme lowercased by ``urlsplit``) — the root-relative fast path."""
    p = urlsplit(base_url)
    return p.scheme + "://" + p.netloc


def resolve_url(base_url: str, href: str) -> str:
    """Resolve a (possibly relative) href against the parent URL
    (reference ``ResolveURL``, ``wbot.go:110-123``): pure-fragment hrefs are
    rejected; the result's fragment is stripped. Raises ``URLError``.

    Two fast paths cover the hot shapes (most extracted hrefs) with
    results byte-identical to ``urljoin`` — equivalence pinned by the
    hypothesis property test in ``tests/test_urlnorm_props.py``:

    * absolute ``http(s)://host...`` with a nonempty netloc and no
      ``?``/``#``: urljoin returns such a reference verbatim (no
      dot-segment removal for references WITH authority; the lowercase
      scheme check keeps ``HTTP://...`` on the slow path, which
      lowercases);
    * root-relative ``/path`` (not ``//``) with no ``?``/``#`` and no
      ``.``/``..`` segments: urljoin emits ``scheme://netloc + href``.

    Excluded shapes (``?`` anywhere, dot segments, scheme-relative,
    path-relative) fall through to ``urljoin`` — e.g. an empty query
    (``...?``) is DROPPED by urljoin's round-trip, so it must not take
    the verbatim path."""
    if href.startswith("#"):
        raise URLError("url is a fragment")
    if "?" not in href and "#" not in href:
        # ascii-only and bracket-free: urlsplit(href) raises ValueError on
        # invalid IPv6 brackets and on non-ascii netlocs that NFKC-decompose
        # into delimiters — those must keep raising URLError via the slow path
        if (href.startswith("http://") or href.startswith("https://")) and (
            "[" not in href and "]" not in href and href.isascii()
        ):
            rest = href[href.index("//") + 2 :]
            if rest and rest[0] != "/":
                return href
        elif href.startswith("/") and not href.startswith("//"):
            if (
                "/./" not in href
                and "/../" not in href
                and not href.endswith("/.")
                and not href.endswith("/..")
            ):
                return _scheme_netloc(base_url) + href
    try:
        abs_url = urljoin(base_url, href)
    except ValueError as e:
        raise URLError(str(e)) from None
    i = abs_url.find("#")
    if i >= 0:
        abs_url = abs_url[:i]
    return abs_url
