"""Property-based tests for the URL layer (hypothesis).

The canonical hash defines the URL-seen identity — these properties must
hold for ANY input, not just the curated vectors in test_urlnorm.py:

* total: parse_url/hash_link never raise anything but URLError, never hang
* canonical collapse: scheme / www. / trailing-slash spellings of the
  same page share one hash
* determinism: same input → same hash across calls
* resolve: resolving a relative href against a base never escapes to a
  non-string or empty url
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wbot_ray.urlnorm import URLError, parse_url, resolve_url

HOST_LABEL = st.from_regex(r"[a-z]([a-z0-9-]{0,10}[a-z0-9])?", fullmatch=True)
PATH_SEG = st.from_regex(r"[A-Za-z0-9._~%-]{0,12}", fullmatch=True)


@st.composite
def valid_urls(draw):
    host = draw(HOST_LABEL)
    sub = draw(st.sampled_from(["", "www.", "sub."]))
    tld = draw(st.sampled_from(["com", "org", "net", "dev", "app", "io"]))
    segs = draw(st.lists(PATH_SEG, max_size=4))
    path = "/" + "/".join(segs) if segs else ""
    scheme = draw(st.sampled_from(["http", "https"]))
    return f"{scheme}://{sub}{host}.{tld}{path}"


class TestParseTotality:
    @given(st.text(max_size=200))
    @settings(max_examples=300, deadline=None)
    def test_parse_never_crashes(self, s):
        try:
            p = parse_url(s)
        except URLError:
            return
        assert p.hash and len(p.hash) == 64
        assert p.root

    @given(valid_urls())
    @settings(max_examples=300, deadline=None)
    def test_valid_urls_parse_or_reject_cleanly(self, url):
        try:
            p = parse_url(url)
        except URLError:
            return  # e.g. malformed %-escape from the path alphabet
        assert p.host in url or p.host == url.split("://")[1].split("/")[0].lower()


class TestCanonicalCollapse:
    @given(valid_urls())
    @settings(max_examples=200, deadline=None)
    def test_scheme_collapse(self, url):
        try:
            a = parse_url(url)
            b = parse_url(url.replace("https://", "http://", 1) if url.startswith("https")
                          else url.replace("http://", "https://", 1))
        except URLError:
            return
        assert a.hash == b.hash

    @given(valid_urls())
    @settings(max_examples=200, deadline=None)
    def test_www_collapse(self, url)    :
        scheme, rest = url.split("://", 1)
        if rest.startswith(("www.", "sub.")):
            return
        try:
            a = parse_url(url)
            b = parse_url(f"{scheme}://www.{rest}")
        except URLError:
            return
        assert a.hash == b.hash

    @given(valid_urls())
    @settings(max_examples=200, deadline=None)
    def test_trailing_slash_collapse(self, url):
        if "?" in url:
            return
        try:
            a = parse_url(url.rstrip("/"))
            b = parse_url(url.rstrip("/") + "/")
        except URLError:
            return
        assert a.hash == b.hash

    @given(valid_urls())
    @settings(max_examples=200, deadline=None)
    def test_deterministic(self, url):
        try:
            assert parse_url(url).hash == parse_url(url).hash
        except URLError:
            pass


class TestResolve:
    @given(valid_urls(), st.text(alphabet="abcdefgh/._-", max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_resolve_total(self, base, href):
        try:
            out = resolve_url(base, href)
        except URLError:
            return
        assert isinstance(out, str) and out

    @given(valid_urls())
    @settings(max_examples=100, deadline=None)
    def test_fragment_only_rejected(self, base):
        with pytest.raises(URLError):
            resolve_url(base, "#frag")

    @given(
        valid_urls(),
        st.one_of(
            # relative / root-relative / dotted shapes
            st.text(alphabet="abc/._-?#", max_size=30),
            # absolute-ish shapes incl. the fast-path edges
            st.builds(
                lambda s, h, p: s + h + p,
                st.sampled_from(
                    ["http://", "https://", "HTTP://", "http:///", "//"]
                ),
                st.text(alphabet="abx.[]é:", max_size=10),
                st.text(alphabet="abc/.?#%", max_size=12),
            ),
        ),
    )
    @settings(max_examples=400, deadline=None)
    def test_fast_paths_match_urljoin(self, base, href):
        """resolve_url's fast paths must be byte-identical to the pure
        urljoin implementation (value AND raise behavior)."""
        from urllib.parse import urljoin

        def reference(base_url: str, h: str) -> str:
            if h.startswith("#"):
                raise URLError("url is a fragment")
            try:
                abs_url = urljoin(base_url, h)
            except ValueError as e:
                raise URLError(str(e)) from None
            i = abs_url.find("#")
            if i >= 0:
                abs_url = abs_url[:i]
            return abs_url

        try:
            expect: object = reference(base, href)
        except URLError:
            expect = URLError
        try:
            got: object = resolve_url(base, href)
        except URLError:
            got = URLError
        assert got == expect
