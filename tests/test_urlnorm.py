"""Unit tests for URL canonicalization — the engine's identity layer.

Vectors mirror the reference's semantics function-by-function, including the
``test_wbot.go:6-21`` Hostname cases and the RawPath-preference quirks of
Go's ``URL.String()`` that shape ``hashLink`` identity.
"""

import hashlib

import pytest

from wbot_ray.urlnorm import (
    URLError,
    go_url_string,
    hash_link,
    hostname_of,
    parse_url,
    registrable_domain,
    resolve_url,
    tld_allowlist,
)


def sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def test_tld_allowlist_size():
    # same data as the reference's embedded pkg/api/tlds.json (451 keys)
    assert len(tld_allowlist()) == 451
    assert "com" in tld_allowlist()
    assert "invalidtld" not in tld_allowlist()


class TestHostname:
    # valid vectors from /root/reference/pkg/api/test_wbot.go:6-14
    @pytest.mark.parametrize(
        "link,expected",
        [
            ("http://www.google.com", "google.com"),
            ("https://sub.domain.google.com", "google.com"),
            ("http://beta.moon.facebook.com", "facebook.com"),
            # multi-label public suffix whose TLD ("ke") IS in the allowlist
            ("https://www.example.co.ke/x", "example.co.ke"),
        ],
    )
    def test_valid(self, link, expected):
        assert hostname_of(link) == expected

    # invalid vectors from test_wbot.go:16-21 — except ftp://example.site,
    # which the reference would actually ACCEPT ("site" is in tlds.json).
    @pytest.mark.parametrize(
        "link",
        [
            "http://www.google.invalidTLD",
            "https://example.com.xxy",
            "http://nodots",
            "http://",
        ],
    )
    def test_invalid(self, link):
        with pytest.raises(URLError):
            hostname_of(link)

    def test_ftp_site_is_actually_valid(self):
        # Hostname() has no scheme check (wbot.go:198-217) and "site" is in
        # the embedded allowlist, so this succeeds in the reference too.
        assert hostname_of("ftp://example.site") == "example.site"


class TestParseURL:
    def test_scheme_validation(self):
        with pytest.raises(URLError):
            parse_url("ftp://example.com")  # NewURL checks scheme, wbot.go:138-140
        with pytest.raises(URLError):
            parse_url("example.com/no-scheme")

    def test_basic(self):
        u = parse_url("https://www.Example.com/a/b?x=1")
        assert u.root == "example.com"
        assert u.host == "www.Example.com"  # Go does not lowercase host
        assert u.url == "https://www.Example.com/a/b?x=1"

    def test_invalid_escape_rejected(self):
        # Go url.Parse errors on malformed % escapes -> NewURL error
        with pytest.raises(URLError):
            parse_url("https://example.com/a%zzb")


class TestHashLink:
    """hashLink canonicalization (wbot.go:219-238). Expected hashes are
    sha256 of the cleaned canonical string, computed directly."""

    def test_scheme_collapse(self):
        a = parse_url("http://example.com/p/1")
        b = parse_url("https://example.com/p/1")
        assert a.hash == b.hash == sha("example.com/p/1")

    def test_www_collapse(self):
        a = parse_url("https://www.example.com/p/1")
        b = parse_url("https://example.com/p/1")
        assert a.hash == b.hash

    def test_www_strip_is_prefix_only(self):
        # only a LEADING "www." is stripped (TrimPrefix, wbot.go:222)
        a = parse_url("https://sub.www.example.com/")
        assert a.hash == sha("sub.www.example.com")

    def test_trailing_slash_collapse(self):
        assert parse_url("https://example.com/p/1/").hash == sha("example.com/p/1")
        assert parse_url("https://example.com/").hash == parse_url("https://example.com").hash == sha("example.com")

    def test_query_preserved(self):
        u = parse_url("https://example.com/p?a=1&b=2")
        assert u.hash == sha("example.com/p?a=1&b=2")

    def test_query_trailing_slash_in_query_trimmed(self):
        # TrimRight happens on the whole serialized string
        u = parse_url("https://example.com/p?a=/")
        assert u.hash == sha("example.com/p?a=")

    def test_single_encoded_keeps_identity(self):
        # RawPath "%41" is still a valid encoding of the decoded path after
        # the double-decode no-op, so Go re-emits the ORIGINAL spelling:
        # "%41bc" does NOT collapse with "Abc".
        a = parse_url("https://example.com/p/%41bc")
        assert a.hash == sha("example.com/p/%41bc")
        assert a.hash != parse_url("https://example.com/p/Abc").hash

    def test_double_encoded_collapses_to_plain(self):
        # "%2541" -> Parse decodes once to "%41", hashLink decodes again to
        # "A"; RawPath no longer matches -> re-escaped decoded path is used.
        a = parse_url("https://example.com/p/%2541bc")
        assert a.hash == sha("example.com/p/Abc")
        assert a.hash == parse_url("https://example.com/p/Abc").hash

    def test_space_stays_escaped(self):
        # "/a b" re-escapes to "/a%20b" in encodePath mode
        a = parse_url("https://example.com/a%20b")
        assert a.hash == sha("example.com/a%20b")

    def test_host_case_matters(self):
        # Go neither lowercases Host in Parse nor in hashLink
        a = parse_url("https://Example.com/p")
        b = parse_url("https://example.com/p")
        assert a.hash != b.hash


class TestGoURLString:
    def test_plain(self):
        assert go_url_string("https", "example.com", "/a/b", "x=1") == "https://example.com/a/b?x=1"

    def test_no_scheme(self):
        assert go_url_string("", "example.com", "/a", "") == "//example.com/a"

    def test_question_mark_escapes_in_path(self):
        assert go_url_string("https", "e.com", "/a?b", "") == "https://e.com/a%3Fb"

    def test_fragment(self):
        assert go_url_string("https", "e.com", "/a", "", "frag") == "https://e.com/a#frag"


class TestResolveURL:
    def test_fragment_only_rejected(self):
        with pytest.raises(URLError):
            resolve_url("https://example.com/a", "#top")

    def test_relative(self):
        assert resolve_url("https://example.com/a/b", "c") == "https://example.com/a/c"
        assert resolve_url("https://example.com/a/b", "/c") == "https://example.com/c"
        assert resolve_url("https://example.com/a/b", "//other.com/x") == "https://other.com/x"

    def test_fragment_stripped(self):
        assert resolve_url("https://example.com/", "p#sec") == "https://example.com/p"

    def test_absolute_passthrough(self):
        assert resolve_url("https://example.com/", "https://o.com/z") == "https://o.com/z"


class TestRegistrableDomain:
    def test_port_stripped(self):
        assert registrable_domain("example.com:8080") == "example.com"

    def test_multi_suffix(self):
        assert registrable_domain("www.example.co.ke") == "example.co.ke"
        with pytest.raises(URLError):
            registrable_domain("co.ke")  # bare public suffix

    def test_uk_tld_not_in_allowlist(self):
        # the reference's embedded tlds.json has no "uk" entry, so even a
        # correctly-extracted bbc.co.uk is rejected (wbot.go:149-152)
        with pytest.raises(URLError):
            registrable_domain("www.bbc.co.uk")


class TestDisplayUrl:
    """M6 — 64-byte display truncation (``ParsedURL.String``,
    ``/root/reference/pkg/api/wbot.go:124-130``)."""

    def test_short_and_exact_unchanged(self):
        from wbot_ray.urlnorm import display_url

        assert display_url("https://a.com/x") == "https://a.com/x"
        exact = "https://example.com/" + "a" * 44  # 64 chars
        assert len(exact) == 64 and display_url(exact) == exact

    def test_long_truncates_to_64_bytes(self):
        from wbot_ray.urlnorm import display_url

        long = "https://example.com/" + "b" * 100
        got = display_url(long)
        assert got == long[:64] and len(got.encode()) == 64

    def test_multibyte_split_dropped(self):
        from wbot_ray.urlnorm import display_url

        # 63 ASCII bytes then a 2-byte codepoint straddling the cut:
        # Go would emit an invalid byte; we drop the split codepoint
        link = "x" * 63 + "é" + "tail"
        assert display_url(link) == "x" * 63
