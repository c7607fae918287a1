"""Full public-suffix-list conformance for ``registrable_domain``.

The reference resolves eTLD+1 with publicsuffix-go (the complete Mozilla
PSL, ``/root/reference/pkg/api/wbot.go:143-146``), then gates the last
label on its 451-entry TLD allowlist. Round 1 shipped a hand-rolled
two-level suffix set; these tests pin the replacement to real PSL
semantics: private-section suffixes (github.io), 3+-label rules,
wildcard ``*.base`` rules, ``!exception`` rules, and the
host-is-a-suffix error.
"""

import pytest

from wbot_ray.urlnorm import URLError, _public_suffix_label_count, registrable_domain


def _ps(host: str) -> int:
    return _public_suffix_label_count(host.split("."))


# -- raw PSL matcher semantics (independent of the TLD allowlist) --------


def test_default_rule_single_label():
    assert _ps("example.unlistedtldxyz") == 1


def test_exact_multilabel_rule():
    # "co.uk" is an ICANN rule
    assert _ps("foo.co.uk") == 2
    assert _ps("www.foo.co.uk") == 2


def test_three_label_rule():
    # "pref.aichi.jp" — aichi.jp is an exact PSL rule
    assert _ps("pref.aichi.jp") == 2
    assert _ps("www.pref.aichi.jp") == 2


def test_wildcard_rule_consumes_one_label():
    # "*.ck": bar.ck is a public suffix, foo.bar.ck is registrable
    assert _ps("foo.bar.ck") == 2
    assert _ps("bar.ck") == 2  # host IS the suffix


def test_exception_rule_beats_wildcard():
    # "!www.ck" — the exception's suffix is the rule minus its first label
    assert _ps("www.ck") == 1
    assert _ps("sub.www.ck") == 1


def test_kawasaki_exception():
    # "*.kawasaki.jp" with "!city.kawasaki.jp"
    assert _ps("foo.kawasaki.jp") == 3  # foo.kawasaki.jp is a suffix
    assert _ps("city.kawasaki.jp") == 2  # exception: kawasaki.jp is the suffix
    assert _ps("a.city.kawasaki.jp") == 2


def test_private_section_included():
    # publicsuffix-go's DefaultFindOptions does NOT ignore private domains
    assert _ps("user.github.io") == 2
    assert _ps("foo.blogspot.com") == 2


def test_longest_match_wins():
    # "s3.dualstack.us-east-1.amazonaws.com" is a (private) PSL rule
    assert _ps("bucket.s3.dualstack.us-east-1.amazonaws.com") == 5


# -- end-to-end registrable_domain (PSL + reference TLD allowlist) ------


@pytest.mark.parametrize(
    "host,expected",
    [
        ("site0.com", "site0.com"),
        ("sub.site0.com", "site0.com"),
        ("a.b.c.site0.com", "site0.com"),
        ("user.github.io", "user.github.io"),  # private suffix, io allowed
        ("deep.user.github.io", "user.github.io"),
        ("foo.blogspot.com", "foo.blogspot.com"),
        ("proj.pages.dev", "proj.pages.dev"),
        ("app.web.app", "app.web.app"),
        ("x.firebaseapp.com", "x.firebaseapp.com"),
        ("b.s3.dualstack.us-east-1.amazonaws.com", "b.s3.dualstack.us-east-1.amazonaws.com"),
    ],
)
def test_registrable_domain_psl(host, expected):
    assert registrable_domain(host) == expected


@pytest.mark.parametrize(
    "host",
    [
        "github.io",  # host IS a public suffix -> publicsuffix-go errors
        "blogspot.com",
        "com",
        "foo.co.uk",  # extraction fine, but "uk" not in the 451-entry allowlist
        "pref.aichi.jp",  # "jp" not in the allowlist
    ],
)
def test_registrable_domain_rejects(host):
    with pytest.raises(URLError):
        registrable_domain(host)


def test_case_and_port_normalization():
    assert registrable_domain("USER.GitHub.IO:8443") == "user.github.io"
