"""Property tests: parser totality over arbitrary bytes (a crawler must
never crash on hostile/truncated HTML) and rate-string parse totality."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from wbot_ray.config import parse_rate_limit
from wbot_ray.html import extract_text, find_links


class TestParserTotality:
    @given(st.binary(max_size=2048))
    @settings(max_examples=300, deadline=None)
    def test_find_links_never_crashes(self, body):
        links = find_links(body)
        assert isinstance(links, list)
        assert all(isinstance(x, str) for x in links)

    @given(st.binary(max_size=2048))
    @settings(max_examples=300, deadline=None)
    def test_extract_text_never_crashes(self, body):
        t = extract_text(body)
        assert isinstance(t, str)
        # canonical form: single-space separated, no leading/trailing ws
        assert t == " ".join(t.split())

    @given(st.binary(max_size=4096))
    @settings(max_examples=100, deadline=None)
    def test_truncation_is_prefix_stable(self, body):
        """Extracting from a truncated body never crashes and the parse
        is deterministic (truncation-before-extract is load-bearing)."""
        a = extract_text(body[: len(body) // 2])
        b = extract_text(body[: len(body) // 2])
        assert a == b


class TestRateParseTotality:
    @given(st.text(max_size=30))
    @settings(max_examples=300, deadline=None)
    def test_parse_rate_total_and_sane(self, s):
        rate, interval = parse_rate_limit(s)
        assert isinstance(rate, int) and isinstance(interval, float)
        assert interval > 0 or (rate, interval) == (10, 1.0)

    @given(st.integers(min_value=1, max_value=10**6), st.integers(min_value=1, max_value=10**4),
           st.sampled_from("smh"))
    @settings(max_examples=200, deadline=None)
    def test_wellformed_roundtrip(self, n, v, unit):
        rate, interval = parse_rate_limit(f"{n}/{v}{unit}")
        assert rate == n
        assert interval == v * {"s": 1.0, "m": 60.0, "h": 3600.0}[unit]
