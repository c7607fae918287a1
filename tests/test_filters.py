"""Filter precedence (filter.go:30-57), scope quirk (crawler.go:252),
rate parsing fallbacks (limiter.go:61-90), robots gate modes."""

import pytest

from wbot_ray.config import CrawlConfig, FilterRule, RateLimit, parse_rate_limit
from wbot_ray.filters import BAD_EXTENSIONS_RE, RuleFilter, in_scope
from wbot_ray.robots import RobotsGate


class TestBadExtensions:
    @pytest.mark.parametrize("path", ["/a.png", "/x/y.pdf", "/m.mp3", "/app.js", "/s.css", "/d.docx"])
    def test_denied(self, path):
        assert BAD_EXTENSIONS_RE.search(path)

    @pytest.mark.parametrize("path", ["/a.html", "/a.png/x", "/a.PNG", "/apng", "/"])
    def test_allowed(self, path):
        # case-sensitive, anchored at end — /a.PNG passes, /a.png/x passes
        assert not BAD_EXTENSIONS_RE.search(path)


class TestRuleFilter:
    def test_no_rules_allows(self):
        f = RuleFilter([])
        assert f.allow("example.com", "/p", "https://example.com/p")

    def test_rule_present_nothing_matched_denies(self):
        f = RuleFilter([FilterRule("example.com", allow=["/blog/"])])
        assert not f.allow("example.com", "/p", "https://example.com/p")
        assert f.allow("example.com", "/blog/x", "https://example.com/blog/x")

    def test_disallow_wins_over_allow(self):
        f = RuleFilter([FilterRule("example.com", allow=["blog"], disallow=["secret"])])
        assert not f.allow("example.com", "/blog/secret", "https://example.com/blog/secret")

    def test_wildcard_fallback(self):
        f = RuleFilter([FilterRule("*", allow=[".*"])])
        assert f.allow("other.com", "/x", "https://other.com/x")

    def test_specific_rule_shadows_wildcard(self):
        f = RuleFilter([FilterRule("*", allow=[".*"]), FilterRule("example.com", allow=["only"])])
        assert not f.allow("example.com", "/x", "https://example.com/x")
        assert f.allow("example.com", "/only", "https://example.com/only")

    def test_bad_extension_beats_rules(self):
        f = RuleFilter([FilterRule("*", allow=[".*"])])
        assert not f.allow("example.com", "/a.png", "https://example.com/a.png")


class TestScope:
    def test_same_root(self):
        assert in_scope("go.dev", "go.dev")
        assert in_scope("go.dev", "sub.go.dev")

    def test_fidelity_substring_quirk(self):
        # strings.Contains(host, root): "notgo.dev" contains "go.dev"
        assert in_scope("go.dev", "notgo.dev", mode="fidelity")
        assert not in_scope("go.dev", "notgo.dev", mode="strict")

    def test_off_scope(self):
        assert not in_scope("go.dev", "example.com")


class TestRateParse:
    def test_valid(self):
        assert parse_rate_limit("10/1s") == (10, 1.0)
        assert parse_rate_limit("5/2m") == (5, 120.0)
        assert parse_rate_limit("1/1h") == (1, 3600.0)
        assert parse_rate_limit("3/10S") == (3, 10.0)

    @pytest.mark.parametrize("bad", ["10", "x/1s", "10/xs", "10/1x", "10/1", "", "10/"])
    def test_malformed_falls_back_to_default(self, bad):
        assert parse_rate_limit(bad) == (10, 1.0)

    def test_config_lookup(self):
        cfg = CrawlConfig(rate_limits=[RateLimit("slow.com", "2/1s")])
        assert cfg.rate_for_root("slow.com") == (2, 1.0)
        assert cfg.rate_for_root("other.com") == (10, 1.0)  # default wildcard


class TestRobots:
    def test_fidelity_always_allows(self):
        g = RobotsGate(mode="fidelity")
        assert g.allowed("AnyBot", "https://example.com/secret")

    def test_strict_blocks(self):
        g = RobotsGate(
            mode="strict",
            robots_bodies={"example.com": "User-agent: *\nDisallow: /private/"},
        )
        assert not g.allowed("AnyBot", "https://example.com/private/x")
        assert g.allowed("AnyBot", "https://example.com/public")
        assert g.allowed("AnyBot", "https://norules.com/anything")


class TestConfig:
    def test_max_depth_default(self):
        assert CrawlConfig(max_depth=-1).max_depth == 10  # config.go:30-32

    def test_spinner_rotation(self):
        cfg = CrawlConfig(user_agents=["A", "B"])
        assert [cfg.user_agent_for_seed(i) for i in range(4)] == ["A", "B", "A", "B"]


class TestRealPoliteness:
    def test_token_bucket_paces(self):
        """politeness="real": the reference's blocking Take() semantics
        (limiter.go:52-59) — N takes at rate R/interval need at least
        (N-1)·interval/R wall seconds."""
        import time

        from wbot_ray.stages.fetch import _TokenBucket

        tb = _TokenBucket(rate=100, interval_s=1.0)  # 10 ms per request
        t0 = time.perf_counter()
        for _ in range(5):
            tb.take()
        elapsed = time.perf_counter() - t0
        assert elapsed >= 4 * 0.01 - 0.002

    def test_headless_stub(self):
        import pyarrow as pa
        import pytest as _pytest

        from wbot_ray.config import CrawlConfig
        from wbot_ray.stages.fetch import make_headless_fetcher

        fn = make_headless_fetcher("/tmp/nowhere", CrawlConfig())
        with _pytest.raises(NotImplementedError):
            fn(pa.table({"url": pa.array(["https://x.com/"], pa.string())}))


class TestConfigValidation:
    def test_bad_filter_regex_fails_fast(self):
        from wbot_ray.config import CrawlConfig, FilterRule
        import pytest as _pytest

        with _pytest.raises(ValueError, match="invalid filter regex"):
            CrawlConfig(filter_rules=[FilterRule(hostname="x.com", disallow=["("])])
