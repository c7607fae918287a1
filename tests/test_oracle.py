"""Sanity checks on the sequential oracle over the tiny fixture corpus."""

import pytest

from tests.oracle import run_oracle
from wbot_ray.config import CrawlConfig
from wbot_ray.sources.fixtures import gen_pages, seeds_for_scale


@pytest.fixture(scope="module")
def tiny_pages():
    return gen_pages("tiny")


def test_counters_add_up(tiny_pages):
    r = run_oracle(tiny_pages, seeds_for_scale("tiny"), CrawlConfig(max_depth=3))
    m = r.metrics
    assert m["total_requests"] == m["successful_requests"] + m["failed_requests"]
    assert m["total_link"] == m["crawled_link"] + m["skipped_link"] + m["duplicated_link"]
    # every pop beyond the seeds was enqueued via crawled_link
    assert m["total_requests"] == 3 + m["crawled_link"]
    assert m["successful_requests"] > 10
    assert m["failed_requests"] > 0  # fetch-miss traps fire
    assert m["duplicated_link"] > 0  # dedup traps fire
    assert m["skipped_link"] > 0  # filter traps fire


def test_bfs_depth_monotonic(tiny_pages):
    r = run_oracle(tiny_pages, seeds_for_scale("tiny"), CrawlConfig(max_depth=3))
    depths = [v["depth"] for v in r.visited]
    assert depths == sorted(depths)  # strict BFS: FIFO + depth inheritance
    assert max(depths) == 3  # depth==max_depth rows are fetched, not expanded


def test_depth_zero_is_seed_order(tiny_pages):
    seeds = seeds_for_scale("tiny")
    r = run_oracle(tiny_pages, seeds, CrawlConfig(max_depth=2))
    d0 = [v["url"] for v in r.visited if v["depth"] == 0]
    assert d0 == seeds


def test_no_hash_fetched_twice_except_seeds(tiny_pages):
    # seeds are never pre-marked visited (crawler.go:173-194): a page linking
    # back to the seed gets it re-fetched exactly once.
    r = run_oracle(tiny_pages, seeds_for_scale("tiny"), CrawlConfig(max_depth=3))
    seed_hashes = {v["url_hash"] for v in r.visited if v["depth"] == 0}
    counts: dict[str, int] = {}
    for v in r.visited:
        counts[v["url_hash"]] = counts.get(v["url_hash"], 0) + 1
    for h, c in counts.items():
        assert c <= (2 if h in seed_hashes else 1), h
    assert any(c == 2 for h, c in counts.items() if h in seed_hashes)


def test_deterministic(tiny_pages):
    a = run_oracle(tiny_pages, seeds_for_scale("tiny"), CrawlConfig(max_depth=2))
    b = run_oracle(tiny_pages, seeds_for_scale("tiny"), CrawlConfig(max_depth=2))
    assert a.metrics == b.metrics
    assert a.visited == b.visited


def test_text_byte_identical_to_corpus(tiny_pages):
    # engine text = extract_text(truncated html); corpus text was produced by
    # the same canonical extractor on the FULL html, so they agree for every
    # non-truncated page.
    r = run_oracle(tiny_pages, seeds_for_scale("tiny"), CrawlConfig(max_depth=4))
    truth = {
        tiny_pages.column("url")[i].as_py(): tiny_pages.column("text")[i].as_py()
        for i in range(tiny_pages.num_rows)
    }
    checked = 0
    for row in r.results:
        if len(truth[row["url"]]) < 60_000:  # skip the oversized trap page
            assert row["text"] == truth[row["url"]], row["url"]
            checked += 1
    assert checked > 10


def test_truncation_drops_tail_links(tiny_pages):
    # the oversized page's tail links must not be discovered under a small cap
    small = run_oracle(
        tiny_pages, ["https://site0.com/p/2"], CrawlConfig(max_depth=1, max_body_size=4096)
    )
    big = run_oracle(tiny_pages, ["https://site0.com/p/2"], CrawlConfig(max_depth=1))
    urls_small = {v["url"] for v in small.visited}
    urls_big = {v["url"] for v in big.visited}
    assert "https://site0.com/only-in-tail" in urls_big
    assert "https://site0.com/only-in-tail" not in urls_small


def test_max_depth_cuts_chain(tiny_pages):
    r = run_oracle(tiny_pages, ["https://site1.com/chain/0"], CrawlConfig(max_depth=5))
    chain = sorted(
        int(v["url"].rsplit("/", 1)[1]) for v in r.visited if "/chain/" in v["url"]
    )
    assert chain == list(range(6))  # chain/0 .. chain/5 (depth 0..5)


def test_substring_scope_quirk(tiny_pages):
    r = run_oracle(tiny_pages, ["https://site0.com/p/0"], CrawlConfig(max_depth=4))
    urls = {v["url"] for v in r.visited}
    assert any("notsite0.com" in u for u in urls)  # fidelity: quirk fires
    r2 = run_oracle(
        tiny_pages, ["https://site0.com/p/0"], CrawlConfig(max_depth=4, mode="strict")
    )
    urls2 = {v["url"] for v in r2.visited}
    assert not any("notsite0.com" in u for u in urls2)
