"""Web-corpus audit operators (``wbot_ray.pipelines.webops``) against
their DuckDB twins on adversarial and randomized inputs — both engines
compile the same RE2 patterns and the same md5/integer identities, so
every row must agree on ANY input, not just the fixture corpus."""

from __future__ import annotations

import os
import random

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wbot_ray.pipelines import webops


def _write_pages(tmp_path, urls, texts=None):
    p = os.path.join(tmp_path, "pages.parquet")
    cols = {"url": pa.array(urls, pa.string())}
    if texts is not None:
        cols["text"] = pa.array(texts, pa.string())
    pq.write_table(pa.table(cols), p)
    return p


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _assert_match(ds, sql):
    got = ds.to_pandas() if not isinstance(ds, pd.DataFrame) else ds
    want = duckdb.connect().execute(sql).df()
    assert sorted(got.columns) == sorted(want.columns)
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want), check_dtype=False, check_exact=True
    )
    return got


class TestCrawlTraps:
    def test_adversarial(self, tmp_path, ray_session):
        urls = [
            "https://a.com/p/1",          # same template as /p/2
            "https://a.com/p/2",
            "https://a.com/about",        # distinct template
            "https://a.com/p/3?sess=99",  # query digits ignored
            "https://h2o.com/x1y2z3",     # digits in host stay; path folds
            "https://h2o.com/x9y8z7",
            "http://b.org",               # no path at all
            "https://B.ORG/2020/01/05/post",   # date-trap shape
            "https://b.org/2021/12/31/post",
        ]
        got = _assert_match(
            webops.crawl_traps(str(tmp_path), pages_path=_write_pages(tmp_path, urls)),
            webops.crawl_traps_oracle_sql(os.path.join(tmp_path, "pages.parquet")),
        )
        rows = {r.host: (r.n_urls, r.n_templates, r.upt_x1000) for r in got.itertuples()}
        assert rows["a.com"] == (4, 2, 2000)   # /p/N ×3 + /about
        assert rows["h2o.com"] == (2, 1, 2000)  # host digits NOT folded
        assert rows["b.org"] == (3, 2, 1500)    # '', /N/N/N/post

    def test_randomized(self, tmp_path, ray_session):
        rng = random.Random(71)
        hosts = ["a.com", "b.org", "c9.net"]
        segs = ["p", "2024", "item42", "x", ""]
        urls = list(
            {
                f"https://{rng.choice(hosts)}/"
                + "/".join(rng.choice(segs) for _ in range(rng.randint(0, 3)))
                + (f"?id={rng.randint(0, 9)}" if rng.random() < 0.3 else "")
                for _ in range(400)
            }
        )
        _assert_match(
            webops.crawl_traps(str(tmp_path), pages_path=_write_pages(tmp_path, urls)),
            webops.crawl_traps_oracle_sql(os.path.join(tmp_path, "pages.parquet")),
        )


class TestBoilerplateLines:
    def test_threshold_and_multiline(self, tmp_path, ray_session):
        # 3 docs on a.com share 'común\nline' via their own text; footers
        # hit every doc; a line repeated INSIDE one doc counts once
        urls = [f"https://a.com/{i}" for i in range(3)] + ["https://b.org/0"]
        texts = [
            "común\nshared",
            "común\nshared\nshared",   # in-doc repeat counts once
            "común\nunique0",
            "solo",
        ]
        p = _write_pages(tmp_path, urls, texts)
        got = _assert_match(
            webops.boilerplate_lines(str(tmp_path), min_docs=3, pages_path=p),
            webops.boilerplate_lines_oracle_sql(p, min_docs=3),
        )
        # a.com: 'común' (3 docs) + its 2 synthesized footer lines;
        # b.org has only 1 doc so nothing clears min_docs=3
        assert set(got.host) == {"a.com"}
        assert len(got) == 3
        import hashlib

        assert hashlib.md5("común".encode()).hexdigest() in set(got.line_md5)

    def test_randomized(self, tmp_path, ray_session):
        rng = random.Random(13)
        lines = ["alpha", "beta", "gamma", "", "ünï", "x y"]
        urls, texts = [], []
        for i in range(120):
            urls.append(f"https://h{rng.randint(0, 2)}.com/{i}")
            texts.append("\n".join(rng.choice(lines) for _ in range(rng.randint(1, 4))))
        p = _write_pages(tmp_path, urls, texts)
        _assert_match(
            webops.boilerplate_lines(str(tmp_path), min_docs=2, pages_path=p),
            webops.boilerplate_lines_oracle_sql(p, min_docs=2),
        )


class TestChangeRate:
    def test_rule_arms(self, tmp_path, ray_session):
        # url lengths chosen to hit: neither, %3==1 only (unchanged
        # re-crawl), %7==2 only (changed), both
        urls = [
            "https://a.com/" + "x" * 1,   # len 15: 15%3=0, 15%7=1 -> neither
            "https://a.com/" + "x" * 5,   # len 19: 19%3=1 -> unchanged re-crawl
            "https://a.com/" + "x" * 7,   # len 21: 0, 0 -> neither
            "https://a.com/" + "x" * 8,   # len 22: 22%3=1 -> unchanged
            "https://b.org/" + "y" * 9,   # len 23: 23%7=2 -> changed
            "https://b.org/" + "y" * 23,  # len 37: 37%3=1 AND 37%7=2 -> both
        ]
        texts = [f"body {i}" for i in range(len(urls))]
        p = _write_pages(tmp_path, urls, texts)
        got = _assert_match(
            webops.change_rate(str(tmp_path), pages_path=p),
            webops.change_rate_oracle_sql(p),
        )
        rows = {
            r.host: (r.n_urls, r.n_snapshots, r.n_changes, r.change_ppm)
            for r in got.itertuples()
        }
        # a.com: 4 urls, 2 unchanged re-crawls -> 6 snaps, 0 changes
        assert rows["a.com"] == (4, 6, 0, 0)
        # b.org: 2 urls; one changed re-crawl, one both-arms (3 snaps,
        # 1 change) -> 5 snaps, 2 changes over 3 re-crawls
        assert rows["b.org"] == (2, 5, 2, 2 * 1000000 // 3)

    def test_randomized(self, tmp_path, ray_session):
        rng = random.Random(29)
        urls = list(
            {
                f"https://h{rng.randint(0, 2)}.com/" + "x" * rng.randint(0, 25)
                for _ in range(200)
            }
        )
        texts = [f"doc {rng.randint(0, 5)}" for _ in urls]
        p = _write_pages(tmp_path, urls, texts)
        _assert_match(
            webops.change_rate(str(tmp_path), pages_path=p),
            webops.change_rate_oracle_sql(p),
        )


class TestHostQuota:
    def _pages_ts(self, tmp_path, urls, ts_us):
        p = os.path.join(tmp_path, "pages.parquet")
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "warc_ts": pa.array(ts_us, pa.timestamp("us")),
                }
            ),
            p,
        )
        return p

    def test_cap_and_tie_order(self, tmp_path, ray_session):
        # a.com has 4 pages (cap 2 keeps the 2 oldest; equal ts breaks
        # by url); b.org has 1 (kept whole)
        urls = [
            "https://a.com/d",
            "https://a.com/c",
            "https://a.com/b",
            "https://a.com/a",
            "https://b.org/x",
        ]
        ts = [100, 100, 300, 400, 50]
        p = self._pages_ts(tmp_path, urls, ts)
        got = _assert_match(
            webops.host_quota(str(tmp_path), n=2, pages_path=p),
            webops.host_quota_oracle_sql(p, n=2),
        )
        kept = {(r.host, r.url): r.host_rank for r in got.itertuples()}
        assert kept == {
            ("a.com", "https://a.com/c"): 1,  # ts tie -> smaller url wins
            ("a.com", "https://a.com/d"): 2,
            ("b.org", "https://b.org/x"): 1,
        }

    def test_randomized(self, tmp_path, ray_session):
        rng = random.Random(59)
        urls = list({f"https://h{rng.randint(0, 3)}.com/{rng.randint(0, 500)}" for _ in range(300)})
        ts = [rng.randint(0, 20) * 1000000 for _ in urls]  # many ties
        p = self._pages_ts(tmp_path, urls, ts)
        _assert_match(
            webops.host_quota(str(tmp_path), n=5, pages_path=p),
            webops.host_quota_oracle_sql(p, n=5),
        )


class TestDedupUrl:
    def test_adversarial_chain(self, tmp_path, ray_session):
        """Every rewrite rule and their interactions: fragment after
        query, utm as only param, consecutive tracking params, tracking
        param first then real param (the '&'-reanchor rule), http+www
        combos, case-sensitive path preserved."""
        urls = [
            "https://a.com/p",
            "http://a.com/p",                      # scheme fold -> same canon
            "https://www.a.com/p",                 # www strip -> same canon
            "https://a.com/p#section",             # fragment -> same canon
            "https://a.com/p?utm_source=x",        # utm only -> same canon
            "https://a.com/p?utm_a=1&utm_b=2",     # consecutive utm -> same
            "https://a.com/p?utm_c=3&q=1",         # reanchor: -> /p?q=1
            "https://a.com/p?q=1",
            "https://a.com/p?q=1&gclid=zzz#f",     # gclid + fragment
            "https://a.com/P",                      # path case preserved: distinct
            "https://b.org/x?fbclid=1&fbclid=2",   # repeated tracker
        ]
        p = _write_pages(tmp_path, urls)
        got = _assert_match(
            webops.dedup_url(str(tmp_path), pages_path=p),
            webops.dedup_url_oracle_sql(p),
        )
        by_canon = {r.canon_url: (r.keep_url, r.n_variants) for r in got.itertuples()}
        # at least the 6 hand-listed variants of https://a.com/p collapse
        # (synthesized dirty variants may add more)
        assert by_canon["https://a.com/p"][1] >= 6
        assert by_canon["https://a.com/p"][0] == "http://a.com/p"  # lexic. min
        assert by_canon["https://a.com/p?q=1"][1] >= 3
        assert "https://a.com/P" in by_canon
        assert by_canon["https://b.org/x"][1] >= 1

    def test_randomized(self, tmp_path, ray_session):
        rng = random.Random(83)
        frag = ["", "#f", "#a?utm_x=1"]
        qs = ["", "?q=1", "?utm_source=s", "?utm_a=1&b=2", "?a=1&utm_b=2&c=3", "?gclid=g&utm_x=&y"]
        pre = ["https://", "http://", "https://www.", "http://www."]
        urls = list(
            {
                f"{rng.choice(pre)}h{rng.randint(0, 3)}.com/p{rng.randint(0, 30)}"
                f"{rng.choice(qs)}{rng.choice(frag)}"
                for _ in range(400)
            }
        )
        p = _write_pages(tmp_path, urls)
        _assert_match(
            webops.dedup_url(str(tmp_path), pages_path=p),
            webops.dedup_url_oracle_sql(p),
        )


class TestRecrawlPriority:
    def test_composition_matches_oracle(self, tmp_path, ray_session):
        """rank × change-rate composition on a planted world: a host
        must be in BOTH the link graph and the crawl history to score;
        a volatile well-ranked host outscores a static one."""
        links = os.path.join(tmp_path, "links.parquet")
        pq.write_table(
            pa.table(
                {
                    "src_url": pa.array(
                        [
                            "https://a.com/1",
                            "https://b.org/1",
                            "https://c.net/1",
                            "https://a.com/2",
                        ],
                        pa.string(),
                    ),
                    "dst_url": pa.array(
                        [
                            "https://b.org/x",
                            "https://a.com/x",
                            "https://a.com/y",
                            "https://c.net/x",
                        ],
                        pa.string(),
                    ),
                    "gated": pa.array([True] * 4, pa.bool_()),
                }
            ),
            links,
        )
        # pages: a.com urls hit the changed-recrawl arm (len%7==2);
        # b.org urls hit neither; linkless.io has history but no links
        urls = [
            "https://a.com/" + "y" * 9,   # len 23: %7==2 -> changed
            "https://a.com/" + "y" * 16,  # len 30: 30%3=0, 30%7=2 -> changed
            "https://b.org/" + "z" * 7,   # len 21: neither
            "https://linkless.io/" + "w" * 1,  # len 21: neither
        ]
        texts = [f"t{i}" for i in range(len(urls))]
        pages = os.path.join(tmp_path, "pages.parquet")
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            pages,
        )
        got = _assert_match(
            webops.recrawl_priority(str(tmp_path), links_path=links, pages_path=pages),
            webops.recrawl_priority_oracle_sql(links, pages),
        )
        rows = {r.host: r.recrawl_fp for r in got.itertuples()}
        assert "linkless.io" not in rows  # no link-graph presence
        assert "c.net" not in rows        # no crawl history
        assert rows["a.com"] > 0          # volatile + ranked
        assert rows["b.org"] == 0         # ranked but static


class TestMirrorHosts:
    def test_planted_mirror_set(self, tmp_path, ray_session):
        # same body on 3 hosts -> 3 pairs; plus whatever the md5-rule
        # synthesizes — the oracle sees the identical stream
        urls = [
            "https://a.com/1",
            "https://b.org/1",
            "https://c.net/1",
            "https://a.com/2",
            "https://b.org/2",
        ]
        texts = ["same body"] * 3 + ["another shared", "another shared"]
        p = _write_pages(tmp_path, urls, texts)
        got = _assert_match(
            webops.mirror_hosts(str(tmp_path), pages_path=p),
            webops.mirror_hosts_oracle_sql(p),
        )
        pairs = {
            (r.host_a, r.host_b): r.n_shared for r in got.itertuples()
        }
        assert pairs[("a.com", "b.org")] == 2  # both planted bodies
        assert pairs[("a.com", "c.net")] == 1
        assert pairs[("b.org", "c.net")] == 1

    def test_randomized(self, tmp_path, ray_session):
        rng = random.Random(41)
        urls = [f"https://h{rng.randint(0, 4)}.com/{i}" for i in range(150)]
        texts = [f"payload {rng.randint(0, 20)}" for _ in urls]
        p = _write_pages(tmp_path, urls, texts)
        _assert_match(
            webops.mirror_hosts(str(tmp_path), pages_path=p),
            webops.mirror_hosts_oracle_sql(p),
        )

    def test_hot_hash_capped(self, tmp_path, ray_session):
        """One viral body on 1000 hosts must NOT produce ~500k pairs:
        the lexicographic-first-k cap bounds the group at O(k^2), and
        the oracle applies the identical QUALIFY rule so the result
        stays value-exact."""
        k = 8
        urls = [f"https://host{i:04d}.com/x" for i in range(1000)]
        texts = ["viral parking page"] * 1000
        # plus one normal mirrored pair that must survive the cap path
        urls += ["https://zz-a.com/1", "https://zz-b.org/1"]
        texts += ["normal body", "normal body"]
        p = _write_pages(tmp_path, urls, texts)
        got = _assert_match(
            webops.mirror_hosts(str(tmp_path), pages_path=p, max_hosts_per_hash=k),
            webops.mirror_hosts_oracle_sql(p, max_hosts_per_hash=k),
        )
        viral = got[got.host_a.str.startswith("host")]
        # the viral hash contributes at most k*(k-1)/2 pairs, not ~500k
        assert 0 < len(viral) <= k * (k - 1) // 2 + k * k  # + m. mirrors margin
        hosts_seen = set(viral.host_a) | set(viral.host_b)
        # only lexicographic-first hosts of the viral hash participate
        assert all(h <= "host0020.com" or h.startswith("m.host") for h in hosts_seen)
        pairs = {(r.host_a, r.host_b) for r in got.itertuples()}
        assert ("zz-a.com", "zz-b.org") in pairs


class TestHostDupRatio:
    def test_planted_within_host_dups(self, tmp_path, ray_session):
        """3 urls on a.com serving 2 distinct bodies → 333333 ppm; all
        unique on b.org → 0."""
        import duckdb

        rows = [
            ("https://a.com/1", "same"),
            ("https://a.com/2?sid=x", "same"),
            ("https://a.com/3", "other"),
            ("https://b.org/1", "u1"),
            ("https://b.org/2", "u2"),
        ]
        p = os.path.join(tmp_path, "pages.parquet")
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([r[0] for r in rows], pa.string()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            p,
        )
        got = {
            r["host"]: (r["n_pages"], r["n_distinct"], r["dup_ppm"])
            for r in webops.host_dup_ratio(str(tmp_path), pages_path=p).take_all()
        }
        con = duckdb.connect()
        want = {
            h: (n, d, ppm)
            for h, n, d, ppm in con.execute(
                webops.host_dup_ratio_oracle_sql(p)
            ).fetchall()
        }
        assert got == want
        assert got["a.com"] == (3, 2, 333333)
        assert got["b.org"] == (2, 2, 0)


class TestTextOutlinks:
    def test_synthesis_and_extraction(self, tmp_path, ray_session):
        """doc 0 hits both citation rules, doc 3 one, doc 1 none; a
        pre-existing in-text URL is also extracted (the kernel is a
        real scan, not the synthesis rule)."""
        import duckdb

        docs = {
            0: "alpha beta",              # cites ref0.example.org AND cdn0.example.net
            3: "gamma",                   # cites ref3.example.org
            1: "no citations here",
            2: "inline https://x.example.com/page mention",  # %3!=0? 2%3=2, %7=2
        }
        p = os.path.join(tmp_path, "documents.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string()),
                }
            ),
            p,
        )
        got = {
            r["host"]: (r["n_mentions"], r["n_docs"])
            for r in webops.text_outlinks(str(tmp_path)).take_all()
        }
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
        want = {
            h: (m, d)
            for h, m, d in con.execute(webops.text_outlinks_oracle_sql()).fetchall()
        }
        assert got == want
        assert got["ref0.example.org"] == (1, 1)
        assert got["cdn0.example.net"] == (1, 1)
        assert got["ref3.example.org"] == (1, 1)
        assert got["x.example.com"] == (1, 1)
        assert len(got) == 4


class TestHoldoutSplit:
    def test_parity_and_partition(self, ray_session, tmp_path):
        """Randomized host set: value parity with the SQL twin, the
        splits partition the corpus exactly, and every host lands in
        one split (host-level leakage safety by construction)."""
        rng = random.Random(7)
        hosts = [f"h{i}.example" for i in range(40)]
        urls = [
            f"http://{rng.choice(hosts)}/p{j}?s={rng.randrange(5)}"
            for j in range(300)
        ]
        p = _write_pages(tmp_path, urls)
        ds = webops.holdout_split(str(tmp_path), pages_path=p)
        _assert_match(ds, webops.holdout_split_oracle_sql(p))
        got = {r["split"]: r for r in ds.take_all()}
        assert set(got) <= {"train", "val", "test"}
        assert sum(r["n_pages"] for r in got.values()) == len(urls)

    def test_split_is_host_deterministic(self, ray_session, tmp_path):
        """A host's pages all share one split: a one-host corpus
        yields exactly one output row regardless of page count, and
        widening the corpus never moves an existing host (stateless
        salted gate — reproducible on any shard subset)."""
        from wbot_ray.pipelines.common import md5_lower64

        urls = [f"http://solo.example/p{i}" for i in range(25)]
        p = _write_pages(tmp_path, urls)
        rows = webops.holdout_split(str(tmp_path), pages_path=p).take_all()
        assert len(rows) == 1 and rows[0]["n_pages"] == 25
        r = md5_lower64(webops.SPLIT_SALT + "solo.example") % 100
        want = "test" if r < 5 else ("val" if r < 10 else "train")
        assert rows[0]["split"] == want


class TestWarcStats:
    def _pages(self, tmp_path, urls, texts, langs):
        import pandas as pd

        p = os.path.join(tmp_path, "pages.parquet")
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "warc_ts": pa.array(
                        pd.to_datetime([1_700_000_000_000_000 + i for i in range(len(urls))], unit="us"),
                        pa.timestamp("us"),
                    ),
                    "html": pa.array([t.encode() for t in texts], pa.binary()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(langs, pa.string()),
                }
            ),
            p,
        )
        return p

    def test_roundtrip_fingerprint_parity(self, ray_session, tmp_path):
        """The engine's stats come from a WARC-lite export + read-back
        while the oracle scans the original parquet — equality proves
        the connector loses/duplicates/corrupts nothing (XOR content
        fingerprint included). Non-ASCII text pins strlen=bytes."""
        urls = [f"http://h{i % 3}.example/p{i}" for i in range(40)]
        texts = [f"text {i} naïve café {'x' * (i % 7)}" for i in range(40)]
        langs = ["en" if i % 2 else "fr" for i in range(40)]
        p = self._pages(tmp_path, urls, texts, langs)
        ds = webops.warc_stats(str(tmp_path), pages_path=p)
        _assert_match(ds, webops.warc_stats_oracle_sql(p))


class TestJsonlStats:
    def test_roundtrip_fingerprint_parity(self, ray_session, tmp_path):
        """The engine's stats come from a write_json + read_json
        round-trip while the oracle scans the original parquet —
        equality proves Ray's JSONL connector loses/duplicates/mangles
        nothing. Bodies carry the JSON-hostile cases: embedded quotes,
        backslashes, newlines, non-ASCII (also pins strlen=bytes)."""
        urls = [f"http://h{i % 3}.example/p{i}" for i in range(40)]
        texts = [
            f'text {i} "quoted" back\\slash naïve café\nline2 {"x" * (i % 7)}'
            for i in range(40)
        ]
        langs = ["en" if i % 2 else "fr" for i in range(40)]
        p = os.path.join(tmp_path, "pages.parquet")
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(langs, pa.string()),
                }
            ),
            p,
        )
        ds = webops.jsonl_stats(str(tmp_path), pages_path=p)
        _assert_match(ds, webops.jsonl_stats_oracle_sql(p))
