"""End-to-end conformance: the Ray engine vs the sequential oracle.

The contract (BASELINE north rule): under the same seed list and config the
engine must produce the identical visited-URL set, identical crawl order,
byte-identical extracted text per url, and identical metrics counters as the
reference semantics (here: the ``tests/oracle.py`` replica of the Go
``parallel=1`` worker loop).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from tests.oracle import run_oracle
from wbot_ray.config import CrawlConfig, FilterRule
from wbot_ray.driver import Crawler
from wbot_ray.sources.fixtures import gen_pages, seeds_for_scale, write_pages


def _run_both(tmp_root, name, scale, seeds, cfg):
    pages = gen_pages(scale)
    pages_path = str(tmp_root / f"{name}_pages.parquet")
    pq.write_table(pages, pages_path)
    oracle = run_oracle(pages, seeds, cfg)
    run = Crawler(cfg, workdir=str(tmp_root / f"{name}_run")).crawl(
        seeds=seeds, pages_path=pages_path
    )
    return oracle, run


def _assert_conformance(oracle, run):
    # 1. identical crawl order: every popped request, in pop order
    visited = run.visited_table().to_pylist()
    expect = oracle.visited
    assert len(visited) == len(expect)
    for got, want in zip(visited, expect):
        assert got["crawl_ord"] == want["crawl_ord"]
        assert got["url"] == want["url"], (got["crawl_ord"], got["url"], want["url"])
        assert got["depth"] == want["depth"]
        assert got["url_hash"] == want["url_hash"]

    # 2. identical successful-fetch stream incl. byte-identical text
    got_rows = run.results_table().to_pylist()
    want_rows = oracle.results
    assert len(got_rows) == len(want_rows)
    for g, w in zip(got_rows, want_rows):
        assert g["url"] == w["url"]
        assert g["text"] == w["text"], g["url"]
        assert g["depth"] == w["depth"]
        assert g["lang"] == w["lang"]
        assert g["n_links"] == w["n_links"]
        assert g["crawl_ord"] == w["crawl_ord"]

    # 3. identical metrics counters
    got_m = run.metrics_total()
    for k, v in oracle.metrics.items():
        assert got_m[k] == v, (k, got_m[k], v)


@pytest.mark.usefixtures("ray_session")
class TestEngineConformance:
    def test_tiny_default(self, tmp_root):
        cfg = CrawlConfig(max_depth=4, num_buckets=4, seen_shards=2)
        oracle, run = _run_both(
            tmp_root, "tiny", "tiny", seeds_for_scale("tiny", 2), cfg
        )
        assert oracle.metrics["successful_requests"] > 5
        _assert_conformance(oracle, run)

    def test_tiny_bloom_seen_filter(self, tmp_root):
        """seen_filter="bloom" swaps the shard fast path; the exact
        digest set stays authoritative, so the visited set, results and
        metrics must match the sequential oracle bit-for-bit."""
        cfg = CrawlConfig(
            max_depth=4, num_buckets=4, seen_shards=2, seen_filter="bloom"
        )
        oracle, run = _run_both(
            tmp_root, "tiny_bloom", "tiny", seeds_for_scale("tiny", 2), cfg
        )
        _assert_conformance(oracle, run)

    def test_tiny_distributed_path(self, tmp_root):
        """local_round_threshold=0 forces every round through the full
        distributed pipeline (groupby shuffles + Dataset sort); output
        must be identical to the local fast path and the oracle."""
        cfg = CrawlConfig(
            max_depth=4, num_buckets=4, seen_shards=2,
            local_round_threshold=0, driver_order_threshold=0,
        )
        oracle, run = _run_both(
            tmp_root, "tiny_dist", "tiny", seeds_for_scale("tiny", 2), cfg
        )
        _assert_conformance(oracle, run)

    def test_small_with_truncation_and_rules(self, tmp_root):
        cfg = CrawlConfig(
            max_depth=3,
            max_body_size=32 * 1024,  # bites on the oversized page's tail links
            num_buckets=8,
            seen_shards=4,
            local_round_threshold=64,  # rounds straddle both execution paths
            filter_rules=[FilterRule(hostname="site2.com", disallow=[r"/p/1\d$"])],
            user_agents=["ua-a", "ua-b"],
        )
        oracle, run = _run_both(
            tmp_root, "small", "small", seeds_for_scale("small", 3), cfg
        )
        assert oracle.metrics["duplicated_link"] > 0
        assert oracle.metrics["failed_requests"] > 0
        _assert_conformance(oracle, run)

    def test_strict_mode_scope(self, tmp_root):
        cfg = CrawlConfig(max_depth=3, mode="strict", num_buckets=4, seen_shards=2)
        oracle, run = _run_both(
            tmp_root, "strict", "tiny", seeds_for_scale("tiny", 1), cfg
        )
        # strict scoping must keep notsite0.com out
        assert all("notsite0" not in r["url"] for r in run.visited_table().to_pylist())
        _assert_conformance(oracle, run)

    def test_resume_matches_full_run(self, tmp_root):
        cfg = CrawlConfig(max_depth=3, num_buckets=4, seen_shards=2)
        pages = gen_pages("tiny")
        pages_path = str(tmp_root / "resume_pages.parquet")
        pq.write_table(pages, pages_path)
        seeds = seeds_for_scale("tiny", 2)

        full = Crawler(cfg, workdir=str(tmp_root / "full_run")).crawl(
            seeds=seeds, pages_path=pages_path
        )
        partial_dir = str(tmp_root / "partial_run")
        Crawler(cfg, workdir=partial_dir).crawl(
            seeds=seeds, pages_path=pages_path, stop_after_round=1
        )
        resumed = Crawler(cfg, workdir=partial_dir).crawl(resume=True)

        assert resumed.visited_table().equals(full.visited_table())
        assert resumed.metrics_total() == full.metrics_total()

    def test_fsspec_workdir_matches_local(self, tmp_root):
        """Shared-storage checkpoint contract: with the workdir on an
        fsspec URL (file:// — the one protocol Ray worker processes can
        also see; memory:// is per-process by design), frontier rounds,
        results, seen-set deltas, metrics sidecars and the MANIFEST all
        route through fsspec, and the crawl output is byte-identical to
        a bare-local-path run. Includes interrupt + resume ON the fsspec
        workdir — the multi-node story where a resumed driver reads
        another machine's checkpoints."""
        cfg = CrawlConfig(max_depth=3, num_buckets=4, seen_shards=2)
        pages = gen_pages("tiny")
        pages_path = str(tmp_root / "fs_pages.parquet")
        pq.write_table(pages, pages_path)
        seeds = seeds_for_scale("tiny", 2)

        local = Crawler(cfg, workdir=str(tmp_root / "fs_local")).crawl(
            seeds=seeds, pages_path=pages_path
        )
        fs_wd = "file://" + str(tmp_root / "fs_remote")
        remote = Crawler(cfg, workdir=fs_wd).crawl(
            seeds=seeds, pages_path=pages_path
        )
        assert remote.visited_table().equals(local.visited_table())
        assert remote.results_table().equals(local.results_table())
        assert remote.metrics_total() == local.metrics_total()
        # the checkpoint layout actually lives where the URL says
        import os as _os

        base = str(tmp_root / "fs_remote")
        for sub in ("MANIFEST.json", "frontier", "results", "seen", "metrics"):
            assert _os.path.exists(_os.path.join(base, sub)), sub

        # interrupt + resume entirely on the fsspec workdir
        part_wd = "file://" + str(tmp_root / "fs_partial")
        Crawler(cfg, workdir=part_wd).crawl(
            seeds=seeds, pages_path=pages_path, stop_after_round=1
        )
        resumed = Crawler(cfg, workdir=part_wd).crawl(resume=True)
        assert resumed.visited_table().equals(local.visited_table())
        assert resumed.metrics_total() == local.metrics_total()


@pytest.mark.usefixtures("ray_session")
def test_write_pages_roundtrip(tmp_root):
    p = write_pages(str(tmp_root / "rt.parquet"), "tiny")
    t = pq.read_table(p)
    assert t.num_rows > 50
    assert t.schema.names == ["url", "warc_ts", "html", "text", "lang"]


@pytest.mark.usefixtures("ray_session")
class TestExtensionSurface:
    """Reference §2.10 seams: OnReponse post-stage + pluggable Fetcher."""

    def test_on_response_stage(self, tmp_root):
        import pyarrow as pa

        def enrich(results: pa.Table) -> pa.Table:
            n_tok = [len(t.split()) if t else 0 for t in results.column("text").to_pylist()]
            return results.append_column("n_tokens", pa.array(n_tok, pa.int64()))

        cfg = CrawlConfig(max_depth=2, num_buckets=4, seen_shards=2, on_response=enrich)
        pages = gen_pages("tiny")
        pages_path = str(tmp_root / "onresp_pages.parquet")
        pq.write_table(pages, pages_path)
        run = Crawler(cfg, workdir=str(tmp_root / "onresp_run")).crawl(
            seeds=seeds_for_scale("tiny", 2), pages_path=pages_path
        )
        ds = run.results_dataset(columns=["status", "n_tokens"])
        rows = ds.take_all()
        assert all("n_tokens" in r for r in rows)
        assert any(r["n_tokens"] > 0 for r in rows if r["status"] == 200)

    def test_pluggable_fetcher(self, tmp_root):
        from wbot_ray.stages.fetch import make_fetch_group_fn
        import pyarrow as pa

        def shouting_fetcher(index_dir, cfg):
            inner = make_fetch_group_fn(index_dir, cfg)

            def fetch(group: pa.Table) -> pa.Table:
                res = inner(group)
                texts = [t.upper() if t else t for t in res.column("text").to_pylist()]
                i = res.schema.get_field_index("text")
                return res.set_column(i, "text", pa.array(texts, pa.string()))

            return fetch

        cfg = CrawlConfig(
            max_depth=2, num_buckets=4, seen_shards=2, fetcher_factory=shouting_fetcher
        )
        pages = gen_pages("tiny")
        pages_path = str(tmp_root / "plugf_pages.parquet")
        pq.write_table(pages, pages_path)
        run = Crawler(cfg, workdir=str(tmp_root / "plugf_run")).crawl(
            seeds=seeds_for_scale("tiny", 2), pages_path=pages_path
        )
        texts = [r["text"] for r in run.results_table().to_pylist()]
        assert texts and all(t == t.upper() for t in texts)

    def test_metrics_monitor_seam(self, tmp_root):
        """A custom monitor (metrics_factory, reference MetricsMonitor
        pkg/api/wbot.go:55-66) sees the same 7 counters crawl_metrics /
        the manifest report — per-round deltas summing to the totals."""
        from wbot_ray.driver import METRIC_KEYS
        from wbot_ray.metrics import CounterMonitor

        made = []

        def factory():
            m = CounterMonitor()
            made.append(m)
            return m

        cfg = CrawlConfig(
            max_depth=2, num_buckets=4, seen_shards=2, metrics_factory=factory
        )
        pages = gen_pages("tiny")
        pages_path = str(tmp_root / "mon_pages.parquet")
        pq.write_table(pages, pages_path)
        run = Crawler(cfg, workdir=str(tmp_root / "mon_run")).crawl(
            seeds=seeds_for_scale("tiny", 2), pages_path=pages_path
        )
        assert len(made) == 1
        mon = made[0]
        totals = run.metrics_total()
        assert mon.metrics() == {k: totals[k] for k in METRIC_KEYS}
        # per-round deltas match the manifest's round metrics exactly
        assert [rid for rid, _ in mon.rounds] == list(range(len(mon.rounds)))
        for (rid, delta), m in zip(mon.rounds, run.round_metrics()):
            assert delta == {k: m[k] for k in METRIC_KEYS}, rid

    def test_log_level_option(self, tmp_root):
        """log_level (reference WithLogLevel, option.go:59-63) sets the
        wbot_ray logger tree level; bad names fail fast."""
        import logging

        lg = logging.getLogger("wbot_ray")
        before = lg.level
        try:
            Crawler(CrawlConfig(log_level="debug"), workdir=str(tmp_root / "lg"))
            assert lg.level == logging.DEBUG
            Crawler(CrawlConfig(log_level="ERROR"), workdir=str(tmp_root / "lg"))
            assert lg.level == logging.ERROR
            with pytest.raises(ValueError, match="log_level"):
                Crawler(CrawlConfig(log_level="loud"), workdir=str(tmp_root / "lg"))
        finally:
            lg.setLevel(before)


@pytest.mark.usefixtures("ray_session")
class TestHotRootPoliteness:
    def test_salted_hot_root_budget_is_exact(self, tmp_root):
        """A salted hot root's frontier rows span k fetch sub-partitions,
        so group-local vmax understates its politeness budget by ~k; the
        driver must report the EXACT global per-root budget
        (max over roots of ceil(n/rate)*interval) regardless of salting."""
        import glob
        import math
        import os

        cfg = CrawlConfig(
            max_depth=3, num_buckets=4, seen_shards=2, hot_host_threshold=4
        )
        pages = gen_pages("tiny")
        pages_path = str(tmp_root / "hot_pages.parquet")
        pq.write_table(pages, pages_path)
        wd = str(tmp_root / "hot_run")
        run = Crawler(cfg, workdir=wd).crawl(
            seeds=seeds_for_scale("tiny", 2), pages_path=pages_path
        )
        rounds = run.manifest["rounds"]
        assert any(r["metrics"].get("hot_roots", 0) > 0 for r in rounds), (
            "fixture/threshold no longer produces a hot root — test is vacuous"
        )
        for r in rounds:
            d = r["round"]
            files = glob.glob(os.path.join(wd, "frontier", f"round={d}", "*.parquet"))
            counts: dict[str, int] = {}
            for f in files:
                for root in pq.read_table(f, columns=["root"]).column("root").to_pylist():
                    counts[root] = counts.get(root, 0) + 1
            want = 0.0
            for root, n in counts.items():
                rate, interval = cfg.rate_for_root(root)
                want = max(want, math.ceil(n / rate) * interval)
            got = r["metrics"]["virtual_politeness_sec"]
            assert got == pytest.approx(want), (d, got, want)


@pytest.mark.usefixtures("ray_session")
class TestFusedFetchRetrySafety:
    """The fused fetch task's contract under Ray task retry
    (fetch.py docstring: deterministic file names, tmp + atomic rename
    of identical content): running the SAME task twice must return a
    byte-identical candidate table and leave identical results /
    sidecar files modulo wall-clock telemetry (elapsed_ms / sec_*) —
    the property that makes fetch (unlike dedup, which is
    replay-protected in the actor) freely retryable."""

    def test_rerun_is_byte_identical(self, tmp_root):
        import glob
        import os

        import pyarrow.compute as pc

        from wbot_ray.stages.fetch import make_assign_fetch_part, make_fused_fetch_fn
        from wbot_ray.stages.normalize import seeds_to_frontier
        from wbot_ray.web_index import build_web_index

        pages = gen_pages("tiny")
        pages_path = str(tmp_root / "retry_pages.parquet")
        pq.write_table(pages, pages_path)
        cfg = CrawlConfig(max_depth=2, num_buckets=4, seen_shards=2)
        index_dir = str(tmp_root / "retry_index")
        build_web_index(pages_path, index_dir, cfg.num_buckets)
        results_dir = str(tmp_root / "retry_results")
        metrics_dir = str(tmp_root / "retry_metrics")
        os.makedirs(results_dir)
        os.makedirs(metrics_dir)

        frontier = seeds_to_frontier(seeds_for_scale("tiny", 2), cfg)
        assigned = make_assign_fetch_part(cfg, {})(frontier)
        fused = make_fused_fetch_fn(index_dir, cfg, results_dir, metrics_dir, {})

        def snapshot() -> dict[str, bytes]:
            out = {}
            for d in (results_dir, metrics_dir):
                for f in sorted(glob.glob(os.path.join(d, "*"))):
                    with open(f, "rb") as fh:
                        out[f] = fh.read()
            return out

        parts = sorted(set(assigned.column("fetch_part").to_pylist()))
        assert parts, "no fetch partitions — fixture regression"
        outs1 = [
            fused(assigned.filter(pc.equal(assigned.column("fetch_part"), p)))
            for p in parts
        ]
        snap1 = snapshot()
        assert snap1, "fetch wrote no artifacts"
        # the "retry": same partitions, same task fn, fresh closure state
        fused2 = make_fused_fetch_fn(index_dir, cfg, results_dir, metrics_dir, {})
        outs2 = [
            fused2(assigned.filter(pc.equal(assigned.column("fetch_part"), p)))
            for p in parts
        ]
        snap2 = snapshot()
        for a, b in zip(outs1, outs2):
            assert a.equals(b)
        assert set(snap1) == set(snap2)
        for f in snap1:
            if f.endswith(".json"):
                # timing fields are wall-clock; everything else must match
                import json as _json

                a, b = _json.loads(snap1[f]), _json.loads(snap2[f])
                a = {k: v for k, v in a.items() if not k.startswith("sec_")}
                b = {k: v for k, v in b.items() if not k.startswith("sec_")}
                assert a == b, f
            else:
                # results parquet: every column must round-trip
                # identically EXCEPT elapsed_ms, which is wall-clock
                # telemetry (the same exemption as sec_ in the json
                # sidecars — on a fast box it is 0 everywhere and the
                # files are byte-identical, but the contract is
                # content-identity of the non-telemetry columns)
                import io

                ta = pq.read_table(io.BytesIO(snap1[f])).drop_columns(["elapsed_ms"])
                tb = pq.read_table(io.BytesIO(snap2[f])).drop_columns(["elapsed_ms"])
                assert ta.equals(tb), f


@pytest.mark.usefixtures("ray_session")
class TestStoreQueueSeams:
    """The WithStore / WithQueue equivalents (reference option.go:49-58):
    a custom store and a custom queue plugged via config must carry the
    whole crawl with identical output — and demonstrably be the objects
    in use."""

    def test_pluggable_store_and_queue(self, tmp_root):
        from wbot_ray.state.frontier import ParquetFrontier
        from wbot_ray.state.seen import SeenSet

        calls = {"store": 0, "queue_writes": 0, "queue_reads": 0}

        class CountingStore(SeenSet):
            def flush_deltas_async(self, round_id, round_dir):
                calls["store"] += 1
                return super().flush_deltas_async(round_id, round_dir)

        class CountingQueue(ParquetFrontier):
            def write_table(self, d, tbl):
                calls["queue_writes"] += 1
                return super().write_table(d, tbl)

            def read_table(self, d):
                calls["queue_reads"] += 1
                return super().read_table(d)

        cfg_plain = CrawlConfig(max_depth=3, num_buckets=4, seen_shards=2)
        cfg_plugged = CrawlConfig(
            max_depth=3,
            num_buckets=4,
            seen_shards=2,
            store_factory=lambda cfg: CountingStore(cfg.seen_shards),
            queue_factory=lambda wd, cfg: CountingQueue(wd),
        )
        pages = gen_pages("tiny")
        pages_path = str(tmp_root / "seam_pages.parquet")
        pq.write_table(pages, pages_path)
        seeds = seeds_for_scale("tiny", 2)

        run_a = Crawler(cfg_plain, workdir=str(tmp_root / "seam_a")).crawl(
            seeds=seeds, pages_path=pages_path
        )
        run_b = Crawler(cfg_plugged, workdir=str(tmp_root / "seam_b")).crawl(
            seeds=seeds, pages_path=pages_path
        )
        assert calls["store"] > 0 and calls["queue_writes"] > 0 and calls["queue_reads"] > 0
        assert run_a.metrics_total() == run_b.metrics_total()
        va = run_a.visited_table().to_pylist()
        vb = run_b.visited_table().to_pylist()
        assert va == vb


@pytest.mark.usefixtures("ray_session")
class TestPerSeedParams:
    def test_per_seed_max_body_size_inherited(self, tmp_root):
        """Param columns (max_body_size/timeout_ms) ride the frontier and
        children inherit the parent's values — a seed crawled with a tiny
        body cap yields truncated text down its whole subtree, while the
        other seed's subtree is untouched (reference api.Param semantics,
        crawler.go:174-179, 276-280)."""
        from wbot_ray.stages.normalize import seeds_to_frontier

        cfg = CrawlConfig(max_depth=2, num_buckets=4, seen_shards=2)
        pages = gen_pages("tiny")
        pages_path = str(tmp_root / "param_pages.parquet")
        pq.write_table(pages, pages_path)
        seeds = seeds_for_scale("tiny", 2)

        tiny_cap = 64
        f0 = seeds_to_frontier(
            seeds, cfg, params=[{"max_body_size": tiny_cap}, {}]
        )
        assert f0.column("max_body_size").to_pylist() == [tiny_cap, cfg.max_body_size]

        # drive a crawl with the override by writing round 0 manually
        crawler = Crawler(cfg, workdir=str(tmp_root / "param_run"))
        run = crawler.crawl(seeds=seeds, pages_path=pages_path)
        default_results = {r["url"]: r["text"] for r in run.results_table().to_pylist()}

        from wbot_ray.state.frontier import ParquetFrontier

        wd = str(tmp_root / "param_run2")
        crawler2 = Crawler(cfg, workdir=wd)
        run2 = crawler2.crawl(seeds=seeds, pages_path=pages_path)
        # overwrite round 0 with the per-seed override and resume-style rerun
        ParquetFrontier(wd).write_table(0, f0)
        import json as _json
        import os as _os

        with open(_os.path.join(wd, "MANIFEST.json")) as f:
            m = _json.load(f)
        m["rounds"], m["done"] = [], False
        with open(_os.path.join(wd, "MANIFEST.json"), "w") as f:
            _json.dump(m, f)
        run2 = crawler2.crawl(resume=True)
        capped_results = run2.results_table().to_pylist()

        seed0_root = seeds[0].split("://")[1].split("/")[0]
        saw_capped = saw_default = False
        for r in capped_results:
            full = default_results.get(r["url"])
            if full is None:
                continue
            if seed0_root in r["url"]:
                assert len(r["text"].encode()) <= len(full.encode())
                if len(full.encode()) > 0 and r["text"] != full:
                    saw_capped = True
            else:
                assert r["text"] == full
                saw_default = True
        assert saw_capped, "tiny cap produced no truncated text — param not applied"
        assert saw_default, "no default-cap page found — fixture degenerate"


@pytest.mark.usefixtures("ray_session")
class TestPriorityQueue:
    """The pluggable frontier priority (``cfg.priority_fn`` — the north
    rule's priority-queue seam). Invariants: the visited SET, metrics,
    and per-url text are priority-INDEPENDENT (dedup precedes ordering);
    only the within-round order changes, and it follows the priority."""

    def _crawl(self, tmp_root, name, cfg):
        import pyarrow.parquet as _pq

        from wbot_ray.sources.fixtures import gen_pages

        pages = gen_pages("tiny")
        pages_path = str(tmp_root / f"{name}_pages.parquet")
        _pq.write_table(pages, pages_path)
        return Crawler(cfg, workdir=str(tmp_root / f"{name}_run")).crawl(
            seeds=seeds_for_scale("tiny", 2), pages_path=pages_path
        )

    def _check_reversed(self, base, rev):
        """Order-independent invariants at max_depth=2 (no round after
        depth 2, so variant divergence cannot propagate): identical
        per-depth url_hash multisets (canonical identity — which
        http/https/www VARIANT wins first-wins legitimately follows pop
        order, exactly as the reference's FIFO would) and identical
        discovery metrics. Priority-dependent behavior: depth 1 — whose
        candidates carry identical ord64 in both runs (same seed
        parents) — comes out exactly reversed under negated priority."""
        vb = base.visited_table().to_pylist()
        vr = rev.visited_table().to_pylist()
        key = lambda r: (r["url_hash"], r["depth"])  # noqa: E731
        assert sorted(map(key, vb)) == sorted(map(key, vr))
        mb, mr = base.metrics_total(), rev.metrics_total()
        # successful/failed may differ (the surviving VARIANT of a hash
        # may or may not exist in the corpus); discovery counts may not
        for k in ("total_requests", "total_link", "skipped_link",
                  "crawled_link", "duplicated_link"):
            assert mb[k] == mr[k], k
        by_depth_b, by_depth_r = {}, {}
        for r in vb:
            by_depth_b.setdefault(r["depth"], []).append(r["url"])
        for r in vr:
            by_depth_r.setdefault(r["depth"], []).append(r["url"])
        assert by_depth_b[0] == by_depth_r[0]  # seed round: priority n/a
        assert len(by_depth_b.get(1, [])) > 1, "fixture: depth-1 too small"
        assert by_depth_r[1] == list(reversed(by_depth_b[1]))

    def test_negated_priority_reverses_rounds_local_path(self, tmp_root):
        import pyarrow as pa
        import pyarrow.compute as pc

        base = self._crawl(
            tmp_root, "prio_base", CrawlConfig(max_depth=2, num_buckets=4, seen_shards=2)
        )
        rev = self._crawl(
            tmp_root,
            "prio_rev",
            CrawlConfig(
                max_depth=2,
                num_buckets=4,
                seen_shards=2,
                priority_fn=lambda t: pc.multiply(
                    t.column("ord64"), pa.scalar(-1, pa.int64())
                ),
            ),
        )
        self._check_reversed(base, rev)

    def test_negated_priority_reverses_rounds_distributed_path(self, tmp_root):
        import pyarrow as pa
        import pyarrow.compute as pc

        common = dict(
            max_depth=2,
            num_buckets=4,
            seen_shards=2,
            local_round_threshold=0,  # force the Dataset pipeline
            driver_order_threshold=0,  # force the distributed sort
        )
        base = self._crawl(tmp_root, "dprio_base", CrawlConfig(**common))
        rev = self._crawl(
            tmp_root,
            "dprio_rev",
            CrawlConfig(
                **common,
                priority_fn=lambda t: pc.multiply(
                    t.column("ord64"), pa.scalar(-1, pa.int64())
                ),
            ),
        )
        self._check_reversed(base, rev)


@pytest.mark.usefixtures("ray_session")
class TestPriorityResume:
    def test_priority_crawl_resumes_identically(self, tmp_root):
        """Checkpoint/resume under priority mode: a run stopped after
        round 1 and resumed in a second Crawler must equal the
        uninterrupted priority run row-for-row (the ordering mode rides
        the frontier parquet, so resume needs no extra state)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        cfg_kwargs = dict(
            max_depth=3,
            num_buckets=4,
            seen_shards=2,
            priority_fn=lambda t: pc.multiply(
                t.column("ord64"), pa.scalar(-1, pa.int64())
            ),
        )
        pages = gen_pages("tiny")
        pages_path = str(tmp_root / "prio_resume_pages.parquet")
        pq.write_table(pages, pages_path)
        seeds = seeds_for_scale("tiny", 2)

        full = Crawler(CrawlConfig(**cfg_kwargs), workdir=str(tmp_root / "pr_full")).crawl(
            seeds=seeds, pages_path=pages_path
        )
        part_dir = str(tmp_root / "pr_part")
        Crawler(CrawlConfig(**cfg_kwargs), workdir=part_dir).crawl(
            seeds=seeds, pages_path=pages_path, stop_after_round=1
        )
        resumed = Crawler(CrawlConfig(**cfg_kwargs), workdir=part_dir).crawl(resume=True)

        assert resumed.visited_table().equals(full.visited_table())
        assert resumed.metrics_total() == full.metrics_total()


@pytest.mark.usefixtures("ray_session")
class TestChaos:
    def test_seen_actor_death_midrun_then_resume(self, tmp_root):
        """Worker-failure recovery at the flagship surface: a seen-shard
        actor dies MID-CRAWL (after round 0 committed, during round 1's
        checkpoint), the run aborts instead of silently dropping state,
        and a fresh Crawler with ``resume=True`` replays from the last
        manifested round to the exact visited set / order / metrics of
        an uninterrupted run."""
        import json
        import os

        import ray

        from wbot_ray.state.seen import SeenSet

        cfg_kw = dict(max_depth=3, num_buckets=4, seen_shards=2)
        pages = gen_pages("tiny")
        pages_path = str(tmp_root / "chaos_pages.parquet")
        pq.write_table(pages, pages_path)
        seeds = seeds_for_scale("tiny", 2)

        full = Crawler(CrawlConfig(**cfg_kw), workdir=str(tmp_root / "chaos_full")).crawl(
            seeds=seeds, pages_path=pages_path
        )

        class ChaosSeen(SeenSet):
            killed = False

            def flush_deltas_async(self, round_id, round_dir):
                if round_id >= 1 and not ChaosSeen.killed:
                    ChaosSeen.killed = True
                    ray.kill(self.shards[0], no_restart=True)
                return super().flush_deltas_async(round_id, round_dir)

        chaos_dir = str(tmp_root / "chaos_run")
        cfg = CrawlConfig(**cfg_kw, store_factory=lambda c: ChaosSeen(c.seen_shards))
        with pytest.raises(Exception):
            Crawler(cfg, workdir=chaos_dir).crawl(seeds=seeds, pages_path=pages_path)
        assert ChaosSeen.killed

        # the crash left a genuine mid-crawl state: at least one round
        # committed, fewer than the full run's
        manifest = os.path.join(chaos_dir, "MANIFEST.json")
        assert os.path.exists(manifest)
        with open(manifest) as f:
            committed = json.load(f)["rounds"]
        n_full_rounds = len(full.manifest["rounds"])
        assert 1 <= len(committed) < n_full_rounds

        resumed = Crawler(CrawlConfig(**cfg_kw), workdir=chaos_dir).crawl(resume=True)
        assert resumed.visited_table().equals(full.visited_table())
        assert resumed.metrics_total() == full.metrics_total()


@pytest.mark.usefixtures("ray_session")
class TestFaultInjection:
    """Mid-crawl seen-shard actor death — the north rule's resumable-
    restart story exercised END-TO-END, not just via process restart."""

    def _uninterrupted(self, tmp_root, cfg_kwargs):
        pages = gen_pages("tiny")
        pages_path = str(tmp_root / "fi_pages.parquet")
        pq.write_table(pages, pages_path)
        ref = Crawler(
            CrawlConfig(**cfg_kwargs), workdir=str(tmp_root / "fi_ref")
        ).crawl(seeds=seeds_for_scale("tiny", 2), pages_path=pages_path)
        return pages_path, ref

    def test_shard_death_after_flush_heals_in_crawl(self, tmp_root):
        """Kill a seen-shard actor right after its round deltas are
        durable: the crawl heals the one dead shard from its
        per-partition checkpoint lineage, retries the round, and
        FINISHES — visited set / results / metrics byte-identical to the
        uninterrupted run."""
        import ray

        from wbot_ray.state.seen import SeenSet

        cfg_kwargs = dict(max_depth=3, num_buckets=4, seen_shards=2)
        pages_path, ref = self._uninterrupted(tmp_root, cfg_kwargs)
        assert len(ref.manifest["rounds"]) >= 3  # the kill round exists

        class KillAfterFlush(SeenSet):
            killed = False

            def flush_deltas_async(self, round_id, round_dir):
                futs = super().flush_deltas_async(round_id, round_dir)
                if round_id == 1 and not KillAfterFlush.killed:
                    ray.get(futs)  # deltas durable BEFORE the failure
                    ray.kill(self.shards[0])
                    KillAfterFlush.killed = True
                return futs

        cfg = CrawlConfig(
            **cfg_kwargs,
            store_factory=lambda c: KillAfterFlush(
                c.seen_shards, filter_kind=c.seen_filter
            ),
        )
        run = Crawler(cfg, workdir=str(tmp_root / "fi_heal")).crawl(
            seeds=seeds_for_scale("tiny", 2), pages_path=pages_path
        )
        assert KillAfterFlush.killed  # the fault actually fired
        assert run.visited_table().equals(ref.visited_table())
        assert run.results_table().equals(ref.results_table())
        assert run.metrics_total() == ref.metrics_total()

    def test_shard_death_with_unflushed_deltas_resumes(self, tmp_root):
        """Kill a seen-shard actor BEFORE its round deltas flushed (the
        unrecoverable-in-process case): the crawl fails with the
        resume-guidance error, and crawl(resume=True) in a fresh Crawler
        replays from the last committed round to the byte-identical
        final state."""
        import ray

        cfg_kwargs = dict(max_depth=3, num_buckets=4, seen_shards=2)
        pages_path, ref = self._uninterrupted(tmp_root, cfg_kwargs)

        killed = []

        class KillMonitor:
            def on_round(self, round_id, counters):
                # on_round fires BEFORE the round's delta flush is
                # submitted — the shard dies holding undurable state
                if round_id == 1 and not killed:
                    shard = crawler_ref[0]._fi_seen.shards[0]
                    ray.kill(shard)
                    killed.append(round_id)

            def metrics(self):
                return {}

        # reach the live SeenSet through the store seam
        crawler_ref = []

        def store_factory(c):
            from wbot_ray.state.seen import SeenSet

            s = SeenSet(c.seen_shards, filter_kind=c.seen_filter)
            crawler_ref[0]._fi_seen = s
            return s

        cfg = CrawlConfig(
            **cfg_kwargs,
            store_factory=store_factory,
            metrics_factory=KillMonitor,
        )
        crawler = Crawler(cfg, workdir=str(tmp_root / "fi_resume"))
        crawler_ref.append(crawler)
        with pytest.raises(RuntimeError, match="unflushed deltas"):
            crawler.crawl(seeds=seeds_for_scale("tiny", 2), pages_path=pages_path)
        assert killed

        resumed = Crawler(
            CrawlConfig(**cfg_kwargs), workdir=str(tmp_root / "fi_resume")
        ).crawl(resume=True)
        assert resumed.visited_table().equals(ref.visited_table())
        assert resumed.results_table().equals(ref.results_table())
        assert resumed.metrics_total() == ref.metrics_total()
