"""Benchmark harness — the engine's feedback loop.

Headline: pages/sec fetch-parse-extract throughput of the BFS crawl over
the deterministic synthetic web ("bench" scale, ~93k pages), plus
wall-times of the flagship data pipelines over ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1).

Prints ONE JSON line::

    {"metric": "total_bench_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "crawl": {"pages": N, "sec": N, "pages_per_sec": N}}

``--scaling`` runs the crawl headline twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs + scaling efficiency (the two-cluster-size criterion,
evidenced at two parallelism levels as this sandbox has no real
cluster).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

BENCH_SCALE = "bench"
N_SEEDS = 200
MAX_DEPTH = 5


def _bench_root(scale: str = BENCH_SCALE) -> str:
    """Cache root keyed by the CONTENT of the bench fixture config: a
    machine with a stale cache from an older SCALES entry must
    regenerate, not silently benchmark the old corpus."""
    import hashlib

    from wbot_ray.sources.fixtures import SCALES

    key = hashlib.md5(
        json.dumps(SCALES[scale], sort_keys=True, default=str).encode()
    ).hexdigest()[:10]
    return f"/tmp/wbot_ray_bench/{key}"



def _init_ray(num_cpus: int) -> None:
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    # default shuffle parallelism (200) is sized for clusters; clamp to
    # the actual executor width so tiny shuffles don't pay 200-partition
    # fixed costs
    ctx.min_parallelism = num_cpus * 4

    # pre-warm the worker pool (process spawn + module import) so the
    # first timed pipeline measures the engine, not cluster bring-up —
    # on a real cluster this is `ray job submit` startup, not crawl time
    def _warm(batch):
        import duckdb  # noqa: F401  (md5 kernel connects on first use)
        import polars  # noqa: F401  (textops/dedup batch kernels)

        import wbot_ray.stages.fetch  # noqa: F401  (pre-import in workers)

        return batch

    ray.data.range(num_cpus * 4, override_num_blocks=num_cpus * 2).map_batches(
        _warm, batch_format="pyarrow"
    ).materialize()


NUM_BUCKETS = 192


def _bench_pages(scale: str = BENCH_SCALE) -> str:
    """Generate (once, cached) the bench-scale synthetic web — sharded
    per host in parallel Ray tasks (~190k pages at "bench", 4x that at
    "bench4x"; CC-realistic ~40 KB bodies). Requires an initialised
    Ray."""
    root = _bench_root(scale)
    os.makedirs(root, exist_ok=True)
    from wbot_ray.sources.fixtures import write_pages_sharded

    return write_pages_sharded(os.path.join(root, "pages"), scale)


def _bench_index(pages: str, scale: str = BENCH_SCALE) -> str:
    """Pre-build (once, cached) the bucketed web index — the storage
    layout of the simulated web, shared by all bench runs."""
    from wbot_ray.web_index import build_web_index

    index_dir = os.path.join(_bench_root(scale), "index")
    build_web_index(pages, index_dir, NUM_BUCKETS)
    return index_dir


def run_crawl_bench(num_cpus: int, scale: str = BENCH_SCALE, n_seeds: int = N_SEEDS) -> dict:
    """Time the full fetch-parse-extract crawl; pages/sec over all
    fetched (attempted) requests."""
    from wbot_ray.config import CrawlConfig
    from wbot_ray.driver import Crawler
    from wbot_ray.sources.fixtures import seeds_for_scale

    pages = _bench_pages(scale)
    index_dir = _bench_index(pages, scale)
    workdir = os.path.join(_bench_root(scale), f"run_cpus{num_cpus}")
    shutil.rmtree(workdir, ignore_errors=True)
    # partitioning is FIXED across parallelism levels so the scaling runs
    # execute identical work (only the executor width changes). Threshold
    # 128: ANY root above 128 frontier rows is salt-split, not just the
    # 20x hot host — fetch cost per row varies ~20x across roots (wide
    # bodies), so coarse parts made one task a 10 s straggler in a round
    # with 7 s of work per executor; sub-parts stride the sort key space,
    # spreading an expensive root across tasks (max part 9.5 s -> 3.1 s
    # measured at 32 CPUs, metrics byte-identical)
    cfg = CrawlConfig(
        max_depth=MAX_DEPTH,
        max_body_size=64 * 1024,
        num_buckets=NUM_BUCKETS,
        seen_shards=16,
        hot_host_threshold=128,
        # cost-based plan choice, measured on this box: a Dataset round
        # costs ~2 exchanges x ~1.3-2 s fixed latency + pipeline launch
        # regardless of rows, while the raw-task plan's driver-side merge
        # costs ~2 us/row — the crossover sits above the largest bench
        # round (~81k rows), so the bench crawl runs the raw-task plan at
        # BOTH parallelism levels (identical plans; only executor width
        # changes). At 10^10-URL scale every round clears this threshold
        # and the Dataset shuffle plan engages; the two plans are
        # output-parity-pinned by tests/test_engine.py.
        local_round_threshold=131_072,
    )
    seeds = seeds_for_scale(scale, n_seeds)
    # pre-warm the worker pool: start worker processes and import the
    # stage modules BEFORE the timed section, so the measurement is
    # steady-state crawl throughput, not Python cold-start (the same
    # one-time cost at both parallelism levels; on a long-lived cluster
    # it amortizes to zero)
    import ray

    @ray.remote
    def _warm() -> int:
        import wbot_ray.stages.dedup  # noqa: F401
        import wbot_ray.stages.fetch  # noqa: F401

        return 0

    ncpu = int(ray.cluster_resources().get("CPU", 1))
    ray.get([_warm.remote() for _ in range(2 * ncpu)])
    t0 = time.perf_counter()
    run = Crawler(cfg, workdir=workdir, shared_index_dir=index_dir).crawl(
        seeds=seeds, pages_path=pages
    )
    sec = time.perf_counter() - t0
    m = run.metrics_total()
    pages_n = m["total_requests"]
    return {
        "pages": int(pages_n),
        "sec": round(sec, 3),
        "pages_per_sec": round(pages_n / sec, 1),
        "rounds": len(run.manifest["rounds"]),
        "successful": int(m["successful_requests"]),
        "links_seen": int(m["total_link"]),
    }


QUERY_NAMES = [
        "text_stats",
        "lang_dist",
        "dedup_exact",
        "dedup_ngram",
        "dedup_minhash",
        "dedup_simhash",
        "dedup_embed",
        "dup_clusters",
        "knn_brute",
        "knn_ivf",
        "payload_features",
        "frame_features",
        "q1_pricing",
        "cust_order_stats",
        "events_hourly",
        "events_sliding",
        "topk_users",
        "sessionize",
        "asof_prior_event",
        "heavy_hitters",
        "corpus_filter",
        "group_topn",
        "price_quantiles",
        "sample_hash",
        "pack_sequences",
        "audio_features",
        "ngram_counts",
        "tfidf_topterms",
        "stratified_sample",
        "weighted_sample",
        "orders_rollup",
        "length_sketch_quantiles",
        "normalize_text",
        "urgent_orders_by_year",
        "link_pagerank",
        "decontaminate",
        "price_band_join",
        "dedup_keep",
        "dedup_segments",
        "global_shuffle",
        "quality_score",
        "freq_quality",
        "term_search",
        "embed_docs",
        "link_degrees",
        "order_priority_revenue",
        "daily_active_users",
        "approx_distinct_users",
        "kmeans_clusters",
        "prepare_corpus",
        "crawl_text_stats",
        "window_pairs",
        "funnel_steps",
        "export_corpus",
        "q3_shipping",
        "churned_users",
        "repetition_stats",
        "props_by_type",
        "user_running_value",
        "events_pivot",
        "orders_cube",
        "user_day_share",
        "semantic_search",
        "doc_chunks",
        "price_range_scan",
        "pii_scrub",
        "source_mix",
        "length_deciles",
        "link_components",
        "host_graph",
        "host_components",
        "host_pagerank",
        "frontier_priority",
        "anchor_texts",
        "url_features",
        "url_blocklist",
        "link_gate_stats",
        "snapshot_latest",
        "crawl_depth_hist",
        "dup_spans",
        "dedup_span_apply",
        "host_text_stats",
        "token_counts",
        "doc_fingerprint",
        "langid",
        "events_anomaly",
        "region_acctbal",
        "phrase_search",
        "link_triangles",
        "corpus_diff",
        "compact_corpus",
        "crawl_traps",
        "change_rate",
        "boilerplate_lines",
        "mirror_hosts",
        "host_quota",
        "filter_funnel",
        "index_lookup",
        "dedup_url",
        "host_hits",
        "recrawl_priority",
        "bpe_pairs",
        "cooccur_counts",
        "retention_cohorts",
        "link_reciprocity",
        "upsert_merge",
        "degree_dist",
        "host_dup_ratio",
        "text_outlinks",
        "table_profile",
        "bm25_search",
        "lm_score",
        "dsir_logweight",
        "holdout_split",
        "warc_stats",
        "host_sssp",
        "ccnet_buckets",
        "bloom_semi_join",
        "zorder_layout",
        "inverted_postings",
        "link_kcore",
        "cms_sketch",
        "jsonl_stats",
        "late_events",
]


def run_query_bench(
    sf_dir: str, isolated: bool = False, num_cpus: int = 32
) -> dict[str, float]:
    """Wall-time the flagship data pipelines at sf0.1.

    ``isolated=True`` tears Ray down and brings a fresh session up
    BEFORE each query (``bench.py --isolated``): per-query numbers then
    measure the pipeline alone, free of actor-pool spin-up contention
    from whatever ran before it in the shared-session sweep (embed_docs
    measured 2.40 in-bench vs 1.79 isolated in round 4). Session
    bring-up happens outside the timed region."""
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in QUERY_NAMES:
        if isolated:
            import ray

            if ray.is_initialized():
                ray.shutdown()
            _init_ray(num_cpus)
        t0 = time.perf_counter()
        res = qs[name](sf_dir)
        # consume fully (streaming execution is lazy)
        if hasattr(res, "iter_batches"):
            n = 0
            for b in res.iter_batches(batch_format="pyarrow"):
                n += b.num_rows
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def run_ivf_scale_bench(sf_dir: str) -> dict:
    """knn_ivf at scale-path parameters (64 coarse centroids, nprobe 4):
    the pruned-read accounting proves the inverted layout reads a
    minority of the corpus while serving the query batch."""
    from wbot_ray.pipelines import similarity

    t0 = time.perf_counter()
    ds = similarity.knn_ivf(sf_dir, n_queries=8, k=10, n_centroids=64, nprobe=4)
    n = sum(b.num_rows for b in ds.iter_batches(batch_format="pyarrow"))
    return {
        "sec": round(time.perf_counter() - t0, 3),
        "result_rows": n,
        **similarity.LAST_PRUNE_STATS,
    }


def run_minhash_exchange_bench(sf_dir: str) -> dict:
    """dedup_minhash exchange-byte accounting: proves the meta/payload
    split ships the 512-B signatures twice, not once per band row."""
    from wbot_ray.pipelines import dedup

    t0 = time.perf_counter()
    stats = dedup.minhash_exchange_stats(sf_dir)
    return {"sec": round(time.perf_counter() - t0, 3), **stats}


def one(
    num_cpus: int,
    sf_dir: str,
    crawl_only: bool,
    scale: str = BENCH_SCALE,
    n_seeds: int = N_SEEDS,
) -> dict:
    _init_ray(num_cpus)
    crawl = run_crawl_bench(num_cpus, scale, n_seeds)
    queries = {} if crawl_only else run_query_bench(sf_dir)
    ivf_scale = {} if crawl_only else run_ivf_scale_bench(sf_dir)
    mh_scale = {} if crawl_only else run_minhash_exchange_bench(sf_dir)
    total = (
        crawl["sec"]
        + sum(queries.values())
        + ivf_scale.get("sec", 0)
        + mh_scale.get("sec", 0)
    )
    return {
        "metric": "total_bench_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "knn_ivf_scale": ivf_scale,
        "minhash_exchange": mh_scale,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "crawl": crawl,
    }


# Official scaling job: the 4x corpus. The 1x bench was the right job
# on the round-2 engine (its ~80 s pair load rode a recharged credit
# bucket; a 4x job drained it — measured 0.487). The session-13
# hot-path work then made the engine 3.8x cheaper, which flipped the
# trade BOTH ways: the 1x job became fixed-cost-dominated (structural
# pair ~0.6 — Amdahl fit W≈123 cpu-s, F≈4.05 s), while the 4x job's
# pair load fell to ~115 s, the same budget the old 1x had. Round-3
# measurements confirm: two post-idle bench4x pairs recorded 0.93 and
# 0.976 (BASELINE.md) against the fit's 0.88 projection.
SCALING_SCALE = "bench4x"
SCALING_SEEDS = 600


def scaling(
    sf_dir: str,
    lo: int = 8,
    hi: int = 32,
    reps: int = 2,
    cooldown: int = 5,
    scale: str = SCALING_SCALE,
    n_seeds: int = SCALING_SEEDS,
) -> dict:
    """Same crawl job at two parallelism levels in fresh processes.

    The job is the 4x corpus (``SCALES['bench4x']``, 600 seeds) — see
    the ``SCALING_SCALE`` comment for the full history: on the slower
    round-2 engine the 1x crawl was the largest job that could ride a
    recharged hypervisor credit bucket (a 4x run drained it and
    measured the hypervisor, 0.487), but the session-13 3.8x hot-path
    speedup made the 1x job fixed-cost-dominated (structural ~0.6)
    and brought the 4x pair load down to the old 1x budget (~115 s).
    The protocol that measures the ENGINE on this credit-throttled
    host is unchanged: launch as the first workload after a long
    (≥25 min) fully-idle stretch. Round-3 post-idle bench4x pairs:
    0.93 and 0.976 (Amdahl projection 0.88).

    Each level runs ``reps`` times. Reported: the BEST-pair efficiency
    (minimum wall per level — the standard low-noise estimator of
    attainable throughput on a shared box with ±20% noise bursts) AND
    the per-rep pair efficiencies with their MEDIAN (``value`` is the
    median — the conservative headline). The hi level runs first in
    each rep so cache-warming order favors (conservatively) the lo
    level.

    Each child is pinned to a physical CPU set (``taskset -c 0-(n-1)``)
    matching its Ray budget: ``ray.init(num_cpus=n)`` only caps TASK
    SLOTS, so on an otherwise-idle 32-core host an "8-CPU" leg can
    borrow extra cores (object-store/raylet threads, per-task kernel
    threads) and record impossible throughput — one measured window
    logged an 8-CPU leg at 4,227 pages/s, 1.5× the honest 8-core
    envelope, crushing the efficiency ratio. The OS pin makes the
    small-cluster leg a real small cluster in both directions."""
    # corpus + index prepared ONCE here so neither timed run pays for
    # them — skipped entirely when the cache markers exist (a no-op prep
    # session still burns ~60 s of 32-CPU churn right before the timed
    # children, widening the noise-exposure window)
    from wbot_ray.web_index import INDEX_FORMAT

    root = _bench_root(scale)
    cached = os.path.exists(os.path.join(root, "pages", "_DONE")) and os.path.exists(
        os.path.join(root, "index", f"_DONE-v{INDEX_FORMAT}")
    )
    if not cached:
        _init_ray(hi)
        _bench_index(_bench_pages(scale), scale)
        import ray

        ray.shutdown()
        time.sleep(10)  # let the prep session's raylet fully exit
    # warm the PAGE CACHE over the corpus + index before any timed leg:
    # after a long idle the first leg pays cold-file IO the second leg
    # then inherits warm — measured in one clean window as ~9 s of extra
    # fixed cost on the (first) 32-CPU leg, turning a structural 0.85
    # pair into 0.61. A sequential read costs no CPU worth noticing and
    # makes the two legs IO-equal.
    for sub in ("pages", "index"):
        d = os.path.join(root, sub)
        for dirpath, _, files in os.walk(d):
            for fn in files:
                try:
                    with open(os.path.join(dirpath, fn), "rb") as fh:
                        while fh.read(1 << 24):
                            pass
                except OSError:
                    pass
    best: dict[int, dict] = {}
    runs: list[dict] = []
    for _ in range(reps):
        for n in (hi, lo):
            # flush the previous run's dirty pages so its writeback
            # doesn't steal IO from the next timed run
            subprocess.run(["sync"], check=False)
            # previous session teardown must drain; on hosts with
            # hypervisor CPU-credit throttling (steal appears ONLY under
            # our own sustained load on this sandbox), a long cooldown
            # lets the credit bucket refill between timed runs
            time.sleep(max(5, cooldown))
            try:
                with open("/proc/loadavg") as lf:
                    load1_before = float(lf.read().split()[0])
            except OSError:
                load1_before = None
            cpuset = f"0-{n - 1}"
            cmd = [
                sys.executable,
                os.path.abspath(__file__),
                "--one",
                "--cpus",
                str(n),
                "--crawl-only",
                "--scale",
                scale,
                "--seeds",
                str(n_seeds),
            ]
            if shutil.which("taskset"):
                cmd = ["taskset", "-c", cpuset] + cmd
            proc = subprocess.run(
                cmd,
                capture_output=True,
                text=True,
                env={**os.environ, "RAY_GRAFT_CPUS": str(n)},
                check=False,
            )
            try:
                with open("/proc/loadavg") as lf:
                    load1 = float(lf.read().split()[0])
            except OSError:
                load1 = None
            lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
            if not lines:
                raise RuntimeError(
                    f"scaling child (cpus={n}) produced no JSON; "
                    f"exit={proc.returncode}\nstderr tail:\n"
                    + "\n".join(proc.stderr.strip().splitlines()[-20:])
                )
            r = json.loads(lines[-1])
            # load1 is sampled right after the child exits: external load
            # on this shared box crushes the hi level far more than the
            # lo level, so the context is part of the record
            # load1_before (sampled after the settle, before launch) is
            # the EXTERNAL-noise indicator; load1_after mostly reflects
            # the run's own decaying load
            runs.append(
                {
                    "cpus": n,
                    "cpuset": cpuset if shutil.which("taskset") else None,
                    "pages_per_sec": r["crawl"]["pages_per_sec"],
                    "load1_before": load1_before,
                    "load1_after": load1,
                }
            )
            if n not in best or r["crawl"]["sec"] < best[n]["crawl"]["sec"]:
                best[n] = r
            time.sleep(2)
    thr_lo = best[lo]["crawl"]["pages_per_sec"]
    thr_hi = best[hi]["crawl"]["pages_per_sec"]
    best_eff = (thr_hi / thr_lo) / (hi / lo)
    # per-rep pairs: rep i's hi run against rep i's lo run
    hi_runs = [r["pages_per_sec"] for r in runs if r["cpus"] == hi]
    lo_runs = [r["pages_per_sec"] for r in runs if r["cpus"] == lo]
    pair_effs = sorted(
        round((h / l) / (hi / lo), 3) for h, l in zip(hi_runs, lo_runs)
    )
    median_eff = pair_effs[len(pair_effs) // 2] if len(pair_effs) % 2 else round(
        (pair_effs[len(pair_effs) // 2 - 1] + pair_effs[len(pair_effs) // 2]) / 2, 3
    )
    return {
        "metric": "scaling_efficiency",
        "value": median_eff,
        "unit": "ratio",
        "best_pair_efficiency": round(best_eff, 3),
        "pair_efficiencies": pair_effs,
        "lo_cpus": lo,
        "hi_cpus": hi,
        "lo_pages_per_sec": thr_lo,
        "hi_pages_per_sec": thr_hi,
        "all_runs": runs,
        "scale": scale,
        "n_seeds": n_seeds,
        "sf": sf_dir,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--isolated", action="store_true")
    ap.add_argument("--one", action="store_true")
    ap.add_argument("--crawl-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--cooldown", type=int, default=5)
    ap.add_argument("--scale", type=str, default=None)
    ap.add_argument("--seeds", type=int, default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = args.cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if args.isolated:
        # per-query numbers in a FRESH Ray session each — the
        # contention-free column regressions get diagnosed against
        _init_ray(num_cpus)
        queries = run_query_bench(sf_dir, isolated=True, num_cpus=num_cpus)
        print(
            json.dumps(
                {
                    "metric": "isolated_query_sec",
                    "value": round(sum(queries.values()), 3),
                    "unit": "sec",
                    "queries_isolated": queries,
                    "sf": sf_dir,
                    "num_cpus": num_cpus,
                }
            )
        )
    elif args.scaling:
        print(
            json.dumps(
                scaling(
                    sf_dir,
                    lo=args.lo,
                    hi=args.hi,
                    reps=args.reps,
                    cooldown=args.cooldown,
                    scale=args.scale or SCALING_SCALE,
                    n_seeds=args.seeds or SCALING_SEEDS,
                )
            )
        )
    else:
        print(
            json.dumps(
                one(
                    num_cpus,
                    sf_dir,
                    args.crawl_only,
                    scale=args.scale or BENCH_SCALE,
                    n_seeds=args.seeds or N_SEEDS,
                )
            )
        )
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
