"""Round driver — the Ray-Data-native replacement for the reference's
worker loop (``/root/reference/crawler.go:195-291``).

There is no per-request queue: the depth-``d`` frontier IS a
Parquet-checkpointed Dataset (owned by the pluggable
``wbot_ray.state.frontier.ParquetFrontier`` — the reference's Queue
seam), and one BFS round is ONE fused streaming pipeline (SURVEY §3.4)::

    frontier_d ──map_batches(assign fetch_part)──
      repartition(keys=[fetch_part])──per-group(FUSED:     # hash exchange at
          fetch index-lookup + truncate + extract + gates  # CPU-clamped width;
          + results sink + metric sidecar + explode)       # politeness-local
      repartition(keys=[seen_shard])──per-group(dedup +    # one check_and_set
          check_and_set + survivor root-count sidecar)     # per shard per round
      → order (driver merge if small, Dataset.sort if big)
      → assign crawl_ord → write frontier/round=d+1

Rounds below ``local_round_threshold`` frontier rows execute as raw Ray
tasks orchestrated by the driver — same stage functions, none of the
pipeline-launch/shuffle latency. Rounds terminate when the next frontier
is empty (the depth gate inside the fetch stage guarantees that by
``max_depth``); there are no sleep/status races like the reference's
termination heuristic (``crawler.go:203-212``).

Checkpoint/lineage layout under ``workdir`` (every round resumable)::

    index/                    bucketed web index (built once; url-sorted
                              buckets → row-group-pruned point lookups)
    frontier/round=<d>/       the round-d frontier (sorted, dense crawl_ord)
    results/round=<d>/        fetch output incl. nested `next` lineage
    metrics_parts/round=<d>/  per-fetch-group + per-dedup-shard sidecars
    seen/round=<d>/shard=<s>  per-shard seen-set deltas for the round
    metrics/round=<d>.json    per-round per-stage counters (metrics parity
                              with the reference's 7 atomics, metrics.go:8-17)
                              + per-stage wall-times + politeness budget
    MANIFEST.json             committed rounds — the resume point

Crash recovery: a round is visible only once MANIFEST.json records it
(atomic tmp+rename); resume deletes any un-manifested round directories,
replays seen-set deltas of committed rounds into fresh shard actors, and
re-runs from the first missing round. Round ``d``'s commit is deferred
until the end of round ``d+1`` so the seen-delta checkpoint writes
overlap the next round's pipeline — a crash costs at most one re-run
round, and re-runs are deterministic.
"""

from __future__ import annotations

import json
import logging
import math
import os

import pyarrow as pa
import ray.data

from wbot_ray import fsio
from wbot_ray.config import CrawlConfig
from wbot_ray.urlnorm import display_url

logger = logging.getLogger("wbot_ray.driver")
from wbot_ray.stages.dedup import make_dedup_fn
from wbot_ray.stages.fetch import make_assign_fetch_part, make_fused_fetch_fn
from wbot_ray.stages.normalize import FRONTIER_SCHEMA, seeds_to_frontier
from wbot_ray.stages.order import assign_crawl_ord
from wbot_ray.state.frontier import ParquetFrontier
from wbot_ray.state.seen import SeenSet
from wbot_ray.web_index import build_web_index

__all__ = ["Crawler", "CrawlRun"]

METRIC_KEYS = [
    "total_requests",
    "successful_requests",
    "failed_requests",
    "total_link",
    "crawled_link",
    "skipped_link",
    "duplicated_link",
]


def _clean(path: str) -> None:
    fsio.rmtree(path)


def _per_group(fn, key: str, sort_col: str | None = None):
    """Adapt a one-group-per-call stage fn to hash-repartitioned whole-
    block batches: ``repartition(keys=[key])`` co-locates every key's
    rows in exactly one block (so the one-call-per-key invariant — e.g.
    one ordered ``check_and_set`` per seen shard per round — still
    holds), this adapter splits the block into its key groups and calls
    ``fn`` once per group. ``sort_col``: total-order each group first,
    so side-effecting stages (the results sink's byte-identical-retry
    contract) are deterministic regardless of block arrival order."""
    import numpy as np
    import pyarrow.compute as pc

    def run(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return fn(block)
        codes = pc.dictionary_encode(block.column(key)).combine_chunks()
        idx = codes.indices.to_numpy(zero_copy_only=False)
        order = np.argsort(idx, kind="stable")
        sorted_blk = block.take(pa.array(order))
        sidx = idx[order]
        bounds = np.nonzero(np.r_[True, sidx[1:] != sidx[:-1]])[0]
        ends = np.r_[bounds[1:], len(sidx)]
        outs = []
        for s, e in zip(bounds, ends):
            g = sorted_blk.slice(s, e - s)
            if sort_col is not None:
                g = g.sort_by(sort_col)
            outs.append(fn(g))
        return pa.concat_tables(outs)

    return run


class CrawlRun:
    """Handle over a finished (or resumed) crawl's on-disk state."""

    def __init__(self, workdir: str, manifest: dict) -> None:
        self.workdir = workdir
        self.manifest = manifest

    # -- results ----------------------------------------------------------
    def results_dataset(self, columns: list[str] | None = None) -> "ray.data.Dataset":
        files = fsio.glob(
            fsio.join(self.workdir, "results", "round=*", "*.parquet")
        )
        pafs, _ = fsio.pa_filesystem(self.workdir)
        if pafs is not None:
            files = [f.split("://", 1)[1] for f in files]
        return ray.data.read_parquet(files, filesystem=pafs, columns=columns)

    def results_dataset_ordered(
        self, columns: list[str] | None = None
    ) -> "ray.data.Dataset":
        """Successful fetches as a crawl-ordered Dataset — the streaming
        query surface (consume with ``iter_batches``/``write_parquet``;
        nothing materializes driver-side)."""
        cols = columns or [
            "crawl_ord", "url", "url_hash", "root", "depth", "status",
            "text", "lang", "n_links",
        ]
        read_cols = cols if "status" in cols else [*cols, "status"]
        import pyarrow.compute as pc

        return (
            self.results_dataset(columns=read_cols)
            .map_batches(
                # any response row (404s included — the reference's
                # stream carries them); transport errors (status 0) out
                lambda t: t.filter(pc.greater(t.column("status"), 0)).select(cols),
                batch_format="pyarrow",
            )
            .sort("crawl_ord")
        )

    def visited_dataset(self) -> "ray.data.Dataset":
        """Every popped request (== frontier rows across rounds) in pop
        order, as a sorted Dataset."""
        files = ParquetFrontier(self.workdir).files()
        pafs, _ = fsio.pa_filesystem(self.workdir)
        if pafs is not None:
            files = [f.split("://", 1)[1] for f in files]
        return ray.data.read_parquet(
            files, filesystem=pafs, columns=["crawl_ord", "url", "url_hash", "depth"]
        ).sort("crawl_ord")

    def results_table(self) -> pa.Table:
        """Small-scale conformance helper: ``results_dataset_ordered``
        collected to one Arrow table (tests only — the query surface is
        the Dataset)."""
        ds = self.results_dataset_ordered()
        return pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)

    def visited_table(self) -> pa.Table:
        """Small-scale conformance helper over ``visited_dataset``."""
        return pa.Table.from_pandas(
            self.visited_dataset().to_pandas(), preserve_index=False
        )

    def metrics_total(self) -> dict[str, int]:
        total = dict.fromkeys(METRIC_KEYS, 0)
        for r in self.manifest["rounds"]:
            for k in METRIC_KEYS:
                total[k] += r["metrics"][k]
        return total

    def round_metrics(self) -> list[dict]:
        return [r["metrics"] for r in self.manifest["rounds"]]


class Crawler:
    def __init__(
        self,
        cfg: CrawlConfig | None = None,
        workdir: str = "/tmp/wbot_ray_run",
        shared_index_dir: str | None = None,
    ) -> None:
        """``shared_index_dir``: reuse a pre-built bucketed web index
        (it is a pure function of (pages corpus, num_buckets) — the
        storage layout of the simulated web, not crawl state), e.g. so
        benchmark runs at different parallelism levels don't each
        re-shuffle the corpus."""
        self.cfg = cfg or CrawlConfig()
        self.workdir = workdir
        self.shared_index_dir = shared_index_dir
        if self.cfg.log_level is not None:  # reference WithLogLevel
            lvl = getattr(logging, str(self.cfg.log_level).upper(), None)
            if not isinstance(lvl, int):
                raise ValueError(f"unknown log_level {self.cfg.log_level!r}")
            logging.getLogger("wbot_ray").setLevel(lvl)
        # metrics seam (reference MetricsMonitor): one monitor per
        # Crawler, fed a per-round counter delta after each round commits
        self.monitor = (
            self.cfg.metrics_factory() if self.cfg.metrics_factory is not None else None
        )

    # -- manifest ---------------------------------------------------------
    def _manifest_path(self) -> str:
        return fsio.join(self.workdir, "MANIFEST.json")

    def _save_manifest(self, m: dict) -> None:
        fsio.write_json_atomic(m, self._manifest_path())

    # -- per-round helpers ------------------------------------------------
    def _hot_roots(
        self, frontier: "ParquetFrontier", d: int, n_frontier: int
    ) -> tuple[dict[str, int], dict[str, int]]:
        """Hot-root (skew) detection: roots whose frontier rows exceed
        ``hot_host_threshold`` get salt-split into sub-partitions.
        Returns ``(salts, counts)`` — the exact round counts of the hot
        roots feed the driver-side politeness budget (``_hot_vsec``),
        since a salted root's rows span fetch groups and group-local
        vmax understates it.

        Gated on frontier size — if the whole round has fewer rows than
        the threshold no root can be hot, so the per-root counting pass
        (an extra read + groupby shuffle) only runs on rounds where skew
        is actually possible. Non-hot roots' virtual-politeness budgets
        are computed inside the fetch groups themselves (each group owns
        all rows of its roots), never here."""
        cfg = self.cfg
        threshold = cfg.hot_host_threshold
        if n_frontier <= threshold:
            return {}, {}
        if n_frontier <= cfg.local_round_threshold:
            # the round runs on the raw-task path anyway — a Dataset
            # groupby over a few thousand rows is ~1 s of pure pipeline
            # launch latency; count driver-side instead
            import pyarrow.compute as pc

            vc = pc.value_counts(frontier.read_table(d).column("root"))
            hot = {
                str(v): int(n)
                for v, n in zip(
                    vc.field("values").to_pylist(), vc.field("counts").to_pylist()
                )
                if n > threshold
            }
            return (
                {r: max(2, math.ceil(n / threshold)) for r, n in hot.items()},
                hot,
            )
        counts = frontier.read_dataset(d, columns=["root"]).groupby("root").count()

        def partials(batch: pa.Table) -> pa.Table:
            """Per-batch partial: only roots above threshold survive."""
            roots = batch.column("root").to_pylist()
            ns = batch.column("count()").to_pylist()
            hot_r = [r for r, n in zip(roots, ns) if n > threshold]
            hot_n = [int(n) for n in ns if n > threshold]
            return pa.table(
                {
                    "root": pa.array(hot_r, pa.string()),
                    "n": pa.array(hot_n, pa.int64()),
                }
            )

        # hot roots are rare by construction — the collected rows are tiny
        rows = counts.map_batches(partials, batch_format="pyarrow").take_all()
        salts = {r["root"]: max(2, math.ceil(r["n"] / threshold)) for r in rows}
        return salts, {r["root"]: int(r["n"]) for r in rows}

    def _hot_from_rootstats(
        self, metrics_parts_dir: str
    ) -> tuple[dict[str, int], dict[str, int]]:
        """Next round's hot roots from the dedup shards' survivor
        root-count sidecars (a root's rows can span seen-shards — sum).
        Returns ``(salts, counts)`` like ``_hot_roots``."""
        threshold = self.cfg.hot_host_threshold
        counts: dict[str, int] = {}
        for p in fsio.glob(fsio.join(metrics_parts_dir, "rootstats-*.json")):
            with fsio.open_file(p) as f:
                for root, n in json.load(f).items():
                    counts[root] = counts.get(root, 0) + n
        hot = {r: n for r, n in counts.items() if n > threshold}
        return {r: max(2, math.ceil(n / threshold)) for r, n in hot.items()}, hot

    def _hot_vsec(self, hot_counts: dict[str, int]) -> float:
        """Exact virtual-politeness budget of the salted hot roots this
        round (their rows span fetch groups, so group-local vmax
        understates them — see ``stages.fetch._group_vmax``)."""
        if self.cfg.politeness == "off" or not hot_counts:
            return 0.0
        vmax = 0.0
        for root, n in hot_counts.items():
            rate, interval = self.cfg.rate_for_root(root)
            vmax = max(vmax, math.ceil(n / rate) * interval)
        return vmax

    def _run_round_local(
        self,
        frontier_tbl: pa.Table,
        hot_roots: dict[str, int],
        index_dir: str,
        results_dir: str,
        metrics_parts: str,
        seen: SeenSet,
        round_id: int,
    ) -> pa.Table:
        """Execute one round as RAW Ray tasks (one per fetch partition)
        plus driver-side dedup/ordering, using the SAME stage functions
        as the distributed path — a scheduler choice, not a semantic
        one: below ``local_round_threshold`` frontier rows, Dataset
        pipeline-launch + shuffle latency dwarfs the round's work, but
        the per-bucket index lookups still want parallel IO. Returns the
        ordered next frontier (without final crawl_ord)."""
        import time as _time

        import ray

        import numpy as np
        import pyarrow.compute as pc

        sub: dict[str, float] = {}
        self._last_local_stages = sub
        _t = _time.perf_counter()
        cfg = self.cfg
        assigned = make_assign_fetch_part(cfg, hot_roots)(frontier_tbl)
        fused_fn = make_fused_fetch_fn(
            index_dir, cfg, results_dir, metrics_parts, hot_roots
        )
        # ONE stable argsort splits the frontier into per-part row ranges
        # (identical rows + order to a per-part ``filter(==part)`` loop,
        # which re-scans the whole table once per part — quadratic-ish at
        # hundreds of salt parts × 10^5 rows)
        part_col = assigned.column("fetch_part").to_numpy(zero_copy_only=False)
        order = np.argsort(part_col, kind="stable")
        sorted_tbl = assigned.take(pa.array(order))
        sorted_parts = part_col[order]
        bounds = np.flatnonzero(np.diff(sorted_parts)) + 1
        starts = np.concatenate(([0], bounds)).astype(np.int64)
        ends = np.concatenate((bounds, [len(sorted_parts)])).astype(np.int64)
        n_parts = len(starts)
        # tiny rounds produce hundreds of near-empty parts; one Ray task
        # per part is pure launch latency. Chunk parts into ~4 tasks per
        # executor slot — each task runs its parts' fused calls
        # sequentially, so every per-part artifact (results file, metric
        # sidecar) is byte-identical to the one-task-per-part layout.
        sub["split"] = round(_time.perf_counter() - _t, 3)
        _t = _time.perf_counter()
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        n_tasks = max(1, min(n_parts, 4 * ncpu))
        # ship the sorted frontier ONCE (one zero-copy object-store put);
        # each task takes its own parts' rows in-worker. The previous
        # per-task driver-side take() was single-threaded driver work
        # linear in rows — pure Amdahl serial cost that capped the
        # wide-executor leg (~0.7 s on an 80k-row round at 32 CPUs).
        tbl_ref = ray.put(sorted_tbl)

        @ray.remote
        def run_parts(tbl: pa.Table, bounds: list[tuple[int, int]]) -> list[pa.Table]:
            rows = np.concatenate([np.arange(s, e) for s, e in bounds])
            # take (not slice): fresh buffers for the per-part slices
            mine = tbl.take(pa.array(rows))
            out, off = [], 0
            for s, e in bounds:
                out.append(fused_fn(mine.slice(off, e - s)))
                off += e - s
            return out

        refs = []
        for c in range(n_tasks):
            idx = range(c, n_parts, n_tasks)  # round-robin part -> chunk
            bounds = [
                (int(starts[i]), int(ends[i])) for i in idx if ends[i] > starts[i]
            ]
            if bounds:
                refs.append(run_parts.remote(tbl_ref, bounds))
        cand_parts = [t for lst in ray.get(refs) for t in lst]
        cand = pa.concat_tables(cand_parts).combine_chunks()
        sub["fetch_tasks"] = round(_time.perf_counter() - _t, 3)
        _t = _time.perf_counter()
        # shard dedups are independent (one ordered actor call each) —
        # run them as parallel raw tasks, not a sequential RPC chain.
        # (Measured alternative: fetch tasks returning per-shard pieces
        # via num_returns=S so dedup inputs flow worker-to-worker — LOST
        # on this box: n_tasks x S tiny objects per round doubled the
        # small-round latency. Driver gather of the slim candidate
        # columns is cheaper until rounds are orders of magnitude wider.)
        # ONE stable argsort splits cand by shard — identical rows+order
        # to the per-shard filter(==s) loop it replaces, which re-scanned
        # cand S times on the driver; the shard-sorted table ships once
        # and each dedup task slices its contiguous range in-worker.
        dedup_fn = make_dedup_fn(seen.shards, round_id, stats_dir=metrics_parts)

        @ray.remote
        def run_shard_dedup(tbl: pa.Table, start: int, n: int) -> pa.Table:
            return dedup_fn(tbl.slice(start, n).combine_chunks())

        survivors = []
        if cand.num_rows:
            shard_col = cand.column("seen_shard").to_numpy(zero_copy_only=False)
            s_order = np.argsort(shard_col, kind="stable")
            s_sorted = shard_col[s_order]
            s_bounds = np.flatnonzero(np.diff(s_sorted)) + 1
            s_starts = np.concatenate(([0], s_bounds)).astype(np.int64)
            s_ends = np.concatenate((s_bounds, [len(s_sorted)])).astype(np.int64)
            cand_ref = ray.put(cand.take(pa.array(s_order)))
            survivors = ray.get(
                [
                    run_shard_dedup.remote(cand_ref, int(s), int(e - s))
                    for s, e in zip(s_starts, s_ends)
                ]
            )
        sub["dedup_tasks"] = round(_time.perf_counter() - _t, 3)
        _t = _time.perf_counter()
        if not survivors:
            out = self._order_table(cand.drop_columns(["seen_shard"]))
        else:
            out = self._order_table(pa.concat_tables(survivors).combine_chunks())
        sub["order"] = round(_time.perf_counter() - _t, 3)
        return out

    def _order_table(self, tbl: pa.Table) -> pa.Table:
        """Next-frontier scheduling order: BFS rank (``ord64``), or the
        pluggable ``cfg.priority_fn`` with ord64 as tie-break (the
        priority-queue seam — see ``CrawlConfig``)."""
        if self.cfg.priority_fn is None:
            return tbl.sort_by("ord64")
        tbl = tbl.append_column("_prio", self.cfg.priority_fn(tbl))
        return tbl.sort_by(
            [("_prio", "ascending"), ("ord64", "ascending")]
        ).drop_columns(["_prio"])

    def _round_metrics(self, metrics_parts_dir: str, n_frontier: int) -> tuple[dict[str, int], float]:
        """Sum the per-group metric sidecars the fused fetch stage wrote
        (one tiny JSON per fetch partition) — no Ray pipeline needed."""
        ok = n = total_link = skipped = 0
        vsec = 0.0
        for p in fsio.glob(fsio.join(metrics_parts_dir, "part-*.json")):
            with fsio.open_file(p) as f:
                m = json.load(f)
            ok += m["ok"]
            n += m["n"]
            total_link += m["total_link"]
            skipped += m["skipped"]
            vsec = max(vsec, m["vmax"])
        return {
            "total_requests": n_frontier,
            "successful_requests": int(ok),
            "failed_requests": int(n - ok),
            "total_link": int(total_link),
            "skipped_link": int(skipped),
            # filled in by the caller once the deduped frontier count is known
            "crawled_link": 0,
            "duplicated_link": 0,
            "_accepted_candidates": int(total_link - skipped),
        }, vsec

    # -- main entry -------------------------------------------------------
    def crawl(
        self,
        seeds: list[str] | None = None,
        pages_path: str | None = None,
        resume: bool = False,
        stop_after_round: int | None = None,
    ) -> CrawlRun:
        cfg = self.cfg
        wd = self.workdir
        fsio.makedirs(wd)
        index_dir = self.shared_index_dir or fsio.join(wd, "index")
        # the bucketed web index is the INPUT corpus layout (a pure
        # function of the pages corpus), not crawl checkpoint state —
        # the fsspec workdir contract covers frontier/results/seen/
        # metrics only. file:// degrades to the bare path; any other
        # remote workdir must bring a reachable index of its own.
        if fsio.is_url(index_dir):
            if index_dir.startswith("file://"):
                index_dir = index_dir.split("://", 1)[1]
            else:
                raise ValueError(
                    "a remote fsspec workdir requires shared_index_dir "
                    "(the bucketed web index is input-corpus layout, "
                    "not checkpoint state)"
                )

        # extension seams (reference WithQueue / WithStore,
        # option.go:49-58): the frontier layout and the seen store are
        # pluggable; defaults are the built-in Parquet rounds + sharded
        # cuckoo/exact actors
        frontier = (
            cfg.queue_factory(wd, cfg) if cfg.queue_factory else ParquetFrontier(wd)
        )

        if resume:
            manifest = fsio.read_json(self._manifest_path())
        else:
            if seeds is None or pages_path is None:
                raise ValueError("fresh crawl needs seeds and pages_path")
            frontier.clear_all()
            for sub in ("results", "seen", "metrics"):
                _clean(fsio.join(wd, sub))
            build_web_index(pages_path, index_dir, cfg.num_buckets)
            # M6 display truncation: URLs in logs go through the same
            # 64-byte form as the reference's ParsedURL.String()
            logger.info(
                "crawl start: %d seeds, first %s",
                len(seeds),
                display_url(seeds[0]),
            )
            frontier.write_table(0, seeds_to_frontier(seeds, cfg))
            manifest = {
                "pages_path": pages_path,
                "seeds": seeds,
                "rounds": [],
                "done": False,
            }
            self._save_manifest(manifest)

        seen = (
            cfg.store_factory(cfg)
            if cfg.store_factory
            else SeenSet(cfg.seen_shards, filter_kind=cfg.seen_filter)
        )
        try:
            completed = [r["round"] for r in manifest["rounds"]]
            start = (max(completed) + 1) if completed else 0
            # wipe any un-committed partial round state
            for stale in fsio.glob(fsio.join(wd, "results", "round=*")):
                if int(stale.rsplit("=", 1)[1]) >= start:
                    _clean(stale)
            frontier.clear_rounds_after(start)
            for stale in fsio.glob(fsio.join(wd, "seen", "round=*")):
                if int(stale.rsplit("=", 1)[1]) >= start:
                    _clean(stale)
            for stale in fsio.glob(fsio.join(wd, "metrics_parts", "round=*")):
                if int(stale.rsplit("=", 1)[1]) >= start:
                    _clean(stale)
            if resume and completed:
                seen.restore(
                    [fsio.join(wd, "seen", f"round={r}") for r in completed]
                )
            ord_base = sum(r["n_frontier"] for r in manifest["rounds"])

            d = start
            hot_roots: dict[str, int] | None = None  # carried across rounds
            hot_counts: dict[str, int] = {}  # exact counts of this round's hot roots
            # (flush futures, manifest entry) of the previous round — its
            # commit is deferred so the checkpoint writes overlap the
            # next round's pipeline
            pending_commit: tuple[list, dict] | None = None

            def _commit_pending() -> None:
                nonlocal pending_commit
                if pending_commit is None:
                    return
                futs, entry = pending_commit
                ray.get(futs)  # seen deltas durable BEFORE the commit
                manifest["rounds"].append(entry)
                self._save_manifest(manifest)
                pending_commit = None

            # ---- heal-and-retry envelope: a seen-shard actor dying
            # mid-round is recoverable IF the previous round's deltas
            # are durable — recreate just the dead shard(s) from their
            # per-partition checkpoint lineage and re-run the current
            # round (survivors answer the repeated round from their
            # replay cache, so the visited set is byte-identical).
            # Bounded at one heal per shard — tracked by shard id, so a
            # shard that dies deterministically on retry (e.g. OOM on the
            # same oversized batch) surfaces on its SECOND death instead
            # of burning the whole budget re-running the round; any other
            # failure, or a death with unflushed deltas, surfaces for
            # crawl(resume=True).
            healed_shards: set[int] = set()
            for _heal_attempt in range(cfg.seen_shards + 1):
                try:
                    while True:
                        n_d = frontier.rows(d)
                        if n_d == 0:
                            _commit_pending()
                            manifest["done"] = True
                            self._save_manifest(manifest)
                            break

                        import time as _time

                        stage_sec: dict[str, float] = {}
                        _t = _time.perf_counter()
                        if hot_roots is None:
                            # first round of this (possibly resumed) run: one
                            # gated scan; later rounds reuse the dedup sidecars
                            hot_roots, hot_counts = self._hot_roots(frontier, d, n_d)
                        stage_sec["hot_detect"] = round(_time.perf_counter() - _t, 3)

                        # ---- ONE fused pipeline per round:
                        # fetch + extract + results sink + metric sidecars +
                        # candidate explode (inside the fetch task), then the
                        # dedup shuffle and the ordering sort — no intermediate
                        # parquet round-trips, no separate metrics pass.
                        _t = _time.perf_counter()
                        results_dir = fsio.join(wd, "results", f"round={d}")
                        metrics_parts = fsio.join(wd, "metrics_parts", f"round={d}")
                        _clean(results_dir)
                        _clean(metrics_parts)
                        fsio.makedirs(results_dir)
                        fsio.makedirs(metrics_parts)
                        cols = FRONTIER_SCHEMA.names

                        if n_d <= cfg.local_round_threshold:
                            # ---- tiny round: run in-process (same stage fns)
                            frontier_tbl = frontier.read_table(d)
                            ordered_tbl = self._run_round_local(
                                frontier_tbl, hot_roots, index_dir, results_dir,
                                metrics_parts, seen, d,
                            )
                            n_next = ordered_tbl.num_rows
                            stage_sec["fetch_dedup"] = round(_time.perf_counter() - _t, 3)
                            for k, v in getattr(self, "_last_local_stages", {}).items():
                                stage_sec[f"local_{k}"] = v

                            _t = _time.perf_counter()
                            if n_next == 0:
                                frontier.write_table(d + 1, FRONTIER_SCHEMA.empty_table())
                            else:
                                ordered_tbl = ordered_tbl.append_column(
                                    "crawl_ord",
                                    pa.array(
                                        range(ord_base + n_d, ord_base + n_d + n_next),
                                        pa.int64(),
                                    ),
                                )
                                frontier.write_table(d + 1, ordered_tbl.select(cols))
                            stage_sec["order_write"] = round(_time.perf_counter() - _t, 3)
                        else:
                            # block count = EXCHANGE WIDTH of the round. Floor:
                            # 4 tasks per executor slot (a width below the CPU
                            # count caps the fused stage's parallelism — 1.8x
                            # round-5 speedup on 4x CPUs when lifted; multiple
                            # waves smooth per-part cost variance). Growth: only
                            # as ceil(n_d / max_block_rows) — width scales with
                            # DATA VOLUME per block, never with part count. The
                            # old ceil(n_d / batch_size) term produced an
                            # 852-partition exchange at the 1.96M-page corpus
                            # whose fixed per-partition cost was 123 s of a
                            # 126 s round (the bench10x finding): exchange cost
                            # grows superlinearly with width, so width is
                            # clamped to what the executor can actually run.
                            # Capped at the distinct part count (a group cannot
                            # split across blocks).
                            ncpu = int(ray.cluster_resources().get("CPU", 8))
                            n_parts = cfg.num_buckets + sum(
                                k - 1 for k in (hot_roots or {}).values()
                            )
                            n_blocks = max(
                                1,
                                min(
                                    n_parts,
                                    max(
                                        4 * ncpu,
                                        math.ceil(n_d / cfg.max_block_rows),
                                    ),
                                ),
                            )
                            # exchanges are HASH repartitions by key, not
                            # sort-based groupbys: Ray Data's groupby sorts
                            # globally, and the sort barrier's fixed cost is
                            # the scale bottleneck the bench10x run exposed
                            # (21 s wall for a 296k-row round with ~2 s of
                            # work; 10^6-row rounds were sort-bound, not
                            # fetch-bound). repartition(keys=...) co-locates
                            # every key's rows in exactly one block, and the
                            # per-group adapter restores map_groups
                            # semantics — groups sorted by crawl_ord so the
                            # results sink stays byte-deterministic whatever
                            # the block arrival order. Ray only plans keyed
                            # repartition under the hash-shuffle strategy —
                            # scoped to THIS pipeline's build+materialize
                            # (index build / ordering sorts keep the default
                            # sort-shuffle they were tuned on).
                            from ray.data.context import ShuffleStrategy as _SS

                            _ctx = ray.data.DataContext.get_current()
                            _prev_shuffle = _ctx.shuffle_strategy
                            _ctx.shuffle_strategy = _SS.HASH_SHUFFLE
                            pipe = (
                                frontier.read_dataset(d, override_num_blocks=n_blocks)
                                .map_batches(
                                    make_assign_fetch_part(cfg, hot_roots),
                                    batch_format="pyarrow",
                                )
                                .repartition(
                                    num_blocks=n_blocks, keys=["fetch_part"]
                                )
                                .map_batches(
                                    _per_group(
                                        make_fused_fetch_fn(
                                            index_dir, cfg, results_dir,
                                            metrics_parts, hot_roots,
                                        ),
                                        "fetch_part",
                                        sort_col="crawl_ord",
                                    ),
                                    batch_size=None,
                                    batch_format="pyarrow",
                                )
                            )
                            if d < cfg.max_depth:
                                pipe = pipe.repartition(
                                    num_blocks=cfg.seen_shards, keys=["seen_shard"]
                                ).map_batches(
                                    _per_group(
                                        make_dedup_fn(
                                            seen.shards, d, stats_dir=metrics_parts
                                        ),
                                        "seen_shard",
                                    ),
                                    batch_size=None,
                                    batch_format="pyarrow",
                                )
                            # else: final round — the depth gate makes every
                            # candidate list empty, so the dedup shuffle would
                            # move zero rows; skip its exchange entirely
                            try:
                                deduped = pipe.materialize()
                            finally:
                                _ctx.shuffle_strategy = _prev_shuffle
                            n_next = deduped.count()
                            stage_sec["fetch_dedup"] = round(_time.perf_counter() - _t, 3)
                            if os.environ.get("WBOT_RAY_STATS"):
                                # Ray Data per-operator wall/cpu/memory breakdown —
                                # the tuning feedback loop for the round pipeline
                                stats_path = fsio.join(wd, "metrics", f"round={d}.stats.txt")
                                fsio.makedirs(fsio.dirname(stats_path))
                                with fsio.open_file(stats_path, "w") as sf:
                                    sf.write(deduped.stats())

                            _t = _time.perf_counter()
                            if n_next == 0:
                                frontier.write_table(d + 1, FRONTIER_SCHEMA.empty_table())
                            elif n_next <= cfg.driver_order_threshold:
                                # small frontier: a distributed sort would be pure
                                # shuffle overhead — merge the slim candidate blocks
                                # driver-side (few MB), rank, write one file
                                blocks = [
                                    b for b in ray.get(deduped.to_arrow_refs()) if b.num_rows > 0
                                ]
                                tbl = pa.concat_tables(blocks).combine_chunks()
                                tbl = self._order_table(tbl)
                                tbl = tbl.append_column(
                                    "crawl_ord",
                                    pa.array(
                                        range(ord_base + n_d, ord_base + n_d + tbl.num_rows),
                                        pa.int64(),
                                    ),
                                )
                                frontier.write_table(d + 1, tbl.select(cols))
                            else:
                                if cfg.priority_fn is None:
                                    sorted_ds = deduped.sort("ord64")
                                else:
                                    pf = cfg.priority_fn
                                    sorted_ds = deduped.map_batches(
                                        lambda t: t.append_column("_prio", pf(t)),
                                        batch_format="pyarrow",
                                    ).sort(["_prio", "ord64"])
                                ordered, _ = assign_crawl_ord(sorted_ds, ord_base + n_d)
                                _out_fs, _out_path = fsio.pa_filesystem(
                                    frontier.prepare_round_dir(d + 1)
                                )
                                ordered.map_batches(
                                    lambda t: t.select(cols), batch_format="pyarrow"
                                ).write_parquet(_out_path, filesystem=_out_fs)
                            stage_sec["order_write"] = round(_time.perf_counter() - _t, 3)

                        # THIS round's hot-root budget before the counts roll over
                        round_hot_vsec = self._hot_vsec(hot_counts)
                        # next round's hot roots: piggybacked survivor root counts
                        hot_roots, hot_counts = self._hot_from_rootstats(metrics_parts)

                        _t = _time.perf_counter()
                        metrics, vsec = self._round_metrics(metrics_parts, n_d)
                        vsec = max(vsec, round_hot_vsec)
                        stage_sec["metrics_sidecar"] = round(_time.perf_counter() - _t, 3)

                        n_dup = metrics.pop("_accepted_candidates") - n_next
                        metrics["crawled_link"] = int(n_next)
                        metrics["duplicated_link"] = int(n_dup)
                        metrics["virtual_politeness_sec"] = vsec
                        metrics["hot_roots"] = len(hot_roots)
                        metrics["stage_sec"] = stage_sec

                        if self.monitor is not None:
                            self.monitor.on_round(
                                d, {k: int(metrics[k]) for k in METRIC_KEYS}
                            )

                        # overlap the seen-set checkpoint with the NEXT round's
                        # pipeline: submit the flush futures now, commit round d
                        # to the manifest only once they land — which happens at
                        # the end of round d+1 (or at loop exit). Deltas are
                        # round-keyed inside the actors, so a flush can never
                        # swallow a later round's insertions. Crash mid-round
                        # d+1 ⇒ resume replays round d (deterministic re-run,
                        # identical output).
                        flush_futs = seen.flush_deltas_async(
                            d, fsio.join(wd, "seen", f"round={d}")
                        )

                        fsio.makedirs(fsio.join(wd, "metrics"))
                        fsio.write_json_atomic(
                            metrics, fsio.join(wd, "metrics", f"round={d}.json")
                        )

                        _commit_pending()
                        pending_commit = (
                            flush_futs,
                            {
                                "round": d,
                                "n_frontier": n_d,
                                "n_next": n_next,
                                "seen_size": None,
                                "metrics": metrics,
                            },
                        )

                        ord_base += n_d
                        if stop_after_round is not None and d >= stop_after_round:
                            _commit_pending()
                            break
                        d += 1
                    break  # frontier drained or stop_after_round hit
                except Exception as exc:
                    dead = (
                        seen.dead_shards() if hasattr(seen, "dead_shards") else []
                    )
                    if not dead or _heal_attempt >= cfg.seen_shards:
                        raise
                    repeat = sorted(set(dead) & healed_shards)
                    if repeat:
                        raise RuntimeError(
                            f"seen shard(s) {repeat} died again after a heal "
                            "— failure is deterministic, not transient; "
                            "fix the cause and restart with "
                            "crawl(resume=True)"
                        ) from exc
                    try:
                        _commit_pending()  # make the previous round durable
                    except Exception:
                        raise RuntimeError(
                            f"seen shard(s) {dead} died with unflushed deltas "
                            "in flight; restart with crawl(resume=True) to "
                            "replay deterministically from the last committed "
                            "round"
                        ) from exc
                    committed_dirs = [
                        fsio.join(wd, "seen", f"round={e['round']}")
                        for e in manifest["rounds"]
                    ]
                    healed = seen.heal(committed_dirs)
                    healed_shards.update(healed)
                    logger.warning(
                        "seen shard(s) %s died mid-round %d: restored from "
                        "checkpoint deltas, retrying the round",
                        healed,
                        d,
                    )
            else:
                raise RuntimeError("seen-shard heal limit exceeded")
        finally:
            seen.shutdown()

        return CrawlRun(wd, manifest)
