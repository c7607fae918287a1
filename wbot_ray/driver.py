"""Round driver — the Ray-Data-native replacement for the reference's
worker loop (``/root/reference/crawler.go:195-291``).

There is no queue object: the depth-``d`` frontier IS a Parquet-checkpointed
Dataset, and one BFS round is one streaming pipeline (SURVEY §3.4)::

    frontier_d ──map_batches(assign fetch_part)──
      groupby(fetch_part).map_groups(fetch+extract)   # index-lookup join,
      → write results/round=d                          #   politeness locality
    results_d ──pruned re-read──map_batches(explode)──
      groupby(seen_shard).map_groups(dedup+check_and_set)
      → sort(ord64) → assign crawl_ord → write frontier/round=d+1

Rounds terminate when the next frontier is empty (the depth gate inside the
fetch stage guarantees that by ``max_depth``); there are no sleep/status
races like the reference's termination heuristic (``crawler.go:203-212``).

Checkpoint/lineage layout under ``workdir`` (every round resumable)::

    index/                    bucketed web index (built once)
    frontier/round=<d>/       the round-d frontier (sorted, dense crawl_ord)
    results/round=<d>/        fetch output incl. nested `next` lineage
    seen/round=<d>/shard=<s>  per-shard seen-set deltas for the round
    metrics/round=<d>.json    per-round per-stage counters (metrics parity
                              with the reference's 7 atomics, metrics.go:8-17)
    MANIFEST.json             committed rounds — the resume point

Crash recovery: a round is visible only once MANIFEST.json records it
(atomic tmp+rename); resume deletes any un-manifested round directories,
replays seen-set deltas of committed rounds into fresh shard actors, and
re-runs from the first missing round.
"""

from __future__ import annotations

import glob
import json
import math
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from wbot_ray.config import CrawlConfig
from wbot_ray.stages.dedup import make_dedup_fn
from wbot_ray.stages.explode import CANDIDATE_COLUMNS, make_explode_fn
from wbot_ray.stages.fetch import make_assign_fetch_part, make_fetch_group_fn
from wbot_ray.stages.normalize import FRONTIER_SCHEMA, seeds_to_frontier
from wbot_ray.stages.order import assign_crawl_ord
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


def _parquet_rows(path: str) -> int:
    return sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(path, "*.parquet"))
    )


def _clean(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)


class CrawlRun:
    """Handle over a finished (or resumed) crawl's on-disk state."""

    def __init__(self, workdir: str, manifest: dict) -> None:
        self.workdir = workdir
        self.manifest = manifest

    # -- results ----------------------------------------------------------
    def results_dataset(self, columns: list[str] | None = None) -> "ray.data.Dataset":
        files = sorted(
            glob.glob(os.path.join(self.workdir, "results", "round=*", "*.parquet"))
        )
        return ray.data.read_parquet(files, columns=columns)

    def results_table(self) -> pa.Table:
        """Successful fetches in exact crawl order (small-scale helper for
        conformance; streams block-by-block through the sort only)."""
        ds = self.results_dataset(
            columns=["crawl_ord", "url", "url_hash", "root", "depth", "status",
                     "text", "lang", "n_links"]
        )
        import pyarrow.compute as pc

        ds = ds.map_batches(
            lambda t: t.filter(pc.equal(t.column("status"), 200)),
            batch_format="pyarrow",
        ).sort("crawl_ord")
        return pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)

    def visited_table(self) -> pa.Table:
        """Every popped request (== frontier rows across rounds) in pop
        order — comparable 1:1 with the sequential oracle's visited list."""
        files = sorted(
            glob.glob(os.path.join(self.workdir, "frontier", "round=*", "*.parquet"))
        )
        ds = ray.data.read_parquet(files, columns=["crawl_ord", "url", "url_hash", "depth"])
        return pa.Table.from_pandas(ds.sort("crawl_ord").to_pandas(), preserve_index=False)

    def metrics_total(self) -> dict[str, int]:
        total = dict.fromkeys(METRIC_KEYS, 0)
        for r in self.manifest["rounds"]:
            for k in METRIC_KEYS:
                total[k] += r["metrics"][k]
        return total

    def round_metrics(self) -> list[dict]:
        return [r["metrics"] for r in self.manifest["rounds"]]


class Crawler:
    def __init__(self, cfg: CrawlConfig | None = None, workdir: str = "/tmp/wbot_ray_run") -> None:
        self.cfg = cfg or CrawlConfig()
        self.workdir = workdir

    # -- manifest ---------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.workdir, "MANIFEST.json")

    def _save_manifest(self, m: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path())

    # -- per-round helpers ------------------------------------------------
    def _root_stats(self, frontier_dir: str) -> tuple[dict[str, int], float]:
        """(hot_roots → salt count, virtual politeness seconds for the
        round). One pruned pass + a tiny per-root counts dataset."""
        cfg = self.cfg
        counts = (
            ray.data.read_parquet(frontier_dir, columns=["root"])
            .groupby("root")
            .count()
            .materialize()
        )

        threshold = cfg.hot_host_threshold

        def partials(batch: pa.Table) -> pa.Table:
            """Per-batch partial: hot roots (count > threshold) plus the
            batch's max virtual-politeness seconds as a sentinel row."""
            roots = batch.column("root").to_pylist()
            ns = batch.column("count()").to_pylist()
            hot_r, hot_n, vmax = [], [], 0.0
            for r, n in zip(roots, ns):
                rate, interval = cfg.rate_for_root(r)
                vmax = max(vmax, math.ceil(n / rate) * interval)
                if n > threshold:
                    hot_r.append(r)
                    hot_n.append(int(n))
            return pa.table(
                {
                    "root": pa.array(hot_r + [""], pa.string()),
                    "n": pa.array(hot_n + [0], pa.int64()),
                    "vmax": pa.array([0.0] * len(hot_r) + [vmax], pa.float64()),
                }
            )

        # hot roots are rare by construction — the collected rows are tiny
        rows = counts.map_batches(partials, batch_format="pyarrow").take_all()
        hot = {
            r["root"]: max(2, math.ceil(r["n"] / threshold))
            for r in rows
            if r["root"]
        }
        # virtual politeness: wall time a real paced crawl would need for
        # its slowest root this round (max over roots of ceil(n/rate)*interval)
        vsec = max((r["vmax"] for r in rows), default=0.0)
        return hot, vsec

    def _round_metrics(self, results_dir: str, n_frontier: int) -> dict[str, int]:
        ds = ray.data.read_parquet(
            results_dir, columns=["status", "n_links_total", "n_skipped"]
        )

        def partial(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ok = pc.sum(pc.cast(pc.equal(batch.column("status"), 200), pa.int64())).as_py() or 0
            return pa.table(
                {
                    "ok": pa.array([ok], pa.int64()),
                    "n": pa.array([batch.num_rows], pa.int64()),
                    "total_link": pa.array([pc.sum(batch.column("n_links_total")).as_py() or 0], pa.int64()),
                    "skipped": pa.array([pc.sum(batch.column("n_skipped")).as_py() or 0], pa.int64()),
                }
            )

        ok = n = total_link = skipped = 0
        for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
            ok += row["ok"]
            n += row["n"]
            total_link += row["total_link"]
            skipped += row["skipped"]
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
        }

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
        os.makedirs(wd, exist_ok=True)
        index_dir = os.path.join(wd, "index")

        if resume:
            with open(self._manifest_path()) as f:
                manifest = json.load(f)
        else:
            if seeds is None or pages_path is None:
                raise ValueError("fresh crawl needs seeds and pages_path")
            for sub in ("frontier", "results", "seen", "metrics"):
                _clean(os.path.join(wd, sub))
            build_web_index(pages_path, index_dir, cfg.num_buckets)
            f0 = seeds_to_frontier(seeds, cfg)
            r0_dir = os.path.join(wd, "frontier", "round=0")
            os.makedirs(r0_dir, exist_ok=True)
            pq.write_table(f0, os.path.join(r0_dir, "part-0.parquet"))
            manifest = {
                "pages_path": pages_path,
                "seeds": seeds,
                "rounds": [],
                "done": False,
            }
            self._save_manifest(manifest)

        seen = SeenSet(cfg.seen_shards)
        try:
            completed = [r["round"] for r in manifest["rounds"]]
            start = (max(completed) + 1) if completed else 0
            # wipe any un-committed partial round state
            for stale in glob.glob(os.path.join(wd, "results", "round=*")):
                if int(stale.rsplit("=", 1)[1]) >= start:
                    _clean(stale)
            for stale in glob.glob(os.path.join(wd, "frontier", "round=*")):
                if int(stale.rsplit("=", 1)[1]) > start:
                    _clean(stale)
            for stale in glob.glob(os.path.join(wd, "seen", "round=*")):
                if int(stale.rsplit("=", 1)[1]) >= start:
                    _clean(stale)
            if resume and completed:
                seen.restore(
                    [os.path.join(wd, "seen", f"round={r}") for r in completed]
                )
            ord_base = sum(r["n_frontier"] for r in manifest["rounds"])

            d = start
            while True:
                frontier_dir = os.path.join(wd, "frontier", f"round={d}")
                n_d = _parquet_rows(frontier_dir)
                if n_d == 0:
                    manifest["done"] = True
                    self._save_manifest(manifest)
                    break

                hot_roots, vsec = self._root_stats(frontier_dir)

                # ---- fetch + extract (index-lookup join, politeness-local)
                results_dir = os.path.join(wd, "results", f"round={d}")
                _clean(results_dir)
                (
                    ray.data.read_parquet(frontier_dir)
                    .map_batches(
                        make_assign_fetch_part(cfg, hot_roots),
                        batch_format="pyarrow",
                        batch_size=cfg.batch_size,
                    )
                    .groupby("fetch_part")
                    .map_groups(
                        make_fetch_group_fn(index_dir, cfg),
                        batch_format="pyarrow",
                    )
                    .write_parquet(results_dir)
                )

                metrics = self._round_metrics(results_dir, n_d)

                # ---- explode -> dedup -> order -> next frontier
                next_dir = os.path.join(wd, "frontier", f"round={d + 1}")
                _clean(next_dir)
                candidates = (
                    ray.data.read_parquet(results_dir, columns=CANDIDATE_COLUMNS)
                    .map_batches(
                        make_explode_fn(cfg),
                        batch_format="pyarrow",
                        batch_size=cfg.batch_size,
                    )
                    .groupby("seen_shard")
                    .map_groups(make_dedup_fn(seen.shards), batch_format="pyarrow")
                    .sort("ord64")
                )
                ordered, n_next = assign_crawl_ord(candidates, ord_base + n_d)
                os.makedirs(next_dir, exist_ok=True)
                if n_next > 0:
                    cols = FRONTIER_SCHEMA.names
                    ordered.map_batches(
                        lambda t: t.select(cols), batch_format="pyarrow"
                    ).write_parquet(next_dir)
                else:
                    pq.write_table(
                        FRONTIER_SCHEMA.empty_table(),
                        os.path.join(next_dir, "part-0.parquet"),
                    )

                n_dup = metrics.pop("_accepted_candidates") - n_next
                metrics["crawled_link"] = int(n_next)
                metrics["duplicated_link"] = int(n_dup)
                metrics["virtual_politeness_sec"] = vsec
                metrics["hot_roots"] = len(hot_roots)

                seen.flush_deltas(os.path.join(wd, "seen", f"round={d}"))

                os.makedirs(os.path.join(wd, "metrics"), exist_ok=True)
                with open(os.path.join(wd, "metrics", f"round={d}.json"), "w") as f:
                    json.dump(metrics, f, indent=1)

                manifest["rounds"].append(
                    {
                        "round": d,
                        "n_frontier": n_d,
                        "n_next": n_next,
                        "seen_size": None,
                        "metrics": metrics,
                    }
                )
                self._save_manifest(manifest)

                ord_base += n_d
                if stop_after_round is not None and d >= stop_after_round:
                    break
                d += 1
        finally:
            seen.shutdown()

        return CrawlRun(wd, manifest)
