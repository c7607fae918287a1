"""``ray job submit``-compatible crawl launcher::

    ray job submit --working-dir . -- \\
        python -m wbot_ray --pages /data/pages.parquet \\
            --seeds https://a.com https://b.com --workdir /data/run1

or locally (Ray auto-initializes in local mode)::

    python -m wbot_ray --pages ... --seeds ... --workdir /tmp/run1
    python -m wbot_ray --workdir /tmp/run1 --resume   # continue a run

This is the cluster entry point the north rule's ``ray job submit``
launch implies: the script owns the Ray session (the library never
calls ``ray.init`` — driver contract), runs the crawl to completion
(or ``--stop-after-round`` for checkpoint tests), and prints the final
metrics as ONE JSON line on stdout. Results/frontier/manifest live
under ``--workdir`` in the resumable per-round layout
(``wbot_ray.driver`` module docstring).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m wbot_ray", description=__doc__)
    p.add_argument("--pages", help="Parquet corpus (url, warc_ts, html, text, lang)")
    p.add_argument("--seeds", nargs="*", default=None, help="seed URLs")
    p.add_argument("--workdir", required=True, help="checkpoint/results directory")
    p.add_argument("--max-depth", type=int, default=10)
    p.add_argument("--mode", choices=("fidelity", "strict"), default="fidelity")
    p.add_argument("--politeness", choices=("virtual", "real", "off"), default="virtual")
    p.add_argument("--num-buckets", type=int, default=32)
    p.add_argument("--seen-shards", type=int, default=8)
    p.add_argument("--resume", action="store_true", help="continue from the workdir manifest")
    p.add_argument("--stop-after-round", type=int, default=None)
    p.add_argument(
        "--http-fetch",
        action="store_true",
        help="fetch over real sockets (stages.httpfetch) instead of the "
        "parquet index; --pages is then only used to lay out the "
        "(unused) index and may be a tiny stub corpus",
    )
    p.add_argument("--proxy", default="", help="proxy url stamped on every request")
    p.add_argument(
        "--robots-from-http",
        action="store_true",
        help="strict mode: prefetch robots.txt for the seed hosts over "
        "HTTP (fetch_robots_http) before crawling",
    )
    args = p.parse_args(argv)

    if not args.resume and (not args.pages or not args.seeds):
        p.error("fresh crawl needs --pages and --seeds (or pass --resume)")

    import ray

    if not ray.is_initialized():  # ray job submit may have initialized already
        ray.init(include_dashboard=False)

    from wbot_ray.config import CrawlConfig
    from wbot_ray.driver import Crawler

    extra = {}
    if args.http_fetch:
        from wbot_ray.stages.httpfetch import make_http_fetcher

        extra["fetcher_factory"] = make_http_fetcher
    if args.proxy:
        extra["proxies"] = [args.proxy]
    if args.robots_from_http and args.mode == "strict" and args.seeds:
        from urllib.parse import urlsplit

        from wbot_ray.robots import fetch_robots_http

        hosts: list[str] = []
        schemes: dict[str, str] = {}
        for s in args.seeds:
            sp = urlsplit(s)
            hosts.append(sp.netloc)
            schemes.setdefault(sp.netloc, sp.scheme or "https")
        extra["robots_bodies"] = fetch_robots_http(
            hosts, proxy=args.proxy, schemes=schemes
        )

    cfg = CrawlConfig(
        max_depth=args.max_depth,
        mode=args.mode,
        politeness=args.politeness,
        num_buckets=args.num_buckets,
        seen_shards=args.seen_shards,
        **extra,
    )
    run = Crawler(cfg, workdir=args.workdir).crawl(
        seeds=args.seeds,
        pages_path=args.pages,
        resume=args.resume,
        stop_after_round=args.stop_after_round,
    )
    out = {
        "workdir": args.workdir,
        "rounds": len(run.manifest["rounds"]),
        "metrics": run.metrics_total(),
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
