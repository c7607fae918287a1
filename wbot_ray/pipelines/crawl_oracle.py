"""Independent DuckDB oracle for the crawl core.

The crawl queries (``crawl_visited`` / ``crawl_results`` /
``crawl_metrics``) were rows-only checked in round 1; this module makes
them DuckDB-checkable. Split of responsibilities:

* **Side tables** (``write_crawl_oracle_tables``): the fixture corpus is
  expanded into a static *link graph* — one row per (page, parsed child
  link) with the engine's canonical dst URL/hash and the static gate
  verdict — plus a per-page table with the truncated-body extracted text
  and parsed-link count. These are computed with the engine's *scalar*
  functions (``parse_url`` / ``resolve_url`` / ``find_links`` /
  ``extract_text`` / the filter chain), each of which is independently
  unit-tested against reference byte vectors (``tests/test_urlnorm.py``,
  ``tests/test_html.py``, ``tests/test_filters.py``). They are pure
  per-row facts about the corpus — no BFS, dedup, ordering or metrics
  logic enters the tables.

* **SQL** (``crawl_oracle_sqls``): everything the distributed engine
  actually orchestrates — BFS rounds, enqueue-time first-wins dedup
  (seeds never pre-seen, ``crawler.go:173-194``), FIFO ordering
  (``ord64 = parent_ord·2^20 + link_idx``, ``queue.go:29-36``), the
  depth gate (``crawler.go:244-246``), fetch-miss accounting
  (``crawler.go:230-234``) and the 7 metrics counters plus the virtual
  politeness budget — is recomputed from scratch in DuckDB as an
  *unrolled* per-round CTE chain (``max_depth`` is small and static, so
  unrolling is exact and avoids recursive-CTE dedup subtleties).

Static-gate caveat: the robots gate is evaluated with the config's
first user agent. The reference applies robots per request UA — with
the default config (one UA, fidelity-mode always-allow robots) the
verdict is UA-independent, which is the configuration the driver
checks. Configs with per-UA robots variance are outside this oracle.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from wbot_ray.config import CrawlConfig
from wbot_ray.filters import RuleFilter, in_scope
from wbot_ray.html import extract_text, find_links
from wbot_ray.robots import RobotsGate
from wbot_ray.urlnorm import URLError, parse_url, resolve_url

__all__ = ["write_crawl_oracle_tables", "crawl_oracle_sqls"]

LINKS_SCHEMA = pa.schema(
    [
        ("src_url", pa.string()),
        ("link_idx", pa.int32()),
        ("dst_url", pa.string()),
        ("dst_hash", pa.string()),
        ("dst_root", pa.string()),
        ("gated", pa.bool_()),
    ]
)

PAGES_ORACLE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("text_trunc", pa.string()),
        ("lang", pa.string()),
        ("n_links", pa.int32()),
    ]
)


def _expand_pages(tbl: pa.Table, cfg: CrawlConfig) -> tuple[pa.Table, pa.Table]:
    """(pages_oracle, links) rows for one chunk of the corpus."""
    rule_filter = RuleFilter(cfg.filter_rules)
    robots = RobotsGate(cfg.mode, cfg.robots_bodies)
    ua = cfg.user_agent_for_seed(0)
    max_body = cfg.max_body_size

    p_url, p_text, p_lang, p_n = [], [], [], []
    l_src, l_idx, l_dst, l_hash, l_root, l_gated = [], [], [], [], [], []

    urls = tbl.column("url").to_pylist()
    htmls = tbl.column("html").to_pylist()
    langs = tbl.column("lang").to_pylist()
    for url, html, lang in zip(urls, htmls, langs):
        src_root = parse_url(url).root
        body = html[:max_body]
        children = []
        for href in find_links(body):
            try:
                children.append(parse_url(resolve_url(url, href)))
            except URLError:
                continue
        p_url.append(url)
        p_text.append(extract_text(body))
        p_lang.append(lang)
        p_n.append(len(children))
        for li, c in enumerate(children):
            ok = (
                in_scope(src_root, c.host, cfg.mode)
                and robots.allowed(ua, url)
                and rule_filter.allow(c.root, c.path, c.url)
            )
            l_src.append(url)
            l_idx.append(li)
            l_dst.append(c.url)
            l_hash.append(c.hash)
            l_root.append(c.root)
            l_gated.append(ok)

    pages = pa.table(
        {"url": p_url, "text_trunc": p_text, "lang": p_lang,
         "n_links": pa.array(p_n, pa.int32())},
        schema=PAGES_ORACLE_SCHEMA,
    )
    links = pa.table(
        {"src_url": l_src, "link_idx": pa.array(l_idx, pa.int32()), "dst_url": l_dst,
         "dst_hash": l_hash, "dst_root": l_root, "gated": pa.array(l_gated, pa.bool_())},
        schema=LINKS_SCHEMA,
    )
    return pages, links


def write_crawl_oracle_tables(
    pages_path: str, out_dir: str, cfg: CrawlConfig, chunk_rows: int = 2048
) -> tuple[str, str]:
    """Write ``pages_oracle.parquet`` + ``links.parquet`` under
    ``out_dir``; idempotent (atomic rename, skips when present). Chunks
    fan out as Ray tasks when a Ray runtime is up (the expansion is
    embarrassingly parallel per page)."""
    pages_out = os.path.join(out_dir, "pages_oracle.parquet")
    links_out = os.path.join(out_dir, "links.parquet")
    if os.path.exists(pages_out) and os.path.exists(links_out):
        return pages_out, links_out
    os.makedirs(out_dir, exist_ok=True)

    corpus = pq.read_table(pages_path, columns=["url", "html", "lang"])
    chunks = [
        corpus.slice(off, chunk_rows) for off in range(0, corpus.num_rows, chunk_rows)
    ]
    import ray

    if ray.is_initialized() and len(chunks) > 1:
        expand = ray.remote(_expand_pages)
        parts = ray.get([expand.remote(c, cfg) for c in chunks])
    else:
        parts = [_expand_pages(c, cfg) for c in chunks]
    pages = pa.concat_tables(p for p, _ in parts)
    links = pa.concat_tables(l for _, l in parts)
    for tbl, path in ((pages, pages_out), (links, links_out)):
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    return pages_out, links_out


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def crawl_oracle_sqls(
    seeds: list[str],
    cfg: CrawlConfig,
    pages_oracle_path: str,
    links_path: str,
) -> dict[str, str]:
    """DuckDB SQL for ``crawl_visited`` / ``crawl_results`` /
    ``crawl_metrics``, as an unrolled BFS over the side tables.

    Round semantics reproduced (reference ``crawler.go:195-291``):
    frontier_0 = seeds (never marked seen); candidates of round d<max_depth
    = gated links of *fetched* frontier pages, ordered by
    ``ord64 = crawl_ord·2^20 + link_idx``; dedup = first-wins by ord64
    within the round, minus every hash enqueued in earlier rounds
    (f1..fd — seeds excluded, the seed-revisit quirk); ``crawl_ord`` is
    the dense global pop rank. Metrics mirror ``metrics.go:8-17`` plus
    the virtual politeness budget (token-bucket wall-clock lower bound,
    ``limiter.go:52-59``)."""
    max_depth = cfg.max_depth
    rate, interval = cfg.rate_for_root("")  # default/wildcard rate
    parsed = [parse_url(s) for s in seeds]

    rows = ",\n      ".join(
        f"(CAST({i} AS BIGINT), {_sq(p.url)}, {_sq(p.hash)}, CAST(0 AS INTEGER), {_sq(p.root)})"
        for i, p in enumerate(parsed)
    )
    ctes = [
        f"lk AS (SELECT * FROM read_parquet({_sq(links_path)}))",
        f"pg AS (SELECT * FROM read_parquet({_sq(pages_oracle_path)}))",
        f"f0 AS (SELECT * FROM (VALUES\n      {rows}\n    ) AS t(crawl_ord, url, url_hash, depth, root))",
    ]
    base_terms = ["(SELECT COUNT(*) FROM f0)"]
    for d in range(max_depth):
        seen = " UNION ALL ".join(
            f"SELECT url_hash FROM f{r}" for r in range(1, d + 1)
        )
        seen_clause = f"\n        AND l.dst_hash NOT IN ({seen})" if seen else ""
        ctes.append(
            f"""c{d} AS (
      SELECT l.dst_url AS url, l.dst_hash AS url_hash, l.dst_root AS root,
             CAST(f.depth + 1 AS INTEGER) AS depth,
             f.crawl_ord * 1048576 + l.link_idx AS ord64
      FROM f{d} f JOIN lk l ON l.src_url = f.url
      WHERE l.gated{seen_clause}
    )"""
        )
        base = " + ".join(base_terms)
        ctes.append(
            f"""f{d + 1} AS (
      SELECT CAST({base} + ROW_NUMBER() OVER (ORDER BY ord64) - 1 AS BIGINT) AS crawl_ord,
             url, url_hash, depth, root
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY url_hash ORDER BY ord64) AS rn FROM c{d})
      WHERE rn = 1
    )"""
        )
        base_terms.append(f"(SELECT COUNT(*) FROM f{d + 1})")

    visited_union = " UNION ALL ".join(
        f"SELECT crawl_ord, url, url_hash, depth FROM f{d}" for d in range(max_depth + 1)
    )
    with_clause = "WITH " + ",\n    ".join(ctes)

    visited_sql = f"{with_clause}\n    SELECT * FROM ({visited_union})"

    results_sql = f"""{with_clause},
    vis AS ({visited_union})
    SELECT v.crawl_ord, v.url, v.depth, CAST(200 AS INTEGER) AS status,
           p.text_trunc AS text, p.lang, p.n_links
    FROM vis v JOIN pg p ON p.url = v.url"""

    round_rows = []
    for d in range(max_depth + 1):
        expanding = d < max_depth
        total_link = (
            f"CAST((SELECT COALESCE(SUM(p.n_links), 0) FROM f{d} f JOIN pg p ON p.url = f.url) AS BIGINT)"
            if expanding
            else "CAST(0 AS BIGINT)"
        )
        skipped = (
            f"(SELECT COUNT(*) FROM f{d} f JOIN lk l ON l.src_url = f.url WHERE NOT l.gated)"
            if expanding
            else "CAST(0 AS BIGINT)"
        )
        crawled = f"(SELECT COUNT(*) FROM f{d + 1})" if expanding else "CAST(0 AS BIGINT)"
        # duplicated = accepted (gated, BEFORE any dedup) - survivors:
        # the engine counts both within-round and seen-set duplicates
        dup = (
            f"(SELECT COUNT(*) FROM f{d} f JOIN lk l ON l.src_url = f.url WHERE l.gated)"
            f" - (SELECT COUNT(*) FROM f{d + 1})"
            if expanding
            else "CAST(0 AS BIGINT)"
        )
        if cfg.politeness == "off":
            vsec = "CAST(0.0 AS DOUBLE)"
        else:
            vsec = (
                f"CAST((SELECT COALESCE(MAX(CEIL(cnt * 1.0 / {rate})), 0) * {interval!r} "
                f"FROM (SELECT COUNT(*) AS cnt FROM f{d} GROUP BY root) _g) AS DOUBLE)"
            )
        round_rows.append(
            f"""SELECT CAST({d} AS BIGINT) AS round,
           (SELECT COUNT(*) FROM f{d}) AS total_requests,
           (SELECT COUNT(*) FROM f{d} f JOIN pg p ON p.url = f.url) AS successful_requests,
           (SELECT COUNT(*) FROM f{d}) - (SELECT COUNT(*) FROM f{d} f JOIN pg p ON p.url = f.url) AS failed_requests,
           {total_link} AS total_link,
           {crawled} AS crawled_link,
           {skipped} AS skipped_link,
           {dup} AS duplicated_link,
           {vsec} AS virtual_politeness_sec
    WHERE (SELECT COUNT(*) FROM f{d}) > 0"""
        )
    metrics_sql = f"{with_clause}\n    " + "\n    UNION ALL ".join(round_rows)

    return {
        "crawl_visited": visited_sql,
        "crawl_results": results_sql,
        "crawl_metrics": metrics_sql,
    }
