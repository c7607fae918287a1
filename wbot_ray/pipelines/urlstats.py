"""URL-structure analytics over the web corpus — the features a
frontier prioritizer and a crawl auditor read.

* :func:`url_features` — per-page URL anatomy (host, scheme, path
  depth, query-param count, fragment flag, path extension) from ONE
  pruned single-column read. Every feature is defined by an RE2
  pattern string shared verbatim between the polars kernel and the
  DuckDB oracle (the ``pii_scrub`` / ``host_graph`` parity technique),
  so the gate is value-exact for any input, not just the fixture.
* :func:`link_gate_stats` — per-root gate audit over the link graph:
  how many discovered links each registrable domain received and how
  many survived the scope/robots/rule gates (the reference's F1–F4
  chain) — the table an operator reads to see which filters bite
  where. Batch-local partials before one tiny keyed exchange.

Both are stateless ``map_batches`` passes; at 100 TB the exchange
carries only per-(batch,key) partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

__all__ = [
    "url_features",
    "url_features_oracle_sql",
    "link_gate_stats",
    "link_gate_stats_oracle_sql",
    "url_blocklist",
    "url_blocklist_oracle_sql",
    "BLOCKED_DOMAINS",
    "BLOCK_PATH_RE",
]

# shared RE2 patterns — compiled identically by polars and DuckDB
HOST_RE = r"^[^:/?#]+://([^/?#]+)"
SCHEME_RE = r"^([^:/?#]+)://"
PATH_RE = r"^[^:/?#]+://[^/?#]*([^?#]*)"
QUERY_RE = r"\?([^#]*)"
EXT_RE = r"\.([A-Za-z0-9]+)$"


def _pages_path_for(sf_dir: str) -> str:
    from wbot_ray.pipelines.crawlq import _pages_path, scale_for_sf

    return _pages_path(scale_for_sf(sf_dir))


def url_features(sf_dir: str, pages_path: str | None = None):
    """One row per corpus URL: ``(url, scheme, host, path_depth,
    n_params, has_fragment, ext)``. Definitions (identical RE2 both
    engines): ``path_depth`` = number of ``/`` characters in the path
    component; ``n_params`` = 1 + number of ``&`` in the query
    component when a ``?`` is present, else 0; ``ext`` = trailing
    ``.alnum`` suffix of the path ('' when none)."""
    pages = rd.read_parquet(pages_path or _pages_path_for(sf_dir), columns=["url"])

    def feats(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["url"]))
        out = df.with_columns(
            scheme=pl.col("url").str.extract(SCHEME_RE, 1).fill_null(""),
            host=pl.col("url").str.extract(HOST_RE, 1).fill_null("").str.to_lowercase(),
            path=pl.col("url").str.extract(PATH_RE, 1).fill_null(""),
            query=pl.col("url").str.extract(QUERY_RE, 1),
        ).with_columns(
            path_depth=pl.col("path").str.count_matches("/", literal=True).cast(pl.Int64),
            n_params=pl.when(pl.col("query").is_null())
            .then(0)
            .otherwise(
                1 + pl.col("query").str.count_matches("&", literal=True)
            )
            .cast(pl.Int64),
            has_fragment=pl.col("url").str.contains("#", literal=True),
            ext=pl.col("path").str.extract(EXT_RE, 1).fill_null(""),
        )
        return out.select(
            ["url", "scheme", "host", "path_depth", "n_params", "has_fragment", "ext"]
        ).to_arrow().cast(
            pa.schema(
                [
                    ("url", pa.string()),
                    ("scheme", pa.string()),
                    ("host", pa.string()),
                    ("path_depth", pa.int64()),
                    ("n_params", pa.int64()),
                    ("has_fragment", pa.bool_()),
                    ("ext", pa.string()),
                ]
            )
        )

    return pages.map_batches(feats, batch_format="pyarrow")


def url_features_oracle_sql(pages_path: str) -> str:
    """DuckDB twin: the same RE2 patterns, pure string SQL."""
    return f"""
        WITH p AS (
          SELECT url,
                 COALESCE(regexp_extract(url, '{SCHEME_RE}', 1), '') AS scheme,
                 lower(COALESCE(regexp_extract(url, '{HOST_RE}', 1), '')) AS host,
                 COALESCE(regexp_extract(url, '{PATH_RE}', 1), '') AS path,
                 CASE WHEN regexp_matches(url, '\\?')
                      THEN regexp_extract(url, '\\?([^#]*)', 1) END AS query
          FROM read_parquet('{pages_path}')
        )
        SELECT url, scheme, host,
               CAST(length(path) - length(replace(path, '/', '')) AS BIGINT) AS path_depth,
               CAST(CASE WHEN query IS NULL THEN 0
                    ELSE 1 + length(query) - length(replace(query, '&', ''))
                    END AS BIGINT) AS n_params,
               contains(url, '#') AS has_fragment,
               COALESCE(regexp_extract(path, '{EXT_RE}', 1), '') AS ext
        FROM p
    """


def link_gate_stats(sf_dir: str, num_buckets: int = 32, links_path: str | None = None):
    """Per destination root: ``(dst_root, n_links, n_gated,
    n_blocked)`` over the discovered link graph — where the filter
    chain bites. Partial-aggregate per batch, one keyed exchange."""
    from wbot_ray.pipelines.graph import _links_path

    links = rd.read_parquet(
        links_path or _links_path(sf_dir), columns=["dst_root", "gated"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(batch)
            .group_by("dst_root")
            .agg(
                n=pl.len().cast(pl.Int64),
                g=pl.col("gated").cast(pl.Int64).sum(),
            )
            .with_columns(
                bucket=(pl.col("dst_root").hash(seed=0) % np.uint64(num_buckets)).cast(
                    pl.Int64
                )
            )
        )
        return df.select(["bucket", "dst_root", "n", "g"]).to_arrow().cast(
            pa.schema(
                [
                    ("bucket", pa.int64()),
                    ("dst_root", pa.string()),
                    ("n", pa.int64()),
                    ("g", pa.int64()),
                ]
            )
        )

    def fold(group: pa.Table) -> pa.Table:
        t = group.group_by("dst_root").aggregate([("n", "sum"), ("g", "sum")])
        n = t.column("n_sum").cast(pa.int64())
        g = t.column("g_sum").cast(pa.int64())
        import pyarrow.compute as pc

        return pa.table(
            {
                "dst_root": t.column("dst_root"),
                "n_links": n,
                "n_gated": g,
                "n_blocked": pc.subtract(n, g),
            }
        )

    return (
        links.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def link_gate_stats_oracle_sql(links_path: str) -> str:
    return f"""
        SELECT dst_root,
               CAST(COUNT(*) AS BIGINT) AS n_links,
               CAST(SUM(CASE WHEN gated THEN 1 ELSE 0 END) AS BIGINT) AS n_gated,
               CAST(SUM(CASE WHEN gated THEN 0 ELSE 1 END) AS BIGINT) AS n_blocked
        FROM read_parquet('{links_path}')
        GROUP BY dst_root
    """


# --- URL blocklist gate (the CCNet/RefinedWeb-style domain+path filter) ---
#
# A real deployment loads a large curated list (UT1, internal spam feeds)
# and broadcasts it once (ray.put) to every gate task; the demo list is
# deterministic and tiny but the plumbing — suffix-closed domain matching,
# an RE2 path pattern shared verbatim with the oracle, a stateless
# map_batches gate over a single-column read — is the production shape.
BLOCKED_DOMAINS: tuple[str, ...] = ("notsite0.com", "sub.site0.com", "ads.example")
BLOCK_PATH_RE = r"(?i)/(chain|casino|tracker)/"


def url_blocklist(
    sf_dir: str,
    pages_path: str | None = None,
    blocked_domains: tuple[str, ...] = BLOCKED_DOMAINS,
    block_path_re: str = BLOCK_PATH_RE,
):
    """Per-URL blocklist audit: ``(url, host, dom_blocked, path_blocked,
    keep)``. A host is domain-blocked when it equals a blocked domain or
    is any subdomain of one (suffix-closed — the standard blocklist
    semantics); a path is blocked when the shared RE2 pattern matches
    the URL's path component. ``keep`` = neither. Stateless single-pass
    gate; the list rides the task closure (at list sizes beyond a few
    MB, swap to ``ray.put`` + object-ref lookup — same gate code)."""
    pages = rd.read_parquet(pages_path or _pages_path_for(sf_dir), columns=["url"])

    def gate(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["url"])).with_columns(
            host=pl.col("url").str.extract(HOST_RE, 1).fill_null("").str.to_lowercase(),
            path=pl.col("url").str.extract(PATH_RE, 1).fill_null(""),
        )
        dom = pl.lit(False)
        for b in blocked_domains:
            dom = dom | (pl.col("host") == b) | pl.col("host").str.ends_with("." + b)
        out = df.with_columns(
            dom_blocked=dom,
            path_blocked=pl.col("path").str.contains(block_path_re),
        ).with_columns(keep=~(pl.col("dom_blocked") | pl.col("path_blocked")))
        return out.select(
            ["url", "host", "dom_blocked", "path_blocked", "keep"]
        ).to_arrow().cast(
            pa.schema(
                [
                    ("url", pa.string()),
                    ("host", pa.string()),
                    ("dom_blocked", pa.bool_()),
                    ("path_blocked", pa.bool_()),
                    ("keep", pa.bool_()),
                ]
            )
        )

    return pages.map_batches(gate, batch_format="pyarrow")


def url_blocklist_oracle_sql(
    pages_path: str,
    blocked_domains: tuple[str, ...] = BLOCKED_DOMAINS,
    block_path_re: str = BLOCK_PATH_RE,
) -> str:
    dom = " OR ".join(
        f"host = '{b}' OR host LIKE '%.{b}'" for b in blocked_domains
    )
    # RE2 pattern shared verbatim; escape single quotes for the SQL literal
    pat = block_path_re.replace("'", "''")
    return f"""
        WITH p AS (
          SELECT url,
                 lower(COALESCE(regexp_extract(url, '{HOST_RE}', 1), '')) AS host,
                 COALESCE(regexp_extract(url, '{PATH_RE}', 1), '') AS path
          FROM read_parquet('{pages_path}')
        )
        SELECT url, host,
               ({dom}) AS dom_blocked,
               regexp_matches(path, '{pat}') AS path_blocked,
               NOT (({dom}) OR regexp_matches(path, '{pat}')) AS keep
        FROM p
    """
