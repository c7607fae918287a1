"""Web-corpus audit operators — the maintenance passes a production
crawl runs between harvests.

* :func:`crawl_traps` — per-host URL-template explosion profile (the
  crawler-trap detector: calendar pages, session-id spaces, faceted
  search). Template = path with digit runs folded to ``N`` (RE2 shared
  verbatim with the oracle); a host whose url/template ratio explodes
  is generating an infinite URL space from few page "shapes".
* :func:`boilerplate_lines` — per-host frequent-line detection (the
  CCNet/trafilatura boilerplate pass): a line appearing in ≥
  ``min_docs`` documents of the same host is nav/footer chrome, not
  content. Fixture pages are single-line, so a deterministic host
  footer is synthesized in-batch (rule shared with the SQL twin — the
  ``snapshot_latest`` technique); the operator itself just counts
  whatever lines arrive.
* :func:`change_rate` — per-host content change rate over a
  deterministically synthesized re-crawl stream (same technique): the
  signal an adaptive re-crawl scheduler reads (Cho & Garcia-Molina's
  frequency estimation). Changes are detected from content md5s only —
  the operator never sees the synthesis rule.
* :func:`mirror_hosts` — cross-host content duplication (mirror / CDN
  alias detection): host pairs sharing identical page bodies, from
  distinct ``(content_md5, host)`` facts. Deterministic mirrors are
  synthesized in-batch so the gate is non-trivial at every scale.

Ray shapes: every operator is batch-local partials over a pruned
column read, then ONE slim keyed exchange (two for the pair expansion
in ``mirror_hosts``) — text/html never enter an exchange. Per-row md5
identities use Python's hashlib exactly where the repo already does
(``maintenance.corpus_diff``): md5 is the cross-engine identity DuckDB
can recompute, and the loop runs over batch-distinct slim rows only.

``mirror_hosts`` pair expansion is O(h²) per content hash in the
number of hosts sharing that hash — real mirror sets are small (2–5
hosts); a pathologically viral payload would need a group-size cap,
which is deliberately NOT applied so the SQL gate stays value-exact
(no silent caps).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from wbot_ray.pipelines.urlstats import HOST_RE, PATH_RE, _pages_path_for

__all__ = [
    "crawl_traps",
    "crawl_traps_oracle_sql",
    "boilerplate_lines",
    "boilerplate_lines_oracle_sql",
    "change_rate",
    "change_rate_oracle_sql",
    "mirror_hosts",
    "mirror_hosts_oracle_sql",
    "host_quota",
    "host_quota_oracle_sql",
    "dedup_url",
    "dedup_url_oracle_sql",
    "recrawl_priority",
    "recrawl_priority_oracle_sql",
    "host_dup_ratio",
    "host_dup_ratio_oracle_sql",
    "text_outlinks",
    "text_outlinks_oracle_sql",
    "holdout_split",
    "holdout_split_oracle_sql",
    "warc_stats",
    "warc_stats_oracle_sql",
    "jsonl_stats",
    "jsonl_stats_oracle_sql",
    "URL_MENTION_RE",
    "TRAP_DIGIT_RE",
]

# shared RE2 patterns — compiled identically by polars and DuckDB
TRAP_DIGIT_RE = "[0-9]+"

# URL canonicalization chain (dedup_url), applied in this order; every
# pattern string is shared verbatim with the SQL twin:
#   1. drop the fragment            (FRAG_RE -> '')
#   2. fold http:// to https://     (SCHEME_FOLD_RE -> 'https://')
#   3. strip a leading 'www.'       (WWW_RE -> 'https://')
#   4. remove tracking params       (TRACK_RE -> '', global)
#   5. re-anchor the query: first '&' with no '?' before it becomes '?'
#      (AMP_FIX_RE -> '\1?', first occurrence only)
#   6. drop a dangling '?'/'&'      (TRAIL_RE -> '')
FRAG_RE = "#.*$"
SCHEME_FOLD_RE = "^http://"
WWW_RE = "^https://www\\."
TRACK_RE = "[?&](?:utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&#]*"
AMP_FIX_RE = "^([^?]*?)&"
TRAIL_RE = "[?&]$"


def _md5s(texts: list[str]) -> list[str]:
    return [hashlib.md5(t.encode()).hexdigest() for t in texts]


def crawl_traps(sf_dir: str, num_buckets: int = 32, pages_path: str | None = None):
    """Per host: ``(host, n_urls, n_templates, upt_x1000)`` where
    ``upt_x1000 = n_urls * 1000 // n_templates`` (urls-per-template,
    integer-scaled — the trap score a frontier scheduler thresholds).
    Query strings are ignored: the template is the PATH component with
    every digit run folded to ``N``.

    Shape: per-batch distinct ``(host, tmpl)`` counts, one keyed
    exchange carrying ≤ one slim row per (batch, host, template)."""
    pages = rd.read_parquet(pages_path or _pages_path_for(sf_dir), columns=["url"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(batch.select(["url"]))
            .with_columns(
                host=pl.col("url").str.extract(HOST_RE, 1).fill_null("").str.to_lowercase(),
                path=pl.col("url").str.extract(PATH_RE, 1).fill_null(""),
            )
            .with_columns(tmpl=pl.col("path").str.replace_all(TRAP_DIGIT_RE, "N"))
            .group_by(["host", "tmpl"])
            .agg(n=pl.len().cast(pl.Int64))
            .with_columns(
                bucket=(pl.col("host").hash(seed=0) % np.uint64(num_buckets)).cast(pl.Int64)
            )
        )
        return df.select(["bucket", "host", "tmpl", "n"]).to_arrow().cast(
            pa.schema(
                [
                    ("bucket", pa.int64()),
                    ("host", pa.string()),
                    ("tmpl", pa.string()),
                    ("n", pa.int64()),
                ]
            )
        )

    def fold(group: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(group.select(["host", "tmpl", "n"]))
            .group_by("host")
            .agg(
                n_urls=pl.col("n").sum().cast(pl.Int64),
                n_templates=pl.col("tmpl").n_unique().cast(pl.Int64),
            )
            .with_columns(upt_x1000=(pl.col("n_urls") * 1000 // pl.col("n_templates")))
        )
        return df.select(["host", "n_urls", "n_templates", "upt_x1000"]).to_arrow().cast(
            pa.schema(
                [
                    ("host", pa.string()),
                    ("n_urls", pa.int64()),
                    ("n_templates", pa.int64()),
                    ("upt_x1000", pa.int64()),
                ]
            )
        )

    return (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def crawl_traps_oracle_sql(pages_path: str) -> str:
    """DuckDB twin: same RE2 patterns, plain grouped distinct."""
    return f"""
        WITH p AS (
          SELECT lower(COALESCE(regexp_extract(url, '{HOST_RE}', 1), '')) AS host,
                 regexp_replace(
                   COALESCE(regexp_extract(url, '{PATH_RE}', 1), ''),
                   '{TRAP_DIGIT_RE}', 'N', 'g') AS tmpl
          FROM read_parquet('{pages_path}')
        )
        SELECT host,
               CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(COUNT(DISTINCT tmpl) AS BIGINT) AS n_templates,
               CAST(COUNT(*) * 1000 // COUNT(DISTINCT tmpl) AS BIGINT) AS upt_x1000
        FROM p GROUP BY host
    """


def boilerplate_lines(
    sf_dir: str,
    min_docs: int = 3,
    num_buckets: int = 32,
    pages_path: str | None = None,
):
    """Per-host boilerplate lines: ``(host, line_md5, n_docs)`` for
    every line appearing in ≥ ``min_docs`` distinct documents of the
    host. Synthesized footer rule (shared with the twin): each page's
    text gains ``'nav <host> home about contact'`` and
    ``'copyright <host>'`` lines; the operator splits on newline and
    counts distinct-(doc, line) facts — it never sees the rule.

    Shape: explode → batch-distinct (url, host, line) → per-batch
    (host, line_md5) doc counts (a url lives in exactly one batch, so
    partials sum exactly) → one keyed exchange of slim md5 rows."""
    pages = rd.read_parquet(pages_path or _pages_path_for(sf_dir), columns=["url", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(batch.select(["url", "text"]))
            .with_columns(
                host=pl.col("url").str.extract(HOST_RE, 1).fill_null("").str.to_lowercase()
            )
            .with_columns(
                line=(
                    pl.col("text")
                    + "\n" + "nav " + pl.col("host") + " home about contact"
                    + "\n" + "copyright " + pl.col("host")
                ).str.split("\n")
            )
            .explode("line")
            .unique(subset=["url", "host", "line"])
        )
        df = (
            df.with_columns(line_md5=pl.Series(_md5s(df.get_column("line").to_list()), dtype=pl.String))
            .group_by(["host", "line_md5"])
            .agg(n=pl.len().cast(pl.Int64))
            .with_columns(
                bucket=(pl.col("host").hash(seed=0) % np.uint64(num_buckets)).cast(pl.Int64)
            )
        )
        return df.select(["bucket", "host", "line_md5", "n"]).to_arrow().cast(
            pa.schema(
                [
                    ("bucket", pa.int64()),
                    ("host", pa.string()),
                    ("line_md5", pa.string()),
                    ("n", pa.int64()),
                ]
            )
        )

    def fold(group: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(group.select(["host", "line_md5", "n"]))
            .group_by(["host", "line_md5"])
            .agg(n_docs=pl.col("n").sum().cast(pl.Int64))
            .filter(pl.col("n_docs") >= min_docs)
        )
        return df.select(["host", "line_md5", "n_docs"]).to_arrow().cast(
            pa.schema(
                [
                    ("host", pa.string()),
                    ("line_md5", pa.string()),
                    ("n_docs", pa.int64()),
                ]
            )
        )

    return (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def boilerplate_lines_oracle_sql(pages_path: str, min_docs: int = 3) -> str:
    """DuckDB twin: same footer synthesis, unnest + distinct + HAVING."""
    return f"""
        WITH p AS (
          SELECT url,
                 lower(COALESCE(regexp_extract(url, '{HOST_RE}', 1), '')) AS host,
                 text
          FROM read_parquet('{pages_path}')
        ), exploded AS (
          SELECT url, host,
                 unnest(string_split(
                   text || chr(10) || 'nav ' || host || ' home about contact'
                        || chr(10) || 'copyright ' || host,
                   chr(10))) AS line
          FROM p
        ), l AS (
          SELECT DISTINCT url, host, line FROM exploded
        )
        SELECT host, md5(line) AS line_md5, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM l GROUP BY host, md5(line)
        HAVING COUNT(*) >= {min_docs}
    """


def change_rate(sf_dir: str, num_buckets: int = 32, pages_path: str | None = None):
    """Per-host content change rate over a synthesized re-crawl stream:
    ``(host, n_urls, n_snapshots, n_changes, change_ppm)`` with
    ``change_ppm = n_changes * 1000000 // (n_snapshots - n_urls)``
    (changes per re-crawl, ppm; 0 when a host was never re-crawled).

    Synthesis rule (shared with the twin): urls with ``length(url) % 3
    == 1`` get an UNCHANGED re-crawl; urls with ``length(url) % 7 ==
    2`` get a CHANGED one (``text || ' changed'``). The operator folds
    content md5s only: per-url versions = distinct md5 count — so an
    unchanged re-crawl correctly contributes a snapshot but no change.

    Shape: per-url version counting is batch-local (a url lives in one
    batch); one keyed exchange carries per-(batch, host) count rows."""
    pages = rd.read_parquet(pages_path or _pages_path_for(sf_dir), columns=["url", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        base = pl.from_arrow(batch.select(["url", "text"])).with_columns(
            host=pl.col("url").str.extract(HOST_RE, 1).fill_null("").str.to_lowercase()
        )
        base = base.with_columns(m=pl.Series(_md5s(base.get_column("text").to_list()), dtype=pl.String))
        ulen = pl.col("url").str.len_chars()
        re1 = base.filter(ulen % 3 == 1)  # unchanged re-crawl: same md5
        re2 = base.filter(ulen % 7 == 2)
        if re2.height:
            re2 = re2.with_columns(
                m=pl.Series(_md5s([t + " changed" for t in re2.get_column("text").to_list()]), dtype=pl.String)
            )
        snaps = pl.concat([base, re1, re2]).select(["url", "host", "m"])
        df = (
            snaps.group_by(["url", "host"])
            .agg(
                n_snaps=pl.len().cast(pl.Int64),
                n_changes=(pl.col("m").n_unique() - 1).cast(pl.Int64),
            )
            .group_by("host")
            .agg(
                n_urls=pl.len().cast(pl.Int64),
                n_snapshots=pl.col("n_snaps").sum().cast(pl.Int64),
                n_changes=pl.col("n_changes").sum().cast(pl.Int64),
            )
            .with_columns(
                bucket=(pl.col("host").hash(seed=0) % np.uint64(num_buckets)).cast(pl.Int64)
            )
        )
        return df.select(["bucket", "host", "n_urls", "n_snapshots", "n_changes"]).to_arrow().cast(
            pa.schema(
                [
                    ("bucket", pa.int64()),
                    ("host", pa.string()),
                    ("n_urls", pa.int64()),
                    ("n_snapshots", pa.int64()),
                    ("n_changes", pa.int64()),
                ]
            )
        )

    def fold(group: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(group.select(["host", "n_urls", "n_snapshots", "n_changes"]))
            .group_by("host")
            .agg(
                n_urls=pl.col("n_urls").sum().cast(pl.Int64),
                n_snapshots=pl.col("n_snapshots").sum().cast(pl.Int64),
                n_changes=pl.col("n_changes").sum().cast(pl.Int64),
            )
            .with_columns(
                change_ppm=pl.when(pl.col("n_snapshots") - pl.col("n_urls") == 0)
                .then(0)
                .otherwise(
                    pl.col("n_changes") * 1000000
                    // (pl.col("n_snapshots") - pl.col("n_urls"))
                )
                .cast(pl.Int64)
            )
        )
        return df.select(
            ["host", "n_urls", "n_snapshots", "n_changes", "change_ppm"]
        ).to_arrow().cast(
            pa.schema(
                [
                    ("host", pa.string()),
                    ("n_urls", pa.int64()),
                    ("n_snapshots", pa.int64()),
                    ("n_changes", pa.int64()),
                    ("change_ppm", pa.int64()),
                ]
            )
        )

    return (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def change_rate_oracle_sql(pages_path: str) -> str:
    """DuckDB twin: same snapshot synthesis, distinct-md5 fold."""
    return f"""
        WITH base AS (
          SELECT url,
                 lower(COALESCE(regexp_extract(url, '{HOST_RE}', 1), '')) AS host,
                 text
          FROM read_parquet('{pages_path}')
        ), snaps AS (
          SELECT url, host, md5(text) AS m FROM base
          UNION ALL
          SELECT url, host, md5(text) FROM base WHERE length(url) % 3 = 1
          UNION ALL
          SELECT url, host, md5(text || ' changed') FROM base WHERE length(url) % 7 = 2
        ), per_url AS (
          SELECT url, host,
                 COUNT(*) AS n_snaps,
                 COUNT(DISTINCT m) - 1 AS n_changes
          FROM snaps GROUP BY url, host
        )
        SELECT host,
               CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(SUM(n_snaps) AS BIGINT) AS n_snapshots,
               CAST(SUM(n_changes) AS BIGINT) AS n_changes,
               CAST(CASE WHEN SUM(n_snaps) - COUNT(*) = 0 THEN 0
                    ELSE SUM(n_changes) * 1000000 // (SUM(n_snaps) - COUNT(*))
                    END AS BIGINT) AS change_ppm
        FROM per_url GROUP BY host
    """


def mirror_hosts(
    sf_dir: str,
    num_buckets: int = 32,
    pages_path: str | None = None,
    max_hosts_per_hash: int = 64,
):
    """Host pairs sharing identical page bodies: ``(host_a, host_b,
    n_shared)`` with ``host_a < host_b`` and ``n_shared`` = number of
    distinct shared content md5s. Deterministic mirror synthesis
    (shared with the twin): pages whose ``md5(url)`` hex starts with
    ``'0'`` (~1/16) also exist on ``'m.' || host``.

    Shape: batch-distinct (content_md5, host) facts → exchange 1 keyed
    on bucket(md5) (all hosts of a given md5 co-locate; pairs expand
    per md5 inside the group) → exchange 2 keyed on the pair to sum
    partial counts. Both exchanges carry slim hash/host rows only.

    Skew bound: inside each md5 group only the LEXICOGRAPHIC-FIRST
    ``max_hosts_per_hash`` hosts pair up — a viral boilerplate body
    shared by 10^5 hosts (parking pages, CDN error pages) would
    otherwise expand to 10^10 pairs in a single group task. The cap
    rule is deterministic (order by host) and applied IDENTICALLY in
    the SQL twin (``QUALIFY row_number() OVER (PARTITION BY m ORDER BY
    host) <= k``), so the query stays value-exact; hosts beyond the
    cap simply don't contribute that hash to any pair, which callers
    needing exhaustive mirror sets recover by raising the cap."""
    pages = rd.read_parquet(pages_path or _pages_path_for(sf_dir), columns=["url", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["url", "text"])).with_columns(
            host=pl.col("url").str.extract(HOST_RE, 1).fill_null("").str.to_lowercase()
        )
        df = df.with_columns(
            m=pl.Series(_md5s(df.get_column("text").to_list()), dtype=pl.String),
            um=pl.Series(_md5s(df.get_column("url").to_list()), dtype=pl.String),
        )
        mirrored = df.filter(pl.col("um").str.starts_with("0")).with_columns(
            host="m." + pl.col("host")
        )
        facts = (
            pl.concat([df, mirrored])
            .select(["m", "host"])
            .unique()
            .with_columns(
                bucket=(pl.col("m").hash(seed=0) % np.uint64(num_buckets)).cast(pl.Int64)
            )
        )
        return facts.select(["bucket", "m", "host"]).to_arrow().cast(
            pa.schema(
                [
                    ("bucket", pa.int64()),
                    ("m", pa.string()),
                    ("host", pa.string()),
                ]
            )
        )

    def pairs(group: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(group.select(["m", "host"])).unique()
        # skew cap: all hosts of an md5 co-locate here, so ranking by
        # host inside the group is GLOBALLY exact (same rule as the
        # oracle's QUALIFY) — the join below is then O(k^2) per hash,
        # never O(h^2)
        df = (
            df.sort(["m", "host"])
            .with_columns(rk=pl.col("host").cum_count().over("m"))
            .filter(pl.col("rk") <= max_hosts_per_hash)
            .drop("rk")
        )
        j = df.join(df, on="m", suffix="_b")
        out = (
            j.filter(pl.col("host") < pl.col("host_b"))
            .group_by(["host", "host_b"])
            .agg(n=pl.len().cast(pl.Int64))
            .rename({"host": "host_a", "host_b": "host_b"})
            .with_columns(
                pbucket=(
                    (pl.col("host_a") + "|" + pl.col("host_b")).hash(seed=0)
                    % np.uint64(num_buckets)
                ).cast(pl.Int64)
            )
        )
        return out.select(["pbucket", "host_a", "host_b", "n"]).to_arrow().cast(
            pa.schema(
                [
                    ("pbucket", pa.int64()),
                    ("host_a", pa.string()),
                    ("host_b", pa.string()),
                    ("n", pa.int64()),
                ]
            )
        )

    def fold(group: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(group.select(["host_a", "host_b", "n"]))
            .group_by(["host_a", "host_b"])
            .agg(n_shared=pl.col("n").sum().cast(pl.Int64))
        )
        return df.select(["host_a", "host_b", "n_shared"]).to_arrow().cast(
            pa.schema(
                [
                    ("host_a", pa.string()),
                    ("host_b", pa.string()),
                    ("n_shared", pa.int64()),
                ]
            )
        )

    return (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def host_quota(sf_dir: str, n: int = 25, num_buckets: int = 32, pages_path: str | None = None):
    """Per-domain document cap (the RefinedWeb/Dolma anti-SEO-spam
    stage): keep at most ``n`` pages per host — the FIRST-captured win
    (order by ``warc_ts``, then url) — emitting ``(host, url,
    host_rank)`` for the kept rows.

    Shape (the ``group_topn`` bounded-exchange pattern): each batch
    keeps ≤ n rows per host it sees (a row outside its batch's per-host
    top-n can never be in the global top-n), so the exchange carries
    ≤ n slim rows per (batch, host); one ``groupby(bucket(host))``
    fold finishes the rank. At 100 TB both stages stay bounded."""
    from wbot_ray.pipelines.relational import _topn_per_key

    pages = rd.read_parquet(
        pages_path or _pages_path_for(sf_dir), columns=["url", "warc_ts"]
    )

    def _hosts(urls: list[str]) -> np.ndarray:
        import polars as pl

        return (
            pl.Series(urls, dtype=pl.String)
            .str.extract(HOST_RE, 1)
            .fill_null("")
            .str.to_lowercase()
            .to_numpy()
        )

    def _keep(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """(kept row indices in (host, ts, url) order, hosts, ts, urls)."""
        urls = np.asarray(tbl.column("url").to_pylist(), dtype=np.str_)
        hosts = _hosts(tbl.column("url").to_pylist()).astype(np.str_)
        ts = tbl.column("warc_ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        # exact within-batch host identity (no hash collisions): inverse
        # indices of the unique host strings
        _, key = np.unique(hosts, return_inverse=True)
        keep = _topn_per_key(key, -ts, urls, n)
        return keep, hosts, ts, urls

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        if batch.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "host": pa.array([], pa.string()),
                    "url": pa.array([], pa.string()),
                    "ts": pa.array([], pa.int64()),
                }
            )
        keep, hosts, ts, urls = _keep(batch)
        h = pl.Series(hosts[keep].tolist(), dtype=pl.String)
        return pa.table(
            {
                "bucket": pa.array(
                    (h.hash(seed=0) % np.uint64(num_buckets)).cast(pl.Int64).to_numpy(),
                    pa.int64(),
                ),
                "host": pa.array(hosts[keep], pa.string()),
                "url": pa.array(urls[keep], pa.string()),
                "ts": pa.array(ts[keep], pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        hosts = np.asarray(group.column("host").to_pylist(), dtype=np.str_)
        urls = np.asarray(group.column("url").to_pylist(), dtype=np.str_)
        ts = np.asarray(group.column("ts").to_pylist(), dtype=np.int64)
        _, key = np.unique(hosts, return_inverse=True)
        keep = _topn_per_key(key, -ts, urls, n)  # (key, ts, url)-ordered
        k_sorted = key[keep]
        is_start = np.r_[True, k_sorted[1:] != k_sorted[:-1]]
        run_start = np.maximum.accumulate(np.where(is_start, np.arange(len(keep)), 0))
        rank = np.arange(len(keep)) - run_start + 1
        return pa.table(
            {
                "host": pa.array(hosts[keep], pa.string()),
                "url": pa.array(urls[keep], pa.string()),
                "host_rank": pa.array(rank, pa.int64()),
            }
        )

    return (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def host_quota_oracle_sql(pages_path: str, n: int = 25) -> str:
    """DuckDB twin: plain windowed row_number cap."""
    return f"""
        WITH p AS (
          SELECT url, warc_ts,
                 lower(COALESCE(regexp_extract(url, '{HOST_RE}', 1), '')) AS host
          FROM read_parquet('{pages_path}')
        ), r AS (
          SELECT host, url,
                 ROW_NUMBER() OVER (
                   PARTITION BY host ORDER BY warc_ts, url
                 ) AS host_rank
          FROM p
        )
        SELECT host, url, CAST(host_rank AS BIGINT) AS host_rank
        FROM r WHERE host_rank <= {n}
    """


def _canon_expr():
    """The canonicalization chain as a polars expression over ``url``."""
    import polars as pl

    return (
        pl.col("url")
        .str.replace_all(FRAG_RE, "")
        .str.replace(SCHEME_FOLD_RE, "https://")
        .str.replace(WWW_RE, "https://")
        .str.replace_all(TRACK_RE, "")
        .str.replace(AMP_FIX_RE, "${1}?")
        .str.replace_all(TRAIL_RE, "")
    )


def dedup_url(sf_dir: str, num_buckets: int = 32, pages_path: str | None = None):
    """URL-canonicalization dedup (the Common-Crawl URL-normalization
    pass): variants of the same page address — http/https, ``www.``,
    fragments, tracking parameters — collapse to one canonical URL.
    Output: ``(canon_url, keep_url, n_variants)`` with ``keep_url`` the
    lexicographically smallest original variant.

    The canonicalization chain is six RE2 rewrites shared verbatim
    with the SQL twin (module constants above), so the gate is
    value-exact for ANY url, not just the fixture. Because the fixture
    corpus is already clean, deterministic dirty variants are
    synthesized in-batch (urls whose ``md5(url)`` hex starts with
    ``'1'`` gain an ``http://www.`` + ``utm_source`` variant — rule
    shared with the twin); the operator canonicalizes whatever arrives.

    Shape: per-batch canonicalize + partial (min, count) per canon
    url, one keyed exchange of slim url rows."""
    pages = rd.read_parquet(pages_path or _pages_path_for(sf_dir), columns=["url"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["url"]))
        df = df.with_columns(um=pl.Series(_md5s(df.get_column("url").to_list()), dtype=pl.String))
        dirty = df.filter(pl.col("um").str.starts_with("1")).with_columns(
            url=pl.col("url").str.replace(SCHEME_FOLD_RE, "https://")
            .str.replace("^https://", "http://www.")
            + pl.when(pl.col("url").str.contains("?", literal=True))
            .then(pl.lit("&utm_source=feed"))
            .otherwise(pl.lit("?utm_source=feed"))
        )
        out = (
            pl.concat([df.select(["url"]), dirty.select(["url"])])
            .with_columns(canon=_canon_expr())
            .group_by("canon")
            .agg(
                keep_url=pl.col("url").min(),
                n=pl.len().cast(pl.Int64),
            )
            .with_columns(
                bucket=(pl.col("canon").hash(seed=0) % np.uint64(num_buckets)).cast(pl.Int64)
            )
        )
        return out.select(["bucket", "canon", "keep_url", "n"]).to_arrow().cast(
            pa.schema(
                [
                    ("bucket", pa.int64()),
                    ("canon", pa.string()),
                    ("keep_url", pa.string()),
                    ("n", pa.int64()),
                ]
            )
        )

    def fold(group: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(group.select(["canon", "keep_url", "n"]))
            .group_by("canon")
            .agg(
                keep_url=pl.col("keep_url").min(),
                n_variants=pl.col("n").sum().cast(pl.Int64),
            )
        )
        return df.rename({"canon": "canon_url"}).select(
            ["canon_url", "keep_url", "n_variants"]
        ).to_arrow().cast(
            pa.schema(
                [
                    ("canon_url", pa.string()),
                    ("keep_url", pa.string()),
                    ("n_variants", pa.int64()),
                ]
            )
        )

    return (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def dedup_url_oracle_sql(pages_path: str) -> str:
    """DuckDB twin: same variant synthesis, same six-rewrite chain
    (DuckDB backreference syntax ``\\1``; pattern strings identical)."""
    chain = (
        "regexp_replace("
        "regexp_replace("
        "regexp_replace("
        "regexp_replace("
        "regexp_replace("
        f"regexp_replace(url, '{FRAG_RE}', '', 'g'), "
        f"'{SCHEME_FOLD_RE}', 'https://'), "
        f"'{WWW_RE}', 'https://'), "
        f"'{TRACK_RE}', '', 'g'), "
        f"'{AMP_FIX_RE}', '\\1?'), "
        f"'{TRAIL_RE}', '', 'g')"
    )
    return f"""
        WITH base AS (
          SELECT url FROM read_parquet('{pages_path}')
        ), stream AS (
          SELECT url FROM base
          UNION ALL
          SELECT regexp_replace(
                   regexp_replace(url, '{SCHEME_FOLD_RE}', 'https://'),
                   '^https://', 'http://www.')
                 || CASE WHEN contains(url, '?')
                         THEN '&utm_source=feed' ELSE '?utm_source=feed' END
          FROM base WHERE md5(url) LIKE '1%'
        ), c AS (
          SELECT url, {chain} AS canon FROM stream
        )
        SELECT canon AS canon_url,
               MIN(url) AS keep_url,
               CAST(COUNT(*) AS BIGINT) AS n_variants
        FROM c GROUP BY canon
    """


def recrawl_priority(
    sf_dir: str,
    num_buckets: int = 8,
    links_path: str | None = None,
    pages_path: str | None = None,
):
    """Adaptive re-crawl scheduling score — the composition an
    incremental crawler runs between harvests: a host worth
    re-crawling is both IMPORTANT (host PageRank over the link graph)
    and VOLATILE (observed content change rate). Output per host known
    to both signals: ``(host, rank_fp, change_ppm, recrawl_fp)`` with
    ``recrawl_fp = rank_fp * change_ppm // 1000000`` (integer — exact
    cross-engine).

    Pure composition: :func:`wbot_ray.pipelines.graph.host_pagerank`
    ⋈ :func:`change_rate` via the generic ``hash_join`` (both sides
    are per-host aggregates — slim at any corpus size; static schemas
    avoid the schema-probe execution, see BASELINE.md). Inner join by
    design: a host with no link-graph presence has no rank signal, one
    with no crawl history has no change signal."""
    from wbot_ray.pipelines.graph import host_pagerank
    from wbot_ray.pipelines.join import hash_join

    pr = host_pagerank(sf_dir, links_path=links_path)
    cr = change_rate(sf_dir, pages_path=pages_path)

    def slim_cr(batch: pa.Table) -> pa.Table:
        return batch.select(["host", "change_ppm"])

    joined = hash_join(
        pr,
        cr.map_batches(slim_cr, batch_format="pyarrow"),
        key="host",
        num_buckets=num_buckets,
        left_schema=pa.schema([("host", pa.string()), ("rank_fp", pa.int64())]),
        right_schema=pa.schema([("host", pa.string()), ("change_ppm", pa.int64())]),
    )

    def score(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rank = batch.column("rank_fp").cast(pa.int64())
        ppm = batch.column("change_ppm").cast(pa.int64())
        return pa.table(
            {
                "host": batch.column("host"),
                "rank_fp": rank,
                "change_ppm": ppm,
                "recrawl_fp": pc.cast(
                    pc.divide(pc.multiply(rank, ppm), 1_000_000), pa.int64()
                ),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


def recrawl_priority_oracle_sql(links_path: str, pages_path: str) -> str:
    """DuckDB twin: the two component oracles joined on host."""
    from wbot_ray.pipelines.graph import host_pagerank_oracle_sql

    return f"""
        WITH pr AS ({host_pagerank_oracle_sql(links_path)}),
        cr AS ({change_rate_oracle_sql(pages_path)})
        SELECT pr.host, pr.rank_fp, cr.change_ppm,
               CAST(pr.rank_fp * cr.change_ppm // 1000000 AS BIGINT) AS recrawl_fp
        FROM pr JOIN cr ON pr.host = cr.host
    """


def mirror_hosts_oracle_sql(pages_path: str, max_hosts_per_hash: int = 64) -> str:
    """DuckDB twin: same mirror synthesis, distinct facts, the SAME
    lexicographic-first-k hosts-per-hash cap, self-join."""
    return f"""
        WITH p AS (
          SELECT url,
                 lower(COALESCE(regexp_extract(url, '{HOST_RE}', 1), '')) AS host,
                 text
          FROM read_parquet('{pages_path}')
        ), facts0 AS (
          SELECT DISTINCT md5(text) AS m, host FROM p
          UNION
          SELECT DISTINCT md5(text) AS m, 'm.' || host AS host
          FROM p WHERE md5(url) LIKE '0%'
        ), facts AS (
          SELECT m, host FROM facts0
          QUALIFY row_number() OVER (PARTITION BY m ORDER BY host)
                  <= {max_hosts_per_hash}
        )
        SELECT a.host AS host_a, b.host AS host_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM facts a JOIN facts b ON a.m = b.m AND a.host < b.host
        GROUP BY a.host, b.host
    """


def host_dup_ratio(sf_dir: str, pages_path: str | None = None):
    """WITHIN-host exact-duplicate share — the URL-parameter-trap /
    session-id signal (:func:`mirror_hosts` finds CROSS-host copies;
    this finds a host serving the same body under many URLs): per host
    ``(host, n_pages, n_distinct, dup_ppm)`` with ``dup_ppm =
    (n_pages - n_distinct)·10⁶ // n_pages``.

    Shape — two slim exchanges: batches fold to ``(host, content-md5,
    cnt)`` partials (text never crosses the wire), exchange 1 keyed on
    the (host, md5) pair finishes the distinct, exchange 2 folds per
    host."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    pages = rd.read_parquet(pages_path or _pages_path_for(sf_dir), columns=["url", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["url", "text"])).with_columns(
            host=pl.col("url").str.extract(HOST_RE, 1).fill_null("").str.to_lowercase()
        )
        df = df.with_columns(
            m=pl.Series(_md5s(df.get_column("text").to_list()), dtype=pl.String)
        )
        out = df.group_by(["host", "m"]).agg(cnt=pl.len().cast(pl.Int64))
        return out.to_arrow().cast(
            pa.schema([("host", pa.string()), ("m", pa.string()), ("cnt", pa.int64())])
        )

    def fold(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": batch.column("host"),
                "cnt": pc.cast(batch.column("cnt"), pa.int64()),
                "one": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n_pages"), pa.int64())
        d = pc.cast(batch.column("n_distinct"), pa.int64())
        return pa.table(
            {
                "host": batch.column("host"),
                "n_pages": n,
                "n_distinct": d,
                "dup_ppm": pc.cast(
                    pc.divide(pc.multiply(pc.subtract(n, d), 1_000_000), n), pa.int64()
                ),
            }
        )

    return (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby(["host", "m"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(fold, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("cnt", alias_name="n_pages"), Sum("one", alias_name="n_distinct"))
        .map_batches(finish, batch_format="pyarrow")
    )


def host_dup_ratio_oracle_sql(pages_path: str) -> str:
    """DuckDB twin: count vs distinct-md5 per host."""
    return f"""
        WITH p AS (
          SELECT lower(COALESCE(regexp_extract(url, '{HOST_RE}', 1), '')) AS host,
                 md5(text) AS m
          FROM read_parquet('{pages_path}')
        )
        SELECT host,
               CAST(COUNT(*) AS BIGINT) AS n_pages,
               CAST(COUNT(DISTINCT m) AS BIGINT) AS n_distinct,
               CAST((COUNT(*) - COUNT(DISTINCT m)) * 1000000 // COUNT(*) AS BIGINT)
                 AS dup_ppm
        FROM p GROUP BY host
    """


# mention-mining pattern: a URL runs to the next space (document text is
# space-tokenized) — shared VERBATIM with the SQL twin
URL_MENTION_RE = r"https?://[^ ]+"


def text_outlinks(sf_dir: str):
    """URL mentions mined from DOCUMENT TEXT (not the crawl's link
    graph — the citation/outlink signal of a text corpus): per
    mentioned host, total mentions and distinct mentioning documents.
    The fixture corpus contains no URLs, so mentions are synthesized
    in-batch by a deterministic rule (docs with ``doc_id%3==0`` cite
    ``ref<doc_id%41>.example.org``, docs with ``doc_id%7==0`` cite
    ``cdn<doc_id%13>.example.net``; both rules can hit one doc) —
    the rule is shared verbatim with the twin, and the EXTRACTION
    kernel (RE2 scan over the full text) runs for real on the
    synthesized text in both engines.

    Shape: per-batch (host, doc_id) distinct partials with mention
    counts (text stays in the scan task), exchange 1 on the pair key,
    exchange 2 per host."""
    from ray.data.aggregate import Sum

    from wbot_ray.pipelines.common import read_table

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        d = pl.col("doc_id")
        df = df.with_columns(
            text=pl.col("text")
            + pl.when(d % 3 == 0)
            .then(
                pl.lit(" see https://ref")
                + (d % 41).cast(pl.String)
                + pl.lit(".example.org/a")
            )
            .otherwise(pl.lit(""))
            + pl.when(d % 7 == 0)
            .then(
                pl.lit(" via http://cdn")
                + (d % 13).cast(pl.String)
                + pl.lit(".example.net/b")
            )
            .otherwise(pl.lit(""))
        )
        out = (
            df.select(
                "doc_id", mention=pl.col("text").str.extract_all(URL_MENTION_RE)
            )
            .explode("mention")
            .drop_nulls()
            .with_columns(
                host=pl.col("mention")
                .str.extract(HOST_RE, 1)
                .fill_null("")
                .str.to_lowercase()
            )
            .group_by(["host", "doc_id"])
            .agg(n_mentions=pl.len().cast(pl.Int64))
        )
        return out.to_arrow().cast(
            pa.schema(
                [("host", pa.string()), ("doc_id", pa.int64()), ("n_mentions", pa.int64())]
            )
        )

    def slim(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "host": batch.column("host"),
                "n_mentions": pc.cast(batch.column("n_mentions"), pa.int64()),
                "one": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "host": batch.column("host"),
                "n_mentions": pc.cast(batch.column("n_mentions"), pa.int64()),
                "n_docs": pc.cast(batch.column("n_docs"), pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["host", "doc_id"])
        .aggregate(Sum("n_mentions", alias_name="n_mentions"))
        .map_batches(slim, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_mentions", alias_name="n_mentions"), Sum("one", alias_name="n_docs")
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def text_outlinks_oracle_sql() -> str:
    """DuckDB twin: same synthesis rule, same RE2 mention scan."""
    return f"""
        WITH synth AS (
          SELECT doc_id,
                 text
                 || CASE WHEN doc_id % 3 = 0
                    THEN ' see https://ref' || CAST(doc_id % 41 AS VARCHAR)
                         || '.example.org/a' ELSE '' END
                 || CASE WHEN doc_id % 7 = 0
                    THEN ' via http://cdn' || CAST(doc_id % 13 AS VARCHAR)
                         || '.example.net/b' ELSE '' END AS text
          FROM documents
        ),
        m AS (
          SELECT doc_id,
                 UNNEST(regexp_extract_all(text, '{URL_MENTION_RE}')) AS mention
          FROM synth
        ),
        h AS (
          SELECT doc_id,
                 lower(COALESCE(regexp_extract(mention, '{HOST_RE}', 1), '')) AS host
          FROM m
        )
        SELECT host,
               CAST(COUNT(*) AS BIGINT) AS n_mentions,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM h GROUP BY host
    """


# ---------------------------------------------------------------------------
# leakage-safe corpus split
# ---------------------------------------------------------------------------

SPLIT_SALT = "split:"  # shared verbatim with the SQL twin
SPLIT_TEST_PCT = 5
SPLIT_VAL_PCT = 5


def holdout_split(
    sf_dir: str,
    test_pct: int = SPLIT_TEST_PCT,
    val_pct: int = SPLIT_VAL_PCT,
    pages_path: str | None = None,
):
    """Leakage-safe train/val/test assignment of the page corpus: the
    split key is the HOST, not the page — every page of a site lands in
    the same split, so near-duplicate pages (templates, mirrors,
    session-id variants) can never straddle the train/eval boundary
    (the contamination mode a per-document split invites). Assignment
    is the salted-hash gate of ``source_mix``: ``md5_lower64('split:'
    + host) % 100`` → ``[0, test_pct)`` = test, ``[test_pct, test_pct
    + val_pct)`` = val, rest train — reproducible on any shard subset,
    no state.

    Output is the audit summary ``(split, n_pages, n_hosts)`` (the
    assignment itself is a stateless per-row function any downstream
    stage re-applies for free). Shape — two slim exchanges over
    host-cardinality rows: per-batch ``(split, host, n)`` partials off
    a single-column read, exchange 1 finishes per-host page counts,
    exchange 2 folds per split; page text/urls never cross the wire.

    A production pipeline with the full PSL would key on the
    registrable domain (``wbot_ray.urlnorm.registrable_domain``) —
    the gated query keys on the regex host shared verbatim with the
    DuckDB twin (subdomain-level granularity; strictly finer splits,
    same leakage guarantee per host)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from wbot_ray.pipelines.common import md5_lower64

    pages = rd.read_parquet(pages_path or _pages_path_for(sf_dir), columns=["url"])
    t_hi, v_hi = int(test_pct), int(test_pct) + int(val_pct)

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(batch.select(["url"]))
            .with_columns(
                host=pl.col("url").str.extract(HOST_RE, 1).fill_null("").str.to_lowercase()
            )
            .group_by("host")
            .agg(n=pl.len().cast(pl.Int64))
        )
        hosts = df.get_column("host").to_list()
        splits = [
            "test" if r < t_hi else ("val" if r < v_hi else "train")
            for r in (md5_lower64(SPLIT_SALT + h) % 100 for h in hosts)
        ]
        return pa.table(
            {
                "split": pa.array(splits, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "n": df.get_column("n").to_arrow().cast(pa.int64()),
            }
        )

    def fold(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "split": batch.column("split"),
                "n": pc.cast(batch.column("n"), pa.int64()),
                "one": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "split": batch.column("split"),
                "n_pages": pc.cast(batch.column("n_pages"), pa.int64()),
                "n_hosts": pc.cast(batch.column("n_hosts"), pa.int64()),
            }
        )

    return (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby(["split", "host"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(fold, batch_format="pyarrow")
        .groupby("split")
        .aggregate(Sum("n", alias_name="n_pages"), Sum("one", alias_name="n_hosts"))
        .map_batches(finish, batch_format="pyarrow")
    )


def holdout_split_oracle_sql(
    pages_path: str,
    test_pct: int = SPLIT_TEST_PCT,
    val_pct: int = SPLIT_VAL_PCT,
) -> str:
    """DuckDB twin: same host regex, same salted md5 gate."""
    return f"""
        WITH p AS (
          SELECT lower(COALESCE(regexp_extract(url, '{HOST_RE}', 1), '')) AS host
          FROM read_parquet('{pages_path}')
        ), s AS (
          SELECT host,
                 CASE WHEN md5_number_lower('{SPLIT_SALT}' || host) % 100
                           < {int(test_pct)} THEN 'test'
                      WHEN md5_number_lower('{SPLIT_SALT}' || host) % 100
                           < {int(test_pct) + int(val_pct)} THEN 'val'
                      ELSE 'train' END AS split,
                 COUNT(*) AS n
          FROM p GROUP BY host
        )
        SELECT split,
               CAST(SUM(n) AS BIGINT) AS n_pages,
               CAST(COUNT(*) AS BIGINT) AS n_hosts
        FROM s GROUP BY split
    """


# ---------------------------------------------------------------------------
# WARC-lite connector gate
# ---------------------------------------------------------------------------

_WARC_CACHE_VERSION = 1


def warc_stats(sf_dir: str, pages_path: str | None = None):
    """Connector conformance gate: export the page corpus to WARC-lite
    shards (``sources.warc.write_warcish``), stream the shards BACK
    (``read_warcish``), and fold per-language stats over the
    round-tripped rows — while the oracle computes the same stats from
    the original parquet. Any record the connector loses, duplicates
    or corrupts flips the count or the order-independent XOR content
    fingerprint, so the driver's value gate covers the whole
    encode/decode path, not just a hand-picked sample.

    Fingerprint identity (shared verbatim with the twin):
    ``xor-fold of md5_number_lower(url || US || text) masked to 63
    bits`` — XOR commutes with the mask and with row order, so batch
    partials fold exactly. ``n_text_bytes`` uses UTF-8 byte length
    (DuckDB ``strlen``).

    Shape: one streaming export pass (shards content-named, committed
    atomically, cached per corpus under ``_DONE``), one shard-parallel
    read-back, per-batch partials, ONE lang-keyed exchange."""
    import hashlib
    import os

    import pyarrow.compute as pc

    from wbot_ray.pipelines.common import md5_lower64
    from wbot_ray.sources.warc import read_warcish, write_warcish

    src = pages_path or _pages_path_for(sf_dir)
    st = os.stat(src if os.path.isfile(src) else os.path.dirname(src) or ".")
    fp = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    warc_dir = f"/tmp/wbot_ray_warc/v{_WARC_CACHE_VERSION}/{fp}"
    # shards live in their own subdir: read_binary_files streams every
    # file in the directory it is given, so the _DONE marker must not
    # sit next to them
    shard_dir = os.path.join(warc_dir, "shards")
    if not os.path.exists(os.path.join(warc_dir, "_DONE")):
        pages = rd.read_parquet(src)
        write_warcish(pages, shard_dir).materialize()
        with open(os.path.join(warc_dir, "_DONE"), "w") as f:
            f.write("ok")

    MASK = (1 << 63) - 1

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        acc: dict[str, list[int]] = {}  # lang -> [n, xor, bytes]
        for lg, u, t in zip(langs, urls, texts):
            a = acc.setdefault(lg, [0, 0, 0])
            a[0] += 1
            a[1] ^= md5_lower64(u + "\x1f" + t) & MASK
            a[2] += len(t.encode())
        ks = sorted(acc)
        return pa.table(
            {
                "lang": pa.array(ks, pa.string()),
                "n": pa.array([acc[k][0] for k in ks], pa.int64()),
                "xor_fp": pa.array([acc[k][1] for k in ks], pa.int64()),
                "n_text_bytes": pa.array([acc[k][2] for k in ks], pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        xs = group.column("xor_fp").to_pylist()
        acc = 0
        for x in xs:
            acc ^= int(x)
        return pa.table(
            {
                "lang": pa.array([group.column("lang")[0].as_py()], pa.string()),
                "n_pages": pa.array(
                    [int(pc.sum(group.column("n")).as_py())], pa.int64()
                ),
                "xor_fp": pa.array([acc], pa.int64()),
                "n_text_bytes": pa.array(
                    [int(pc.sum(group.column("n_text_bytes")).as_py())], pa.int64()
                ),
            }
        )

    return (
        read_warcish(shard_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(fold, batch_format="pyarrow")
    )


def warc_stats_oracle_sql(pages_path: str) -> str:
    """DuckDB twin over the ORIGINAL parquet — the engine's numbers
    come from the WARC round-trip, so equality proves the connector."""
    return f"""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_pages,
               bit_xor(CAST(md5_number_lower(url || chr(31) || text)
                            % 9223372036854775808 AS BIGINT)) AS xor_fp,
               CAST(SUM(strlen(text)) AS BIGINT) AS n_text_bytes
        FROM read_parquet('{pages_path}')
        GROUP BY lang
    """


# ---------------------------------------------------------------------------
# JSONL connector gate
# ---------------------------------------------------------------------------

_JSONL_CACHE_VERSION = 1


def jsonl_stats(sf_dir: str, pages_path: str | None = None):
    """Connector conformance gate for the JSONL interchange format —
    the lingua franca corpora actually ship in (Dolma, FineWeb, RedPajama
    releases are JSONL shards). Exports the page corpus with Ray's
    ``Dataset.write_json`` (one ``.json`` lines-shard per block),
    streams the shards BACK with ``ray.data.read_json``, and folds the
    same per-language stats + order-independent XOR content fingerprint
    as :func:`warc_stats` — while the oracle computes them from the
    original parquet. Any row the JSON encode/decode path loses,
    duplicates, or mangles (unicode escapes, embedded quotes/newlines
    in bodies) flips the fingerprint, so the driver's value gate covers
    Ray's whole JSON connector round-trip.

    Shape: one streaming export pass (cached per corpus under a content
    fingerprint + ``_DONE``), one shard-parallel read-back, per-batch
    partials, ONE lang-keyed exchange. At 100 TB the export IS the
    deliverable (resumable shard-per-block layout); the stats pass
    rides the same scan a release-audit would."""
    import hashlib
    import os

    import pyarrow.compute as pc

    from wbot_ray.pipelines.common import md5_lower64

    src = pages_path or _pages_path_for(sf_dir)
    st = os.stat(src if os.path.isfile(src) else os.path.dirname(src) or ".")
    fp = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    jdir = f"/tmp/wbot_ray_jsonl/v{_JSONL_CACHE_VERSION}/{fp}"
    shard_dir = os.path.join(jdir, "shards")
    if not os.path.exists(os.path.join(jdir, "_DONE")):
        rd.read_parquet(src, columns=["url", "lang", "text"]).write_json(shard_dir)
        with open(os.path.join(jdir, "_DONE"), "w") as f:
            f.write("ok")

    MASK = (1 << 63) - 1

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        acc: dict[str, list[int]] = {}  # lang -> [n, xor, bytes]
        for lg, u, t in zip(langs, urls, texts):
            a = acc.setdefault(lg, [0, 0, 0])
            a[0] += 1
            a[1] ^= md5_lower64(u + "\x1f" + t) & MASK
            a[2] += len(t.encode())
        ks = sorted(acc)
        return pa.table(
            {
                "lang": pa.array(ks, pa.string()),
                "n": pa.array([acc[k][0] for k in ks], pa.int64()),
                "xor_fp": pa.array([acc[k][1] for k in ks], pa.int64()),
                "n_text_bytes": pa.array([acc[k][2] for k in ks], pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        acc = 0
        for x in group.column("xor_fp").to_pylist():
            acc ^= int(x)
        return pa.table(
            {
                "lang": pa.array([group.column("lang")[0].as_py()], pa.string()),
                "n_pages": pa.array(
                    [int(pc.sum(group.column("n")).as_py())], pa.int64()
                ),
                "xor_fp": pa.array([acc], pa.int64()),
                "n_text_bytes": pa.array(
                    [int(pc.sum(group.column("n_text_bytes")).as_py())], pa.int64()
                ),
            }
        )

    return (
        rd.read_json(shard_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(fold, batch_format="pyarrow")
    )


def jsonl_stats_oracle_sql(pages_path: str) -> str:
    """DuckDB twin over the ORIGINAL parquet — the engine's numbers
    come from the JSONL round-trip, so equality proves the connector."""
    return f"""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_pages,
               bit_xor(CAST(md5_number_lower(url || chr(31) || text)
                            % 9223372036854775808 AS BIGINT)) AS xor_fp,
               CAST(SUM(strlen(text)) AS BIGINT) AS n_text_bytes
        FROM read_parquet('{pages_path}')
        GROUP BY lang
    """
