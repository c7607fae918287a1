"""Graph analytics over the crawl's extracted link graph — the
iterative-algorithm pattern (power iteration as repeated keyed
shuffles), complementing ``dedup.dup_clusters``' label propagation.

PageRank here is **fixed-point integer** arithmetic end-to-end: ranks
are 2^20-scaled int64, per-edge contributions are ``rank //
out_degree``, and the damping update is ``(15·2^20)//100 +
(85·Σcontrib)//100`` — every operation is an exact integer op, so the
result is independent of summation order AND bit-reproducible in a
DuckDB oracle that unrolls the same iterations (no float PageRank
drift between engines).

Reference anchor: the link graph is the one the reference crawler
extracts (``crawler.go:195-291`` discovery loop); ranking pages by
in-link mass is the canonical post-crawl scoring step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["link_pagerank", "link_degrees", "pagerank_oracle_sql"]

ONE = 1 << 20  # fixed-point unit
DAMP_NUM, DAMP_DEN = 85, 100
BASE = (100 - DAMP_NUM) * ONE // DAMP_DEN  # (15·2^20)//100 = 157286


def _links_path(sf_dir: str) -> str:
    """The crawl fixture's gated link graph for this scale (same side
    table the crawl oracles use; deterministic + cached)."""
    import os

    from wbot_ray.pipelines.crawl_oracle import write_crawl_oracle_tables
    from wbot_ray.pipelines.crawlq import _CACHE_ROOT, _pages_path, _query_cfg, scale_for_sf

    scale = scale_for_sf(sf_dir)
    pages = _pages_path(scale)
    oracle_dir = os.path.join(_CACHE_ROOT, scale, "oracle")
    _, links = write_crawl_oracle_tables(pages, oracle_dir, _query_cfg())
    return links


def link_pagerank(sf_dir: str, iters: int = 5, num_buckets: int = 32, links_path: str | None = None):
    """Fixed-point PageRank over the gated link graph, ``iters`` power
    iterations. Ray shape — the FUSED bucketed iteration: node ids are
    hashed once into ``num_buckets`` co-location buckets when the edge
    list is materialized, and because ``bucket(n)`` is the same hash
    whether ``n`` arrives as a contribution target or as an edge
    source, ONE ``groupby(bucket).map_groups`` task per bucket per
    iteration does the whole round — sums incoming contributions per
    node (Arrow ``group_by``), applies the damping update, joins the
    fresh ranks to the bucket's out-edges (Arrow hash join + numpy
    integer math) and emits next-round contributions keyed by the
    destination's bucket. Zero self-contributions keep sinks and
    leaf-only nodes alive, so no separate distinct-nodes pass is
    needed either: ``iters + 1`` keyed exchanges total (vs ``2·iters
    + 1`` for the textbook fanout/fold split) — on an iterative tiny-
    row shuffle the fixed per-exchange latency IS the cost, so halving
    exchange count halves wall time. Bucket count scales with the
    cluster, not the graph.

    URL strings never enter the iteration: nodes are hashed ONCE to
    64-bit ids (birthday-safe far past 10^9 nodes) when the edge list
    is materialized, every per-round exchange carries pure int64 rows
    (~56 B/edge vs ~300 B with URL keys — at web scale the iteration
    is exchange-bandwidth-bound, so this is the dominant cost), and
    one final keyed join maps ids back to URLs."""
    links = rd.read_parquet(
        links_path or _links_path(sf_dir), columns=["src_url", "dst_url", "gated"]
    )

    M = (1 << 63) - 1  # keep ids non-negative int64 (bucketing uses %)

    def hash_arr(urls: list) -> np.ndarray:
        """Vectorized 63-bit url ids (polars xxhash). Ids are INTERNAL —
        only equality matters (outputs re-join the url strings), so any
        collision-safe 64-bit hash works; vectorization keeps the
        one-time hashing pass off the Python interpreter."""
        import polars as pl

        h = pl.Series(urls, dtype=pl.String).hash(seed=0).to_numpy()
        return (h & np.uint64(M)).astype(np.int64)

    def to_edges(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("gated"))
        sh = hash_arr(t.column("src_url").to_pylist())
        dh = hash_arr(t.column("dst_url").to_pylist())
        return pa.table(
            {
                "bucket": pa.array(sh % num_buckets, pa.int64()),
                "src": pa.array(sh, pa.int64()),
                "dst": pa.array(dh, pa.int64()),
                "dst_bucket": pa.array(dh % num_buckets, pa.int64()),
                "r": pa.nulls(len(sh), pa.int64()),
                "url": pa.nulls(len(sh), pa.string()),
            }
        )

    def to_nodemap(batch: pa.Table) -> pa.Table:
        """(id, url) rows in the shared iteration schema (url valid is
        the discriminator) — the only place URL strings survive. These
        rows ride ONLY the final exchange, so strings cross the wire
        once per distinct-url-per-batch (O(V)), not once per edge
        endpoint per round (O(rounds × 2E))."""
        t = batch.filter(batch.column("gated"))
        urls = list(
            dict.fromkeys(
                t.column("src_url").to_pylist() + t.column("dst_url").to_pylist()
            )
        )
        h = hash_arr(urls)
        return pa.table(
            {
                "bucket": pa.array(h % num_buckets, pa.int64()),
                "src": pa.array(h, pa.int64()),
                "dst": pa.nulls(len(h), pa.int64()),
                "dst_bucket": pa.nulls(len(h), pa.int64()),
                "r": pa.nulls(len(h), pa.int64()),
                "url": pa.array(urls, pa.string()),
            }
        )

    edges = links.map_batches(to_edges, batch_format="pyarrow").materialize()
    nodemap = links.map_batches(to_nodemap, batch_format="pyarrow")

    def _contrib_rows(nodes: pa.Array, buckets, c: pa.Array) -> pa.Table:
        """Contribution rows in the shared edge schema: dst is null (the
        edge/contrib discriminator), r carries the int contribution."""
        n = len(nodes)
        return pa.table(
            {
                "bucket": buckets,
                "src": nodes,
                "dst": pa.nulls(n, pa.int64()),
                "dst_bucket": pa.nulls(n, pa.int64()),
                "r": c,
                "url": pa.nulls(n, pa.string()),
            }
        )

    def _fanout(e: pa.Table, rk: pa.Table) -> list[pa.Table]:
        """Fan a bucket's rank vector ``rk`` (src, r) over its out-edges
        ``e``: per-edge contribution r // out_degree, keyed by the
        destination's bucket — plus a zero self-row per ranked node so
        every node survives the next round's fold. All vectorized."""
        out = [
            _contrib_rows(
                rk.column("src"),
                rk.column("bucket"),
                pa.array(np.zeros(rk.num_rows, dtype=np.int64), pa.int64()),
            )
        ]
        if e.num_rows:
            od = e.group_by("src").aggregate([("src", "count")])
            j = (
                e.select(["src", "dst", "dst_bucket"])
                .join(od, keys="src", join_type="inner")
                .join(rk.select(["src", "r"]), keys="src", join_type="inner")
            )
            r = j.column("r").to_numpy(zero_copy_only=False).astype(np.int64)
            n_out = j.column("src_count").to_numpy(zero_copy_only=False).astype(np.int64)
            out.append(
                _contrib_rows(
                    j.column("dst"), j.column("dst_bucket"), pa.array(r // n_out, pa.int64())
                )
            )
        return out

    def init_fanout(group: pa.Table) -> pa.Table:
        """Round 1 from rank_0 = ONE for every node — pure edge input,
        so the distinct-node set never needs its own exchange: srcs get
        their zero row here, dsts get one keyed by dst_bucket (dupes
        across buckets are harmless — they sum to 0)."""
        rk0 = group.group_by(["src", "bucket"]).aggregate([])  # distinct srcs
        rk = rk0.append_column("r", pa.array([ONE] * rk0.num_rows, pa.int64()))
        dsts = group.group_by(["dst", "dst_bucket"]).aggregate([])
        out = _fanout(group, rk)
        out.append(
            _contrib_rows(
                dsts.column("dst"),
                dsts.column("dst_bucket"),
                pa.array(np.zeros(dsts.num_rows, dtype=np.int64), pa.int64()),
            )
        )
        return pa.concat_tables(out)

    def _ranks(group: pa.Table) -> tuple[pa.Table, pa.Table]:
        """Split a bucket's rows into (edges, fresh ranks): sum incoming
        contributions per node, apply the integer damping update."""
        is_edge = pc.is_valid(group.column("dst"))
        e = group.filter(is_edge)
        cr = group.filter(pc.invert(is_edge))
        s = cr.select(["src", "bucket", "r"]).group_by(["src", "bucket"]).aggregate(
            [("r", "sum")]
        )
        mass = s.column("r_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        rk = pa.table(
            {
                "src": s.column("src"),
                "bucket": s.column("bucket"),
                "r": pa.array(BASE + (DAMP_NUM * mass) // DAMP_DEN, pa.int64()),
            }
        )
        return e, rk

    def fused_step(group: pa.Table) -> pa.Table:
        e, rk = _ranks(group)
        return pa.concat_tables(_fanout(e, rk))

    def final_ranks(group: pa.Table) -> pa.Table:
        """Last fold + the url join in ONE task: the group holds the
        bucket's final contributions AND its nodemap rows (url valid),
        co-partitioned by node-id bucket — no extra exchange."""
        has_url = pc.is_valid(group.column("url"))
        nm = (
            group.filter(has_url)
            .select(["src", "url"])
            .group_by(["src", "url"])
            .aggregate([])
        )
        _, rk = _ranks(group.filter(pc.invert(has_url)))
        j = rk.select(["src", "r"]).join(nm, keys="src", join_type="inner")
        return pa.table({"url": j.column("url"), "rank_fp": j.column("r")})

    # NO per-iteration materialize: the whole power iteration is ONE
    # lazy DAG — the streaming executor pipelines all rounds without a
    # driver sync per iteration (the edge list, consumed every round,
    # IS materialized above). Exchange count: iters + 1, same as the
    # textbook-fused form — the nodemap union rides the LAST exchange.
    contribs = edges.groupby("bucket").map_groups(init_fanout, batch_format="pyarrow")
    for _ in range(iters - 1):
        contribs = (
            edges.union(contribs)
            .groupby("bucket")
            .map_groups(fused_step, batch_format="pyarrow")
        )
    return (
        contribs.union(nodemap)
        .groupby("bucket")
        .map_groups(final_ranks, batch_format="pyarrow")
    )


def pagerank_oracle_sql(links_path: str, iters: int = 5) -> str:
    """DuckDB oracle: the identical fixed-point power iteration,
    unrolled ``iters`` times over the same links parquet."""
    ctes = [
        f"""e AS (SELECT src_url AS src, dst_url AS dst
               FROM read_parquet('{links_path}') WHERE gated)""",
        """nodes AS (SELECT DISTINCT n FROM
               (SELECT src AS n FROM e UNION ALL SELECT dst FROM e))""",
        """odeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS od
               FROM e GROUP BY src)""",
        f"r0 AS (SELECT n, CAST({ONE} AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS (
              SELECT nodes.n,
                     CAST({BASE} + ({DAMP_NUM} * COALESCE(s.s, 0)) // {DAMP_DEN}
                          AS BIGINT) AS r
              FROM nodes LEFT JOIN (
                SELECT e.dst AS n, CAST(SUM(p.r // odeg.od) AS BIGINT) AS s
                FROM e JOIN r{i - 1} p ON e.src = p.n
                       JOIN odeg ON e.src = odeg.src
                GROUP BY e.dst) s ON nodes.n = s.n)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT n AS url, r AS rank_fp FROM r{iters}"
    )


def link_degrees(sf_dir: str, links_path: str | None = None):
    """Per-url in/out degree over the gated link graph — the degree
    table every graph pipeline starts from (out_degree feeds PageRank
    mass splitting; in_degree is the simplest page-authority signal).

    Ray shape — pre-aggregated keyed exchange: each batch folds its
    edges into per-url partial (out, in) counts BEFORE the shuffle, so
    the ``groupby(url)`` exchange carries one row per (batch × url),
    never one per edge."""
    from collections import Counter

    from ray.data.aggregate import Sum

    links = rd.read_parquet(
        links_path or _links_path(sf_dir), columns=["src_url", "dst_url", "gated"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("gated"))
        out_c = Counter(t.column("src_url").to_pylist())
        in_c = Counter(t.column("dst_url").to_pylist())
        urls = sorted(out_c.keys() | in_c.keys())
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "out_c": pa.array([out_c.get(u, 0) for u in urls], pa.int64()),
                "in_c": pa.array([in_c.get(u, 0) for u in urls], pa.int64()),
            }
        )

    return (
        links.map_batches(partial, batch_format="pyarrow")
        .groupby("url")
        .aggregate(Sum("out_c", alias_name="out_deg"), Sum("in_c", alias_name="in_deg"))
    )
