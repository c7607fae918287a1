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
from ray.data.aggregate import Sum

__all__ = ["link_pagerank", "pagerank_oracle_sql"]

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
    iterations. Ray shape per iteration — the BUCKETED reduce-side
    join: node ids are hashed once into ``num_buckets`` co-location
    buckets when the edge list is materialized; each iteration unions
    the edge list with the current rank vector on the bucket key, and
    one ``groupby(bucket).map_groups`` task per bucket joins
    rank-to-edges VECTORIZED (Arrow hash join + numpy integer
    contribution math) — no per-node Python calls, no broadcast of the
    rank vector. A second native ``groupby(dst).sum`` folds incoming
    mass; zero self-contributions keep sink nodes alive through the
    fold. Both exchanges carry one slim row per edge; bucket count
    scales with the cluster, not the graph."""
    import zlib

    links = rd.read_parquet(
        links_path or _links_path(sf_dir), columns=["src_url", "dst_url", "gated"]
    )

    def bucket_arr(urls: list) -> pa.Array:
        return pa.array(
            [zlib.crc32(u.encode()) % num_buckets for u in urls], pa.int64()
        )

    def to_edges(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("gated"))
        srcs = t.column("src_url").to_pylist()
        dsts = t.column("dst_url").to_pylist()
        return pa.table(
            {
                "bucket": bucket_arr(srcs),
                "src": t.column("src_url"),
                "dst": t.column("dst_url"),
                "dst_bucket": bucket_arr(dsts),
                "r": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    edges = links.map_batches(to_edges, batch_format="pyarrow").materialize()

    def init_nodes(batch: pa.Table) -> pa.Table:
        both = pa.chunked_array(
            [batch.column("src").combine_chunks(), batch.column("dst").combine_chunks()]
        ).combine_chunks()
        return pa.table({"node": both})

    from ray.data.aggregate import Count, Min

    ranks = (
        edges.map_batches(init_nodes, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_n"))  # distinct nodes
        .map_batches(
            lambda t: pa.table(
                {
                    "bucket": bucket_arr(t.column("node").to_pylist()),
                    "node": t.column("node"),
                    "r": pa.array([ONE] * t.num_rows, pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def join_fanout(group: pa.Table) -> pa.Table:
        """One bucket: join the bucket's rank rows to its out-edges and
        emit integer contributions — all vectorized."""
        is_edge = pc.is_valid(group.column("dst"))
        e = group.filter(is_edge)
        rk = group.filter(pc.invert(is_edge)).select(["src", "r"])
        out = [
            pa.table(  # zero self-rows: every node survives the fold
                {
                    "dst": rk.column("src"),
                    "dst_bucket": group.filter(pc.invert(is_edge)).column("bucket"),
                    "c": pa.array(np.zeros(rk.num_rows, dtype=np.int64), pa.int64()),
                }
            )
        ]
        if e.num_rows:
            od = e.group_by("src").aggregate([("src", "count")])
            j = (
                e.select(["src", "dst", "dst_bucket"])
                .join(od, keys="src", join_type="inner")
                .join(rk, keys="src", join_type="inner")
            )
            r = j.column("r").to_numpy(zero_copy_only=False).astype(np.int64)
            n_out = j.column("src_count").to_numpy(zero_copy_only=False).astype(np.int64)
            out.append(
                pa.table(
                    {
                        "dst": j.column("dst"),
                        "dst_bucket": j.column("dst_bucket"),
                        "c": pa.array(r // n_out, pa.int64()),
                    }
                )
            )
        return pa.concat_tables(out)

    for _ in range(iters):
        tagged_ranks = ranks.map_batches(
            lambda t: pa.table(
                {
                    "bucket": t.column("bucket"),
                    "src": t.column("node"),
                    "dst": pa.nulls(t.num_rows, pa.string()),
                    "dst_bucket": t.column("bucket"),
                    "r": t.column("r"),
                }
            ),
            batch_format="pyarrow",
        )
        sums = (
            edges.union(tagged_ranks)
            .groupby("bucket")
            .map_groups(join_fanout, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="s"), Min("dst_bucket", alias_name="bucket"))
        )
        ranks = sums.map_batches(
            lambda t: pa.table(
                {
                    "bucket": t.column("bucket"),
                    "node": t.column("dst"),
                    "r": pa.array(
                        BASE
                        + (
                            DAMP_NUM
                            * t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
                        )
                        // DAMP_DEN,
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )

    # NO per-iteration materialize: the whole power iteration is ONE
    # lazy DAG — the streaming executor pipelines all rounds without a
    # driver sync per iteration (the edge list, consumed every round,
    # IS materialized above).
    return ranks.map_batches(
        lambda t: pa.table({"url": t.column("node"), "rank_fp": t.column("r")}),
        batch_format="pyarrow",
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
