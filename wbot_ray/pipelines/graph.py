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

__all__ = [
    "link_pagerank",
    "link_degrees",
    "link_triangles",
    "pagerank_oracle_sql",
    "triangles_oracle_sql",
]

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


def link_triangles(sf_dir: str, num_buckets: int = 32, links_path: str | None = None):
    """Per-url TRIANGLE counts over the undirected gated link graph —
    the graph-mining shape beyond BFS / PageRank / components: how many
    closed url triples each page participates in (the local clustering
    signal link-spam and mirror-farm detection start from).

    Classic degree-ordered node-iterator (MapReduce triangle counting),
    as five slim keyed exchanges — no adjacency ever materializes
    driver-side and no stage holds more than one bucket:

    1. canonicalize ``(min(u,v), max(u,v))`` + pair-bucket ``groupby``
       → exact edge dedup (self-loops dropped);
    2. node-bucket ``groupby`` → per-node degree, attached to each
       incident edge half;
    3. pair-bucket ``groupby`` reunites the two halves, then ORIENTS
       every edge low→high by ``(degree, url)`` — each node's oriented
       out-list is O(sqrt(m)) on any graph (degeneracy bound), which is
       what keeps hub wedge fan-out polynomial: wedges generated =
       Σ C(outdeg, 2) = O(m^1.5) worst case instead of the hub-degree
       quadratic of naive orientation;
    4. per-LOW-node wedge generation (vectorized ``np.triu_indices``
       over the sorted out-list), unioned with the canonical edge set
       and co-partitioned on the wedge's endpoint pair → a wedge that
       meets its closing edge is a triangle; every triangle is found
       exactly once (its degree-minimum vertex is the only witness);
    5. the triangle's three urls each get +1 → tiny ``groupby(url)``
       sum.

    Output: ``(url, n_triangles)`` for every url in ≥ 1 triangle.
    """
    from ray.data.aggregate import Sum

    from wbot_ray.pipelines.common import md5_lower64

    links = rd.read_parquet(
        links_path or _links_path(sf_dir), columns=["src_url", "dst_url", "gated"]
    )

    def hb(arr: list[str]) -> pa.Array:
        return pa.array([md5_lower64(s) % num_buckets for s in arr], pa.int64())

    def canon(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("gated"))
        src = t.column("src_url").to_pylist()
        dst = t.column("dst_url").to_pylist()
        a = [min(s, d) for s, d in zip(src, dst) if s != d]
        b = [max(s, d) for s, d in zip(src, dst) if s != d]
        return pa.table(
            {
                "pb": hb([x + "|" + y for x, y in zip(a, b)]),
                "a": pa.array(a, pa.string()),
                "b": pa.array(b, pa.string()),
            }
        )

    def dedup_and_split(group: pa.Table) -> pa.Table:
        # exact pair dedup, then each edge emitted once per endpoint
        # (keyed by that endpoint) so step 2 can compute degrees
        g = group.group_by(["a", "b"]).aggregate([]).select(["a", "b"])
        a = g.column("a").to_pylist()
        b = g.column("b").to_pylist()
        node = a + b
        other = b + a
        return pa.table(
            {
                "nb": hb(node),
                "node": pa.array(node, pa.string()),
                "other": pa.array(other, pa.string()),
            }
        )

    def attach_degree(group: pa.Table) -> pa.Table:
        node = np.asarray(group.column("node").to_pylist(), object)
        other = np.asarray(group.column("other").to_pylist(), object)
        uniq, inv, cnt = np.unique(node, return_inverse=True, return_counts=True)
        deg = cnt[inv]
        # re-canonicalize for the pair-keyed reunion; keep whose degree
        a_is_node = node < other
        a = np.where(a_is_node, node, other)
        b = np.where(a_is_node, other, node)
        return pa.table(
            {
                "pb": hb([x + "|" + y for x, y in zip(a, b)]),
                "a": pa.array(a, pa.string()),
                "b": pa.array(b, pa.string()),
                "deg": pa.array(deg.astype(np.int64), pa.int64()),
                "deg_of_a": pa.array(a_is_node, pa.bool_()),
            }
        )

    wedge_schema = pa.schema(
        [
            ("pb", pa.int64()),
            ("u", pa.string()),
            ("v", pa.string()),
            ("w", pa.string()),
            ("kind", pa.string()),
        ]
    )

    def orient(group: pa.Table) -> pa.Table:
        # two rows per edge (one per endpoint's degree); reunite + orient
        import pandas as pd

        df = group.to_pandas()
        da = df[df.deg_of_a].set_index(["a", "b"]).deg
        db = df[~df.deg_of_a].set_index(["a", "b"]).deg
        pairs = da.index
        da_v, db_v = da.to_numpy(), db.loc[pairs].to_numpy()
        a = pairs.get_level_values(0).to_numpy()
        b = pairs.get_level_values(1).to_numpy()
        # low endpoint = smaller (degree, url); ties break on url
        a_low = (da_v < db_v) | ((da_v == db_v) & (a < b))
        lo = np.where(a_low, a, b)
        hi = np.where(a_low, b, a)
        # the canonical edge set rides along for the closure check
        return pa.table(
            {
                "pb": hb(lo.tolist()),  # wedge stage keys on the LOW node
                "u": pa.array(lo, pa.string()),
                "v": pa.array(hi, pa.string()),
                "w": pa.array([""] * len(lo), pa.string()),
                "kind": pa.array(["o"] * len(lo), pa.string()),
            },
            schema=wedge_schema,
        )

    def wedges(group: pa.Table) -> pa.Table:
        lo = np.asarray(group.column("u").to_pylist(), object)
        hi = np.asarray(group.column("v").to_pylist(), object)
        o_pb, o_u, o_v, o_w = [], [], [], []
        order = np.argsort(lo, kind="stable")
        lo, hi = lo[order], hi[order]
        starts = np.flatnonzero(np.concatenate([[True], lo[1:] != lo[:-1]]))
        bounds = np.concatenate([starts, [len(lo)]])
        for s, e in zip(bounds[:-1], bounds[1:]):
            outs = np.sort(hi[s:e])
            if len(outs) >= 2:
                i, j = np.triu_indices(len(outs), k=1)
                o_u.extend(outs[i])
                o_v.extend(outs[j])
                o_w.extend([lo[s]] * len(i))
        o_pb = hb([x + "|" + y for x, y in zip(o_u, o_v)])
        wedge = pa.table(
            {
                "pb": o_pb,
                "u": pa.array(o_u, pa.string()),
                "v": pa.array(o_v, pa.string()),
                "w": pa.array(o_w, pa.string()),
                "kind": pa.array(["w"] * len(o_u), pa.string()),
            },
            schema=wedge_schema,
        )
        # re-emit this group's edges as closure probes, re-canonicalized
        # to STRING order (orientation was by degree, wedge pairs are
        # emitted sorted — the two must agree for the probe to meet)
        gu = group.column("u").to_pylist()
        gv = group.column("v").to_pylist()
        eu = [min(x, y) for x, y in zip(gu, gv)]
        ev = [max(x, y) for x, y in zip(gu, gv)]
        edge = pa.table(
            {
                "pb": hb([x + "|" + y for x, y in zip(eu, ev)]),
                "u": pa.array(eu, pa.string()),
                "v": pa.array(ev, pa.string()),
                "w": pa.array([""] * group.num_rows, pa.string()),
                "kind": pa.array(["e"] * group.num_rows, pa.string()),
            },
            schema=wedge_schema,
        )
        return pa.concat_tables([wedge, edge])

    def close_triangles(group: pa.Table) -> pa.Table:
        kind = np.asarray(group.column("kind").to_pylist(), object)
        u = np.asarray(group.column("u").to_pylist(), object)
        v = np.asarray(group.column("v").to_pylist(), object)
        w = np.asarray(group.column("w").to_pylist(), object)
        is_e = kind == "e"
        edges = set(zip(u[is_e], v[is_e]))
        is_w = ~is_e
        closed = [i for i in np.flatnonzero(is_w) if (u[i], v[i]) in edges]
        nodes = [x for i in closed for x in (u[i], v[i], w[i])]
        return pa.table(
            {
                "url": pa.array(nodes, pa.string()),
                "one": pa.array(np.ones(len(nodes), np.int64), pa.int64()),
            }
        )

    out_schema = pa.schema([("url", pa.string()), ("n_triangles", pa.int64())])
    counted = (
        links.map_batches(canon, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(dedup_and_split, batch_format="pyarrow")
        .groupby("nb")
        .map_groups(attach_degree, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(orient, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(wedges, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(close_triangles, batch_format="pyarrow")
        .groupby("url")
        .aggregate(Sum("one", alias_name="n_triangles"))
    )
    return rd.from_arrow(out_schema.empty_table()).union(counted)


def triangles_oracle_sql(links_path: str) -> str:
    """DuckDB oracle: canonical-edge triple join (x<y<z), then each
    triangle credits its three urls."""
    return f"""
        WITH e0 AS (
          SELECT DISTINCT least(src_url, dst_url) AS a,
                          greatest(src_url, dst_url) AS b
          FROM read_parquet('{links_path}')
          WHERE gated AND src_url <> dst_url
        ), t AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e0 e1
          JOIN e0 e2 ON e2.a = e1.a AND e2.b > e1.b
          JOIN e0 e3 ON e3.a = e1.b AND e3.b = e2.b
        )
        SELECT url, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM (SELECT x AS url FROM t UNION ALL
              SELECT y FROM t UNION ALL
              SELECT z FROM t)
        GROUP BY url
    """
