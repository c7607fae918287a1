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
    "link_components",
    "host_graph",
    "host_components",
    "host_pagerank",
    "host_hits",
    "frontier_priority",
    "pagerank_oracle_sql",
    "host_pagerank_oracle_sql",
    "host_hits_oracle_sql",
    "frontier_priority_oracle_sql",
    "triangles_oracle_sql",
    "components_oracle_sql",
    "host_graph_oracle_sql",
    "host_components_oracle_sql",
    "link_reciprocity",
    "link_reciprocity_oracle_sql",
    "degree_dist",
    "degree_dist_oracle_sql",
    "host_sssp",
    "host_sssp_oracle_sql",
    "link_kcore",
    "link_kcore_oracle_sql",
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


def link_pagerank(
    sf_dir: str,
    iters: int = 5,
    num_buckets: int = 32,
    links_path: str | None = None,
    links_ds=None,
    local_threshold: int = 1_000_000,
):
    """Fixed-point PageRank over the gated link graph, ``iters`` power
    iterations. Ray shape — STAGED edges + combined contributions:

    - **Edges never enter a per-round exchange.** The edge list is
      hashed to 64-bit node ids and written ONCE as bucket-partitioned
      parquet (``write_parquet(partition_cols=["bucket"])`` — a plain
      streaming write, no shuffle, since every map task can append to
      any partition dir). Each round's fold task reads its own
      bucket's edges back from storage (node-local at single-node; on
      a cluster this is the shared-FS / object-store bucketed layout
      the web index uses). The alternative — ``edges.union(contribs)``
      per round — re-ships O(E) edge rows through every exchange;
      at web scale the iteration is exchange-bandwidth-bound, so
      removing edges from the wire is the dominant win.
    - **Contributions are pre-combined inside the task** (Arrow
      ``group_by(dst).sum`` before emit), so a round's exchange
      carries at most ``num_buckets × V`` slim ``(bucket, src, r)``
      int64 rows instead of one row per edge — the classic combiner
      that turns an O(E) shuffle into an O(V)-ish one. Integer sums
      are associative, so combining preserves bit-exactness.
    - ONE ``groupby(bucket).map_groups`` task per bucket per round
      does fold (sum + damping) AND fanout (Arrow hash join of fresh
      ranks to the bucket's static out-edges, numpy integer math).
      Because ``bucket(n)`` is the same hash whether ``n`` arrives as
      a contribution target or owns out-edges, no second exchange per
      round is needed: ``iters`` keyed exchanges total (init fans out
      straight from the staged files — no exchange; the nodemap union
      rides the LAST exchange). Zero self-contributions keep sinks and
      leaf-only nodes alive, so no separate distinct-nodes pass
      either. Bucket count scales with the cluster, not the graph.

    URL strings never enter the iteration: nodes are hashed ONCE to
    63-bit ids (birthday-safe far past 10^9 nodes) at staging, every
    per-round exchange carries pure int64 rows, and one final keyed
    join maps ids back to URLs (strings cross the wire once, O(V)).

    ``links_ds`` substitutes any links-shaped Dataset
    (``src_url/dst_url/gated``) for the parquet read — the seam
    :func:`host_pagerank` uses to rank host-level edges (same seam
    contract as :func:`link_components`). Multi-edges count toward
    out-degree, so a caller wanting simple-graph semantics must
    dedupe before the seam."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    links = (
        links_ds
        if links_ds is not None
        else rd.read_parquet(
            links_path or _links_path(sf_dir), columns=["src_url", "dst_url", "gated"]
        )
    )

    # driver-local path below the threshold (parquet reads only; the
    # same scheduler choice and cost model as link_components): the
    # distributed iteration pays `iters` keyed exchanges of fixed
    # latency regardless of edge count. Bit-equal math; 0 forces the
    # distributed path.
    if links_ds is None and local_threshold and links.count() <= local_threshold:
        tbls = [
            b.filter(b.column("gated")).select(["src_url", "dst_url"])
            for b in links.iter_batches(batch_format="pyarrow")
        ]
        out_schema = pa.schema([("url", pa.string()), ("rank_fp", pa.int64())])
        tbls = [t for t in tbls if t.num_rows]
        if not tbls:
            return rd.from_arrow(out_schema.empty_table())
        return rd.from_arrow(
            _pagerank_local(pa.concat_tables(tbls), iters, out_schema)
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
            }
        )

    def to_nodemap(batch: pa.Table) -> pa.Table:
        """(id, url) rows in the in-flight contribution schema (url
        valid is the discriminator) — the only place URL strings
        survive. These rows ride ONLY the final exchange, so strings
        cross the wire once per distinct-url-per-batch (O(V)), not
        once per edge endpoint per round (O(rounds × 2E))."""
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
                "r": pa.nulls(len(h), pa.int64()),
                "url": pa.array(urls, pa.string()),
            }
        )

    # Stage the edge list ONCE, bucket-partitioned (streaming write, no
    # exchange). /tmp scratch locally; shared storage on a cluster.
    edge_dir = tempfile.mkdtemp(prefix="wbot_pr_edges_")
    links.map_batches(to_edges, batch_format="pyarrow").write_parquet(
        edge_dir, partition_cols=["bucket"]
    )

    _EDGE_SCHEMA = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("dst_bucket", pa.int64())]
    )

    def _read_bucket(k: int) -> pa.Table:
        d = os.path.join(edge_dir, f"bucket={k}")
        if not os.path.isdir(d):
            return _EDGE_SCHEMA.empty_table()
        return pq.read_table(d, columns=["src", "dst", "dst_bucket"])

    def _contrib_rows(nodes: pa.Array, buckets, c: pa.Array) -> pa.Table:
        """Contribution rows in the in-flight schema (url null)."""
        n = len(nodes)
        return pa.table(
            {
                "bucket": buckets,
                "src": nodes,
                "r": c,
                "url": pa.nulls(n, pa.string()),
            }
        )

    def _fanout(e: pa.Table, rk: pa.Table) -> list[pa.Table]:
        """Fan a bucket's rank vector ``rk`` (src, bucket, r) over its
        out-edges ``e``: per-edge contribution r // out_degree, COMBINED
        per destination before emit (Arrow group_by sum — exact integer
        math), keyed by the destination's bucket — plus a zero self-row
        per ranked node so every node survives the next round's fold.
        All vectorized."""
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
            comb = (
                pa.table(
                    {
                        "bucket": j.column("dst_bucket"),
                        "src": j.column("dst"),
                        "r": pa.array(r // n_out, pa.int64()),
                    }
                )
                .group_by(["bucket", "src"])
                .aggregate([("r", "sum")])
            )
            out.append(
                _contrib_rows(
                    comb.column("src"), comb.column("bucket"), comb.column("r_sum")
                )
            )
        return out

    def init_fanout(batch: pa.Table) -> pa.Table:
        """Round 1 from rank_0 = ONE for every node, one task per staged
        bucket — NO exchange: srcs get their zero row here, dsts get one
        keyed by dst_bucket (dupes across buckets are harmless — they
        sum to 0), so the distinct-node set never needs its own pass."""
        out = []
        for k in batch.column("id").to_pylist():
            e = _read_bucket(int(k))
            if not e.num_rows:
                continue
            rk0 = e.group_by("src").aggregate([])  # distinct srcs
            rk = pa.table(
                {
                    "src": rk0.column("src"),
                    "bucket": pa.array(
                        np.full(rk0.num_rows, int(k), dtype=np.int64), pa.int64()
                    ),
                    "r": pa.array([ONE] * rk0.num_rows, pa.int64()),
                }
            )
            out.extend(_fanout(e, rk))
            dsts = e.group_by(["dst", "dst_bucket"]).aggregate([])
            out.append(
                _contrib_rows(
                    dsts.column("dst"),
                    dsts.column("dst_bucket"),
                    pa.array(np.zeros(dsts.num_rows, dtype=np.int64), pa.int64()),
                )
            )
        if not out:
            return pa.schema(
                [
                    ("bucket", pa.int64()),
                    ("src", pa.int64()),
                    ("r", pa.int64()),
                    ("url", pa.string()),
                ]
            ).empty_table()
        return pa.concat_tables(out)

    def _fold(cr: pa.Table) -> pa.Table:
        """Sum a bucket's incoming contributions per node, apply the
        integer damping update → fresh rank vector (src, bucket, r)."""
        s = cr.select(["src", "bucket", "r"]).group_by(["src", "bucket"]).aggregate(
            [("r", "sum")]
        )
        mass = s.column("r_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": s.column("src"),
                "bucket": s.column("bucket"),
                "r": pa.array(BASE + (DAMP_NUM * mass) // DAMP_DEN, pa.int64()),
            }
        )

    def fused_step(group: pa.Table) -> pa.Table:
        rk = _fold(group)
        e = _read_bucket(int(group.column("bucket")[0].as_py()))
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
        rk = _fold(group.filter(pc.invert(has_url)))
        j = rk.select(["src", "r"]).join(nm, keys="src", join_type="inner")
        return pa.table({"url": j.column("url"), "rank_fp": j.column("r")})

    # NO per-iteration materialize: the whole power iteration is ONE
    # lazy DAG — the streaming executor pipelines all rounds without a
    # driver sync per iteration (the edge list, consumed every round,
    # IS staged to bucketed parquet above). Exchange count: iters —
    # init reads the staged files directly, the nodemap union rides
    # the LAST exchange.
    nodemap = links.map_batches(to_nodemap, batch_format="pyarrow")
    contribs = rd.range(num_buckets, override_num_blocks=num_buckets).map_batches(
        init_fanout, batch_format="pyarrow"
    )
    for _ in range(iters - 1):
        contribs = contribs.groupby("bucket").map_groups(
            fused_step, batch_format="pyarrow"
        )
    # contribs materialized + first (union-under-sort livelock rule —
    # see pipelines/dedup.py:_minhash_parts): both union sides produce
    # tasks, and an order-preserving union under a tight object store
    # can starve input 0's tasks behind input 1's buffered output
    return (
        contribs.materialize()
        .union(nodemap)
        .groupby("bucket")
        .map_groups(final_ranks, batch_format="pyarrow")
    )


def pagerank_oracle_sql(
    links_path: str,
    iters: int = 5,
    base_sql: str | None = None,
    url_col: str = "url",
) -> str:
    """DuckDB oracle: the identical fixed-point power iteration,
    unrolled ``iters`` times over the same links parquet.
    ``base_sql`` overrides the edge source (must yield ``src, dst``
    string columns) — used by :func:`host_pagerank_oracle_sql`."""
    base = base_sql or (
        f"""SELECT src_url AS src, dst_url AS dst
               FROM read_parquet('{links_path}') WHERE gated"""
    )
    ctes = [
        f"e AS ({base})",
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
        + f"\nSELECT n AS {url_col}, r AS rank_fp FROM r{iters}"
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


def _triangles_local(links) -> "rd.Dataset":
    """Driver-local degree-ordered triangle counting for small graphs —
    same semantics as the five-exchange distributed path (undirected
    deduped gated edges, self-loops dropped, low→high orientation by
    ``(degree, url)``, every triangle witnessed once by its
    degree-minimum vertex). Fully vectorized: wedges are generated with
    the offset-pair trick (one vector op per out-list offset k, and the
    max oriented out-degree is O(sqrt m) by the degeneracy bound), and
    the closure check is one searchsorted membership probe against the
    canonical edge-key array."""
    srcs, dsts = [], []
    for b in links.iter_batches(batch_format="pyarrow"):
        t = b.filter(b.column("gated"))
        if t.num_rows:
            srcs.append(np.asarray(t.column("src_url").to_pylist(), dtype=object))
            dsts.append(np.asarray(t.column("dst_url").to_pylist(), dtype=object))
    out_schema = pa.schema([("url", pa.string()), ("n_triangles", pa.int64())])
    if not srcs:
        return rd.from_arrow(out_schema.empty_table())
    s = np.concatenate(srcs)
    d = np.concatenate(dsts)
    uniq, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
    n = len(uniq)
    u, v = inv[: len(s)], inv[len(s) :]
    keep = u != v  # self-loops drop
    a = np.minimum(u[keep], v[keep])
    b = np.maximum(u[keep], v[keep])
    if a.size == 0:
        return rd.from_arrow(out_schema.empty_table())
    ab = np.unique(a * n + b)  # canonical deduped undirected edge keys
    a, b = ab // n, ab % n
    deg = np.bincount(np.concatenate([a, b]), minlength=n)
    # low endpoint = smaller (degree, id); id order IS url lex order
    a_low = (deg[a] < deg[b]) | ((deg[a] == deg[b]) & (a < b))
    lo = np.where(a_low, a, b)
    hi = np.where(a_low, b, a)
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    counts = np.zeros(n, dtype=np.int64)
    k = 1
    while k < len(lo):
        same = lo[:-k] == lo[k:]
        if not same.any():
            break
        y0, z0 = hi[:-k][same], hi[k:][same]  # wedge endpoints, y0 < z0
        x0 = lo[:-k][same]
        wkey = np.minimum(y0, z0) * n + np.maximum(y0, z0)
        pos = np.searchsorted(ab, wkey)
        pos[pos == len(ab)] = 0
        hit = ab[pos] == wkey
        if hit.any():
            np.add.at(counts, x0[hit], 1)
            np.add.at(counts, y0[hit], 1)
            np.add.at(counts, z0[hit], 1)
        k += 1
    nz = np.flatnonzero(counts)
    return rd.from_arrow(
        pa.table(
            {
                "url": pa.array(uniq[nz], pa.string()),
                "n_triangles": pa.array(counts[nz], pa.int64()),
            },
            schema=out_schema,
        )
    )


def link_triangles(
    sf_dir: str,
    num_buckets: int = 32,
    links_path: str | None = None,
    local_threshold: int = 1_000_000,
):
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

    # driver-local path below the threshold — the distributed pipeline
    # pays five keyed exchanges of fixed latency regardless of edge
    # count (same scheduler choice as link_components/link_pagerank);
    # 0 forces distributed
    if local_threshold and links.count() <= local_threshold:
        return _triangles_local(links)

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
        # via the same argsort/bounds pattern as `wedges` — both halves
        # hold exactly the edge set, so sorting each by (a, b) aligns
        # them positionally (no pandas index machinery)
        ga = np.asarray(group.column("a").to_pylist(), object)
        gb = np.asarray(group.column("b").to_pylist(), object)
        deg = group.column("deg").to_numpy(zero_copy_only=False)
        dofa = group.column("deg_of_a").to_numpy(zero_copy_only=False)
        ia = np.flatnonzero(dofa)
        ib = np.flatnonzero(~dofa)
        ia = ia[np.lexsort((gb[ia], ga[ia]))]
        ib = ib[np.lexsort((gb[ib], ga[ib]))]
        a, b = ga[ia], gb[ia]
        da_v, db_v = deg[ia], deg[ib]
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


def link_components(
    sf_dir: str,
    num_buckets: int = 32,
    max_iters: int = 200,
    links_path: str | None = None,
    round_stats: list | None = None,
    links_ds=None,
    local_threshold: int = 1_000_000,
):
    """Weakly connected components over the gated link graph — the
    mirror-cluster / site-island detector that completes the graph
    family (degrees → PageRank → triangles → components).

    Output: ``(url, comp, comp_size)`` for every url incident to at
    least one gated link, where ``comp`` is the lexicographically
    smallest url in that url's component (an engine-independent
    representative — no internal hash ever leaks into the result) and
    ``comp_size`` is the component's node count. Self-loops keep a
    node in the graph but add no connectivity (a self-loop-only url is
    its own singleton component).

    Ray shape — alternating **large-star / small-star** edge
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC 2014), the published O(log² n)-round algorithm,
    on the same fused-bucket exchange as :func:`link_pagerank`: urls
    are hashed once to int64 ids, the edge set rides both orientations
    so every node's group sees its full neighborhood, and each round
    is exactly TWO ``groupby(bucket).map_groups`` exchanges:

    * **large-star** re-homes every node's strictly-larger neighbors
      onto ``m = min(N(u) ∪ {u})`` (plus the ``(u, m)`` bridge that
      keeps ``u`` attached), passing smaller-neighbor rows through
      unchanged;
    * **small-star** re-homes every node's smaller neighbors (and the
      node itself) onto its minimum smaller neighbor, dropping
      larger-neighbor rows (recreated by the partner group).

    Hash-min label propagation (``dup_clusters``' scheme) needs
    O(diameter) rounds — fine for star-shaped dup graphs, wrong for a
    crawl graph whose sf0.01 slice already has diameter 30; star
    contraction lands in ~5 rounds there and ~7 on a 120-hop chain
    (the regression-gated worst case below), with every per-round row
    pure int64. Convergence is EXACT, not heuristic: large-star emits
    an integer counter of nodes that re-homed any larger neighbor,
    small-star of nodes with ≥2 distinct smaller neighbors; both zero
    ⇔ the edge set maps to itself ⇔ it is a disjoint star forest with
    component-minimum centers (Kiveris Thm 4.1), read via one
    ``sum("chg")`` metadata fold per round — no row leaves the
    cluster. The final url/representative resolution is two more keyed
    exchanges: star-leaf labels (∪ self-labeled seeds, which carry
    isolated nodes) meet the url nodemap on ``bucket(node)``, then
    components fold ``(min url, count)`` on ``bucket(label)``.

    Scale note / skew seam: late rounds concentrate a component's
    edges on its star hub, so ``bucket(hub)`` sees O(component) rows —
    the mitigation (documented, not needed at sandbox scale) is the
    same hot-key salting the crawl frontier uses: split a hot hub's
    group into salted parts, re-home each part onto its PART-min, and
    emit the ``(u, m_part)`` bridge so the parts stay connected; the
    operation stays connectivity-preserving and monotone.

    Reference anchor: the link graph is the reference crawler's
    discovery output (``crawler.go:195-291``); component structure
    over it is the canonical post-crawl mirror/island analysis.

    ``links_ds`` substitutes any links-shaped Dataset
    (``src_url/dst_url/gated``) for the parquet read — the seam
    :func:`host_components` uses to run the same machinery over
    host-level edges.
    """
    links = (
        links_ds
        if links_ds is not None
        else rd.read_parquet(
            links_path or _links_path(sf_dir),
            columns=["src_url", "dst_url", "gated"],
        )
    )

    # driver-local path for small graphs (parquet reads only — the
    # count is parquet-metadata-cheap; links_ds callers keep the
    # distributed path): the star-contraction rounds cost ~12 keyed
    # exchanges of fixed latency REGARDLESS of edge count, so below
    # ~10^6 edges the vectorized local union-find wins outright. Same
    # precedent (and parity-pinning) as host_sssp / dup_clusters /
    # the crawl's small-frontier merge; 0 forces distributed.
    if links_ds is None and local_threshold and links.count() <= local_threshold:
        tbls = [
            b.filter(b.column("gated")).select(["src_url", "dst_url"])
            for b in links.iter_batches(batch_format="pyarrow")
        ]
        out_schema = pa.schema(
            [("url", pa.string()), ("comp", pa.string()), ("comp_size", pa.int64())]
        )
        tbls = [t for t in tbls if t.num_rows]
        if not tbls:
            return rd.from_arrow(out_schema.empty_table())
        return rd.from_arrow(_components_local(pa.concat_tables(tbls), out_schema))

    M = (1 << 63) - 1

    def hash_arr(urls: list) -> np.ndarray:
        import polars as pl

        h = pl.Series(urls, dtype=pl.String).hash(seed=0).to_numpy()
        return (h & np.uint64(M)).astype(np.int64)

    # row kinds riding the unified exchanges
    SELF, EDGE, CHG, NODE = 1, 2, 3, 4

    SCHEMA = pa.schema(
        [
            ("kind", pa.int64()),
            ("bucket", pa.int64()),
            ("u", pa.int64()),
            ("v", pa.int64()),  # EDGE rows: the other endpoint
            ("l", pa.int64()),  # SELF rows: label (star center)
            ("chg", pa.int64()),  # CHG rows: phase change counter
            ("url", pa.string()),  # NODE (nodemap) rows only
        ]
    )

    def _rows(n: int, **cols) -> pa.Table:
        data = {}
        for f in SCHEMA:
            c = cols.get(f.name)
            if c is None:
                data[f.name] = pa.nulls(n, f.type)
            elif isinstance(c, pa.ChunkedArray):
                data[f.name] = c.combine_chunks().cast(f.type)
            elif isinstance(c, pa.Array):
                data[f.name] = c.cast(f.type)
            else:
                data[f.name] = pa.array(c, f.type)
        return pa.table(data, schema=SCHEMA)

    def to_edges(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("gated"))
        src = t.column("src_url").to_pylist()
        dst = t.column("dst_url").to_pylist()
        sh, dh = hash_arr(src), hash_arr(dst)
        keep = sh != dh  # self-loops carry no connectivity
        a = np.concatenate([sh[keep], dh[keep]])
        b = np.concatenate([dh[keep], sh[keep]])
        return _rows(len(a), kind=[EDGE] * len(a), bucket=a % num_buckets, u=a, v=b)

    def to_seeds(batch: pa.Table) -> pa.Table:
        """Every gated endpoint (self-loops included) starts labeled
        by itself — this is what keeps isolated nodes alive."""
        t = batch.filter(batch.column("gated"))
        urls = list(
            dict.fromkeys(
                t.column("src_url").to_pylist() + t.column("dst_url").to_pylist()
            )
        )
        h = hash_arr(urls)
        return _rows(
            len(h), kind=[SELF] * len(h), bucket=h % num_buckets, u=h, l=h
        )

    def to_nodemap(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("gated"))
        urls = list(
            dict.fromkeys(
                t.column("src_url").to_pylist() + t.column("dst_url").to_pylist()
            )
        )
        h = hash_arr(urls)
        return _rows(len(h), kind=[NODE] * len(h), bucket=h % num_buckets, u=h, url=urls)

    def _dedup_edges(group: pa.Table) -> pa.Table:
        """Distinct (u, v) edge rows of one bucket's group (duplicates
        arise when several groups re-home different edges onto the
        same pair; dedup is local-exact because bucket(u) co-locates
        an orientation's duplicates)."""
        e = group.filter(pc.equal(group.column("kind"), EDGE))
        return e.select(["bucket", "u", "v"]).group_by(["bucket", "u", "v"]).aggregate([])

    def _edge_rows(u: np.ndarray, v: np.ndarray) -> pa.Table:
        """Both orientations of the undirected edges (u_i, v_i)."""
        a = np.concatenate([u, v])
        b = np.concatenate([v, u])
        return _rows(
            len(a),
            kind=np.full(len(a), EDGE, np.int64),
            bucket=a % num_buckets,
            u=a,
            v=b,
        )

    def _chg_row(n: int) -> pa.Table:
        return _rows(1, kind=[CHG], bucket=[0], u=[0], chg=[n])

    def star_large(group: pa.Table) -> pa.Table:
        """Large-star: re-home u's larger neighbors onto m = min(N(u) ∪
        {u}); smaller-neighbor rows pass through unchanged. Incoming
        CHG rows (previous round's counters) are dropped."""
        e = _dedup_edges(group)
        u = e.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = e.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        g = e.group_by("u").aggregate([("v", "min")])
        m_tab = pa.table(
            {
                "u": g.column("u"),
                "m": pc.min_element_wise(g.column("v_min"), g.column("u")),
            }
        )
        j = e.join(m_tab, keys="u", join_type="inner")
        ju = j.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        jv = j.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        jm = j.column("m").to_numpy(zero_copy_only=False).astype(np.int64)
        big = jv > ju
        out = [_edge_rows(jm[big], jv[big])]  # (m, v): unchanged when m == u
        # pass-through: smaller-neighbor edges stay as-is this phase
        small = ~big
        out.append(_edge_rows(ju[small], jv[small]))
        # bridge: u stays attached to m when it re-homed its big nbrs
        rehome = big & (jm != ju)
        bu, bm = ju[rehome], jm[rehome]
        if len(bu):
            pair = np.unique(np.stack([bu, bm], axis=1), axis=0)
            out.append(_edge_rows(pair[:, 0], pair[:, 1]))
        n_chg = int(len(np.unique(ju[rehome])))
        out.append(_chg_row(n_chg))
        return pa.concat_tables(out)

    def star_small(group: pa.Table) -> pa.Table:
        """Small-star: re-home u's smaller neighbors (and u) onto its
        min smaller neighbor; larger-neighbor rows are dropped (the
        partner group recreates them). Passes CHG rows through."""
        chg_rows = group.filter(pc.equal(group.column("kind"), CHG))
        e = _dedup_edges(group)
        u = e.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = e.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        small_mask = v < u
        es = pa.table({"u": u[small_mask], "v": v[small_mask]})
        out = [chg_rows.select([f.name for f in SCHEMA])]
        n_chg = 0
        if es.num_rows:
            g = es.group_by("u").aggregate([("v", "min"), ("v", "count")])
            m_tab = pa.table({"u": g.column("u"), "m": g.column("v_min")})
            j = es.join(m_tab, keys="u", join_type="inner")
            jv = j.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
            jm = j.column("m").to_numpy(zero_copy_only=False).astype(np.int64)
            moved = jv != jm
            out.append(_edge_rows(jv[moved], jm[moved]))
            gu = g.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
            gm = m_tab.column("m").to_numpy(zero_copy_only=False).astype(np.int64)
            out.append(_edge_rows(gu, gm))  # (u, m) per node with small nbrs
            n_chg = int(
                (g.column("v_count").to_numpy(zero_copy_only=False) >= 2).sum()
            )
        out.append(_chg_row(n_chg))
        return pa.concat_tables(out)

    edges = links.map_batches(to_edges, batch_format="pyarrow")
    nodemap = links.map_batches(to_nodemap, batch_format="pyarrow")
    seeds = links.map_batches(to_seeds, batch_format="pyarrow")

    converged = False
    cur = edges
    for it in range(max_iters):
        cur = (
            cur.groupby("bucket")
            .map_groups(star_large, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(star_small, batch_format="pyarrow")
            .materialize()
        )
        chg = cur.sum("chg") or 0
        if round_stats is not None:
            round_stats.append((it, chg, cur.count()))
        if chg == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(f"link_components: no fixpoint after {max_iters} rounds")

    def to_leaf_labels(batch: pa.Table) -> pa.Table:
        """Star-forest edges → SELF rows: each leaf labeled by its
        (unique, smaller) center; centers/isolated come from seeds."""
        e = batch.filter(pc.equal(batch.column("kind"), EDGE))
        u = e.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = e.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        leaf = v < u
        lu, lv = u[leaf], v[leaf]
        return _rows(
            len(lu),
            kind=np.full(len(lu), SELF, np.int64),
            bucket=lu % num_buckets,
            u=lu,
            l=lv,
        )

    cand = cur.map_batches(to_leaf_labels, batch_format="pyarrow").union(seeds)

    def attach_url(group: pa.Table) -> pa.Table:
        """Join a bucket's final labels (converged SELF rows) to its
        url rows; re-key the (label, url) pairs by the LABEL's bucket."""
        k = group.column("kind")
        nm = (
            group.filter(pc.equal(k, NODE))
            .select(["u", "url"])
            .group_by(["u", "url"])
            .aggregate([])
        )
        c = group.filter(pc.equal(k, SELF))
        s = c.select(["u", "l"]).group_by("u").aggregate([("l", "min")])
        j = s.join(nm, keys="u", join_type="inner")
        lab = j.column("l_min").to_numpy(zero_copy_only=False).astype(np.int64)
        return _rows(
            len(lab),
            kind=np.full(len(lab), NODE, np.int64),
            bucket=lab % num_buckets,
            u=lab,
            url=j.column("url"),
        )

    def comp_fold(group: pa.Table) -> pa.Table:
        g = group.select(["u", "url"]).group_by("u").aggregate(
            [("url", "min"), ("url", "count")]
        )
        j = group.select(["u", "url"]).join(g, keys="u", join_type="inner")
        return pa.table(
            {
                "url": j.column("url"),
                "comp": j.column("url_min"),
                "comp_size": pc.cast(j.column("url_count"), pa.int64()),
            }
        )

    out_schema = pa.schema(
        [("url", pa.string()), ("comp", pa.string()), ("comp_size", pa.int64())]
    )
    resolved = (
        cand.materialize()  # union-under-sort livelock rule (dedup.py)
        .union(nodemap)
        .groupby("bucket")
        .map_groups(attach_url, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(comp_fold, batch_format="pyarrow")
    )
    return rd.from_arrow(out_schema.empty_table()).union(resolved)


def components_oracle_sql(
    links_path: str, base_sql: str | None = None, url_col: str = "url"
) -> str:
    """DuckDB oracle: undirected transitive closure via a recursive
    CTE, component representative = MIN reachable url (url itself
    included), size by a second fold over the closure. ``base_sql``
    overrides the edge source (must yield columns ``s, d``) —
    :func:`host_components_oracle_sql` uses it for host-level edges."""
    base = base_sql or (
        f"SELECT src_url AS s, dst_url AS d "
        f"FROM read_parquet('{links_path}') WHERE gated"
    )
    return f"""
        WITH RECURSIVE base AS (
          {base}
        ), und AS (
          SELECT s AS a, d AS b FROM base WHERE s <> d
          UNION
          SELECT d, s FROM base WHERE s <> d
        ), nodes AS (
          SELECT DISTINCT s AS n FROM base
          UNION
          SELECT DISTINCT d FROM base
        ), reach AS (
          SELECT n, n AS m FROM nodes
          UNION
          SELECT u.b AS n, r.m FROM reach r JOIN und u ON u.a = r.n
        ), comp AS (
          SELECT n AS url, MIN(m) AS comp FROM reach GROUP BY n
        )
        SELECT c.url AS {url_col}, c.comp, z.comp_size
        FROM comp c
        JOIN (SELECT comp, CAST(COUNT(*) AS BIGINT) AS comp_size
              FROM comp GROUP BY comp) z USING (comp)
    """


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


# -- host graph (host-level collapse of the link graph) ------------------

# Authority component of a URL: everything between "://" and the first
# /?#. Shared RE2-class pattern — BOTH engines (polars' rust regex and
# DuckDB's RE2) compile this exact string, so host extraction is
# value-identical for any input by construction (the pii_scrub parity
# technique). No-scheme / malformed urls extract '' on both sides.
HOST_RE = r"^[^:/?#]+://([^/?#]+)"


def host_graph(sf_dir: str, num_buckets: int = 32, links_path: str | None = None):
    """Host-level collapse of the gated link graph — the web-graph
    product crawl pipelines actually publish (Common Crawl's host-level
    webgraph): one row per ``(src_host, dst_host)`` pair with

    * ``n_links``    — gated link occurrences between the two hosts,
    * ``n_src_urls`` — distinct linking pages on the source host,
    * ``n_dst_urls`` — distinct linked pages on the target host.

    Hosts are the lowercased URL authority (ports kept — a distinct
    port IS a distinct authority); urls with no scheme collapse into
    the ``''`` host on both engines (same regex, see ``HOST_RE``).

    Ray shape — partial-aggregate before the shuffle: each input batch
    is reduced to DISTINCT ``(src_host, dst_host, src_url, dst_url)``
    quads carrying an exact ``cnt`` (polars vectorized regex + group
    fold — duplicate links between the same pages collapse before any
    row crosses the wire), keyed by ``hash(src_host, dst_host) %
    num_buckets`` so one ``groupby(bucket).map_groups`` task per bucket
    finishes the pair exactly: ``n_links = Σcnt`` and the two distinct
    counts via Arrow ``count_distinct``. The exchange is bounded by
    distinct page pairs, not link occurrences, and host strings cross
    the wire once per distinct pair per batch. Host-pair skew (every
    page on a big site linking its own nav pages) concentrates ONE
    pair's quads in one bucket; quads are already first-level
    aggregates, so the group is O(distinct pages), not O(links).
    """
    links = rd.read_parquet(
        links_path or _links_path(sf_dir), columns=["src_url", "dst_url", "gated"]
    )

    def to_quads(batch: pa.Table) -> pa.Table:
        import polars as pl

        t = batch.filter(batch.column("gated"))
        df = pl.from_arrow(t.select(["src_url", "dst_url"]))
        out = (
            df.with_columns(
                src_host=pl.col("src_url")
                .str.extract(HOST_RE, 1)
                .fill_null("")
                .str.to_lowercase(),
                dst_host=pl.col("dst_url")
                .str.extract(HOST_RE, 1)
                .fill_null("")
                .str.to_lowercase(),
            )
            .group_by(["src_host", "dst_host", "src_url", "dst_url"])
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
            .with_columns(
                bucket=(
                    pl.concat_str(
                        [pl.col("src_host"), pl.col("dst_host")], separator="\x1f"
                    ).hash(seed=0)
                    % np.uint64(num_buckets)
                ).cast(pl.Int64)
            )
        )
        return out.to_arrow().select(
            ["bucket", "src_host", "dst_host", "src_url", "dst_url", "cnt"]
        ).cast(
            pa.schema(
                [
                    ("bucket", pa.int64()),
                    ("src_host", pa.string()),
                    ("dst_host", pa.string()),
                    ("src_url", pa.string()),
                    ("dst_url", pa.string()),
                    ("cnt", pa.int64()),
                ]
            )
        )

    def finish(group: pa.Table) -> pa.Table:
        g = (
            group.select(["src_host", "dst_host", "src_url", "dst_url", "cnt"])
            .group_by(["src_host", "dst_host"])
            .aggregate(
                [
                    ("cnt", "sum"),
                    ("src_url", "count_distinct"),
                    ("dst_url", "count_distinct"),
                ]
            )
        )
        return pa.table(
            {
                "src_host": g.column("src_host"),
                "dst_host": g.column("dst_host"),
                "n_links": g.column("cnt_sum").cast(pa.int64()),
                "n_src_urls": g.column("src_url_count_distinct").cast(pa.int64()),
                "n_dst_urls": g.column("dst_url_count_distinct").cast(pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            ("src_host", pa.string()),
            ("dst_host", pa.string()),
            ("n_links", pa.int64()),
            ("n_src_urls", pa.int64()),
            ("n_dst_urls", pa.int64()),
        ]
    )
    result = (
        links.map_batches(to_quads, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(finish, batch_format="pyarrow")
    )
    return rd.from_arrow(out_schema.empty_table()).union(result)


def host_graph_oracle_sql(links_path: str) -> str:
    """DuckDB oracle: the same RE2 host extraction, one GROUP BY."""
    return f"""
        SELECT
          lower(regexp_extract(src_url, '{HOST_RE}', 1)) AS src_host,
          lower(regexp_extract(dst_url, '{HOST_RE}', 1)) AS dst_host,
          CAST(COUNT(*) AS BIGINT) AS n_links,
          CAST(COUNT(DISTINCT src_url) AS BIGINT) AS n_src_urls,
          CAST(COUNT(DISTINCT dst_url) AS BIGINT) AS n_dst_urls
        FROM read_parquet('{links_path}')
        WHERE gated
        GROUP BY 1, 2
    """


def host_components(
    sf_dir: str,
    num_buckets: int = 32,
    links_path: str | None = None,
    local_threshold: int = 100_000,
):
    """Site-island detection: weakly connected components over the
    HOST graph — which groups of sites form closed link neighborhoods
    (mirror farms, language islands, walled gardens). Output:
    ``(host, comp, comp_size)`` with ``comp`` the lexicographically
    smallest host of the island.

    Composition of the two graph primitives: the gated link table is
    collapsed to distinct host pairs per batch (same ``HOST_RE``
    extraction as :func:`host_graph`, so host identity is cross-engine
    exact), and the resulting links-shaped Dataset feeds
    :func:`link_components`' large-star/small-star machinery via its
    ``links_ds`` seam — same O(log² n) rounds, same exact convergence
    counters, no new exchange code. Intra-host links become self-loop
    pairs, which the CC machinery already treats as
    connectivity-free-but-node-keeping: a site linking only to itself
    is its own singleton island, exactly mirroring the URL-level
    semantics.
    """
    links = rd.read_parquet(
        links_path or _links_path(sf_dir), columns=["src_url", "dst_url", "gated"]
    )

    def to_host_pairs(batch: pa.Table) -> pa.Table:
        import polars as pl

        t = batch.filter(batch.column("gated"))
        df = pl.from_arrow(t.select(["src_url", "dst_url"]))
        out = (
            df.select(
                src_url=pl.col("src_url")
                .str.extract(HOST_RE, 1)
                .fill_null("")
                .str.to_lowercase(),
                dst_url=pl.col("dst_url")
                .str.extract(HOST_RE, 1)
                .fill_null("")
                .str.to_lowercase(),
            )
            .unique()
            .with_columns(gated=pl.lit(True))
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("src_url", pa.string()),
                    ("dst_url", pa.string()),
                    ("gated", pa.bool_()),
                ]
            )
        )

    pairs = links.map_batches(to_host_pairs, batch_format="pyarrow").materialize()

    # local tiny-graph shortcut (same scheduler choice as
    # host_pagerank): below the threshold run an exact union-find
    # driver-side on the already-collapsed distinct host pairs —
    # identical output contract, pinned against the distributed path
    if pairs.count() <= local_threshold:
        import ray

        out_schema = pa.schema(
            [("host", pa.string()), ("comp", pa.string()), ("comp_size", pa.int64())]
        )
        tbls = [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows]
        if not tbls:
            return rd.from_arrow(out_schema.empty_table())
        tbl = pa.concat_tables(tbls)
        return rd.from_arrow(_components_local(tbl, out_schema))

    comps = link_components(sf_dir, num_buckets=num_buckets, links_ds=pairs)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["host", "comp", "comp_size"])

    return comps.map_batches(rename, batch_format="pyarrow")


def _components_local(edges: pa.Table, out_schema: pa.schema) -> pa.Table:
    """Driver-side exact connected components over a small
    ``src_url/dst_url`` edge table — same semantics as the
    large-star/small-star path: self-loops keep a node without adding
    connectivity, the component representative is the lexicographically
    smallest member.

    Vectorized min-hooking + full pointer shortcutting
    (Shiloach-Vishkin) over int node ids: O(E) numpy ops per round,
    ~log(n) rounds, no Python per-edge loop — ~10^6 edges finish in
    tens of milliseconds where a dict union-find loops for seconds.
    ``np.unique`` assigns ids in LEXICOGRAPHIC order and min-hooking
    converges every component onto its minimum id, so the final root
    IS the lexicographically smallest member."""
    s = np.asarray(edges.column("src_url").to_pylist(), dtype=object)
    d = np.asarray(edges.column("dst_url").to_pylist(), dtype=object)
    uniq, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
    u, v = inv[: len(s)], inv[len(s) :]
    keep = u != v  # self-loops register the node, add no connectivity
    u, v = u[keep], v[keep]
    parent = np.arange(len(uniq), dtype=np.int64)
    while True:
        pu, pv = parent[u], parent[v]
        hi = np.maximum(pu, pv)
        lo = np.minimum(pu, pv)
        before = parent.copy()
        np.minimum.at(parent, hi, lo)  # hook larger root onto smaller
        while True:  # full pointer shortcut
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        if np.array_equal(parent, before):
            break
    sizes = np.bincount(parent, minlength=len(uniq))
    return pa.table(
        {
            out_schema.names[0]: pa.array(uniq, pa.string()),
            "comp": pa.array(uniq[parent], pa.string()),
            "comp_size": pa.array(sizes[parent].astype(np.int64), pa.int64()),
        },
        schema=out_schema,
    )


def host_components_oracle_sql(links_path: str) -> str:
    """DuckDB oracle: the CC transitive-closure oracle over host-level
    edges (same ``HOST_RE`` both engines)."""
    base = (
        f"SELECT lower(regexp_extract(src_url, '{HOST_RE}', 1)) AS s, "
        f"lower(regexp_extract(dst_url, '{HOST_RE}', 1)) AS d "
        f"FROM read_parquet('{links_path}') WHERE gated"
    )
    return components_oracle_sql(links_path, base_sql=base, url_col="host")


def host_pagerank(
    sf_dir: str,
    iters: int = 5,
    num_buckets: int = 8,
    links_path: str | None = None,
    local_threshold: int = 100_000,
):
    """Host-level PageRank — the rank column of the published
    host-webgraph product (Common Crawl ships exactly this: a host
    graph plus per-host rank): fixed-point PageRank over the DISTINCT
    host-pair edges of the gated link graph. Output ``(host,
    rank_fp)`` with ``rank_fp`` the 2^20-scaled int64 rank, bit-exact
    against the unrolled DuckDB twin.

    Semantics pinned for both engines: one edge per distinct
    ``(src_host, dst_host)`` pair (each pair contributes out-degree 1
    regardless of how many page-level links realize it — the
    unweighted simple host graph), self-loops kept (a host linking
    itself feeds its own rank — and stays a node even when it links
    nowhere else), hosts lowercased via the shared ``HOST_RE``.

    Ray shape — a composition of existing primitives: the batch-local
    host-pair collapse (polars RE2 + ``unique``, same as
    :func:`host_components`) shrinks the exchange to distinct pairs
    per batch, ONE ``groupby(bucket).map_groups`` exchange makes the
    pairs globally distinct (bucketed by pair hash, so dupes of a pair
    meet in one group; required because multi-edges would inflate
    out-degree in the iteration), and the deduped links-shaped Dataset
    feeds :func:`link_pagerank`'s ``links_ds`` seam — no new iteration
    code. Exchange count: 1 + (iters + 1). Host strings cross the
    pair-dedup wire once per distinct pair per batch; inside the
    iteration they are int64 ids as usual.

    ``num_buckets`` defaults low: the host graph is orders of
    magnitude smaller than the link graph, and on an iterative
    exchange the per-round latency scales with block/partition count,
    not bytes — scale buckets with the CLUSTER (e.g. ~2× cores) when
    the host set is genuinely large (10^8 hosts), exactly like
    ``link_pagerank``.

    Below ``local_threshold`` distinct pairs the power iteration runs
    DRIVER-side on the (already tiny, already materialized) pair set —
    the crawl driver's local-tiny-round pattern: a scheduler choice,
    not a semantic one; the same exact integer ops run either way
    (``tests/test_pipelines.py::TestHostPagerank`` pins both paths to
    one oracle). Iterative Dataset exchanges cost seconds of fixed
    latency per round, which dwarfs a sub-100k-edge graph's compute.
    """
    links = rd.read_parquet(
        links_path or _links_path(sf_dir), columns=["src_url", "dst_url", "gated"]
    )
    pairs = _distinct_host_pairs(links, num_buckets)
    out_schema = pa.schema([("host", pa.string()), ("rank_fp", pa.int64())])

    if pairs.count() <= local_threshold:
        import ray

        tbl = pa.concat_tables(
            [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows]
        ) if pairs.count() else None
        if tbl is None:
            return rd.from_arrow(out_schema.empty_table())
        return rd.from_arrow(_pagerank_local(tbl, iters, out_schema))

    ranks = link_pagerank(sf_dir, iters=iters, num_buckets=num_buckets, links_ds=pairs)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["host", "rank_fp"])

    return rd.from_arrow(out_schema.empty_table()).union(
        ranks.map_batches(rename, batch_format="pyarrow")
    )


def _distinct_host_pairs(links, num_buckets: int):
    """Globally-distinct lowercased host pairs of the gated link graph,
    materialized (tiny): batch-local collapse (polars RE2 + ``unique``)
    then ONE pair-hash-bucketed exchange for global dedup. Shared by
    :func:`host_pagerank` and :func:`host_hits`; the ``gated`` column
    rides along for :func:`link_pagerank`'s ``links_ds`` seam."""
    import polars as pl

    def to_pairs(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("gated"))
        df = pl.from_arrow(t.select(["src_url", "dst_url"]))
        out = (
            df.select(
                src_url=pl.col("src_url")
                .str.extract(HOST_RE, 1)
                .fill_null("")
                .str.to_lowercase(),
                dst_url=pl.col("dst_url")
                .str.extract(HOST_RE, 1)
                .fill_null("")
                .str.to_lowercase(),
            )
            .unique()
            .with_columns(
                bucket=(
                    pl.concat_str(
                        [pl.col("src_url"), pl.col("dst_url")], separator="\x1f"
                    ).hash(seed=0)
                    % np.uint64(num_buckets)
                ).cast(pl.Int64)
            )
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("src_url", pa.string()),
                    ("dst_url", pa.string()),
                    ("bucket", pa.int64()),
                ]
            )
        )

    def distinct_pairs(group: pa.Table) -> pa.Table:
        g = group.group_by(["src_url", "dst_url"]).aggregate([])
        return g.append_column("gated", pa.array([True] * g.num_rows, pa.bool_()))

    return (
        links.map_batches(to_pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(distinct_pairs, batch_format="pyarrow")
        .materialize()
    )


def _distinct_url_pairs(links, num_buckets: int):
    """Globally-distinct gated (src_url, dst_url) pairs — the URL-level
    sibling of :func:`_distinct_host_pairs` (no host collapse):
    batch-local ``unique`` then ONE pair-hash-bucketed exchange for
    global dedup. Used by :func:`link_kcore`, whose semantics need
    intra-site edges."""
    import polars as pl

    def to_pairs(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("gated"))
        df = (
            pl.from_arrow(t.select(["src_url", "dst_url"]))
            .unique()
            .with_columns(
                bucket=(
                    pl.concat_str(
                        [pl.col("src_url"), pl.col("dst_url")], separator="\x1f"
                    ).hash(seed=0)
                    % np.uint64(num_buckets)
                ).cast(pl.Int64)
            )
        )
        return df.to_arrow().cast(
            pa.schema(
                [
                    ("src_url", pa.string()),
                    ("dst_url", pa.string()),
                    ("bucket", pa.int64()),
                ]
            )
        )

    def distinct_pairs(group: pa.Table) -> pa.Table:
        g = group.group_by(["src_url", "dst_url"]).aggregate([])
        return g.append_column("gated", pa.array([True] * g.num_rows, pa.bool_()))

    return (
        links.map_batches(to_pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(distinct_pairs, batch_format="pyarrow")
        .materialize()
    )


def host_hits(
    sf_dir: str,
    iters: int = 5,
    num_buckets: int = 8,
    links_path: str | None = None,
    local_threshold: int = 100_000,
):
    """HITS hubs & authorities (Kleinberg) over the DISTINCT host
    graph — the directory-vs-content complement to
    :func:`host_pagerank`: a hub links to many good authorities, an
    authority is linked from many good hubs. Output ``(host, hub_fp,
    auth_fp)``, both 2^20-scaled int64 scores.

    Integer-exact iteration (shared verbatim with the unrolled DuckDB
    twin): per round ``auth_raw(v) = Σ_{u→v} hub(u)`` then
    ``auth(v) = auth_raw · ONE // max(auth_raw, over all nodes, ≥1)``
    — max-normalization instead of the textbook L2 norm keeps every
    value an exact int64 (no float accumulation), preserves the
    ranking, and is SQL-expressible; hubs update symmetrically from
    the fresh authorities. Overflow bound: ``auth_raw · ONE ≤
    n_nodes · 2^40`` — safe to ~8M in-degree, far past any host graph.

    Edge semantics match host_pagerank: one edge per distinct
    lowercased ``(src_host, dst_host)`` pair, self-loops kept.

    Scheduling: below ``local_threshold`` distinct pairs the iteration
    runs driver-side (exact numpy; the crawl driver's local-tiny-round
    choice — host graphs are orders smaller than page graphs). Above
    it, a distributed path composes the existing primitives —
    ``hash_join`` (hub/auth values onto the edge list) + a keyed sum +
    a driver-side max per half-round. That is 2 joins + 2 aggregates
    per iteration (exchange-heavier than pagerank's fused single
    exchange — fusing the alternating directions needs both-direction
    edge copies per bucket, double the resident edge bytes; at host-
    graph sizes the simple composition wins on clarity and is still
    slim int/str rows). Both paths are pinned to the same oracle."""
    import pyarrow.compute as pc

    links = rd.read_parquet(
        links_path or _links_path(sf_dir), columns=["src_url", "dst_url", "gated"]
    )
    pairs = _distinct_host_pairs(links, num_buckets)
    out_schema = pa.schema(
        [("host", pa.string()), ("hub_fp", pa.int64()), ("auth_fp", pa.int64())]
    )
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(out_schema.empty_table())
    if n_pairs <= local_threshold:
        import ray

        tbl = pa.concat_tables([t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows])
        return rd.from_arrow(_hits_local(tbl, iters, out_schema))
    return _hits_distributed(pairs, iters, num_buckets, out_schema)


def _hits_local(edges: pa.Table, iters: int, out_schema: pa.schema) -> pa.Table:
    """Driver-side exact integer HITS over a small ``src_url/dst_url``
    edge table — bit-identical to the distributed path and SQL twin."""
    srcs = edges.column("src_url").to_pylist()
    dsts = edges.column("dst_url").to_pylist()
    nodes = sorted(set(srcs) | set(dsts))
    idx = {n: i for i, n in enumerate(nodes)}
    si = np.fromiter((idx[s] for s in srcs), dtype=np.int64, count=len(srcs))
    di = np.fromiter((idx[d] for d in dsts), dtype=np.int64, count=len(dsts))
    h = np.full(len(nodes), ONE, dtype=np.int64)
    a = np.zeros(len(nodes), dtype=np.int64)
    for _ in range(iters):
        a_raw = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(a_raw, di, h[si])
        a = a_raw * ONE // max(int(a_raw.max()), 1)
        h_raw = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(h_raw, si, a[di])
        h = h_raw * ONE // max(int(h_raw.max()), 1)
    return pa.table(
        {
            "host": pa.array(nodes, pa.string()),
            "hub_fp": pa.array(h, pa.int64()),
            "auth_fp": pa.array(a, pa.int64()),
        },
        schema=out_schema,
    )


def _hits_distributed(pairs, iters: int, num_buckets: int, out_schema: pa.schema):
    """Distributed HITS on the existing primitives (see
    :func:`host_hits`). ``pairs``: materialized distinct-host-pair
    Dataset with ``src_url/dst_url`` columns."""
    import pyarrow.compute as pc

    from wbot_ray.pipelines.join import hash_join

    EDGE = pa.schema([("src", pa.string()), ("dst", pa.string())])
    VAL = pa.schema([("node", pa.string()), ("v", pa.int64())])

    edges = pairs.map_batches(
        lambda t: t.select(["src_url", "dst_url"]).rename_columns(["src", "dst"]),
        batch_format="pyarrow",
    ).materialize()

    def to_nodes(batch: pa.Table) -> pa.Table:
        hosts = sorted(
            set(batch.column("src").to_pylist()) | set(batch.column("dst").to_pylist())
        )
        return pa.table({"node": pa.array(hosts, pa.string())})

    nodes = (
        edges.map_batches(to_nodes, batch_format="pyarrow")
        .groupby("node")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .materialize()
    )

    def _init_h(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch.column("node"), "v": pa.array([ONE] * batch.num_rows, pa.int64())},
            schema=VAL,
        )

    def _half_round(values, join_key: str, emit_col: str):
        """values (join_key, v) joined onto edges by ``join_key`` side,
        summed per ``emit_col`` node, max-normalized → fresh (node, v)."""
        j = hash_join(
            edges,
            values,
            key=join_key,
            num_buckets=num_buckets,
            left_schema=EDGE,
            right_schema=pa.schema([(join_key, pa.string()), ("v", pa.int64())]),
        )
        raw = (
            j.map_batches(
                lambda t: pa.table(
                    {"node": t.column(emit_col), "v": t.column("v")}, schema=VAL
                ),
                batch_format="pyarrow",
            )
            .groupby("node")
            .sum("v")
            .map_batches(
                lambda t: pa.table(
                    {"node": t.column("node"), "v": t.column("sum(v)").cast(pa.int64())},
                    schema=VAL,
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        m = max(int(raw.max("v") or 0), 1)
        return raw.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "v": pc.cast(
                        pc.divide(pc.multiply(t.column("v").cast(pa.int64()), ONE), m),
                        pa.int64(),
                    ),
                },
                schema=VAL,
            ),
            batch_format="pyarrow",
        ).materialize()

    h = nodes.map_batches(_init_h, batch_format="pyarrow").materialize()
    a = None
    for _ in range(iters):
        # values must carry the edge-side key name for the join
        hv = h.map_batches(
            lambda t: pa.table({"src": t.column("node"), "v": t.column("v")}),
            batch_format="pyarrow",
        )
        a = _half_round(hv, "src", "dst")
        av = a.map_batches(
            lambda t: pa.table({"dst": t.column("node"), "v": t.column("v")}),
            batch_format="pyarrow",
        )
        h = _half_round(av, "dst", "src")

    HSCH = pa.schema([("node", pa.string()), ("hub_fp", pa.int64())])
    ASCH = pa.schema([("node", pa.string()), ("auth_fp", pa.int64())])
    hj = hash_join(
        nodes,
        h.map_batches(
            lambda t: pa.table({"node": t.column("node"), "hub_fp": t.column("v")}),
            batch_format="pyarrow",
        ),
        key="node",
        num_buckets=num_buckets,
        join_type="left outer",
        left_schema=pa.schema([("node", pa.string())]),
        right_schema=HSCH,
    )
    full = hash_join(
        hj,
        a.map_batches(
            lambda t: pa.table({"node": t.column("node"), "auth_fp": t.column("v")}),
            batch_format="pyarrow",
        ),
        key="node",
        num_buckets=num_buckets,
        join_type="left outer",
        left_schema=pa.schema([("node", pa.string()), ("hub_fp", pa.int64())]),
        right_schema=ASCH,
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": batch.column("node"),
                "hub_fp": pc.fill_null(batch.column("hub_fp"), 0).cast(pa.int64()),
                "auth_fp": pc.fill_null(batch.column("auth_fp"), 0).cast(pa.int64()),
            },
            schema=out_schema,
        )

    return full.map_batches(finish, batch_format="pyarrow")


def host_hits_oracle_sql(links_path: str, iters: int = 5) -> str:
    """DuckDB twin: the identical unrolled max-normalized integer
    iteration over the distinct host pairs."""
    base = (
        f"SELECT DISTINCT "
        f"lower(regexp_extract(src_url, '{HOST_RE}', 1)) AS src, "
        f"lower(regexp_extract(dst_url, '{HOST_RE}', 1)) AS dst "
        f"FROM read_parquet('{links_path}') WHERE gated"
    )
    # every CTE is MATERIALIZED: each level is referenced twice (by the
    # max CTE and the normalize CTE), and DuckDB inlines plain CTEs —
    # without materialization the plan re-evaluates each level per
    # reference, exponential in ``iters``
    ctes = [
        f"e AS MATERIALIZED ({base})",
        """nodes AS MATERIALIZED (SELECT DISTINCT n FROM
               (SELECT src AS n FROM e UNION ALL SELECT dst FROM e))""",
        f"h0 AS MATERIALIZED (SELECT n, CAST({ONE} AS BIGINT) AS v FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""a{i}r AS MATERIALIZED (
              SELECT nodes.n, CAST(COALESCE(s.s, 0) AS BIGINT) AS v
              FROM nodes LEFT JOIN (
                SELECT e.dst AS n, SUM(p.v) AS s
                FROM e JOIN h{i - 1} p ON e.src = p.n GROUP BY e.dst) s
              ON nodes.n = s.n)"""
        )
        ctes.append(
            f"a{i}m AS MATERIALIZED (SELECT GREATEST(MAX(v), 1) AS m FROM a{i}r)"
        )
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT n, CAST(v * {ONE} // m AS BIGINT) AS v"
            f" FROM a{i}r, a{i}m)"
        )
        ctes.append(
            f"""h{i}r AS MATERIALIZED (
              SELECT nodes.n, CAST(COALESCE(s.s, 0) AS BIGINT) AS v
              FROM nodes LEFT JOIN (
                SELECT e.src AS n, SUM(p.v) AS s
                FROM e JOIN a{i} p ON e.dst = p.n GROUP BY e.src) s
              ON nodes.n = s.n)"""
        )
        ctes.append(
            f"h{i}m AS MATERIALIZED (SELECT GREATEST(MAX(v), 1) AS m FROM h{i}r)"
        )
        ctes.append(
            f"h{i} AS MATERIALIZED (SELECT n, CAST(v * {ONE} // m AS BIGINT) AS v"
            f" FROM h{i}r, h{i}m)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT h.n AS host, h.v AS hub_fp, a.v AS auth_fp
        FROM h{iters} h JOIN a{iters} a ON h.n = a.n"""
    )


def _pagerank_local(edges: pa.Table, iters: int, out_schema: pa.schema) -> pa.Table:
    """Driver-side exact integer power iteration over a small edge
    table (``src_url``/``dst_url`` string columns) — bit-identical to
    the distributed path and the SQL twin: per-edge contribution
    ``r // out_degree`` (floor), fold ``BASE + (85·Σ)//100``."""
    srcs = edges.column("src_url").to_pylist()
    dsts = edges.column("dst_url").to_pylist()
    nodes = sorted(set(srcs) | set(dsts))
    idx = {n: i for i, n in enumerate(nodes)}
    si = np.fromiter((idx[s] for s in srcs), dtype=np.int64, count=len(srcs))
    di = np.fromiter((idx[d] for d in dsts), dtype=np.int64, count=len(dsts))
    od = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(od, si, 1)
    r = np.full(len(nodes), ONE, dtype=np.int64)
    for _ in range(iters):
        s = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(s, di, r[si] // od[si])
        r = BASE + (DAMP_NUM * s) // DAMP_DEN
    return pa.table(
        {
            out_schema.names[0]: pa.array(nodes, pa.string()),
            "rank_fp": pa.array(r, pa.int64()),
        },
        schema=out_schema,
    )


def host_pagerank_oracle_sql(links_path: str, iters: int = 5) -> str:
    """DuckDB oracle: the identical unrolled fixed-point iteration over
    the DISTINCT host-pair edges (same ``HOST_RE`` both engines)."""
    base = (
        f"SELECT DISTINCT "
        f"lower(regexp_extract(src_url, '{HOST_RE}', 1)) AS src, "
        f"lower(regexp_extract(dst_url, '{HOST_RE}', 1)) AS dst "
        f"FROM read_parquet('{links_path}') WHERE gated"
    )
    return pagerank_oracle_sql(links_path, iters, base_sql=base, url_col="host")


def frontier_priority(
    sf_dir: str,
    iters: int = 5,
    num_buckets: int = 32,
    links_path: str | None = None,
    pages_path: str | None = None,
):
    """Rank-weighted URL priority — the score a frontier scheduler
    orders its queue by (OPIC/PageRank-guided crawling): per corpus
    URL, ``priority_fp = host_rank_fp // (1 + path_depth)`` — the
    host's fixed-point PageRank damped by how deep the path is (deep
    paths on a good host still beat shallow paths on a bad one until
    the depth penalty wins). Output: ``(url, host, rank_fp,
    path_depth, priority_fp)``; a host absent from the link graph
    scores rank 0 (never-linked site). Pure-integer scoring — exact
    in SQL.

    Ray shape — the broadcast-join pattern (``cust_order_stats``):
    :func:`host_pagerank`'s output is tiny (one row per host), so it
    is materialized once, ``ray.put`` once, and every pages batch does
    a vectorized Arrow left join against it — no shuffle of the pages
    side at all; one single-column pruned read + a stateless map. At
    ~10^8 hosts swap the broadcast for a keyed join on bucket(host) —
    the same seam the dimension joins document."""
    import ray

    from wbot_ray.pipelines.urlstats import PATH_RE, _pages_path_for

    ranks = host_pagerank(
        sf_dir, iters=iters, num_buckets=num_buckets, links_path=links_path
    ).materialize()
    parts = [t for t in ray.get(ranks.to_arrow_refs()) if t.num_rows]
    rank_tbl = (
        pa.concat_tables(parts)
        if parts
        else pa.schema([("host", pa.string()), ("rank_fp", pa.int64())]).empty_table()
    )
    ref = ray.put(rank_tbl.combine_chunks())

    pages = rd.read_parquet(pages_path or _pages_path_for(sf_dir), columns=["url"])

    def score(batch: pa.Table) -> pa.Table:
        import polars as pl
        import pyarrow.compute as pc

        dim = ray.get(ref)
        df = pl.from_arrow(batch.select(["url"])).with_columns(
            host=pl.col("url").str.extract(HOST_RE, 1).fill_null("").str.to_lowercase(),
            path=pl.col("url").str.extract(PATH_RE, 1).fill_null(""),
        ).with_columns(
            path_depth=pl.col("path").str.count_matches("/", literal=True).cast(pl.Int64)
        )
        t = df.select(["url", "host", "path_depth"]).to_arrow().cast(
            pa.schema(
                [("url", pa.string()), ("host", pa.string()), ("path_depth", pa.int64())]
            )
        )
        j = t.join(dim, keys="host", join_type="left outer")
        rank = pc.fill_null(j.column("rank_fp"), 0)
        depth = j.column("path_depth")
        import numpy as np

        pr = rank.to_numpy(zero_copy_only=False).astype(np.int64) // (
            1 + depth.to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "url": j.column("url"),
                "host": j.column("host"),
                "rank_fp": rank.cast(pa.int64()),
                "path_depth": depth,
                "priority_fp": pa.array(pr, pa.int64()),
            }
        )

    return pages.map_batches(score, batch_format="pyarrow")


def frontier_priority_oracle_sql(
    links_path: str, pages_path: str, iters: int = 5
) -> str:
    """DuckDB twin: the unrolled host-pagerank CTE left-joined onto
    the same RE2 URL anatomy, same integer damping."""
    from wbot_ray.pipelines.urlstats import PATH_RE

    hr = host_pagerank_oracle_sql(links_path, iters)
    return f"""
        WITH hr AS ({hr}),
        p AS (
          SELECT url,
                 lower(COALESCE(regexp_extract(url, '{HOST_RE}', 1), '')) AS host,
                 COALESCE(regexp_extract(url, '{PATH_RE}', 1), '') AS path
          FROM read_parquet('{pages_path}')
        )
        SELECT p.url, p.host,
               CAST(COALESCE(hr.rank_fp, 0) AS BIGINT) AS rank_fp,
               CAST(length(path) - length(replace(path, '/', '')) AS BIGINT) AS path_depth,
               CAST(COALESCE(hr.rank_fp, 0)
                    // (1 + length(path) - length(replace(path, '/', '')))
                    AS BIGINT) AS priority_fp
        FROM p LEFT JOIN hr ON hr.host = p.host
    """


def link_reciprocity(sf_dir: str, links_path: str | None = None):
    """Per-host link reciprocity over the DISTINCT host graph — the
    classic nepotistic-linking / link-farm signal (mutual-link density;
    hosts in reciprocal cliques are downweighted by spam-aware rankers).
    Output per linking host: ``(host, n_out, n_recip, recip_ppm)`` where
    ``n_out`` counts distinct off-host destinations, ``n_recip`` how
    many of those link back, and ``recip_ppm = n_recip·10⁶ // n_out``.

    Ray shape — the UNORDERED-pair trick, two slim exchanges, no join:
    batches collapse to distinct ``(src_host, dst_host)`` pairs (host
    extraction is the same vectorized RE2 as :func:`host_graph`), each
    keyed by its unordered pair key ``(min, max)``. The
    ``groupby(unordered)`` group then holds BOTH directions of a mutual
    pair, so reciprocity is decided locally (group has 2 distinct
    directions ⇒ both are reciprocal) — no self-join of the edge list.
    A final ``groupby(host)`` folds the per-edge flags into counts.
    Both exchanges carry distinct host pairs, never link occurrences."""
    from ray.data.aggregate import Sum

    links = rd.read_parquet(
        links_path or _links_path(sf_dir), columns=["src_url", "dst_url", "gated"]
    )

    def to_pairs(batch: pa.Table) -> pa.Table:
        import polars as pl

        t = batch.filter(batch.column("gated"))
        df = (
            pl.from_arrow(t.select(["src_url", "dst_url"]))
            .select(
                a=pl.col("src_url").str.extract(HOST_RE, 1).fill_null("").str.to_lowercase(),
                b=pl.col("dst_url").str.extract(HOST_RE, 1).fill_null("").str.to_lowercase(),
            )
            .filter(pl.col("a") != pl.col("b"))
            .unique()
            .with_columns(
                lo=pl.min_horizontal("a", "b"), hi=pl.max_horizontal("a", "b")
            )
        )
        return df.select(["lo", "hi", "a", "b"]).to_arrow()

    def decide(group: pa.Table) -> pa.Table:
        # distinct directions of ONE unordered host pair (dupes across
        # batches collapse here)
        d = group.select(["a", "b"]).group_by(["a", "b"]).aggregate([])
        recip = d.num_rows == 2
        return pa.table(
            {
                "host": d.column("a"),
                "n_out": pa.array(np.ones(d.num_rows, np.int64), pa.int64()),
                "n_recip": pa.array(
                    np.full(d.num_rows, 1 if recip else 0, np.int64), pa.int64()
                ),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        out = pc.cast(batch.column("n_out"), pa.int64())
        rec = pc.cast(batch.column("n_recip"), pa.int64())
        return pa.table(
            {
                "host": batch.column("host"),
                "n_out": out,
                "n_recip": rec,
                "recip_ppm": pc.cast(
                    pc.divide(pc.multiply(rec, 1_000_000), out), pa.int64()
                ),
            }
        )

    return (
        links.map_batches(to_pairs, batch_format="pyarrow")
        .groupby(["lo", "hi"])
        .map_groups(decide, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n_out", alias_name="n_out"), Sum("n_recip", alias_name="n_recip"))
        .map_batches(finish, batch_format="pyarrow")
    )


def link_reciprocity_oracle_sql(links_path: str) -> str:
    """DuckDB twin: distinct off-host host pairs, left self-join for
    the reverse edge, per-host fold."""
    return f"""
        WITH e AS (
          SELECT DISTINCT
            lower(regexp_extract(src_url, '{HOST_RE}', 1)) AS a,
            lower(regexp_extract(dst_url, '{HOST_RE}', 1)) AS b
          FROM read_parquet('{links_path}')
          WHERE gated
            AND lower(regexp_extract(src_url, '{HOST_RE}', 1))
             <> lower(regexp_extract(dst_url, '{HOST_RE}', 1))
        )
        SELECT e.a AS host,
               CAST(COUNT(*) AS BIGINT) AS n_out,
               CAST(SUM(CASE WHEN r.a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_recip,
               CAST(SUM(CASE WHEN r.a IS NOT NULL THEN 1 ELSE 0 END)
                    * 1000000 // COUNT(*) AS BIGINT) AS recip_ppm
        FROM e LEFT JOIN e r ON r.a = e.b AND r.b = e.a
        GROUP BY e.a
    """


def degree_dist(sf_dir: str, links_path: str | None = None):
    """In-degree distribution of the gated link graph — the power-law
    histogram every published webgraph ships (Common Crawl / WebGraph
    degree-frequency tables; the straight line on log-log axes that
    sanity-checks a crawl's reach): one row per observed in-degree with
    the number of urls at that degree. URLs that only ever appear as
    link SOURCES have in-degree 0 and are counted too.

    Ray shape — a two-level fold, both exchanges slim: the per-url
    degree table (:func:`link_degrees` — batch partials, one
    ``groupby(url)``) feeds a ``groupby(in_deg).count`` whose key
    cardinality is the number of DISTINCT degrees (≤ a few thousand on
    a power-law graph at any corpus size), so the second exchange is
    near-free. Composes the existing operator rather than re-reading
    the edge list."""
    from ray.data.aggregate import Count

    def slim(batch: pa.Table) -> pa.Table:
        return batch.select(["in_deg"])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "in_deg": pc.cast(batch.column("in_deg"), pa.int64()),
                "n_urls": pc.cast(batch.column("n_urls"), pa.int64()),
            }
        )

    return (
        link_degrees(sf_dir, links_path=links_path)
        .map_batches(slim, batch_format="pyarrow")
        .groupby("in_deg")
        .aggregate(Count(alias_name="n_urls"))
        .map_batches(finish, batch_format="pyarrow")
    )


def degree_dist_oracle_sql(links_path: str) -> str:
    """DuckDB twin: per-url in-degree over gated edges (sources with no
    in-links count at degree 0), then the frequency fold."""
    return f"""
        WITH e AS (
          SELECT src_url, dst_url FROM read_parquet('{links_path}') WHERE gated
        ),
        nodes AS (
          SELECT DISTINCT u FROM (
            SELECT src_url AS u FROM e UNION ALL SELECT dst_url FROM e
          )
        ),
        ind AS (
          SELECT n.u, CAST(COUNT(e.dst_url) AS BIGINT) AS in_deg
          FROM nodes n LEFT JOIN e ON e.dst_url = n.u
          GROUP BY n.u
        )
        SELECT in_deg, CAST(COUNT(*) AS BIGINT) AS n_urls
        FROM ind GROUP BY in_deg
    """


# -- host-graph BFS distances (single-source shortest paths) --------------


def host_sssp(
    sf_dir: str,
    max_hops: int = 8,
    num_buckets: int = 8,
    links_path: str | None = None,
    local_threshold: int = 100_000,
):
    """Directed BFS hop distance over the DISTINCT host graph from a
    deterministic seed — the "how far does influence/discovery travel
    from a site" signal (seed-set expansion radius, crawl-depth audit
    at host granularity). Seed = the source host with the HIGHEST
    distinct out-degree, ties broken by lexicographically smallest
    name (content-derived, no config — the best-connected site, so the
    BFS actually explores; a lexicographic-min seed lands on stub
    hosts). Output ``(host, dist)`` for every host reachable in ≤
    ``max_hops`` directed hops; unreachable hosts are absent.
    ``max_hops`` is part of the operator contract (shared with the SQL
    twin), which also bounds the recursive oracle on cyclic graphs.

    Ray shape — the :func:`link_pagerank` staged-edge skeleton, BFS
    flavored: the distinct host pairs (one pair-dedup exchange, shared
    helper) are hashed to int64 ids and staged ONCE as
    bucket-partitioned parquet; each of the ``max_hops`` rounds is ONE
    ``groupby(bucket).map_groups`` exchange carrying slim ``(bucket,
    node, dist)`` int64 state rows — the fold keeps the per-node MIN
    dist, and only the round's FRONTIER (nodes first settled last
    round) fans out over its bucket's staged out-edges, so a round's
    wire cost is O(V + frontier out-edges), never O(E · rounds). Host
    strings ride only the final exchange (the nodemap pattern). The
    whole BFS is one lazy DAG — no driver sync per round.

    Below ``local_threshold`` distinct pairs the BFS runs driver-side
    on the materialized pair set (the local-tiny-round scheduler
    choice; both paths are pinned to the same oracle in
    ``tests/test_pipelines.py``)."""
    import os
    import tempfile

    import polars as pl
    import pyarrow.parquet as pq

    links = rd.read_parquet(
        links_path or _links_path(sf_dir), columns=["src_url", "dst_url", "gated"]
    )
    pairs = _distinct_host_pairs(links, num_buckets)
    out_schema = pa.schema([("host", pa.string()), ("dist", pa.int64())])

    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(out_schema.empty_table())

    if n_pairs <= local_threshold:
        import ray

        tbl = pa.concat_tables(
            [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows]
        )
        src = tbl.column("src_url").to_pylist()
        dst = tbl.column("dst_url").to_pylist()
        adj: dict[str, list[str]] = {}
        for s, d in zip(src, dst):
            adj.setdefault(s, []).append(d)
        # pairs are globally distinct, so len(adj[s]) IS the distinct
        # out-degree; max degree, lexicographic tie-break
        seed = min(adj, key=lambda s: (-len(adj[s]), s))
        dist = {seed: 0}
        frontier = [seed]
        for r in range(1, max_hops + 1):
            nxt = []
            for h in frontier:
                for d in adj.get(h, ()):
                    if d not in dist:
                        dist[d] = r
                        nxt.append(d)
            if not nxt:
                break
            frontier = nxt
        hosts = sorted(dist)
        return rd.from_arrow(
            pa.table(
                {
                    "host": pa.array(hosts, pa.string()),
                    "dist": pa.array([dist[h] for h in hosts], pa.int64()),
                },
                schema=out_schema,
            )
        )

    # ---- distributed path: staged edges + min-fold BFS rounds
    M = (1 << 63) - 1

    def hash_arr(urls: list) -> np.ndarray:
        h = pl.Series(urls, dtype=pl.String).hash(seed=0).to_numpy()
        return (h & np.uint64(M)).astype(np.int64)

    def to_edges(batch: pa.Table) -> pa.Table:
        sh = hash_arr(batch.column("src_url").to_pylist())
        dh = hash_arr(batch.column("dst_url").to_pylist())
        return pa.table(
            {
                "bucket": pa.array(sh % num_buckets, pa.int64()),
                "src": pa.array(sh, pa.int64()),
                "dst": pa.array(dh, pa.int64()),
                "dst_bucket": pa.array(dh % num_buckets, pa.int64()),
            }
        )

    def to_nodemap(batch: pa.Table) -> pa.Table:
        hosts = list(
            dict.fromkeys(
                batch.column("src_url").to_pylist()
                + batch.column("dst_url").to_pylist()
            )
        )
        h = hash_arr(hosts)
        return pa.table(
            {
                "bucket": pa.array(h % num_buckets, pa.int64()),
                "node": pa.array(h, pa.int64()),
                "dist": pa.nulls(len(h), pa.int64()),
                "host": pa.array(hosts, pa.string()),
            }
        )

    edge_dir = tempfile.mkdtemp(prefix="wbot_sssp_edges_")
    pairs.map_batches(to_edges, batch_format="pyarrow").write_parquet(
        edge_dir, partition_cols=["bucket"]
    )
    _EDGE_SCHEMA = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("dst_bucket", pa.int64())]
    )

    def _read_bucket(k: int) -> pa.Table:
        d = os.path.join(edge_dir, f"bucket={k}")
        if not os.path.isdir(d):
            return _EDGE_SCHEMA.empty_table()
        return pq.read_table(d, columns=["src", "dst", "dst_bucket"])

    # seed: max-distinct-out-degree source host (lexicographic
    # tie-break). Pairs are globally distinct, so a (src, deg) count is
    # exact; per-block argmax partials keep the driver pull at
    # O(blocks), not O(hosts).
    def batch_best(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"h": pa.array([], pa.string()), "deg": pa.array([], pa.int64())}
            )
        h, deg = min(
            zip(
                batch.column("src_url").to_pylist(),
                batch.column("count()").to_pylist(),
            ),
            key=lambda t: (-int(t[1]), t[0]),
        )
        return pa.table(
            {"h": pa.array([h], pa.string()), "deg": pa.array([int(deg)], pa.int64())}
        )

    degs = (
        pairs.groupby("src_url")
        .count()
        .map_batches(batch_best, batch_format="pyarrow")
        .take_all()
    )
    seed_host = min(degs, key=lambda r: (-int(r["deg"]), r["h"]))["h"]
    seed_id = int(hash_arr([seed_host])[0])

    state_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("node", pa.int64()),
            ("dist", pa.int64()),
            ("host", pa.string()),
        ]
    )
    state = rd.from_arrow(
        pa.table(
            {
                "bucket": pa.array([seed_id % num_buckets], pa.int64()),
                "node": pa.array([seed_id], pa.int64()),
                "dist": pa.array([0], pa.int64()),
                "host": pa.nulls(1, pa.string()),
            },
            schema=state_schema,
        )
    )

    def make_step(r: int):
        """Round r: min-fold this bucket's state, fan the round's
        frontier (dist == r-1) over the bucket's staged out-edges."""

        def step(group: pa.Table) -> pa.Table:
            g = group.filter(pc.is_null(group.column("host")))
            folded = g.group_by(["node", "bucket"]).aggregate([("dist", "min")])
            settled = pa.table(
                {
                    "bucket": folded.column("bucket"),
                    "node": folded.column("node"),
                    "dist": folded.column("dist_min"),
                    "host": pa.nulls(folded.num_rows, pa.string()),
                },
                schema=state_schema,
            )
            out = [settled]
            frontier = folded.filter(pc.equal(folded.column("dist_min"), r - 1))
            if frontier.num_rows:
                b = int(group.column("bucket")[0].as_py())
                e = _read_bucket(b)
                if e.num_rows:
                    j = e.join(
                        frontier.select(["node"]).rename_columns(["src"]),
                        keys="src",
                        join_type="inner",
                    )
                    if j.num_rows:
                        cand = j.group_by(["dst", "dst_bucket"]).aggregate([])
                        out.append(
                            pa.table(
                                {
                                    "bucket": cand.column("dst_bucket"),
                                    "node": cand.column("dst"),
                                    "dist": pa.array(
                                        np.full(cand.num_rows, r, np.int64), pa.int64()
                                    ),
                                    "host": pa.nulls(cand.num_rows, pa.string()),
                                },
                                schema=state_schema,
                            )
                        )
            return pa.concat_tables(out)

        return step

    for r in range(1, max_hops + 1):
        state = state.groupby("bucket").map_groups(
            make_step(r), batch_format="pyarrow"
        )

    def resolve(group: pa.Table) -> pa.Table:
        has_host = pc.is_valid(group.column("host"))
        nm = (
            group.filter(has_host)
            .select(["node", "host"])
            .group_by(["node", "host"])
            .aggregate([])
        )
        g = group.filter(pc.invert(has_host))
        folded = g.group_by("node").aggregate([("dist", "min")])
        j = folded.join(nm, keys="node", join_type="inner")
        return pa.table(
            {"host": j.column("host"), "dist": j.column("dist_min")},
            schema=out_schema,
        )

    nodemap = pairs.map_batches(to_nodemap, batch_format="pyarrow")
    resolved = (
        state.materialize()  # union-under-sort livelock rule (dedup.py)
        .union(nodemap)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )
    return rd.from_arrow(out_schema.empty_table()).union(resolved)


def host_sssp_oracle_sql(links_path: str, max_hops: int = 8) -> str:
    """DuckDB twin: recursive-CTE BFS over the distinct host pairs,
    seed = the max-distinct-out-degree source host (lexicographic
    tie-break), min-dist fold; the ``dist <= max_hops`` bound makes
    the recursion finite on cyclic graphs (same contract as the
    engine's round count)."""
    return f"""
        WITH RECURSIVE p AS (
          SELECT DISTINCT
            lower(COALESCE(regexp_extract(src_url, '{HOST_RE}', 1), '')) AS s,
            lower(COALESCE(regexp_extract(dst_url, '{HOST_RE}', 1), '')) AS d
          FROM read_parquet('{links_path}') WHERE gated
        ), seed AS (
          SELECT s AS h FROM (
            SELECT s, COUNT(*) AS deg FROM p GROUP BY s
          ) ORDER BY deg DESC, s LIMIT 1
        ), bfs(host, dist) AS (
          SELECT h, 0 FROM seed
          UNION
          SELECT p.d, b.dist + 1
          FROM bfs b JOIN p ON p.s = b.host
          WHERE b.dist + 1 <= {max_hops}
        )
        SELECT host, CAST(MIN(dist) AS BIGINT) AS dist
        FROM bfs GROUP BY host
    """


KCORE_K = 2
KCORE_ROUNDS = 6


def link_kcore(
    sf_dir: str,
    k: int = KCORE_K,
    rounds: int = KCORE_ROUNDS,
    num_buckets: int = 8,
    links_path: str | None = None,
    local_threshold: int = 100_000,
):
    """Bounded k-core peeling over the UNDIRECTED distinct gated URL
    link graph — the "dense web neighborhood" signal (link-farm /
    community-core detection; pages outside any 2-core are the
    leaf/periphery a crawl scheduler can deprioritize). The URL graph
    (not the host collapse) because k-core needs intra-site structure:
    the host graph of a hub-and-spoke web is a tree with an EMPTY
    2-core.

    Exactly ``rounds`` peel iterations, both engines: ``alive_0`` =
    every url with ≥1 non-self edge; each round drops nodes whose
    degree WITHIN the previous alive set is < ``k``. Output =
    ``(host, deg)`` — column named ``host`` for surface uniformity
    with the other graph ops; here it carries the URL — for the
    survivors, ``deg`` their degree within the FINAL alive set. The
    fixed round count (not convergence) is part of the operator
    contract — it bounds the unrolled SQL twin the same way
    ``host_sssp`` bounds its recursive CTE; peeling converges in a
    handful of rounds (every round that changes nothing is a no-op on
    both sides).

    Ray shape — the ``host_sssp`` staged-edge skeleton, degree-count
    flavored: the undirected edge set (both directions of the distinct
    host pairs, self-loops dropped, deduped through one pair-keyed
    exchange) is staged ONCE as bucket-partitioned parquet. Each round
    is two slim keyed exchanges in the same lazy DAG: (1) every
    bucket's alive nodes fan counts over their staged out-edges
    (per-dst partials pre-combined in the group — wire cost O(alive
    out-edges), edges themselves never re-enter an exchange), (2) the
    count fold keeps nodes that are alive AND reach ``k``. Below
    ``local_threshold`` distinct pairs the peel runs driver-side on
    the materialized pair set (the local-tiny-round scheduler choice;
    both paths are parity-pinned in tests)."""
    import os
    import tempfile

    import polars as pl
    import pyarrow.parquet as pq

    links = rd.read_parquet(
        links_path or _links_path(sf_dir), columns=["src_url", "dst_url", "gated"]
    )
    pairs = _distinct_url_pairs(links, num_buckets)
    out_schema = pa.schema([("host", pa.string()), ("deg", pa.int64())])

    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(out_schema.empty_table())

    if n_pairs <= local_threshold:
        import ray

        tbl = pa.concat_tables(
            [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows]
        )
        nbrs: dict[str, set] = {}
        for s, d in zip(
            tbl.column("src_url").to_pylist(), tbl.column("dst_url").to_pylist()
        ):
            if s == d:
                continue
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
        alive = set(nbrs)
        for _ in range(rounds):
            nxt = {v for v in alive if sum(1 for u in nbrs[v] if u in alive) >= k}
            if nxt == alive:
                break
            alive = nxt
        hosts = sorted(alive)
        return rd.from_arrow(
            pa.table(
                {
                    "host": pa.array(hosts, pa.string()),
                    "deg": pa.array(
                        [sum(1 for u in nbrs[h] if u in alive) for h in hosts],
                        pa.int64(),
                    ),
                },
                schema=out_schema,
            )
        )

    # ---- distributed path: staged undirected edges + count-fold rounds
    M = (1 << 63) - 1

    def hash_arr(urls: list) -> np.ndarray:
        h = pl.Series(urls, dtype=pl.String).hash(seed=0).to_numpy()
        return (h & np.uint64(M)).astype(np.int64)

    def to_undirected(batch: pa.Table) -> pa.Table:
        keep = pc.invert(
            pc.equal(batch.column("src_url"), batch.column("dst_url"))
        )
        t = batch.filter(keep)
        su = t.column("src_url").to_pylist()
        du = t.column("dst_url").to_pylist()
        sh, dh = hash_arr(su), hash_arr(du)
        src = np.concatenate([sh, dh])
        dst = np.concatenate([dh, sh])
        return pa.table(
            {
                "bucket": pa.array(src % num_buckets, pa.int64()),
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "dst_bucket": pa.array(dst % num_buckets, pa.int64()),
            }
        )

    def dedup_edges(group: pa.Table) -> pa.Table:
        return group.group_by(["bucket", "src", "dst", "dst_bucket"]).aggregate([])

    edge_dir = tempfile.mkdtemp(prefix="wbot_kcore_edges_")
    (
        pairs.map_batches(to_undirected, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dedup_edges, batch_format="pyarrow")
        .write_parquet(edge_dir, partition_cols=["bucket"])
    )
    _EDGE_SCHEMA = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("dst_bucket", pa.int64())]
    )

    def _read_bucket(b: int) -> pa.Table:
        d = os.path.join(edge_dir, f"bucket={b}")
        if not os.path.isdir(d):
            return _EDGE_SCHEMA.empty_table()
        return pq.read_table(d, columns=["src", "dst", "dst_bucket"])

    # state rows: alive markers (cnt null, host null), count partials
    # (cnt int), nodemap rows (host set) — one schema, three kinds
    state_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("node", pa.int64()),
            ("cnt", pa.int64()),
            ("host", pa.string()),
        ]
    )

    def to_alive0(batch: pa.Table) -> pa.Table:
        keep = pc.invert(
            pc.equal(batch.column("src_url"), batch.column("dst_url"))
        )
        t = batch.filter(keep)
        nodes = np.unique(
            np.concatenate(
                [
                    hash_arr(t.column("src_url").to_pylist()),
                    hash_arr(t.column("dst_url").to_pylist()),
                ]
            )
            if t.num_rows
            else np.array([], np.int64)
        )
        return pa.table(
            {
                "bucket": pa.array(nodes % num_buckets, pa.int64()),
                "node": pa.array(nodes, pa.int64()),
                "cnt": pa.nulls(len(nodes), pa.int64()),
                "host": pa.nulls(len(nodes), pa.string()),
            },
            schema=state_schema,
        )

    state = pairs.map_batches(to_alive0, batch_format="pyarrow")

    def fanout(group: pa.Table) -> pa.Table:
        """Alive nodes of this bucket fan degree counts over the
        bucket's staged out-edges; markers pass through (deduped —
        alive_0 construction emits one marker per batch a node
        appears in)."""
        alive = group.group_by(["bucket", "node"]).aggregate([])
        markers = pa.table(
            {
                "bucket": alive.column("bucket"),
                "node": alive.column("node"),
                "cnt": pa.nulls(alive.num_rows, pa.int64()),
                "host": pa.nulls(alive.num_rows, pa.string()),
            },
            schema=state_schema,
        )
        out = [markers]
        if alive.num_rows:
            b = int(group.column("bucket")[0].as_py())
            e = _read_bucket(b)
            if e.num_rows:
                j = e.join(
                    alive.select(["node"]).rename_columns(["src"]),
                    keys="src",
                    join_type="inner",
                )
                if j.num_rows:
                    c = j.group_by(["dst", "dst_bucket"]).aggregate([("dst", "count")])
                    out.append(
                        pa.table(
                            {
                                "bucket": c.column("dst_bucket"),
                                "node": c.column("dst"),
                                "cnt": pc.cast(c.column("dst_count"), pa.int64()),
                                "host": pa.nulls(c.num_rows, pa.string()),
                            },
                            schema=state_schema,
                        )
                    )
        return pa.concat_tables(out)

    def fold(group: pa.Table) -> pa.Table:
        """Keep nodes that are alive (marker present) AND whose degree
        within the alive set reaches k."""
        is_marker = pc.is_null(group.column("cnt"))
        markers = group.filter(is_marker)
        counts = (
            group.filter(pc.invert(is_marker))
            .group_by(["bucket", "node"])
            .aggregate([("cnt", "sum")])
        )
        ok = counts.filter(pc.greater_equal(counts.column("cnt_sum"), k))
        alive_nodes = markers.group_by(["bucket", "node"]).aggregate([])
        j = alive_nodes.join(
            ok.select(["node"]), keys="node", join_type="inner"
        )
        return pa.table(
            {
                "bucket": j.column("bucket"),
                "node": j.column("node"),
                "cnt": pa.nulls(j.num_rows, pa.int64()),
                "host": pa.nulls(j.num_rows, pa.string()),
            },
            schema=state_schema,
        )

    for _ in range(rounds):
        state = (
            state.groupby("bucket")
            .map_groups(fanout, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(fold, batch_format="pyarrow")
        )

    # final within-core degree: one more fan-out, folded WITHOUT the
    # k gate, then host-name resolution (the nodemap pattern)
    state = state.groupby("bucket").map_groups(fanout, batch_format="pyarrow")

    def to_nodemap(batch: pa.Table) -> pa.Table:
        hosts = list(
            dict.fromkeys(
                batch.column("src_url").to_pylist()
                + batch.column("dst_url").to_pylist()
            )
        )
        h = hash_arr(hosts)
        return pa.table(
            {
                "bucket": pa.array(h % num_buckets, pa.int64()),
                "node": pa.array(h, pa.int64()),
                "cnt": pa.nulls(len(h), pa.int64()),
                "host": pa.array(hosts, pa.string()),
            },
            schema=state_schema,
        )

    def resolve(group: pa.Table) -> pa.Table:
        has_host = pc.is_valid(group.column("host"))
        nm = (
            group.filter(has_host)
            .select(["node", "host"])
            .group_by(["node", "host"])
            .aggregate([])
        )
        g = group.filter(pc.invert(has_host))
        is_marker = pc.is_null(g.column("cnt"))
        alive = g.filter(is_marker).group_by("node").aggregate([])
        counts = (
            g.filter(pc.invert(is_marker))
            .group_by("node")
            .aggregate([("cnt", "sum")])
        )
        j = alive.join(counts, keys="node", join_type="inner").join(
            nm, keys="node", join_type="inner"
        )
        return pa.table(
            {"host": j.column("host"), "deg": j.column("cnt_sum")},
            schema=out_schema,
        )

    nodemap = pairs.map_batches(to_nodemap, batch_format="pyarrow")
    resolved = (
        state.materialize()  # union-under-sort livelock rule (dedup.py)
        .union(nodemap)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )
    return rd.from_arrow(out_schema.empty_table()).union(resolved)


def link_kcore_oracle_sql(
    links_path: str, k: int = KCORE_K, rounds: int = KCORE_ROUNDS
) -> str:
    """DuckDB twin: the same ``rounds`` peel iterations UNROLLED as a
    CTE chain (a recursive CTE can't re-aggregate the shrinking node
    set per step), final degree within the last alive set."""
    chain = []
    prev = "a0"
    for r in range(1, rounds + 1):
        cur = f"a{r}"
        chain.append(
            f"{cur} AS (SELECT u.s AS v FROM u "
            f"JOIN {prev} x ON u.s = x.v JOIN {prev} y ON u.d = y.v "
            f"GROUP BY u.s HAVING COUNT(*) >= {k})"
        )
        prev = cur
    chain_sql = ",\n        ".join(chain)
    return f"""
        WITH p AS (
          SELECT DISTINCT src_url AS s, dst_url AS d
          FROM read_parquet('{links_path}') WHERE gated
        ), u AS (
          SELECT s, d FROM p WHERE s <> d
          UNION
          SELECT d, s FROM p WHERE s <> d
        ), a0 AS (SELECT DISTINCT s AS v FROM u),
        {chain_sql}
        SELECT u.s AS host, CAST(COUNT(*) AS BIGINT) AS deg
        FROM u JOIN {prev} x ON u.s = x.v JOIN {prev} y ON u.d = y.v
        GROUP BY u.s
    """
