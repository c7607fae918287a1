"""Distributed large-large hash join — the shuffle join the broadcast
pattern cannot cover.

Every other join in this repo broadcasts a small side (``relational``
dimension joins, ``price_band_join``) or co-partitions a slim drop list
(``dedup.dedup_keep``). When BOTH sides are fact-scale (lineitem ⋈
orders: neither fits one worker's heap at 100 TB), the only shape that
works is the classic partitioned hash join:

1. each side gets a ``jb = hash(key) % num_buckets`` column (one
   vectorized batch pass, no driver work),
2. both sides ride ONE keyed exchange (``union`` → ``groupby("jb")``) —
   Ray Data shuffles each block to its bucket's reducer,
3. one ``map_groups`` task per bucket splits its rows back into the two
   sides and joins them with ``pyarrow.Table.join`` (Acero's vectorized
   hash join) — every key lives in exactly one bucket, so bucket-local
   joins compose to the global join.

``num_buckets`` scales with the cluster, not the data: each reducer
holds |data| / num_buckets rows. Map-side combiners (``left_prepare`` /
``right_prepare``, run per bucket BEFORE the join) let aggregate-after-
join queries shrink the exchange: ship per-batch partials, finish them
per bucket where the key is complete, then join — the join output never
exceeds the post-aggregation cardinality.

Skew: for the aggregate-after-join pattern the map-side combiner
already collapses a hot key to ~one row per batch (the cheaper fix —
see ``order_priority_revenue``). For a pure row-level join with a
pathological key, pass ``hot_keys={key_value: salt_count}``: the LEFT
side's hot rows spread across ``salt_count`` dedicated buckets and the
RIGHT side's matching rows replicate into each of them — bucket-local
joins still compose exactly, and no single reducer owns the whole hot
key. (Replication duplicates unmatched right rows, so hot_keys is
limited to inner / left-side join types.) Planted tests pin both paths
(``tests/test_pipelines.py``).

The reference has no joins at all (SURVEY §2.5) — this operator exists
for the training-data side of the engine, same role as the fetch-join
in ``wbot_ray/web_index.py`` but with both sides unbounded.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from wbot_ray.pipelines.common import cents, read_table

__all__ = [
    "hash_join",
    "order_priority_revenue",
    "q3_shipping",
    "build_bloom",
    "bloom_prune",
    "bloom_semi_join",
    "bloom_semi_join_oracle_sql",
]


def _hash_col(arr: pa.ChunkedArray) -> np.ndarray:
    """Vectorized uint64 hash of one join-key column. Integer keys go
    through a splitmix64 finalizer — raw ``key % B`` would correlate
    with any range partitioning already on the data (e.g. sequential
    orderkeys land range-clustered per input file; the mix decorrelates
    bucket from block so every reducer sees every file's share)."""
    t = arr.type
    if arr.null_count:
        # null keys never match in Acero; they only need SOME
        # deterministic bucket. Fill for hashing only — the key column
        # itself keeps its nulls.
        arr = pc.fill_null(arr, 0 if pa.types.is_integer(t) else "")
    if pa.types.is_integer(t):
        x = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x = x ^ (x >> np.uint64(31))
        return x
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        import zlib

        return np.fromiter(
            (zlib.crc32(s.encode()) for s in arr.to_pylist()),
            dtype=np.uint64,
            count=len(arr),
        )
    raise TypeError(f"unsupported join-key type {t}")


def _bucket_of(t: pa.Table, keys: list[str], num_buckets: int) -> pa.Array:
    """Bucket id over one or more key columns: per-column uint64 hashes
    folded with a golden-ratio mix (order-sensitive, so (a,b) and (b,a)
    land independently), then ``% num_buckets``."""
    h = np.zeros(t.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            h = h * np.uint64(0x9E3779B97F4A7C15) + _hash_col(t.column(k))
            h ^= h >> np.uint64(29)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int64), pa.int64())


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str | list[str],
    num_buckets: int = 64,
    join_type: str = "inner",
    left_prepare: Callable[[pa.Table], pa.Table] | None = None,
    right_prepare: Callable[[pa.Table], pa.Table] | None = None,
    hot_keys: dict | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> "ray.data.Dataset":
    """Partitioned hash join of two Datasets on ``key`` — one column
    name or a list for a COMPOSITE key (same names and types both
    sides; non-key column names must not collide). Composite keys
    co-partition on the folded hash of all key columns, and the
    bucket-local Acero join runs on the full column list — every key
    tuple still lives in exactly one bucket.

    ``left_prepare`` / ``right_prepare``: optional per-bucket finisher
    run on that side's complete bucket slice before the join (the
    reduce-side half of a map-side combine). Must preserve the side's
    schema key columns; may change row count.

    Output columns: the key column(s), then left non-key columns, then
    right non-key columns (inner/left-outer/right-outer per
    ``join_type``, Acero semantics)."""
    keys = [key] if isinstance(key, str) else list(key)
    if hot_keys and join_type not in ("inner", "left outer", "left semi", "left anti"):
        raise ValueError(
            "hot_keys replicates right-side rows per salt — only inner/"
            f"left-side join types are exact under it, not {join_type!r}"
        )
    if hot_keys and len(keys) > 1:
        raise ValueError("hot_keys salting supports single-column keys only")
    if hot_keys and (left_prepare or right_prepare):
        # a hot key's left rows are SPLIT across salt buckets, so a
        # per-key-finishing prepare would emit one "complete" row per
        # salt — silently multiplying the key's contribution. For
        # aggregate-after-join the map-side combiner already collapses
        # hot keys; use that instead of salting.
        raise ValueError("hot_keys cannot be combined with left/right_prepare")
    hot_base = {}  # key value -> (first dedicated bucket, salt count)
    base = num_buckets
    for kv, kcnt in (hot_keys or {}).items():
        hot_base[kv] = (base, max(2, int(kcnt)))
        base += hot_base[kv][1]
    # Dataset.schema() on a lazy shuffle-bearing pipeline can trigger a
    # full execution pass just to learn column names — a caller that
    # knows its sides' schemas statically passes them and the join stays
    # one-execution-per-side end to end
    lschema = left_schema or left.schema().base_schema
    rschema = right_schema or right.schema().base_schema
    lcols = [f for f in lschema if f.name not in keys]
    rcols = [f for f in rschema if f.name not in keys]
    overlap = {f.name for f in lcols} & {f.name for f in rcols}
    if overlap:
        raise ValueError(f"non-key columns collide across sides: {sorted(overlap)}")
    key_types = [lschema.field(k).type for k in keys]
    names = (
        ["jb"] + keys + ["side_l"] + [f.name for f in lcols] + [f.name for f in rcols]
    )
    types = [pa.int64()] + key_types + [pa.bool_()] + [f.type for f in lcols] + [
        f.type for f in rcols
    ]
    union_schema = pa.schema(list(zip(names, types)))
    lnames = [f.name for f in lcols]
    rnames = [f.name for f in rcols]

    def tag(is_left: bool):
        own = lnames if is_left else rnames

        def fn(t: pa.Table) -> pa.Table:
            if hot_base and not is_left:
                # replicate the right side's hot-key rows into every salt
                # bucket of their key; non-hot rows pass through once
                kvals = t.column(keys[0]).to_pylist()
                hot_rows = [i for i, v in enumerate(kvals) if v in hot_base]
                if hot_rows:
                    keep = np.ones(len(kvals), dtype=bool)
                    keep[hot_rows] = False
                    cold = t.filter(pa.array(keep))
                    rep_tables, jbs = [], []
                    for i in hot_rows:
                        b0, kcnt = hot_base[kvals[i]]
                        rep_tables.extend([t.slice(i, 1)] * kcnt)
                        jbs.extend(range(b0, b0 + kcnt))
                    hot_tagged = _finish(
                        pa.concat_tables(rep_tables), pa.array(jbs, pa.int64())
                    )
                    return pa.concat_tables([_finish(cold, None), hot_tagged])
            return _finish(t, None)

        def _finish(t: pa.Table, jb_override) -> pa.Table:
            n = t.num_rows
            if jb_override is not None:
                jb = jb_override
            else:
                jb = _bucket_of(t, keys, num_buckets)
                if hot_base and is_left:
                    kvals = t.column(keys[0]).to_pylist()
                    jb_np = np.array(jb, dtype=np.int64)
                    salt = 0
                    for i, v in enumerate(kvals):
                        hb = hot_base.get(v)
                        if hb is not None:
                            b0, kcnt = hb
                            jb_np[i] = b0 + salt % kcnt  # cycle hot rows
                            salt += 1
                    jb = pa.array(jb_np, pa.int64())
            cols: dict[str, pa.Array | pa.ChunkedArray] = {
                "jb": jb,
                "side_l": pa.array(np.full(n, is_left), pa.bool_()),
            }
            for k in keys:
                cols[k] = t.column(k)
            nk = 2 + len(keys)
            for name, typ in zip(names[nk:], types[nk:]):
                cols[name] = t.column(name) if name in own else pa.nulls(n, typ)
            return pa.table({nm: cols[nm] for nm in names}, schema=union_schema)

        return fn

    # semi/anti joins emit only the probe side's columns
    if join_type in ("left semi", "left anti"):
        out_names = keys + lnames
    elif join_type in ("right semi", "right anti"):
        out_names = keys + rnames
    else:
        out_names = keys + lnames + rnames

    def join_bucket(g: pa.Table) -> pa.Table:
        is_l = g.column("side_l")
        lt = g.filter(is_l).select(keys + lnames).combine_chunks()
        rt = g.filter(pc.invert(is_l)).select(keys + rnames).combine_chunks()
        if left_prepare is not None:
            lt = left_prepare(lt)
        if right_prepare is not None:
            rt = right_prepare(rt)
        j = lt.join(rt, keys=keys, join_type=join_type)
        return j.select(out_names)

    # the left side is materialized before the union: a plan containing
    # a Sort (groupby) runs with preserve_order=True, and an order-
    # preserving union BUFFERS later inputs while earlier ones still
    # produce — with BOTH sides producing tasks under a tight object
    # store, the right side's output starves the left side's tasks of
    # store budget and the pipeline livelocks (measured on the
    # dedup_minhash sig-join: 20 min of zero task launches at 4 GB
    # corpus / 4 GB store; the same rule fixed it — see
    # pipelines/dedup.py). With input 0 already in the store the union
    # drains it instantly and input 1 streams; materialized blocks
    # spill normally under pressure.
    left_tagged = left.map_batches(tag(True), batch_format="pyarrow").materialize()
    return (
        left_tagged.union(right.map_batches(tag(False), batch_format="pyarrow"))
        .groupby("jb")
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def _combine_order_partials(t: pa.Table) -> pa.Table:
    """Exact per-orderkey sums from (possibly partial) rows — int64
    throughout (sorted ``np.add.reduceat``, no float accumulation)."""
    ok = t.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
    rev = t.column("rev_centi").to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = t.column("n_items").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ok, kind="stable")
    ok, rev, cnt = ok[order], rev[order], cnt[order]
    uk, starts = np.unique(ok, return_index=True)
    return pa.table(
        {
            "l_orderkey": pa.array(uk, pa.int64()),
            "rev_centi": pa.array(np.add.reduceat(rev, starts), pa.int64()),
            "n_items": pa.array(np.add.reduceat(cnt, starts), pa.int64()),
        }
    )


def order_priority_revenue(sf_dir: str, num_buckets: int = 64):
    """Revenue per order priority — the lineitem ⋈ orders LARGE-LARGE
    join (both sides fact-scale; nothing is broadcast).

    Ray shape: per-batch map-side combine collapses lineitem to one
    partial row per orderkey per batch (revenue in exact centi-cents,
    ``cents(price) × (100 − cents(discount))``); the partials and the
    orders rows co-partition through ONE keyed exchange
    (``hash_join(..., left_prepare=...)``), each bucket finishes its
    orderkeys' sums and joins them against its orders slice with Acero;
    per-batch partials then feed the final tiny |priorities|-key
    groupby. The exchange carries ~|orders| slim rows per side
    regardless of lineitem fan-out, and no stage ever holds more than
    one bucket."""

    def li_partial(batch: pa.Table) -> pa.Table:
        price = np.asarray(cents(batch.column("l_extendedprice")), dtype=np.int64)
        disc = np.asarray(cents(batch.column("l_discount")), dtype=np.int64)
        t = pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "rev_centi": pa.array(price * (100 - disc), pa.int64()),
                "n_items": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            }
        )
        return _combine_order_partials(t)

    lineitem = read_table(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_partial, batch_format="pyarrow")
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).rename_columns(
        {"o_orderkey": "l_orderkey"}
    )
    joined = hash_join(
        lineitem,
        orders,
        key="l_orderkey",
        num_buckets=num_buckets,
        left_prepare=_combine_order_partials,
    )

    def pri_partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["o_orderpriority", "rev_centi", "n_items"])
            .group_by("o_orderpriority")
            .aggregate(
                [("rev_centi", "sum"), ("n_items", "sum"), ("o_orderpriority", "count")]
            )
        )
        return pa.table(
            {
                "o_orderpriority": g.column("o_orderpriority"),
                "rev": g.column("rev_centi_sum"),
                "items": g.column("n_items_sum"),
                "orders": g.column("o_orderpriority_count"),
            }
        )

    return (
        joined.map_batches(pri_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("orders", alias_name="n_orders"),
            Sum("items", alias_name="n_items"),
            Sum("rev", alias_name="revenue_centi"),
        )
    )


def q3_shipping(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
    num_buckets: int = 64,
    runtime_filter: bool = False,
    runtime_filter_cap: int = 50_000_000,
):
    """Top-``k`` unshipped orders by revenue for one market segment — the
    MULTI-WAY join (TPC-H Q3 shape): customer ⋉ orders ⋈ lineitem chained
    through two independent keyed exchanges, finished with a distributed
    top-k.

    Ray shape, stage by stage (one all-lazy DAG):

    1. customer is filtered to the segment and reduced to its key column
       — but NOT broadcast: at 100 TB a 1/5 slice of customers is still
       fact-scale, so orders ⋉ customers rides ``hash_join(join_type=
       "left semi")`` (exchange keyed on custkey, slim key-only right
       side).
    2. optional RUNTIME SEMI-JOIN FILTER (``runtime_filter=True``): the
       qualified orders are materialized once, their sorted orderkey
       vector is broadcast via ``ray.put`` (exact — no bloom
       false-positive analysis needed) and probed with
       ``np.searchsorted`` inside the lineitem map stage, so lineitem
       rows whose order fails the date/segment gates never enter
       exchange 2 at all — with TPC-H selectivities that removes ~80%
       of the big side's exchange volume. The trade, measured at
       sf0.1/32cpu: the filter needs exchange 1 to FINISH before the
       lineitem scan starts (a barrier where the plain plan overlaps
       both sides), so on this latency-bound box it costs ~9 s while
       cutting exchange-2 rows 330k → ~66k; when exchange 2 is
       bandwidth-bound (the 100-TB regime: lineitem ≫ orders) the byte
       cut dominates and the filter wins — same A/B shape as the
       PageRank int-id trade recorded in BASELINE.md. Default off, so
       the single-node bench keeps the overlap. If the qualified set
       exceeds ``runtime_filter_cap`` keys the filter is skipped
       (logged) — never a silent memory blowup.
    3. lineitem is filtered on ``l_shipdate > cutoff`` at the batch
       level and collapsed to per-orderkey revenue partials per batch
       (map-side combine) before the second exchange keyed on orderkey,
       where each bucket finishes the sums and Acero-joins them against
       its qualified-orders slice. Date columns never enter an exchange.
    4. top-k: each output batch keeps its local top-k (revenue desc,
       orderdate asc, orderkey asc), then a ≤ k·blocks-row driver merge
       finishes — no third all-to-all for k rows of output (the
       ``topk_users`` pattern; a global sort of the join result would
       pay a full exchange for 10 rows).

    Revenue is exact centi-cents (int64); the result is deterministic
    because the ordering ends on the unique orderkey."""
    cut = np.datetime64(cutoff, "us")

    def cust_keys(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch.column("c_mktsegment"), segment)
        return pa.table({"o_custkey": batch.filter(m).column("c_custkey")})

    cust = read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        cust_keys, batch_format="pyarrow"
    )

    def order_rows(batch: pa.Table) -> pa.Table:
        m = pc.less(batch.column("o_orderdate"), pa.scalar(cut, pa.timestamp("us")))
        t = batch.filter(m)
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "l_orderkey": t.column("o_orderkey"),
                "o_orderdate": pc.strftime(t.column("o_orderdate"), "%Y-%m-%d"),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        )

    orders = read_table(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(order_rows, batch_format="pyarrow")
    qualified = hash_join(
        orders, cust, key="o_custkey", num_buckets=num_buckets, join_type="left semi"
    ).map_batches(
        lambda t: t.select(["l_orderkey", "o_orderdate", "o_orderpriority"]),
        batch_format="pyarrow",
    )

    keys_ref = None
    if runtime_filter:
        import logging

        qualified = qualified.materialize()  # needed twice: filter + join input
        n_qualified = qualified.count()
        if n_qualified <= runtime_filter_cap:
            key_chunks = [
                b.column("l_orderkey").to_numpy(zero_copy_only=False)
                for b in qualified.select_columns(["l_orderkey"]).iter_batches(
                    batch_format="pyarrow"
                )
            ]
            keys = (
                np.sort(np.concatenate(key_chunks)) if key_chunks else np.array([], np.int64)
            )
            keys_ref = ray.put(keys)
        else:
            logging.getLogger("wbot_ray").info(
                "q3_shipping: runtime filter skipped (%d qualified keys > cap %d)",
                n_qualified,
                runtime_filter_cap,
            )

    def li_partial(batch: pa.Table) -> pa.Table:
        m = pc.greater(batch.column("l_shipdate"), pa.scalar(cut, pa.timestamp("us")))
        t = batch.filter(m)
        if keys_ref is not None:
            keys = ray.get(keys_ref)
            ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
            if len(keys) == 0:
                t = t.slice(0, 0)
            else:
                idx = np.searchsorted(keys, ok).clip(max=len(keys) - 1)
                t = t.filter(pa.array(keys[idx] == ok))
        price = np.asarray(cents(t.column("l_extendedprice")), dtype=np.int64)
        disc = np.asarray(cents(t.column("l_discount")), dtype=np.int64)
        part = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "rev_centi": pa.array(price * (100 - disc), pa.int64()),
                "n_items": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
            }
        )
        return _combine_order_partials(part)

    lineitem = read_table(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(li_partial, batch_format="pyarrow")
    joined = hash_join(
        lineitem,
        qualified,
        key="l_orderkey",
        num_buckets=num_buckets,
        left_prepare=_combine_order_partials,
        # qualified carries exchange 1 — a schema() probe would run it twice
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("rev_centi", pa.int64()),
                ("n_items", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("o_orderdate", pa.string()),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )

    def _topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        rev = t.column("revenue_centi").to_numpy(zero_copy_only=False)
        okey = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        odate = np.asarray(t.column("o_orderdate").to_pylist())
        return t.take(pa.array(np.lexsort((okey, odate, -rev))[:k]))

    def block_topk(t: pa.Table) -> pa.Table:
        t = t.select(["l_orderkey", "o_orderdate", "o_orderpriority", "rev_centi"]).rename_columns(
            ["l_orderkey", "o_orderdate", "o_orderpriority", "revenue_centi"]
        )
        return _topk(t)

    cand = pa.Table.from_pylist(
        joined.map_batches(block_topk, batch_format="pyarrow").take_all()
    )  # ≤ k × blocks rows
    if cand.num_rows == 0:
        return pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.string()),
                "o_orderpriority": pa.array([], pa.string()),
                "revenue_centi": pa.array([], pa.int64()),
            }
        )
    return _topk(cand.select(["l_orderkey", "o_orderdate", "o_orderpriority", "revenue_centi"]))


# ---------------------------------------------------------------------------
# Bloom-filter runtime semi-join


BLOOM_M_BITS = 1 << 20  # filter size in bits (128 KiB packed) — see sizing note
BLOOM_K = 7  # hash probes per key (~optimal for m/n = 10)

# accounting of the most recent bloom_semi_join build (driver-side)
LAST_BLOOM_STATS: dict = {}


def _bloom_hashes(keys: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """(k, n) bit positions for int64 keys via double hashing over one
    splitmix64 mix: ``pos_i = (h1 + i * h2) % m``. ``h2`` is forced odd
    so for power-of-two ``m`` the probe sequence covers all positions."""
    x = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
        h1 = x % np.uint64(m_bits)
        h2 = ((x >> np.uint64(32)) | np.uint64(1)) % np.uint64(m_bits) | np.uint64(1)
        return np.stack(
            [(h1 + np.uint64(i) * h2) % np.uint64(m_bits) for i in range(k_hashes)]
        )


def build_bloom(
    keys_ds: "ray.data.Dataset",
    key: str,
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K,
) -> "ray.object_ref.ObjectRef":
    """Distributed Bloom-filter build over a key Dataset: every block
    sets its keys' bits into a LOCAL packed bitmap (one vectorized
    pass), the per-block bitmaps stream to the driver and OR-fold —
    each block contributes one ``m/8``-byte object regardless of its
    row count, so the fold moves ``blocks × m/8`` bytes total (at
    100 TB: fold in a ``num_returns``-tree instead; the OR is
    associative, the layout change is mechanical). Returns a
    ``ray.put`` handle to the packed ``uint8`` bitmap.

    Sizing: ``m/n = 10`` bits/key with ``k = 7`` gives ~0.8 % false
    positives — FPs only cost wasted exchange bytes here, never
    correctness (callers re-verify exactly)."""

    def block_bloom(t: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        k = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = _bloom_hashes(k, m_bits, k_hashes).reshape(-1)
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64), (1 << (pos & np.uint64(7))).astype(np.uint8))
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    folded = np.zeros(m_bits // 8, dtype=np.uint8)
    n_blocks = 0
    for b in keys_ds.map_batches(block_bloom, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for buf in b.column("bloom").to_pylist():
            folded |= np.frombuffer(buf, dtype=np.uint8)
            n_blocks += 1
    LAST_BLOOM_STATS.clear()
    LAST_BLOOM_STATS.update(
        {
            "m_bits": m_bits,
            "k_hashes": k_hashes,
            "blocks_folded": n_blocks,
            "fill_fraction": round(float(np.unpackbits(folded).mean()), 4),
        }
    )
    return ray.put(folded)


def bloom_prune(
    ds: "ray.data.Dataset",
    key: str,
    bloom_ref,
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K,
) -> "ray.data.Dataset":
    """Drop rows whose ``key`` is definitely not in the Bloom filter
    (may keep false positives — callers needing exactness re-verify
    with a real semi-join on the survivors)."""

    def probe(t: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        k = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = _bloom_hashes(k, m_bits, k_hashes)
        keep = np.ones(len(k), dtype=bool)
        for i in range(k_hashes):
            p = pos[i]
            byte = bits[(p >> np.uint64(3)).astype(np.int64)]
            keep &= ((byte >> (p & np.uint64(7))) & 1).astype(bool)
        return t.filter(pa.array(keep))

    return ds.map_batches(probe, batch_format="pyarrow")


def bloom_semi_join(sf_dir: str, priority: str = "1-URGENT", num_buckets: int = 32):
    """Per-returnflag lineitem stats for one order priority — the
    RUNTIME-FILTERED large-large semi-join (the Bloom pushdown every
    warehouse engine applies when a selective build side gates a big
    probe side).

    Ray shape: the qualifying orderkeys (≈1/5 of orders) build a
    distributed Bloom filter ONCE (``build_bloom`` — per-block bitmaps
    OR-folded, broadcast via ``ray.put``); the lineitem scan probes it
    per batch and collapses survivors to per-(orderkey, returnflag)
    partials BEFORE the exchange, so ~80 % of the big side's rows
    never enter the shuffle and the rest enter pre-aggregated. The
    ~0.8 % Bloom false positives are removed by the exact
    ``hash_join(left semi)`` the survivors ride — the filter changes
    BYTES MOVED, never the answer (contrast q3_shipping's exact
    sorted-key runtime filter, which pays a barrier to materialize the
    build side; the Bloom build streams and never blocks the probe
    scan's launch). Output: ``(l_returnflag, n_items, sum_qty)``."""

    def order_keys(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("o_orderpriority"), priority)
        return pa.table({"l_orderkey": t.filter(m).column("o_orderkey")})

    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        order_keys, batch_format="pyarrow"
    )
    orders = orders.materialize()  # used twice: bloom build + verify join
    bloom_ref = build_bloom(orders, "l_orderkey")

    def li_partial(t: pa.Table) -> pa.Table:
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "l_returnflag": t.column("l_returnflag"),
                    "qty": pa.array(qty, pa.int64()),
                }
            )
            .group_by(["l_orderkey", "l_returnflag"])
            .aggregate([("qty", "sum"), ("qty", "count")])
        )
        return pa.table(
            {
                "l_orderkey": g.column("l_orderkey"),
                "l_returnflag": g.column("l_returnflag"),
                "qty": g.column("qty_sum"),
                "n": pc.cast(g.column("qty_count"), pa.int64()),
            }
        )

    lineitem = bloom_prune(
        read_table(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_quantity"]),
        "l_orderkey",
        bloom_ref,
    ).map_batches(li_partial, batch_format="pyarrow")

    verified = hash_join(
        lineitem,
        orders,
        key="l_orderkey",
        num_buckets=num_buckets,
        join_type="left semi",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_returnflag", pa.string()),
                ("qty", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("l_orderkey", pa.int64())]),
    )
    return (
        verified.map_batches(
            lambda t: t.select(["l_returnflag", "qty", "n"]), batch_format="pyarrow"
        )
        .groupby("l_returnflag")
        .aggregate(Sum("n", alias_name="n_items"), Sum("qty", alias_name="sum_qty"))
    )


def bloom_semi_join_oracle_sql(priority: str = "1-URGENT") -> str:
    """DuckDB twin — the Bloom filter is invisible to the answer (it
    only prunes; the exact semi-join decides), so the oracle is the
    plain semi-join aggregate."""
    return f"""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                             WHERE o_orderpriority = '{priority}')
        GROUP BY l_returnflag
    """
