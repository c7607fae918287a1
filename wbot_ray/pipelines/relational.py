"""Relational analytics over the TPC-H-ish tables — the groupby /
broadcast-join / window / top-k patterns the engine reuses everywhere.

Joins here are **broadcast hash joins**: the small side (customer /
nation / region dimension tables) is ``ray.put`` once and read inside
every ``map_batches`` task — no all-to-all shuffle of the fact table.
Distinct counts are two-level groupbys (pre-aggregate on the compound
key, then count), never driver-side sets.

Money sums are exact int64 cents (see ``pipelines.common``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Max, Min, Sum

from wbot_ray.pipelines.common import cents, read_table

__all__ = [
    "q1_pricing",
    "cust_order_stats",
    "events_hourly",
    "events_sliding",
    "daily_active_users",
    "approx_distinct_users",
    "hll_estimate",
    "topk_users",
    "group_topn",
    "price_quantiles",
    "sessionize",
    "asof_prior_event",
    "events_anomaly",
    "window_pairs",
    "funnel_steps",
    "region_acctbal",
    "price_band_join",
    "retention_cohorts",
    "retention_cohorts_oracle_sql",
    "table_profile",
    "table_profile_oracle_sql",
    "churned_users",
    "props_by_type",
    "user_running_value",
    "events_pivot",
    "orders_cube",
    "user_day_share",
    "price_range_scan",
    "PRICE_BANDS_LO_CENTS",
    "EVENT_TYPES",
    "late_events",
    "late_events_oracle_sql",
]

# Non-uniform price-band lower bounds (cents) — the range-join dimension.
# Upper bound of band i is the next lower bound; the last band is open.
PRICE_BANDS_LO_CENTS = (
    0,
    500_000,  # $5k
    1_000_000,  # $10k
    2_000_000,  # $20k
    3_500_000,  # $35k
    5_500_000,  # $55k
    8_000_000,  # $80k
)


def price_band_join(sf_dir: str):
    """Broadcast RANGE join: assign every lineitem to the price band
    whose ``[lo, hi)`` interval contains its extended price, then
    aggregate per band — the non-equi-join pattern for joining a fact
    table against an interval dimension (rate cards, SLA tiers, size
    buckets).

    Ray shape: the interval dimension is tiny and sorted, so the join is
    a per-batch ``np.searchsorted`` against the broadcast bound array —
    a vectorized binary search, no shuffle of the fact side at all (the
    generalization of the broadcast hash join to ranges; works for any
    non-overlapping interval set). Per-batch partials pre-combine before
    the |bands|-key groupby, so the exchange carries O(batches × bands)
    rows at any corpus size."""
    bounds = np.asarray(PRICE_BANDS_LO_CENTS, dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        c = np.asarray(cents(batch.column("l_extendedprice")), dtype=np.int64)
        band = np.searchsorted(bounds, c, side="right") - 1
        t = pa.table(
            {"band": pa.array(band, pa.int64()), "c": pa.array(c, pa.int64())}
        )
        g = t.group_by("band").aggregate([("c", "sum"), ("c", "count")])
        return pa.table(
            {
                "band": g.column("band"),
                "sum_c": g.column("c_sum"),
                "n": g.column("c_count"),
            }
        )

    agg = (
        read_table(sf_dir, "lineitem", ["l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("band")
        .aggregate(
            Sum("n", alias_name="n_items"),
            Sum("sum_c", alias_name="sum_price_cents"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "band": t.column("band"),
                "lo_cents": pa.array(bounds[band], pa.int64()),
                "n_items": t.column("n_items"),
                "sum_price_cents": t.column("sum_price_cents"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q1_pricing(sf_dir: str):
    """TPC-H-Q1-shaped pricing summary: per (returnflag, linestatus)
    row counts, integral quantity sum, price/discounted-price cents."""

    def prep(batch: pa.Table) -> pa.Table:
        qty = np.asarray(batch.column("l_quantity").to_numpy(zero_copy_only=False))
        price_c = cents(batch.column("l_extendedprice"))
        disc_pct = np.asarray(cents(batch.column("l_discount")))  # 0.05 → 5
        # discounted price in integer centi-cents: cents × (100 - pct) —
        # pure int64 math, exact and order-independent under summation
        disc_cc = np.asarray(price_c, dtype=np.int64) * (100 - disc_pct)
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": pa.array(np.floor(qty + 0.5).astype(np.int64), pa.int64()),
                "price_cents": price_c,
                "disc_centi": pa.array(disc_cc, pa.int64()),
            }
        )

    return (
        read_table(
            sf_dir,
            "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Count(alias_name="n_rows"),
            Sum("qty", alias_name="sum_qty"),
            Sum("price_cents", alias_name="sum_price_cents"),
            Sum("disc_centi", alias_name="sum_disc_centi"),
        )
    )


def cust_order_stats(sf_dir: str):
    """orders ⋈ customer (broadcast) → per market segment: order count,
    distinct customer count, total price cents."""
    import pyarrow.parquet as pq
    import os

    # broadcast join: the dimension rides the object store ONCE as an
    # Arrow table (no Python dict — ~10× smaller for big dims and
    # zero-copy to readers); each batch does a vectorized Arrow hash
    # join. Valid while the dimension fits one heap (~100M keys); past
    # that, swap to a two-level groupby on (custkey-hash, segment) —
    # the two-level distinct pattern below already avoids driver state.
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    seg_ref = ray.put(cust)

    def attach(batch: pa.Table) -> pa.Table:
        """Join + PARTIAL per-batch aggregate: the shuffle carries one
        row per (segment, custkey) seen in the batch, never raw orders —
        the combiner-before-groupby pattern that keeps the exchange
        small at any scale."""
        dim = ray.get(seg_ref)
        j = pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "price_cents": cents(batch.column("o_totalprice")),
            }
        ).join(dim, keys="o_custkey", right_keys="c_custkey", join_type="left outer")
        j = pa.table(
            {
                "c_mktsegment": pc.fill_null(j.column("c_mktsegment"), "UNKNOWN"),
                "o_custkey": j.column("o_custkey"),
                "price_cents": j.column("price_cents"),
            }
        )
        part = j.group_by(["c_mktsegment", "o_custkey"]).aggregate(
            [("price_cents", "sum"), ("o_custkey", "count")]
        )
        return pa.table(
            {
                "c_mktsegment": part.column("c_mktsegment"),
                "o_custkey": part.column("o_custkey"),
                "n": part.column("o_custkey_count"),
                "pc": part.column("price_cents_sum"),
            }
        )

    per_cust = (
        read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(attach, batch_format="pyarrow")
        .groupby(["c_mktsegment", "o_custkey"])
        .aggregate(Sum("n", alias_name="n"), Sum("pc", alias_name="pc"))
    )
    return per_cust.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_customers"),
        Sum("n", alias_name="n_orders"),
        Sum("pc", alias_name="sum_price_cents"),
    )


def events_hourly(sf_dir: str):
    """Tumbling 1-hour window per event_type: event count + exact value
    cents (the streaming windowed-aggregate shape: window key derived per
    batch, then a small keyed groupby)."""

    def prep(batch: pa.Table) -> pa.Table:
        hours = pc.strftime(pc.floor_temporal(batch.column("ts"), unit="hour"), format="%Y-%m-%d %H:00:00")
        return pa.table(
            {
                "hour_key": hours,
                "event_type": batch.column("event_type"),
                "value_cents": cents(batch.column("value")),
            }
        )

    return (
        read_table(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["hour_key", "event_type"])
        .aggregate(Count(alias_name="n_events"), Sum("value_cents", alias_name="sum_value_cents"))
    )


def daily_active_users(sf_dir: str):
    """Exact ``COUNT(DISTINCT user_id)`` per day — the two-level
    distinct aggregate. Per-batch, (day, user) pairs collapse to one
    partial row each (map-side combine); ONE keyed groupby on the pair
    key finishes the global dedup; per-batch partials then feed the
    tiny |days|-key rollup. The wide exchange carries distinct pairs
    only — bounded by |users| × |days|, not |events| — and no stage
    ever holds a driver-side set (the anti-pattern this replaces)."""

    def prep(batch: pa.Table) -> pa.Table:
        days = pc.strftime(
            pc.floor_temporal(batch.column("ts"), unit="day"), format="%Y-%m-%d"
        )
        t = pa.table(
            {
                "day_key": days,
                "user_id": batch.column("user_id"),
                "_n": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            }
        )
        g = t.group_by(["day_key", "user_id"]).aggregate([("_n", "sum")])
        # by-name selection — group_by output column ORDER varies across
        # pyarrow versions (keys-first vs aggregates-first)
        return pa.table(
            {
                "day_key": g.column("day_key"),
                "user_id": g.column("user_id"),
                "_n": g.column("_n_sum"),
            }
        )

    pairs = (
        read_table(sf_dir, "events", ["ts", "user_id"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["day_key", "user_id"])
        .aggregate(Sum("_n", alias_name="pair_events"))
    )

    def day_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("day_key").aggregate(
            [("user_id", "count"), ("pair_events", "sum")]
        )
        return pa.table(
            {
                "day_key": g.column("day_key"),
                "users": g.column("user_id_count"),
                "events": g.column("pair_events_sum"),
            }
        )

    return (
        pairs.map_batches(day_partial, batch_format="pyarrow")
        .groupby("day_key")
        .aggregate(
            Sum("users", alias_name="n_active"),
            Sum("events", alias_name="n_events"),
        )
    )


HLL_M = 256  # registers; index = low 8 bits of the 64-bit md5 hash


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized integer bit length of uint64 values (binary-
    search shifts — float log2 would mis-round near powers of two and
    break oracle exactness)."""
    w = w.copy()
    bl = np.zeros(len(w), np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = w >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        w[m] >>= np.uint64(s)
    return bl + (w > 0)


def approx_distinct_users(sf_dir: str):
    """HyperLogLog registers over ``user_id`` — the SKETCH path next to
    ``daily_active_users``' exact two-level distinct. The exact pair
    exchange carries |distinct| rows; this carries ≤ ``HLL_M`` rows per
    batch at ANY cardinality, and registers merge by max (the classic
    mergeable sketch — same partial/merge shape as the metrics
    sidecars).

    Output = the registers themselves: ``(register_idx, max_rho)``,
    empty registers absent. Hash = ``md5_lower64(str(user_id))`` with
    ``idx = h & (m-1)``, ``rho = 57 − bitlen(h >> 8)`` — all integer
    and md5-derived, so the DuckDB oracle recomputes every register
    value-exactly. The float estimator (with small-range linear
    counting) is ``hll_estimate``, pytest-pinned for accuracy."""
    from wbot_ray.pipelines.common import md5_lower64

    def prep(batch: pa.Table) -> pa.Table:
        uid = np.unique(batch.column("user_id").to_numpy(zero_copy_only=False))
        h = np.fromiter(
            (md5_lower64(str(int(u))) for u in uid), dtype=np.uint64, count=len(uid)
        )
        idx = (h & np.uint64(HLL_M - 1)).astype(np.int64)
        rho = 57 - _bitlen_u64(h >> np.uint64(8))
        regs = np.zeros(HLL_M, np.int64)
        np.maximum.at(regs, idx, rho)
        nz = np.nonzero(regs)[0]
        return pa.table(
            {
                "register_idx": pa.array(nz, pa.int64()),
                "rho": pa.array(regs[nz], pa.int64()),
            }
        )

    return (
        read_table(sf_dir, "events", ["user_id"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("register_idx")
        .aggregate(Max("rho", alias_name="max_rho"))
    )


def hll_estimate(sf_dir: str) -> int:
    """Cardinality estimate from the ``approx_distinct_users`` registers
    (Flajolet et al. 2007): raw harmonic-mean estimate in exact bigint
    math, linear counting when the sketch is in the small-range regime."""
    import math

    regs = {r["register_idx"]: r["max_rho"] for r in approx_distinct_users(sf_dir).take_all()}
    m = HLL_M
    # S = sum over ALL m registers of 2^(64 - rho); empty register rho=0
    s = sum(1 << (64 - regs.get(i, 0)) for i in range(m))
    # alpha_m = 0.7213 / (1 + 1.079/m) as an exact rational
    raw = (7213 * m * m * m * (1 << 64)) // ((10000 * m + 10790) * s)
    zeros = m - len(regs)
    if raw <= 5 * m // 2 and zeros:
        return round(m * math.log(m / zeros))
    return int(raw)


def events_sliding(sf_dir: str, window_min: int = 60, slide_min: int = 15):
    """Sliding-window aggregate: per (window_start, event_type) count +
    exact value cents, windows of ``window_min`` minutes sliding every
    ``slide_min``. The streaming shape: each event is EXPLODED per batch
    into the ``window/slide`` windows covering it (here 4 rows/event of
    3 slim columns), then one small keyed groupby — no sort, no
    cross-batch state."""
    win_us = window_min * 60 * 1_000_000
    slide_us = slide_min * 60 * 1_000_000
    per_event = win_us // slide_us

    def explode(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        vals = np.asarray(cents(batch.column("value")))
        types = batch.column("event_type").to_pylist()
        # window starts covering ts: every slide-aligned start in
        # (ts - window, ts]
        last_start = (ts // slide_us) * slide_us
        starts = last_start[:, None] - np.arange(per_event)[None, :] * slide_us
        n = len(ts)
        return pa.table(
            {
                "window_start_us": pa.array(starts.reshape(-1), pa.int64()),
                "event_type": pa.array(
                    [t for t in types for _ in range(per_event)], pa.string()
                ),
                "value_cents": pa.array(np.repeat(vals, per_event), pa.int64()),
            }
        )

    return (
        read_table(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["window_start_us", "event_type"])
        .aggregate(Count(alias_name="n_events"), Sum("value_cents", alias_name="sum_value_cents"))
    )


def topk_users(sf_dir: str, k: int = 10):
    """Top-k users by event count (ties → smaller user_id), with dense
    rank. Groupby-agg shuffle, then per-block top-k + a ≤ k·blocks-row
    driver merge — no distributed sort of the full per-user aggregate
    (a full sort is an extra all-to-all for k rows of output)."""

    def block_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        n = np.asarray(b.column("n_events").to_pylist(), dtype=np.int64)
        uid = np.asarray(b.column("user_id").to_pylist(), dtype=np.int64)
        return b.take(pa.array(np.lexsort((uid, -n))[:k]))

    agg = (
        read_table(sf_dir, "events", ["user_id", "value"])
        .map_batches(
            lambda b: pa.table(
                {"user_id": b.column("user_id"), "value_cents": cents(b.column("value"))}
            ),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .aggregate(Count(alias_name="n_events"), Sum("value_cents", alias_name="sum_value_cents"))
        .map_batches(block_topk, batch_format="pyarrow")
    )
    cand = pa.Table.from_pylist(agg.take_all())  # ≤ k × blocks rows
    n = np.asarray(cand.column("n_events").to_pylist(), dtype=np.int64)
    uid = np.asarray(cand.column("user_id").to_pylist(), dtype=np.int64)
    t = cand.take(pa.array(np.lexsort((uid, -n))[: min(k, cand.num_rows)]))
    t = t.select(["user_id", "n_events", "sum_value_cents"])
    return t.append_column("rank", pa.array(range(1, t.num_rows + 1), pa.int64()))


def _topn_per_key(keys: np.ndarray, prio: np.ndarray, tiebreak: np.ndarray, n: int) -> np.ndarray:
    """Indices of the top-``n`` rows per key, ordered (key, -prio,
    tiebreak). Vectorized: one lexsort + a run-length rank — no Python
    loop over keys."""
    order = np.lexsort((tiebreak, -prio, keys))
    k_sorted = keys[order]
    # rank within key run: position - start-of-run position
    is_start = np.r_[True, k_sorted[1:] != k_sorted[:-1]]
    run_start = np.maximum.accumulate(np.where(is_start, np.arange(len(order)), 0))
    rank = np.arange(len(order)) - run_start
    return order[rank < n]


def group_topn(sf_dir: str, n: int = 3):
    """Top-``n`` orders per customer by price (ties → smaller orderkey),
    with per-customer rank — the grouped-window / row_number operator.

    Ray shape: a per-BATCH partial top-n first (each batch keeps ≤ n rows
    per custkey it sees), so the shuffle carries at most n rows per
    (batch, key) instead of every order; then ``groupby(custkey).
    map_groups`` finishes the top-n and assigns ranks. Correct because
    a row outside its batch's per-key top-n can never be in the global
    top-n. At 100 TB both stages are bounded: the exchange carries
    ≤ n·|keys-per-batch| slim rows and each final group is ≤ n·#blocks."""

    def prep(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "o_orderkey": batch.column("o_orderkey"),
                "price_cents": cents(batch.column("o_totalprice")),
            }
        )
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        pcents = t.column("price_cents").to_numpy(zero_copy_only=False)
        return t.take(pa.array(np.sort(_topn_per_key(ck, pcents, ok, n))))

    def finish(group: pa.Table) -> pa.Table:
        ck = np.asarray(group.column("o_custkey").to_pylist(), dtype=np.int64)
        ok = np.asarray(group.column("o_orderkey").to_pylist(), dtype=np.int64)
        pcents = np.asarray(group.column("price_cents").to_pylist(), dtype=np.int64)
        keep = _topn_per_key(ck, pcents, ok, n)  # already (key,-prio,tie) ordered
        return pa.table(
            {
                "o_custkey": pa.array(ck[keep], pa.int64()),
                "o_orderkey": pa.array(ok[keep], pa.int64()),
                "price_cents": pa.array(pcents[keep], pa.int64()),
                "rn": pa.array(np.arange(1, len(keep) + 1, dtype=np.int64), pa.int64()),
            }
        )

    return (
        read_table(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("o_custkey")
        .map_groups(finish, batch_format="pyarrow")
    )


def price_quantiles(sf_dir: str, ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)):
    """EXACT distributed percentiles of order price per priority —
    the counting-refine shape, not a sort: per-batch value-count
    pre-aggregation, a small ``groupby((priority, value))`` exchange
    (bounded by |distinct values|, not |rows|), then a per-priority
    cumulative scan over the tiny (value, count) histogram.

    Matches DuckDB ``quantile_disc`` exactly: the k-th smallest with
    k = ceil(p·n) (both engines evaluate p·n in IEEE double, so the
    ceil agrees bit-for-bit)."""
    import math

    def prep(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderpriority": batch.column("o_orderpriority"),
                "price_cents": cents(batch.column("o_totalprice")),
            }
        )
        part = t.group_by(["o_orderpriority", "price_cents"]).aggregate(
            [("price_cents", "count")]
        )
        return pa.table(
            {
                "o_orderpriority": part.column("o_orderpriority"),
                "price_cents": part.column("price_cents"),
                "n": pc.cast(part.column("price_cents_count"), pa.int64()),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        prio = group.column("o_orderpriority")[0].as_py()
        vals = np.asarray(group.column("price_cents").to_pylist(), dtype=np.int64)
        cnts = np.asarray(group.column("n").to_pylist(), dtype=np.int64)
        order = np.argsort(vals, kind="stable")
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        out = {"o_orderpriority": pa.array([prio], pa.string()),
               "n_orders": pa.array([n], pa.int64())}
        for p in ps:
            k = math.ceil(p * n)  # same IEEE double product as DuckDB
            v = int(vals[np.searchsorted(cum, k, side="left")])
            out[f"p{round(p * 100)}_cents"] = pa.array([v], pa.int64())
        return pa.table(out)

    return (
        read_table(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["o_orderpriority", "price_cents"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("o_orderpriority")
        .map_groups(finish, batch_format="pyarrow")
    )


def _orders_finest(sf_dir: str):
    """Shared base of the grouping-set family (ROLLUP / CUBE): one scan
    of orders aggregated at the finest (priority, year) granularity,
    MATERIALIZED — it is a few dozen rows, and every coarser grouping
    set re-aggregates this output. Without the materialize each union
    branch would re-execute the scan (Ray Data does no common-subplan
    elimination across union inputs), silently multiplying the read by
    the number of levels."""

    def prep(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderpriority": batch.column("o_orderpriority"),
                "o_year": pc.cast(pc.year(batch.column("o_orderdate")), pa.string()),
                "price_cents": cents(batch.column("o_totalprice")),
            }
        )
        part = t.group_by(["o_orderpriority", "o_year"]).aggregate(
            [("price_cents", "sum"), ("price_cents", "count")]
        )
        return pa.table(
            {
                "o_orderpriority": part.column("o_orderpriority"),
                "o_year": part.column("o_year"),
                "sum_price_cents": pc.cast(part.column("price_cents_sum"), pa.int64()),
                "n_orders": pc.cast(part.column("price_cents_count"), pa.int64()),
            }
        )

    return (
        read_table(sf_dir, "orders", ["o_orderpriority", "o_orderdate", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_year"])
        .aggregate(
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )


_GROUPING_COLS = ["o_orderpriority", "o_year", "sum_price_cents", "n_orders"]


def _local_level(finest: pa.Table, mask_cols: tuple[str, ...]) -> pa.Table:
    """One coarser grouping set, computed locally from the finest level
    (dozens of rows): mask the rolled-up key columns to 'ALL', re-sum."""
    t = finest
    for c in mask_cols:
        t = t.set_column(
            t.schema.get_field_index(c), c, pa.array(["ALL"] * len(t), pa.string())
        )
    g = t.group_by(["o_orderpriority", "o_year"]).aggregate(
        [("sum_price_cents", "sum"), ("n_orders", "sum")]
    )
    return pa.table(
        {
            "o_orderpriority": g.column("o_orderpriority"),
            "o_year": g.column("o_year"),
            "sum_price_cents": g.column("sum_price_cents_sum"),
            "n_orders": g.column("n_orders_sum"),
        }
    )


def _grouping_sets(sf_dir: str, sets: tuple[tuple[str, ...], ...]) -> pa.Table:
    """Shared CASCADE for the grouping-set family: ONE distributed scan
    + keyed exchange produces the finest (priority, year) level — whose
    cardinality is bounded by the grouping DOMAIN (|priorities|·|years|),
    not by the data — then every coarser set is a local re-aggregation
    of those few dozen rows on the driver (the ``topk_users`` tiny-merge
    rule: a full exchange per grouping set would pay ~2 s of all-to-all
    latency each for rows that fit in one cache line). At 100 TB the one
    distributed exchange still carries only per-batch partials."""
    finest = pa.Table.from_pylist(_orders_finest(sf_dir).take_all())
    finest = finest.select(_GROUPING_COLS)
    levels = [finest] + [_local_level(finest, s) for s in sets]
    return pa.concat_tables(levels).sort_by(
        [("o_orderpriority", "ascending"), ("o_year", "ascending")]
    )


def orders_rollup(sf_dir: str):
    """Multi-level ROLLUP aggregate — (priority, year) → (priority, ALL)
    → (ALL, ALL) — as a CASCADE: the big table is read and aggregated
    ONCE at the finest granularity (per-batch partial group-sums, one
    small keyed exchange bounded by |priorities|·|years|), and every
    coarser level re-aggregates the previous level's tiny OUTPUT, not
    the input. That is the only rollup shape that works at 100 TB: the
    naive plan (one full pass / shuffle per grouping set) multiplies
    the scan by the number of levels; the cascade pays one scan plus
    driver-local re-sums over a few dozen rows. Exact int64 cents.

    Oracle = DuckDB ``GROUP BY ROLLUP`` with 'ALL' sentinel labels.
    """
    return _grouping_sets(sf_dir, (("o_year",), ("o_year", "o_orderpriority")))


def orders_cube(sf_dir: str):
    """Full CUBE over (priority, year) — the rollup's grouping sets plus
    the (ALL, year) marginal. Same cascade economics: each extra set is
    another local re-aggregation of the finest output (dozens of rows),
    NOT another scan or shuffle of orders.

    Oracle = DuckDB ``GROUP BY CUBE`` with 'ALL' sentinel labels."""
    return _grouping_sets(
        sf_dir,
        (("o_year",), ("o_orderpriority",), ("o_year", "o_orderpriority")),
    )


def urgent_orders_by_year(sf_dir: str, priority: str = "1-URGENT"):
    """Predicate-PUSHDOWN read: the selective filter is handed to the
    parquet scanner (``read_parquet(filter=...)``), not applied after
    the read — row groups whose column statistics exclude the predicate
    are skipped at storage, and surviving batches arrive pre-filtered,
    so only ~1/5 of the table's bytes ever enter the object store. The
    filter column itself isn't even projected (scanner filters on
    non-projected columns). This is the read-side half of "prune at the
    read": ``columns=`` prunes fields, ``filter=`` prunes row groups —
    at 100 TB the difference between scanning a shelf and a warehouse.

    The aggregation itself is the standard per-batch partial + tiny
    keyed exchange (bounded by |years|)."""
    import os

    def prep(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_year": pc.cast(pc.year(batch.column("o_orderdate")), pa.string()),
                "price_cents": cents(batch.column("o_totalprice")),
            }
        )
        part = t.group_by("o_year").aggregate(
            [("price_cents", "sum"), ("price_cents", "count")]
        )
        return pa.table(
            {
                "o_year": part.column("o_year"),
                "sum_price_cents": pc.cast(part.column("price_cents_sum"), pa.int64()),
                "n_orders": pc.cast(part.column("price_cents_count"), pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderdate", "o_totalprice"],
            filter=(pc.field("o_orderpriority") == priority),
        )
        .map_batches(prep, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Stateful streaming-window op: split each user's event stream into
    sessions at inactivity gaps > ``gap_minutes``. The canonical Ray-Data
    shape for per-key ordered state: ``groupby(user_id).map_groups`` with
    an in-group sort — each task owns one user's full (ordered) stream,
    so the session counter is plain local state; the shuffle carries only
    (user_id, ts, value_cents) rows."""
    gap_us = gap_minutes * 60 * 1_000_000

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts_us": pc.cast(batch.column("ts"), pa.int64()),
                "value_cents": cents(batch.column("value")),
            }
        )

    def user_sessions(group: pa.Table) -> pa.Table:
        uid = int(group.column("user_id")[0].as_py())
        order = np.argsort(np.asarray(group.column("ts_us").to_pylist(), dtype=np.int64), kind="stable")
        ts = np.asarray(group.column("ts_us").to_pylist(), dtype=np.int64)[order]
        val = np.asarray(group.column("value_cents").to_pylist(), dtype=np.int64)[order]
        new_session = np.empty(len(ts), dtype=bool)
        new_session[0] = True
        if len(ts) > 1:
            new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new_session)  # 1-based session ordinal per user
        out = {"user_id": [], "session_id": [], "n_events": [], "sum_value_cents": [],
               "duration_us": []}
        for s in range(1, int(sid[-1]) + 1):
            m = sid == s
            out["user_id"].append(uid)
            out["session_id"].append(s)
            out["n_events"].append(int(m.sum()))
            out["sum_value_cents"].append(int(val[m].sum()))
            out["duration_us"].append(int(ts[m].max() - ts[m].min()))
        return pa.table(
            {
                "user_id": pa.array(out["user_id"], pa.int64()),
                "session_id": pa.array(out["session_id"], pa.int64()),
                "n_events": pa.array(out["n_events"], pa.int64()),
                "sum_value_cents": pa.array(out["sum_value_cents"], pa.int64()),
                "duration_us": pa.array(out["duration_us"], pa.int64()),
            }
        )

    return (
        read_table(sf_dir, "events", ["user_id", "ts", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(user_sessions, batch_format="pyarrow")
    )


def asof_prior_event(
    sf_dir: str, left_type: str = "purchase", right_type: str = "click"
):
    """As-of join (an operator Ray Data lacks natively): each
    ``left_type`` event is matched to the same user's most recent
    ``right_type`` event at-or-before it (attribution join). Inner
    semantics — lefts with no prior right are dropped, exactly like a
    SQL ``ASOF JOIN``.

    Ray shape: ``groupby(user_id).map_groups`` with an in-group sort +
    ``np.searchsorted`` merge scan — each task owns one user's full
    ordered stream, so the join is local state; the shuffle carries only
    the slim (user, kind, id, ts) rows. Partitioning assumption: one
    user's events fit one task (same as ``sessionize``); salt by time
    range if a user's stream outgrows a worker.

    Determinism: rights sharing a timestamp are pre-reduced to the max
    event_id (both engines apply the identical rule, so the as-of pick
    is unique)."""

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.or_(
            pc.equal(batch.column("event_type"), left_type),
            pc.equal(batch.column("event_type"), right_type),
        )
        t = batch.filter(mask)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "is_left": pc.equal(t.column("event_type"), left_type),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
            }
        )

    OUT = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ts_us", pa.int64()),
            ("click_event_id", pa.int64()),
            ("click_ts_us", pa.int64()),
            ("gap_us", pa.int64()),
        ]
    )

    def join_group(group: pa.Table) -> pa.Table:
        uid = int(group.column("user_id")[0].as_py())
        is_left = np.asarray(group.column("is_left").to_pylist(), dtype=bool)
        ids = np.asarray(group.column("event_id").to_pylist(), dtype=np.int64)
        ts = np.asarray(group.column("ts_us").to_pylist(), dtype=np.int64)
        l_ids, l_ts = ids[is_left], ts[is_left]
        r_ids, r_ts = ids[~is_left], ts[~is_left]
        if len(l_ids) == 0 or len(r_ids) == 0:
            return OUT.empty_table()
        # dedupe rights per ts (keep max event_id), then time-sort
        order = np.lexsort((r_ids, r_ts))
        r_ids, r_ts = r_ids[order], r_ts[order]
        last_of_ts = np.r_[r_ts[1:] != r_ts[:-1], True]
        r_ids, r_ts = r_ids[last_of_ts], r_ts[last_of_ts]
        idx = np.searchsorted(r_ts, l_ts, side="right") - 1
        m = idx >= 0
        l_ids, l_ts, idx = l_ids[m], l_ts[m], idx[m]
        return pa.table(
            {
                "event_id": pa.array(l_ids, pa.int64()),
                "user_id": pa.array([uid] * len(l_ids), pa.int64()),
                "ts_us": pa.array(l_ts, pa.int64()),
                "click_event_id": pa.array(r_ids[idx], pa.int64()),
                "click_ts_us": pa.array(r_ts[idx], pa.int64()),
                "gap_us": pa.array(l_ts - r_ts[idx], pa.int64()),
            },
            schema=OUT,
        )

    return (
        read_table(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(join_group, batch_format="pyarrow")
    )


def window_pairs(
    sf_dir: str,
    left_type: str = "click",
    right_type: str = "purchase",
    window_min: int = 30,
):
    """Banded interval SELF-JOIN (the stream-stream join): every
    (``left_type``, ``right_type``) event pair of the same user within
    ±``window_min`` minutes — the both-directions generalization of
    ``asof_prior_event`` (which keeps only the most recent prior match).

    Ray shape — time-bucketed co-partition with NEIGHBOR REPLICATION:
    key = ``(user, ts // window)``. A qualifying pair's timestamps
    differ by ≤ window, so their buckets differ by ≤ 1; every left row
    is replicated into buckets (b−1, b, b+1) while right rows stay in
    their own bucket — each pair meets in exactly ONE task (the right
    row's bucket), so no post-dedup pass is needed. The exchange
    carries ≤ 3·|lefts| + |rights| slim integer rows, and the time
    component of the key spreads even a pathological user's stream
    across reducers (the skew fix ``sessionize``'s per-user grouping
    does not have)."""
    win_us = window_min * 60 * 1_000_000

    def prep(batch: pa.Table) -> pa.Table:
        kinds = batch.column("event_type")
        keep = pc.or_(pc.equal(kinds, left_type), pc.equal(kinds, right_type))
        t = batch.filter(keep)
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        is_left = pc.equal(t.column("event_type"), left_type).to_numpy(
            zero_copy_only=False
        )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        bucket = ts // win_us
        # rights once; lefts replicated to their bucket and both neighbors
        li = np.nonzero(is_left)[0]
        ri = np.nonzero(~is_left)[0]
        out_u = np.concatenate([uid[ri]] + [uid[li]] * 3)
        out_e = np.concatenate([eid[ri]] + [eid[li]] * 3)
        out_t = np.concatenate([ts[ri]] + [ts[li]] * 3)
        out_b = np.concatenate(
            [bucket[ri], bucket[li] - 1, bucket[li], bucket[li] + 1]
        )
        out_l = np.concatenate(
            [np.zeros(len(ri), bool), np.ones(3 * len(li), bool)]
        )
        return pa.table(
            {
                "user_id": pa.array(out_u, pa.int64()),
                "bucket": pa.array(out_b, pa.int64()),
                "is_left": pa.array(out_l, pa.bool_()),
                "event_id": pa.array(out_e, pa.int64()),
                "ts_us": pa.array(out_t, pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("left_event", pa.int64()),
            ("right_event", pa.int64()),
            ("delta_us", pa.int64()),
        ]
    )

    def pairs(group: pa.Table) -> pa.Table:
        is_l = group.column("is_left").to_numpy(zero_copy_only=False)
        ts = group.column("ts_us").to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        lt, le = ts[is_l], eid[is_l]
        rt, re_, ru = ts[~is_l], eid[~is_l], uid[~is_l]
        if len(lt) == 0 or len(rt) == 0:
            return out_schema.empty_table()
        order = np.argsort(lt, kind="stable")
        lt, le = lt[order], le[order]
        lo = np.searchsorted(lt, rt - win_us, side="left")
        hi = np.searchsorted(lt, rt + win_us, side="right")
        n_per = hi - lo
        if n_per.sum() == 0:
            return out_schema.empty_table()
        r_idx = np.repeat(np.arange(len(rt)), n_per)
        l_idx = np.concatenate([np.arange(a, b) for a, b in zip(lo, hi) if b > a])
        return pa.table(
            {
                "user_id": pa.array(ru[r_idx], pa.int64()),
                "left_event": pa.array(le[l_idx], pa.int64()),
                "right_event": pa.array(re_[r_idx], pa.int64()),
                "delta_us": pa.array(rt[r_idx] - lt[l_idx], pa.int64()),
            },
            schema=out_schema,
        )

    import ray.data as rd

    joined = (
        read_table(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["user_id", "bucket"])
        .map_groups(pairs, batch_format="pyarrow")
    )
    # typed empty union: an all-empty result must keep the schema
    return rd.from_arrow(out_schema.empty_table()).union(joined)


def events_anomaly(
    sf_dir: str,
    window_h: int = 24,
    num: int = 23,
    den: int = 20,
    min_prev: int = 12,
    bucket_hours: int = 240,
):
    """Trailing-window BURST DETECTION over the event stream — the
    time-series anomaly shape: flag every hour whose event count
    exceeds ``num/den`` × the mean over its PRESENT trailing
    ``window_h``-hour slots (≥ ``min_prev`` of them required, so the
    series' warm-up hours never alert). Pure integer
    cross-multiplication — ``n · nprev · den > num · trail_sum`` — so
    both engines apply the identical rule with no float mean.

    Ray shape (scale-honest end to end):

    1. per-batch partial hour counts (map-side combine — the exchange
       carries ≤ |hours-in-batch| rows, never events);
    2. ONE tiny keyed groupby finishes the hourly series (cardinality
       = |hours|, bounded by the time DOMAIN, not data volume);
    3. the trailing window runs distributed via the ``window_pairs``
       neighbor-replication pattern: hourly rows are co-partitioned on
       a coarse ``bucket_hours`` time bucket, and a row within
       ``window_h`` hours of the next bucket's start is replicated
       there as CONTEXT — every flagged hour sees its full trailing
       window in exactly one task, and no per-hour row ever crosses
       the driver. Inside a task the window sums are O(span) numpy
       cumsums over a dense hour-indexed array.

    Equivalent SQL: ``SUM/COUNT OVER (ORDER BY hour RANGE BETWEEN
    INTERVAL 24 HOURS PRECEDING AND INTERVAL 1 HOUR PRECEDING)`` (the
    time-based frame — identical to the rows-based one on a dense
    series but well-defined under gaps, which is what the bucketed
    co-partition computes).
    """
    assert window_h < bucket_hours
    us_per_hour = 3_600 * 1_000_000

    def hour_partials(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        eh, n = np.unique(ts // us_per_hour, return_counts=True)
        return pa.table(
            {
                "epoch_hour": pa.array(eh, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    def replicate(batch: pa.Table) -> pa.Table:
        eh = batch.column("epoch_hour").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        b = eh // bucket_hours
        # context copies: rows feeding the NEXT bucket's early hours
        ctx = eh >= (b + 1) * bucket_hours - window_h
        return pa.table(
            {
                "bucket": pa.array(np.concatenate([b, b[ctx] + 1]), pa.int64()),
                "epoch_hour": pa.array(np.concatenate([eh, eh[ctx]]), pa.int64()),
                "n": pa.array(np.concatenate([n, n[ctx]]), pa.int64()),
                "is_self": pa.array(
                    np.concatenate(
                        [np.ones(len(eh), bool), np.zeros(int(ctx.sum()), bool)]
                    ),
                    pa.bool_(),
                ),
            }
        )

    out_schema = pa.schema(
        [("hour_key", pa.string()), ("n_events", pa.int64()), ("trail_sum", pa.int64())]
    )

    def detect(group: pa.Table) -> pa.Table:
        eh = group.column("epoch_hour").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        is_self = group.column("is_self").to_numpy(zero_copy_only=False)
        base = int(eh.min())
        span = int(eh.max()) - base + 1  # ≤ bucket_hours + window_h
        counts = np.zeros(span, np.int64)
        present = np.zeros(span, np.int64)
        counts[eh - base] = n  # each hour appears once (post-groupby)
        present[eh - base] = 1
        ccum = np.concatenate([[0], np.cumsum(counts)])  # ccum[i] = sum counts[:i]
        pcum = np.concatenate([[0], np.cumsum(present)])
        idx = eh[is_self] - base
        # context replication guarantees every globally-present hour in
        # [h - window_h, h) is in this group, so clamping lo to the
        # group base never hides a present trailing slot
        lo = np.maximum(idx - window_h, 0)
        trail = ccum[idx] - ccum[lo]
        nprev = pcum[idx] - pcum[lo]
        n_self = n[is_self]
        flag = (nprev >= min_prev) & (n_self * nprev * den > num * trail)
        if not flag.any():
            return out_schema.empty_table()
        hours = pa.array((eh[is_self][flag]) * us_per_hour, pa.timestamp("us"))
        return pa.table(
            {
                "hour_key": pc.strftime(hours, format="%Y-%m-%d %H:00:00"),
                "n_events": pa.array(n_self[flag], pa.int64()),
                "trail_sum": pa.array(trail[flag], pa.int64()),
            },
            schema=out_schema,
        )

    import ray.data as rd

    flagged = (
        read_table(sf_dir, "events", ["ts"])
        .map_batches(hour_partials, batch_format="pyarrow")
        .groupby("epoch_hour")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(replicate, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(detect, batch_format="pyarrow")
    )
    return rd.from_arrow(out_schema.empty_table()).union(flagged)


def funnel_steps(
    sf_dir: str, steps: tuple[str, ...] = ("signup", "click", "purchase")
):
    """Ordered-subsequence funnel: how far each user progresses through
    ``steps`` where each stage's event must occur AT-OR-AFTER the
    previous stage's first qualifying event (the classic conversion
    funnel — a sequential pattern match, not expressible as independent
    per-stage aggregates).

    Ray shape: filter to the step types at the read (slim integer
    rows), one ``groupby(user_id).map_groups`` — each task owns one
    user's ordered stream and walks the chain with vectorized mins
    (the ``sessionize`` / ``asof_prior_event`` per-user-state family).
    Output: one row per user who completed ≥1 step —
    ``(user_id, steps_completed, t_step1_us .. t_stepN_us)`` with 0 for
    unreached stages (kept integer so the cross-engine comparison never
    round-trips through float)."""
    step_list = list(steps)
    t_cols = [f"t_step{i + 1}_us" for i in range(len(step_list))]
    out_schema = pa.schema(
        [("user_id", pa.int64()), ("steps_completed", pa.int64())]
        + [(c, pa.int64()) for c in t_cols]
    )

    def prep(batch: pa.Table) -> pa.Table:
        kinds = batch.column("event_type")
        mask = pc.is_in(kinds, value_set=pa.array(step_list, pa.string()))
        t = batch.filter(mask)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "kind": t.column("event_type"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
            }
        )

    def funnel(group: pa.Table) -> pa.Table:
        kinds = group.column("kind").to_pylist()
        ts = group.column("ts_us").to_numpy(zero_copy_only=False)
        uid = int(group.column("user_id")[0].as_py())
        frontier = None  # first qualifying time of the previous stage
        reached: list[int] = []
        for step in step_list:
            st = np.array(
                [t for k, t in zip(kinds, ts) if k == step], dtype=np.int64
            )
            if frontier is not None:
                st = st[st >= frontier]
            if len(st) == 0:
                break
            frontier = int(st.min())
            reached.append(frontier)
        if not reached:
            return out_schema.empty_table()
        row: dict = {
            "user_id": [uid],
            "steps_completed": [len(reached)],
        }
        for i, c in enumerate(t_cols):
            row[c] = [reached[i] if i < len(reached) else 0]
        return pa.table(row, schema=out_schema)

    import ray.data as rd

    out = (
        read_table(sf_dir, "events", ["user_id", "event_type", "ts"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(funnel, batch_format="pyarrow")
    )
    return rd.from_arrow(out_schema.empty_table()).union(out)


def region_acctbal(sf_dir: str):
    """customer ⋈ nation ⋈ region (both dims broadcast) → per region:
    customer count + account-balance cents."""
    import pyarrow.parquet as pq
    import os

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    # pre-join the two tiny dims driver-side; broadcast ONE Arrow table
    nat2reg = nation.join(
        region, keys="n_regionkey", right_keys="r_regionkey", join_type="left outer"
    ).select(["n_nationkey", "r_name"])
    ref = ray.put(nat2reg)

    def attach(batch: pa.Table) -> pa.Table:
        dim = ray.get(ref)
        j = pa.table(
            {
                "c_nationkey": batch.column("c_nationkey"),
                "acctbal_cents": cents(batch.column("c_acctbal")),
            }
        ).join(dim, keys="c_nationkey", right_keys="n_nationkey", join_type="left outer")
        return pa.table(
            {
                "r_name": pc.fill_null(j.column("r_name"), "UNKNOWN"),
                "acctbal_cents": j.column("acctbal_cents"),
            }
        )

    return (
        read_table(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
        .map_batches(attach, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_customers"), Sum("acctbal_cents", alias_name="sum_acctbal_cents"))
    )


def churned_users(
    sf_dir: str,
    early: tuple[str, str] = ("2024-01-01", "2024-01-08"),
    late: tuple[str, str] = ("2024-01-30", "2024-01-31"),
):
    """Users active in the ``early`` window but not in the ``late`` one —
    the distributed SET DIFFERENCE (EXCEPT).

    Ray shape: EXCEPT over one table needs no join at all — ONE pruned
    read computes per-batch (user_id, in_early, in_late) indicator
    partials (vectorized window masks + per-batch group-max, bounded by
    |users| per batch), ONE keyed exchange combines them with
    ``Max``, and a stateless filter keeps ``in_early ∧ ¬in_late``.
    At 10^10 events the exchange carries ≤ |users| slim rows total —
    half the read passes and a third of the stage barriers of the
    two-sided anti-join formulation (which ``dedup_keep`` showcases
    where the two sides really are different tables)."""

    def bounds(w: tuple[str, str]):
        return (
            pa.scalar(np.datetime64(w[0], "us"), pa.timestamp("us")),
            pa.scalar(np.datetime64(w[1], "us"), pa.timestamp("us")),
        )

    elo, ehi = bounds(early)
    llo, lhi = bounds(late)

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        t = pa.table(
            {
                "user_id": batch.column("user_id"),
                "in_early": pc.cast(
                    pc.and_(pc.greater_equal(ts, elo), pc.less(ts, ehi)), pa.int64()
                ),
                "in_late": pc.cast(
                    pc.and_(pc.greater_equal(ts, llo), pc.less(ts, lhi)), pa.int64()
                ),
            }
        )
        g = t.group_by("user_id").aggregate([("in_early", "max"), ("in_late", "max")])
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "in_early": g.column("in_early_max"),
                "in_late": g.column("in_late_max"),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(batch.column("in_early"), 1), pc.equal(batch.column("in_late"), 0)
        )
        return pa.table({"user_id": batch.filter(m).column("user_id")})

    return (
        read_table(sf_dir, "events", ["ts", "user_id"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Max("in_early", alias_name="in_early"), Max("in_late", alias_name="in_late")
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def props_by_type(sf_dir: str):
    """Semi-structured extraction: parse the ``props`` JSON column, pull
    the integer field ``k``, and aggregate it per event type — the
    JSON-flattening step every event pipeline has.

    Ray shape: parse + extract + per-batch partial aggregate in ONE
    stateless ``map_batches`` pass (the JSON string column never leaves
    the map stage — only ≤ |event_types| partial rows per batch enter
    the tiny keyed exchange). Min/max/sum/count combine associatively,
    so the two-level aggregate is exact."""
    import json

    def prep(batch: pa.Table) -> pa.Table:
        ks = np.fromiter(
            (json.loads(p)["k"] for p in batch.column("props").to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "k": pa.array(ks, pa.int64()),
                "one": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            }
        )
        g = t.group_by("event_type").aggregate(
            [("k", "sum"), ("k", "min"), ("k", "max"), ("one", "sum")]
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "sum_k": g.column("k_sum"),
                "min_k": g.column("k_min"),
                "max_k": g.column("k_max"),
                "n_events": g.column("one_sum"),
            }
        )

    return (
        read_table(sf_dir, "events", ["event_type", "props"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
        )
    )


def user_running_value(sf_dir: str):
    """Per-user RUNNING TOTAL of event value ordered by time — the
    cumulative-window operator (``SUM() OVER (PARTITION BY user ORDER BY
    ts)``), complementing the gap-window (sessionize), lag-window
    (asof), and sliding-window (events_sliding) shapes.

    Ray shape: one keyed exchange on user_id (``groupby.map_groups``),
    in-group argsort by (ts, event_id), vectorized ``np.cumsum`` on
    exact cents. Hot users are bounded by |events per user|; the
    exchange carries only (user_id, ts, event_id, cents) slim rows."""

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "event_id": batch.column("event_id"),
                "ts_us": pc.cast(batch.column("ts"), pa.int64()),
                "value_cents": cents(batch.column("value")),
            }
        )

    def scan(group: pa.Table) -> pa.Table:
        ts = group.column("ts_us").to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        val = group.column("value_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        run = np.cumsum(val[order])
        return pa.table(
            {
                "user_id": group.column("user_id").take(pa.array(order)),
                "event_id": pa.array(eid[order], pa.int64()),
                "running_cents": pa.array(run, pa.int64()),
            }
        )

    return (
        read_table(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(scan, batch_format="pyarrow")
    )


# The closed event-type vocabulary of the events table — the pivot's
# column set (a pivot needs a fixed output schema; discovering it would
# take a one-time distinct pass, exactly like freq_quality's vocab pass).
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str):
    """PIVOT: daily event counts widened to one column per event type
    (rows = days, columns = n_click … n_view + total) — the
    long-to-wide reshape every analytics stack ships.

    Ray shape: each batch builds one int64 indicator column per type
    (vectorized ``pc.equal`` masks — no Python row loop) and
    pre-combines to ≤ |days-per-batch| partial rows; the keyed exchange
    on day then carries O(batches × days) slim rows, and the final
    groupby sums the indicators. Unknown types count only toward
    ``n_total`` (the pivot's column set is closed by construction)."""

    def prep(batch: pa.Table) -> pa.Table:
        day = pc.strftime(batch.column("ts"), "%Y-%m-%d")
        et = batch.column("event_type")
        cols: dict[str, pa.Array | pa.ChunkedArray] = {"day": day}
        for t in EVENT_TYPES:
            cols[f"n_{t}"] = pc.cast(pc.equal(et, t), pa.int64())
        cols["n_total"] = pa.array(np.ones(batch.num_rows, np.int64), pa.int64())
        t_ = pa.table(cols)
        g = t_.group_by("day").aggregate([(c, "sum") for c in cols if c != "day"])
        return pa.table(
            {"day": g.column("day")}
            | {c: g.column(f"{c}_sum") for c in cols if c != "day"}
        )

    return (
        read_table(sf_dir, "events", ["ts", "event_type"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            *[Sum(f"n_{t}", alias_name=f"n_{t}") for t in EVENT_TYPES],
            Sum("n_total", alias_name="n_total"),
        )
    )


def user_day_share(sf_dir: str):
    """Each event's value as a per-mille share of its user's SAME-DAY
    total — the composite-key join: fact rows ⋈ a (user_id, day)
    aggregate, both sides co-partitioned on the two-column key.

    Ray shape: one pruned read computes the per-(user, day) totals
    (per-batch partials, exchange bounded by |users|·|days|); the slim
    event rows then meet their total through ``hash_join(key=
    ["user_id", "day"])`` — at 10^10 events the totals side is far too
    large to broadcast, so the composite-key co-partition is the only
    exact shape. share_pm = 1000·value∕total in exact integer cents
    (values are strictly positive, so the floor division is total>0
    safe)."""
    from wbot_ray.pipelines.join import hash_join

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "day": pc.strftime(batch.column("ts"), "%Y-%m-%d"),
                "event_id": batch.column("event_id"),
                "value_cents": cents(batch.column("value")),
            }
        )

    events = read_table(sf_dir, "events", ["user_id", "ts", "event_id", "value"]).map_batches(
        prep, batch_format="pyarrow"
    )

    def total_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch.column("user_id"),
                "day": pc.strftime(batch.column("ts"), "%Y-%m-%d"),
                "value_cents": cents(batch.column("value")),
            }
        )
        g = t.group_by(["user_id", "day"]).aggregate([("value_cents", "sum")])
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "day": g.column("day"),
                "tot": g.column("value_cents_sum"),
            }
        )

    totals = (
        read_table(sf_dir, "events", ["user_id", "ts", "value"])
        .map_batches(total_partial, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Sum("tot", alias_name="day_total_cents"))
    )

    def share(batch: pa.Table) -> pa.Table:
        v = batch.column("value_cents").to_numpy(zero_copy_only=False)
        tot = batch.column("day_total_cents").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "day": batch.column("day"),
                "value_cents": batch.column("value_cents"),
                "share_pm": pa.array(1000 * v // tot, pa.int64()),
            }
        )

    # static schemas: the totals side carries a groupby exchange — a
    # schema() probe would execute it an extra time (see join.hash_join)
    return hash_join(
        events,
        totals,
        key=["user_id", "day"],
        num_buckets=64,
        left_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("day", pa.string()),
                ("event_id", pa.int64()),
                ("value_cents", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("day", pa.string()),
                ("day_total_cents", pa.int64()),
            ]
        ),
    ).map_batches(share, batch_format="pyarrow")


def price_range_scan(sf_dir: str, lo: int = 500_000, hi: int = 2_000_000):
    """Orders in a price band served from the RANGE LAYOUT
    (``sources.range_layout``): one-time sorted-shard build (cached by
    content fingerprint, manifest presence = built), then a zone-map
    pruned scan that opens only the shards intersecting
    ``[lo, hi)`` cents — the build-once/scan-many pattern under the
    driver's correctness gate, alongside the hash-bucket (web index),
    centroid-bucket (IVF) and term-bucket (inverted index) layouts.
    The pruned fraction is logged (no silent caps)."""
    import hashlib
    import logging
    import os

    from wbot_ray.sources.range_layout import (
        LAST_SCAN_STATS,
        build_range_layout,
        range_scan,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    fp = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    layout_dir = f"/tmp/wbot_ray_rangelayout/v1/{fp}"
    if not os.path.exists(os.path.join(layout_dir, "_MANIFEST.json")):

        def prep(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "o_orderkey": batch.column("o_orderkey"),
                    "price_cents": cents(batch.column("o_totalprice")),
                }
            )

        build_range_layout(
            read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
                prep, batch_format="pyarrow"
            ),
            "price_cents",
            layout_dir,
        )
    ds = range_scan(layout_dir, lo, hi)
    logging.getLogger("wbot_ray").info(
        "price_range_scan: read %s/%s shards (%s/%s rows)",
        LAST_SCAN_STATS.get("shards_read"),
        LAST_SCAN_STATS.get("shards_total"),
        LAST_SCAN_STATS.get("rows_read"),
        LAST_SCAN_STATS.get("rows_total"),
    )
    return ds


def retention_cohorts(sf_dir: str):
    """Cohort retention triangle — the canonical growth-analytics
    windowed aggregate: users are cohorted by their FIRST active day,
    and every cell ``(cohort_day, age_days)`` counts how many of that
    cohort were active ``age_days`` later. Output one row per non-empty
    cell: ``(cohort_day, age_days, n_users)``.

    Ray shape — two slim exchanges, NO join: per batch, events collapse
    to DISTINCT ``(user_id, epoch_day)`` partial rows (map-side
    combine); ``groupby(user_id).map_groups`` then holds ALL of a
    user's active days in one task, so cohort assignment (min day) and
    the per-day age rows fall out locally — one ``(cohort, age)`` row
    per distinct user-day, which makes the final
    ``groupby(cohort_day, age_days).count`` an exact distinct-user
    count with no second dedup. Exchanges carry ≤ |users|·|days| rows,
    never |events|."""

    def prep(batch: pa.Table) -> pa.Table:
        days = pc.cast(
            pc.cast(pc.floor_temporal(batch.column("ts"), unit="day"), pa.date32()),
            pa.int32(),
        )
        t = pa.table({"user_id": batch.column("user_id"), "epoch_day": days})
        return t.group_by(["user_id", "epoch_day"]).aggregate([])

    def cohort_rows(group: pa.Table) -> pa.Table:
        d = np.unique(group.column("epoch_day").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "cohort_epoch": pa.array(np.full(len(d), d.min()), pa.int32()),
                "age_days": pa.array((d - d.min()).astype(np.int64), pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        day = pc.strftime(
            pc.cast(pc.cast(batch.column("cohort_epoch"), pa.int32()), pa.date32()),
            format="%Y-%m-%d",
        )
        return pa.table(
            {
                "cohort_day": day,
                "age_days": batch.column("age_days"),
                "n_users": pc.cast(batch.column("n_users"), pa.int64()),
            }
        )

    return (
        read_table(sf_dir, "events", ["ts", "user_id"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(cohort_rows, batch_format="pyarrow")
        .groupby(["cohort_epoch", "age_days"])
        .aggregate(Count(alias_name="n_users"))
        .map_batches(finish, batch_format="pyarrow")
    )


def retention_cohorts_oracle_sql() -> str:
    """DuckDB twin: distinct user-days, min-day cohort, one join."""
    return """
        WITH ud AS (
          SELECT DISTINCT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS d
          FROM events
        ),
        c AS (SELECT user_id, MIN(d) AS cohort FROM ud GROUP BY user_id)
        SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_day,
               CAST(ud.d - c.cohort AS BIGINT) AS age_days,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM ud JOIN c USING (user_id)
        GROUP BY 1, 2
    """


PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def table_profile(sf_dir: str):
    """Column-level data profiling over ``lineitem``'s money/quantity
    columns — the Deequ/profiler scan every ingestion pipeline runs
    before training or loading: one row per column with ``(col_name,
    n_rows, n_nulls, min_cents, max_cents, sum_cents)``, all values
    exact int64 cents.

    Ray shape — ONE pruned pass, near-zero exchange: each batch folds
    every profiled column to a single partial row (vectorized Arrow
    min/max/sum over the cents-cast column), so the
    ``groupby(col_name)`` exchange carries ``len(PROFILE_COLS)`` rows
    per batch regardless of table size; the final fold combines
    partials with (sum, sum, min, max, sum)."""

    def partial(batch: pa.Table) -> pa.Table:
        names, n, nn, mn, mx, sm = [], [], [], [], [], []
        for col in PROFILE_COLS:
            c = batch.column(col)
            nulls = c.null_count
            v = cents(c.drop_null()) if len(c) - nulls else pa.array([], pa.int64())
            names.append(col)
            n.append(len(c))
            nn.append(nulls)
            if len(v):
                mn.append(pc.min(v).as_py())
                mx.append(pc.max(v).as_py())
                sm.append(pc.sum(v).as_py())
            else:
                # identity elements — folded away by the final min/max
                mn.append((1 << 63) - 1)
                mx.append(-(1 << 63))
                sm.append(0)
        return pa.table(
            {
                "col_name": pa.array(names, pa.string()),
                "n_rows": pa.array(n, pa.int64()),
                "n_nulls": pa.array(nn, pa.int64()),
                "min_cents": pa.array(mn, pa.int64()),
                "max_cents": pa.array(mx, pa.int64()),
                "sum_cents": pa.array(sm, pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"col_name": batch.column("col_name")}
            | {
                c: pc.cast(batch.column(c), pa.int64())
                for c in ("n_rows", "n_nulls", "min_cents", "max_cents", "sum_cents")
            }
        )

    return (
        read_table(sf_dir, "lineitem", list(PROFILE_COLS))
        .map_batches(partial, batch_format="pyarrow")
        .groupby("col_name")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_nulls", alias_name="n_nulls"),
            Min("min_cents", alias_name="min_cents"),
            Max("max_cents", alias_name="max_cents"),
            Sum("sum_cents", alias_name="sum_cents"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def table_profile_oracle_sql() -> str:
    """DuckDB twin: one UNION ALL arm per profiled column."""
    arms = []
    for col in PROFILE_COLS:
        c = f"CAST(round({col}*100) AS BIGINT)"
        arms.append(
            f"""SELECT '{col}' AS col_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_nulls,
                   CAST(MIN({c}) AS BIGINT) AS min_cents,
                   CAST(MAX({c}) AS BIGINT) AS max_cents,
                   CAST(SUM({c}) AS BIGINT) AS sum_cents
            FROM lineitem"""
        )
    return " UNION ALL ".join(arms)


LATE_ALLOWED_US = 3_600_000_000  # 1 h allowed lateness
LATE_PART_SIZE = 4096


def late_events(
    sf_dir: str,
    lateness_us: int = LATE_ALLOWED_US,
    part_size: int = LATE_PART_SIZE,
):
    """Watermark / late-data audit — the streaming-semantics question
    every event pipeline answers before picking its allowed lateness:
    over the ARRIVAL stream (``event_id`` is the arrival sequence), how
    many events carry a timestamp older than the high-watermark
    (running max event time) minus the allowed lateness? Output:
    ``(event_type, n_events, n_late)``.

    The running max over arrival order is a DISTRIBUTED PREFIX MAX —
    the ``pack_sequences`` prefix-sum shape with max as the monoid:

    1. slim pass: ``(event_id, t, event_type, part = event_id //
       part_size)`` — four int64-ish columns, text never read;
    2. a tiny ``groupby(part).max(t)`` (|parts| rows — metadata-sized
       at any event count) is scanned once driver-side into EXCLUSIVE
       per-part carry maxes and broadcast via ``ray.put``;
    3. ``groupby(part).map_groups``: each partition sorts by event_id,
       takes ``np.maximum.accumulate`` shifted one row, folds in its
       carry, and flags ``t < watermark - lateness``; per-type partials
       then ride one tiny keyed aggregate.

    The arrival-order prefix structure costs one slim exchange +
    bounded per-part work — the event payloads never move. The first
    arrival has no watermark and is never late (SQL: its window max is
    NULL), matching the twin's ``ROWS BETWEEN UNBOUNDED PRECEDING AND
    1 PRECEDING`` frame."""

    def prep(batch: pa.Table) -> pa.Table:
        t = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
                "t": pa.array(t, pa.int64()),
                "part": pc.cast(
                    pc.divide(batch.column("event_id"), part_size), pa.int64()
                ),
            }
        )

    slim = (
        read_table(sf_dir, "events", ["event_id", "ts", "event_type"])
        .map_batches(prep, batch_format="pyarrow")
        .materialize()
    )
    rows = slim.groupby("part").aggregate(Max("t", alias_name="tmax")).take_all()
    carry: dict[int, int] = {}
    acc = None
    for r in sorted(rows, key=lambda r: int(r["part"])):
        carry[int(r["part"])] = acc if acc is not None else -(1 << 62)
        acc = max(acc, int(r["tmax"])) if acc is not None else int(r["tmax"])
    carry_ref = ray.put(carry)

    def flag(group: pa.Table) -> pa.Table:
        carries = ray.get(carry_ref)
        part = int(group.column("part")[0].as_py())
        ids = np.asarray(group.column("event_id").to_pylist(), dtype=np.int64)
        t = np.asarray(group.column("t").to_pylist(), dtype=np.int64)
        types = np.asarray(group.column("event_type").to_pylist(), dtype=object)
        order = np.argsort(ids, kind="stable")
        t, types = t[order], types[order]
        prev = np.empty(len(t), dtype=np.int64)
        prev[0] = carries.get(part, -(1 << 62))
        if len(t) > 1:
            prev[1:] = np.maximum(carries.get(part, -(1 << 62)), np.maximum.accumulate(t[:-1]))
        late = t < prev - lateness_us
        out_t, out_n, out_l = [], [], []
        for et in np.unique(types):
            m = types == et
            out_t.append(str(et))
            out_n.append(int(m.sum()))
            out_l.append(int(late[m].sum()))
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "n_late": pa.array(out_l, pa.int64()),
            }
        )

    return (
        slim.groupby("part")
        .map_groups(flag, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n_events"), Sum("n_late", alias_name="n_late"))
    )


def late_events_oracle_sql(lateness_us: int = LATE_ALLOWED_US) -> str:
    """DuckDB twin: window max over arrival (event_id) order with a
    one-row-back frame — the first arrival's NULL watermark is never
    late."""
    return f"""
        WITH e AS (
          SELECT event_id, event_type, epoch_us(ts) AS t FROM events),
        w AS (
          SELECT event_type, t,
                 MAX(t) OVER (ORDER BY event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS wm
          FROM e)
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN wm IS NOT NULL AND t < wm - {lateness_us}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        FROM w GROUP BY event_type
    """
