"""Range layout: build-once sorted shards + zone-map pruned range scans
match a full-scan oracle while reading a minority of shards."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa

from wbot_ray.sources.range_layout import (
    LAST_SCAN_STATS,
    build_range_layout,
    range_scan,
)

SF = "/root/testdata/sf0.001"


class TestRangeLayout:
    def _build(self, tmp_path, ray_session):
        import ray.data

        from wbot_ray.pipelines.common import cents, read_table

        def prep(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "o_orderkey": b.column("o_orderkey"),
                    "price_cents": cents(b.column("o_totalprice")),
                }
            )

        ds = read_table(SF, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
            prep, batch_format="pyarrow"
        )
        out = str(tmp_path / "layout")
        manifest = build_range_layout(ds, "price_cents", out)
        return out, manifest

    def test_scan_matches_full_filter_and_prunes(self, tmp_path, ray_session):
        out, manifest = self._build(tmp_path, ray_session)
        assert len(manifest["shards"]) > 1  # multiple zones to prune
        # zones are disjoint-ordered (sorted layout invariant)
        for a, b in zip(manifest["shards"], manifest["shards"][1:]):
            assert a["key_max"] <= b["key_min"]

        lo, hi = 5_000_00, 20_000_00  # $5k..$20k in cents
        got = range_scan(out, lo, hi).take_all()
        con = duckdb.connect()
        want = con.execute(
            f"""SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS pc
                FROM read_parquet('{SF}/orders.parquet')
                WHERE pc >= {lo} AND pc < {hi}"""
        ).fetchall()
        assert sorted((r["o_orderkey"], r["price_cents"]) for r in got) == sorted(want)
        assert 0 < LAST_SCAN_STATS["shards_read"] < LAST_SCAN_STATS["shards_total"]
        assert LAST_SCAN_STATS["rows_read"] < LAST_SCAN_STATS["rows_total"]

    def test_empty_range_reads_nothing(self, tmp_path, ray_session):
        out, _ = self._build(tmp_path, ray_session)
        ds = range_scan(out, -10, -1)
        assert LAST_SCAN_STATS["shards_read"] == 0
        assert ds.count() == 0
