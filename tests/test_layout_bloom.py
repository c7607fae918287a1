"""Tests for the data-layout (Z-order) and Bloom-semi-join operators."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wbot_ray.pipelines import join as joinmod
from wbot_ray.pipelines import layout, search


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory, ray_session):
    """A small deterministic sf_dir: documents (mixed langs/lengths),
    orders (two priorities), lineitem (fan-out per order)."""
    rng = np.random.RandomState(11)
    d = tmp_path_factory.mktemp("layoutbloom")

    n_docs = 60
    langs = ["en", "fr", "zh"]
    texts = [
        " ".join(f"t{rng.randint(0, 30)}" for _ in range(rng.randint(3, 12)))
        for _ in range(n_docs)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array([langs[i % 3] for i in range(n_docs)], pa.string()),
                "source": pa.array(["s0"] * n_docs, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )

    n_orders = 40
    prio = ["1-URGENT" if i % 3 == 0 else "5-LOW" for i in range(n_orders)]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_orders), pa.int64()),
                "o_orderpriority": pa.array(prio, pa.string()),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    ok, rf, qty = [], [], []
    for o in range(n_orders):
        for _ in range(rng.randint(1, 5)):
            ok.append(o)
            rf.append("ARN"[rng.randint(0, 3)])
            qty.append(float(rng.randint(1, 50)))
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_returnflag": pa.array(rf, pa.string()),
                "l_quantity": pa.array(qty, pa.float64()),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    return str(d)


class TestMorton:
    def test_matches_bitwise_reference(self):
        rng = np.random.RandomState(3)
        x = rng.randint(0, 1 << 16, 200).astype(np.int64)
        y = rng.randint(0, 1 << 16, 200).astype(np.int64)
        z = layout.morton32(x, y)
        for j in range(200):
            want = 0
            for i in range(16):
                want |= ((int(x[j]) >> i) & 1) << (2 * i)
                want |= ((int(y[j]) >> i) & 1) << (2 * i + 1)
            assert int(z[j]) == want

    def test_zone_maps_match_reference(self, tiny_dir):
        file_rows = 8
        got = {
            int(r["file_id"]): r
            for r in layout.zorder_layout(tiny_dir, file_rows=file_rows).take_all()
        }
        t = pq.read_table(os.path.join(tiny_dir, "documents.parquet"))
        x = np.minimum(t.column("n_chars").to_numpy(), (1 << 16) - 1).astype(np.int64)
        y = np.array(
            [layout._lang_bucket(v) for v in t.column("lang").to_pylist()],
            dtype=np.int64,
        )
        z = layout.morton32(x, y)
        doc = t.column("doc_id").to_numpy()
        order = np.lexsort((doc, z))
        ty = layout._lang_bucket(layout.Z_PRED_LANG)
        for f in range(int(np.ceil(len(doc) / file_rows))):
            rows = order[f * file_rows : (f + 1) * file_rows]
            r = got[f]
            assert r["n_docs"] == len(rows)
            assert r["min_x"] == x[rows].min() and r["max_x"] == x[rows].max()
            assert r["min_y"] == y[rows].min() and r["max_y"] == y[rows].max()
            want_surv = int(
                x[rows].max() >= layout.Z_PRED_X_LO
                and x[rows].min() <= layout.Z_PRED_X_HI
                and y[rows].min() <= ty <= y[rows].max()
            )
            assert r["survives"] == want_surv

    def test_zorder_prunes_on_both_dims(self, ray_session, tmp_path):
        """The point of the interleave: a per-language slice must NOT
        have to read every file (a pure length-sort layout would)."""
        n = 256
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(n), pa.int64()),
                    "text": pa.array(["x"] * n, pa.string()),
                    "lang": pa.array(
                        ["en", "fr", "zh", "de"] * (n // 4), pa.string()
                    ),
                    "source": pa.array(["s0"] * n, pa.string()),
                    # lengths inside the predicate range so pruning can
                    # only come from the language dimension
                    "n_chars": pa.array(
                        [layout.Z_PRED_X_LO + i % 100 for i in range(n)], pa.int64()
                    ),
                }
            ),
            os.path.join(tmp_path, "documents.parquet"),
        )
        rows = layout.zorder_layout(str(tmp_path), file_rows=16).take_all()
        survived = sum(int(r["survives"]) for r in rows)
        assert 0 < survived < len(rows)


class TestBloom:
    def test_no_false_negatives_and_fp_pruned(self, ray_session):
        import ray
        import ray.data

        members = np.arange(0, 3000, 3, dtype=np.int64)  # 1000 keys
        ds = ray.data.from_arrow(
            pa.table({"k": pa.array(members, pa.int64())})
        ).repartition(4)
        # deliberately undersized filter: 2048 bits / 1000 keys -> FPs
        ref = joinmod.build_bloom(ds, "k", m_bits=2048, k_hashes=3)
        assert joinmod.LAST_BLOOM_STATS["fill_fraction"] > 0.5
        probe = pa.table({"k": pa.array(np.arange(3000, dtype=np.int64), pa.int64())})
        kept = joinmod.bloom_prune(
            ray.data.from_arrow(probe), "k", ref, m_bits=2048, k_hashes=3
        ).take_all()
        kept_keys = {r["k"] for r in kept}
        # zero false negatives — every member survives
        assert set(members.tolist()) <= kept_keys
        # undersized filter admits SOME false positives (that's the test
        # that exactness can't rest on the bloom) but still prunes most
        fps = kept_keys - set(members.tolist())
        assert len(fps) < 1500

    def test_bloom_semi_join_matches_plain_join(self, tiny_dir):
        got = {
            r["l_returnflag"]: (int(r["n_items"]), int(r["sum_qty"]))
            for r in joinmod.bloom_semi_join(tiny_dir).take_all()
        }
        li = pq.read_table(os.path.join(tiny_dir, "lineitem.parquet"))
        orders = pq.read_table(os.path.join(tiny_dir, "orders.parquet"))
        urgent = {
            int(k)
            for k, p in zip(
                orders.column("o_orderkey").to_pylist(),
                orders.column("o_orderpriority").to_pylist(),
            )
            if p == "1-URGENT"
        }
        want: dict[str, list[int]] = {}
        for k, f, q in zip(
            li.column("l_orderkey").to_pylist(),
            li.column("l_returnflag").to_pylist(),
            li.column("l_quantity").to_pylist(),
        ):
            if k in urgent:
                w = want.setdefault(f, [0, 0])
                w[0] += 1
                w[1] += int(q)
        assert got == {f: (n, s) for f, (n, s) in want.items()}


class TestInvertedPostings:
    def test_matches_reference(self, tiny_dir):
        got = {
            r["term"]: (
                int(r["df"]),
                int(r["tf_sum"]),
                int(r["postings_sum"]),
                int(r["postings_xor"]),
            )
            for r in search.inverted_postings(tiny_dir, min_df=2).take_all()
        }
        t = pq.read_table(os.path.join(tiny_dir, "documents.parquet"))
        ref: dict[str, dict[int, int]] = {}
        for did, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            for tok in text.split(" "):
                ref.setdefault(tok, {}).setdefault(did, 0)
                ref[tok][did] += 1
        want = {}
        for term, posts in ref.items():
            if len(posts) < 2:
                continue
            xor = 0
            for d in posts:
                xor ^= d
            want[term] = (len(posts), sum(posts.values()), sum(posts), xor)
        assert got == want


class TestLinkKcore:
    def _links(self, tmp_path, rows):
        p = os.path.join(tmp_path, "links.parquet")
        pq.write_table(
            pa.table(
                {
                    "src_url": pa.array([a for a, _ in rows], pa.string()),
                    "dst_url": pa.array([b for _, b in rows], pa.string()),
                    "gated": pa.array([True] * len(rows), pa.bool_()),
                }
            ),
            p,
        )
        return p

    def test_core_peels_tails_both_paths(self, tmp_path, ray_session):
        """A triangle with pendant tails: the 2-core is exactly the
        triangle (tails peel in round 1, which drops a chain node to
        degree 1 so it peels in round 2 — the iteration matters);
        parity with the unrolled SQL twin on both execution paths,
        self-loops and duplicate/reverse edges ignored."""
        import duckdb

        from wbot_ray.pipelines import graph

        tri = [f"https://t{i}.com/" for i in range(3)]
        rows = [
            (tri[0], tri[1]),
            (tri[1], tri[2]),
            (tri[2], tri[0]),
            (tri[1], tri[0]),  # reverse duplicate: same undirected edge
            (tri[0], tri[0]),  # self-loop: ignored
            # chain hanging off the triangle: c1 - c2 (c1 also - t0)
            (tri[0], "https://c1.com/"),
            ("https://c1.com/", "https://c2.com/"),
        ]
        p = self._links(tmp_path, rows)
        want = {
            h: d
            for h, d in duckdb.connect()
            .execute(graph.link_kcore_oracle_sql(p))
            .fetchall()
        }
        assert want == {t: 2 for t in tri}
        for path_kw in ({}, {"local_threshold": 0}):
            got = {
                r["host"]: r["deg"]
                for r in graph.link_kcore(
                    str(tmp_path), links_path=p, **path_kw
                ).take_all()
            }
            assert got == want, path_kw

    def test_round_bound_is_shared(self, tmp_path, ray_session):
        """A long pendant chain peels one node per round: with
        rounds=2 both engines keep the not-yet-peeled chain interior,
        with a large bound both fully peel to the triangle core."""
        import duckdb

        from wbot_ray.pipelines import graph

        tri = [f"https://t{i}.com/" for i in range(3)]
        chain = [f"https://c{i}.com/" for i in range(4)]
        rows = [(tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])]
        prev = tri[0]
        for c in chain:
            rows.append((prev, c))
            prev = c
        p = self._links(tmp_path, rows)
        for r_bound in (2, 8):
            want = {
                h: d
                for h, d in duckdb.connect()
                .execute(graph.link_kcore_oracle_sql(p, rounds=r_bound))
                .fetchall()
            }
            got = {
                r["host"]: r["deg"]
                for r in graph.link_kcore(
                    str(tmp_path), links_path=p, rounds=r_bound
                ).take_all()
            }
            assert got == want, r_bound
        # the full peel leaves exactly the triangle
        assert {
            r["host"]
            for r in graph.link_kcore(str(tmp_path), links_path=p).take_all()
        } == set(tri)


class TestCmsSketch:
    def test_never_undercounts_and_merges_by_sum(self, tiny_dir):
        from wbot_ray.pipelines import textops
        from wbot_ray.pipelines.common import md5_lower64

        cells = {
            (int(r["row"]), int(r["cell"])): int(r["cnt"])
            for r in textops.cms_sketch(tiny_dir).take_all()
        }
        t = pq.read_table(os.path.join(tiny_dir, "documents.parquet"))
        true: dict[str, int] = {}
        for text in t.column("text").to_pylist():
            for tok in text.split(" "):
                true[tok] = true.get(tok, 0) + 1
        # total mass per sketch row == total token occurrences
        n_total = sum(true.values())
        for r in range(textops.CMS_DEPTH):
            assert sum(c for (rr, _), c in cells.items() if rr == r) == n_total
        # the CMS estimate (min over rows) never undercounts any token
        for tok, n in true.items():
            est = min(
                cells[(r, md5_lower64(f"cms{r}:{tok}") % textops.CMS_WIDTH)]
                for r in range(textops.CMS_DEPTH)
            )
            assert est >= n


class TestLateEvents:
    def test_watermark_flags_cross_part_lateness(self, tmp_path, ray_session):
        """Arrival stream with a late event whose watermark was set in
        an EARLIER partition (the carry must cross the part boundary),
        an in-lateness event (not late), and the first arrival (no
        watermark, never late) — parity with the SQL-window twin."""
        import duckdb
        import pandas as pd

        from wbot_ray.pipelines import relational

        L = 1_000_000  # 1 s allowed lateness
        base = 1_700_000_000_000_000
        # arrival order = event_id; t in us
        ts = [
            base,              # id 0: first arrival, no watermark
            base + 10_000_000, # id 1: watermark jumps to +10s
            base + 500_000,    # id 2: 9.5s late -> LATE
            base + 9_500_000,  # id 3: 0.5s behind watermark, within L
            base + 11_000_000, # id 4: advances watermark
            base + 2_000_000,  # id 5: 9s late -> LATE (carry crosses the
                               # part_size=2 boundary: watermark set in part 0/2)
        ]
        p = os.path.join(tmp_path, "events.parquet")
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(ts)), pa.int64()),
                    "ts": pa.array(pd.to_datetime(ts, unit="us"), pa.timestamp("us")),
                    "event_type": pa.array(
                        ["a", "b", "a", "b", "a", "b"], pa.string()
                    ),
                }
            ),
            p,
        )
        got = {
            r["event_type"]: (int(r["n_events"]), int(r["n_late"]))
            for r in relational.late_events(
                str(tmp_path), lateness_us=L, part_size=2
            ).take_all()
        }
        assert got == {"a": (3, 1), "b": (3, 1)}
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')")
        want = {
            t: (int(n), int(l))
            for t, n, l in con.execute(
                relational.late_events_oracle_sql(lateness_us=L)
            ).fetchall()
        }
        assert got == want
