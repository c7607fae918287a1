"""Tests for the training-data pipelines (wbot_ray.pipelines.*).

Strategy: build a tiny synthetic sf_dir with PLANTED duplicates /
near-duplicates / clusters, then assert each operator finds exactly
what was planted (and nothing else where the operator is exact). The
DuckDB-oracle queries are additionally cross-checked value-for-value at
sf0.001 — the same comparison the graft driver runs.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod
from wbot_ray.pipelines import dedup, multimodal, similarity, textops

SF0001 = "/root/testdata/sf0.001"


# -- planted corpus ------------------------------------------------------


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory, ray_session):
    """sf_dir with documents/embeddings engineered for dedup tests:

    docs 0..19  : unique random word soup (vocab large via suffixes)
    docs 100,101: EXACT copies of doc 0
    docs 102    : near-dup of doc 1 (one word changed)
    docs 103    : near-dup of doc 2 (one word appended)
    vectors     : 30 random; vec 200 ≈ vec 0 (tiny perturbation),
                  vec 201 == vec 1 exactly
    """
    rng = np.random.RandomState(7)
    d = tmp_path_factory.mktemp("planted")

    def soup(i: int, n: int = 40) -> str:
        return " ".join(f"w{rng.randint(0, 5000)}x{i % 7}" for _ in range(n))

    texts = {i: soup(i) for i in range(20)}
    texts[100] = texts[0]
    texts[101] = texts[0]
    t1 = texts[1].split(" ")
    t1[5] = "CHANGED"
    texts[102] = " ".join(t1)
    texts[103] = texts[2] + " extraword"
    ids = sorted(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids], pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
                "source": pa.array(["s0"] * len(ids), pa.string()),
                "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )

    vecs = rng.standard_normal((30, 64)).astype(np.float32)
    v_ids = list(range(30)) + [200, 201]
    v200 = vecs[0] + rng.standard_normal(64).astype(np.float32) * 0.01
    all_vecs = np.vstack([vecs, v200[None, :], vecs[1][None, :]])
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(v_ids, pa.int64()),
                "embedding": pa.array([v.tolist() for v in all_vecs], pa.list_(pa.float32())),
                "label": pa.array([0] * len(v_ids), pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    return str(d)


def _pairs(ds) -> set[tuple[int, int]]:
    return {(r["id_a"], r["id_b"]) for r in ds.take_all()}


class TestDedup:
    def test_exact(self, planted_dir):
        rows = dedup.dedup_exact(planted_dir).take_all()
        by_fp = {r["fp_md5"]: r for r in rows}
        # 24 docs, 2 exact copies of doc 0 → 22 distinct fingerprints
        assert len(rows) == 22
        triple = [r for r in rows if r["n_copies"] == 3]
        assert len(triple) == 1 and triple[0]["keep_id"] == 0
        assert all(r["n_copies"] == 1 for r in rows if r["keep_id"] != 0)
        assert by_fp  # fingerprints are md5 hex
        assert all(len(fp) == 32 for fp in by_fp)

    def test_minhash_finds_planted(self, planted_dir):
        got = _pairs(dedup.dedup_minhash(planted_dir, threshold=0.5))
        assert (0, 100) in got and (0, 101) in got and (100, 101) in got
        assert (1, 102) in got  # one-word change: shingle jaccard ~0.85
        assert (2, 103) in got
        # no false positives among unrelated docs
        assert all(a in (0, 1, 2, 100, 101, 102, 103) and b in (100, 101, 102, 103) for a, b in got)

    def test_minhash_small_and_distributed_paths_agree(self, planted_dir):
        """The driver-side small-verify finish == the two-exchange
        distributed signature joins, row for row (the parity pin the
        small-frontier merge precedent requires)."""
        small = sorted(
            (r["id_a"], r["id_b"], r["sim_pm"])
            for r in dedup.dedup_minhash(planted_dir, threshold=0.5).take_all()
        )
        big = sorted(
            (r["id_a"], r["id_b"], r["sim_pm"])
            for r in dedup.dedup_minhash(
                planted_dir, threshold=0.5, small_verify_threshold=0
            ).take_all()
        )
        assert small == big and small  # non-empty: planted copies hit

    def test_ngram_jaccard(self, planted_dir):
        got = _pairs(dedup.dedup_ngram(planted_dir, threshold=0.8))
        # unigram-token jaccard: exact copies = 1.0; 102 differs by 1 word
        assert (0, 100) in got and (0, 101) in got and (100, 101) in got
        assert (1, 102) in got and (2, 103) in got

    def test_ngram_skewed_block_not_quadratic(self, tmp_path, ray_session):
        """One dominant (lang, source) block — 10k docs, all 'en'/'web'.
        The old blocking made this one O(n²) task (~50M pair checks); the
        (octave, min-md5) key must keep it tractable. Planted copies must
        still be found."""
        import time

        rng = np.random.RandomState(11)
        n = 10_000
        texts = [
            " ".join(f"w{rng.randint(0, 8000)}" for _ in range(40)) for _ in range(n)
        ]
        texts[5000] = texts[17]  # planted exact copy
        d = tmp_path / "skew"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(n), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(["en"] * n, pa.string()),
                    "source": pa.array(["web"] * n, pa.string()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        t0 = time.perf_counter()
        got = _pairs(dedup.dedup_ngram(str(d), threshold=0.8))
        dt = time.perf_counter() - t0
        assert (17, 5000) in got
        # generous wall bound: quadratic all-pairs on 10k docs of 40-token
        # sets is minutes; the bounded blocking is seconds
        assert dt < 60, f"skewed block took {dt:.1f}s — blocking regressed?"

    def test_minhash_hot_bucket_star_envelope(self, tmp_path, ray_session):
        """A mass-duplicated boilerplate cluster (3000 identical docs =
        one LSH bucket) must NOT expand to ~4.5M pairs: with
        max_bucket_docs=k the bucket emits the star from the min doc
        plus triu over the first k — and dup_clusters still collapses
        the WHOLE cluster to one component via the star. The SQL twin
        applies the identical rule."""
        import duckdb

        n, k = 3000, 8
        rng = np.random.RandomState(7)
        texts = ["parking page boilerplate " * 6] * n
        # a couple of normal docs so the corpus isn't all one cluster
        texts += [
            " ".join(f"w{rng.randint(0, 8000)}" for _ in range(40)) for _ in range(4)
        ]
        d = tmp_path / "hotbucket"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        got = sorted(
            (r["id_a"], r["id_b"], r["sim_pm"])
            for r in dedup.dedup_minhash(
                str(d), threshold=0.5, max_bucket_docs=k
            ).take_all()
        )
        # bounded: star (n-1) + triu(k) — not C(3000, 2)
        assert len(got) == (n - 1 - (k - 1)) + k * (k - 1) // 2
        # star connectivity: every cluster member pairs with doc 0
        assert {(0, j) for j in range(1, n)} <= {(a, b) for a, b, _ in got}
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{os.path.join(d, 'documents.parquet')}')"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(
                entrymod._minhash_oracle_sql(threshold=0.5, max_bucket_docs=k)
            ).fetchall()
        )
        assert got == want
        # the apply side: one component, labeled by the min doc
        clusters = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup.dup_clusters(
                str(d),
                threshold=0.5,
                pairs=dedup.dedup_minhash(str(d), threshold=0.5, max_bucket_docs=k),
            ).take_all()
        }
        assert all(clusters[j] == 0 for j in range(n))

    def test_simhash_finds_planted(self, planted_dir):
        got = _pairs(dedup.dedup_simhash(planted_dir, max_hamming=10))
        assert (0, 100) in got and (0, 101) in got and (100, 101) in got

    def test_embed_finds_planted(self, planted_dir):
        got = _pairs(dedup.dedup_embed(planted_dir, threshold=0.95))
        assert (1, 201) in got  # exact vector copy
        assert (0, 200) in got  # tiny perturbation

    def test_dup_clusters_planted(self, planted_dir):
        """Exact copies + near-dups collapse to min-id components."""
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup.dup_clusters(planted_dir, threshold=0.5).take_all()
        }
        assert got[0] == got[100] == got[101] == 0
        assert got[1] == got[102] == 1
        assert got[2] == got[103] == 2

    def test_dup_clusters_path_graph(self, ray_session, tmp_path):
        """Multi-hop propagation: a 12-node path (no direct far pairs)
        must still collapse to ONE component — exercises the iterative
        rounds (local_threshold=0 forces the distributed path), not
        just single-hop folding."""
        import ray.data as rd

        n = 12
        path = pa.table(
            {
                "id_a": pa.array(list(range(n - 1)), pa.int64()),
                "id_b": pa.array(list(range(1, n)), pa.int64()),
            }
        )
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup.dup_clusters(
                str(tmp_path), pairs=rd.from_arrow(path), local_threshold=0
            ).take_all()
        }
        assert got == {i: 0 for i in range(n)}

    def test_dup_clusters_local_matches_distributed(self, ray_session, tmp_path):
        """The driver-local union-find shortcut and the distributed
        min-label propagation must emit identical labels on a randomized
        pair graph (chains, stars, singleton pairs)."""
        import random

        import ray.data as rd

        rng = random.Random(17)
        # chain within the distributed path's max_rounds envelope
        # (min-label moves one hop per round), a star, and random pairs
        # confined to 6-node blocks (diameter <= 5)
        edges = {(i, i + 1) for i in range(0, 12)}
        edges |= {(100, 100 + i) for i in range(1, 9)}
        for blk in range(200, 260, 6):
            edges |= {
                tuple(sorted(rng.sample(range(blk, blk + 6), 2))) for _ in range(4)
            }
        t = pa.table(
            {
                "id_a": pa.array([a for a, _ in sorted(edges)], pa.int64()),
                "id_b": pa.array([b for _, b in sorted(edges)], pa.int64()),
            }
        )
        loc = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup.dup_clusters(str(tmp_path), pairs=rd.from_arrow(t)).take_all()
        }
        dist = {
            r["doc_id"]: r["cluster_id"]
            for r in dedup.dup_clusters(
                str(tmp_path), pairs=rd.from_arrow(t), local_threshold=0
            ).take_all()
        }
        assert loc == dist and len(loc) > 0

    def test_dedup_segments_drops_later_copies(self, ray_session, tmp_path):
        """Keep-first segment dedup: later exact copies of an aligned
        16-token segment drop anywhere in the corpus; a fully-duplicated
        doc rebuilds to the empty string."""
        W = dedup.SEG_WORDS
        seg_a = " ".join(f"a{i}" for i in range(W))
        seg_b = " ".join(f"b{i}" for i in range(W))
        seg_c = " ".join(f"c{i}" for i in range(W))
        rows = {0: seg_a + " " + seg_b, 1: seg_c + " " + seg_a, 2: seg_a}
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(rows), pa.int64()),
                    "text": pa.array(list(rows.values()), pa.string()),
                }
            ),
            os.path.join(tmp_path, "documents.parquet"),
        )
        got = {r["doc_id"]: r for r in dedup.dedup_segments(str(tmp_path)).take_all()}
        assert got[0]["text_clean"] == rows[0] and got[0]["n_dropped"] == 0
        assert got[1]["text_clean"] == seg_c and got[1]["n_dropped"] == 1
        assert got[2]["text_clean"] == "" and got[2]["n_segs"] == 1
        assert got[2]["n_dropped"] == 1

    def test_dup_spans_catches_unaligned_copy(self, ray_session, tmp_path):
        """A 25-token span pasted mid-document (offset 7 — misaligned
        with any fixed 16-token boundary) still collides in stride-1
        windows; within-doc repetition alone does NOT count; parity
        with the SQL twin."""
        import duckdb

        W = dedup.WIN_WORDS  # 20
        span = [f"s{i}" for i in range(25)]
        doc0 = " ".join(span + [f"x{i}" for i in range(10)])
        doc1 = " ".join([f"y{i}" for i in range(7)] + span + [f"z{i}" for i in range(5)])
        doc2 = " ".join([f"q{i % 3}" for i in range(40)])  # self-repetitive only
        doc3 = " ".join(f"u{i}" for i in range(W - 1))  # too short: 0 windows
        rows = {0: doc0, 1: doc1, 2: doc2, 3: doc3}
        p = os.path.join(tmp_path, "documents.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(rows), pa.int64()),
                    "text": pa.array(list(rows.values()), pa.string()),
                }
            ),
            p,
        )
        got = {
            r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
            for r in dedup.dup_spans(str(tmp_path)).take_all()
        }
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
        want = {
            d: (w, x) for d, w, x in con.execute(dedup.dup_spans_oracle_sql()).fetchall()
        }
        assert got == want
        # the shared 25-token span yields 25-20+1 = 6 duplicated windows
        # on each side, regardless of the paste offset
        assert got[0] == (35 - W + 1, 6)
        assert got[1] == (37 - W + 1, 6)
        assert got[2][1] == 0  # self-repetition is not cross-doc dup
        assert got[3] == (0, 0)

    def test_dedup_span_apply_first_wins(self, ray_session, tmp_path):
        """Global-first-wins span removal: the earliest (doc_id, start)
        occurrence keeps its text; the unaligned later copy loses its
        whole span; an untouched doc round-trips; parity with SQL."""
        import duckdb

        W = dedup.WIN_WORDS
        span = [f"s{i}" for i in range(W)]  # exactly one window
        doc0 = " ".join(span + [f"x{i}" for i in range(4)])
        doc1 = " ".join([f"y{i}" for i in range(3)] + span)
        doc2 = " ".join(f"z{i}" for i in range(30))
        rows = {0: doc0, 1: doc1, 2: doc2}
        p = os.path.join(tmp_path, "documents.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(rows), pa.int64()),
                    "text": pa.array(list(rows.values()), pa.string()),
                }
            ),
            p,
        )
        got = {
            r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_removed"])
            for r in dedup.dedup_span_apply(str(tmp_path)).take_all()
        }
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
        want = {
            d: (tc, nt, nr)
            for d, tc, nt, nr in con.execute(
                dedup.dedup_span_apply_oracle_sql()
            ).fetchall()
        }
        assert got == want
        assert got[0] == (doc0, W + 4, 0)  # first occurrence untouched
        assert got[1] == ("y0 y1 y2", W + 3, W)  # later copy stripped
        assert got[2] == (doc2, 30, 0)

    def test_minhash_deterministic(self, planted_dir):
        a = sorted(_pairs(dedup.dedup_minhash(planted_dir, threshold=0.5)))
        b = sorted(_pairs(dedup.dedup_minhash(planted_dir, threshold=0.5)))
        assert a == b


class TestSimilarity:
    def test_brute_matches_numpy(self, planted_dir):
        # reference on the SAME integer grid as the engine: quantized
        # components, exact integer dots, fixed-tree quantized cosine
        t = pq.read_table(os.path.join(planted_dir, "embeddings.parquet"))
        ids = np.asarray(t.column("vec_id").to_pylist())
        vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        g = np.floor(vecs * float(similarity.IVF_QUANT)).astype(np.int64)
        nn = (g * g).sum(axis=1)
        dots = g @ g.T
        pm = np.floor(
            dots.astype(np.float64)
            / (np.sqrt(nn.astype(np.float64))[:, None] * np.sqrt(nn.astype(np.float64))[None, :])
            * float(similarity.IVF_QUANT)
        ).astype(np.int64)
        got = {}
        for r in similarity.knn_brute(planted_dir, n_queries=4, k=5).take_all():
            got.setdefault(r["q_id"], []).append((r["knn_rank"], r["n_id"]))
        for qi in range(4):
            q_idx = int(np.nonzero(ids == qi)[0][0])
            if nn[q_idx] == 0:
                assert qi not in got
                continue
            order = sorted(
                (j for j in range(len(ids)) if ids[j] != qi and nn[j] > 0),
                key=lambda j: (-pm[q_idx, j], ids[j]),
            )[:5]
            want = [int(ids[j]) for j in order]
            assert [n for _, n in sorted(got[qi])] == want, qi

    def test_ivf_recall(self, planted_dir):
        brute = {}
        for r in similarity.knn_brute(planted_dir, n_queries=4, k=5).take_all():
            brute.setdefault(r["q_id"], set()).add(r["n_id"])
        ivf = {}
        for r in similarity.knn_ivf(planted_dir, n_queries=4, k=5, n_centroids=4, nprobe=2).take_all():
            ivf.setdefault(r["q_id"], set()).add(r["n_id"])
        recalls = [len(brute[q] & ivf.get(q, set())) / len(brute[q]) for q in brute]
        assert sum(recalls) / len(recalls) >= 0.5  # nprobe=2 of 4 buckets

    def test_ivf_actually_prunes(self, planted_dir, capsys):
        """The IVF layout must make a probe read ONLY its buckets: with
        nprobe=1 of 8 centroids and one query, the probed fraction of the
        corpus must be well under half, and the results must agree with
        the equivalent full-mask computation."""
        import re

        similarity.knn_ivf(
            planted_dir, n_queries=1, k=3, n_centroids=8, nprobe=1
        ).take_all()
        out = capsys.readouterr().out
        m = re.search(r"\[knn_ivf\] probing (\d+)/(\d+) buckets = (\d+)/(\d+) rows", out)
        assert m, out
        probed_rows, total_rows = int(m.group(3)), int(m.group(4))
        assert 0 < probed_rows < total_rows / 2

    def test_ivf_matches_masked_bruteforce(self, planted_dir):
        """Bucketed-layout IVF must return EXACTLY what a full-scan with
        per-query bucket masking returns — the layout changes I/O, never
        the result."""
        got = {
            (r["q_id"], r["n_id"], r["knn_rank"])
            for r in similarity.knn_ivf(
                planted_dir, n_queries=4, k=5, n_centroids=4, nprobe=2
            ).take_all()
        }
        # reference: recompute the whole quantized-grid IVF in plain
        # numpy — md5-sampled centroids, fixed-tree pm cosine,
        # argmax assignment, probe mask, (pm desc, n_id) ranking
        from wbot_ray.pipelines.common import md5_lower64

        t = pq.read_table(os.path.join(planted_dir, "embeddings.parquet"))
        ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        q = np.floor(vecs * float(similarity.IVF_QUANT)).astype(np.int64)
        nn = (q * q).sum(axis=1)

        def pm(dots, na, nb):
            return np.floor(
                dots / (np.sqrt(na.astype(float)) * np.sqrt(nb.astype(float)))
                * float(similarity.IVF_QUANT)
            ).astype(np.int64)

        nz = np.nonzero(nn > 0)[0]
        order = sorted(nz, key=lambda j: (md5_lower64(f"ivfc:{int(ids[j])}"), int(ids[j])))
        cent = q[order[:4]]
        cn = (cent * cent).sum(axis=1)
        c_pm = pm(q @ cent.T, nn[:, None], cn[None, :])
        assign = np.argmax(c_pm, axis=1)
        want = set()
        for qi in range(4):
            q_idx = int(np.nonzero(ids == qi)[0][0])
            pms = pm(q[q_idx] @ q.T, np.asarray(nn[q_idx]), nn)
            pr = set(np.lexsort((np.arange(4), -c_pm[q_idx]))[:2])
            cand = [
                j for j in range(len(ids))
                if ids[j] != qi and nn[j] > 0 and int(assign[j]) in pr
            ]
            cand.sort(key=lambda j: (-pms[j], ids[j]))
            for rank, j in enumerate(cand[:5], 1):
                want.add((qi, int(ids[j]), rank))
        assert got == want


class TestSearch:
    def test_term_search_prunes_and_intersects(self, ray_session, capsys):
        """The posting layout must make a query read only its terms'
        buckets, and conjunctive semantics must match a direct scan."""
        import re

        from wbot_ray.pipelines import search

        got = {
            r["doc_id"]: r["tf_total"]
            for r in search.term_search(SF0001, terms=("join", "filter")).take_all()
        }
        out = capsys.readouterr().out
        m = re.search(r"\[term_search\] probing (\d+)/(\d+) buckets = (\d+)/(\d+)", out)
        assert m, out
        assert 0 < int(m.group(3)) < int(m.group(4)) / 2  # reads a minority
        t = pq.read_table(os.path.join(SF0001, "documents.parquet"), columns=["doc_id", "text"])
        want = {}
        for did, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            toks = txt.split(" ")
            nj, nf = toks.count("join"), toks.count("filter")
            if nj and nf:
                want[did] = nj + nf
        assert got == want

    def test_phrase_search_planted(self, ray_session, tmp_path):
        """Adjacency semantics on a planted corpus: overlapping
        occurrences, duplicate phrase tokens, start/end positions, and
        tokens-present-but-not-adjacent non-matches."""
        from wbot_ray.pipelines import search

        texts = {
            0: "x table scan y table scan",  # 2 occurrences
            1: "table scan",  # exact doc == phrase (start+end)
            2: "scan table",  # reversed: tokens present, no match
            3: "table y scan",  # gap: no match
            4: "a a a b",  # overlapping duplicate-token phrase
            5: "z z table scanx",  # prefix token: no match
        }
        ids = sorted(texts)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array([texts[i] for i in ids], pa.string()),
                }
            ),
            os.path.join(tmp_path, "documents.parquet"),
        )
        d = str(tmp_path)

        def run(phrase):
            return {
                r["doc_id"]: r["n_matches"]
                for r in search.phrase_search(
                    d, phrase=phrase, index_dir=str(tmp_path / f"idx{len(phrase)}{phrase[0]}")
                ).take_all()
            }

        assert run(("table", "scan")) == {0: 2, 1: 1}
        assert run(("a", "a")) == {4: 2}  # overlapping starts 1 and 2
        assert run(("a", "a", "a")) == {4: 1}
        assert run(("nosuch", "scan")) == {}

    def test_phrase_search_matches_direct_scan(self, ray_session):
        """Default phrase over the real fixture == a direct text scan."""
        from wbot_ray.pipelines import search

        got = {
            r["doc_id"]: r["n_matches"]
            for r in search.phrase_search(SF0001).take_all()
        }
        t = pq.read_table(
            os.path.join(SF0001, "documents.parquet"), columns=["doc_id", "text"]
        )
        k = len(search.DEFAULT_PHRASE)
        want = {}
        for did, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            toks = txt.split(" ")
            n = sum(
                1
                for i in range(len(toks) - k + 1)
                if tuple(toks[i : i + k]) == search.DEFAULT_PHRASE
            )
            if n:
                want[did] = n
        assert got == want


class TestShingleKernel:
    """The vectorized batch shingle hasher must be element-wise identical
    to the scalar set-of-strings path it replaced — every dedup-family
    signature derives from it."""

    def test_batch_matches_scalar(self):
        import numpy as np
        import pyarrow as pa

        from wbot_ray.pipelines.common import batch_shingle_hashes, shingle_hashes

        texts = [
            "",  # empty doc: one empty token, one whole-text shingle
            "one",
            "one two",  # < k tokens: whole text is the shingle
            "one two three",  # exactly k
            "a b c d e f g",
            "dup dup dup dup",  # repeated shingles collapse
            "x " * 50,  # trailing empty token from split
            "tok1 tok2 tok3 tok1 tok2 tok3",
        ] + [f"w{i % 17} q{i % 31} r{i} s{i * 3 % 7} t{i % 5}" for i in range(200)]
        got = batch_shingle_hashes(pa.array(texts))
        assert len(got) == len(texts)
        for g, t in zip(got, texts):
            assert np.array_equal(g, shingle_hashes(t)), repr(t[:40])

    def test_md5_batch_matches_duckdb_definition(self):
        import numpy as np
        import pyarrow as pa

        from wbot_ray.pipelines.common import md5_lower64, md5_lower64_batch

        strs = ["", "a", "hello world", "日本語", "x" * 500]
        got = md5_lower64_batch(pa.array(strs))
        assert np.array_equal(
            got, np.array([md5_lower64(s) for s in strs], np.uint64)
        )

    def test_empty_batch(self):
        import pyarrow as pa

        from wbot_ray.pipelines.common import batch_shingle_hashes

        assert batch_shingle_hashes(pa.array([], pa.string())) == []


class TestTextops:
    def test_tfidf_broadcast_and_join_paths_agree(self, ray_session):
        """tfidf_topterms' two shapes — small-vocab broadcast and the
        token-keyed bucketed hash_join (the 100-TB path, forced with
        broadcast_vocab_max=0) — must produce identical rows."""
        a = textops.tfidf_topterms(SF0001).to_pandas()
        b = textops.tfidf_topterms(SF0001, broadcast_vocab_max=0).to_pandas()
        key = ["doc_id", "term_rank"]
        a = a.sort_values(key).reset_index(drop=True)[sorted(a.columns)]
        b = b.sort_values(key).reset_index(drop=True)[sorted(b.columns)]
        assert len(a) > 0
        assert a.equals(b)

    def test_fingerprint_rolling(self, ray_session):
        rows = textops.doc_fingerprint(SF0001).take_all()
        t = pq.read_table(os.path.join(SF0001, "documents.parquet"), columns=["doc_id", "text"])
        texts = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
        MOD = (1 << 61) - 1
        for r in rows[:20]:
            txt = texts[r["doc_id"]]
            assert r["fp_md5"] == hashlib.md5(txt.encode()).hexdigest()
            h = 0
            for b in txt.encode():
                h = (h * 131 + b) % MOD
            assert r["fp_rolling"] == h

    def test_langid_on_profile_text(self, planted_dir, tmp_path):
        d = tmp_path / "langid"
        d.mkdir()
        docs = {
            0: ("the cat and the dog of the town went to sleep in peace", "en"),
            1: ("der hund und die katze das haus ist hier und der wald", "de"),
            2: ("le chat et la maison les arbres des villes et le pont", "fr"),
        }
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array([docs[i][0] for i in docs], pa.string()),
                    "lang": pa.array([docs[i][1] for i in docs], pa.string()),
                    "source": pa.array(["s"] * 3, pa.string()),
                    "n_chars": pa.array([1] * 3, pa.int64()),
                }
            ),
            str(d / "documents.parquet"),
        )
        got = {r["doc_id"]: r["pred_lang"] for r in textops.langid(str(d)).take_all()}
        assert got == {0: "en", 1: "de", 2: "fr"}


class TestMultimodal:
    def test_decode_stub_raises(self):
        with pytest.raises(NotImplementedError):
            multimodal.ImageDecoder().decode(b"bytes")

    def test_fake_decode_deterministic(self):
        a = multimodal.ImageDecoder.fake_decode(b"hello world")
        b = multimodal.ImageDecoder.fake_decode(b"hello world")
        assert a.shape == (4, 4, 3) and a.dtype == np.uint8
        assert np.array_equal(a, b)

    def test_payload_pipeline(self, ray_session):
        rows = multimodal.payload_features(SF0001).take_all()
        assert len(rows) == 500
        t = pq.read_table(os.path.join(SF0001, "documents.parquet"), columns=["doc_id", "text"])
        texts = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
        for r in rows[:10]:
            txt = texts[r["doc_id"]]
            assert r["n_bytes"] == len(txt.encode())
            assert r["payload_md5"] == hashlib.md5(txt.encode()).hexdigest()

    def test_feature_extractor_actor_shape(self, ray_session):
        feats = multimodal.payload_table(SF0001).map_batches(
            multimodal.FeatureExtractor, batch_format="pyarrow", batch_size=128, concurrency=2
        )
        first = feats.take(5)
        assert all(len(r["embed"]) == 8 for r in first)


class TestOracleParity:
    """The driver's gate, in-process: Ray result == DuckDB result."""

    @pytest.mark.parametrize(
        "name",
        [
            "text_stats",
            "lang_dist",
            "token_counts",
            "dedup_exact",
            "dedup_ngram",
            "knn_brute",
            "q1_pricing",
            "cust_order_stats",
            "events_hourly",
            "topk_users",
            "region_acctbal",
            "group_topn",
            "price_quantiles",
            "payload_features",
            "doc_fingerprint",
            "corpus_filter",
            "sessionize",
            "asof_prior_event",
            "events_sliding",
            "langid",
            "heavy_hitters",
            "frame_features",
            "dedup_minhash",
            "dedup_simhash",
            "dedup_embed",
            "dup_clusters",
            "knn_ivf",
            "dedup_segments",
            "freq_quality",
            "term_search",
            "embed_docs",
            "sample_hash",
            "pack_sequences",
            "audio_features",
            "ngram_counts",
            "tfidf_topterms",
            "stratified_sample",
            "decontaminate",
            "price_band_join",
            "dedup_keep",
            "global_shuffle",
            "quality_score",
            "order_priority_revenue",
            "daily_active_users",
            "approx_distinct_users",
            "kmeans_clusters",
            "prepare_corpus",
            "window_pairs",
            "funnel_steps",
            "weighted_sample",
            "orders_rollup",
            "length_sketch_quantiles",
            "normalize_text",
            "urgent_orders_by_year",
            "q3_shipping",
            "churned_users",
            "repetition_stats",
            "props_by_type",
            "user_running_value",
            "events_pivot",
            "orders_cube",
            "user_day_share",
            "semantic_search",
            "doc_chunks",
            "price_range_scan",
            "events_anomaly",
            "phrase_search",
            "compact_corpus",
            "corpus_diff",
            "filter_funnel",
            "pq_codes",
            "pq_search",
        ],
    )
    def test_query_matches_oracle(self, name, ray_session):
        import duckdb
        import pandas as pd
        import ray.data

        con = duckdb.connect()
        for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF0001}/{t}.parquet')"
            )
        res = entrymod.queries()[name](SF0001)
        if isinstance(res, ray.data.Dataset):
            got = res.to_pandas()
        elif isinstance(res, pa.Table):
            got = res.to_pandas()
        else:
            got = res
        want = con.execute(entrymod.oracle_sql()[name]).df()

        def canon(df: pd.DataFrame) -> pd.DataFrame:
            df = df[sorted(df.columns)]
            return df.sort_values(by=list(df.columns)).reset_index(drop=True)

        got, want = canon(got), canon(want)
        assert list(got.columns) == list(want.columns)
        assert len(got) == len(want)
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_filter_funnel_sums_to_corpus_filter(ray_session):
    """The funnel's kept column must reconcile with corpus_filter's
    actual output — same gates, same winner rule, by construction."""
    from wbot_ray.pipelines import textops

    funnel = textops.filter_funnel(SF0001).to_pandas()
    kept_rows = textops.corpus_filter(SF0001).count()
    assert int(funnel.n_kept.sum()) == kept_rows
    assert (funnel.n_docs == funnel.n_fail_len + funnel.n_fail_stop + funnel.n_pass).all()
    assert (funnel.n_kept <= funnel.n_pass).all()


class TestSketchOracleParity:
    """The sketch pipelines against their DuckDB SQL twins on the
    PLANTED corpus — where pairs actually exist. (The sf0.001 parity
    above also runs them, but near-empty outputs there would make a
    wrong hash family pass trivially.)"""

    @pytest.mark.parametrize(
        "fn, osql",
        [
            (
                lambda d: dedup.dedup_minhash(d, threshold=0.5),
                lambda: entrymod._minhash_oracle_sql(0.5),
            ),
            (
                lambda d: dedup.dedup_simhash(d, max_hamming=10),
                lambda: entrymod._simhash_oracle_sql(10),
            ),
            (
                lambda d: dedup.dedup_embed(d, threshold=0.95),
                lambda: entrymod._embed_oracle_sql(0.95),
            ),
            (
                lambda d: dedup.dup_clusters(d, threshold=0.5),
                lambda: entrymod._clusters_oracle_sql(0.5),
            ),
        ],
        ids=["minhash", "simhash", "embed", "clusters"],
    )
    def test_sketch_matches_oracle_on_planted(self, planted_dir, fn, osql):
        import duckdb
        import pandas as pd

        con = duckdb.connect()
        for t in ("documents", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{planted_dir}/{t}.parquet')"
            )
        got = fn(planted_dir).to_pandas()
        want = con.execute(osql()).df()

        def canon(df: pd.DataFrame) -> pd.DataFrame:
            df = df[sorted(df.columns)]
            return df.sort_values(by=list(df.columns)).reset_index(drop=True)

        got, want = canon(got), canon(want)
        assert len(got) > 0, "planted corpus must produce pairs"
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


class TestHeavyHitters:
    def test_planted_threshold_exact(self, tmp_path, ray_session):
        """Exactness at the threshold: a token at count*k == N is IN, one
        just below is OUT, regardless of the sketch pass."""
        from wbot_ray.pipelines import textops

        k = 10
        # corpus: 100 tokens total; "hot" appears 10x (10*10 == 100: in),
        # "warm" 9x (90 < 100: out), 81 unique fillers
        toks = ["hot"] * 10 + ["warm"] * 9 + [f"f{i}" for i in range(81)]
        docs = [" ".join(toks[i : i + 10]) for i in range(0, 100, 10)]
        d = tmp_path / "hh"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        out = {r["token"]: r["n_occurrences"]
               for r in textops.heavy_hitters(str(d), k=k).to_pylist()}
        assert out.get("hot") == 10
        assert "warm" not in out
        assert all(v * k >= 100 for v in out.values())


class TestFrameSampling:
    def test_frame_hashes_match_byte_slices(self, ray_session):
        """The per-frame md5/embedding (not SQL-expressible) against a
        direct byte-slicing reference over the real documents table."""
        from wbot_ray.pipelines.multimodal import FrameSampler, frame_features

        rows = frame_features(SF0001).take_all()
        t = pq.read_table(
            os.path.join(SF0001, "documents.parquet"), columns=["doc_id", "text"]
        )
        texts = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
        fs = FrameSampler()
        want = {}
        for d, txt in texts.items():
            for fi, frame in enumerate(fs.cut_frames(txt.encode())):
                want[(d, fi)] = (len(frame), hashlib.md5(frame).hexdigest())
        assert len(rows) == len(want)
        for r in rows:
            nb, md5 = want[(r["doc_id"], r["frame_idx"])]
            assert r["frame_bytes"] == nb and r["frame_md5"] == md5


class TestAsofProperty:
    def test_asof_matches_bruteforce_on_random_streams(self, tmp_path, ray_session):
        """Randomized streams (duplicate timestamps included) vs an
        O(n²) brute-force as-of reference."""
        from wbot_ray.pipelines import relational

        rng = np.random.RandomState(99)
        n = 400
        uids = rng.randint(0, 12, n)
        ts = rng.randint(0, 500, n) * 1_000_000  # collisions on purpose
        types = np.where(rng.rand(n) < 0.5, "purchase", "click")
        d = tmp_path / "asof"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(n), pa.int64()),
                    "ts": pa.array(ts.tolist(), pa.timestamp("us")),
                    "user_id": pa.array(uids.tolist(), pa.int64()),
                    "event_type": pa.array(types.tolist(), pa.string()),
                }
            ),
            os.path.join(d, "events.parquet"),
        )
        got = {
            (r["event_id"]): (r["click_event_id"], r["click_ts_us"], r["gap_us"])
            for r in relational.asof_prior_event(str(d)).take_all()
        }
        # brute force: per purchase, clicks at-or-before; among ties on
        # the max ts keep max event_id
        want = {}
        for i in range(n):
            if types[i] != "purchase":
                continue
            best = None
            for j in range(n):
                if types[j] == "click" and uids[j] == uids[i] and ts[j] <= ts[i]:
                    key = (ts[j], j)
                    if best is None or key > best:
                        best = key
            if best is not None:
                bt, bj = best
                want[i] = (bj, int(bt), int(ts[i] - bt))
        assert got == want


class TestTrainingOps:
    def _docs_dir(self, tmp_path, n=120, langs=("en", "de", "fr")):
        """Tiny documents table with varied token counts per lang."""
        rng = np.random.RandomState(11)
        texts, lang_col = [], []
        for i in range(n):
            k = int(rng.randint(1, 40))
            texts.append(" ".join(f"w{i}x{j}" for j in range(k)))
            lang_col.append(langs[i % len(langs)])
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(n), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(lang_col, pa.string()),
                    "source": pa.array(["t"] * n, pa.string()),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        return str(d), texts, lang_col

    def test_pack_sequences_prefix_law_across_partitions(self, tmp_path, ray_session):
        """part_size smaller than the corpus forces multi-partition
        base offsets; the result must equal the sequential single-tape
        computation per lang."""
        from wbot_ray.pipelines import training

        d, texts, lang_col = self._docs_dir(tmp_path)
        got = {
            r["doc_id"]: (r["lang"], r["n_tokens"], r["seq_id"], r["seq_offset"])
            for r in training.pack_sequences(d, seq_len=64, part_size=16).take_all()
        }
        cum = {}
        for i, (t, lang) in enumerate(zip(texts, lang_col)):
            ntok = len(t.split(" "))
            prev = cum.get(lang, 0)
            assert got[i] == (lang, ntok, prev // 64, prev % 64), i
            cum[lang] = prev + ntok
        assert len(got) == len(texts)

    def test_sample_hash_deterministic_partition(self, tmp_path, ray_session):
        """Keep-set is a pure function of doc_id: two runs agree, and
        keep + complement partition the table at the md5 threshold."""
        from wbot_ray.pipelines import training
        from wbot_ray.pipelines.common import md5_lower64

        d, texts, _ = self._docs_dir(tmp_path)
        a = sorted(r["doc_id"] for r in training.sample_hash(d).take_all())
        b = sorted(r["doc_id"] for r in training.sample_hash(d).take_all())
        assert a == b
        want = [
            i for i in range(len(texts)) if md5_lower64(f"sample:{i}") < (1 << 62)
        ]
        assert a == want

    def test_weighted_sample_partition_invariant(self, tmp_path, ray_session):
        """The per-batch bottom-k is lossless: the sample equals the
        sequential bottom-k over all rows, regardless of block layout,
        and ranks are the dense 1..k of the global key order."""
        from wbot_ray.pipelines import training
        from wbot_ray.pipelines.common import md5_lower64

        d, texts, lang_col = self._docs_dir(tmp_path)
        k = 25
        got = sorted(
            (r["w_rank"], r["doc_id"])
            for r in training.weighted_sample(d, k=k).take_all()
        )
        keys = sorted(
            (md5_lower64(f"wsamp:{i}") // max(len(t), 1), i)
            for i, t in enumerate(texts)
        )
        want = [(rank + 1, doc) for rank, (_, doc) in enumerate(keys[:k])]
        assert got == want

    def test_weighted_sample_weight_monotone(self):
        """Same doc key, larger weight -> key can only shrink (the
        weight-proportional tilt the operator promises)."""
        from wbot_ray.pipelines.common import md5_lower64

        h = md5_lower64("wsamp:somedoc")
        keys = [h // w for w in (1, 10, 1000, 100000)]
        assert keys == sorted(keys, reverse=True)

    def test_orders_rollup_levels_consistent(self, ray_session):
        """Each rollup level sums exactly to the level above it, and the
        grand-total row equals the direct full aggregate."""
        from wbot_ray.pipelines import relational

        rows = relational.orders_rollup(SF0001).to_pylist()
        finest = [r for r in rows if r["o_year"] != "ALL"]
        lvl1 = {
            r["o_orderpriority"]: r
            for r in rows
            if r["o_year"] == "ALL" and r["o_orderpriority"] != "ALL"
        }
        (lvl0,) = [r for r in rows if r["o_orderpriority"] == "ALL"]
        assert lvl0["o_year"] == "ALL"
        for prio, r1 in lvl1.items():
            mine = [r for r in finest if r["o_orderpriority"] == prio]
            assert r1["n_orders"] == sum(r["n_orders"] for r in mine)
            assert r1["sum_price_cents"] == sum(r["sum_price_cents"] for r in mine)
        assert lvl0["n_orders"] == sum(r["n_orders"] for r in lvl1.values())
        assert lvl0["sum_price_cents"] == sum(
            r["sum_price_cents"] for r in lvl1.values()
        )
        t = pq.read_table(os.path.join(SF0001, "orders.parquet"), columns=["o_totalprice"])
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        assert lvl0["n_orders"] == len(v)
        assert lvl0["sum_price_cents"] == int(
            np.floor(v * 100.0 + 0.5).astype(np.int64).sum()
        )

    def test_length_sketch_brackets_exact_quantile(self, ray_session):
        """The sketch's bin upper edge is >= the exact quantile and
        within bin_width of it — the sketch's whole error contract."""
        import math

        from wbot_ray.pipelines import textops

        W = 64
        rows = textops.length_sketch_quantiles(SF0001, bin_width=W).take_all()
        t = pq.read_table(
            os.path.join(SF0001, "documents.parquet"), columns=["lang", "n_chars"]
        )
        langs = np.asarray(t.column("lang").to_pylist(), dtype=object)
        n_chars = t.column("n_chars").to_numpy(zero_copy_only=False)
        assert rows
        for r in rows:
            vals = np.sort(n_chars[langs == r["lang"]])
            assert r["n_docs"] == len(vals)
            exact = int(vals[math.ceil(r["p"] * len(vals)) - 1])
            assert exact <= r["q_chars"] < exact + W
            assert (r["q_chars"] + 1) % W == 0

    def test_normalize_text_non_ascii_matches_duckdb(self, ray_session, tmp_path):
        """The no-ASCII-assumption claim for normalize_text: NFC
        recomposition, control-whitespace collapse, and the ASCII-only
        case fold (Unicode specials like İ/ẞ untouched) all agree with
        the DuckDB oracle on planted non-ASCII inputs."""
        import duckdb
        import unicodedata

        import __ray_entry__ as entrymod
        from wbot_ray.pipelines import textops

        texts = [
            "Héllo   WORLD",       # NFD e+accent -> NFC é; space run
            "\tTabs\nand\r\nnewlines\f", # control ws + trim
            "İstanbul ẞTRASSE",          # Unicode case specials stay
            "plain ascii TEXT",
            "nbsp stays  here",      # U+00A0 is NOT ascii ws
        ]
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(["xx"] * len(texts), pa.string()),
                    "source": pa.array(["t"] * len(texts), pa.string()),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        got = {
            r["doc_id"]: (r["norm_hash"], r["n_norm_chars"], r["changed"])
            for r in textops.normalize_text(str(d)).take_all()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        want = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(entrymod.oracle_sql()["normalize_text"]).fetchall()
        }
        assert got == want
        # spot-check the NFC recomposition actually happened
        norm0 = unicodedata.normalize("NFC", texts[0])
        assert "é" in norm0 and got[0][2]  # é recomposed -> changed

    def test_audio_chunker_non_ascii_matches_duckdb(self, ray_session, tmp_path):
        """The no-ASCII-assumption claim: codepoint energies of a
        non-ASCII payload match the SQL oracle's ord(substr(...))."""
        import duckdb

        from wbot_ray.pipelines.multimodal import AudioChunker

        text = "héllo wörld — ünïcode µtest " * 40  # > 1 window, non-ASCII
        ch = AudioChunker()
        out = ch(
            pa.table(
                {
                    "doc_id": pa.array([1], pa.int64()),
                    "payload": pa.array([text.encode()], pa.binary()),
                }
            )
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE documents AS SELECT 1::BIGINT AS doc_id, ? AS text", [text])
        want = con.execute(entrymod.oracle_sql()["audio_features"]).df()
        got = out.to_pandas().sort_values("chunk_idx").reset_index(drop=True)
        want = want.sort_values("chunk_idx").reset_index(drop=True)
        assert got["energy"].tolist() == want["energy"].tolist()
        assert got["n_samples"].tolist() == want["n_samples"].tolist()
        assert len(got) > 1

    def test_price_quantile_rule_matches_duckdb_all_sizes(self):
        """The k = ceil(p·n) disc-quantile rule, checked against DuckDB
        for every group size 1..40 (and the exact fixture p values)."""
        import math

        import duckdb

        con = duckdb.connect()
        for n in range(1, 41):
            vals = list(range(10, 10 + n))
            for p in (0.25, 0.5, 0.75, 0.95):
                want = con.execute(
                    f"SELECT quantile_disc(x, {p}) FROM (SELECT UNNEST({vals}) AS x)"
                ).fetchone()[0]
                k = math.ceil(p * n)
                assert vals[k - 1] == want, (n, p)

    def test_group_topn_partial_stage_is_lossless(self, ray_session, tmp_path):
        """A batch-local top-n can never evict a global top-n row:
        verified on a skewed table read in multiple blocks."""
        from wbot_ray.pipelines import relational

        rng = np.random.RandomState(3)
        n = 400
        d = tmp_path / "sf"
        d.mkdir()
        ck = rng.randint(0, 12, n)
        price = (rng.randint(100, 100000, n) / 100.0).round(2)
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(range(n), pa.int64()),
                    "o_custkey": pa.array(ck.tolist(), pa.int64()),
                    "o_totalprice": pa.array(price.tolist(), pa.float64()),
                }
            ),
            os.path.join(d, "orders.parquet"),
        )
        got = sorted(
            (r["o_custkey"], r["rn"], r["o_orderkey"], r["price_cents"])
            for r in relational.group_topn(str(d), n=2).take_all()
        )
        cents_all = np.floor(price * 100 + 0.5).astype(np.int64)
        want = []
        for c in np.unique(ck):
            idx = np.where(ck == c)[0]
            order = sorted(idx, key=lambda i: (-cents_all[i], i))[:2]
            for rank, i in enumerate(order, 1):
                want.append((int(c), rank, int(i), int(cents_all[i])))
        assert got == sorted(want)


class TestTextTrainingOps:
    def test_tfidf_matches_bruteforce(self, tmp_path, ray_session):
        from wbot_ray.pipelines import textops

        texts = [
            "apple banana apple cherry",
            "banana banana durian",
            "apple cherry cherry cherry elder",
            "fig",
        ]
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        got = {
            (r["doc_id"], r["term_rank"]): (r["token"], r["tf"], r["df"])
            for r in textops.tfidf_topterms(str(d), k=2).take_all()
        }
        from collections import Counter

        df = Counter(tok for t in texts for tok in set(t.split(" ")))
        want = {}
        for i, t in enumerate(texts):
            tf = Counter(t.split(" "))
            ranked = sorted(tf, key=lambda w: (-tf[w], df[w], w))[:2]
            for rnk, w in enumerate(ranked, 1):
                want[(i, rnk)] = (w, tf[w], df[w])
        assert got == want

    def test_ngram_counts_threshold(self, tmp_path, ray_session):
        from wbot_ray.pipelines import textops

        # "a b" appears 6x (>=5); every other bigram fewer
        texts = ["a b c", "a b", "a b a b", "x", ""] + ["a b"] * 2
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        rows = textops.ngram_counts(str(d), min_count=5).take_all()
        assert {(r["ngram"], r["n_occurrences"]) for r in rows} == {("a b", 6)}

    def test_stratified_sample_exact_k_per_stratum(self, tmp_path, ray_session):
        from wbot_ray.pipelines import training
        from wbot_ray.pipelines.common import md5_lower64

        n = 300
        langs = ["en"] * 200 + ["de"] * 90 + ["xx"] * 10  # xx stratum < k
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(n), pa.int64()),
                    "lang": pa.array(langs, pa.string()),
                    "n_chars": pa.array([7] * n, pa.int64()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        rows = training.stratified_sample(str(d), k=20).take_all()
        by_lang: dict = {}
        for r in rows:
            by_lang.setdefault(r["lang"], []).append((r["strat_rank"], r["doc_id"]))
        assert len(by_lang["en"]) == 20 and len(by_lang["de"]) == 20
        assert len(by_lang["xx"]) == 10  # whole stratum when smaller than k
        # rank order == ascending hash order, brute-checked per stratum
        for lang, got in by_lang.items():
            ids = [i for i in range(n) if langs[i] == lang]
            want = sorted(ids, key=lambda i: (md5_lower64(f"strat:{i}"), i))[:20]
            assert [i for _, i in sorted(got)] == want


class TestPagerank:
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

    def test_symmetric_cycle_uniform(self, tmp_path, ray_session):
        """On a 4-cycle every node has in-mass == out-mass, so all
        ranks stay equal at every iteration."""
        from wbot_ray.pipelines import graph

        urls = [f"https://s{i}.com/" for i in range(4)]
        p = self._links(tmp_path, [(urls[i], urls[(i + 1) % 4]) for i in range(4)])
        rows = link = graph.link_pagerank(tmp_path.as_posix(), links_path=p).take_all()
        ranks = {r["url"]: r["rank_fp"] for r in rows}
        assert len(ranks) == 4
        assert len(set(ranks.values())) == 1

    def test_planted_graph_matches_sql_oracle(self, tmp_path, ray_session):
        """Cross-engine parity on an asymmetric graph with a hub, a
        dangling sink, and multi-edges (out-degree counts repeats)."""
        import duckdb

        from wbot_ray.pipelines import graph

        A, B, C, D = (f"https://h{i}.net/x" for i in range(4))
        edges = [(A, B), (A, C), (B, A), (C, A), (C, B), (A, B), (B, D)]
        p = self._links(tmp_path, edges)
        got = {
            r["url"]: r["rank_fp"]
            for r in graph.link_pagerank(tmp_path.as_posix(), links_path=p).take_all()
        }
        # distributed path (forced) must be bit-equal to the
        # driver-local default AND the SQL oracle
        got_dist = {
            r["url"]: r["rank_fp"]
            for r in graph.link_pagerank(
                tmp_path.as_posix(), links_path=p, local_threshold=0
            ).take_all()
        }
        want = {
            u: rf
            for u, rf in duckdb.connect()
            .execute(graph.pagerank_oracle_sql(p))
            .fetchall()
        }
        assert got == got_dist == want
        # the hub (A: 2 in-sources, one a 2x multi-edge target) outranks
        # the dangling sink D
        assert got[A] > got[D]


    def test_link_degrees_matches_sql_oracle(self, tmp_path, ray_session):
        """Degree counts on a multi-edge graph with a source-only and a
        sink-only node, against the SQL twin."""
        import duckdb

        import __ray_entry__ as em
        from wbot_ray.pipelines import graph

        A, B, C, D = (f"https://h{i}.net/x" for i in range(4))
        edges = [(A, B), (A, C), (B, A), (C, A), (C, B), (A, B), (B, D)]
        p = self._links(tmp_path, edges)
        got = {
            r["url"]: (r["out_deg"], r["in_deg"])
            for r in graph.link_degrees(tmp_path.as_posix(), links_path=p).take_all()
        }
        want = {
            u: (o, i)
            for u, o, i in duckdb.connect().execute(em._degrees_oracle_sql(p)).fetchall()
        }
        assert got == want
        assert got[A] == (3, 2) and got[D] == (0, 1)


class TestLinkComponents:
    def _links(self, tmp_path, rows, gated=None):
        p = os.path.join(tmp_path, "links.parquet")
        pq.write_table(
            pa.table(
                {
                    "src_url": pa.array([a for a, _ in rows], pa.string()),
                    "dst_url": pa.array([b for _, b in rows], pa.string()),
                    "gated": pa.array(gated or [True] * len(rows), pa.bool_()),
                }
            ),
            p,
        )
        return p

    @staticmethod
    def _union_find(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            if a != b:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
        comps: dict = {}
        for n in nodes:
            comps.setdefault(find(n), []).append(n)
        out = {}
        for members in comps.values():
            rep = min(members)
            for n in members:
                out[n] = (rep, len(members))
        return out

    def test_planted_graph_matches_oracle_and_union_find(self, tmp_path, ray_session):
        """Triangle + chain-with-multi-edge + self-loop singleton + a
        5-chain, against BOTH the SQL oracle and a brute union-find."""
        import duckdb

        from wbot_ray.pipelines import graph

        u = [f"https://s{i}.com/" for i in range(12)]
        edges = [
            (u[0], u[1]), (u[1], u[2]), (u[2], u[0]),
            (u[3], u[4]), (u[4], u[5]), (u[3], u[4]),
            (u[6], u[6]),
            (u[7], u[8]), (u[8], u[9]), (u[9], u[10]), (u[10], u[11]),
        ]
        p = self._links(tmp_path, edges)
        got = {
            r["url"]: (r["comp"], r["comp_size"])
            for r in graph.link_components(str(tmp_path), links_path=p).take_all()
        }
        # distributed star-contraction path must agree (local_threshold=0
        # forces it; the default takes the driver-local vectorized path)
        got_dist = {
            r["url"]: (r["comp"], r["comp_size"])
            for r in graph.link_components(
                str(tmp_path), links_path=p, local_threshold=0
            ).take_all()
        }
        want_sql = {
            url: (comp, size)
            for url, comp, size in duckdb.connect()
            .execute(graph.components_oracle_sql(p))
            .fetchall()
        }
        nodes = {x for e in edges for x in e}
        assert got == got_dist == want_sql == self._union_find(edges, nodes)
        assert got[u[6]] == (u[6], 1)  # self-loop-only url is a singleton
        assert got[u[7]][1] == 5

    def test_randomized_matches_union_find(self, tmp_path, ray_session):
        """Random sparse graphs (several seeds) against union-find."""
        import random

        from wbot_ray.pipelines import graph

        for seed in (1, 7):
            rng = random.Random(seed)
            urls = [f"https://r{seed}-{i}.org/p" for i in range(60)]
            edges = [
                (rng.choice(urls), rng.choice(urls)) for _ in range(55)
            ]
            p = self._links(tmp_path, edges)
            got = {
                r["url"]: (r["comp"], r["comp_size"])
                for r in graph.link_components(
                    str(tmp_path), links_path=p
                ).take_all()
            }
            nodes = {x for e in edges for x in e}
            assert got == self._union_find(edges, nodes)

    def test_long_chain_converges_in_log_rounds(self, tmp_path, ray_session):
        """A 120-node path is the high-diameter worst case — one
        component, representative = min url. ``max_iters=24`` is the
        O(log diameter) regression gate: plain hash-min would need
        ~119 rounds, the fused pointer-shortcut must land well under
        24 or the call raises."""
        from wbot_ray.pipelines import graph

        urls = [f"https://c{i:03d}.net/" for i in range(120)]
        p = self._links(tmp_path, list(zip(urls, urls[1:])))
        rows = graph.link_components(
            str(tmp_path), links_path=p, max_iters=24, local_threshold=0
        ).take_all()
        assert len(rows) == 120
        assert {r["comp"] for r in rows} == {urls[0]}
        assert all(r["comp_size"] == 120 for r in rows)

    def test_ungated_graph_is_empty(self, tmp_path, ray_session):
        from wbot_ray.pipelines import graph

        p = self._links(
            tmp_path, [("https://x.com/", "https://y.com/")], gated=[False]
        )
        assert graph.link_components(str(tmp_path), links_path=p).count() == 0


class TestHostGraph:
    def _links(self, tmp_path, rows, gated=None):
        p = os.path.join(tmp_path, "links.parquet")
        pq.write_table(
            pa.table(
                {
                    "src_url": pa.array([a for a, _ in rows], pa.string()),
                    "dst_url": pa.array([b for _, b in rows], pa.string()),
                    "gated": pa.array(gated or [True] * len(rows), pa.bool_()),
                }
            ),
            p,
        )
        return p

    @staticmethod
    def _got(ds):
        return {
            (r["src_host"], r["dst_host"]): (
                r["n_links"], r["n_src_urls"], r["n_dst_urls"]
            )
            for r in ds.take_all()
        }

    def test_planted_hosts_match_oracle(self, tmp_path, ray_session):
        """Ports, uppercase hosts, duplicate links, no-scheme junk and
        an ungated row — checked against the DuckDB oracle AND pinned
        expectations."""
        import duckdb

        from wbot_ray.pipelines import graph

        rows = [
            ("https://A.com/x", "https://b.com/1"),
            ("https://a.com/y", "https://b.com/1"),   # 2nd src page, same dst
            ("https://a.com/y", "https://b.com/1"),   # exact duplicate link
            ("https://a.com:8080/x", "https://b.com/2"),  # port = new host
            ("no-scheme-junk", "https://b.com/1"),     # '' host
            ("https://a.com/x", "https://A.COM/x"),    # intra-host (case-folded)
            ("https://gone.com/x", "https://b.com/1"),
        ]
        gated = [True] * 6 + [False]
        p = self._links(tmp_path, rows, gated)
        got = self._got(graph.host_graph(str(tmp_path), links_path=p))
        want = {
            (s, d): (n, ns, nd)
            for s, d, n, ns, nd in duckdb.connect()
            .execute(graph.host_graph_oracle_sql(p))
            .fetchall()
        }
        assert got == want
        assert got[("a.com", "b.com")] == (3, 2, 1)
        assert got[("a.com:8080", "b.com")] == (1, 1, 1)
        assert got[("", "b.com")] == (1, 1, 1)
        assert got[("a.com", "a.com")] == (1, 1, 1)
        assert ("gone.com", "b.com") not in got

    def test_randomized_matches_oracle(self, tmp_path, ray_session):
        """Random url fragments (schemes, ports, paths, junk) — host
        extraction + counts pinned cross-engine."""
        import random

        import duckdb

        from wbot_ray.pipelines import graph

        rng = random.Random(11)
        def url():
            scheme = rng.choice(["https://", "http://", "", "ftp://"])
            host = rng.choice(["a.com", "B.org", "c.net:81", "d-e.io", ""])
            path = rng.choice(["/", "/p?q=1", "/x#f", ""])
            return f"{scheme}{host}{path}"

        rows = [(url(), url()) for _ in range(300)]
        p = self._links(tmp_path, rows)
        got = self._got(graph.host_graph(str(tmp_path), links_path=p))
        want = {
            (s, d): (n, ns, nd)
            for s, d, n, ns, nd in duckdb.connect()
            .execute(graph.host_graph_oracle_sql(p))
            .fetchall()
        }
        assert got == want


class TestHostComponents:
    def test_site_islands_match_oracle(self, tmp_path, ray_session):
        """Two islands of sites + one intra-linking-only singleton
        site, with several urls per host — vs the SQL oracle and
        pinned expectations."""
        import duckdb

        from wbot_ray.pipelines import graph

        rows = [
            # island 1: a.com <-> b.com <-> c.com (many urls per host)
            ("https://a.com/1", "https://b.com/1"),
            ("https://a.com/2", "https://b.com/2"),
            ("https://b.com/3", "https://c.com/1"),
            # island 2: x.org -> y.org
            ("https://x.org/1", "https://y.org/1"),
            # self-linking-only site: singleton island
            ("https://solo.net/1", "https://solo.net/2"),
        ]
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
        got = {
            r["host"]: (r["comp"], r["comp_size"])
            for r in graph.host_components(str(tmp_path), links_path=p).take_all()
        }
        want = {
            h: (c, n)
            for h, c, n in duckdb.connect()
            .execute(graph.host_components_oracle_sql(p))
            .fetchall()
        }
        assert got == want
        assert got["a.com"] == ("a.com", 3)
        assert got["c.com"] == ("a.com", 3)
        assert got["x.org"] == ("x.org", 2)
        assert got["solo.net"] == ("solo.net", 1)
        # the DISTRIBUTED star-contraction path (local_threshold=0)
        # returns the identical labeling — scheduler choice only
        dist = {
            r["host"]: (r["comp"], r["comp_size"])
            for r in graph.host_components(
                str(tmp_path), links_path=p, local_threshold=0
            ).take_all()
        }
        assert dist == want


class TestHostPagerank:
    def _links(self, tmp_path, rows, gated=None):
        p = os.path.join(tmp_path, "links.parquet")
        pq.write_table(
            pa.table(
                {
                    "src_url": pa.array([a for a, _ in rows], pa.string()),
                    "dst_url": pa.array([b for _, b in rows], pa.string()),
                    "gated": pa.array(gated or [True] * len(rows), pa.bool_()),
                }
            ),
            p,
        )
        return p

    def test_planted_hosts_match_oracle(self, tmp_path, ray_session):
        """Multi page-level links between the same host pair collapse
        to ONE edge (out-degree 1), self-loops feed own rank, case is
        folded, ungated rows drop — vs the unrolled DuckDB twin."""
        import duckdb

        from wbot_ray.pipelines import graph

        rows = [
            # a.com -> b.com realized by THREE page-level links
            ("https://a.com/1", "https://b.com/1"),
            ("https://A.com/2", "https://b.com/2"),
            ("https://a.com/2", "https://B.COM/1"),
            # hub: everyone links h.net
            ("https://a.com/1", "https://h.net/"),
            ("https://b.com/1", "https://h.net/"),
            ("https://c.org/1", "https://h.net/"),
            # c.org also links a.com; h.net links back to a.com only
            ("https://c.org/1", "https://a.com/1"),
            ("https://h.net/", "https://a.com/9"),
            # self-linking-only host
            ("https://solo.io/x", "https://solo.io/y"),
            # ungated: must not appear
            ("https://gone.com/x", "https://h.net/"),
        ]
        gated = [True] * 9 + [False]
        p = self._links(tmp_path, rows, gated)
        got = {
            r["host"]: r["rank_fp"]
            for r in graph.host_pagerank(str(tmp_path), links_path=p).take_all()
        }
        want = {
            h: rf
            for h, rf in duckdb.connect()
            .execute(graph.host_pagerank_oracle_sql(p))
            .fetchall()
        }
        assert got == want
        # the hub with 3 distinct in-hosts outranks the pair-collapsed
        # b.com (1 in-edge despite 3 page-level links), and gone.com is
        # absent while the self-loop singleton survives as a node
        assert got["h.net"] > got["b.com"]
        assert "gone.com" not in got
        assert "solo.io" in got
        # the DISTRIBUTED path (local_threshold=0) is bit-identical —
        # the local tiny-graph shortcut is a scheduler choice only
        dist = {
            r["host"]: r["rank_fp"]
            for r in graph.host_pagerank(
                str(tmp_path), links_path=p, local_threshold=0
            ).take_all()
        }
        assert dist == want

    def test_randomized_matches_oracle(self, tmp_path, ray_session):
        """Random host-level graph with dup links, ports, junk hosts —
        bit-exact vs the SQL twin."""
        import random

        import duckdb

        from wbot_ray.pipelines import graph

        rng = random.Random(13)

        def url():
            scheme = rng.choice(["https://", "http://", ""])
            host = rng.choice(["a.com", "B.org", "c.net:81", "d-e.io", "x.co", ""])
            path = rng.choice(["/", "/p?q=1", "/x#f", ""])
            return f"{scheme}{host}{path}"

        rows = [(url(), url()) for _ in range(400)]
        p = self._links(tmp_path, rows)
        got = {
            r["host"]: r["rank_fp"]
            for r in graph.host_pagerank(str(tmp_path), links_path=p).take_all()
        }
        want = {
            h: rf
            for h, rf in duckdb.connect()
            .execute(graph.host_pagerank_oracle_sql(p))
            .fetchall()
        }
        assert got == want

    def test_host_hits_matches_oracle_both_paths(self, tmp_path, ray_session):
        """HITS hubs/authorities vs the unrolled max-normalized integer
        twin: the all-linking host is the top hub, the all-linked host
        the top authority; the DISTRIBUTED path (local_threshold=0,
        hash_join + keyed-sum composition) is bit-identical to the
        driver-local numpy iteration."""
        import duckdb

        from wbot_ray.pipelines import graph

        rows = [
            # hub.com links everyone; everyone links auth.net
            ("https://hub.com/1", "https://a.com/x"),
            ("https://hub.com/2", "https://b.org/x"),
            ("https://hub.com/3", "https://auth.net/x"),
            ("https://a.com/1", "https://auth.net/y"),
            ("https://b.org/1", "https://auth.net/z"),
            # pair-collapse: 2 page links realize one host edge
            ("https://a.com/2", "https://B.ORG/q"),
            ("https://A.COM/3", "https://b.org/r"),
            # self-loop only
            ("https://solo.io/x", "https://solo.io/y"),
            # ungated: absent
            ("https://gone.com/x", "https://auth.net/"),
        ]
        gated = [True] * 8 + [False]
        p = self._links(tmp_path, rows, gated)
        got = {
            r["host"]: (r["hub_fp"], r["auth_fp"])
            for r in graph.host_hits(str(tmp_path), links_path=p).take_all()
        }
        want = {
            h: (hf, af)
            for h, hf, af in duckdb.connect()
            .execute(graph.host_hits_oracle_sql(p))
            .fetchall()
        }
        assert got == want
        assert "gone.com" not in got
        assert max(got, key=lambda h: got[h][0]) == "hub.com"
        assert max(got, key=lambda h: got[h][1]) == "auth.net"
        dist = {
            r["host"]: (r["hub_fp"], r["auth_fp"])
            for r in graph.host_hits(
                str(tmp_path), links_path=p, local_threshold=0
            ).take_all()
        }
        assert dist == want

    def test_host_hits_randomized_matches_oracle(self, tmp_path, ray_session):
        import random

        import duckdb

        from wbot_ray.pipelines import graph

        rng = random.Random(31)

        def url():
            scheme = rng.choice(["https://", "http://"])
            host = rng.choice(["a.com", "B.org", "c.net:81", "d-e.io", "x.co"])
            return f"{scheme}{host}/p{rng.randint(0, 9)}"

        rows = [(url(), url()) for _ in range(300)]
        p = self._links(tmp_path, rows)
        got = {
            r["host"]: (r["hub_fp"], r["auth_fp"])
            for r in graph.host_hits(str(tmp_path), links_path=p).take_all()
        }
        want = {
            h: (hf, af)
            for h, hf, af in duckdb.connect()
            .execute(graph.host_hits_oracle_sql(p))
            .fetchall()
        }
        assert got == want

    def test_frontier_priority_matches_oracle(self, tmp_path, ray_session):
        """Broadcast rank join + integer depth damping: a page on a
        never-linked host scores 0; deeper paths on the same host
        score strictly less; parity with the composed SQL twin."""
        import duckdb

        from wbot_ray.pipelines import graph

        links = [
            ("https://a.com/1", "https://b.com/1"),
            ("https://b.com/1", "https://a.com/1"),
            ("https://a.com/2", "https://b.com/2"),
        ]
        lp = self._links(tmp_path, links)
        pages = [
            "https://a.com/x",
            "https://a.com/x/y/z",
            "https://never.io/p",
            "https://b.com/",
        ]
        pp = os.path.join(tmp_path, "pages.parquet")
        pq.write_table(pa.table({"url": pa.array(pages, pa.string())}), pp)
        got = {
            r["url"]: (r["host"], r["rank_fp"], r["path_depth"], r["priority_fp"])
            for r in graph.frontier_priority(
                str(tmp_path), links_path=lp, pages_path=pp
            ).take_all()
        }
        want = {
            u: (h, rf, d, pr)
            for u, h, rf, d, pr in duckdb.connect()
            .execute(graph.frontier_priority_oracle_sql(lp, pp))
            .fetchall()
        }
        assert got == want
        assert got["https://never.io/p"][1] == 0
        assert got["https://a.com/x/y/z"][3] < got["https://a.com/x"][3]
        a_rank = got["https://a.com/x"][1]
        assert got["https://a.com/x"][3] == a_rank // 2  # depth 1


class TestAnchorTexts:
    def _pages(self, tmp_path, rows):
        p = os.path.join(tmp_path, "pages.parquet")
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([u for u, _ in rows], pa.string()),
                    "html": pa.array([h for _, h in rows], pa.binary()),
                }
            ),
            p,
        )
        return p

    def test_planted_anchors_match_oracle(self, tmp_path, ray_session):
        """Relative hrefs canonicalize onto the page url, counts fold
        across pages, the top anchor breaks ties lexicographically,
        unresolvable hrefs drop — vs the side-table SQL twin AND pinned
        expectations."""
        import duckdb

        from wbot_ray.config import CrawlConfig
        from wbot_ray.pipelines import anchors

        rows = [
            (
                "https://a.com/p1",
                b"<a href='/t'>home</a><a href='/t'>home</a>"
                b"<a href='https://b.com/x'>ext</a>"
                b"<a href='https://bad.invalidtld/q'>j</a>",
            ),
            (
                "https://a.com/p2",
                b"<a href='/t'>start</a><a href='/t'>home</a>"
                b"<a href='/only'>one</a>",
            ),
            # tie case: /z gets 'aa' x1 and 'bb' x1 -> top must be 'aa'
            ("https://b.com/p", b"<a href='/z'>bb</a><a href='/z'>aa</a>"),
        ]
        p = self._pages(tmp_path, rows)
        got = {
            r["dst_url"]: (r["n_anchors"], r["n_texts"], r["top_anchor"], r["top_cnt"])
            for r in anchors.anchor_texts(
                str(tmp_path), pages_path=p, max_body=1 << 20
            ).take_all()
        }
        side = anchors.write_anchor_table(
            p, os.path.join(str(tmp_path), "oracle"), CrawlConfig(max_body_size=1 << 20)
        )
        want = {
            d: (n, t, top, tc)
            for d, n, t, top, tc in duckdb.connect()
            .execute(anchors.anchor_texts_oracle_sql(side))
            .fetchall()
        }
        assert got == want
        assert got["https://a.com/t"] == (4, 2, "home", 3)
        assert got["https://b.com/z"] == (2, 2, "aa", 1)
        assert not any("invalidtld" in d for d in got)

    def test_truncation_is_applied_before_parse(self, tmp_path, ray_session):
        """Anchors past max_body never appear — the M7 slice the crawl
        itself applies (engine and side table agree on the same cut)."""
        import duckdb

        from wbot_ray.config import CrawlConfig
        from wbot_ray.pipelines import anchors

        head = b"<a href='/kept'>k</a>"
        body = head + b"x" * 200 + b"<a href='/cut'>c</a>"
        p = self._pages(tmp_path, [("https://a.com/p", body)])
        cut = len(head) + 100
        got = {
            r["dst_url"]
            for r in anchors.anchor_texts(
                str(tmp_path), pages_path=p, max_body=cut
            ).take_all()
        }
        assert got == {"https://a.com/kept"}
        side = anchors.write_anchor_table(
            p, os.path.join(str(tmp_path), "oracle"), CrawlConfig(max_body_size=cut)
        )
        want = {
            d for (d,) in duckdb.connect()
            .execute(f"SELECT DISTINCT dst_url FROM read_parquet('{side}')")
            .fetchall()
        }
        assert want == got

    def test_randomized_matches_oracle(self, tmp_path, ray_session):
        """Random pages with shared anchor vocabulary — fold + arg-max
        pinned cross-engine."""
        import random

        import duckdb

        from wbot_ray.config import CrawlConfig
        from wbot_ray.pipelines import anchors

        rng = random.Random(7)
        texts = ["home", "next", "prev", "more info", "", "download"]
        rows = []
        for i in range(60):
            parts = []
            for _ in range(rng.randrange(0, 8)):
                href = rng.choice(["/a", "/b", "x/y", "https://c.io/z", "?q=1"])
                parts.append(f"<a href='{href}'>{rng.choice(texts)}</a>")
            rows.append((f"https://s{rng.randrange(3)}.com/p{i}", "".join(parts).encode()))
        p = self._pages(tmp_path, rows)
        got = {
            r["dst_url"]: (r["n_anchors"], r["n_texts"], r["top_anchor"], r["top_cnt"])
            for r in anchors.anchor_texts(
                str(tmp_path), pages_path=p, max_body=1 << 20
            ).take_all()
        }
        side = anchors.write_anchor_table(
            p, os.path.join(str(tmp_path), "oracle"), CrawlConfig(max_body_size=1 << 20)
        )
        want = {
            d: (n, t, top, tc)
            for d, n, t, top, tc in duckdb.connect()
            .execute(anchors.anchor_texts_oracle_sql(side))
            .fetchall()
        }
        assert got == want


class TestUrlFeatures:
    def _pages(self, tmp_path, urls):
        p = os.path.join(tmp_path, "pages.parquet")
        pq.write_table(pa.table({"url": pa.array(urls, pa.string())}), p)
        return p

    def test_adversarial_urls_match_oracle(self, tmp_path, ray_session):
        """Query-in-fragment, fragment-in-query, empty path, dotted
        dirs, ports, uppercase — both engines compile the same RE2, so
        every row must agree; plus pinned anatomy expectations."""
        import duckdb

        from wbot_ray.pipelines import urlstats

        urls = [
            "https://a.com/x/y/z.html?a=1&b=2&c=3",
            "https://A.COM:8080/",
            "http://b.org",                      # no path at all
            "https://c.net/p#frag?notquery=1",   # '?' after '#'
            "https://c.net/p?q=1#frag",
            "https://d.io/dir.v2/file",          # dot in dir, no ext
            "https://d.io/archive.tar.gz",
            "ftp://e.gov/a//b/?x",               # empty segment, bare '?'
            "no-scheme-at-all/path?y",
            "https://f.com/?#",
        ]
        p = self._pages(tmp_path, urls)
        got = {
            r["url"]: (
                r["scheme"], r["host"], r["path_depth"],
                r["n_params"], r["has_fragment"], r["ext"],
            )
            for r in urlstats.url_features(str(tmp_path), pages_path=p).take_all()
        }
        want = {
            u: (s, h, d, n, f, e)
            for u, s, h, d, n, f, e in duckdb.connect()
            .execute(urlstats.url_features_oracle_sql(p))
            .fetchall()
        }
        assert got == want
        assert got["https://a.com/x/y/z.html?a=1&b=2&c=3"] == (
            "https", "a.com", 3, 3, False, "html",
        )
        assert got["https://A.COM:8080/"] == ("https", "a.com:8080", 1, 0, False, "")
        assert got["http://b.org"] == ("http", "b.org", 0, 0, False, "")
        assert got["https://d.io/archive.tar.gz"] == ("https", "d.io", 1, 0, False, "gz")
        assert got["https://c.net/p?q=1#frag"][4] is True

    def test_randomized_matches_oracle(self, tmp_path, ray_session):
        import random

        import duckdb

        from wbot_ray.pipelines import urlstats

        rng = random.Random(23)
        frag = ["", "#f", "#a?b", "#"]
        qs = ["", "?", "?a=1", "?a=1&b=2", "?&", "?a&&b"]
        paths = ["", "/", "/x", "/x/y.z", "/x.y/z", "//", "/a.PDF"]
        hosts = ["a.com", "B.org:9", "c-d.net", ""]
        schemes = ["https://", "http://", "", "s3://"]
        urls = list(
            {
                f"{rng.choice(schemes)}{rng.choice(hosts)}{rng.choice(paths)}"
                f"{rng.choice(qs)}{rng.choice(frag)}"
                for _ in range(300)
            }
        )
        p = self._pages(tmp_path, urls)
        got = {
            r["url"]: (
                r["scheme"], r["host"], r["path_depth"],
                r["n_params"], r["has_fragment"], r["ext"],
            )
            for r in urlstats.url_features(str(tmp_path), pages_path=p).take_all()
        }
        want = {
            u: (s, h, d, n, f, e)
            for u, s, h, d, n, f, e in duckdb.connect()
            .execute(urlstats.url_features_oracle_sql(p))
            .fetchall()
        }
        assert got == want

    def test_link_gate_stats_matches_oracle(self, tmp_path, ray_session):
        import duckdb

        from wbot_ray.pipelines import urlstats

        p = os.path.join(tmp_path, "links.parquet")
        roots = ["a.com", "b.org", "a.com", "a.com", "c.net", "b.org"]
        gated = [True, False, True, False, True, True]
        pq.write_table(
            pa.table(
                {
                    "dst_root": pa.array(roots, pa.string()),
                    "gated": pa.array(gated, pa.bool_()),
                }
            ),
            p,
        )
        got = {
            r["dst_root"]: (r["n_links"], r["n_gated"], r["n_blocked"])
            for r in urlstats.link_gate_stats(str(tmp_path), links_path=p).take_all()
        }
        want = {
            root: (n, g, b)
            for root, n, g, b in duckdb.connect()
            .execute(urlstats.link_gate_stats_oracle_sql(p))
            .fetchall()
        }
        assert got == want
        assert got["a.com"] == (3, 2, 1)

    def test_url_blocklist_suffix_semantics(self, tmp_path, ray_session):
        """Suffix-closed domain matching: subdomains block, lookalike
        prefixes don't; path regex is case-insensitive; parity with the
        SQL twin."""
        import duckdb

        from wbot_ray.pipelines import urlstats

        urls = [
            "https://notsite0.com/p",          # exact -> dom_blocked
            "https://a.notsite0.com/p",        # subdomain -> dom_blocked
            "https://xnotsite0.com/p",         # lookalike -> keep
            "https://ok.com/CHAIN/9",          # (?i) path hit
            "https://ok.com/chained/9",        # needs /chain/ segment -> keep
            "https://ok.com/fine",
        ]
        p = self._pages(tmp_path, urls)
        got = {
            r["url"]: (r["dom_blocked"], r["path_blocked"], r["keep"])
            for r in urlstats.url_blocklist(str(tmp_path), pages_path=p).take_all()
        }
        want = {
            u: (d, pb, k)
            for u, _h, d, pb, k in duckdb.connect()
            .execute(urlstats.url_blocklist_oracle_sql(p))
            .fetchall()
        }
        assert got == want
        assert got["https://notsite0.com/p"] == (True, False, False)
        assert got["https://a.notsite0.com/p"] == (True, False, False)
        assert got["https://xnotsite0.com/p"] == (False, False, True)
        assert got["https://ok.com/CHAIN/9"] == (False, True, False)
        assert got["https://ok.com/chained/9"] == (False, False, True)


class TestSnapshotLatest:
    def test_planted_snapshots_match_oracle(self, tmp_path, ray_session):
        """Urls chosen to hit every synthesis arm (len%3==1 →
        re-crawl, len%7==2 → second re-crawl), plus a url DUPLICATED
        in the raw input with different timestamps — the cross-batch
        argmax the operator must fold; parity with the SQL twin and
        pinned counts."""
        import datetime as dt

        import duckdb

        from wbot_ray.pipelines import maintenance

        def u(n: int, tag: str) -> str:
            # a url of exactly n chars: scheme+host = 14 chars
            base = f"https://s.com/{tag}"
            return base + "x" * (n - len(base))

        t0 = dt.datetime(2024, 5, 1)
        rows = [
            (u(22, "a"), t0, "alpha text"),        # 22%3=1 -> 2 snapshots
            (u(23, "b"), t0, "beta"),              # 23%7=2 -> 2 snapshots
            (u(28, "c"), t0, "gamma"),             # 28%3=1 and 28%7=0 -> 2
            (u(24, "d"), t0, "delta"),             # neither -> 1
            # duplicate raw url, later capture wins; 24%3=0, 24%7=3
            (u(24, "d"), t0 + dt.timedelta(days=2), "delta longer text"),
        ]
        p = os.path.join(tmp_path, "pages.parquet")
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([r[0] for r in rows], pa.string()),
                    "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "text": pa.array([r[2] for r in rows], pa.string()),
                }
            ),
            p,
        )
        got = {
            r["url"]: (r["warc_ts"], r["n_chars"], r["n_snapshots"])
            for r in maintenance.snapshot_latest(
                str(tmp_path), pages_path=p
            ).take_all()
        }
        want = {
            url: (ts, nc, ns)
            for url, ts, nc, ns in duckdb.connect()
            .execute(maintenance.snapshot_latest_oracle_sql(p))
            .fetchall()
        }
        assert got == want
        assert got[u(22, "a")] == (t0 + dt.timedelta(hours=1), 18, 2)
        assert got[u(23, "b")] == (t0 + dt.timedelta(hours=2), 18, 2)
        assert got[u(24, "d")] == (
            t0 + dt.timedelta(days=2), len("delta longer text"), 2,
        )


class TestDecontaminate:
    def test_planted_copy_is_flagged(self, planted_dir, ray_session):
        """planted_dir's benchmark holdout (doc_id % 50 == 0) is docs
        {0, 100} — identical texts; doc 101 is an exact copy of doc 0,
        so every one of its shingles hits the benchmark set. The other
        docs are independent random soups (no shared 3-grams)."""
        from wbot_ray.pipelines.textops import decontaminate

        rows = {r["doc_id"]: r for r in decontaminate(planted_dir).take_all()}
        assert 0 not in rows and 100 not in rows  # holdout never emitted
        assert rows[101]["contaminated"] and rows[101]["n_hits"] == 38
        clean = [i for i, r in rows.items() if not r["contaminated"]]
        assert 5 in clean and rows[5]["n_hits"] == 0
        assert set(rows) == {i for i in range(20) if i} | {101, 102, 103}

    def test_matches_sql_oracle_on_planted(self, planted_dir, ray_session):
        import duckdb
        import pandas as pd

        from wbot_ray.pipelines.textops import decontaminate

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{planted_dir}/documents.parquet')"
        )
        got = decontaminate(planted_dir).to_pandas()
        want = con.execute(entrymod._decontaminate_oracle_sql()).df()

        def canon(df):
            df = df[sorted(df.columns)]
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        pd.testing.assert_frame_equal(
            canon(got), canon(want), check_dtype=False, check_exact=True
        )


class TestPriceBandJoin:
    def test_bands_partition_the_fact_table(self, ray_session):
        """Every lineitem lands in exactly one band: band counts sum to
        the table's row count, and each band's bounds contain its rows
        (brute-checked against the raw column)."""
        import pyarrow.parquet as pq_

        from wbot_ray.pipelines.relational import PRICE_BANDS_LO_CENTS, price_band_join

        rows = price_band_join(SF0001).take_all()
        li = pq_.read_table(SF0001 + "/lineitem.parquet", columns=["l_extendedprice"])
        c = np.floor(
            li.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        assert sum(r["n_items"] for r in rows) == len(c)
        bounds = np.asarray(PRICE_BANDS_LO_CENTS + (np.iinfo(np.int64).max,))
        for r in rows:
            lo, hi = bounds[r["band"]], bounds[r["band"] + 1]
            mask = (c >= lo) & (c < hi)
            assert r["lo_cents"] == lo
            assert r["n_items"] == int(mask.sum())
            assert r["sum_price_cents"] == int(c[mask].sum())


class TestDedupKeep:
    def test_planted_clusters_collapse_to_canonicals(self, planted_dir, ray_session):
        """Clusters {0,100,101}, {1,102}, {2,103} at threshold 0.5 →
        only the min-id member of each survives; every singleton stays."""
        kept = {r["doc_id"] for r in dedup.dedup_keep(planted_dir, threshold=0.5).take_all()}
        assert kept == set(range(20))  # 100,101,102,103 dropped; 0,1,2 kept

    def test_no_duplicates_passthrough(self, ray_session, tmp_path):
        """A corpus with no near-dups comes back whole."""
        d = tmp_path / "clean"
        d.mkdir()
        rng = np.random.RandomState(3)
        texts = [
            " ".join(f"q{rng.randint(0, 9000)}y{i}" for _ in range(30)) for i in range(12)
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(12), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(["en"] * 12, pa.string()),
                    "source": pa.array(["s"] * 12, pa.string()),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        kept = {r["doc_id"] for r in dedup.dedup_keep(str(d)).take_all()}
        assert kept == set(range(12))


class TestGlobalShuffle:
    def test_dense_permutation_in_hash_order(self, ray_session):
        """pos is a dense 0..n-1 permutation, ordered exactly by the
        salted md5 key (brute-recomputed), shard is round-robin."""
        from wbot_ray.pipelines.common import md5_lower64
        from wbot_ray.pipelines.training import global_shuffle

        rows = global_shuffle(SF0001, num_shards=4).take_all()
        n = len(rows)
        assert sorted(r["pos"] for r in rows) == list(range(n))
        assert all(r["shard"] == r["pos"] % 4 for r in rows)
        want_order = sorted(
            (r["doc_id"] for r in rows), key=lambda i: (md5_lower64(f"shuf:{i}"), i)
        )
        got_order = [r["doc_id"] for r in sorted(rows, key=lambda r: r["pos"])]
        assert got_order == want_order


class TestQualityScore:
    def test_rule_bitmask_semantics(self, ray_session, tmp_path):
        """Hand-built docs hitting each rule in isolation: too short
        (bit0), long words (bit1), symbol soup (bit2), no stopwords
        (bit3), and one passing doc."""
        from wbot_ray.pipelines.textops import quality_score

        docs = {
            0: " ".join(["the", "of"] + ["word"] * 19 + ["words"] * 19),  # passes: n=40, mwl=440, 2 stops
            1: "the of in is on a to and",  # 8 words → bit0 (mwl ok: 16*100//8=200→bit1 too)
            2: " ".join(["the", "of"] + ["extraordinarily"] * 38),  # long words → bit1
            3: " ".join(["the", "of"] + ["#!"] * 38),  # symbols → bit2 (and bit1: mwl<380? (3+2+38*2)*100//40=207 → bit1 too)
            4: " ".join(["word"] * 40),  # no stopwords → bit3 (mwl=400 ok)
        }
        ids = sorted(docs)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array([docs[i] for i in ids], pa.string()),
                    "lang": pa.array(["en"] * len(ids), pa.string()),
                    "source": pa.array(["s"] * len(ids), pa.string()),
                    "n_chars": pa.array([len(docs[i]) for i in ids], pa.int64()),
                }
            ),
            os.path.join(tmp_path, "documents.parquet"),
        )
        got = {r["doc_id"]: r for r in quality_score(str(tmp_path)).take_all()}
        assert got[0]["passes"] and got[0]["rules_failed"] == 0
        assert got[1]["rules_failed"] & 1  # word count
        assert got[2]["rules_failed"] == 2  # mean word length only
        assert got[3]["rules_failed"] & 4  # symbol ratio
        assert got[4]["rules_failed"] == 8  # stopwords only
        assert not any(got[i]["passes"] for i in (1, 2, 3, 4))


class TestHashJoin:
    """The generic large-large shuffle join (wbot_ray.pipelines.join)."""

    def _write(self, d, name, table):
        pq.write_table(table, os.path.join(d, f"{name}.parquet"))

    def test_inner_join_planted(self, tmp_path, ray_session):
        """Keys on one side only drop; multi-match keys fan out; values
        land next to the right key — checked against a dict-built truth."""
        import ray.data

        from wbot_ray.pipelines.join import hash_join

        left = pa.table(
            {
                "k": pa.array([1, 2, 2, 3, 99], pa.int64()),
                "lv": pa.array(["a", "b", "c", "d", "z"], pa.string()),
            }
        )
        right = pa.table(
            {
                "k": pa.array([2, 3, 3, 4], pa.int64()),
                "rv": pa.array([20, 30, 31, 40], pa.int64()),
            }
        )
        got = hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right), key="k", num_buckets=4
        ).to_pandas()
        rows = sorted(map(tuple, got[["k", "lv", "rv"]].itertuples(index=False)))
        assert rows == [
            (2, "b", 20),
            (2, "c", 20),
            (3, "d", 30),
            (3, "d", 31),
        ]

    def test_string_key_and_collision_error(self, ray_session):
        import ray.data

        from wbot_ray.pipelines.join import hash_join

        left = ray.data.from_arrow(
            pa.table({"k": pa.array(["x", "y"]), "v": pa.array([1, 2], pa.int64())})
        )
        right = ray.data.from_arrow(
            pa.table({"k": pa.array(["y", "z"]), "w": pa.array([7, 8], pa.int64())})
        )
        got = hash_join(left, right, key="k", num_buckets=3).to_pandas()
        assert list(map(tuple, got[["k", "v", "w"]].itertuples(index=False))) == [
            ("y", 2, 7)
        ]
        bad = ray.data.from_arrow(
            pa.table({"k": pa.array(["y"]), "v": pa.array([9], pa.int64())})
        )
        with pytest.raises(ValueError, match="collide"):
            hash_join(left, bad, key="k")

    def test_composite_key_matches_duckdb(self, ray_session):
        """Mixed-type COMPOSITE key (int64, string): random tables with
        planted partial overlaps (same int different string and vice
        versa must NOT match) checked value-for-value against DuckDB."""
        import duckdb
        import ray.data

        from wbot_ray.pipelines.join import hash_join

        rng = np.random.RandomState(5)
        n = 400
        left = pa.table(
            {
                "uid": pa.array(rng.randint(0, 20, n), pa.int64()),
                "day": pa.array(
                    [f"d{v}" for v in rng.randint(0, 7, n)], pa.string()
                ),
                "lv": pa.array(rng.randint(0, 1000, n), pa.int64()),
            }
        )
        right = pa.table(
            {
                "uid": pa.array(rng.randint(0, 25, 60), pa.int64()),
                "day": pa.array(
                    [f"d{v}" for v in rng.randint(0, 9, 60)], pa.string()
                ),
                "rv": pa.array(rng.randint(0, 1000, 60), pa.int64()),
            }
        )
        for jt in ("inner", "left semi", "left anti"):
            got = hash_join(
                ray.data.from_arrow(left),
                ray.data.from_arrow(right),
                key=["uid", "day"],
                num_buckets=5,
                join_type=jt,
            ).to_pandas()
            con = duckdb.connect()
            con.register("l", left)
            con.register("r", right)
            sql = {
                "inner": "SELECT l.uid, l.day, lv, rv FROM l JOIN r USING (uid, day)",
                "left semi": "SELECT uid, day, lv FROM l WHERE EXISTS "
                "(SELECT 1 FROM r WHERE r.uid=l.uid AND r.day=l.day)",
                "left anti": "SELECT uid, day, lv FROM l WHERE NOT EXISTS "
                "(SELECT 1 FROM r WHERE r.uid=l.uid AND r.day=l.day)",
            }[jt]
            want = con.execute(sql).df()
            gs = sorted(map(tuple, got[sorted(got.columns)].itertuples(index=False)))
            ws = sorted(map(tuple, want[sorted(want.columns)].itertuples(index=False)))
            assert gs == ws, jt

    def test_hot_key_combine_bounds_exchange(self, tmp_path, ray_session):
        """Planted skew: ONE orderkey owns 90% of lineitem rows across
        many input row groups. The map-side combine must collapse it to
        ~one partial per batch (so the exchange stays O(batches), not
        O(rows)) and the final sums must still be exact."""
        from wbot_ray.pipelines.join import order_priority_revenue

        n_hot, n_cold = 9_000, 1_000
        ok = np.concatenate([np.full(n_hot, 7, np.int64), np.arange(100, 100 + n_cold)])
        price = np.full(len(ok), 10.00)
        disc = np.zeros(len(ok))
        self._write(
            str(tmp_path),
            "lineitem",
            pa.table(
                {
                    "l_orderkey": pa.array(ok, pa.int64()),
                    "l_extendedprice": pa.array(price, pa.float64()),
                    "l_discount": pa.array(disc, pa.float64()),
                }
            ),
        )
        okeys = np.concatenate([[7], np.arange(100, 100 + n_cold)])
        self._write(
            str(tmp_path),
            "orders",
            pa.table(
                {
                    "o_orderkey": pa.array(okeys, pa.int64()),
                    "o_orderpriority": pa.array(
                        ["1-URGENT"] + ["5-LOW"] * n_cold, pa.string()
                    ),
                }
            ),
        )
        got = {
            r["o_orderpriority"]: r
            for r in order_priority_revenue(str(tmp_path), num_buckets=8).take_all()
        }
        # 1000 cents * 100 (no discount) = 100_000 centi-cents per item
        assert got["1-URGENT"]["n_orders"] == 1
        assert got["1-URGENT"]["n_items"] == n_hot
        assert got["1-URGENT"]["revenue_centi"] == n_hot * 100_000
        assert got["5-LOW"]["n_orders"] == n_cold
        assert got["5-LOW"]["revenue_centi"] == n_cold * 100_000


class TestDailyActiveUsers:
    def test_planted_distincts(self, tmp_path, ray_session):
        """A user appearing 5× in one day counts once that day; the same
        user on another day counts again there."""
        import datetime as dt

        from wbot_ray.pipelines.relational import daily_active_users

        d0 = dt.datetime(2025, 3, 1, 10, 0)
        d1 = dt.datetime(2025, 3, 2, 10, 0)
        ts = [d0] * 5 + [d0.replace(hour=23)] + [d1] * 2
        users = [7, 7, 7, 7, 7, 8, 7, 9]
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(ts)), pa.int64()),
                    "ts": pa.array(ts, pa.timestamp("us")),
                    "user_id": pa.array(users, pa.int64()),
                }
            ),
            os.path.join(tmp_path, "events.parquet"),
        )
        got = {r["day_key"]: r for r in daily_active_users(str(tmp_path)).take_all()}
        assert got["2025-03-01"]["n_active"] == 2  # users 7, 8
        assert got["2025-03-01"]["n_events"] == 6
        assert got["2025-03-02"]["n_active"] == 2  # users 7, 9
        assert got["2025-03-02"]["n_events"] == 2


class TestHyperLogLog:
    def test_estimate_accuracy_planted(self, tmp_path, ray_session):
        """20k planted distinct users (each appearing twice): the raw
        HLL regime for m=256 has ~6.5% standard error — assert < 20%."""
        from wbot_ray.pipelines.relational import hll_estimate

        n = 20_000
        uid = np.concatenate([np.arange(n), np.arange(n)])
        pq.write_table(
            pa.table({"user_id": pa.array(uid, pa.int64())}),
            os.path.join(tmp_path, "events.parquet"),
        )
        est = hll_estimate(str(tmp_path))
        assert abs(est - n) / n < 0.20, f"estimate {est} vs exact {n}"

    def test_registers_merge_invariant(self, tmp_path, ray_session):
        """Registers are duplication-invariant: the sketch of the data
        repeated 3× equals the sketch of the data once (mergeability —
        what makes the partial/max shape correct at any partitioning)."""
        from wbot_ray.pipelines.relational import approx_distinct_users

        uid = np.arange(500, dtype=np.int64)
        one = tmp_path / "one"
        three = tmp_path / "three"
        one.mkdir(), three.mkdir()
        pq.write_table(
            pa.table({"user_id": pa.array(uid, pa.int64())}),
            os.path.join(one, "events.parquet"),
        )
        pq.write_table(
            pa.table({"user_id": pa.array(np.tile(uid, 3), pa.int64())}),
            os.path.join(three, "events.parquet"),
        )
        r1 = {r["register_idx"]: r["max_rho"] for r in approx_distinct_users(str(one)).take_all()}
        r3 = {r["register_idx"]: r["max_rho"] for r in approx_distinct_users(str(three)).take_all()}
        assert r1 == r3


class TestKmeans:
    def test_recovers_planted_clusters(self, tmp_path, ray_session):
        """3 well-separated Gaussian blobs → after 2 Lloyd rounds every
        blob lands in one k-means cluster (purity 1.0 for separation ≫
        within-blob spread), regardless of which seed ids were drawn."""
        from wbot_ray.pipelines.clustering import kmeans_clusters

        rng = np.random.RandomState(3)
        blobs, truth = [], []
        for b, center in enumerate((-5.0, 0.0, 5.0)):
            v = center + rng.standard_normal((50, 64)) * 0.05
            blobs.append(v)
            truth += [b] * 50
        vecs = np.vstack(blobs)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(len(vecs)), pa.int64()),
                    "embedding": pa.array(
                        [r.tolist() for r in vecs], pa.list_(pa.float32())
                    ),
                }
            ),
            os.path.join(tmp_path, "embeddings.parquet"),
        )
        rows = kmeans_clusters(str(tmp_path), k=3, iters=2).take_all()
        got = {r["vec_id"]: r["cluster_id"] for r in rows}
        for b in range(3):
            members = {got[i] for i in range(b * 50, (b + 1) * 50)}
            assert len(members) == 1, f"blob {b} split across {members}"
        assert len({got[b * 50] for b in range(3)}) == 3  # blobs not merged
        assert all(r["dist_q"] >= 0 for r in rows)

    def test_deterministic_across_runs(self, ray_session):
        from wbot_ray.pipelines.clustering import kmeans_clusters

        a = sorted(map(tuple, kmeans_clusters(SF0001).to_pandas().itertuples(index=False)))
        b = sorted(map(tuple, kmeans_clusters(SF0001).to_pandas().itertuples(index=False)))
        assert a == b


class TestHashJoinVariants:
    def _pair(self, ray_session):
        import ray.data

        left = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array([1, 2, 3], pa.int64()),
                    "lv": pa.array(["a", "b", "c"], pa.string()),
                }
            )
        )
        right = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array([2, 2, 4], pa.int64()),
                    "rv": pa.array([20, 21, 40], pa.int64()),
                }
            )
        )
        return left, right

    def test_semi_and_anti(self, ray_session):
        from wbot_ray.pipelines.join import hash_join

        left, right = self._pair(ray_session)
        semi = hash_join(left, right, key="k", num_buckets=4, join_type="left semi").to_pandas()
        assert sorted(map(tuple, semi.itertuples(index=False))) == [(2, "b")]
        anti = hash_join(left, right, key="k", num_buckets=4, join_type="left anti").to_pandas()
        assert sorted(map(tuple, anti.itertuples(index=False))) == [(1, "a"), (3, "c")]

    def test_left_outer(self, ray_session):
        from wbot_ray.pipelines.join import hash_join

        left, right = self._pair(ray_session)
        out = hash_join(left, right, key="k", num_buckets=4, join_type="left outer").to_pandas()
        rows = sorted(
            (int(k), lv, None if rv != rv else int(rv))  # NaN-safe
            for k, lv, rv in out.itertuples(index=False)
        )
        assert rows == [(1, "a", None), (2, "b", 20), (2, "b", 21), (3, "c", None)]


class TestHashJoinHotKeys:
    def test_salted_hot_key_matches_unsalted(self, ray_session):
        """Result with hot_keys must be row-identical to the plain join,
        and the hot key's rows must actually spread across >1 bucket."""
        import ray.data

        from wbot_ray.pipelines.join import hash_join

        rng = np.random.RandomState(5)
        lk = np.concatenate([np.full(500, 7, np.int64), rng.randint(100, 150, 100)])
        left = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array(lk, pa.int64()),
                    "lv": pa.array(np.arange(len(lk)), pa.int64()),
                }
            )
        )
        right = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array([7] + list(range(100, 150)), pa.int64()),
                    "rv": pa.array(range(51), pa.int64()),
                }
            )
        )

        def rows(ds):
            return sorted(map(tuple, ds.to_pandas()[["k", "lv", "rv"]].itertuples(index=False)))

        plain = rows(hash_join(left, right, key="k", num_buckets=8))
        salted = rows(hash_join(left, right, key="k", num_buckets=8, hot_keys={7: 4}))
        assert salted == plain and len(plain) == 600

    def test_hot_keys_rejected_for_right_outer(self, ray_session):
        import ray.data

        from wbot_ray.pipelines.join import hash_join

        t = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1], pa.int64())}))
        u = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64()), "w": pa.array([1], pa.int64())}))
        with pytest.raises(ValueError, match="hot_keys"):
            hash_join(t, u, key="k", join_type="right outer", hot_keys={1: 2})


class TestHashJoinRandomized:
    """Randomized cross-engine property: hash_join == DuckDB JOIN on
    arbitrary key distributions (dup keys, one-sided keys, hot keys)."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_duckdb_inner(self, seed, ray_session):
        import duckdb
        import ray.data

        from wbot_ray.pipelines.join import hash_join

        rng = np.random.RandomState(seed)
        nl, nr = rng.randint(50, 400), rng.randint(50, 400)
        lt = pa.table(
            {
                "k": pa.array(rng.randint(0, 60, nl), pa.int64()),
                "lv": pa.array(rng.randint(0, 10_000, nl), pa.int64()),
            }
        )
        rt = pa.table(
            {
                "k": pa.array(rng.randint(0, 60, nr), pa.int64()),
                "rv": pa.array(rng.randint(0, 10_000, nr), pa.int64()),
            }
        )
        hot = {int(lt.column("k")[0].as_py()): 3} if seed % 2 else None
        got = hash_join(
            ray.data.from_arrow(lt),
            ray.data.from_arrow(rt),
            key="k",
            num_buckets=7,
            hot_keys=hot,
        ).to_pandas()
        con = duckdb.connect()
        con.register("lt", lt.to_pandas())
        con.register("rt", rt.to_pandas())
        want = con.execute(
            "SELECT lt.k, lv, rv FROM lt JOIN rt ON lt.k = rt.k"
        ).df()
        assert sorted(map(tuple, got[["k", "lv", "rv"]].itertuples(index=False))) == sorted(
            map(tuple, want.itertuples(index=False))
        )


class TestKmeansRandomized:
    """The distributed k-means vs an independent single-process NumPy
    reference of the same quantized algorithm (written here, not shared
    with the engine) — guards the partitioned partial/fold path."""

    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_reference_lloyd(self, seed, tmp_path, ray_session):
        from wbot_ray.pipelines.clustering import KM_QUANT, kmeans_clusters
        from wbot_ray.pipelines.common import md5_lower64

        rng = np.random.RandomState(seed)
        n, k, iters = 120, 5, 2
        vecs = rng.standard_normal((n, 64)).astype(np.float32)
        d = tmp_path / f"km{seed}"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
                }
            ),
            os.path.join(d, "embeddings.parquet"),
        )

        # independent reference: same spec, plain loops
        q = np.floor(vecs.astype(np.float64) * float(KM_QUANT)).astype(np.int64)
        keys = sorted((md5_lower64(f"kmc:{i}"), i) for i in range(n))
        cents = q[[i for _, i in keys[:k]]].copy()

        def assign(qm, cm):
            out = []
            for row in qm:
                dists = [int(((row - c) ** 2).sum()) for c in cm]
                best = min(range(len(cm)), key=lambda j: (dists[j], j))
                out.append((best, dists[best]))
            return out

        for _ in range(iters):
            a = assign(q, cents)
            nxt = cents.copy()
            for cl in range(k):
                members = [i for i, (c, _) in enumerate(a) if c == cl]
                if members:
                    nxt[cl] = q[members].sum(axis=0) // len(members)
            cents = nxt
        want = {i: a_d for i, a_d in enumerate(assign(q, cents))}

        got = {
            r["vec_id"]: (r["cluster_id"], r["dist_q"])
            for r in kmeans_clusters(str(d), k=k, iters=iters).take_all()
        }
        assert got == want


class TestPqCodes:
    """Product quantization vs an independent single-process NumPy
    reference of the same per-subspace quantized Lloyd's (written here,
    not shared with the engine), plus the compression invariants."""

    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_reference(self, seed, tmp_path, ray_session):
        from wbot_ray.pipelines.clustering import KM_QUANT, pq_codes
        from wbot_ray.pipelines.common import md5_lower64

        rng = np.random.RandomState(seed)
        n, m, k, iters, sd = 90, 8, 6, 1, 8
        vecs = rng.standard_normal((n, 64)).astype(np.float32)
        vecs[70] = vecs[3]  # planted exact duplicate -> identical codes
        d = tmp_path / f"pq{seed}"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array(
                        [v.tolist() for v in vecs], pa.list_(pa.float32())
                    ),
                }
            ),
            os.path.join(d, "embeddings.parquet"),
        )

        q = np.floor(vecs.astype(np.float64) * float(KM_QUANT)).astype(np.int64)
        keys = sorted((md5_lower64(f"pqc:{i}"), i) for i in range(n))
        seeds = q[[i for _, i in keys[:k]]]
        cents = [seeds[:, j * sd : (j + 1) * sd].copy() for j in range(m)]

        def assign(qs, cm):
            out = []
            for row in qs:
                dists = [int(((row - c) ** 2).sum()) for c in cm]
                best = min(range(len(cm)), key=lambda j: (dists[j], j))
                out.append((best, dists[best]))
            return out

        for _ in range(iters):
            for j in range(m):
                qs = q[:, j * sd : (j + 1) * sd]
                a = assign(qs, cents[j])
                nxt = cents[j].copy()
                for cl in range(k):
                    members = [i for i, (c, _) in enumerate(a) if c == cl]
                    if members:
                        nxt[cl] = qs[members].sum(axis=0) // len(members)
                cents[j] = nxt
        want = {}
        for j in range(m):
            for i, (c, dist) in enumerate(assign(q[:, j * sd : (j + 1) * sd], cents[j])):
                want[(i, j)] = (c, dist)

        got = {
            (r["vec_id"], r["sub"]): (r["code"], r["dist_q"])
            for r in pq_codes(str(d), m=m, k=k, iters=iters).take_all()
        }
        assert got == want
        # compression invariants: every vector has exactly m codes in
        # [0, k); the planted duplicate pair shares all codes
        assert len(got) == n * m
        assert all(0 <= c < k for c, _ in got.values())
        for j in range(m):
            assert got[(70, j)] == got[(3, j)]


class TestPrepareCorpus:
    def test_planted_composition(self, tmp_path, ray_session):
        """Composition semantics: a near-dup's non-canonical member
        drops even if it passes quality; a quality-failing doc drops
        even if it is its cluster's canonical member."""
        from wbot_ray.pipelines.training import prepare_corpus

        def good(i, seed):
            rng = np.random.RandomState(seed)
            # 60 words, 4-char body words (mwl_x100 ≈ 395, inside the
            # 380–460 band), stopwords present → passes the Gopher gate
            return "the of " + " ".join(f"w{rng.randint(100, 999)}" for _ in range(58))

        texts = {i: good(i, i) for i in range(8)}
        texts[100] = texts[1]          # exact near-dup of 1 → drops (non-canonical)
        texts[6] = "the of " + " ".join(["#!"] * 58)  # symbol soup → fails quality
        ids = sorted(texts)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array([texts[i] for i in ids], pa.string()),
                    "lang": pa.array(["en"] * len(ids), pa.string()),
                    "source": pa.array(["s"] * len(ids), pa.string()),
                    "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
                }
            ),
            os.path.join(tmp_path, "documents.parquet"),
        )
        kept = {r["doc_id"] for r in prepare_corpus(str(tmp_path)).take_all()}
        assert 100 not in kept  # deduped away
        assert 6 not in kept  # quality-failed
        assert 1 in kept and 0 in kept and 7 in kept


class TestHashJoinEdgeCases:
    def test_right_semi_and_anti(self, ray_session):
        import ray.data

        from wbot_ray.pipelines.join import hash_join

        left = ray.data.from_arrow(
            pa.table({"k": pa.array([1, 2], pa.int64()), "lv": pa.array(["a", "b"], pa.string())})
        )
        right = ray.data.from_arrow(
            pa.table({"k": pa.array([2, 3], pa.int64()), "rv": pa.array([20, 30], pa.int64())})
        )
        semi = hash_join(left, right, key="k", num_buckets=4, join_type="right semi").to_pandas()
        assert sorted(map(tuple, semi.itertuples(index=False))) == [(2, 20)]
        anti = hash_join(left, right, key="k", num_buckets=4, join_type="right anti").to_pandas()
        assert sorted(map(tuple, anti.itertuples(index=False))) == [(3, 30)]

    def test_null_keys_left_outer(self, ray_session):
        """Null keys must not crash bucketing; Acero semantics apply
        (null never matches; left outer preserves the null-keyed row)."""
        import ray.data

        from wbot_ray.pipelines.join import hash_join

        left = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array(["x", None, "y"], pa.string()),
                    "lv": pa.array([1, 2, 3], pa.int64()),
                }
            )
        )
        right = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array(["y", None], pa.string()),
                    "rv": pa.array([30, 99], pa.int64()),
                }
            )
        )
        out = hash_join(left, right, key="k", num_buckets=3, join_type="left outer").to_pandas()
        rows = {
            (None if k != k and not isinstance(k, str) else k, int(lv),
             None if rv != rv else int(rv))
            for k, lv, rv in out.itertuples(index=False)
        }
        assert rows == {(None, 2, None), ("x", 1, None), ("y", 3, 30)}

    def test_hot_keys_with_prepare_rejected(self, ray_session):
        import ray.data

        from wbot_ray.pipelines.join import hash_join

        t = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1], pa.int64())}))
        u = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64()), "w": pa.array([1], pa.int64())}))
        with pytest.raises(ValueError, match="prepare"):
            hash_join(t, u, key="k", hot_keys={1: 2}, left_prepare=lambda x: x)


class TestWindowPairs:
    def test_planted_boundary_and_direction(self, tmp_path, ray_session):
        """Pairs straddling a time-bucket boundary are found (the
        neighbor-replication rule), pairs beyond the window are not,
        both directions count, and no pair is emitted twice."""
        import datetime as dt

        from wbot_ray.pipelines.relational import window_pairs

        base = dt.datetime(2025, 5, 1, 10, 0, 0)
        rows = [
            # (event_id, minutes offset, type, user)
            (1, 0, "click", 7),
            (2, 29, "purchase", 7),    # within 30m of click 1  → pair
            (3, 61, "purchase", 7),    # 61m after click 1      → no pair
            (4, 89, "click", 7),       # 28m BEFORE purchase 3? no: 89-61=28 → pair (reverse direction)
            (5, 29, "purchase", 8),    # other user             → no pair
            (6, 9, "click", 9),
            (7, 31, "purchase", 9),    # 22m apart, crosses the 30m bucket edge → pair
        ]
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [base + dt.timedelta(minutes=r[1]) for r in rows],
                        pa.timestamp("us"),
                    ),
                    "user_id": pa.array([r[3] for r in rows], pa.int64()),
                    "event_type": pa.array([r[2] for r in rows], pa.string()),
                }
            ),
            os.path.join(tmp_path, "events.parquet"),
        )
        got = sorted(
            (r["left_event"], r["right_event"], r["delta_us"])
            for r in window_pairs(str(tmp_path)).take_all()
        )
        m = 60 * 1_000_000
        assert got == [
            (1, 2, 29 * m),      # forward pair
            (4, 3, -28 * m),     # purchase BEFORE click (both directions)
            (6, 7, 22 * m),      # straddles the 30-min bucket boundary
        ]


class TestFunnelSteps:
    def test_planted_ordering_matters(self, tmp_path, ray_session):
        """A purchase BEFORE the user's first post-signup click must not
        count as stage 3 — the funnel is an ordered subsequence, not
        three independent mins."""
        import datetime as dt

        from wbot_ray.pipelines.relational import funnel_steps

        base = dt.datetime(2025, 6, 1, 9, 0, 0)
        rows = [
            # user 1: signup → click → purchase, in order → 3 steps
            (1, 0, "signup", 1), (2, 10, "click", 1), (3, 20, "purchase", 1),
            # user 2: purchase BEFORE click → stops at 2 steps
            (4, 0, "signup", 2), (5, 10, "purchase", 2), (6, 20, "click", 2),
            # user 3: click before signup doesn't count; no later click → 1
            (7, 5, "click", 3), (8, 10, "signup", 3),
            # user 4: no signup at all → no row
            (9, 0, "click", 4), (10, 5, "purchase", 4),
        ]
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [base + dt.timedelta(minutes=r[1]) for r in rows],
                        pa.timestamp("us"),
                    ),
                    "user_id": pa.array([r[3] for r in rows], pa.int64()),
                    "event_type": pa.array([r[2] for r in rows], pa.string()),
                }
            ),
            os.path.join(tmp_path, "events.parquet"),
        )
        got = {r["user_id"]: r for r in funnel_steps(str(tmp_path)).take_all()}
        assert set(got) == {1, 2, 3}
        assert got[1]["steps_completed"] == 3
        assert got[2]["steps_completed"] == 2  # purchase-before-click blocked
        assert got[3]["steps_completed"] == 1  # pre-signup click ignored
        assert got[3]["t_step2_us"] == 0  # unreached stages are zero


class TestRepetitionStats:
    def test_hand_computed_vectors(self, ray_session, tmp_path):
        from wbot_ray.pipelines.textops import repetition_stats

        texts = [
            "a b a b a b",        # bigrams: ab×3, ba×2 → all 5 duplicated
            "x y z",              # 2 bigrams, none repeated
            "solo",               # 1 word, 0 bigrams
            "",                   # empty
            "aa bb\t aa bb",      # tab+space split; "aa bb"×2 of 3 bigrams
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            os.path.join(tmp_path, "documents.parquet"),
        )
        got = {r["doc_id"]: r for r in repetition_stats(str(tmp_path)).take_all()}
        # doc 0: 6 words, 5 bigrams all dup → 1000; top = ("a","b") cnt 3,
        # mass 3*2=6, chars 6 → 1000
        assert (got[0]["n_words"], got[0]["n_bigrams"]) == (6, 5)
        assert got[0]["dup_bigram_pm"] == 1000
        assert got[0]["top_bigram_chars_pm"] == 1000
        # doc 1: no dup; top bigram ("x","y") mass 2, chars 3 → 666
        assert got[1]["dup_bigram_pm"] == 0
        assert got[1]["top_bigram_chars_pm"] == 666
        # doc 2/3: degenerate → all zero
        for d in (2, 3):
            assert got[d]["n_bigrams"] == 0
            assert got[d]["dup_bigram_pm"] == 0
            assert got[d]["top_bigram_chars_pm"] == 0
        # doc 4: 4 words [aa,bb,aa,bb], 3 bigrams: (aa,bb)×2 dup, (bb,aa)×1
        # dup_pm = 2000//3 = 666; top ("aa","bb") mass 2*4=8, chars 8 → 1000
        assert got[4]["dup_bigram_pm"] == 666
        assert got[4]["top_bigram_chars_pm"] == 1000


class TestChurnedUsers:
    def test_planted_set_difference(self, ray_session, tmp_path):
        import datetime as dt

        from wbot_ray.pipelines.relational import churned_users

        # users 1,2 active early; user 2 also active late; user 3 late-only
        rows = [
            (1, "2024-01-02", 1),
            (2, "2024-01-03", 2),
            (3, "2024-01-03", 2),  # duplicate early activity for user 2
            (4, "2024-01-30", 2),
            (5, "2024-01-30", 3),
        ]
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [dt.datetime.fromisoformat(r[1]) for r in rows],
                        pa.timestamp("us"),
                    ),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                }
            ),
            os.path.join(tmp_path, "events.parquet"),
        )
        got = sorted(r["user_id"] for r in churned_users(str(tmp_path)).take_all())
        assert got == [1]  # user 2 retained, user 3 never early, 1 distinct


class TestQ3RuntimeFilter:
    def test_filter_and_plain_paths_identical(self, ray_session):
        """The runtime semi-join filter is a pure exchange-volume
        optimization: both paths must produce the identical top-k."""
        from wbot_ray.pipelines.join import q3_shipping

        plain = q3_shipping(SF0001).to_pylist()
        filt = q3_shipping(SF0001, runtime_filter=True).to_pylist()
        assert plain == filt
        assert len(plain) > 0
        # cap of 0 forces the skip path — still identical
        skip = q3_shipping(SF0001, runtime_filter=True, runtime_filter_cap=0).to_pylist()
        assert skip == plain


class TestSemanticSearch:
    def test_planted_doc_ranks_first(self, ray_session, tmp_path):
        """A document that IS the query (repeated) must out-score word
        soup; scores are exact integers under the hashing encoder."""
        from wbot_ray.pipelines.semantic import encode_query, semantic_search

        q = "hash join merge sort"
        texts = [q + " " + q, "the slow brown table", "join order", "x y z"]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            os.path.join(tmp_path, "documents.parquet"),
        )
        got = semantic_search(str(tmp_path), query=q, k=3).to_pylist()
        assert got[0]["doc_id"] == 0
        # exact score: doc 0 holds 2x the query vector -> 2*|qv|^2
        qv = encode_query(q)
        assert got[0]["score"] == 2 * int((qv * qv).sum())
        assert all(r["score"] <= got[0]["score"] for r in got)


class TestRepetitionRandomized:
    def test_random_strings_match_duckdb(self, ray_session, tmp_path):
        """Random small-vocab strings with planted whitespace runs,
        tabs, empties and heavy repeats — engine vs the SQL oracle."""
        import duckdb

        from wbot_ray.pipelines.textops import repetition_stats

        rng = np.random.RandomState(31)
        vocab = ["a", "bb", "ccc", "dd", "e"]
        seps = [" ", "  ", "\t", " \t ", "\n"]
        texts = []
        for _ in range(80):
            k = int(rng.randint(0, 12))
            words = [vocab[rng.randint(len(vocab))] for _ in range(k)]
            sep_choices = [seps[rng.randint(len(seps))] for _ in range(max(k - 1, 0))]
            parts = []
            for i, w in enumerate(words):
                parts.append(w)
                if i < len(sep_choices):
                    parts.append(sep_choices[i])
            texts.append("".join(parts))
        texts += ["", " ", "\t\t", "x x x x x x x x"]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            os.path.join(tmp_path, "documents.parquet"),
        )
        got = sorted(
            repetition_stats(str(tmp_path)).take_all(), key=lambda r: r["doc_id"]
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{os.path.join(tmp_path, 'documents.parquet')}')"
        )
        want = con.execute(
            entrymod.oracle_sql()["repetition_stats"] + " ORDER BY doc_id"
        ).df()
        assert len(got) == len(want)
        for g, (_, w) in zip(got, want.iterrows()):
            assert g["doc_id"] == w["doc_id"]
            for c in ("n_words", "n_bigrams", "dup_bigram_pm", "top_bigram_chars_pm"):
                assert g[c] == w[c], (g["doc_id"], c, g[c], w[c])


class TestPiiScrub:
    def _run(self, tmp_path, texts):
        import duckdb

        from wbot_ray.pipelines.textops import pii_scrub

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            os.path.join(tmp_path, "documents.parquet"),
        )
        got = sorted(pii_scrub(str(tmp_path)).take_all(), key=lambda r: r["doc_id"])
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{os.path.join(tmp_path, 'documents.parquet')}')"
        )
        want = con.execute(
            entrymod.oracle_sql()["pii_scrub"] + " ORDER BY doc_id"
        ).df()
        assert len(got) == len(want)
        for g, (_, w) in zip(got, want.iterrows()):
            for c in ("scrub_hash", "n_email", "n_ipv4", "n_phone", "changed"):
                assert g[c] == w[c], (g["doc_id"], c, g[c], w[c])
        return got

    def test_planted_vectors(self, ray_session, tmp_path):
        """Adversarial planted cases: ip-inside-email-shape, 5-octet run,
        word-boundary defeats, single-letter TLD, empty doc — engine vs
        the DuckDB oracle, plus pinned expected counts."""
        texts = [
            "contact john.doe+spam@mail.example.com or jane@sub.domain.org",
            "server at 10.0.255.1 and 192.168.1.100, bad 1.2.3.4.5",
            "call +1 555 1234 or 44-201-9999 maybe 123 456 7890",
            "mixed: bob@192.168.0.1 then 8.8.8.8 tel 1.555.0000",
            "",
            "no pii here",
            "a@b.co",
            "5.6.7.8x no boundary",
            "@not.an.email",
        ]
        got = self._run(tmp_path, texts)
        counts = [(g["n_email"], g["n_ipv4"], g["n_phone"]) for g in got]
        assert counts == [
            (2, 0, 0),
            (0, 3, 0),  # 1.2.3.4.5 → "1.2.3.4" matches, ".5" does not
            (0, 0, 3),
            (0, 2, 1),  # bob@192.168.0.1: no alpha TLD ⇒ not an email
            (0, 0, 0),
            (0, 0, 0),
            (1, 0, 0),
            (0, 0, 0),  # 8→x is word-word: \b fails on both engines
            (0, 0, 0),
        ]
        assert [g["changed"] for g in got] == [
            True, True, True, True, False, False, True, False, False,
        ]

    def test_randomized_match_duckdb(self, ray_session, tmp_path):
        """Random concatenations of PII-ish fragments and near-misses —
        the RE2-identity claim checked on inputs neither engine saw."""
        rng = np.random.RandomState(47)
        frags = [
            "word", "a@b.io", "x.y@z.com", "1.2.3.4", "10.0.0", "255.255.255.255",
            "+1 555 1234", "555 1234", "12.345.6789", "user@", "@host.com",
            "3.14", "v1.2.3", "..", "a-b@c-d.org", "999 999 99999",
        ]
        seps = [" ", ", ", "\n", "", " -- "]
        texts = []
        for _ in range(120):
            k = int(rng.randint(0, 8))
            parts = []
            for i in range(k):
                parts.append(frags[rng.randint(len(frags))])
                parts.append(seps[rng.randint(len(seps))])
            texts.append("".join(parts))
        self._run(tmp_path, texts)


class TestSourceMix:
    def test_rates_integer_rule(self):
        from wbot_ray.pipelines.training import PPM, mix_rates_ppm

        # equal weights, budget 50: a's fair share (25) exceeds supply
        # (10) -> clamp; b keeps floor(25/90 * 1e6) ppm
        assert mix_rates_ppm({"a": 10, "b": 90}, {"a": 1, "b": 1}, 50) == {
            "a": PPM,
            "b": 277_777,
        }
        # source absent from the spec is dropped outright
        assert mix_rates_ppm({"a": 10, "x": 5}, {"a": 1}, 10)["x"] == 0

    def test_planted_skew_match_duckdb(self, ray_session, tmp_path):
        """Skewed per-source counts (clamped rare source, heavy common
        source, one source missing from the spec) — engine vs the
        generated DuckDB oracle, exact rows."""
        import duckdb

        from wbot_ray.pipelines.training import source_mix

        rng = np.random.RandomState(7)
        srcs = ["src0"] * 5 + ["src19"] * 400 + ["src7"] * 60 + ["nospec"] * 30
        rng.shuffle(srcs)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(srcs)), pa.int64()),
                    "source": pa.array(srcs, pa.string()),
                    "text": pa.array(["t"] * len(srcs), pa.string()),
                }
            ),
            os.path.join(tmp_path, "documents.parquet"),
        )
        got = sorted(
            source_mix(str(tmp_path)).take_all(), key=lambda r: r["doc_id"]
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{os.path.join(tmp_path, 'documents.parquet')}')"
        )
        want = con.execute(
            entrymod.oracle_sql()["source_mix"] + " ORDER BY doc_id"
        ).df()
        assert len(got) == len(want)
        for g, (_, w) in zip(got, want.iterrows()):
            for c in ("doc_id", "source", "rate_ppm"):
                assert g[c] == w[c], (c, g, dict(w))
        # the unspecified source never survives; the rare source clamps
        kept_srcs = {g["source"] for g in got}
        assert "nospec" not in kept_srcs
        rates = {g["source"]: g["rate_ppm"] for g in got}
        if "src0" in rates:
            assert rates["src0"] == 1_000_000


class TestTokenBudgetMix:
    def test_budget_law_and_duckdb_parity(self, ray_session, tmp_path):
        """Randomized doc lengths across skewed sources: (a) exact rows
        vs the generated DuckDB twin; (b) the budget law — for every
        source, all kept docs have cum_prev < budget, exactly one kept
        doc may cross it, and the hash-order prefix is contiguous (no
        doc is skipped then a later-ordered one kept)."""
        import duckdb

        from wbot_ray.pipelines.training import token_budget_mix

        rng = np.random.RandomState(11)
        srcs = ["a"] * 50 + ["b"] * 5 + ["c"] * 200
        rng.shuffle(srcs)
        texts = [" ".join(f"w{rng.randint(0, 9)}" for _ in range(rng.randint(1, 40))) for _ in srcs]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(srcs)), pa.int64()),
                    "source": pa.array(srcs, pa.string()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            os.path.join(tmp_path, "documents.parquet"),
        )
        budget = 300
        got = sorted(
            token_budget_mix(str(tmp_path), budget=budget).take_all(),
            key=lambda r: r["doc_id"],
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{os.path.join(tmp_path, 'documents.parquet')}')"
        )
        from wbot_ray.pipelines.training import token_budget_mix_oracle_sql

        # the gate's oracle entry IS this helper at the default budget
        assert (
            entrymod.oracle_sql()["token_budget_mix"]
            == token_budget_mix_oracle_sql()
        )
        want = con.execute(
            token_budget_mix_oracle_sql(budget=budget) + " ORDER BY doc_id"
        ).df()
        assert len(got) == len(want)
        for g, (_, w) in zip(got, want.iterrows()):
            for c in ("doc_id", "source", "n_tokens", "cum_prev"):
                assert g[c] == w[c], (c, g, dict(w))
        # budget law per source
        for src in ("a", "b", "c"):
            kept = [g for g in got if g["source"] == src]
            assert all(g["cum_prev"] < budget for g in kept)
            crossing = [g for g in kept if g["cum_prev"] + g["n_tokens"] > budget]
            assert len(crossing) <= 1
        # source b is tiny (~5 short docs): its whole supply is kept
        assert len([g for g in got if g["source"] == "b"]) == 5

    def test_part_boundary_invariance(self, ray_session, tmp_path):
        """The prefix result cannot depend on the range-partition width:
        4 parts (part_bits=62) vs 256 parts (part_bits=56) agree row-
        for-row — the cross-part base-offset handoff is exact."""
        from wbot_ray.pipelines.training import token_budget_mix

        rng = np.random.RandomState(3)
        n = 150
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(n), pa.int64()),
                    "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
                    "text": pa.array(
                        [" ".join("x" for _ in range(rng.randint(1, 20))) for _ in range(n)],
                        pa.string(),
                    ),
                }
            ),
            os.path.join(tmp_path, "documents.parquet"),
        )
        a = sorted(
            token_budget_mix(str(tmp_path), budget=120, part_bits=62).take_all(),
            key=lambda r: r["doc_id"],
        )
        b = sorted(
            token_budget_mix(str(tmp_path), budget=120, part_bits=56).take_all(),
            key=lambda r: r["doc_id"],
        )
        assert a == b
        assert len(a) > 0


class TestLengthDeciles:
    def _check(self, tmp_path, langs, n_chars):
        import duckdb

        from wbot_ray.pipelines.textops import length_deciles

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(langs)), pa.int64()),
                    "lang": pa.array(langs, pa.string()),
                    "n_chars": pa.array(n_chars, pa.int64()),
                    "text": pa.array(["t"] * len(langs), pa.string()),
                }
            ),
            os.path.join(tmp_path, "documents.parquet"),
        )
        got = sorted(
            length_deciles(str(tmp_path)).take_all(), key=lambda r: r["doc_id"]
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{os.path.join(tmp_path, 'documents.parquet')}')"
        )
        want = con.execute(
            entrymod.oracle_sql()["length_deciles"] + " ORDER BY doc_id"
        ).df()
        assert len(got) == len(want)
        for g, (_, w) in zip(got, want.iterrows()):
            for c in ("doc_id", "lang", "n_chars", "decile"):
                assert g[c] == w[c], (c, g, dict(w))
        return got

    def test_ties_and_tiny_groups(self, ray_session, tmp_path):
        """All-equal lengths (pure doc_id tie-break), languages with
        fewer docs than buckets (NTILE's one-row-per-bucket edge), and
        the uneven n%k extra-row rule — exact vs DuckDB NTILE."""
        langs = ["en"] * 23 + ["de"] * 3 + ["fr"] * 1 + ["es"] * 10
        n_chars = [7] * 23 + [5, 5, 5] + [9] + list(range(10))
        got = self._check(tmp_path, langs, n_chars)
        # en: 23 rows -> first 3 deciles get 3 rows, rest 2 (SQL rule)
        en = [g["decile"] for g in got if g["lang"] == "en"]
        from collections import Counter

        assert Counter(en) == {**{d: 3 for d in (1, 2, 3)}, **{d: 2 for d in range(4, 11)}}
        # fr: 1 row -> bucket 1; de: 3 rows -> buckets 1,2,3
        assert [g["decile"] for g in got if g["lang"] == "fr"] == [1]
        assert sorted(g["decile"] for g in got if g["lang"] == "de") == [1, 2, 3]

    def test_randomized_match_duckdb(self, ray_session, tmp_path):
        rng = np.random.RandomState(11)
        n = 400
        langs = [f"l{rng.randint(6)}" for _ in range(n)]
        n_chars = [int(rng.randint(0, 15)) for _ in range(n)]  # heavy ties
        self._check(tmp_path, langs, n_chars)


class TestEventsAnomaly:
    """Planted-burst semantics for events_anomaly, checked against a
    straightforward per-hour brute-force reference (no engine code in
    the reference path). bucket_hours=48 forces trailing windows to
    cross partition boundaries, so the context replication is on the
    line for every flagged hour."""

    @staticmethod
    def _write_events(d: str, counts: dict[int, int]) -> str:
        ts = []
        for h, n in sorted(counts.items()):
            ts.extend(h * 3_600_000_000 + i * 1_000_000 for i in range(n))
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table({"ts": pa.array(ts, pa.timestamp("us"))}),
            os.path.join(d, "events.parquet"),
        )
        return d

    @staticmethod
    def _brute(counts, window_h=24, num=23, den=20, min_prev=12):
        out = []
        hours = sorted(counts)
        for h in hours:
            prev = [g for g in hours if h - window_h <= g < h]
            trail = sum(counts[g] for g in prev)
            if len(prev) >= min_prev and counts[h] * len(prev) * den > num * trail:
                out.append((h, counts[h], trail))
        return out

    def test_planted_burst_gap_and_warmup(self, ray_session, tmp_path):
        from wbot_ray.pipelines.relational import events_anomaly

        counts = {h: 10 for h in range(60)}
        counts[5] = 100  # warm-up burst: nprev < min_prev, must NOT alert
        counts[48] = 40  # real burst (window crosses the 48h bucket edge)
        for h in range(80, 104):
            counts[h] = 10  # after a 20h gap
        counts[104] = 25  # burst after the series recovers
        d = self._write_events(str(tmp_path / "ev"), counts)

        got = (
            events_anomaly(d, bucket_hours=48)
            .to_pandas()
            .sort_values("hour_key")
            .reset_index(drop=True)
        )
        want = self._brute(counts)
        assert [48, 104] == [h for h, _, _ in want]  # the plant, sanity
        got_hours = [
            int(np.datetime64(s).astype("datetime64[h]").astype(int))
            for s in got["hour_key"]
        ]
        assert got_hours == [h for h, _, _ in want]
        assert got["n_events"].tolist() == [n for _, n, _ in want]
        assert got["trail_sum"].tolist() == [t for _, _, t in want]

    def test_randomized_vs_brute(self, ray_session, tmp_path):
        from wbot_ray.pipelines.relational import events_anomaly

        rng = np.random.RandomState(23)
        # sparse series with gaps and occasional spikes
        counts = {}
        for h in range(300):
            if rng.rand() < 0.75:
                counts[h] = int(rng.randint(1, 8))
                if rng.rand() < 0.05:
                    counts[h] = int(rng.randint(20, 40))
        d = self._write_events(str(tmp_path / "ev"), counts)
        got = (
            events_anomaly(d, bucket_hours=64)
            .to_pandas()
            .sort_values("hour_key")
            .reset_index(drop=True)
        )
        want = self._brute(counts)
        got_rows = [
            (
                int(np.datetime64(s).astype("datetime64[h]").astype(int)),
                int(n),
                int(t),
            )
            for s, n, t in zip(got["hour_key"], got["n_events"], got["trail_sum"])
        ]
        assert got_rows == want


class TestTriangles:
    """link_triangles: planted closed/open triples, noise robustness
    (duplicate edges, both directions, self-loops, gated=False rows),
    and cross-engine parity on the real fixture graph."""

    @staticmethod
    def _links(tmp_path, rows, gated=None):
        p = os.path.join(tmp_path, "links.parquet")
        pq.write_table(
            pa.table(
                {
                    "src_url": pa.array([a for a, _ in rows], pa.string()),
                    "dst_url": pa.array([b for _, b in rows], pa.string()),
                    "gated": pa.array(gated or [True] * len(rows), pa.bool_()),
                }
            ),
            p,
        )
        return p

    def test_planted_k4_plus_noise(self, ray_session, tmp_path):
        from wbot_ray.pipelines import graph

        u = [f"https://n{i}.com/" for i in range(7)]
        k4 = [(u[i], u[j]) for i in range(4) for j in range(i + 1, 4)]
        rows = (
            k4
            + [(u[1], u[0])]  # reverse duplicate of an existing edge
            + [(u[0], u[1])]  # exact duplicate
            + [(u[2], u[2])]  # self-loop: ignored
            + [(u[0], u[4]), (u[4], u[5])]  # open wedge, never closes
            + [(u[5], u[6])]
        )
        gated = [True] * len(rows)
        rows.append((u[4], u[0]))  # would close nothing; also reverse-dup
        gated.append(False)  # gated=False edges never participate
        p = self._links(tmp_path, rows, gated)
        got = {
            r["url"]: r["n_triangles"]
            for r in graph.link_triangles(str(tmp_path), links_path=p).take_all()
        }
        # distributed path (forced) must agree with the local default
        got_dist = {
            r["url"]: r["n_triangles"]
            for r in graph.link_triangles(
                str(tmp_path), links_path=p, local_threshold=0
            ).take_all()
        }
        # K4: each of the 4 nodes sits in C(3,2) = 3 triangles
        assert got == got_dist == {u[i]: 3 for i in range(4)}

    def test_star_hub_no_triangles(self, ray_session, tmp_path):
        from wbot_ray.pipelines import graph

        hub = "https://hub.com/"
        p = self._links(
            tmp_path, [(hub, f"https://leaf{i}.com/") for i in range(40)]
        )
        assert graph.link_triangles(str(tmp_path), links_path=p).count() == 0

    def test_fixture_matches_sql_oracle(self, ray_session):
        import duckdb

        from wbot_ray.pipelines import graph

        lp = graph._links_path(SF0001)
        got = (
            graph.link_triangles(SF0001)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        want = (
            duckdb.connect()
            .execute(graph.triangles_oracle_sql(lp) + " ORDER BY url")
            .df()
        )
        assert got.equals(want)


class TestCorpusDiff:
    def test_planted_statuses(self, ray_session, tmp_path):
        """Each diff class lands exactly once on a hand-built corpus:
        id 3 removed (3%17), id 1 changed (1%13), id 5 spawns added
        id 1000005 (5%29), id 2 unchanged (absent from the diff)."""
        from wbot_ray.pipelines.maintenance import corpus_diff

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 5], pa.int64()),
                    "text": pa.array(["one", "two", "three", "five"], pa.string()),
                }
            ),
            os.path.join(tmp_path, "documents.parquet"),
        )
        got = {
            r["doc_id"]: r["status"]
            for r in corpus_diff(str(tmp_path)).take_all()
        }
        assert got == {1: "changed", 3: "removed", 1000005: "added"}


class TestBpePairs:
    def test_planted_pairs_match_oracle(self, ray_session, tmp_path):
        """Character-pair counts on a planted corpus: weighting by word
        OCCURRENCE (not distinct word), case folding, non-letter
        separators, and 1-letter words contributing nothing."""
        import duckdb

        docs = [
            "ab ab AB",          # 'ab' x3
            "a b c",             # no pairs
            "xAB-ab.cd",         # words: xab, ab, cd
            "",                  # empty
        ]
        p = os.path.join(tmp_path, "documents.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                }
            ),
            p,
        )
        got = {
            r["pair"]: r["n_occurrences"]
            for r in textops.bpe_pairs(str(tmp_path)).take_all()
        }
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
        want = dict(con.execute(textops.bpe_pairs_oracle_sql()).fetchall())
        assert got == want
        assert got["ab"] == 5  # 3 + 'xab' + 'ab'
        assert got["xa"] == 1
        assert got["cd"] == 1
        assert "a " not in got and "b" not in got

    def test_sf0001_matches_oracle(self, ray_session):
        import duckdb

        got = sorted(
            (r["pair"], r["n_occurrences"])
            for r in textops.bpe_pairs(SF0001).take_all()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF0001}/documents.parquet')"
        )
        want = sorted(
            (p_, n) for p_, n in con.execute(textops.bpe_pairs_oracle_sql()).fetchall()
        )
        assert got == want


class TestCooccurCounts:
    def test_window_and_gate_match_oracle(self, ray_session, tmp_path):
        """Window semantics (ordered pairs, distance ≤ w), the min_count
        gate, and doc-boundary isolation."""
        import duckdb

        # 'a b' adjacent x5 (crosses gate), 'a c' at distance 2 x5,
        # 'a d' at distance 3 x5, 'a e' at distance 4 (outside window),
        # and a second doc proving pairs never span documents
        docs = [" ".join(["a", "b", "c", "d", "e"] * 5), "b a " * 3]
        p = os.path.join(tmp_path, "documents.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                }
            ),
            p,
        )
        got = {
            (r["w_a"], r["w_b"]): r["n_cooccur"]
            for r in textops.cooccur_counts(str(tmp_path)).take_all()
        }
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
        want = {
            (a, b): n
            for a, b, n in con.execute(textops.cooccur_counts_oracle_sql()).fetchall()
        }
        assert got == want
        # doc0: 5 adjacent (a,b); doc1 "b a b a b a " splits to
        # [b,a,b,a,b,a,''] adding 3 more within-window (a,b)
        assert got[("a", "b")] == 8
        assert got[("b", "a")] == 5  # doc1 only: b1a2 b1a4 b3a4 b3a6 b5a6
        assert got[("a", "d")] == 5
        assert ("a", "e") not in got  # distance 4 > window 3

    def test_sf0001_matches_oracle(self, ray_session):
        import duckdb

        got = sorted(
            (r["w_a"], r["w_b"], r["n_cooccur"])
            for r in textops.cooccur_counts(SF0001).take_all()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF0001}/documents.parquet')"
        )
        want = sorted(con.execute(textops.cooccur_counts_oracle_sql()).fetchall())
        assert got == want


class TestRetentionCohorts:
    def test_planted_cohorts_match_oracle(self, ray_session, tmp_path):
        """Two cohorts, sparse activity, multi-event days collapse."""
        import duckdb

        from wbot_ray.pipelines import relational

        def ts(day: int, h: int = 0):
            return np.datetime64("2024-01-01", "us") + np.timedelta64(
                day * 24 + h, "h"
            )

        rows = [
            (1, ts(0)), (1, ts(0, 5)), (1, ts(2)),     # cohort d0: ages 0,2
            (2, ts(0)), (2, ts(1)),                    # cohort d0: ages 0,1
            (3, ts(1)), (3, ts(3)),                    # cohort d1: ages 0,2
        ]
        p = os.path.join(tmp_path, "events.parquet")
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(range(len(rows)), pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                }
            ),
            p,
        )
        got = {
            (r["cohort_day"], r["age_days"]): r["n_users"]
            for r in relational.retention_cohorts(str(tmp_path)).take_all()
        }
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}')")
        want = {
            (d, a): n
            for d, a, n in con.execute(
                relational.retention_cohorts_oracle_sql()
            ).fetchall()
        }
        assert got == want
        assert got[("2024-01-01", 0)] == 2  # users 1 and 2
        assert got[("2024-01-01", 2)] == 1  # user 1 only
        assert got[("2024-01-02", 0)] == 1  # user 3's cohort
        assert got[("2024-01-02", 2)] == 1


class TestLinkReciprocity:
    def test_planted_mutual_pair(self, ray_session, tmp_path):
        """Mutual a<->b counts reciprocal on both hosts; one-way c->a
        doesn't; self-links and non-gated rows are excluded; duplicate
        links collapse to one distinct edge."""
        import duckdb

        from wbot_ray.pipelines import graph

        rows = [
            ("https://a.com/1", "https://b.org/1", True),
            ("https://a.com/2", "https://b.org/9", True),   # dup host edge
            ("https://b.org/1", "https://a.com/7", True),
            ("https://c.net/1", "https://a.com/1", True),
            ("https://a.com/1", "https://a.com/2", True),   # self host
            ("https://c.net/1", "https://b.org/1", False),  # not gated
        ]
        p = os.path.join(tmp_path, "links.parquet")
        pq.write_table(
            pa.table(
                {
                    "src_url": pa.array([r[0] for r in rows], pa.string()),
                    "dst_url": pa.array([r[1] for r in rows], pa.string()),
                    "gated": pa.array([r[2] for r in rows], pa.bool_()),
                }
            ),
            p,
        )
        got = {
            r["host"]: (r["n_out"], r["n_recip"], r["recip_ppm"])
            for r in graph.link_reciprocity(str(tmp_path), links_path=p).take_all()
        }
        con = duckdb.connect()
        want = {
            h: (o, r, ppm)
            for h, o, r, ppm in con.execute(
                graph.link_reciprocity_oracle_sql(p)
            ).fetchall()
        }
        assert got == want
        assert got["a.com"] == (1, 1, 1_000_000)
        assert got["b.org"] == (1, 1, 1_000_000)
        assert got["c.net"] == (1, 0, 0)


class TestUpsertMerge:
    def test_planted_cdc_branches(self, ray_session, tmp_path):
        """One key per changelog branch: plain update, double update
        (max seq wins), delete (key dies), delete-then-insert
        (resurrect), insert of a brand-new key, untouched base row."""
        import duckdb

        from wbot_ray.pipelines import maintenance

        ids = [6, 1, 12, 7, 3, 10]
        p = os.path.join(tmp_path, "documents.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "lang": pa.array(["en"] * len(ids), pa.string()),
                    "n_chars": pa.array([1000 + i for i in ids], pa.int64()),
                }
            ),
            p,
        )
        got = {
            r["doc_id"]: (r["lang"], r["n_chars"], r["last_seq"], r["n_ops"])
            for r in maintenance.upsert_merge(str(tmp_path)).take_all()
        }
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
        want = {
            d: (l, n, s, o)
            for d, l, n, s, o in con.execute(
                maintenance.upsert_merge_oracle_sql()
            ).fetchall()
        }
        assert got == want
        assert got[6] == ("en", 1106, 1, 2)      # one update
        assert got[1] == ("en", 1501, 5, 3)      # double update, seq 5 wins
        assert got[12] == ("en", 7, 3, 3)        # deleted then resurrected
        assert 7 not in got                      # deleted, stays dead
        assert got[3] == ("en", 1003, 0, 1)      # untouched base
        assert got[1000000003] == ("en", 3, 2, 1)  # inserted new key
        assert got[10] == ("en", 1010, 0, 1)


class TestDegreeDist:
    def test_planted_histogram(self, ray_session, tmp_path):
        """Multi-edges count as occurrences; pure sources appear at
        in-degree 0; histogram matches the oracle exactly."""
        import duckdb

        from wbot_ray.pipelines import graph

        rows = [
            ("https://s.com/1", "https://a.com/x", True),
            ("https://s.com/2", "https://a.com/x", True),   # a/x in=2
            ("https://s.com/1", "https://b.com/y", True),   # b/y in=1
            ("https://s.com/1", "https://b.com/y", True),   # multi-edge -> in=2
            ("https://s.com/2", "https://c.com/z", False),  # not gated
        ]
        p = os.path.join(tmp_path, "links.parquet")
        pq.write_table(
            pa.table(
                {
                    "src_url": pa.array([r[0] for r in rows], pa.string()),
                    "dst_url": pa.array([r[1] for r in rows], pa.string()),
                    "gated": pa.array([r[2] for r in rows], pa.bool_()),
                }
            ),
            p,
        )
        got = {
            r["in_deg"]: r["n_urls"]
            for r in graph.degree_dist(str(tmp_path), links_path=p).take_all()
        }
        con = duckdb.connect()
        want = dict(con.execute(graph.degree_dist_oracle_sql(p)).fetchall())
        assert got == want
        assert got == {0: 2, 2: 2}  # s/1 s/2 at 0; a/x and b/y at 2


class TestTableProfile:
    def test_nulls_and_exact_cents(self, ray_session, tmp_path):
        import duckdb

        from wbot_ray.pipelines import relational

        p = os.path.join(tmp_path, "lineitem.parquet")
        pq.write_table(
            pa.table(
                {
                    "l_quantity": pa.array([1.0, 2.0, None], pa.float64()),
                    "l_extendedprice": pa.array([10.01, 20.02, 30.03], pa.float64()),
                    "l_discount": pa.array([0.05, None, None], pa.float64()),
                    "l_tax": pa.array([0.0, 0.08, 0.02], pa.float64()),
                }
            ),
            p,
        )
        got = {
            r["col_name"]: (
                r["n_rows"], r["n_nulls"], r["min_cents"], r["max_cents"], r["sum_cents"]
            )
            for r in relational.table_profile(str(tmp_path)).take_all()
        }
        con = duckdb.connect()
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{p}')")
        want = {
            r[0]: tuple(r[1:])
            for r in con.execute(relational.table_profile_oracle_sql()).fetchall()
        }
        assert got == want
        assert got["l_quantity"] == (3, 1, 100, 200, 300)
        assert got["l_discount"] == (3, 2, 5, 5, 5)
        assert got["l_extendedprice"] == (3, 0, 1001, 3003, 6006)


class TestHostSssp:
    def _links(self, tmp_path, rows, gated=None):
        p = os.path.join(tmp_path, "links.parquet")
        pq.write_table(
            pa.table(
                {
                    "src_url": pa.array([a for a, _ in rows], pa.string()),
                    "dst_url": pa.array([b for _, b in rows], pa.string()),
                    "gated": pa.array(gated or [True] * len(rows), pa.bool_()),
                }
            ),
            p,
        )
        return p

    def test_chain_cycle_and_unreachable(self, tmp_path, ray_session):
        """Directed BFS from the max-out-degree source host (all-ties
        graph -> lexicographic tie-break picks a.com): chain distances
        are hop counts, a back-cycle never inflates a settled distance,
        hosts not reachable from the seed are absent, directionality is
        respected — parity with the recursive-CTE twin on both
        execution paths."""
        import duckdb

        from wbot_ray.pipelines import graph

        rows = [
            # all hosts have out-degree 1 -> tie-break seeds a.com;
            # chain a -> b -> c
            ("https://a.com/1", "https://b.com/1"),
            ("https://b.com/1", "https://c.com/1"),
            # cycle back c -> a: must not change any settled dist
            ("https://c.com/1", "https://a.com/2"),
            # a also links c directly via a second page? no — keep c at 2
            # z.org is only a SOURCE pointing at a.com: never reached
            # (direction matters), and never the seed (a.com < z.org)
            ("https://z.org/1", "https://a.com/3"),
            # island pair, unreachable from the seed
            ("https://q.net/1", "https://r.net/1"),
        ]
        p = self._links(tmp_path, rows)
        got = {
            r["host"]: r["dist"]
            for r in graph.host_sssp(str(tmp_path), links_path=p).take_all()
        }
        want = {
            h: d
            for h, d in duckdb.connect()
            .execute(graph.host_sssp_oracle_sql(p))
            .fetchall()
        }
        assert got == want
        assert got == {"a.com": 0, "b.com": 1, "c.com": 2}
        # distributed path (local_threshold=0) is value-identical
        dist = {
            r["host"]: r["dist"]
            for r in graph.host_sssp(
                str(tmp_path), links_path=p, local_threshold=0
            ).take_all()
        }
        assert dist == got

    def test_max_hops_bounds_both_engines(self, tmp_path, ray_session):
        """A chain longer than max_hops truncates identically in the
        engine and the recursive oracle (the shared contract that also
        keeps the CTE finite on cycles)."""
        import duckdb

        from wbot_ray.pipelines import graph

        hosts = [f"h{i:02d}.com" for i in range(6)]
        rows = [
            (f"https://{hosts[i]}/x", f"https://{hosts[i + 1]}/x")
            for i in range(len(hosts) - 1)
        ]
        p = self._links(tmp_path, rows)
        for path_kw in ({}, {"local_threshold": 0}):
            got = {
                r["host"]: r["dist"]
                for r in graph.host_sssp(
                    str(tmp_path), links_path=p, max_hops=3, **path_kw
                ).take_all()
            }
            assert got == {"h00.com": 0, "h01.com": 1, "h02.com": 2, "h03.com": 3}
        want = {
            h: d
            for h, d in duckdb.connect()
            .execute(graph.host_sssp_oracle_sql(p, max_hops=3))
            .fetchall()
        }
        assert want == {"h00.com": 0, "h01.com": 1, "h02.com": 2, "h03.com": 3}

    def test_seed_is_max_out_degree_hub(self, tmp_path, ray_session):
        """The seed is the best-connected source host, NOT the
        lexicographic minimum: hub.com (out-degree 3) wins over
        a.com (out-degree 1) on both execution paths and in the twin."""
        import duckdb

        from wbot_ray.pipelines import graph

        rows = [
            ("https://hub.com/x", "https://m1.com/x"),
            ("https://hub.com/x", "https://m2.com/x"),
            ("https://hub.com/x", "https://m3.com/x"),
            ("https://a.com/x", "https://hub.com/x"),
        ]
        p = self._links(tmp_path, rows)
        for path_kw in ({}, {"local_threshold": 0}):
            got = {
                r["host"]: r["dist"]
                for r in graph.host_sssp(str(tmp_path), links_path=p, **path_kw).take_all()
            }
            assert got == {"hub.com": 0, "m1.com": 1, "m2.com": 1, "m3.com": 1}
        want = dict(
            duckdb.connect().execute(graph.host_sssp_oracle_sql(p)).fetchall()
        )
        assert want == {"hub.com": 0, "m1.com": 1, "m2.com": 1, "m3.com": 1}


class TestNeardupLookup:
    """Persisted LSH index + point lookups (pipelines.lshindex)."""

    def _lookup(
        self, planted_dir, tmp_path_factory, threshold=0.5, probe_ids=None
    ):
        from wbot_ray.pipelines import lshindex

        idx = str(tmp_path_factory.mktemp("lshidx"))
        return lshindex.neardup_lookup(
            planted_dir, threshold=threshold, index_dir=idx, probe_ids=probe_ids
        )

    def test_probe_finds_planted_copies(self, planted_dir, tmp_path_factory):
        """The production path: caller-supplied probe_ids."""
        from wbot_ray.pipelines import lshindex

        got = {
            (r["q_id"], r["n_id"]): r["est_pm"]
            for r in self._lookup(
                planted_dir, tmp_path_factory, probe_ids=np.array([0, 16])
            ).take_all()
        }
        # doc 0 is a probe; 100/101 are exact copies -> est 64/64
        assert got[(0, 100)] == 1 << 20
        assert got[(0, 101)] == 1 << 20
        # directional: only probe docs on the q side
        assert all(q in (0, 16) for q, _ in got)
        assert all(q != n for q, n in got)
        # probe 16 is unique word soup: no hits
        assert not any(q == 16 for q, _ in got)
        # the lookup never touched the corpus and recorded its pruning
        assert lshindex.LAST_PRUNE_STATS["probes"] == 2  # docs 0 and 16
        assert lshindex.LAST_PRUNE_STATS["emitted"] == len(got)

    def test_default_probe_set_nonvacuous(self, planted_dir, tmp_path_factory):
        """The demo default (%16 UNION min-of-multi-doc-bucket) must
        surface the planted copies without any caller-supplied probes —
        the gate-integrity property the round-2 verdict asked for."""
        got = {
            (r["q_id"], r["n_id"]): r["est_pm"]
            for r in self._lookup(planted_dir, tmp_path_factory).take_all()
        }
        assert got[(0, 100)] == 1 << 20
        assert got[(0, 101)] == 1 << 20
        assert got  # non-vacuous by construction

    def test_parity_with_dedup_minhash(self, planted_dir, tmp_path_factory):
        """A probe's lookup answers == the batch operator's pairs
        involving that probe (same signatures, bands, estimate)."""
        probe_ids = np.array([0, 16])
        got = {
            (r["q_id"], r["n_id"], r["est_pm"])
            for r in self._lookup(
                planted_dir, tmp_path_factory, probe_ids=probe_ids
            ).take_all()
        }
        batch = {
            (r["id_a"], r["id_b"], r["sim_pm"])
            for r in dedup.dedup_minhash(planted_dir, threshold=0.5).take_all()
        }
        want = {
            (q, n, pm)
            for a, b, pm in batch
            for q, n in ((a, b), (b, a))
            if q % 16 == 0
        }
        assert got == want

    def test_oracle_sql_parity(self, planted_dir, tmp_path_factory):
        import duckdb

        got = sorted(
            (r["q_id"], r["n_id"], r["est_pm"])
            for r in self._lookup(
                planted_dir, tmp_path_factory, threshold=0.7
            ).take_all()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{planted_dir}/documents.parquet')"
        )
        want = sorted(
            tuple(r) for r in con.execute(
                entrymod._neardup_lookup_oracle_sql(threshold=0.7)
            ).fetchall()
        )
        assert got == want and got  # non-empty: the planted copies hit
