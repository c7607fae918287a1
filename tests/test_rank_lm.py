"""BM25 ranked retrieval and n-gram LM quality scoring against their
DuckDB twins on planted and randomized corpora — both engines evaluate
the identical int64 fixed-point formulas (floor division placement and
``length(bin(x))`` bit-length logs included), so every value must agree
on ANY input."""

from __future__ import annotations

import os
import random

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from wbot_ray.pipelines import search, textops


def _write_docs(tmp_path, texts, sources=None):
    p = os.path.join(tmp_path, "documents.parquet")
    cols = {
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }
    if sources is not None:
        cols["source"] = pa.array(sources, pa.string())
    pq.write_table(pa.table(cols), p)
    return p


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _assert_match(ds, sql, docs_path):
    got = ds.to_pandas() if not isinstance(ds, pd.DataFrame) else ds
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs_path}')")
    want = con.execute(sql).df()
    assert sorted(got.columns) == sorted(want.columns)
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want), check_dtype=False, check_exact=True
    )


class TestBm25:
    def test_planted_ranking_and_parity(self, ray_session, tmp_path):
        """Known tf/dl corpus: value parity with the SQL twin; a doc
        with more hits of a rarer term outranks a common-term doc;
        docs without any query term are absent."""
        texts = [
            "join join join pad pad pad",          # tf(join)=3, short
            "join pad pad pad pad pad pad pad",    # tf(join)=1, longer
            "filter pad pad",                      # tf(filter)=1
            "pad pad pad pad",                     # no query term
            "join filter join filter",             # both terms
        ]
        p = _write_docs(tmp_path, texts)
        ds = search.bm25_search(str(tmp_path))
        _assert_match(ds, search.bm25_oracle_sql(), p)
        got = {r["doc_id"]: r for r in ds.take_all()}
        assert 3 not in got
        assert got[0]["bm25_fp"] > got[1]["bm25_fp"]  # higher tf, shorter doc
        assert got[4]["n_terms"] == 2
        assert got[0]["n_terms"] == got[1]["n_terms"] == 1

    def test_randomized_parity(self, ray_session, tmp_path):
        """Randomized corpus over a vocabulary containing the query
        terms: exact value parity on every row."""
        rng = random.Random(11)
        vocab = ["join", "filter", "scan", "sort", "pad", "x", "y"]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 40)))
            for _ in range(120)
        ]
        p = _write_docs(tmp_path, texts)
        _assert_match(
            search.bm25_search(str(tmp_path)), search.bm25_oracle_sql(), p
        )

    def test_no_match_is_empty_typed(self, ray_session, tmp_path):
        """A corpus without the query terms yields an empty result with
        the full output schema (typed-empty contract)."""
        p = _write_docs(tmp_path, ["pad pad", "x y z"])
        ds = search.bm25_search(str(tmp_path))
        assert ds.count() == 0
        assert set(ds.schema().names) == {"doc_id", "n_terms", "bm25_fp"}
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
        assert con.execute(search.bm25_oracle_sql()).df().empty


class TestLmScore:
    def test_planted_fluency_and_parity(self, ray_session, tmp_path):
        """Train slice teaches 'a b' bigrams; a doc of trained bigrams
        scores lower bits-per-bigram than unseen-junk; single-token and
        empty docs produce zero rows; parity with the SQL twin."""
        train = ["a b a b a b a b", "a b a b"]
        texts = train + [
            "a b a b a b",      # fluent under the model
            "q r s t u v",      # all-unseen junk
            "solo",             # one token: 0 bigrams
            "",                 # empty: 0 bigrams
        ]
        sources = ["src0", "src0", "web", "web", "web", "web"]
        p = _write_docs(tmp_path, texts, sources)
        ds = textops.lm_score(str(tmp_path))
        _assert_match(ds, textops.lm_score_oracle_sql(), p)
        got = {r["doc_id"]: r for r in ds.take_all()}
        assert got[2]["sbpb_x1000"] < got[3]["sbpb_x1000"]
        assert got[4] == {"doc_id": 4, "n_bigrams": 0, "surprisal": 0, "sbpb_x1000": 0}
        assert got[5]["n_bigrams"] == 0
        # unseen left contexts pay the OOV penalty: bitlen(T+1) - 1
        # bits each (T = 10 train bigrams here)
        assert got[3]["surprisal"] == 5 * ((10 + 1).bit_length() - 1)

    def test_randomized_parity(self, ray_session, tmp_path):
        """Randomized corpus with a randomized train slice: exact value
        parity (bit-length logs, Laplace smoothing, floor division)."""
        rng = random.Random(23)
        vocab = [f"w{i}" for i in range(12)]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 30)))
            for _ in range(100)
        ]
        sources = [rng.choice(["src0", "src1", "src2"]) for _ in texts]
        p = _write_docs(tmp_path, texts, sources)
        _assert_match(
            textops.lm_score(str(tmp_path)), textops.lm_score_oracle_sql(), p
        )

    def test_bits_never_negative(self, ray_session, tmp_path):
        """c(bigram) <= c(left word) in any train corpus, so per-doc
        surprisal is always >= 0 — pinned on a corpus engineered to
        maximize bigram concentration."""
        texts = ["a a a a a a a a", "a a", "b a a b"]
        sources = ["src0", "web", "web"]
        p = _write_docs(tmp_path, texts, sources)
        for r in textops.lm_score(str(tmp_path)).take_all():
            assert r["surprisal"] >= 0
        _assert_match(
            textops.lm_score(str(tmp_path)), textops.lm_score_oracle_sql(), p
        )


class TestDsir:
    def test_target_like_scores_higher_and_parity(self, ray_session, tmp_path):
        """Docs built from target-slice bigrams get a higher log
        importance weight than off-target docs; exact parity with the
        SQL twin (md5 feature hash, bit-length logs, closed-form
        normalizer)."""
        target = ["alpha beta alpha beta alpha beta", "alpha beta gamma"]
        texts = target + [
            "alpha beta alpha beta",   # target-like
            "zz yy xx ww vv uu",       # off-target
            "solo",                    # 0 features
        ]
        sources = ["src0", "src0", "web", "web", "web"]
        p = _write_docs(tmp_path, texts, sources)
        ds = textops.dsir_logweight(str(tmp_path))
        _assert_match(ds, textops.dsir_logweight_oracle_sql(), p)
        got = {r["doc_id"]: r for r in ds.take_all()}
        assert got[2]["logw_bits"] > got[3]["logw_bits"]
        assert got[4] == {"doc_id": 4, "n_feats": 0, "logw_bits": 0}

    def test_randomized_parity(self, ray_session, tmp_path):
        """Randomized corpus and target slice: every row value-exact
        (hash bucketing collisions included — both engines share the
        md5 % n_features identity)."""
        rng = random.Random(31)
        vocab = [f"w{i}" for i in range(25)]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 25)))
            for _ in range(90)
        ]
        sources = [rng.choice(["src0", "src1"]) for _ in texts]
        p = _write_docs(tmp_path, texts, sources)
        _assert_match(
            textops.dsir_logweight(str(tmp_path)),
            textops.dsir_logweight_oracle_sql(),
            p,
        )


class TestCcnetBuckets:
    def test_tercile_assignment_and_parity(self, ray_session, tmp_path):
        """Per-lang NTILE(3) over surprisal with the exact SQL window
        semantics (first n%k buckets get one extra row, (sbpb, doc_id)
        tie-break); fluent docs land in head, junk in tail."""
        train = ["a b a b a b a b a b", "a b c a b c"]
        texts = train + [
            "a b a b",            # en, fluent
            "a b a b a b",        # en, fluent
            "q r s t u v w x",    # en, junk
            "m n o p q r",        # en, junk-ish
            "a b",                # fr
            "z z z z z",          # fr
            "a b c",              # fr
        ]
        langs = ["en", "en", "en", "en", "en", "en", "fr", "fr", "fr"]
        sources = ["src0", "src0"] + ["web"] * 7
        p = os.path.join(tmp_path, "documents.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(langs, pa.string()),
                    "source": pa.array(sources, pa.string()),
                }
            ),
            p,
        )
        ds = textops.ccnet_buckets(str(tmp_path))
        _assert_match(ds, textops.ccnet_buckets_oracle_sql(), p)
        got = {r["doc_id"]: r for r in ds.take_all()}
        assert got[2]["label"] == "head" and got[4]["label"] == "tail"
        # every lang uses the full 1..3 bucket range when n >= k
        for lang in ("en", "fr"):
            assert {r["bucket"] for r in got.values() if r["lang"] == lang} == {1, 2, 3}

    def test_randomized_parity(self, ray_session, tmp_path):
        """Randomized corpus: byte-exact NTILE parity including tie
        groups and languages smaller than k."""
        rng = random.Random(41)
        vocab = [f"w{i}" for i in range(10)]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 20)))
            for _ in range(80)
        ]
        langs = [rng.choice(["en", "de", "zz"]) for _ in texts]  # zz tiny
        langs[:2] = ["qq", "qq"]  # a lang with n < k
        sources = [rng.choice(["src0", "src1"]) for _ in texts]
        p = os.path.join(tmp_path, "documents.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(langs, pa.string()),
                    "source": pa.array(sources, pa.string()),
                }
            ),
            p,
        )
        _assert_match(
            textops.ccnet_buckets(str(tmp_path)),
            textops.ccnet_buckets_oracle_sql(),
            p,
        )
