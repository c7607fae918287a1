"""The crawl core vs the independent DuckDB BFS oracle.

``wbot_ray.pipelines.crawl_oracle`` re-derives the BFS visited set,
results, and per-round metrics purely in SQL over static link-graph side
tables. This pins the distributed engine against that oracle at tiny
scale — the same comparison the graft driver runs at sf0.01 via
``__ray_entry__.oracle_sql()``.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_TINY = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_sqls(ray_session):
    from wbot_ray.pipelines.crawlq import oracle_entries

    return oracle_entries("tiny")


@pytest.mark.parametrize(
    "name",
    [
        "crawl_visited",
        "crawl_results",
        "crawl_metrics",
        "crawl_text_stats",
        "crawl_depth_hist",
        "host_text_stats",
        "index_lookup",
    ],
)
def test_crawl_query_matches_duckdb_bfs(name, oracle_sqls, ray_session):
    from wbot_ray.pipelines import crawlq

    got = getattr(crawlq, name)(SF_TINY)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = duckdb.connect().execute(oracle_sqls[name]).df()
    assert len(got) > 0
    assert sorted(got.columns) == sorted(want.columns)
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want), check_dtype=False, check_exact=True
    )


def test_visited_order_is_bfs_rank(ray_session, oracle_sqls):
    """crawl_ord must be the dense global BFS pop rank: depths
    non-decreasing, ords dense from 0."""
    from wbot_ray.pipelines import crawlq

    vis = crawlq.crawl_visited(SF_TINY).to_pandas()
    assert list(vis["crawl_ord"]) == list(range(len(vis)))
    assert vis["depth"].is_monotonic_increasing


def test_depth_hist_partitions_ord_space(ray_session):
    """Each depth's [first_ord, last_ord] interval is dense and the
    intervals tile [0, N) in depth order — the BFS contiguity claim."""
    from wbot_ray.pipelines import crawlq

    h = (
        crawlq.crawl_depth_hist(SF_TINY)
        .to_pandas()
        .sort_values("depth")
        .reset_index(drop=True)
    )
    nxt = 0
    for _, r in h.iterrows():
        assert r["first_ord"] == nxt
        assert r["last_ord"] - r["first_ord"] + 1 == r["n_urls"]
        nxt = r["last_ord"] + 1
    assert nxt == h["n_urls"].sum()


def test_export_corpus_roundtrip_and_resume(ray_session):
    """export_corpus writes a documents-shaped resumable corpus: the
    read-back rows equal the crawl's successful fetches; deleting one
    partition's _SUCCESS marker and re-exporting redoes ONLY that
    partition and reproduces identical counts."""
    import os
    import shutil

    from wbot_ray.pipelines import crawlq
    from wbot_ray.sinks import read_partitioned

    summary = {r["part"]: r["n_rows"] for r in crawlq.export_corpus(SF_TINY).to_pylist()}
    results = crawlq.crawl_results(SF_TINY).to_pandas()
    ok = results[results["status"] == 200]
    assert sum(summary.values()) == len(ok)

    out_dir = os.path.join(crawlq._CACHE_ROOT, "tiny", "export_corpus")
    docs = read_partitioned(out_dir).to_pandas()
    assert len(docs) == len(ok)
    # read_partitioned re-attaches the partition value as "part"
    assert sorted(docs.columns) == ["doc_id", "lang", "n_chars", "part", "source", "text"]
    assert set(docs["doc_id"]) == set(ok["crawl_ord"])

    # crash simulation: one partition loses its marker mid-commit
    victim = sorted(summary)[0]
    shutil.os.remove(os.path.join(out_dir, f"part={victim}", "_SUCCESS"))
    summary2 = {r["part"]: r["n_rows"] for r in crawlq.export_corpus(SF_TINY).to_pylist()}
    assert summary2 == summary
