"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline at sf0.001; ``queries()``
exposes every implemented pipeline (crawl core + training-data ops +
relational analytics) and ``oracle_sql()`` the DuckDB-checkable subset.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in ``wbot_ray``) calls ``ray.init()`` / ``ray.shutdown()``.

Float-determinism contract with the SQL oracles: only integer counts,
integer cents/centi-cent sums, md5 hex digests, and *single* IEEE-754
divisions appear in oracle-checked columns — never multi-term float
accumulations, whose value depends on summation order (see
``wbot_ray/pipelines/common.py``).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

STOP_SQL = "('the','a','and','of','to','in','is','on')"
TOKEN_PATTERN_SQL = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def entry() -> Any:
    """Flagship pipeline: BFS crawl of the deterministic synthetic web at
    tiny scale — fetch-join, extract, filter, dedup, order — returning
    the crawl-ordered visited table."""
    from wbot_ray.pipelines.crawlq import crawl_visited

    return crawl_visited("/root/testdata/sf0.001")


def _typed_query(fn: Callable[[str], Any], cols: tuple[str, ...]) -> Callable[[str], Any]:
    """Query-surface adapter for small-output pipelines: Ray's
    ``Dataset.to_pandas()`` drops ALL columns when the result is empty
    (even with a known schema), which would fail the driver's schema
    gate on a legitimately empty result. These outputs are tiny by
    design (the library functions stay streaming Datasets), so the query
    surface materializes and re-types an empty frame."""

    def run(sf_dir: str):
        import pandas as pd

        df = fn(sf_dir).to_pandas()
        if df.shape[1] == 0:
            df = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        return df

    return run


def _pairs_query(fn: Callable[[str], Any]) -> Callable[[str], Any]:
    return _typed_query(fn, ("id_a", "id_b", "sim_pm"))


def queries() -> dict[str, Callable[[str], Any]]:
    from wbot_ray.pipelines import (
        crawlq,
        dedup,
        lshindex,
        multimodal,
        relational,
        search,
        similarity,
        textops,
        training,
    )

    return {
        # -- crawl core (oracle = sequential reference simulator in tests/)
        "crawl_visited": crawlq.crawl_visited,
        "crawl_results": crawlq.crawl_results,
        "crawl_metrics": crawlq.crawl_metrics,
        "crawl_depth_hist": crawlq.crawl_depth_hist,
        "host_text_stats": crawlq.host_text_stats,
        "index_lookup": crawlq.index_lookup,
        "crawl_text_stats": crawlq.crawl_text_stats,
        "export_corpus": crawlq.export_corpus,
        # -- text analysis
        "text_stats": lambda sf: textops.text_stats(sf),
        "lang_dist": textops.lang_dist,
        "token_counts": textops.token_counts,
        "doc_fingerprint": lambda sf: textops.doc_fingerprint(sf).select_columns(
            ["doc_id", "fp_md5"]
        ),
        "langid": textops.langid,
        "heavy_hitters": textops.heavy_hitters,
        "cms_sketch": textops.cms_sketch,
        "corpus_filter": textops.corpus_filter,
        "filter_funnel": textops.filter_funnel,
        "ngram_counts": _typed_query(textops.ngram_counts, ("ngram", "n_occurrences")),
        "bpe_pairs": _typed_query(textops.bpe_pairs, ("pair", "n_occurrences")),
        "cooccur_counts": _typed_query(
            textops.cooccur_counts, ("w_a", "w_b", "n_cooccur")
        ),
        "tfidf_topterms": textops.tfidf_topterms,
        "lm_score": textops.lm_score,
        "dsir_logweight": textops.dsir_logweight,
        "ccnet_buckets": textops.ccnet_buckets,
        "length_sketch_quantiles": textops.length_sketch_quantiles,
        "normalize_text": textops.normalize_text,
        # -- deduplication (pair queries via _pairs_query: a legitimately
        #    empty pair set must still present the PAIR_SCHEMA columns)
        #    The hot-bucket cap (max_bucket_docs=1024) is OPT-IN from
        #    this harness — the library default is None (full recall);
        #    the oracles apply the identical QUALIFY rule, so harness
        #    and SQL stay in lockstep while plain library callers keep
        #    the uncapped guarantees (ADVICE r3).
        "dedup_exact": dedup.dedup_exact,
        "dedup_ngram": _pairs_query(dedup.dedup_ngram),
        "dedup_minhash": _pairs_query(
            lambda sf: dedup.dedup_minhash(sf, max_bucket_docs=1024)
        ),
        "dedup_simhash": _pairs_query(
            lambda sf: dedup.dedup_simhash(sf, max_bucket_docs=1024)
        ),
        # gate parameters, not the operator defaults: the synthetic
        # embeddings are near-orthogonal (max pairwise cosine ~0.51 at
        # sf0.01), so the production threshold 0.92 correctly finds
        # nothing — a 0=0 gate proves nothing. Shorter bands (6 planes),
        # more tables (8) and threshold 0.3 exercise the identical
        # bucket/verify machinery with a few hundred value-checked rows.
        "dedup_embed": _pairs_query(
            lambda sf: dedup.dedup_embed(
                sf, threshold=0.3, n_tables=8, n_planes=6, max_bucket_docs=1024
            )
        ),
        "neardup_lookup": _typed_query(
            lshindex.neardup_lookup, ("q_id", "n_id", "est_pm")
        ),
        "dup_clusters": _typed_query(
            lambda sf: dedup.dup_clusters(sf, max_bucket_docs=1024),
            ("doc_id", "cluster_id"),
        ),
        "dedup_keep": lambda sf: dedup.dedup_keep(sf, max_bucket_docs=1024),
        "dedup_segments": dedup.dedup_segments,
        "dup_spans": dedup.dup_spans,
        "dedup_span_apply": dedup.dedup_span_apply,
        # -- training-data prep
        "sample_hash": training.sample_hash,
        "pack_sequences": training.pack_sequences,
        "stratified_sample": training.stratified_sample,
        "weighted_sample": training.weighted_sample,
        "global_shuffle": training.global_shuffle,
        "prepare_corpus": training.prepare_corpus,
        "doc_chunks": training.doc_chunks,
        "source_mix": training.source_mix,
        "token_budget_mix": training.token_budget_mix,
        "compact_corpus": lambda sf: __import__(
            "wbot_ray.pipelines.maintenance", fromlist=["compact_corpus"]
        ).compact_corpus(sf),
        "corpus_diff": lambda sf: __import__(
            "wbot_ray.pipelines.maintenance", fromlist=["corpus_diff"]
        ).corpus_diff(sf),
        "upsert_merge": lambda sf: __import__(
            "wbot_ray.pipelines.maintenance", fromlist=["upsert_merge"]
        ).upsert_merge(sf),
        "snapshot_latest": lambda sf: __import__(
            "wbot_ray.pipelines.maintenance", fromlist=["snapshot_latest"]
        ).snapshot_latest(sf),
        # -- graph analytics over the crawl link graph
        "link_pagerank": lambda sf: __import__(
            "wbot_ray.pipelines.graph", fromlist=["link_pagerank"]
        ).link_pagerank(sf),
        "link_degrees": lambda sf: __import__(
            "wbot_ray.pipelines.graph", fromlist=["link_degrees"]
        ).link_degrees(sf),
        "link_triangles": lambda sf: __import__(
            "wbot_ray.pipelines.graph", fromlist=["link_triangles"]
        ).link_triangles(sf),
        "link_components": lambda sf: __import__(
            "wbot_ray.pipelines.graph", fromlist=["link_components"]
        ).link_components(sf),
        "host_graph": lambda sf: __import__(
            "wbot_ray.pipelines.graph", fromlist=["host_graph"]
        ).host_graph(sf),
        "host_components": lambda sf: __import__(
            "wbot_ray.pipelines.graph", fromlist=["host_components"]
        ).host_components(sf),
        "host_pagerank": lambda sf: __import__(
            "wbot_ray.pipelines.graph", fromlist=["host_pagerank"]
        ).host_pagerank(sf),
        "host_hits": lambda sf: __import__(
            "wbot_ray.pipelines.graph", fromlist=["host_hits"]
        ).host_hits(sf),
        "link_reciprocity": lambda sf: __import__(
            "wbot_ray.pipelines.graph", fromlist=["link_reciprocity"]
        ).link_reciprocity(sf),
        "degree_dist": lambda sf: __import__(
            "wbot_ray.pipelines.graph", fromlist=["degree_dist"]
        ).degree_dist(sf),
        "host_sssp": lambda sf: __import__(
            "wbot_ray.pipelines.graph", fromlist=["host_sssp"]
        ).host_sssp(sf),
        "link_kcore": lambda sf: __import__(
            "wbot_ray.pipelines.graph", fromlist=["link_kcore"]
        ).link_kcore(sf),
        "retention_cohorts": lambda sf: __import__(
            "wbot_ray.pipelines.relational", fromlist=["retention_cohorts"]
        ).retention_cohorts(sf),
        "frontier_priority": lambda sf: __import__(
            "wbot_ray.pipelines.graph", fromlist=["frontier_priority"]
        ).frontier_priority(sf),
        "anchor_texts": lambda sf: __import__(
            "wbot_ray.pipelines.anchors", fromlist=["anchor_texts"]
        ).anchor_texts(sf),
        "url_features": lambda sf: __import__(
            "wbot_ray.pipelines.urlstats", fromlist=["url_features"]
        ).url_features(sf),
        "link_gate_stats": lambda sf: __import__(
            "wbot_ray.pipelines.urlstats", fromlist=["link_gate_stats"]
        ).link_gate_stats(sf),
        "url_blocklist": lambda sf: __import__(
            "wbot_ray.pipelines.urlstats", fromlist=["url_blocklist"]
        ).url_blocklist(sf),
        # -- web-corpus audit / maintenance passes
        "crawl_traps": lambda sf: __import__(
            "wbot_ray.pipelines.webops", fromlist=["crawl_traps"]
        ).crawl_traps(sf),
        "boilerplate_lines": lambda sf: __import__(
            "wbot_ray.pipelines.webops", fromlist=["boilerplate_lines"]
        ).boilerplate_lines(sf),
        "change_rate": lambda sf: __import__(
            "wbot_ray.pipelines.webops", fromlist=["change_rate"]
        ).change_rate(sf),
        "mirror_hosts": lambda sf: __import__(
            "wbot_ray.pipelines.webops", fromlist=["mirror_hosts"]
        ).mirror_hosts(sf),
        "host_quota": lambda sf: __import__(
            "wbot_ray.pipelines.webops", fromlist=["host_quota"]
        ).host_quota(sf),
        "dedup_url": lambda sf: __import__(
            "wbot_ray.pipelines.webops", fromlist=["dedup_url"]
        ).dedup_url(sf),
        "recrawl_priority": lambda sf: __import__(
            "wbot_ray.pipelines.webops", fromlist=["recrawl_priority"]
        ).recrawl_priority(sf),
        "host_dup_ratio": lambda sf: __import__(
            "wbot_ray.pipelines.webops", fromlist=["host_dup_ratio"]
        ).host_dup_ratio(sf),
        "text_outlinks": lambda sf: __import__(
            "wbot_ray.pipelines.webops", fromlist=["text_outlinks"]
        ).text_outlinks(sf),
        "holdout_split": lambda sf: __import__(
            "wbot_ray.pipelines.webops", fromlist=["holdout_split"]
        ).holdout_split(sf),
        "jsonl_stats": lambda sf: __import__(
            "wbot_ray.pipelines.webops", fromlist=["jsonl_stats"]
        ).jsonl_stats(sf),
        "warc_stats": lambda sf: __import__(
            "wbot_ray.pipelines.webops", fromlist=["warc_stats"]
        ).warc_stats(sf),
        "table_profile": lambda sf: __import__(
            "wbot_ray.pipelines.relational", fromlist=["table_profile"]
        ).table_profile(sf),
        # -- model inference (actor-pool batched encoder)
        "embed_docs": lambda sf: __import__(
            "wbot_ray.pipelines.inference", fromlist=["embed_docs"]
        ).embed_docs(sf),
        # -- similarity search / clustering
        "kmeans_clusters": lambda sf: __import__(
            "wbot_ray.pipelines.clustering", fromlist=["kmeans_clusters"]
        ).kmeans_clusters(sf),
        "pq_codes": lambda sf: __import__(
            "wbot_ray.pipelines.clustering", fromlist=["pq_codes"]
        ).pq_codes(sf),
        "pq_search": lambda sf: __import__(
            "wbot_ray.pipelines.clustering", fromlist=["pq_search"]
        ).pq_search(sf),
        "knn_brute": similarity.knn_brute,
        "knn_ivf": similarity.knn_ivf,
        "semantic_search": lambda sf: __import__(
            "wbot_ray.pipelines.semantic", fromlist=["semantic_search"]
        ).semantic_search(sf),
        "term_search": search.term_search,
        "phrase_search": _typed_query(search.phrase_search, ("doc_id", "n_matches")),
        "bm25_search": _typed_query(
            search.bm25_search, ("doc_id", "n_terms", "bm25_fp")
        ),
        "freq_quality": textops.freq_quality,
        # -- multimodal plumbing
        "payload_features": multimodal.payload_features,
        "frame_features": lambda sf: multimodal.frame_features(sf).select_columns(
            ["doc_id", "frame_idx", "frame_bytes"]
        ),
        "audio_features": multimodal.audio_features,
        # -- relational / windowed analytics
        "q1_pricing": relational.q1_pricing,
        "cust_order_stats": relational.cust_order_stats,
        "events_hourly": relational.events_hourly,
        "events_sliding": relational.events_sliding,
        "daily_active_users": relational.daily_active_users,
        "approx_distinct_users": relational.approx_distinct_users,
        "sessionize": relational.sessionize,
        "asof_prior_event": relational.asof_prior_event,
        "window_pairs": relational.window_pairs,
        "funnel_steps": relational.funnel_steps,
        "topk_users": relational.topk_users,
        "group_topn": relational.group_topn,
        "price_quantiles": relational.price_quantiles,
        "orders_rollup": relational.orders_rollup,
        "urgent_orders_by_year": relational.urgent_orders_by_year,
        "region_acctbal": relational.region_acctbal,
        "price_band_join": relational.price_band_join,
        "order_priority_revenue": lambda sf: __import__(
            "wbot_ray.pipelines.join", fromlist=["order_priority_revenue"]
        ).order_priority_revenue(sf),
        "q3_shipping": lambda sf: __import__(
            "wbot_ray.pipelines.join", fromlist=["q3_shipping"]
        ).q3_shipping(sf),
        "bloom_semi_join": lambda sf: __import__(
            "wbot_ray.pipelines.join", fromlist=["bloom_semi_join"]
        ).bloom_semi_join(sf),
        "zorder_layout": lambda sf: __import__(
            "wbot_ray.pipelines.layout", fromlist=["zorder_layout"]
        ).zorder_layout(sf),
        "inverted_postings": _typed_query(
            search.inverted_postings,
            ("term", "df", "tf_sum", "postings_sum", "postings_xor"),
        ),
        "churned_users": _typed_query(relational.churned_users, ("user_id",)),
        "props_by_type": relational.props_by_type,
        "user_running_value": relational.user_running_value,
        "events_pivot": relational.events_pivot,
        "events_anomaly": relational.events_anomaly,
        "late_events": relational.late_events,
        "orders_cube": relational.orders_cube,
        "user_day_share": relational.user_day_share,
        "price_range_scan": relational.price_range_scan,
        # -- corpus hygiene
        "decontaminate": textops.decontaminate,
        "quality_score": textops.quality_score,
        "repetition_stats": textops.repetition_stats,
        "pii_scrub": textops.pii_scrub,
        "length_deciles": textops.length_deciles,
    }


def _source_mix_oracle_sql() -> str:
    """Generated from the SAME DEFAULT_MIX spec and integer rate rule
    the engine uses (``training.mix_rates_ppm``): per-source counts,
    floor-div ppm rates clamped at 10^6, keep iff the salted
    md5_number_lower of the doc key lands under the source's rate."""
    from wbot_ray.pipelines.training import DEFAULT_MIX, MIX_SALT, PPM

    values = ", ".join(f"('{s}', {w})" for s, w in sorted(DEFAULT_MIX.items()))
    return f"""
        WITH w(source, wt) AS (VALUES {values}),
        counts AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n
          FROM documents GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(c.n) AS BIGINT) // 2 AS n_out,
                 CAST(SUM(w.wt) AS BIGINT) AS w_total
          FROM counts c JOIN w USING (source)),
        rates AS (
          SELECT c.source,
                 CAST(LEAST({PPM},
                      (t.n_out * w.wt * {PPM}) // (t.w_total * c.n))
                      AS BIGINT) AS rate_ppm
          FROM counts c JOIN w USING (source), tot t)
        SELECT d.doc_id, d.source, r.rate_ppm
        FROM documents d JOIN rates r USING (source)
        WHERE md5_number_lower('{MIX_SALT}' || CAST(d.doc_id AS VARCHAR))
                % {PPM} < r.rate_ppm
    """


def _pii_scrub_oracle_sql() -> str:
    """Generated from the SAME PII_PATTERNS tuple the engine scrubs
    with (single source of truth): sequential regexp_replace nesting in
    the engine's application order, each pattern counted on the text
    state it actually sees. DuckDB's regexp_* and pyarrow's kernels are
    both RE2, so the identical pattern string is value-exact for ANY
    input."""
    from wbot_ray.pipelines.textops import PII_PATTERNS

    (_, em, em_r), (_, ip, ip_r), (_, ph, ph_r) = PII_PATTERNS
    return f"""
        WITH s1 AS (
          SELECT doc_id, text,
                 regexp_replace(text, '{em}', '{em_r}', 'g') AS t1,
                 CAST(len(regexp_extract_all(text, '{em}')) AS BIGINT) AS n_email
          FROM documents),
        s2 AS (
          SELECT *, regexp_replace(t1, '{ip}', '{ip_r}', 'g') AS t2,
                 CAST(len(regexp_extract_all(t1, '{ip}')) AS BIGINT) AS n_ipv4
          FROM s1),
        s3 AS (
          SELECT *, regexp_replace(t2, '{ph}', '{ph_r}', 'g') AS t3,
                 CAST(len(regexp_extract_all(t2, '{ph}')) AS BIGINT) AS n_phone
          FROM s2)
        SELECT doc_id, md5(t3) AS scrub_hash,
               n_email, n_ipv4, n_phone, (t3 <> text) AS changed
        FROM s3
    """


def _langid_oracle_sql() -> str:
    """Generated from the SAME profile table the engine scores with —
    argmax of per-language stopword hits (sorted-lang first-wins
    tie-break, 'und' when every profile scores 0), score = best hits /
    token count (ONE float division — bit-exact across engines)."""
    from wbot_ray.pipelines.textops import LANG_PROFILES

    langs = [l for l in sorted(LANG_PROFILES) if LANG_PROFILES[l]]
    score_exprs = ",\n                     ".join(
        "CAST(len(list_filter(toks, w -> w IN ({}))) AS BIGINT) AS s_{}".format(
            ",".join(f"'{w}'" for w in sorted(LANG_PROFILES[l])), l
        )
        for l in langs
    )
    all_scores = ", ".join(f"s_{l}" for l in langs)
    pred_case = (
        "CASE "
        + " ".join(
            f"WHEN s_{l} > 0 AND s_{l} >= GREATEST({all_scores}) THEN '{l}'"
            for l in langs
        )
        + " ELSE 'und' END"
    )
    return f"""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), s AS (
          SELECT doc_id, len(toks) AS n_toks,
                     {score_exprs}
          FROM t
        )
        SELECT doc_id,
               {pred_case} AS pred_lang,
               CAST(GREATEST(0, {all_scores}) AS DOUBLE)
                 / CAST(GREATEST(n_toks, 1) AS DOUBLE) AS score
        FROM s
    """


# Shared shingle CTE body for the sketch oracles: distinct 3-word
# shingles exactly as wbot_ray.pipelines.common.shingle_hashes builds
# them (short texts collapse to the single whole-text shingle).
_SHINGLE_CTE = """w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        idx AS (SELECT doc_id, w,
                       unnest(generate_series(1, greatest(len(w) - 2, 1))) AS i
                FROM w),
        sh AS (SELECT DISTINCT doc_id,
                      array_to_string(list_slice(w, i, i + 2), ' ') AS sh
               FROM idx)"""


def _minhash_oracle_sql(threshold: float = 0.7, max_bucket_docs: int = 1024) -> str:
    """MinHash-LSH recomputed from scratch in SQL. The engine's hash
    family (md5_number_lower shingle identity + affine permutations mod
    the Mersenne prime 2^31-1, fixed seeded constants) was chosen
    precisely so this oracle is value-exact: no floats, no
    engine-private hashing — DuckDB derives the identical 64-component
    signatures, band buckets, and estimated-Jaccard verdicts, including
    the engine's star+first-k bucket skew bound (``(rn_a <= k AND
    rn_b <= k) OR rn_a = 1`` per band bucket)."""
    from wbot_ray.pipelines.dedup import MINHASH_P, N_BANDS, N_PERM, PERM_A, PERM_B

    thr_pm = int(threshold * (1 << 20))
    rows = N_PERM // N_BANDS
    perms = ",\n               ".join(
        f"({i}, {int(a)}, {int(b)})" for i, (a, b) in enumerate(zip(PERM_A, PERM_B))
    )
    return f"""
        WITH {_SHINGLE_CTE},
        base AS (SELECT doc_id, (md5_number_lower(sh) % {MINHASH_P})::BIGINT AS h FROM sh),
        perm(i, a, b) AS (VALUES {perms}),
        mins AS (SELECT doc_id, i, MIN((a * h + b) % {MINHASH_P}) AS m
                 FROM base CROSS JOIN perm GROUP BY doc_id, i),
        bands AS (SELECT doc_id, i // {rows} AS band,
                         string_agg(m, ',' ORDER BY i) AS key
                  FROM mins GROUP BY doc_id, i // {rows}),
        ranked AS (SELECT doc_id, band, key,
                          ROW_NUMBER() OVER (PARTITION BY band, key
                                             ORDER BY doc_id) AS rn
                   FROM bands),
        cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                 FROM ranked x JOIN ranked y
                   ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
                  AND ((x.rn <= {max_bucket_docs} AND y.rn <= {max_bucket_docs})
                       OR x.rn = 1)),
        sim AS (SELECT c.id_a, c.id_b,
                       CAST(SUM(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) AS BIGINT) AS matches
                FROM cand c
                JOIN mins ma ON ma.doc_id = c.id_a
                JOIN mins mb ON mb.doc_id = c.id_b AND mb.i = ma.i
                GROUP BY c.id_a, c.id_b)
        SELECT id_a, id_b, (matches * 1048576) // {N_PERM} AS sim_pm
        FROM sim WHERE (matches * 1048576) // {N_PERM} >= {thr_pm}
    """


def _neardup_lookup_oracle_sql(threshold: float = 0.7) -> str:
    """neardup_lookup recomputed from scratch: identical signature /
    band / estimate math to ``_minhash_oracle_sql``, restricted to the
    probe set (``doc_id % 16 = 0`` UNION the min doc_id of every band
    bucket with ≥ 2 distinct docs — the same non-vacuous demo rule the
    engine derives from its bands index) and DIRECTIONAL — one row per
    (probe, neighbor), neighbor != probe. The engine matches candidates
    on the 64-bit blake2b band hash while SQL matches the raw band key
    string; a cross-key hash collision (~2^-64, the same tolerance
    dedup_minhash's bucket groupby accepts) is the only way they could
    diverge."""
    from wbot_ray.pipelines.dedup import MINHASH_P, N_PERM, PERM_A, PERM_B
    from wbot_ray.pipelines.lshindex import _ROWS_PER_BAND

    thr_pm = int(threshold * (1 << 20))
    perms = ",\n               ".join(
        f"({i}, {int(a)}, {int(b)})" for i, (a, b) in enumerate(zip(PERM_A, PERM_B))
    )
    return f"""
        WITH {_SHINGLE_CTE},
        base AS (SELECT doc_id, (md5_number_lower(sh) % {MINHASH_P})::BIGINT AS h FROM sh),
        perm(i, a, b) AS (VALUES {perms}),
        mins AS (SELECT doc_id, i, MIN((a * h + b) % {MINHASH_P}) AS m
                 FROM base CROSS JOIN perm GROUP BY doc_id, i),
        bands AS (SELECT doc_id, i // {_ROWS_PER_BAND} AS band,
                         string_agg(m, ',' ORDER BY i) AS key
                  FROM mins GROUP BY doc_id, i // {_ROWS_PER_BAND}),
        probes AS (SELECT doc_id FROM bands WHERE doc_id % 16 = 0
                   UNION
                   SELECT MIN(doc_id) FROM bands
                   GROUP BY band, key HAVING COUNT(DISTINCT doc_id) >= 2),
        cand AS (SELECT DISTINCT q.doc_id AS q_id, n.doc_id AS n_id
                 FROM bands q JOIN bands n
                   ON q.band = n.band AND q.key = n.key AND n.doc_id <> q.doc_id
                 WHERE q.doc_id IN (SELECT doc_id FROM probes)),
        est AS (SELECT c.q_id, c.n_id,
                       CAST(SUM(CASE WHEN mq.m = mn.m THEN 1 ELSE 0 END) AS BIGINT) AS matches
                FROM cand c
                JOIN mins mq ON mq.doc_id = c.q_id
                JOIN mins mn ON mn.doc_id = c.n_id AND mn.i = mq.i
                GROUP BY c.q_id, c.n_id)
        SELECT q_id, n_id, (matches * 1048576) // {N_PERM} AS est_pm
        FROM est WHERE (matches * 1048576) // {N_PERM} >= {thr_pm}
    """


def _simhash_oracle_sql(max_hamming: int = 3, max_bucket_docs: int = 1024) -> str:
    """SimHash recomputed bit-by-bit in SQL: strict-majority vote over
    the md5_number_lower shingle hashes, 4×16-bit band blocking, exact
    Hamming verify — identical rules to dedup_simhash, including the
    star+first-k hot-bucket envelope."""
    return f"""
        WITH {_SHINGLE_CTE},
        h AS (SELECT doc_id, md5_number_lower(sh) AS h FROM sh),
        bits AS (SELECT doc_id, b,
                        CASE WHEN SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) > 0
                             THEN 1 ELSE 0 END AS bit
                 FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bs
                 GROUP BY doc_id, b),
        bands AS (SELECT doc_id, b // 16 AS band,
                         CAST(SUM(bit << (b % 16)) AS BIGINT) AS key
                  FROM bits GROUP BY doc_id, b // 16),
        ranked AS (SELECT doc_id, band, key,
                          ROW_NUMBER() OVER (PARTITION BY band, key
                                             ORDER BY doc_id) AS rn
                   FROM bands),
        cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                 FROM ranked x JOIN ranked y
                   ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
                  AND ((x.rn <= {max_bucket_docs} AND y.rn <= {max_bucket_docs})
                       OR x.rn = 1)),
        ham AS (SELECT c.id_a, c.id_b,
                       CAST(SUM(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS BIGINT) AS sim_pm
                FROM cand c
                JOIN bits ba ON ba.doc_id = c.id_a
                JOIN bits bb ON bb.doc_id = c.id_b AND bb.b = ba.b
                GROUP BY c.id_a, c.id_b)
        SELECT id_a, id_b, sim_pm FROM ham WHERE sim_pm <= {max_hamming}
    """


def _decontaminate_oracle_sql() -> str:
    """Benchmark decontamination recomputed in SQL: same 3-word shingle
    CTE as the sketch oracles, same md5_number_lower identity, same
    ``doc_id % BENCH_MOD`` holdout rule — n_hits counts the DISTINCT
    shingle hashes a corpus doc shares with the benchmark set."""
    from wbot_ray.pipelines.textops import BENCH_MOD

    return f"""
        WITH {_SHINGLE_CTE},
        hv AS (SELECT DISTINCT doc_id, md5_number_lower(sh) AS h FROM sh),
        bh AS (SELECT DISTINCT h FROM hv WHERE doc_id % {BENCH_MOD} = 0),
        dh AS (SELECT doc_id, h FROM hv WHERE doc_id % {BENCH_MOD} <> 0)
        SELECT d.doc_id,
               CAST(COUNT(b.h) AS BIGINT) AS n_hits,
               COUNT(b.h) > 0 AS contaminated
        FROM dh d LEFT JOIN bh b ON d.h = b.h
        GROUP BY d.doc_id
    """


def _price_band_oracle_sql() -> str:
    """The range join as ANSI SQL: an interval VALUES dimension joined
    on ``c >= lo AND c < hi`` — bounds generated from the SAME constant
    the engine broadcasts."""
    from wbot_ray.pipelines.relational import PRICE_BANDS_LO_CENTS

    los = PRICE_BANDS_LO_CENTS
    his = list(los[1:]) + [1 << 62]
    rows = ", ".join(f"({i}, {lo}, {hi})" for i, (lo, hi) in enumerate(zip(los, his)))
    return f"""
        WITH bands(band, lo, hi) AS (VALUES {rows}),
        li AS (SELECT CAST(round(l_extendedprice*100) AS BIGINT) AS c FROM lineitem)
        SELECT CAST(band AS BIGINT) AS band,
               CAST(lo AS BIGINT) AS lo_cents,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(c) AS BIGINT) AS sum_price_cents
        FROM li JOIN bands ON c >= lo AND c < hi
        GROUP BY band, lo
    """


def _embed_oracle_sql(
    threshold: float = 0.92,
    max_bucket_docs: int = 1024,
    n_tables: int | None = None,
    n_planes: int | None = None,
) -> str:
    """dedup_embed recomputed from scratch: quantize each component to
    ``floor(x * 2^20)``, derive the ±1 hyperplanes from md5 (same keys
    as ``wbot_ray.pipelines.dedup._embed_planes``), bucket by exact
    integer dot-product signs, and verify with the identical fixed IEEE
    expression tree ``floor(dot / (sqrt(na)*sqrt(nb)) * 2^20)`` — every
    op is a correctly-rounded single operation on integer-exact doubles,
    so the result is bit-equal to the engine's."""
    from wbot_ray.pipelines.dedup import _N_PLANES, _N_TABLES, EMBED_QUANT

    n_tables = _N_TABLES if n_tables is None else n_tables
    n_planes = _N_PLANES if n_planes is None else n_planes
    thr_pm = int(threshold * (1 << 20))
    return f"""
        WITH q AS (SELECT vec_id, list_transform(embedding,
                              x -> CAST(floor(x * {float(EMBED_QUANT)}) AS BIGINT)) AS q
                   FROM embeddings),
        dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        qv AS (SELECT vec_id, i, q[i] AS qv FROM q CROSS JOIN dims),
        hp AS (SELECT t, j, i,
                      CASE WHEN (md5_number_lower('hp:' || t || ':' || j || ':' || i) & 1) = 1
                           THEN 1 ELSE -1 END AS c
               FROM (SELECT unnest(generate_series(0, {n_tables - 1})) AS t)
               CROSS JOIN (SELECT unnest(generate_series(0, {n_planes - 1})) AS j)
               CROSS JOIN dims),
        keys AS (SELECT vec_id, t,
                        SUM(CASE WHEN d > 0 THEN 1 << j ELSE 0 END) AS bkey
                 FROM (SELECT v.vec_id, h.t, h.j, SUM(v.qv * h.c) AS d
                       FROM qv v JOIN hp h ON h.i = v.i
                       GROUP BY v.vec_id, h.t, h.j)
                 GROUP BY vec_id, t),
        ranked AS (SELECT vec_id, t, bkey,
                          ROW_NUMBER() OVER (PARTITION BY t, bkey
                                             ORDER BY vec_id) AS rn
                   FROM keys),
        cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM ranked a JOIN ranked b
                   ON a.t = b.t AND a.bkey = b.bkey AND a.vec_id < b.vec_id
                  AND ((a.rn <= {max_bucket_docs} AND b.rn <= {max_bucket_docs})
                       OR a.rn = 1)),
        nrm AS (SELECT vec_id, SUM(qv * qv) AS nn FROM qv GROUP BY vec_id),
        dp AS (SELECT c.id_a, c.id_b, SUM(va.qv * vb.qv) AS dot
               FROM cand c
               JOIN qv va ON va.vec_id = c.id_a
               JOIN qv vb ON vb.vec_id = c.id_b AND vb.i = va.i
               GROUP BY c.id_a, c.id_b),
        sim AS (SELECT d.id_a, d.id_b,
                       CAST(floor((CAST(d.dot AS DOUBLE)
                                   / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))))
                                  * 1048576.0) AS BIGINT) AS sim_pm
                FROM dp d
                JOIN nrm na ON na.vec_id = d.id_a
                JOIN nrm nb ON nb.vec_id = d.id_b
                WHERE na.nn > 0 AND nb.nn > 0)
        SELECT id_a, id_b, sim_pm FROM sim WHERE sim_pm >= {thr_pm}
    """


def _knn_brute_oracle_sql() -> str:
    """knn_brute recomputed from scratch on the same integer grid as
    the engine (``wbot_ray.pipelines.similarity.knn_brute``):
    components ``floor(x * 2^20)``, every cosine the fixed IEEE tree
    ``floor(dot / (sqrt(na)*sqrt(nb)) * 2^20)`` over exact integer
    dots — bit-equal cross-engine (integer dots accumulate exactly in
    doubles below 2^53, so summation order cannot matter). Zero
    quantized vectors are excluded on both sides; final rank = pm
    desc, n_id asc. Parameters read from the engine's signature."""
    import inspect

    from wbot_ray.pipelines import similarity

    sig = inspect.signature(similarity.knn_brute)
    nq = sig.parameters["n_queries"].default
    k = sig.parameters["k"].default
    quant = float(similarity.IVF_QUANT)
    return f"""
        WITH g AS (SELECT vec_id, list_transform(embedding,
                              x -> CAST(floor(x * {quant}) AS BIGINT)) AS q
                   FROM embeddings),
        dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        qv AS (SELECT vec_id, i, q[i] AS qv FROM g CROSS JOIN dims),
        nrm AS (SELECT vec_id, SUM(qv * qv) AS nn FROM qv GROUP BY vec_id),
        ndot AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id, SUM(a.qv * b.qv) AS dot
                 FROM qv a JOIN qv b ON b.i = a.i AND b.vec_id <> a.vec_id
                 WHERE a.vec_id < {nq}
                 GROUP BY a.vec_id, b.vec_id),
        nsim AS (SELECT d.q_id, d.n_id,
                        CAST(floor((CAST(d.dot AS DOUBLE)
                                    / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))))
                                   * {quant}) AS BIGINT) AS pm
                 FROM ndot d
                 JOIN nrm na ON na.vec_id = d.q_id AND na.nn > 0
                 JOIN nrm nb ON nb.vec_id = d.n_id AND nb.nn > 0),
        r AS (SELECT q_id, n_id,
                     CAST(row_number() OVER (PARTITION BY q_id ORDER BY pm DESC, n_id) AS BIGINT) AS knn_rank
              FROM nsim)
        SELECT q_id, n_id, knn_rank FROM r WHERE knn_rank <= {k}
    """


def _ivf_oracle_sql() -> str:
    """knn_ivf recomputed from scratch on the same integer grid as the
    engine (``wbot_ray.pipelines.similarity.knn_ivf``): components
    ``floor(x * 2^20)``, every cosine the fixed IEEE tree
    ``floor(dot / (sqrt(na)*sqrt(nb)) * 2^20)`` over exact integer dots
    — bit-equal cross-engine. Centroids = the ``n_centroids`` nonzero
    vectors with smallest ``md5_number_lower('ivfc:'||vec_id)``
    (tie vec_id); assignment = argmax pm (tie smallest cidx); each
    query probes its ``nprobe`` best centroids; final rank = pm desc,
    n_id asc within the probed buckets. Parameters are read from the
    engine's signature so the two can never drift."""
    import inspect

    from wbot_ray.pipelines import similarity

    sig = inspect.signature(similarity.knn_ivf)
    nq = sig.parameters["n_queries"].default
    k = sig.parameters["k"].default
    nc = sig.parameters["n_centroids"].default
    npr = sig.parameters["nprobe"].default
    quant = float(similarity.IVF_QUANT)
    return f"""
        WITH g AS (SELECT vec_id, list_transform(embedding,
                              x -> CAST(floor(x * {quant}) AS BIGINT)) AS q
                   FROM embeddings),
        dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        qv AS (SELECT vec_id, i, q[i] AS qv FROM g CROSS JOIN dims),
        nrm AS (SELECT vec_id, SUM(qv * qv) AS nn FROM qv GROUP BY vec_id),
        cent AS (SELECT c_id, cn, row_number() OVER (ORDER BY ck, c_id) - 1 AS cidx
                 FROM (SELECT vec_id AS c_id, nn AS cn,
                              md5_number_lower('ivfc:' || vec_id) AS ck
                       FROM nrm WHERE nn > 0
                       ORDER BY ck, vec_id LIMIT {nc})),
        cdot AS (SELECT v.vec_id, c.cidx, c.cn, SUM(v.qv * w.qv) AS dot
                 FROM cent c
                 JOIN qv w ON w.vec_id = c.c_id
                 JOIN qv v ON v.i = w.i
                 GROUP BY v.vec_id, c.cidx, c.cn),
        csim AS (SELECT d.vec_id, d.cidx,
                        CAST(floor((CAST(d.dot AS DOUBLE)
                                    / (sqrt(CAST(n.nn AS DOUBLE)) * sqrt(CAST(d.cn AS DOUBLE))))
                                   * {quant}) AS BIGINT) AS pm
                 FROM cdot d JOIN nrm n ON n.vec_id = d.vec_id
                 WHERE n.nn > 0),
        assign AS (SELECT vec_id, cidx AS bucket FROM (
                     SELECT vec_id, cidx,
                            row_number() OVER (PARTITION BY vec_id ORDER BY pm DESC, cidx) AS r
                     FROM csim) WHERE r = 1),
        probe AS (SELECT vec_id AS q_id, cidx AS bucket FROM (
                     SELECT vec_id, cidx,
                            row_number() OVER (PARTITION BY vec_id ORDER BY pm DESC, cidx) AS r
                     FROM csim WHERE vec_id < {nq}) WHERE r <= {npr}),
        cand AS (SELECT p.q_id, a.vec_id AS n_id
                 FROM probe p JOIN assign a ON a.bucket = p.bucket
                 WHERE a.vec_id <> p.q_id),
        ndot AS (SELECT c.q_id, c.n_id, SUM(va.qv * vb.qv) AS dot
                 FROM cand c
                 JOIN qv va ON va.vec_id = c.q_id
                 JOIN qv vb ON vb.vec_id = c.n_id AND vb.i = va.i
                 GROUP BY c.q_id, c.n_id),
        nsim AS (SELECT d.q_id, d.n_id,
                        CAST(floor((CAST(d.dot AS DOUBLE)
                                    / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))))
                                   * {quant}) AS BIGINT) AS pm
                 FROM ndot d
                 JOIN nrm na ON na.vec_id = d.q_id
                 JOIN nrm nb ON nb.vec_id = d.n_id),
        r AS (SELECT q_id, n_id,
                     CAST(row_number() OVER (PARTITION BY q_id ORDER BY pm DESC, n_id) AS BIGINT) AS knn_rank
              FROM nsim)
        SELECT q_id, n_id, knn_rank FROM r WHERE knn_rank <= {k}
    """


def _embed_docs_oracle_sql() -> str:
    """embed_docs recomputed from scratch: the identical feature-hash
    projection (dim = md5_number_lower('emb:'||tok) % dim, sign = bit
    32), summed per (doc, dim) over token term frequencies — all
    integers, bit-equal to the engine."""
    import inspect

    from wbot_ray.pipelines import inference

    dim = inspect.signature(inference.embed_docs).parameters["dim"].default
    return f"""
        WITH tok AS (SELECT doc_id, tok, COUNT(*) AS tf
                     FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                           FROM documents)
                     GROUP BY doc_id, tok),
        m AS (SELECT doc_id,
                     CAST(md5_number_lower('emb:' || tok) % {dim} AS BIGINT) AS dim_i,
                     (CASE WHEN (md5_number_lower('emb:' || tok) >> 32) & 1 = 1
                           THEN 1 ELSE -1 END) * tf AS v
              FROM tok)
        SELECT doc_id, dim_i, CAST(SUM(v) AS BIGINT) AS val
        FROM m GROUP BY doc_id, dim_i
    """


def _semantic_search_oracle_sql() -> str:
    """semantic_search recomputed from scratch in SQL: document AND
    query embeddings re-derived from md5 (same projection as the
    embed_docs oracle), exact integer inner products, (score desc,
    doc_id) top-k. Query/dim/k read from the engine's signature."""
    import inspect

    from wbot_ray.pipelines import semantic

    sig = inspect.signature(semantic.semantic_search)
    q = sig.parameters["query"].default
    dim = sig.parameters["dim"].default
    k = sig.parameters["k"].default
    return f"""
        WITH tok AS (SELECT doc_id, tok, COUNT(*) AS tf
                     FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                           FROM documents)
                     GROUP BY doc_id, tok),
        m AS (SELECT doc_id,
                     CAST(md5_number_lower('emb:' || tok) % {dim} AS BIGINT) AS dim_i,
                     (CASE WHEN (md5_number_lower('emb:' || tok) >> 32) & 1 = 1
                           THEN 1 ELSE -1 END) * tf AS v
              FROM tok),
        demb AS (SELECT doc_id, dim_i, CAST(SUM(v) AS BIGINT) AS val
                 FROM m GROUP BY doc_id, dim_i),
        qtok AS (SELECT tok, COUNT(*) AS tf
                 FROM (SELECT unnest(string_split('{q}', ' ')) AS tok)
                 GROUP BY tok),
        qm AS (SELECT CAST(md5_number_lower('emb:' || tok) % {dim} AS BIGINT) AS dim_i,
                      (CASE WHEN (md5_number_lower('emb:' || tok) >> 32) & 1 = 1
                            THEN 1 ELSE -1 END) * tf AS v
               FROM qtok),
        qv AS (SELECT dim_i, CAST(SUM(v) AS BIGINT) AS q
               FROM qm GROUP BY dim_i HAVING SUM(v) <> 0),
        sc AS (SELECT doc_id, CAST(SUM(val * q) AS BIGINT) AS score
               FROM demb JOIN qv USING (dim_i)
               WHERE val <> 0
               GROUP BY doc_id)
        SELECT doc_id, score FROM sc
        ORDER BY score DESC, doc_id
        LIMIT {k}
    """


def _degrees_oracle_sql(links_path: str) -> str:
    """link_degrees recomputed from the raw links parquet."""
    return f"""
        WITH e AS (SELECT src_url, dst_url
                   FROM read_parquet('{links_path}') WHERE gated),
        u AS (SELECT src_url AS url, 1 AS o, 0 AS i FROM e
              UNION ALL
              SELECT dst_url, 0, 1 FROM e)
        SELECT url, CAST(SUM(o) AS BIGINT) AS out_deg,
                    CAST(SUM(i) AS BIGINT) AS in_deg
        FROM u GROUP BY url
    """


def _freq_quality_oracle_sql() -> str:
    """freq_quality recomputed from scratch: global token counts, the
    top-``top_v`` vocabulary ranked ``(count desc, token asc)``, OOV
    rank ``top_v+1``, and the all-integer per-doc score — parameters
    read from the engine's signature."""
    import inspect

    from wbot_ray.pipelines import textops

    v = inspect.signature(textops.freq_quality).parameters["top_v"].default
    return f"""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
        vocab AS (SELECT tok, rnk FROM (
                    SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS rnk FROM cnt)
                  WHERE rnk <= {v}),
        sc AS (SELECT t.doc_id, COALESCE(vv.rnk, {v + 1}) AS rnk
               FROM tok t LEFT JOIN vocab vv ON vv.tok = t.tok)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) FILTER (WHERE rnk = {v + 1}) AS BIGINT) AS oov_cnt,
               CAST((SUM(rnk) * 100) // COUNT(*) AS BIGINT) AS mean_rank_x100
        FROM sc GROUP BY doc_id
    """


def _term_search_oracle_sql() -> str:
    """term_search recomputed from the raw text: identical single-space
    tokenization, conjunctive match over the engine's default query
    terms, tf_total = summed query-term occurrences."""
    from wbot_ray.pipelines.search import DEFAULT_TERMS

    terms = sorted(set(DEFAULT_TERMS))
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        m AS (SELECT doc_id, tok, COUNT(*) AS tf
              FROM tok WHERE tok IN ({in_list}) GROUP BY doc_id, tok)
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS tf_total
        FROM m GROUP BY doc_id HAVING COUNT(*) = {len(terms)}
    """


def _segments_oracle_sql() -> str:
    """dedup_segments recomputed from scratch: cut every document's
    single-space token stream into consecutive ``SEG_WORDS``-token
    segments, keep only the lexicographically-first ``(doc_id,
    seg_idx)`` occurrence of each exact segment text (identity =
    ``md5(seg)``, same as the engine), rebuild the text from kept
    segments. ``string_agg`` over zero kept segments is NULL →
    ``''``, matching the engine's empty join."""
    from wbot_ray.pipelines.dedup import SEG_WORDS as w

    return f"""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        seg AS (SELECT doc_id, unnest(idxs) AS seg_idx,
                       unnest(list_transform(idxs,
                          i -> array_to_string(list_slice(toks, (i-1)*{w}+1, i*{w}), ' '))) AS seg
                FROM (SELECT doc_id, toks,
                             generate_series(1, CAST(ceil(len(toks) / {float(w)}) AS BIGINT)) AS idxs
                      FROM d)),
        r AS (SELECT doc_id, seg_idx, seg,
                     row_number() OVER (PARTITION BY md5(seg) ORDER BY doc_id, seg_idx) AS rn
              FROM seg)
        SELECT doc_id,
               COALESCE(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (WHERE rn = 1), '') AS text_clean,
               CAST(COUNT(*) AS BIGINT) AS n_segs,
               CAST(COUNT(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped
        FROM r GROUP BY doc_id
    """


def _clusters_oracle_sql(threshold: float = 0.7) -> str:
    """dup_clusters = transitive closure over the SQL-recomputed minhash
    pair set; the component label (min reachable doc_id) is a unique
    fixpoint, so the engine's iterative min-label propagation and this
    recursive CTE agree exactly."""
    return f"""
        WITH RECURSIVE pairs AS (
            SELECT id_a, id_b FROM ({_minhash_oracle_sql(threshold)})
        ),
        nodes AS (SELECT id_a AS n FROM pairs UNION SELECT id_b FROM pairs),
        edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        reach(n, m) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
        )
        SELECT n AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY n
    """


def _quality_oracle_sql() -> str:
    """Gopher-style quality rules recomputed in SQL from the SAME
    thresholds the engine uses — all-integer rule math (mean word
    length ×100 under floor division), so the bitmask is bit-equal."""
    from wbot_ray.pipelines.textops import (
        QUALITY_MAX_MWL_X100,
        QUALITY_MAX_WORDS,
        QUALITY_MIN_MWL_X100,
        QUALITY_MIN_STOP_HITS,
        QUALITY_MIN_WORDS,
        QUALITY_SYMBOL_DENOM,
    )

    mask = f"""(CASE WHEN n_words < {QUALITY_MIN_WORDS} OR n_words > {QUALITY_MAX_WORDS} THEN 1 ELSE 0 END)
                 + (CASE WHEN mwl_x100 < {QUALITY_MIN_MWL_X100} OR mwl_x100 > {QUALITY_MAX_MWL_X100} THEN 2 ELSE 0 END)
                 + (CASE WHEN symbol_words * {QUALITY_SYMBOL_DENOM} > n_words THEN 4 ELSE 0 END)
                 + (CASE WHEN stop_hits < {QUALITY_MIN_STOP_HITS} THEN 8 ELSE 0 END)"""
    return f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        s AS (SELECT doc_id,
                     CAST(len(toks) AS BIGINT) AS n_words,
                     CAST(list_sum(list_transform(toks, w -> length(w))) AS BIGINT) AS char_sum,
                     CAST(len(list_filter(toks, w -> NOT regexp_matches(w, '[a-zA-Z0-9]'))) AS BIGINT) AS symbol_words,
                     CAST(len(list_filter(toks, w -> w IN {STOP_SQL})) AS BIGINT) AS stop_hits
              FROM t),
        r AS (SELECT doc_id, n_words, (char_sum * 100) // n_words AS mwl_x100,
                     symbol_words, stop_hits
              FROM s)
        SELECT doc_id, n_words, mwl_x100, symbol_words, stop_hits,
               CAST({mask} AS BIGINT) AS rules_failed,
               ({mask}) = 0 AS passes
        FROM r
    """


def _dedup_keep_oracle_sql(threshold: float = 0.7) -> str:
    """dedup_keep = documents ANTI-JOIN the non-canonical members of the
    transitive-closure clusters (same closure as dup_clusters)."""
    return f"""
        WITH RECURSIVE pairs AS (
            SELECT id_a, id_b FROM ({_minhash_oracle_sql(threshold)})
        ),
        nodes AS (SELECT id_a AS n FROM pairs UNION SELECT id_b FROM pairs),
        edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        reach(n, m) AS (
            SELECT n, n FROM nodes
            UNION
            SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
        ),
        cl AS (SELECT n AS doc_id, MIN(m) AS cid FROM reach GROUP BY n)
        SELECT d.doc_id, d.lang, d.n_chars
        FROM documents d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM cl WHERE doc_id <> cid)
    """


def _global_shuffle_oracle_sql(num_shards: int = 8) -> str:
    """The dense shuffle rank as a SQL window function over the same
    salted md5_number_lower key (+ doc_id tie-break)."""
    return f"""
        WITH r AS (
          SELECT doc_id,
                 CAST(ROW_NUMBER() OVER (
                   ORDER BY md5_number_lower('shuf:' || doc_id), doc_id
                 ) - 1 AS BIGINT) AS pos
          FROM documents)
        SELECT doc_id, pos, CAST(pos % {num_shards} AS BIGINT) AS shard FROM r
    """


def oracle_sql() -> dict[str, str]:
    cents = lambda col: f"CAST(round({col}*100) AS BIGINT)"  # noqa: E731
    # Crawl-core oracles: an independent DuckDB BFS over the fixture link
    # graph (side tables are deterministic pure functions of the scale;
    # the driver compares at sf0.01 == scale "small").
    from wbot_ray.pipelines.crawlq import oracle_entries

    crawl = oracle_entries("small")
    from wbot_ray.pipelines.graph import (
        _links_path,
        components_oracle_sql,
        frontier_priority_oracle_sql,
        host_components_oracle_sql,
        host_graph_oracle_sql,
        host_pagerank_oracle_sql,
        pagerank_oracle_sql,
        triangles_oracle_sql,
    )

    return {
        **crawl,
        "link_pagerank": pagerank_oracle_sql(_links_path("/root/testdata/sf0.01")),
        "link_degrees": _degrees_oracle_sql(_links_path("/root/testdata/sf0.01")),
        "link_triangles": triangles_oracle_sql(_links_path("/root/testdata/sf0.01")),
        "link_components": components_oracle_sql(_links_path("/root/testdata/sf0.01")),
        "host_graph": host_graph_oracle_sql(_links_path("/root/testdata/sf0.01")),
        "host_components": host_components_oracle_sql(_links_path("/root/testdata/sf0.01")),
        "host_pagerank": host_pagerank_oracle_sql(_links_path("/root/testdata/sf0.01")),
        "host_hits": __import__(
            "wbot_ray.pipelines.graph", fromlist=["host_hits_oracle_sql"]
        ).host_hits_oracle_sql(_links_path("/root/testdata/sf0.01")),
        "link_reciprocity": __import__(
            "wbot_ray.pipelines.graph", fromlist=["link_reciprocity_oracle_sql"]
        ).link_reciprocity_oracle_sql(_links_path("/root/testdata/sf0.01")),
        "degree_dist": __import__(
            "wbot_ray.pipelines.graph", fromlist=["degree_dist_oracle_sql"]
        ).degree_dist_oracle_sql(_links_path("/root/testdata/sf0.01")),
        "host_sssp": __import__(
            "wbot_ray.pipelines.graph", fromlist=["host_sssp_oracle_sql"]
        ).host_sssp_oracle_sql(_links_path("/root/testdata/sf0.01")),
        "link_kcore": __import__(
            "wbot_ray.pipelines.graph", fromlist=["link_kcore_oracle_sql"]
        ).link_kcore_oracle_sql(_links_path("/root/testdata/sf0.01")),
        "retention_cohorts": __import__(
            "wbot_ray.pipelines.relational", fromlist=["retention_cohorts_oracle_sql"]
        ).retention_cohorts_oracle_sql(),
        "table_profile": __import__(
            "wbot_ray.pipelines.relational", fromlist=["table_profile_oracle_sql"]
        ).table_profile_oracle_sql(),
        "text_outlinks": __import__(
            "wbot_ray.pipelines.webops", fromlist=["text_outlinks_oracle_sql"]
        ).text_outlinks_oracle_sql(),
        "host_dup_ratio": __import__(
            "wbot_ray.pipelines.webops", fromlist=["host_dup_ratio_oracle_sql"]
        ).host_dup_ratio_oracle_sql(
            __import__(
                "wbot_ray.pipelines.urlstats", fromlist=["_pages_path_for"]
            )._pages_path_for("/root/testdata/sf0.01")
        ),
        "holdout_split": __import__(
            "wbot_ray.pipelines.webops", fromlist=["holdout_split_oracle_sql"]
        ).holdout_split_oracle_sql(
            __import__(
                "wbot_ray.pipelines.urlstats", fromlist=["_pages_path_for"]
            )._pages_path_for("/root/testdata/sf0.01")
        ),
        "warc_stats": __import__(
            "wbot_ray.pipelines.webops", fromlist=["warc_stats_oracle_sql"]
        ).warc_stats_oracle_sql(
            __import__(
                "wbot_ray.pipelines.urlstats", fromlist=["_pages_path_for"]
            )._pages_path_for("/root/testdata/sf0.01")
        ),
        "jsonl_stats": __import__(
            "wbot_ray.pipelines.webops", fromlist=["jsonl_stats_oracle_sql"]
        ).jsonl_stats_oracle_sql(
            __import__(
                "wbot_ray.pipelines.urlstats", fromlist=["_pages_path_for"]
            )._pages_path_for("/root/testdata/sf0.01")
        ),
        "bpe_pairs": __import__(
            "wbot_ray.pipelines.textops", fromlist=["bpe_pairs_oracle_sql"]
        ).bpe_pairs_oracle_sql(),
        "cooccur_counts": __import__(
            "wbot_ray.pipelines.textops", fromlist=["cooccur_counts_oracle_sql"]
        ).cooccur_counts_oracle_sql(),
        "recrawl_priority": __import__(
            "wbot_ray.pipelines.webops", fromlist=["recrawl_priority_oracle_sql"]
        ).recrawl_priority_oracle_sql(
            _links_path("/root/testdata/sf0.01"),
            __import__(
                "wbot_ray.pipelines.urlstats", fromlist=["_pages_path_for"]
            )._pages_path_for("/root/testdata/sf0.01"),
        ),
        "frontier_priority": frontier_priority_oracle_sql(
            _links_path("/root/testdata/sf0.01"),
            __import__(
                "wbot_ray.pipelines.urlstats", fromlist=["_pages_path_for"]
            )._pages_path_for("/root/testdata/sf0.01"),
        ),
        "anchor_texts": __import__(
            "wbot_ray.pipelines.anchors", fromlist=["anchor_texts_oracle_sql"]
        ).anchor_texts_oracle_sql(
            __import__(
                "wbot_ray.pipelines.anchors", fromlist=["_anchors_path"]
            )._anchors_path("/root/testdata/sf0.01")
        ),
        "url_features": __import__(
            "wbot_ray.pipelines.urlstats", fromlist=["url_features_oracle_sql"]
        ).url_features_oracle_sql(
            __import__(
                "wbot_ray.pipelines.urlstats", fromlist=["_pages_path_for"]
            )._pages_path_for("/root/testdata/sf0.01")
        ),
        "link_gate_stats": __import__(
            "wbot_ray.pipelines.urlstats", fromlist=["link_gate_stats_oracle_sql"]
        ).link_gate_stats_oracle_sql(_links_path("/root/testdata/sf0.01")),
        "url_blocklist": __import__(
            "wbot_ray.pipelines.urlstats", fromlist=["url_blocklist_oracle_sql"]
        ).url_blocklist_oracle_sql(
            __import__(
                "wbot_ray.pipelines.urlstats", fromlist=["_pages_path_for"]
            )._pages_path_for("/root/testdata/sf0.01")
        ),
        **{
            name: getattr(
                __import__(
                    "wbot_ray.pipelines.webops", fromlist=[f"{name}_oracle_sql"]
                ),
                f"{name}_oracle_sql",
            )(
                __import__(
                    "wbot_ray.pipelines.urlstats", fromlist=["_pages_path_for"]
                )._pages_path_for("/root/testdata/sf0.01")
            )
            for name in (
                "crawl_traps",
                "boilerplate_lines",
                "change_rate",
                "mirror_hosts",
                "host_quota",
                "dedup_url",
            )
        },
        "embed_docs": _embed_docs_oracle_sql(),
        "semantic_search": _semantic_search_oracle_sql(),
        "langid": _langid_oracle_sql(),
        "dedup_minhash": _minhash_oracle_sql(),
        "neardup_lookup": _neardup_lookup_oracle_sql(),
        "dedup_simhash": _simhash_oracle_sql(),
        "dedup_embed": _embed_oracle_sql(threshold=0.3, n_tables=8, n_planes=6),
        "knn_ivf": _ivf_oracle_sql(),
        "kmeans_clusters": __import__(
            "wbot_ray.pipelines.clustering", fromlist=["kmeans_oracle_sql"]
        ).kmeans_oracle_sql(),
        "pq_codes": __import__(
            "wbot_ray.pipelines.clustering", fromlist=["pq_oracle_sql"]
        ).pq_oracle_sql(),
        "pq_search": __import__(
            "wbot_ray.pipelines.clustering", fromlist=["pq_search_oracle_sql"]
        ).pq_search_oracle_sql(),
        "dup_clusters": _clusters_oracle_sql(),
        "decontaminate": _decontaminate_oracle_sql(),
        "pii_scrub": _pii_scrub_oracle_sql(),
        "source_mix": _source_mix_oracle_sql(),
        "token_budget_mix": __import__(
            "wbot_ray.pipelines.training", fromlist=["token_budget_mix_oracle_sql"]
        ).token_budget_mix_oracle_sql(),
        "length_deciles": """
            -- exact SQL-window semantics incl. the first-(n%k)-buckets-
            -- get-one-extra rule and the (n_chars, doc_id) tie-break
            SELECT doc_id, lang, n_chars,
                   CAST(NTILE(10) OVER (PARTITION BY lang
                                        ORDER BY n_chars, doc_id)
                        AS BIGINT) AS decile
            FROM documents
        """,
        "price_band_join": _price_band_oracle_sql(),
        "order_priority_revenue": f"""
            -- large-large join: per-order lineitem revenue in exact
            -- centi-cents, joined to orders, rolled up per priority
            WITH li AS (
              SELECT l_orderkey,
                     CAST(SUM({cents('l_extendedprice')} * (100 - {cents('l_discount')})) AS BIGINT) AS rev,
                     CAST(COUNT(*) AS BIGINT) AS items
              FROM lineitem GROUP BY l_orderkey
            )
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(items) AS BIGINT) AS n_items,
                   CAST(SUM(rev) AS BIGINT) AS revenue_centi
            FROM orders JOIN li ON li.l_orderkey = orders.o_orderkey
            GROUP BY o_orderpriority
        """,
        "bloom_semi_join": __import__(
            "wbot_ray.pipelines.join", fromlist=["bloom_semi_join_oracle_sql"]
        ).bloom_semi_join_oracle_sql(),
        "zorder_layout": __import__(
            "wbot_ray.pipelines.layout", fromlist=["zorder_layout_oracle_sql"]
        ).zorder_layout_oracle_sql(),
        "inverted_postings": __import__(
            "wbot_ray.pipelines.search", fromlist=["inverted_postings_oracle_sql"]
        ).inverted_postings_oracle_sql(),
        "dedup_keep": _dedup_keep_oracle_sql(),
        "prepare_corpus": f"""
            -- the composed pipeline: dedup_keep survivors ∧ quality pass
            WITH keepq AS (SELECT * FROM ({_dedup_keep_oracle_sql()})),
            qual AS (SELECT * FROM ({_quality_oracle_sql()}))
            SELECT k.doc_id, k.lang, k.n_chars, q.n_words
            FROM keepq k JOIN qual q ON q.doc_id = k.doc_id
            WHERE q.passes
        """,
        "dedup_segments": _segments_oracle_sql(),
        "dup_spans": __import__(
            "wbot_ray.pipelines.dedup", fromlist=["dup_spans_oracle_sql"]
        ).dup_spans_oracle_sql(),
        "dedup_span_apply": __import__(
            "wbot_ray.pipelines.dedup", fromlist=["dedup_span_apply_oracle_sql"]
        ).dedup_span_apply_oracle_sql(),
        "freq_quality": _freq_quality_oracle_sql(),
        "term_search": _term_search_oracle_sql(),
        "phrase_search": __import__(
            "wbot_ray.pipelines.search", fromlist=["phrase_oracle_sql"]
        ).phrase_oracle_sql(),
        "bm25_search": __import__(
            "wbot_ray.pipelines.search", fromlist=["bm25_oracle_sql"]
        ).bm25_oracle_sql(),
        "lm_score": __import__(
            "wbot_ray.pipelines.textops", fromlist=["lm_score_oracle_sql"]
        ).lm_score_oracle_sql(),
        "dsir_logweight": __import__(
            "wbot_ray.pipelines.textops", fromlist=["dsir_logweight_oracle_sql"]
        ).dsir_logweight_oracle_sql(),
        "cms_sketch": __import__(
            "wbot_ray.pipelines.textops", fromlist=["cms_sketch_oracle_sql"]
        ).cms_sketch_oracle_sql(),
        "late_events": __import__(
            "wbot_ray.pipelines.relational", fromlist=["late_events_oracle_sql"]
        ).late_events_oracle_sql(),
        "ccnet_buckets": __import__(
            "wbot_ray.pipelines.textops", fromlist=["ccnet_buckets_oracle_sql"]
        ).ccnet_buckets_oracle_sql(),
        "global_shuffle": _global_shuffle_oracle_sql(),
        "quality_score": _quality_oracle_sql(),
        "text_stats": f"""
            SELECT doc_id, n_chars, n_tokens, n_uniq, n_bpe, stop_cnt,
                   CAST(stop_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio
            FROM (
              SELECT doc_id,
                     CAST(length(text) AS BIGINT) AS n_chars,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                     CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
                     CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN_SQL}')) AS BIGINT) AS n_bpe,
                     CAST(len(list_filter(string_split(text, ' '), w -> w IN {STOP_SQL})) AS BIGINT) AS stop_cnt
              FROM documents)
        """,
        "lang_dist": """
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(length(text)) AS BIGINT) AS total_chars,
                   CAST(MIN(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
                   CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
                   CAST(SUM(length(text)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "token_counts": f"""
            SELECT lang,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
                   CAST(SUM(len(regexp_extract_all(text, '{TOKEN_PATTERN_SQL}'))) AS BIGINT) AS bpe_tokens
            FROM documents GROUP BY lang
        """,
        "doc_fingerprint": "SELECT doc_id, md5(text) AS fp_md5 FROM documents",
        # lossless-compaction gate: the Ray side scans ONLY the
        # compacted layout, so parity here proves no row was lost,
        # duplicated, or mangled by the maintenance pass
        "compact_corpus": "SELECT doc_id, md5(text) AS text_md5 FROM documents",
        "corpus_diff": __import__(
            "wbot_ray.pipelines.maintenance", fromlist=["corpus_diff_oracle_sql"]
        ).corpus_diff_oracle_sql(),
        "upsert_merge": __import__(
            "wbot_ray.pipelines.maintenance", fromlist=["upsert_merge_oracle_sql"]
        ).upsert_merge_oracle_sql(),
        "snapshot_latest": __import__(
            "wbot_ray.pipelines.maintenance", fromlist=["snapshot_latest_oracle_sql"]
        ).snapshot_latest_oracle_sql(
            __import__(
                "wbot_ray.pipelines.urlstats", fromlist=["_pages_path_for"]
            )._pages_path_for("/root/testdata/sf0.01")
        ),
        "corpus_filter": f"""
            WITH g AS (
              SELECT doc_id, md5(text) AS fp,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                     CAST(len(list_filter(string_split(text, ' '), w -> w IN {STOP_SQL})) AS BIGINT) AS sc
              FROM documents
            )
            SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
                   CAST(MIN(n_tokens) AS BIGINT) AS n_tokens
            FROM g WHERE n_tokens >= 30 AND sc >= 1 GROUP BY fp
        """,
        "filter_funnel": __import__(
            "wbot_ray.pipelines.textops", fromlist=["filter_funnel_oracle_sql"]
        ).filter_funnel_oracle_sql(),
        "heavy_hitters": """
            WITH t AS (
              SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
            ), tot AS (SELECT COUNT(*) AS n FROM t)
            SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
            FROM t, tot GROUP BY tok, tot.n
            HAVING COUNT(*) * 50 >= tot.n
        """,
        "dedup_exact": """
            SELECT md5(text) AS fp_md5,
                   CAST(MIN(doc_id) AS BIGINT) AS keep_id,
                   CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "dedup_ngram": """
            -- blocking rule kept in exact sync with the engine: a pair
            -- is compared iff both docs share the lexicographic minimum
            -- of md5(token) over their distinct tokens. The engine's
            -- extra length-octave gate is provably output-neutral
            -- (J >= 0.8 forces size ratio <= 1.25 < 2), so it is not
            -- modeled here.
            WITH d AS (
              SELECT doc_id, lang, source,
                     list_distinct(string_split(text, ' ')) AS toks,
                     list_min(list_transform(list_distinct(string_split(text, ' ')),
                                             t -> md5(t))) AS min_md5
              FROM documents
            ), pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS i,
                     CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS u
              FROM d a JOIN d b
                ON a.lang = b.lang AND a.source = b.source
                AND a.min_md5 = b.min_md5 AND a.doc_id < b.doc_id
            )
            SELECT id_a, id_b, (i * 1048576) // u AS sim_pm
            FROM pairs WHERE (i * 1048576) // u >= 838860
        """,
        "knn_brute": _knn_brute_oracle_sql(),
        "payload_features": """
            SELECT doc_id,
                   CAST(strlen(text) AS BIGINT) AS n_bytes,
                   md5(text) AS payload_md5
            FROM documents
        """,
        "frame_features": """
            -- frame geometry is byte-exact in SQL (octet_length /
            -- strlen); the md5/embedding columns of the full op are not
            -- SQL-expressible (no md5(BLOB)) and are pytest-pinned
            WITH d AS (
              SELECT doc_id, CAST(strlen(text) AS BIGINT) AS nb FROM documents
            ), f AS (
              SELECT d.doc_id,
                     CAST(j.j AS INTEGER) AS frame_idx,
                     CAST(LEAST(128, d.nb - j.j * 128) AS BIGINT) AS frame_bytes
              FROM d CROSS JOIN (SELECT UNNEST(range(1000)) AS j) j
              WHERE j.j * 128 < GREATEST(1, d.nb - 127)
            )
            SELECT doc_id, frame_idx, frame_bytes FROM f
        """,
        "audio_features": """
            -- window geometry mirrors frame_features; energy is the
            -- exact integer sum of squared codepoints per overlapping
            -- window (win 256, hop 128) — character-based on both
            -- sides (ord/substr here, codepoint stream in the engine)
            WITH d AS (
              SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
              FROM documents
            ), pos AS (
              SELECT doc_id, text, UNNEST(range(n)) AS j, n FROM d
            ), v AS (
              SELECT doc_id, CAST(j AS BIGINT) AS j,
                     CAST(ord(substr(text, CAST(j + 1 AS INTEGER), 1)) AS BIGINT) AS s
              FROM pos
            ), w AS (
              SELECT d.doc_id, CAST(i.i AS BIGINT) AS chunk_idx,
                     CAST(i.i * 128 AS BIGINT) AS st, d.n
              FROM d CROSS JOIN (SELECT UNNEST(range(100000)) AS i) i
              WHERE i.i * 128 < GREATEST(1, d.n - 255)
            )
            SELECT w.doc_id,
                   CAST(w.chunk_idx AS INTEGER) AS chunk_idx,
                   CAST(LEAST(256, w.n - w.st) AS BIGINT) AS n_samples,
                   CAST(SUM(v.s * v.s) AS BIGINT) AS energy
            FROM w JOIN v ON v.doc_id = w.doc_id
                 AND v.j >= w.st AND v.j < w.st + 256
            GROUP BY w.doc_id, w.chunk_idx, w.n, w.st
        """,
        "q1_pricing": f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM({cents('l_extendedprice')}) AS BIGINT) AS sum_price_cents,
                   CAST(SUM({cents('l_extendedprice')} * (100 - {cents('l_discount')})) AS BIGINT) AS sum_disc_centi
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "cust_order_stats": f"""
            SELECT c_mktsegment,
                   CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM({cents('o_totalprice')}) AS BIGINT) AS sum_price_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "events_hourly": f"""
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_key,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM({cents('value')}) AS BIGINT) AS sum_value_cents
            FROM events GROUP BY 1, 2
        """,
        "events_anomaly": """
            -- trailing-window burst detection: integer rule
            -- n * nprev * den > num * trail over the time-based frame
            -- (RANGE, not ROWS — well-defined under hour gaps)
            WITH hourly AS (
              SELECT date_trunc('hour', ts) AS hour,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1
            ), w AS (
              SELECT hour, n,
                     SUM(n) OVER (ORDER BY hour RANGE BETWEEN INTERVAL 24 HOURS
                                  PRECEDING AND INTERVAL 1 HOUR PRECEDING) AS trail,
                     COUNT(*) OVER (ORDER BY hour RANGE BETWEEN INTERVAL 24 HOURS
                                    PRECEDING AND INTERVAL 1 HOUR PRECEDING) AS nprev
              FROM hourly
            )
            SELECT strftime(hour, '%Y-%m-%d %H:00:00') AS hour_key,
                   n AS n_events,
                   CAST(trail AS BIGINT) AS trail_sum
            FROM w WHERE nprev >= 12 AND n * nprev * 20 > 23 * trail
        """,
        "funnel_steps": """
            -- ordered funnel: each stage's first event at-or-after the
            -- previous stage's first qualifying event
            WITH s1 AS (
              SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
              WHERE event_type = 'signup' GROUP BY user_id
            ), s2 AS (
              SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
              FROM events e JOIN s1 ON s1.user_id = e.user_id
              WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s1.t1
              GROUP BY e.user_id
            ), s3 AS (
              SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
              FROM events e JOIN s2 ON s2.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s2.t2
              GROUP BY e.user_id
            )
            SELECT s1.user_id,
                   CAST(1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT AS BIGINT) AS steps_completed,
                   CAST(s1.t1 AS BIGINT) AS t_step1_us,
                   CAST(COALESCE(s2.t2, 0) AS BIGINT) AS t_step2_us,
                   CAST(COALESCE(s3.t3, 0) AS BIGINT) AS t_step3_us
            FROM s1
            LEFT JOIN s2 ON s2.user_id = s1.user_id
            LEFT JOIN s3 ON s3.user_id = s2.user_id
        """,
        "window_pairs": """
            -- banded interval self-join: all click->purchase pairs of
            -- the same user within +/-30 minutes
            SELECT l.user_id,
                   CAST(l.event_id AS BIGINT) AS left_event,
                   CAST(r.event_id AS BIGINT) AS right_event,
                   CAST(epoch_us(r.ts) - epoch_us(l.ts) AS BIGINT) AS delta_us
            FROM events l JOIN events r ON r.user_id = l.user_id
            WHERE l.event_type = 'click' AND r.event_type = 'purchase'
              AND ABS(epoch_us(r.ts) - epoch_us(l.ts)) <= 30 * 60 * 1000000
        """,
        "daily_active_users": """
            -- exact distinct count: the engine's two-level pair dedup
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_key,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1
        """,
        "approx_distinct_users": """
            -- HyperLogLog registers recomputed from scratch: same md5
            -- hash, same idx/rho split, exact integer bit length via
            -- bin() (float log2 would mis-round near powers of two)
            WITH u AS (SELECT DISTINCT user_id FROM events),
            h AS (SELECT md5_number_lower(CAST(user_id AS VARCHAR)) AS h FROM u),
            r AS (
              SELECT CAST(h & 255 AS BIGINT) AS register_idx,
                     CAST(CASE WHEN (h >> 8) = 0 THEN 57
                          ELSE 57 - length(bin(h >> 8)) END AS BIGINT) AS rho
              FROM h
            )
            SELECT register_idx, CAST(MAX(rho) AS BIGINT) AS max_rho
            FROM r GROUP BY register_idx
        """,
        "sessionize": f"""
            WITH e AS (
              SELECT user_id,
                     CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                     {cents('value')} AS value_cents
              FROM events
            ), flags AS (
              SELECT user_id, ts_us, value_cents,
                     CASE WHEN ts_us - LAG(ts_us) OVER w > 30*60*1000000
                          OR LAG(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
            ), sess AS (
              SELECT user_id, ts_us, value_cents,
                     CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM flags
            )
            SELECT user_id, session_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(value_cents) AS BIGINT) AS sum_value_cents,
                   CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS duration_us
            FROM sess GROUP BY user_id, session_id
        """,
        "events_sliding": f"""
            WITH e AS (
              SELECT CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_type,
                     {cents('value')} AS value_cents
              FROM events
            ), w AS (
              SELECT (e.ts_us // 900000000) * 900000000 - j.j * 900000000
                       AS window_start_us,
                     e.event_type, e.value_cents
              FROM e CROSS JOIN (SELECT UNNEST(range(4)) AS j) j
            )
            SELECT window_start_us, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(value_cents) AS BIGINT) AS sum_value_cents
            FROM w GROUP BY window_start_us, event_type
        """,
        "asof_prior_event": """
            -- DuckDB's native ASOF JOIN is the oracle; rights sharing a
            -- timestamp are pre-reduced to max(event_id) in BOTH engines
            -- so the as-of pick is unique
            WITH p AS (
              SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
              FROM events WHERE event_type = 'purchase'
            ), c AS (
              SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                     CAST(MAX(event_id) AS BIGINT) AS click_event_id
              FROM events WHERE event_type = 'click'
              GROUP BY user_id, epoch_us(ts)
            )
            SELECT p.event_id, p.user_id, p.ts_us,
                   c.click_event_id,
                   c.ts_us AS click_ts_us,
                   p.ts_us - c.ts_us AS gap_us
            FROM p ASOF JOIN c
              ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
        """,
        "topk_users": f"""
            WITH agg AS (
              SELECT user_id,
                     CAST(COUNT(*) AS BIGINT) AS n_events,
                     CAST(SUM({cents('value')}) AS BIGINT) AS sum_value_cents
              FROM events GROUP BY user_id
            )
            SELECT user_id, n_events, sum_value_cents,
                   CAST(ROW_NUMBER() OVER (ORDER BY n_events DESC, user_id) AS BIGINT) AS rank
            FROM agg ORDER BY n_events DESC, user_id LIMIT 10
        """,
        "ngram_counts": """
            WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
            i AS (SELECT w, UNNEST(generate_series(1, len(w) - 1)) AS i FROM w),
            g AS (SELECT array_to_string(list_slice(w, i, i + 1), ' ') AS ngram FROM i)
            SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_occurrences
            FROM g GROUP BY ngram HAVING COUNT(*) >= 5
        """,
        "tfidf_topterms": """
            -- integer tf-idf ordering: (tf DESC, df ASC, token ASC),
            -- no float scores — platform-exact ranking
            WITH tok AS (
              SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
              FROM documents
            ), tf AS (
              SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
              FROM tok GROUP BY doc_id, token
            ), df AS (
              SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
              FROM tok GROUP BY token
            ), r AS (
              SELECT tf.doc_id, tf.token, tf.tf, df.df,
                     CAST(ROW_NUMBER() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf DESC, df.df ASC, tf.token
                     ) AS BIGINT) AS term_rank
              FROM tf JOIN df USING (token)
            )
            SELECT doc_id, token, tf, df, term_rank FROM r WHERE term_rank <= 5
        """,
        "stratified_sample": """
            WITH h AS (
              SELECT doc_id, lang, n_chars,
                     md5_number_lower('strat:' || CAST(doc_id AS VARCHAR)) AS hv
              FROM documents
            ), r AS (
              SELECT doc_id, lang, n_chars,
                     CAST(ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY hv, doc_id
                     ) AS BIGINT) AS strat_rank
              FROM h)
            SELECT doc_id, lang, n_chars, strat_rank FROM r WHERE strat_rank <= 50
        """,
        "sample_hash": """
            -- same md5_number_lower identity as the engine's
            -- md5_lower64 (last 8 digest bytes, little-endian); the
            -- keep threshold 2^62 is rate 1/4 as an integer compare
            SELECT doc_id, lang, n_chars FROM documents
            WHERE md5_number_lower('sample:' || CAST(doc_id AS VARCHAR))
                  < CAST(4611686018427387904 AS UBIGINT)
        """,
        "pack_sequences": """
            -- the packing law: exclusive prefix sum of token counts per
            -- lang in doc_id order, cut into 2048-token sequences
            WITH d AS (
              SELECT doc_id, lang,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents
            ), c AS (
              SELECT doc_id, lang, n_tokens,
                     SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING
                     ) - n_tokens AS cum_prev
              FROM d)
            SELECT doc_id, lang, n_tokens,
                   CAST(cum_prev // 2048 AS BIGINT) AS seq_id,
                   CAST(cum_prev % 2048 AS BIGINT) AS seq_offset
            FROM c
        """,
        "group_topn": f"""
            WITH r AS (
              SELECT o_custkey, o_orderkey,
                     {cents('o_totalprice')} AS price_cents,
                     CAST(ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY {cents('o_totalprice')} DESC, o_orderkey
                     ) AS BIGINT) AS rn
              FROM orders)
            SELECT o_custkey, o_orderkey, price_cents, rn FROM r WHERE rn <= 3
        """,
        "weighted_sample": """
            SELECT doc_id, lang, n_chars, w_rank FROM (
              SELECT doc_id, lang, n_chars,
                     CAST(ROW_NUMBER() OVER (
                       ORDER BY md5_number_lower('wsamp:' || doc_id)
                                // GREATEST(CAST(n_chars AS UBIGINT),
                                            CAST(1 AS UBIGINT)),
                                doc_id) AS BIGINT) AS w_rank
              FROM documents)
            WHERE w_rank <= 200
        """,
        "urgent_orders_by_year": f"""
            SELECT CAST(year(o_orderdate) AS VARCHAR) AS o_year,
                   CAST(SUM({cents('o_totalprice')}) AS BIGINT) AS sum_price_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY 1
        """,
        "q3_shipping": f"""
            -- TPC-H Q3 shape: customer ⋉ orders ⋈ lineitem, top-10 by
            -- revenue (exact centi-cents; unique-orderkey tiebreak)
            WITH o AS (
              SELECT o_orderkey,
                     strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                     o_orderpriority
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment = 'BUILDING'
                AND o_orderdate < TIMESTAMP '1998-01-01'
            ),
            li AS (
              SELECT l_orderkey,
                     CAST(SUM({cents('l_extendedprice')} * (100 - {cents('l_discount')})) AS BIGINT)
                       AS revenue_centi
              FROM lineitem
              WHERE l_shipdate > TIMESTAMP '1998-01-01'
              GROUP BY 1
            )
            SELECT li.l_orderkey, o.o_orderdate, o.o_orderpriority, li.revenue_centi
            FROM li JOIN o ON li.l_orderkey = o.o_orderkey
            ORDER BY revenue_centi DESC, o_orderdate ASC, l_orderkey ASC
            LIMIT 10
        """,
        "churned_users": """
            SELECT DISTINCT user_id FROM events
            WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
            EXCEPT
            SELECT user_id FROM events
            WHERE ts >= TIMESTAMP '2024-01-30' AND ts < TIMESTAMP '2024-01-31'
        """,
        "props_by_type": """
            -- JSON flattening: extract integer field k from props, then
            -- grouped count/sum/min/max per event type
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(k) AS BIGINT) AS sum_k,
                   CAST(MIN(k) AS BIGINT) AS min_k,
                   CAST(MAX(k) AS BIGINT) AS max_k
            FROM (SELECT event_type,
                         CAST(json_extract(props, '$.k') AS BIGINT) AS k
                  FROM events)
            GROUP BY event_type
        """,
        "user_running_value": f"""
            SELECT user_id, event_id,
                   CAST(SUM({cents('value')}) OVER (
                     PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS running_cents
            FROM events
        """,
        "price_range_scan": f"""
            -- zone-map layout scan == plain range filter
            SELECT o_orderkey, {cents('o_totalprice')} AS price_cents
            FROM orders
            WHERE {cents('o_totalprice')} >= 500000
              AND {cents('o_totalprice')} < 2000000
        """,
        "user_day_share": f"""
            -- composite-key join: each event vs its user's same-day total
            SELECT event_id, user_id,
                   strftime(ts, '%Y-%m-%d') AS day,
                   {cents('value')} AS value_cents,
                   CAST(1000 * {cents('value')} // SUM({cents('value')}) OVER (
                     PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
                   ) AS BIGINT) AS share_pm
            FROM events
        """,
        "events_pivot": """
            -- long-to-wide PIVOT: one count column per event type
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                   CAST(COUNT(*) AS BIGINT) AS n_total
            FROM events
            GROUP BY 1
        """,
        "repetition_stats": """
            -- Gopher repetition signals: dup-2-gram instance fraction +
            -- top-2-gram char-mass fraction, per-mille integer math.
            -- Tokenizer = the engine's exact ASCII-whitespace class.
            WITH d AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '[ \t\n\r\f]+'),
                                 t -> t <> '') AS toks
              FROM documents),
            base AS (
              SELECT doc_id,
                     CAST(len(toks) AS BIGINT) AS n_words,
                     CAST(GREATEST(len(toks) - 1, 0) AS BIGINT) AS n_bigrams,
                     CAST(length(array_to_string(toks, '')) AS BIGINT) AS word_chars,
                     CASE WHEN len(toks) >= 2
                          THEN list_transform(range(1, len(toks)),
                                              i -> toks[i] || ' ' || toks[i+1])
                          ELSE [] END AS bigrams
              FROM d),
            counts AS (
              SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM (SELECT doc_id, UNNEST(bigrams) AS bigram FROM base)
              GROUP BY 1, 2),
            dups AS (
              SELECT doc_id, SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS dup_inst
              FROM counts GROUP BY 1),
            top AS (
              SELECT doc_id, cnt * (length(bigram) - 1) AS char_mass
              FROM (SELECT doc_id, bigram, cnt,
                           row_number() OVER (PARTITION BY doc_id
                                              ORDER BY cnt DESC, bigram) AS rn
                    FROM counts)
              WHERE rn = 1)
            SELECT b.doc_id, b.n_words, b.n_bigrams,
                   CAST(COALESCE(1000 * d.dup_inst // b.n_bigrams, 0) AS BIGINT)
                     AS dup_bigram_pm,
                   CAST(CASE WHEN b.word_chars > 0
                             THEN COALESCE(1000 * t.char_mass // b.word_chars, 0)
                             ELSE 0 END AS BIGINT) AS top_bigram_chars_pm
            FROM base b
            LEFT JOIN dups d USING (doc_id)
            LEFT JOIN top t USING (doc_id)
        """,
        "doc_chunks": """
            -- overlapping token-window chunking rebuilt from scratch:
            -- starts at i*48 while i*48 < n_tokens, windows of 64
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            c AS (SELECT doc_id, toks, len(toks) AS n_tok,
                         UNNEST(range(0, ((len(toks) - 1) // 48) + 1)) AS ci
                  FROM d)
            SELECT doc_id,
                   CAST(ci AS BIGINT) AS chunk_idx,
                   CAST(LEAST(64, n_tok - ci * 48) AS BIGINT) AS n_tokens,
                   md5(array_to_string(
                       list_slice(toks, ci * 48 + 1, ci * 48 + 64), ' ')) AS chunk_md5
            FROM c
        """,
        "orders_rollup": f"""
            SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   COALESCE(o_year, 'ALL') AS o_year,
                   CAST(SUM(price_cents) AS BIGINT) AS sum_price_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM (SELECT o_orderpriority,
                         CAST(year(o_orderdate) AS VARCHAR) AS o_year,
                         {cents('o_totalprice')} AS price_cents
                  FROM orders)
            GROUP BY ROLLUP(o_orderpriority, o_year)
        """,
        "orders_cube": f"""
            SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   COALESCE(o_year, 'ALL') AS o_year,
                   CAST(SUM(price_cents) AS BIGINT) AS sum_price_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM (SELECT o_orderpriority,
                         CAST(year(o_orderdate) AS VARCHAR) AS o_year,
                         {cents('o_totalprice')} AS price_cents
                  FROM orders)
            GROUP BY CUBE(o_orderpriority, o_year)
        """,
        "normalize_text": """
            SELECT doc_id,
                   md5(norm) AS norm_hash,
                   CAST(length(norm) AS BIGINT) AS n_norm_chars,
                   (norm <> text) AS changed
            FROM (SELECT doc_id, text,
                    translate(
                      trim(regexp_replace(nfc_normalize(text),
                                          '[ \t\n\r\f]+', ' ', 'g'), ' '),
                      'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                      'abcdefghijklmnopqrstuvwxyz') AS norm
                  FROM documents)
        """,
        "length_sketch_quantiles": """
            WITH nb AS (
              SELECT lang, n_chars // 64 AS bin,
                     CAST(COUNT(*) AS BIGINT) AS c
              FROM documents GROUP BY 1, 2),
            cum AS (
              SELECT lang, bin,
                     SUM(c) OVER (PARTITION BY lang ORDER BY bin) AS cum,
                     SUM(c) OVER (PARTITION BY lang) AS n
              FROM nb),
            ps AS (SELECT UNNEST([0.5, 0.9, 0.99]) AS p)
            SELECT lang, p, CAST(n AS BIGINT) AS n_docs,
                   CAST((MIN(bin) + 1) * 64 - 1 AS BIGINT) AS q_chars
            FROM cum, ps
            WHERE cum >= CEIL(p * n)
            GROUP BY lang, p, n
        """,
        "price_quantiles": f"""
            WITH p AS (
              SELECT o_orderpriority, {cents('o_totalprice')} AS price_cents
              FROM orders)
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(quantile_disc(price_cents, 0.25) AS BIGINT) AS p25_cents,
                   CAST(quantile_disc(price_cents, 0.5) AS BIGINT) AS p50_cents,
                   CAST(quantile_disc(price_cents, 0.75) AS BIGINT) AS p75_cents,
                   CAST(quantile_disc(price_cents, 0.95) AS BIGINT) AS p95_cents
            FROM p GROUP BY o_orderpriority
        """,
        "region_acctbal": f"""
            SELECT r_name,
                   CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(SUM({cents('c_acctbal')}) AS BIGINT) AS sum_acctbal_cents
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
    }
