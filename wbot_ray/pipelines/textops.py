"""Text analysis over the ``documents`` table — language stats, quality
scoring, token counting, fingerprinting, heuristic language ID.

All stages are single-pass ``map_batches`` transforms (stateless tasks —
no actor state needed); aggregations pre-combine per batch before the
(tiny) ``groupby`` shuffle, so at 100 TB the all-to-all exchange carries
one row per (batch × key), not one per document.

Oracle-checked columns use only integer counts and single-division
ratios (see ``pipelines.common`` for the float-determinism rule).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum

from wbot_ray.pipelines.common import (
    STOPWORDS,
    batch_shingle_hashes,
    read_table,
)


def _explode_tokens(pl, batch: pa.Table):
    """``(di, text)`` token rows for every token of every document, in
    position order — the shared tokenize+explode front of the polars
    batch combiners (``di`` = row index within the batch). An empty
    document yields one empty token, matching ``"".split(" ")``."""
    return (
        pl.from_arrow(batch)
        .with_row_index("di")
        .select(pl.col("di"), pl.col("text").str.split(" "))
        .explode("text")
    )


def _doc_bigrams(pl, batch: pa.Table):
    """``(di, w1, bigram)`` rows for every in-document adjacent token
    pair — tokenize, shift, boundary-filter, concat, all in polars'
    Rust kernels (no per-token Python)."""
    ex = _explode_tokens(pl, batch)
    return (
        ex.with_columns(
            pl.col("text").shift(-1).alias("_nxt"),
            pl.col("di").shift(-1).alias("_dn"),
        )
        .filter(pl.col("di") == pl.col("_dn"))
        .select(
            pl.col("di"),
            pl.col("text").alias("w1"),
            pl.concat_str([pl.col("text"), pl.col("_nxt")], separator=" ").alias(
                "bigram"
            ),
        )
    )


__all__ = [
    "text_stats",
    "lang_dist",
    "token_counts",
    "doc_fingerprint",
    "langid",
    "heavy_hitters",
    "corpus_filter",
    "ngram_counts",
    "tfidf_topterms",
    "decontaminate",
    "quality_score",
    "freq_quality",
    "repetition_stats",
    "pii_scrub",
    "length_deciles",
    "filter_funnel",
    "filter_funnel_oracle_sql",
    "bpe_pairs",
    "bpe_pairs_oracle_sql",
    "cms_sketch",
    "cms_sketch_oracle_sql",
    "cooccur_counts",
    "cooccur_counts_oracle_sql",
    "lm_score",
    "lm_score_oracle_sql",
    "dsir_logweight",
    "dsir_logweight_oracle_sql",
    "ccnet_buckets",
    "ccnet_buckets_oracle_sql",
]

# BPE-ish word/punct splitter (ASCII classes — matches RE2 semantics so the
# DuckDB oracle regexp_extract_all uses the identical pattern).
BPE_RE = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")
TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

# tiny per-language stopword profiles for the heuristic language ID
# (deterministic n-gram/stopword scorer; a real pipeline would plug a
# fastText-style model into the same actor seam).
LANG_PROFILES = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "und", "die", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "que", "los", "de"),
    "pt": ("o", "a", "de", "que", "em"),
    "it": ("il", "di", "che", "la", "per"),
    "zh": (),
    "ja": (),
}


def _stats_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    n_tokens, n_uniq, stop_cnt, n_bpe = [], [], [], []
    for t in texts:
        toks = t.split(" ")
        n_tokens.append(len(toks))
        n_uniq.append(len(set(toks)))
        stop_cnt.append(sum(1 for w in toks if w in STOPWORDS))
        n_bpe.append(len(BPE_RE.findall(t)))
    n_tok_arr = pa.array(n_tokens, pa.int64())
    stop_arr = pa.array(stop_cnt, pa.int64())
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang": batch.column("lang"),
            "n_chars": pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
            "n_tokens": n_tok_arr,
            "n_uniq": pa.array(n_uniq, pa.int64()),
            "n_bpe": pa.array(n_bpe, pa.int64()),
            "stop_cnt": stop_arr,
            # single IEEE division — bit-identical to the oracle's
            "stopword_ratio": pc.divide(
                pc.cast(stop_arr, pa.float64()), pc.cast(n_tok_arr, pa.float64())
            ),
        }
    )


def _stats_ds(sf_dir: str):
    return read_table(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
        _stats_batch, batch_format="pyarrow"
    )


def text_stats(sf_dir: str):
    """Per-document token/char/stopword statistics + quality ratio."""
    return _stats_ds(sf_dir).drop_columns(["lang"])


def lang_dist(sf_dir: str):
    """Per-language corpus distribution (doc counts, char totals).
    Partial stats per batch, then an 8-key groupby — the shuffle moves
    O(batches × langs) rows regardless of corpus size."""
    agg = (
        _stats_ds(sf_dir)
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="total_chars"),
            Min("n_tokens", alias_name="min_tokens"),
            Max("n_tokens", alias_name="max_tokens"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "avg_chars",
            pc.divide(
                pc.cast(batch.column("total_chars"), pa.float64()),
                pc.cast(batch.column("n_docs"), pa.float64()),
            ),
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def token_counts(sf_dir: str):
    """Corpus token totals per language — whitespace tokens and BPE-ish
    regex tokens (the two counts a tokenizer-budget estimate needs)."""
    return (
        _stats_ds(sf_dir)
        .groupby("lang")
        .aggregate(
            Sum("n_tokens", alias_name="ws_tokens"),
            Sum("n_bpe", alias_name="bpe_tokens"),
        )
    )


_WS_RE = re.compile(r"[ \t\n\r\f]+")
# ASCII-only case fold: A-Z → a-z. Deliberately NOT str.lower(), whose
# Unicode special cases (İ → i + combining dot, ẞ → ß) differ from SQL
# lower() across ICU versions — translate() is char-for-char identical
# in both engines for any input.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def normalize_text(sf_dir: str):
    """Text canonicalization — the cleanup pass every web-corpus
    pipeline runs BEFORE dedup/quality so that byte-level noise
    (decomposed accents, tab/newline runs, case) doesn't split what is
    the same content into distinct hash identities: Unicode NFC, then
    ASCII-whitespace runs collapsed to one space and space-trimmed,
    then ASCII case fold. Emits the normalized identity (md5), not the
    text — downstream exact dedup keys on ``norm_hash`` directly, so
    the exchange stays slim.

    Every step is an exact cross-engine primitive (NFC is a Unicode
    standard; the regex class and translate() are char-for-char), so
    the DuckDB oracle reproduces the hash for ANY input — no ASCII
    assumption. Stateless map_batches over a two-column pruned read:
    embarrassingly parallel, no shuffle.
    """

    def norm_one(s: str) -> str:
        import unicodedata

        return (
            _WS_RE.sub(" ", unicodedata.normalize("NFC", s))
            .strip(" ")
            .translate(_ASCII_LOWER)
        )

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        norms = [norm_one(t) for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "norm_hash": pa.array(
                    [hashlib.md5(n.encode()).hexdigest() for n in norms], pa.string()
                ),
                "n_norm_chars": pa.array([len(n) for n in norms], pa.int64()),
                "changed": pa.array(
                    [n != t for n, t in zip(norms, texts)], pa.bool_()
                ),
            }
        )

    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def length_sketch_quantiles(
    sf_dir: str, bin_width: int = 64, ps: tuple[float, ...] = (0.5, 0.9, 0.99)
):
    """Per-language document-length quantiles from a MERGEABLE
    fixed-width histogram sketch — the bounded-state counterpart of the
    exact counting-refine quantile (``relational.price_quantiles``).

    Exact per-value histograms are bounded by |distinct values|, which
    for a length-like measure grows with the corpus; the sketch bins
    ``n_chars // bin_width`` so per-lang state is O(max_len /
    bin_width) REGARDLESS of corpus size, per-batch partials merge by
    addition (commutative — any combine tree gives the same counts),
    and the reported quantile is the bin's inclusive upper edge: a
    deterministic value within ``bin_width`` of the exact quantile.
    This is the sketch a 100-TB seq-len budgeting pass would run: the
    exchange carries (lang, bin, count) rows only, never documents.

    Quantile rule matches the exact operator: smallest bin whose
    cumulative count ≥ ceil(p·n) (IEEE double product — both engines
    agree bit-for-bit). Oracle = the same histogram in SQL.
    """
    import math

    def prep(batch: pa.Table) -> pa.Table:
        n = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "lang": batch.column("lang"),
                "bin": pa.array(n // bin_width, pa.int64()),
            }
        )
        part = t.group_by(["lang", "bin"]).aggregate([("bin", "count")])
        return pa.table(
            {
                "lang": part.column("lang"),
                "bin": part.column("bin"),
                "n": pc.cast(part.column("bin_count"), pa.int64()),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        lang = group.column("lang")[0].as_py()
        bins = np.asarray(group.column("bin").to_pylist(), dtype=np.int64)
        cnts = np.asarray(group.column("n").to_pylist(), dtype=np.int64)
        order = np.argsort(bins, kind="stable")
        bins, cnts = bins[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        rows = {"lang": [], "p": [], "n_docs": [], "q_chars": []}
        for p in ps:
            k = math.ceil(p * n)  # same IEEE double product as DuckDB
            b = int(bins[np.searchsorted(cum, k, side="left")])
            rows["lang"].append(lang)
            rows["p"].append(p)
            rows["n_docs"].append(n)
            rows["q_chars"].append((b + 1) * bin_width - 1)
        return pa.table(
            {
                "lang": pa.array(rows["lang"], pa.string()),
                "p": pa.array(rows["p"], pa.float64()),
                "n_docs": pa.array(rows["n_docs"], pa.int64()),
                "q_chars": pa.array(rows["q_chars"], pa.int64()),
            }
        )

    return (
        read_table(sf_dir, "documents", ["lang", "n_chars"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["lang", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("lang")
        .map_groups(finish, batch_format="pyarrow")
    )


_FP_MOD = (1 << 61) - 1  # Mersenne prime: ·2^k mod p is a 61-bit rotation
_FP_BASE = 131
_fp_pow_cache = np.array([1], dtype=np.uint64)


def _fp_pows(n: int) -> np.ndarray:
    """``[BASE^0, .., BASE^(n-1)] mod p`` as uint64 (grown geometrically,
    cached per process)."""
    global _fp_pow_cache
    if len(_fp_pow_cache) < n:
        m = max(n, 2 * len(_fp_pow_cache))
        pows, x = [], 1
        for _ in range(m):
            pows.append(x)
            x = (x * _FP_BASE) % _FP_MOD
        _fp_pow_cache = np.array(pows, dtype=np.uint64)
    return _fp_pow_cache


def _rolling_fp(data: bytes) -> int:
    """``h = Σ b_i · BASE^(n-1-i) mod p`` — the per-byte Horner loop's
    value, computed vectorized: products are split at bit 32 so every
    intermediate fits uint64 (b·hi < 2^37; the ·2^32 reduction uses
    2^61 ≡ 1 mod p, i.e. a 61-bit rotation)."""
    n = len(data)
    if n == 0:
        return 0
    w = _fp_pows(n)[n - 1 :: -1]
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    hi = w >> np.uint64(32)
    lo = w & np.uint64(0xFFFFFFFF)
    t1 = b * hi  # < 2^37
    r1 = ((t1 >> np.uint64(29)) + ((t1 & np.uint64((1 << 29) - 1)) << np.uint64(32))) % np.uint64(_FP_MOD)
    terms = (r1 + b * lo) % np.uint64(_FP_MOD)
    s_lo = int((terms & np.uint64(0xFFFFFFFF)).sum())
    s_hi = int((terms >> np.uint64(32)).sum())
    return ((s_hi % _FP_MOD) * (1 << 32) + s_lo) % _FP_MOD


def _fingerprint_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    md5s = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    # 64-bit rolling (polynomial) content fingerprint — the cheap identity
    # used for shard-local exact dedup at scale (not SQL-expressible;
    # verified against the per-byte Horner definition by unit test).
    rolling = [_rolling_fp(t.encode()) for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fp_md5": pa.array(md5s, pa.string()),
            "fp_rolling": pa.array(rolling, pa.uint64()),
        }
    )


def doc_fingerprint(sf_dir: str):
    """Per-document content fingerprints (md5 + 64-bit rolling hash)."""
    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _fingerprint_batch, batch_format="pyarrow"
    )


def _langid_batch(batch: pa.Table) -> pa.Table:
    """Stopword-profile scorer; falls back to a stable hash-free 'und'."""
    profiles = {k: frozenset(v) for k, v in LANG_PROFILES.items() if v}
    texts = batch.column("text").to_pylist()
    preds, scores = [], []
    for t in texts:
        toks = t.split(" ")
        best_lang, best = "und", 0
        for lang in sorted(profiles):
            s = sum(1 for w in toks if w in profiles[lang])
            if s > best:
                best, best_lang = s, lang
        preds.append(best_lang)
        scores.append(best / max(1, len(toks)))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(preds, pa.string()),
            "score": pa.array(scores, pa.float64()),
        }
    )


def langid(sf_dir: str):
    """Heuristic language ID (stopword profiles). Deterministic;
    rows-only checked (the scorer is not SQL-expressible)."""
    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _langid_batch, batch_format="pyarrow"
    )


def heavy_hitters(sf_dir: str, k: int = 50):
    """EXACT corpus heavy hitters — tokens with ``count · k ≥ N`` (N =
    total whitespace tokens) — via the standard two-pass sketch shape:

    Pass 1: a Misra–Gries summary of capacity ``k`` per batch (bounded
    memory however long the batch stream). Pigeonhole guarantee: a
    globally heavy token is batch-heavy in at least one batch, and a
    batch-heavy token always survives that batch's MG summary — so the
    union of the per-batch summaries is a ≤ k·batches candidate
    superset of the true heavy hitters.

    Pass 2: exact counts of the (broadcast) candidate set plus the
    global token total, one small keyed groupby; the threshold filter
    restores exactness. Output is tiny (≤ candidates), finished
    driver-side."""
    import ray as _ray

    def mg_batch(batch: pa.Table) -> pa.Table:
        counters: dict[str, int] = {}
        for t in batch.column("text").to_pylist():
            for tok in t.split(" "):
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < k:
                    counters[tok] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for c in counters:
                        counters[c] -= 1
                        if counters[c] == 0:
                            dead.append(c)
                    for c in dead:
                        del counters[c]
        return pa.table({"token": pa.array(sorted(counters), pa.string())})

    candidates = sorted(
        {
            r["token"]
            for r in read_table(sf_dir, "documents", ["text"])
            .map_batches(mg_batch, batch_format="pyarrow")
            .take_all()
        }
    )
    cand_ref = _ray.put(pa.array(candidates, pa.string()))

    def exact_counts(batch: pa.Table) -> pa.Table:
        """Vectorized exact pass: Arrow split + dictionary-encode, one
        bincount for per-distinct-token counts, one ``pc.is_in`` against
        the broadcast candidate array — no per-token Python."""
        cand = _ray.get(cand_ref)
        tok_lists = pc.split_pattern(batch.column("text"), pattern=" ")
        if isinstance(tok_lists, pa.ChunkedArray):
            tok_lists = tok_lists.combine_chunks()
        flat = tok_lists.flatten()
        total = len(flat)
        denc = pc.dictionary_encode(flat)
        cnt = np.bincount(
            denc.indices.to_numpy(zero_copy_only=False),
            minlength=len(denc.dictionary),
        )
        sel = np.nonzero(
            pc.is_in(denc.dictionary, value_set=cand).to_numpy(
                zero_copy_only=False
            )
        )[0]
        toks = pc.take(denc.dictionary, pa.array(sel))
        return pa.table(
            {
                "kind": pa.array(["t"] * len(sel) + ["N"], pa.string()),
                "token": pa.concat_arrays(
                    [toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks,
                     pa.array([""], pa.string())]
                ),
                "cnt": pa.array(
                    np.concatenate((cnt[sel], [total])).astype(np.int64), pa.int64()
                ),
            }
        )

    agg = (
        read_table(sf_dir, "documents", ["text"])
        .map_batches(exact_counts, batch_format="pyarrow")
        .groupby(["kind", "token"])
        .aggregate(Sum("cnt", alias_name="n"))
        .take_all()
    )
    total = sum(r["n"] for r in agg if r["kind"] == "N")
    rows = sorted(
        (r["token"], int(r["n"]))
        for r in agg
        if r["kind"] == "t" and r["n"] * k >= total
    )
    return pa.table(
        {
            "token": pa.array([t for t, _ in rows], pa.string()),
            "n_occurrences": pa.array([n for _, n in rows], pa.int64()),
        }
    )


def filter_funnel(
    sf_dir: str,
    min_tokens: int = 30,
    min_stopwords: int = 1,
    num_buckets: int = 32,
):
    """Per-language audit of the :func:`corpus_filter` chain — the
    report an operator reads to see which gate bites where: ``(lang,
    n_docs, n_fail_len, n_fail_stop, n_pass, n_kept)``. Gate
    definitions are IDENTICAL to ``corpus_filter`` (sequential: length
    first, then stopword presence; dedup winner = min doc_id per
    content md5 among gate-passers), so ``sum(n_kept)`` equals
    ``corpus_filter``'s row count by construction.

    Shape — one read pass, two slim exchanges (the discriminator-row
    trick the pagerank iteration uses): the gate stage emits per-batch
    per-lang counter partials (keyed by hash(lang)) AND slim winner
    candidates ``(fp, doc_id, lang)`` (keyed by hash(fp)) into one
    exchange; each bucket task folds counters through and settles its
    fp groups (all rows of an fp co-locate); a second tiny
    ``groupby(lang)`` exchange merges the per-lang rows. Text never
    enters either exchange."""
    import hashlib as _hashlib

    import pyarrow.compute as pc

    SCHEMA = pa.schema(
        [
            ("bucket", pa.int64()),
            ("lang", pa.string()),
            ("fp", pa.string()),
            ("doc_id", pa.int64()),
            ("n_docs", pa.int64()),
            ("n_fail_len", pa.int64()),
            ("n_fail_stop", pa.int64()),
            ("n_pass", pa.int64()),
            ("n_kept", pa.int64()),
        ]
    )

    def gate(batch: pa.Table) -> pa.Table:
        from wbot_ray.pipelines.common import hash64

        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        counters: dict[str, list[int]] = {}  # lang -> [docs, fail_len, fail_stop, pass]
        cand_lang, cand_fp, cand_id = [], [], []
        for d, t, lg in zip(ids, texts, langs):
            c = counters.setdefault(lg, [0, 0, 0, 0])
            c[0] += 1
            toks = t.split(" ")
            if len(toks) < min_tokens:
                c[1] += 1
                continue
            if sum(1 for w in toks if w in STOPWORDS) < min_stopwords:
                c[2] += 1
                continue
            c[3] += 1
            cand_lang.append(lg)
            cand_fp.append(_hashlib.md5(t.encode()).hexdigest())
            cand_id.append(d)
        rows = {name: [] for name in SCHEMA.names}
        for lg, (nd, nfl, nfs, np_) in counters.items():
            rows["bucket"].append(hash64("lang:" + lg) % num_buckets)
            rows["lang"].append(lg)
            rows["fp"].append(None)
            rows["doc_id"].append(None)
            rows["n_docs"].append(nd)
            rows["n_fail_len"].append(nfl)
            rows["n_fail_stop"].append(nfs)
            rows["n_pass"].append(np_)
            rows["n_kept"].append(0)
        for lg, fp, d in zip(cand_lang, cand_fp, cand_id):
            rows["bucket"].append(hash64("fp:" + fp) % num_buckets)
            rows["lang"].append(lg)
            rows["fp"].append(fp)
            rows["doc_id"].append(d)
            rows["n_docs"].append(0)
            rows["n_fail_len"].append(0)
            rows["n_fail_stop"].append(0)
            rows["n_pass"].append(0)
            rows["n_kept"].append(0)
        return pa.Table.from_pydict(rows, schema=SCHEMA)

    def settle(group: pa.Table) -> pa.Table:
        """Counter rows pass through summed per lang; candidate rows
        collapse to one kept-count row per winner lang."""
        import polars as pl

        df = pl.from_arrow(group)
        counters = (
            df.filter(pl.col("fp").is_null())
            .group_by("lang")
            .agg(
                n_docs=pl.col("n_docs").sum(),
                n_fail_len=pl.col("n_fail_len").sum(),
                n_fail_stop=pl.col("n_fail_stop").sum(),
                n_pass=pl.col("n_pass").sum(),
                n_kept=pl.lit(0, dtype=pl.Int64),
            )
        )
        kept = (
            df.filter(pl.col("fp").is_not_null())
            .sort(["fp", "doc_id"])
            .group_by("fp", maintain_order=True)
            .agg(lang=pl.col("lang").first())  # min doc_id's lang wins
            .group_by("lang")
            .agg(n_kept=pl.len().cast(pl.Int64))
            .with_columns(
                n_docs=pl.lit(0, dtype=pl.Int64),
                n_fail_len=pl.lit(0, dtype=pl.Int64),
                n_fail_stop=pl.lit(0, dtype=pl.Int64),
                n_pass=pl.lit(0, dtype=pl.Int64),
            )
        )
        cols = ["lang", "n_docs", "n_fail_len", "n_fail_stop", "n_pass", "n_kept"]
        out = pl.concat([counters.select(cols), kept.select(cols)])
        return out.to_arrow().cast(
            pa.schema([(c, pa.string() if c == "lang" else pa.int64()) for c in cols])
        )

    merged = (
        read_table(sf_dir, "documents", ["doc_id", "text", "lang"])
        .map_batches(gate, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(settle, batch_format="pyarrow")
        .groupby("lang")
        .sum(["n_docs", "n_fail_len", "n_fail_stop", "n_pass", "n_kept"])
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch.column("lang"),
                **{
                    c: batch.column(f"sum({c})").cast(pa.int64())
                    for c in ("n_docs", "n_fail_len", "n_fail_stop", "n_pass", "n_kept")
                },
            }
        )

    return merged.map_batches(rename, batch_format="pyarrow")


def filter_funnel_oracle_sql(min_tokens: int = 30, min_stopwords: int = 1) -> str:
    """DuckDB twin: same sequential gates, same stopword tuple, same
    min-doc_id-per-md5 winner rule."""
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
        WITH d AS (
          SELECT doc_id, lang, md5(text) AS fp,
                 string_split(text, ' ') AS toks
          FROM documents
        ), cls AS (
          SELECT doc_id, lang, fp,
                 CASE WHEN len(toks) < {min_tokens} THEN 'fail_len'
                      WHEN len(list_filter(toks, t -> t IN ({sw}))) < {min_stopwords}
                      THEN 'fail_stop'
                      ELSE 'pass' END AS st
          FROM d
        ), winners AS (
          SELECT fp, MIN(doc_id) AS w FROM cls WHERE st = 'pass' GROUP BY fp
        ), keptlang AS (
          SELECT c.lang, COUNT(*) AS n_kept
          FROM cls c JOIN winners k ON c.fp = k.fp AND c.doc_id = k.w
          WHERE c.st = 'pass' GROUP BY c.lang
        ), funnel AS (
          SELECT lang,
                 COUNT(*) AS n_docs,
                 SUM(CASE WHEN st = 'fail_len' THEN 1 ELSE 0 END) AS n_fail_len,
                 SUM(CASE WHEN st = 'fail_stop' THEN 1 ELSE 0 END) AS n_fail_stop,
                 SUM(CASE WHEN st = 'pass' THEN 1 ELSE 0 END) AS n_pass
          FROM cls GROUP BY lang
        )
        SELECT f.lang,
               CAST(f.n_docs AS BIGINT) AS n_docs,
               CAST(f.n_fail_len AS BIGINT) AS n_fail_len,
               CAST(f.n_fail_stop AS BIGINT) AS n_fail_stop,
               CAST(f.n_pass AS BIGINT) AS n_pass,
               CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
        FROM funnel f LEFT JOIN keptlang k ON f.lang = k.lang
    """


def corpus_filter(sf_dir: str, min_tokens: int = 30, min_stopwords: int = 1):
    """The flagship training-data pipeline in one op: quality gates
    (length + stopword presence) THEN exact dedup (first doc_id per
    content hash wins). Gates run before the shuffle so rejected
    documents never enter the exchange; the dedup shuffle carries only
    (hash, doc_id, n_tokens) — the text stays behind."""
    import hashlib as _hashlib

    from ray.data.aggregate import Min as _Min

    def gate(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        out_id, out_fp, out_nt = [], [], []
        for d, t in zip(ids, texts):
            toks = t.split(" ")
            if len(toks) < min_tokens:
                continue
            if sum(1 for w in toks if w in STOPWORDS) < min_stopwords:
                continue
            out_id.append(d)
            out_fp.append(_hashlib.md5(t.encode()).hexdigest())
            out_nt.append(len(toks))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "fp": pa.array(out_fp, pa.string()),
                "n_tokens": pa.array(out_nt, pa.int64()),
            }
        )

    kept = (
        read_table(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(gate, batch_format="pyarrow")
        .groupby("fp")
        .aggregate(_Min("doc_id", alias_name="doc_id"), _Min("n_tokens", alias_name="n_tokens"))
    )
    return kept.select_columns(["doc_id", "n_tokens"])


def ngram_counts(sf_dir: str, n: int = 2, min_count: int = 5):
    """Corpus n-gram frequency (default bigrams): per-batch Counter
    partials (one row per distinct n-gram per batch — the combiner), a
    ``groupby(ngram)`` sum over the pre-combined rows, then the
    min-count gate. Documents shorter than n words contribute nothing.
    At 100 TB the exchange is bounded by batch-count × distinct-ngrams,
    and the output by the (Zipf-truncated) vocabulary above
    ``min_count``.

    The combiner runs entirely in polars (Rust hash kernels): tokenize +
    explode, window via ``shift(-j)`` with a doc-boundary filter, one
    ``group_by`` count — measured 4.4x the per-token Counter loop on a
    1M-token batch, no per-token Python anywhere."""

    def part(batch: pa.Table) -> pa.Table:
        import polars as pl

        ex = _explode_tokens(pl, batch.select(["text"]))
        shifted = ex.with_columns(
            *[pl.col("text").shift(-j).alias(f"_t{j}") for j in range(1, n)],
            pl.col("di").shift(-(n - 1)).alias("_dn"),
        )
        if n > 1:
            # a window is in-document iff its first and last positions
            # share the doc index (token positions are contiguous)
            shifted = shifted.filter(pl.col("di") == pl.col("_dn"))
        grouped = (
            shifted.select(
                pl.concat_str(
                    [pl.col("text"), *[pl.col(f"_t{j}") for j in range(1, n)]],
                    separator=" ",
                ).alias("ngram")
            )
            .group_by("ngram")
            .len()
            .select(
                pl.col("ngram"), pl.col("len").cast(pl.Int64).alias("n_occurrences")
            )
        )
        return grouped.to_arrow().cast(
            pa.schema([("ngram", pa.string()), ("n_occurrences", pa.int64())])
        )

    def gate(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("n_occurrences"), min_count))

    return (
        read_table(sf_dir, "documents", ["text"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("ngram")
        .aggregate(Sum("n_occurrences", alias_name="n_occurrences"))
        .map_batches(gate, batch_format="pyarrow")
    )


def tfidf_topterms(
    sf_dir: str,
    k: int = 5,
    num_buckets: int = 64,
    broadcast_vocab_max: int = 1 << 21,
):
    """Per-document top-k salient terms, ranked (tf DESC, df ASC, token
    ASC) — a tf-idf ordering expressed entirely in integers (no float
    scores, so the ranking is platform-exact).

    Web-scale shape — NOTHING is proportional to |vocab| on the driver:

    1. exact document frequency: per-batch partials (token, #docs in
       batch containing it — polars unique+count, no per-token Python)
       → ``groupby(token).sum`` — an exchange bounded by batch-count ×
       batch-distinct tokens;
    2. per-batch tf rows (doc_id, token, tf) joined with the df table
       through a token-keyed bucketed ``hash_join`` — both sides
       co-partition on hash(token), the vocabulary never leaves the
       cluster;
    3. per-doc ranking after a doc-keyed bucket regroup (each bucket
       holds whole docs, the rank is one vectorized lexsort per
       bucket).

    Small-vocab fast path (``broadcast_vocab_max``, the dedup_minhash
    ``small_verify_threshold`` analogue): when the materialized df table
    is small it is broadcast once (``ray.put``) and the rank runs
    doc-locally with ZERO extra exchanges — the right call whenever the
    vocabulary genuinely fits a worker heap. The threshold bounds the
    driver/broadcast transit; past it the join path above runs with no
    driver materialization proportional to |vocab|. Both paths are
    parity-pinned in tests."""
    import ray

    from wbot_ray.pipelines.join import hash_join

    def _doc_token_codes(batch: pa.Table):
        """(row-index-per-token, dictionary) of the batch's token stream
        — Arrow split + dictionary-encode, one packed-key np.unique for
        per-doc distinctness (the HashEncoder bincount pattern; no
        per-token Python)."""
        tok_lists = pc.split_pattern(batch.column("text"), pattern=" ")
        if isinstance(tok_lists, pa.ChunkedArray):
            tok_lists = tok_lists.combine_chunks()
        lens = pc.list_value_length(tok_lists).to_numpy(zero_copy_only=False)
        row = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        denc = pc.dictionary_encode(tok_lists.flatten())
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        return row, codes, denc.dictionary

    def df_part(batch: pa.Table) -> pa.Table:
        row, codes, vocab = _doc_token_codes(batch)
        D = len(vocab)
        uk = np.unique(row * D + codes)  # distinct (doc, token) pairs
        dfp = np.bincount((uk % D).astype(np.int64), minlength=D)
        return pa.table(
            {
                "token": vocab,
                "df_part": pa.array(dfp.astype(np.int64), pa.int64()),
            }
        )

    df_ds = (
        read_table(sf_dir, "documents", ["text"])
        .map_batches(df_part, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df_part", alias_name="df"))
        .map_batches(
            lambda t: pa.table(
                {"token": t.column("token"), "df": pc.cast(t.column("df"), pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )

    def tf_rows(batch: pa.Table) -> pa.Table:
        row, codes, vocab = _doc_token_codes(batch)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        D = len(vocab)
        uk, counts = np.unique(row * D + codes, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(ids[uk // D], pa.int64()),
                "token": pc.take(vocab, pa.array(uk % D)),
                "tf": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    def rank_topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("token", pa.string()),
                    ("tf", pa.int64()),
                    ("df", pa.int64()),
                    ("term_rank", pa.int64()),
                ]
            ).empty_table()
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        tf = g.column("tf").to_numpy(zero_copy_only=False)
        df = g.column("df").to_numpy(zero_copy_only=False)
        # token order code: np.unique codes preserve lexicographic order
        _, code = np.unique(
            np.asarray(g.column("token").to_pylist(), dtype=object),
            return_inverse=True,
        )
        order = np.lexsort((code, df, -tf, doc))
        d_sorted = doc[order]
        is_start = np.r_[True, d_sorted[1:] != d_sorted[:-1]]
        run_start = np.maximum.accumulate(
            np.where(is_start, np.arange(len(order)), 0)
        )
        rank = np.arange(len(order)) - run_start
        keep = rank < k
        out = g.take(pa.array(order[keep])).select(["doc_id", "token", "tf", "df"])
        return out.append_column("term_rank", pa.array(rank[keep] + 1, pa.int64()))

    # vocab parks in the OBJECT STORE (cluster-wide, spillable), never
    # on the driver; the row count decides the path for free
    df_mat = df_ds.materialize()
    if df_mat.count() <= broadcast_vocab_max:
        blocks = [b for b in ray.get(df_mat.to_arrow_refs()) if b.num_rows]
        df_tbl = (
            pa.concat_tables(blocks).combine_chunks()
            if blocks
            else pa.table(
                {"token": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        )
        df_ref = ray.put(df_tbl)

        def topterms_local(batch: pa.Table) -> pa.Table:
            t = tf_rows(batch).join(
                ray.get(df_ref), keys="token", join_type="left outer"
            )
            return rank_topk(t)

        return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            topterms_local, batch_format="pyarrow"
        )

    tf_ds = read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tf_rows, batch_format="pyarrow"
    )
    joined = hash_join(
        tf_ds,
        df_mat,
        key="token",
        num_buckets=num_buckets,
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("token", pa.string()), ("tf", pa.int64())]
        ),
        right_schema=pa.schema([("token", pa.string()), ("df", pa.int64())]),
    )

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        db = t.column("doc_id").to_numpy(zero_copy_only=False) % num_buckets
        return t.append_column("db", pa.array(db.astype(np.int64), pa.int64()))

    return (
        joined.map_batches(add_doc_bucket, batch_format="pyarrow")
        .groupby("db")
        .map_groups(rank_topk, batch_format="pyarrow")
    )


BENCH_MOD = 50  # doc_id % BENCH_MOD == 0 → "benchmark" holdout member


def decontaminate(sf_dir: str, bench_mod: int = BENCH_MOD):
    """Benchmark decontamination: flag every corpus document that shares
    at least one 3-word shingle with the (deterministic) benchmark
    holdout — the pre-training hygiene step that keeps eval sets out of
    the training corpus.

    The benchmark set here is ``doc_id % bench_mod == 0`` (self-contained
    and SQL-recomputable); in production it is a separate, *small by
    definition* table — which is exactly the scale contract this shape
    relies on: the benchmark's distinct shingle hashes are collected
    once and BROADCAST (``ray.put`` → read zero-copy in every task),
    then one streaming ``map_batches`` pass probes each corpus doc's
    shingles against the sorted hash array via ``np.searchsorted`` —
    the 100-TB corpus side never shuffles at all. Shingle identity is
    ``md5_lower64`` (= DuckDB ``md5_number_lower``), so the oracle
    recomputes identical hashes.
    """
    import ray

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def bench_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        bench_rows = np.nonzero(ids % bench_mod == 0)[0]
        sets = batch_shingle_hashes(
            pc.take(batch.column("text"), pa.array(bench_rows))
        )
        hs = (
            np.unique(np.concatenate(sets))
            if sets
            else np.empty(0, dtype=np.uint64)
        )
        return pa.table({"h": pa.array(hs, pa.uint64())})

    # benchmark side: tiny by definition — per-batch distinct partials,
    # unioned on the driver into one sorted array, broadcast once
    parts = [
        b["h"]
        for b in docs.map_batches(bench_batch, batch_format="pyarrow").iter_batches(
            batch_format="numpy"
        )
    ]
    bench_ref = ray.put(
        np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.uint64)
    )

    def probe(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep_rows = np.nonzero(ids % bench_mod != 0)[0]
        shs = batch_shingle_hashes(
            pc.take(batch.column("text"), pa.array(keep_rows))
        )
        out_ids, hits = [], []
        for i, sh in zip(ids[keep_rows], shs):
            pos = np.searchsorted(bench, sh)
            pos[pos == len(bench)] = 0
            n = int((bench[pos] == sh).sum()) if len(bench) else 0
            out_ids.append(int(i))
            hits.append(n)
        n_hits = pa.array(hits, pa.int64())
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "n_hits": n_hits,
                "contaminated": pc.greater(n_hits, 0),
            }
        )

    return docs.map_batches(probe, batch_format="pyarrow")


# Gopher-style quality rule thresholds (integers only — the mean word
# length is carried ×100 so the rule compare is exact in both engines).
QUALITY_MIN_WORDS, QUALITY_MAX_WORDS = 20, 80
QUALITY_MIN_MWL_X100, QUALITY_MAX_MWL_X100 = 380, 460
QUALITY_SYMBOL_DENOM = 10  # fail when symbol_words * 10 > n_words
QUALITY_MIN_STOP_HITS = 2

_SYMBOL_RE = re.compile(r"[a-zA-Z0-9]")


def quality_score(sf_dir: str):
    """Gopher-style document quality rules — the classic pre-training
    corpus gate: word-count bounds, mean-word-length band, symbol-word
    ratio cap, minimum stopword evidence. Emits per-document rule
    features, a failure BITMASK (bit0 wordcount, bit1 mean-word-length,
    bit2 symbol ratio, bit3 stopwords) and the pass verdict, so
    downstream stages can both filter and audit WHY a doc dropped.

    Single streaming ``map_batches`` pass, integer-only rule math
    (mean word length ×100 under floor division) — bit-identical in
    the DuckDB oracle."""

    def score(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_words, mwl, sym, stop, mask = [], [], [], [], []
        for t in texts:
            toks = t.split(" ")
            n = len(toks)
            char_sum = sum(len(w) for w in toks)
            m = (char_sum * 100) // n
            sy = sum(1 for w in toks if not _SYMBOL_RE.search(w))
            st = sum(1 for w in toks if w in STOPWORDS)
            bits = 0
            if n < QUALITY_MIN_WORDS or n > QUALITY_MAX_WORDS:
                bits |= 1
            if m < QUALITY_MIN_MWL_X100 or m > QUALITY_MAX_MWL_X100:
                bits |= 2
            if sy * QUALITY_SYMBOL_DENOM > n:
                bits |= 4
            if st < QUALITY_MIN_STOP_HITS:
                bits |= 8
            n_words.append(n)
            mwl.append(m)
            sym.append(sy)
            stop.append(st)
            mask.append(bits)
        mask_arr = pa.array(mask, pa.int64())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(n_words, pa.int64()),
                "mwl_x100": pa.array(mwl, pa.int64()),
                "symbol_words": pa.array(sym, pa.int64()),
                "stop_hits": pa.array(stop, pa.int64()),
                "rules_failed": mask_arr,
                "passes": pc.equal(mask_arr, 0),
            }
        )

    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


# -- frequency-model quality score (the CCNet perplexity-filter shape) ----


def freq_quality(sf_dir: str, top_v: int = 16):
    """Model-based quality scoring with a corpus-derived frequency model
    — the deterministic analog of CCNet's KenLM perplexity filter: pass
    1 learns the model (global token counts → the ``top_v`` vocabulary
    ranked by ``(count desc, token asc)``), pass 2 scores every
    document against it. Rare/unknown-heavy documents score HIGH mean
    rank (an out-of-vocabulary token costs rank ``top_v + 1``) — the
    filterable signal. All-integer outputs per doc: ``n_tokens``,
    ``oov_cnt``, ``mean_rank_x100 = (Σ rank · 100) // n_tokens``.

    Ray shape — learn-broadcast-score:

    * pass 1 pre-aggregates counts INSIDE each batch (31–10^6 distinct
      tokens per batch, not one row per token occurrence), one keyed
      exchange sums them, a per-block partial top-``top_v`` + driver
      merge extracts the vocabulary (O(top_v × blocks) driver rows);
    * the vocabulary is broadcast ONCE (``ray.put``) and pass 2 is a
      stateless ``map_batches`` scorer — no second exchange.
    """
    import ray

    from collections import Counter

    def partial_counts(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in batch.column("text").to_pylist():
            c.update(txt.split(" "))
        toks = sorted(c)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "cnt": pa.array([c[t] for t in toks], pa.int64()),
            }
        )

    def block_topv(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch.column("sum(cnt)").to_pylist(), dtype=np.int64)
        toks = np.asarray(batch.column("token").to_pylist(), dtype=object)
        order = np.lexsort((toks, -n))[:top_v]
        return pa.table(
            {
                "token": pa.array(toks[order], pa.string()),
                "cnt": pa.array(n[order], pa.int64()),
            }
        )

    counted = (
        read_table(sf_dir, "documents", ["text"])
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt"))
        .map_batches(block_topv, batch_format="pyarrow")
        .take_all()
    )
    counted.sort(key=lambda r: (-r["cnt"], r["token"]))
    rank_of = {r["token"]: i + 1 for i, r in enumerate(counted[:top_v])}
    oov_rank = top_v + 1
    v_ref = ray.put(rank_of)

    def score(batch: pa.Table) -> pa.Table:
        ranks = ray.get(v_ref)
        o_id, o_n, o_oov, o_mr = [], [], [], []
        for did, txt in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = txt.split(" ")
            rs = [ranks.get(t, oov_rank) for t in toks]
            o_id.append(did)
            o_n.append(len(toks))
            o_oov.append(sum(1 for r in rs if r == oov_rank))
            o_mr.append(sum(rs) * 100 // len(toks))
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "n_tokens": pa.array(o_n, pa.int64()),
                "oov_cnt": pa.array(o_oov, pa.int64()),
                "mean_rank_x100": pa.array(o_mr, pa.int64()),
            }
        )

    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


# ASCII whitespace class — the SAME class normalize_text collapses on, and
# exactly what RE2/DuckDB regexp '\s' matches, so the SQL oracle tokenizes
# identically (Python str.split() would also split NBSP etc. and diverge).
_WS_RE = re.compile(r"[ \t\n\r\f]+")


def repetition_stats(sf_dir: str):
    """Gopher-style repetition signals per document — the famous
    training-data filters 'fraction of 2-gram instances that are
    duplicated' and 'fraction of characters in the most frequent 2-gram'
    (Rae et al. 2021, Table A1), in exact per-mille integer math.

    Ray shape: one stateless ``map_batches`` pass over a pruned
    (doc_id, text) read — per-doc Counters, no exchange at all; output
    is one slim integer row per document. At 100 TB this is exactly as
    parallel as the input blocks.

    Columns (integers throughout — no float ever crosses engines):
      n_words              whitespace words (ASCII-class split)
      n_bigrams            adjacent-pair instances = max(n_words-1, 0)
      dup_bigram_pm        1000·(instances of bigrams occurring ≥2×)/n_bigrams
      top_bigram_chars_pm  1000·(top bigram's char mass)/(total word chars),
                           char mass = count × (len(w1)+len(w2)); the top
                           bigram is max count, ties → lexicographically
                           smallest "w1 w2"
    Both ratios floor-divide; denominators of 0 yield 0."""
    from collections import Counter

    def fn(batch: pa.Table) -> pa.Table:
        o_words, o_big, o_dup, o_top = [], [], [], []
        for txt in batch.column("text").to_pylist():
            toks = [t for t in _WS_RE.split(txt) if t]
            nw = len(toks)
            nb = max(nw - 1, 0)
            o_words.append(nw)
            o_big.append(nb)
            if nb == 0:
                o_dup.append(0)
                o_top.append(0)
                continue
            counts = Counter(
                (toks[i], toks[i + 1]) for i in range(nb)
            )
            dup_inst = sum(c for c in counts.values() if c >= 2)
            o_dup.append(1000 * dup_inst // nb)
            # top bigram: max count, tie → smallest "w1 w2" string
            maxc = max(counts.values())
            top_pair = min(
                (bg for bg, c in counts.items() if c == maxc),
                key=lambda bg: f"{bg[0]} {bg[1]}",
            )
            char_mass = counts[top_pair] * (len(top_pair[0]) + len(top_pair[1]))
            denom = sum(len(t) for t in toks)
            o_top.append(1000 * char_mass // denom if denom else 0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(o_words, pa.int64()),
                "n_bigrams": pa.array(o_big, pa.int64()),
                "dup_bigram_pm": pa.array(o_dup, pa.int64()),
                "top_bigram_chars_pm": pa.array(o_top, pa.int64()),
            }
        )

    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


# PII redaction patterns, applied IN ORDER (email first so an address's
# host part can't be half-eaten by the IP pattern; phone last so the
# looser digit shape never claims bytes the specific shapes own). All
# three are RE2 — pyarrow's re2-backed kernels and DuckDB's regexp_*
# compile the IDENTICAL pattern, which is what makes the scrub
# value-exact cross-engine for ANY input, not just the fixture.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b", "<IP>"),
    ("phone", r"\+?[0-9]{1,3}[ .\-][0-9]{3}[ .\-][0-9]{4}\b", "<PHONE>"),
)


def pii_scrub(sf_dir: str):
    """PII redaction — the compliance pass a web corpus runs before any
    text leaves the pipeline: emails, IPv4 addresses and phone-shaped
    digit runs replaced by typed placeholder tokens. Per doc: md5 of the
    scrubbed text (downstream keys on the hash; the exchange never
    carries the text), per-type match counts, and a ``changed`` flag so
    a consumer can route untouched docs around a rewrite sink.

    Counts are taken on the text state each pattern actually sees
    (i.e. AFTER the preceding replacements) — the same nesting the
    DuckDB oracle applies — so a count never double-claims bytes an
    earlier pattern already redacted.

    Scale shape: stateless single-pass ``map_batches`` over a pruned
    two-column read; the regex scan is pyarrow's C++ RE2 kernel (no
    Python loop over rows for the match/replace work); no shuffle.
    """

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        counts: dict[str, pa.Array] = {}
        for name, pat, repl in PII_PATTERNS:
            counts[name] = pc.cast(pc.count_substring_regex(t, pat), pa.int64())
            t = pc.replace_substring_regex(t, pat, repl)
        scrubbed = t.to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "scrub_hash": pa.array(
                    [hashlib.md5(s.encode()).hexdigest() for s in scrubbed],
                    pa.string(),
                ),
                "n_email": counts["email"],
                "n_ipv4": counts["ipv4"],
                "n_phone": counts["phone"],
                "changed": pc.not_equal(t, batch.column("text")),
            }
        )

    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def length_deciles(sf_dir: str, k: int = 10):
    """Exact per-language NTILE(k) over document length — the
    percentile-bucket assignment a curriculum/mixing pipeline uses to
    stratify a corpus ("shortest decile", "longest decile") with EXACT
    SQL-window semantics: bucket boundaries follow ``NTILE(k) OVER
    (PARTITION BY lang ORDER BY n_chars, doc_id)`` including the
    first-``n%k``-buckets-get-one-extra rule and deterministic
    tie-break.

    Exact global ranking is the one window shape that genuinely needs a
    distributed SORT (an all-to-all, paid once): rows are range-
    partitioned by ``(lang, n_chars, doc_id)``, then each block's dense
    global rank comes from the block-offset pattern (cumulative
    per-block row counts read from block METADATA — no row transits the
    driver; same machinery as the crawl's ``crawl_ord``,
    ``stages/order.py``). Because the sort is lexicographic with
    ``lang`` leading, each language occupies one contiguous rank range,
    so per-lang rank = global rank − lang start, where the ≤ |langs|
    starts come from a tiny per-batch count aggregate broadcast by
    closure. Bucket math is pure integer (vectorized numpy), identical
    to the SQL rule. Hot languages cost sort bandwidth, not a hot
    hash-partition — range partitioning splits them across blocks.
    """
    import ray.data

    from wbot_ray.stages.order import assign_crawl_ord

    def part_counts(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("lang"))
        return pa.table(
            {
                "lang": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    counts_rows = (
        read_table(sf_dir, "documents", ["lang"])
        .map_batches(part_counts, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    lang_n = {r["lang"]: int(r["n"]) for r in counts_rows}
    lang_start, acc = {}, 0
    for lang in sorted(lang_n):  # ascending string order == the sort order
        lang_start[lang] = acc
        acc += lang_n[lang]

    ranked, _ = assign_crawl_ord(
        read_table(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).sort(
            ["lang", "n_chars", "doc_id"]
        ),
        0,
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        codes = pc.dictionary_encode(batch.column("lang")).combine_chunks()
        vals = codes.dictionary.to_pylist()
        idx = codes.indices.to_numpy()
        r = batch.column("crawl_ord").to_numpy() - np.array(
            [lang_start[v] for v in vals], dtype=np.int64
        )[idx]
        n = np.array([lang_n[v] for v in vals], dtype=np.int64)[idx]
        # SQL NTILE: the first n%k buckets hold n//k + 1 rows each
        base, extra = n // k, n % k
        cut = extra * (base + 1)
        bucket = np.where(
            r < cut,
            r // (base + 1) + 1,
            extra + (r - cut) // np.maximum(base, 1) + 1,
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "n_chars": batch.column("n_chars"),
                "decile": pa.array(bucket, pa.int64()),
            }
        )

    return ranked.map_batches(bucketize, batch_format="pyarrow")


WORD_RE = "[a-z]+"  # shared verbatim with the DuckDB twins below


def bpe_pairs(sf_dir: str):
    """One BPE-tokenizer-training merge round: count every adjacent
    CHARACTER pair inside every word occurrence of the corpus — the
    statistic byte-pair-encoding greedily merges on (Sennrich et al.,
    ACL 2016; the counting pass of GPT-2-style tokenizer training).
    Words are lowercased ``[a-z]+`` runs (pattern shared verbatim with
    the oracle). Output: ``(pair, n_occurrences)`` — at most 26² rows.

    Ray shape — fully vectorized per-batch partials, tiny exchange:
    each batch extracts word occurrences (polars RE2), folds them to
    DISTINCT words × count (the Zipf combiner — pair generation runs
    once per distinct word per batch, not once per occurrence), then
    counts pairs in numpy over the codepoint array of the
    NUL-joined distinct-word string (a weighted ``bincount`` on
    ``a·128+b`` keys — no Python loop over words or chars). Partials
    are ≤676 rows/batch, so the ``groupby(pair)`` exchange is
    negligible at any corpus size."""

    def part(batch: pa.Table) -> pa.Table:
        import polars as pl

        words = (
            pl.from_arrow(batch.select(["text"]))
            .select(pl.col("text").str.to_lowercase().str.extract_all(WORD_RE))
            .explode("text")
            .drop_nulls()
        )
        if not len(words):
            return pa.table(
                {"pair": pa.array([], pa.string()), "n_occurrences": pa.array([], pa.int64())}
            )
        wc = words.group_by("text").len()
        joined = "\x00".join(wc.get_column("text").to_list())
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        cnt = wc.get_column("len").to_numpy().astype(np.int64)
        # word index of each position = #separators before it
        widx = np.cumsum(np.concatenate(([0], (cp[:-1] == 0).astype(np.int64))))
        a, b = cp[:-1], cp[1:]
        valid = (a != 0) & (b != 0)
        key = (a[valid].astype(np.int64) * 128) + b[valid].astype(np.int64)
        w = cnt[widx[:-1][valid]]
        tot = np.bincount(key, weights=w, minlength=128 * 128).astype(np.int64)
        nz = np.nonzero(tot)[0]
        pairs = [chr(k // 128) + chr(k % 128) for k in nz]  # ≤676 iterations
        return pa.table(
            {
                "pair": pa.array(pairs, pa.string()),
                "n_occurrences": pa.array(tot[nz], pa.int64()),
            }
        )

    return (
        read_table(sf_dir, "documents", ["text"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n_occurrences", alias_name="n_occurrences"))
    )


def bpe_pairs_oracle_sql() -> str:
    """DuckDB twin: per-word-occurrence adjacent character pairs via a
    position series, same ``[a-z]+`` word rule."""
    return f"""
        WITH words AS (
          SELECT UNNEST(regexp_extract_all(lower(text), '{WORD_RE}')) AS w
          FROM documents
        ),
        pos AS (
          SELECT w, UNNEST(generate_series(1, length(w) - 1)) AS i FROM words
        )
        SELECT substring(w, i, 2) AS pair,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM pos GROUP BY pair
    """


def cooccur_counts(sf_dir: str, window: int = 3, min_count: int = 5):
    """Skip-gram co-occurrence counting — the statistic under word2vec
    negative sampling, PMI association mining and GloVe's matrix: for
    every ORDERED token pair ``(w_a, w_b)`` where ``w_b`` follows
    ``w_a`` within ``window`` positions in a document's whitespace
    token sequence, the total occurrence count (gated at
    ``min_count``). Consumers derive PMI/lift from these integer facts
    plus ``token_counts`` — the counts themselves stay exact.

    Ray shape — pair formation is DOC-LOCAL (no exchange): per batch,
    tokens are integer-coded once (numpy factorize), then each window
    offset ``d`` is one vectorized shifted-array compare — pairs whose
    two positions span different documents are masked out via the doc
    boundary index, counted per batch with ``np.unique`` on the packed
    ``a·V+b`` key (the combiner), and only distinct-pair partial rows
    cross the ONE ``groupby(w_a, w_b)`` exchange — bounded by the
    Zipf-truncated pair vocabulary per batch, not by token positions.
    """

    def part(batch: pa.Table) -> pa.Table:
        import polars as pl

        ex = (
            pl.from_arrow(batch.select(["text"]))
            .with_row_index("di")
            .select(pl.col("di"), pl.col("text").str.split(" "))
            .explode("text")
            .drop_nulls()
        )
        empty = pa.table(
            {
                "w_a": pa.array([], pa.string()),
                "w_b": pa.array([], pa.string()),
                "n_cooccur": pa.array([], pa.int64()),
            }
        )
        if not len(ex):
            return empty
        vocab, codes = np.unique(ex.get_column("text").to_numpy(), return_inverse=True)
        doc = ex.get_column("di").to_numpy().astype(np.int64)
        V = np.int64(len(vocab))
        keys = []
        for d in range(1, window + 1):
            if d >= len(codes):
                break
            same = doc[:-d] == doc[d:]
            keys.append(codes[:-d][same].astype(np.int64) * V + codes[d:][same])
        if not keys:
            return empty
        uk, cnt = np.unique(np.concatenate(keys), return_counts=True)
        return pa.table(
            {
                "w_a": pa.array(vocab[(uk // V)], pa.string()),
                "w_b": pa.array(vocab[(uk % V)], pa.string()),
                "n_cooccur": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def gate(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("n_cooccur"), min_count))

    return (
        read_table(sf_dir, "documents", ["text"])
        .map_batches(part, batch_format="pyarrow")
        .groupby(["w_a", "w_b"])
        .aggregate(Sum("n_cooccur", alias_name="n_cooccur"))
        .map_batches(gate, batch_format="pyarrow")
    )


def cooccur_counts_oracle_sql(window: int = 3, min_count: int = 5) -> str:
    """DuckDB twin: zipped position unnest + a bounded range self-join
    per document."""
    return f"""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        pos AS (
          SELECT doc_id, UNNEST(ws) AS w,
                 UNNEST(generate_series(1, len(ws))) AS i
          FROM t
        )
        SELECT a.w AS w_a, b.w AS w_b,
               CAST(COUNT(*) AS BIGINT) AS n_cooccur
        FROM pos a JOIN pos b
          ON a.doc_id = b.doc_id
         AND b.i > a.i AND b.i <= a.i + {window}
        GROUP BY 1, 2 HAVING COUNT(*) >= {min_count}
    """


# ---------------------------------------------------------------------------
# n-gram LM quality scoring (the CCNet perplexity-filter shape)
# ---------------------------------------------------------------------------

LM_TRAIN_SOURCE = "src0"  # the "clean reference corpus" slice (CCNet: wiki)


def lm_score(
    sf_dir: str,
    train_source: str = LM_TRAIN_SOURCE,
    extra_cols: tuple[str, ...] = (),
):
    """CCNet-style LM quality scoring: train a word-bigram language
    model on ONE clean reference slice of the corpus (``source ==
    train_source`` — CCNet trains KenLM on Wikipedia), then score every
    document by its total surprisal under that model. Low
    bits-per-bigram ≈ fluent/in-domain text; high ≈ junk — the
    head/middle/tail quality buckets of the CCNet pipeline are
    thresholds over this column.

    Integer-exact surprisal (the float-determinism rule): per bigram
    occurrence ``w1 w2``,

        bits = bitlen(c(w1) + 1) - bitlen(c(w1 w2) + 1)

    with train counts ``c`` and Laplace +1 — an integer floor-log2
    conditional ``-log2 p(w2|w1)`` both engines compute exactly
    (int.bit_length here, ``length(bin(x))`` in DuckDB). ``c(w1 w2)
    <= c(w1)`` always, so bits >= 0. An UNSEEN left context takes
    ``c(w1) := T`` (total train bigram count) — the OOV penalty
    ``bitlen(T+1) - 1`` bits per bigram, the model's maximum; without
    it out-of-vocabulary junk would score as perfectly fluent.

    Physical plan: train = per-batch partial bigram counts over the
    reference slice (pruned 2-column read) -> ONE tiny keyed exchange
    (key cardinality = distinct train bigrams, vocab-bounded, never
    corpus-bounded) -> the folded model is broadcast ONCE via
    ``ray.put`` (the KenLM-binary seam); score = one stateless
    map_batches pass over the corpus. Nothing re-ships the model per
    batch; no full-corpus shuffle anywhere.

    Output: ``(doc_id, n_bigrams, surprisal, sbpb_x1000)`` for every
    document (``sbpb_x1000`` = surprisal * 1000 // n_bigrams, 0 for
    docs with < 2 tokens), plus any ``extra_cols`` carried through
    from the documents read (:func:`ccnet_buckets` rides ``lang``
    along)."""
    import ray

    _empty_train = pa.table(
        {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )

    def train_partial(batch: pa.Table) -> pa.Table:
        # polars combiner: filter the train slice, shift-window bigrams,
        # one hash group_by — no per-token Python (measured ~4x the
        # Counter loop on a 1M-token batch)
        import polars as pl

        df = pl.from_arrow(batch.select(["source", "text"])).filter(
            pl.col("source") == train_source
        )
        if not len(df):
            return _empty_train
        return (
            _doc_bigrams(pl, df.select("text").to_arrow())
            .group_by("bigram")
            .len()
            .select(pl.col("bigram"), pl.col("len").cast(pl.Int64).alias("n"))
            .to_arrow()
            .cast(pa.schema([("bigram", pa.string()), ("n", pa.int64())]))
        )

    rows = (
        read_table(sf_dir, "documents", ["source", "text"])
        .map_batches(train_partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    # fold the (vocab-bounded) model driver-side: per-key bit lengths,
    # left-context counts derived from the bigram table
    bg_bits: dict[str, int] = {}
    w1_counts: dict[str, int] = {}
    for r in rows:
        bg, n = r["bigram"], int(r["n"])
        bg_bits[bg] = (n + 1).bit_length()
        w1 = bg.split(" ", 1)[0]
        w1_counts[w1] = w1_counts.get(w1, 0) + n
    w1_bits = {w: (n + 1).bit_length() for w, n in w1_counts.items()}
    total = sum(w1_counts.values())
    oov_bits = (total + 1).bit_length()  # unseen context: c(w1) := T
    # the (vocab-bounded) model broadcasts as two Arrow lookup tables —
    # scoring is then two polars hash joins, no per-token Python
    w1_tbl = pa.table(
        {
            "w1": pa.array(list(w1_bits.keys()), pa.string()),
            "w1b": pa.array(list(w1_bits.values()), pa.int64()),
        }
    )
    bg_tbl = pa.table(
        {
            "bigram": pa.array(list(bg_bits.keys()), pa.string()),
            "bgb": pa.array(list(bg_bits.values()), pa.int64()),
        }
    )
    model_ref = ray.put((w1_tbl, bg_tbl, oov_bits))

    def score(batch: pa.Table) -> pa.Table:
        import polars as pl

        w1_t, bg_t, oov = ray.get(model_ref)
        n_rows = batch.num_rows
        o_n = np.zeros(n_rows, dtype=np.int64)
        o_s = np.zeros(n_rows, dtype=np.int64)
        if n_rows:
            pairs = _doc_bigrams(pl, batch.select(["text"]))
            if len(pairs):
                folded = (
                    pairs.join(pl.from_arrow(w1_t), on="w1", how="left")
                    .join(pl.from_arrow(bg_t), on="bigram", how="left")
                    .with_columns(
                        (
                            pl.col("w1b").fill_null(oov) - pl.col("bgb").fill_null(1)
                        ).alias("c")
                    )
                    .group_by("di")
                    .agg(pl.len().cast(pl.Int64).alias("nb"), pl.col("c").sum().alias("s"))
                )
                di = folded.get_column("di").to_numpy().astype(np.int64)
                o_n[di] = folded.get_column("nb").to_numpy()
                o_s[di] = folded.get_column("s").to_numpy()
        o_q = np.where(o_n > 0, o_s * 1000 // np.maximum(o_n, 1), 0)
        cols = {
            "doc_id": batch.column("doc_id"),
            "n_bigrams": pa.array(o_n, pa.int64()),
            "surprisal": pa.array(o_s, pa.int64()),
            "sbpb_x1000": pa.array(o_q.astype(np.int64), pa.int64()),
        }
        for c in extra_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return read_table(
        sf_dir, "documents", ["doc_id", "text", *extra_cols]
    ).map_batches(score, batch_format="pyarrow")


def lm_score_oracle_sql(train_source: str = LM_TRAIN_SOURCE) -> str:
    """DuckDB twin: identical tokenization, train counts, Laplace +1
    and ``length(bin(x))`` integer floor-log2 — value-exact for any
    corpus."""
    return f"""
        WITH toks AS (
          SELECT doc_id, source, string_split(text, ' ') AS toks
          FROM documents),
        bg AS (
          SELECT doc_id, source,
                 unnest(list_transform(range(1, len(toks)),
                                       i -> toks[i] || ' ' || toks[i+1])) AS bigram,
                 unnest(list_transform(range(1, len(toks)),
                                       i -> toks[i])) AS w1
          FROM toks),
        train_bg AS (
          SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
          FROM bg WHERE source = '{train_source}' GROUP BY 1),
        train_w1 AS (
          SELECT w1, CAST(SUM(n) AS BIGINT) AS n
          FROM (SELECT string_split(bigram, ' ')[1] AS w1, n FROM train_bg)
          GROUP BY 1),
        tot AS (
          SELECT COALESCE(CAST(SUM(n) AS BIGINT), 0) AS t FROM train_bg),
        scored AS (
          SELECT b.doc_id,
                 CAST(length(bin(COALESCE(tw.n, tot.t) + 1)) AS BIGINT)
                 - CAST(length(bin(COALESCE(tb.n, 0) + 1)) AS BIGINT) AS bits
          FROM bg b
          LEFT JOIN train_bg tb USING (bigram)
          LEFT JOIN train_w1 tw ON b.w1 = tw.w1, tot),
        agg AS (
          SELECT doc_id, CAST(SUM(bits) AS BIGINT) AS surprisal,
                 CAST(COUNT(*) AS BIGINT) AS n_bigrams
          FROM scored GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(a.n_bigrams, 0) AS n_bigrams,
               COALESCE(a.surprisal, 0) AS surprisal,
               CASE WHEN COALESCE(a.n_bigrams, 0) = 0 THEN 0
                    ELSE a.surprisal * 1000 // a.n_bigrams END AS sbpb_x1000
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """


# ---------------------------------------------------------------------------
# DSIR importance weights (data selection via importance resampling)
# ---------------------------------------------------------------------------

DSIR_N_FEATURES = 4096
DSIR_TARGET_SOURCE = LM_TRAIN_SOURCE  # the "target distribution" slice


def dsir_logweight(
    sf_dir: str,
    target_source: str = DSIR_TARGET_SOURCE,
    n_features: int = DSIR_N_FEATURES,
):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how much more likely its hashed n-gram features are under the
    TARGET distribution (the ``source == target_source`` slice — DSIR
    uses Wikipedia+books) than under the RAW corpus distribution.
    High ``logw_bits`` = target-like; resampling by this weight is the
    DSIR selection stage.

    Features are word bigrams hashed into ``n_features`` buckets with
    the oracle-shared identity ``md5_number_lower(bigram) %
    n_features`` (hashing IS the DSIR trick — it bounds the model at
    any corpus scale). Integer-exact log-likelihood ratio via
    bit-length logs (the ``lm_score`` rule): per feature occurrence

        bits = bitlen(c_tgt(f) + 1) - bitlen(c_raw(f) + 1)

    and per document

        logw_bits = sum(bits) + n_feats * (bitlen(N_raw + 1)
                                           - bitlen(N_tgt + 1))

    (the corpus-size normalizers are constant per occurrence, so they
    fold into one closed form — both engines evaluate it exactly).

    Physical plan: ONE combined counting pass (per-batch partial rows
    carry the target count and the raw count per feature — the target
    slice is a subset of the corpus, so one read covers both), one
    keyed exchange whose cardinality is ``n_features`` (never corpus-
    bounded), the two folded count vectors broadcast ONCE via
    ``ray.put`` as numpy arrays, then one stateless scoring pass.

    Output: ``(doc_id, n_feats, logw_bits)`` for every document."""
    import ray

    from wbot_ray.pipelines.common import md5_lower64

    def _doc_pairs(batch: pa.Table):
        """Shared vectorized bigram machinery: the per-position doc
        index and feature id of every in-document adjacent pair.
        Tokenize/window/concat run in polars; md5 runs once per DISTINCT
        batch bigram (vocab-bounded), joined back by hash."""
        import polars as pl

        pairs = _doc_bigrams(pl, batch.select(["text"]))
        if not len(pairs):
            return None
        ub = pairs.get_column("bigram").unique().to_list()
        fdf = pl.DataFrame(
            {
                "bigram": ub,
                "f": pl.Series(
                    [md5_lower64(b) % n_features for b in ub], dtype=pl.Int64
                ),
            }
        )
        withf = pairs.join(fdf, on="bigram", how="left")
        return (
            withf.get_column("di").to_numpy().astype(np.int64),
            withf.get_column("f").to_numpy().astype(np.int64),
        )

    def count_partial(batch: pa.Table) -> pa.Table:
        tgt = np.zeros(n_features, np.int64)
        raw = np.zeros(n_features, np.int64)
        got = _doc_pairs(batch)
        if got is not None:
            dpos, f_pos = got
            is_tgt = (
                pc.equal(batch.column("source"), target_source)
                .to_numpy(zero_copy_only=False)
                .astype(bool)
            )
            np.add.at(raw, f_pos, 1)
            np.add.at(tgt, f_pos[is_tgt[dpos]], 1)
        nz = np.nonzero(raw)[0]
        return pa.table(
            {
                "f": pa.array(nz, pa.int64()),
                "n_tgt": pa.array(tgt[nz], pa.int64()),
                "n_raw": pa.array(raw[nz], pa.int64()),
            }
        )

    rows = (
        read_table(sf_dir, "documents", ["source", "text"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("f")
        .aggregate(Sum("n_tgt", alias_name="n_tgt"), Sum("n_raw", alias_name="n_raw"))
        .take_all()
    )
    tgt = np.zeros(n_features, np.int64)
    raw = np.zeros(n_features, np.int64)
    for r in rows:
        tgt[int(r["f"])] = int(r["n_tgt"])
        raw[int(r["f"])] = int(r["n_raw"])
    n_tgt_total, n_raw_total = int(tgt.sum()), int(raw.sum())
    # exact integer floor-log2 of (count + 1), vectorized: counts are
    # < 2^53 so the float64 exponent is exact (np.frexp), matching
    # DuckDB length(bin(x)) and int.bit_length
    bits_tgt = np.frexp((tgt + 1).astype(np.float64))[1].astype(np.int64)
    bits_raw = np.frexp((raw + 1).astype(np.float64))[1].astype(np.int64)
    norm = (n_raw_total + 1).bit_length() - (n_tgt_total + 1).bit_length()
    model_ref = ray.put((bits_tgt - bits_raw, norm))

    def score(batch: pa.Table) -> pa.Table:
        diff, nrm = ray.get(model_ref)
        n_rows = batch.num_rows
        o_n = np.zeros(n_rows, dtype=np.int64)
        o_s = np.zeros(n_rows, dtype=np.int64)
        got = _doc_pairs(batch) if n_rows else None
        if got is not None:
            dpos, f_pos = got
            w = diff[f_pos]
            o_s = np.bincount(
                dpos, weights=w.astype(np.float64), minlength=n_rows
            ).astype(np.int64)
            o_n = np.bincount(dpos, minlength=n_rows).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_feats": pa.array(o_n, pa.int64()),
                "logw_bits": pa.array(o_s + o_n * nrm, pa.int64()),
            }
        )

    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def dsir_logweight_oracle_sql(
    target_source: str = DSIR_TARGET_SOURCE,
    n_features: int = DSIR_N_FEATURES,
) -> str:
    """DuckDB twin: identical tokenization, identical
    ``md5_number_lower % n_features`` feature hash, identical
    bit-length closed form."""
    return f"""
        WITH toks AS (
          SELECT doc_id, source, string_split(text, ' ') AS toks
          FROM documents),
        bg AS (
          SELECT doc_id, source,
                 unnest(list_transform(range(1, len(toks)),
                                       i -> toks[i] || ' ' || toks[i+1])) AS bigram
          FROM toks),
        f AS (
          SELECT doc_id, source,
                 CAST(md5_number_lower(bigram) % {n_features} AS BIGINT) AS f
          FROM bg),
        tgt AS (
          SELECT f, CAST(COUNT(*) AS BIGINT) AS n
          FROM f WHERE source = '{target_source}' GROUP BY f),
        raw AS (
          SELECT f, CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY f),
        consts AS (
          SELECT (SELECT COALESCE(SUM(n), 0) FROM tgt) AS nt,
                 (SELECT COALESCE(SUM(n), 0) FROM raw) AS nr),
        scored AS (
          SELECT ff.doc_id,
                 CAST(length(bin(COALESCE(t.n, 0) + 1)) AS BIGINT)
                 - CAST(length(bin(r.n + 1)) AS BIGINT) AS bits
          FROM f ff
          LEFT JOIN tgt t USING (f)
          JOIN raw r USING (f)),
        agg AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
                 CAST(SUM(bits) AS BIGINT) AS base
          FROM scored GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(a.n_feats, 0) AS n_feats,
               COALESCE(a.base, 0)
                 + COALESCE(a.n_feats, 0)
                   * (CAST(length(bin(c.nr + 1)) AS BIGINT)
                      - CAST(length(bin(c.nt + 1)) AS BIGINT)) AS logw_bits
        FROM documents d
        LEFT JOIN agg a USING (doc_id), consts c
    """


def ccnet_buckets(sf_dir: str, k: int = 3, train_source: str = LM_TRAIN_SOURCE):
    """The CCNet quality-bucket assignment — the pipeline's published
    output shape: every document labeled ``head`` / ``middle`` /
    ``tail`` by LM surprisal WITHIN its language (CCNet computes
    per-lang perplexity terciles over Wikipedia-trained KenLM; head =
    most fluent third). Composes :func:`lm_score` (bits-per-bigram,
    ``lang`` carried through the scoring pass — no join) with the
    exact-NTILE machinery of :func:`length_deciles`: one distributed
    range-partitioned sort on ``(lang, sbpb_x1000, doc_id)``, dense
    global ranks from block METADATA offsets, per-lang rank by
    contiguous-range subtraction, pure-integer SQL-NTILE bucket math.

    Output: ``(doc_id, lang, sbpb_x1000, bucket, label)`` with
    ``bucket`` the 1-based NTILE(k) index and ``label`` the CCNet name
    (bucket 1 = head, k = tail, anything between = middle)."""
    from wbot_ray.stages.order import assign_crawl_ord

    def part_counts(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("lang"))
        return pa.table(
            {"lang": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    counts_rows = (
        read_table(sf_dir, "documents", ["lang"])
        .map_batches(part_counts, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    lang_n = {r["lang"]: int(r["n"]) for r in counts_rows}
    lang_start, acc = {}, 0
    for lang in sorted(lang_n):  # ascending string order == the sort order
        lang_start[lang] = acc
        acc += lang_n[lang]

    scores = lm_score(sf_dir, train_source=train_source, extra_cols=("lang",))
    ranked, _ = assign_crawl_ord(
        scores.sort(["lang", "sbpb_x1000", "doc_id"]), 0
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        codes = pc.dictionary_encode(batch.column("lang")).combine_chunks()
        vals = codes.dictionary.to_pylist()
        idx = codes.indices.to_numpy()
        r = batch.column("crawl_ord").to_numpy() - np.array(
            [lang_start[v] for v in vals], dtype=np.int64
        )[idx]
        n = np.array([lang_n[v] for v in vals], dtype=np.int64)[idx]
        base, extra = n // k, n % k
        cut = extra * (base + 1)
        bucket = np.where(
            r < cut,
            r // (base + 1) + 1,
            extra + (r - cut) // np.maximum(base, 1) + 1,
        )
        label = np.where(
            bucket == 1, "head", np.where(bucket == k, "tail", "middle")
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "sbpb_x1000": batch.column("sbpb_x1000"),
                "bucket": pa.array(bucket, pa.int64()),
                "label": pa.array(label.tolist(), pa.string()),
            }
        )

    return ranked.map_batches(bucketize, batch_format="pyarrow")


def ccnet_buckets_oracle_sql(k: int = 3, train_source: str = LM_TRAIN_SOURCE) -> str:
    """DuckDB twin: the lm_score twin as a CTE, lang joined on, plain
    ``NTILE(k) OVER (PARTITION BY lang ORDER BY sbpb_x1000, doc_id)``."""
    lm = lm_score_oracle_sql(train_source)
    return f"""
        WITH lm AS ({lm}),
        j AS (
          SELECT lm.doc_id, d.lang, lm.sbpb_x1000,
                 CAST(NTILE({k}) OVER (
                   PARTITION BY d.lang ORDER BY lm.sbpb_x1000, lm.doc_id
                 ) AS BIGINT) AS bucket
          FROM lm JOIN documents d USING (doc_id))
        SELECT doc_id, lang, sbpb_x1000, bucket,
               CASE WHEN bucket = 1 THEN 'head'
                    WHEN bucket = {k} THEN 'tail'
                    ELSE 'middle' END AS label
        FROM j
    """


CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_sketch(sf_dir: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """Count-min sketch of the corpus token-OCCURRENCE frequencies —
    the mergeable fixed-memory structure a streaming pipeline ships
    instead of an unbounded token→count map (estimate(tok) =
    min over rows of cell[row][h_row(tok)], never an undercount).
    Output: the sketch itself as ``(row, cell, cnt)`` for every
    nonzero cell — ``depth × width`` int64s regardless of corpus or
    vocabulary size, and two shards' sketches merge by plain cell-wise
    ADDITION, which is exactly what the keyed exchange does here, so
    "build the sketch distributed" and "merge per-shard sketches" are
    the same operator.

    Ray shape: each batch folds its texts to DISTINCT tokens × counts
    (the Zipf combiner — md5 runs once per distinct token per batch,
    not per occurrence), computes the ``depth`` hash cells per token
    (``md5_number_lower('cms<row>:' || token) % width``, the engine/SQL
    shared identity), and emits one weighted-bincount partial sketch;
    the ``groupby((row, cell))`` exchange carries ≤ depth × width slim
    rows per batch. Every count is an exact integer — the DuckDB twin
    recomputes the identical sketch from the raw text."""
    from wbot_ray.pipelines.common import md5_lower64

    def part(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(
            pc.split_pattern(batch.column("text"), " ").combine_chunks().flatten()
        )
        words = vc.field("values").to_pylist()
        cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        out_row, out_cell, out_cnt = [], [], []
        for r in range(depth):
            cells = np.fromiter(
                (md5_lower64(f"cms{r}:{w}") % width for w in words),
                dtype=np.int64,
                count=len(words),
            )
            binc = np.bincount(cells, weights=cnts, minlength=width).astype(np.int64)
            nz = np.nonzero(binc)[0]
            out_row.append(np.full(len(nz), r, np.int64))
            out_cell.append(nz.astype(np.int64))
            out_cnt.append(binc[nz])
        return pa.table(
            {
                "row": pa.array(np.concatenate(out_row), pa.int64()),
                "cell": pa.array(np.concatenate(out_cell), pa.int64()),
                "cnt": pa.array(np.concatenate(out_cnt), pa.int64()),
            }
        )

    return (
        read_table(sf_dir, "documents", ["text"])
        .map_batches(part, batch_format="pyarrow")
        .groupby(["row", "cell"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def cms_sketch_oracle_sql(depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> str:
    """DuckDB twin: identical per-row cell hash, exact cell sums."""
    rows = "\n          UNION ALL\n          ".join(
        f"SELECT {r} AS row, CAST(md5_number_lower('cms{r}:' || term) % {width} AS BIGINT) AS cell FROM tok"
        for r in range(depth)
    )
    return f"""
        WITH tok AS (
          SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        cells AS (
          {rows})
        SELECT row, cell, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM cells GROUP BY row, cell
    """
