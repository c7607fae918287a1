"""Shared helpers for the data pipelines.

Everything here is deliberately boring: pruned parquet reads, a stable
64-bit string hash (used as the token identity for shingling /
minhash / jaccard — NOT Python's randomized ``hash``), and cents
conversion for exact (integer) money aggregation.

Design rule for oracle-checked float math: only *single* IEEE-754
operations (one division, one rounding) may produce a float column —
never multi-term float accumulation, whose result depends on summation
order and would differ between engines. Sums are computed on integers
(cents / integral quantities), which are exact and order-independent.
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pyarrow as pa
import ray.data

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on")


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Pruned parquet read: only the named columns leave storage."""
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def hash64(s: str) -> int:
    """Stable unsigned 64-bit hash of a string (blake2b-8). Stable across
    processes/nodes — the identity used by shingles and LSH buckets."""
    return struct.unpack("<Q", hashlib.blake2b(s.encode(), digest_size=8).digest())[0]


def token_hashes(text: str) -> np.ndarray:
    """Sorted distinct 64-bit hashes of the single-space tokens of ``text``."""
    toks = set(text.split(" "))
    return np.sort(np.fromiter((hash64(t) for t in toks), dtype=np.uint64, count=len(toks)))


def md5_lower64(s: str) -> int:
    """Unsigned 64-bit hash of a string defined as DuckDB's
    ``md5_number_lower(s)`` computes it — the LAST 8 bytes of the md5
    digest, little-endian. This (not blake2b) is the shingle identity for
    the oracle-checked sketches (minhash / simhash), so a DuckDB SQL
    oracle can recompute the exact same hashes."""
    return struct.unpack("<Q", hashlib.md5(s.encode()).digest()[8:])[0]


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Sorted distinct 64-bit hashes of the k-word shingles of ``text``.
    Shingles (not unigrams) are the MinHash/SimHash feature set: they keep
    unrelated documents dissimilar even over a small vocabulary.

    Hash = ``md5_lower64`` so a DuckDB oracle reproduces it verbatim:
    ``md5_number_lower(array_to_string(list_slice(string_split(text,' '),
    i, i+k-1), ' '))`` over distinct shingles."""
    toks = text.split(" ")
    if len(toks) < k:
        sh = {" ".join(toks)}
    else:
        sh = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    return np.sort(np.fromiter((md5_lower64(s) for s in sh), dtype=np.uint64, count=len(sh)))


# lazy per-worker-process DuckDB connection for the vectorized md5
# kernel — created once, reused by every batch the worker executes
_MD5_CON = None


def md5_lower64_batch(strings: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized ``md5_lower64`` over a whole string column via DuckDB's
    ``md5_number_lower`` C++ kernel — the exact function the SQL oracles
    use, so parity is by construction (pinned element-wise in tests).
    ~4x the per-string ``hashlib`` loop; order-preserving (plain
    projection, DuckDB preserves insertion order)."""
    global _MD5_CON
    import duckdb

    if _MD5_CON is None:
        _MD5_CON = duckdb.connect()
    tbl = pa.table({"s": strings})
    out = _MD5_CON.execute(
        "SELECT md5_number_lower(s) AS h FROM tbl"
    ).fetch_arrow_table()
    return out.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)


def batch_shingle_hashes(
    texts: pa.Array | pa.ChunkedArray, k: int = 3
) -> list[np.ndarray]:
    """Per-row sorted distinct k-shingle hash arrays for a whole batch —
    element-wise identical to ``[shingle_hashes(t, k) for t in texts]``
    but with no per-shingle Python anywhere: polars shift-window builds
    every in-document shingle string in Rust (the ``ngram_counts``
    kernel shape), Arrow ``dictionary_encode`` collapses the batch to
    its DISTINCT shingles, and ONE DuckDB ``md5_number_lower`` call
    hashes them all. Distinctness is per (doc, shingle-STRING) — two
    distinct strings that collide to one 64-bit value keep both rows,
    exactly like the ``set``-of-strings scalar path.

    This is the 100-TB fix for the dedup family's dominant per-byte
    cost: the scalar path paid one Python ``hashlib`` call per distinct
    shingle per doc; this pays one C++ hash per shingle row plus
    O(docs) numpy for the distinct+sort split. (Distinctness is applied
    per doc AFTER hashing via ``np.unique`` — it differs from the
    set-of-strings order only if two distinct shingles of ONE doc
    collide in md5-64, ~1e-15 per doc; the parity tests pin
    element-wise equality on real inputs.)"""
    import polars as pl
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if n == 0:
        return []
    df = pl.DataFrame({"text": pl.from_arrow(texts)}).with_row_index("di")
    ex = df.select(
        pl.col("di"), pl.col("text").str.split(" ").alias("w")
    ).explode("w")
    tok_counts = np.bincount(
        ex.get_column("di").to_numpy(), minlength=n
    )  # "".split(" ") == [""] — an empty doc still counts 1 token
    sh = (
        ex.with_columns(
            *[pl.col("w").shift(-j).alias(f"_t{j}") for j in range(1, k)],
            pl.col("di").shift(-(k - 1)).alias("_dn"),
        )
        .filter(pl.col("di") == pl.col("_dn"))
        .select(
            pl.col("di"),
            pl.concat_str(
                [pl.col("w"), *[pl.col(f"_t{j}") for j in range(1, k)]],
                separator=" ",
            ).alias("s"),
        )
    )
    # rows stay in (doc, position) order — explode/shift/filter are all
    # order-preserving — so the per-doc split needs no global sort
    rows = sh.to_arrow()
    di = rows.column("di").to_numpy(zero_copy_only=False)
    h_all = md5_lower64_batch(rows.column("s"))
    offs = np.concatenate(([0], np.cumsum(np.bincount(di, minlength=n))))
    # docs shorter than k tokens contribute their whole text as the one
    # shingle (``" ".join(toks) == text``), matching the scalar path
    short_idx = np.nonzero(tok_counts < k)[0]
    short_h = (
        md5_lower64_batch(pc.take(texts, pa.array(short_idx)))
        if short_idx.size
        else None
    )
    is_short = tok_counts < k
    out: list[np.ndarray] = []
    si = 0
    for i in range(n):
        if is_short[i]:
            out.append(short_h[si : si + 1])
            si += 1
        else:
            out.append(np.unique(h_all[offs[i] : offs[i + 1]]))
    return out


def cents(values: pa.ChunkedArray | pa.Array) -> pa.Array:
    """double dollars → exact int64 cents (round-half-away, matching
    DuckDB ``round()``; inputs carry exactly 2 decimals so the product
    is within 1e-9 of an integer and both roundings agree)."""
    v = np.asarray(values.to_numpy(zero_copy_only=False), dtype=np.float64)
    return pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64), pa.int64())
