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


def cents(values: pa.ChunkedArray | pa.Array) -> pa.Array:
    """double dollars → exact int64 cents (round-half-away, matching
    DuckDB ``round()``; inputs carry exactly 2 decimals so the product
    is within 1e-9 of an integer and both roundings agree)."""
    v = np.asarray(values.to_numpy(zero_copy_only=False), dtype=np.float64)
    return pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64), pa.int64())
