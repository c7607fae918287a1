"""Deduplication family over the ``documents`` table.

Five operators, each the Ray-Data-native shape of a standard web-scale
dedup technique:

* ``dedup_exact``    — md5(text) hash-partition + per-group first
                       (``groupby(fp).aggregate(min,count)``) — one shuffle
                       keyed by content hash.
* ``dedup_ngram``    — blocked exact n-gram Jaccard: candidate pairs
                       within bounded ``(lang, source, octave, min-md5)``
                       blocks, pairwise set overlap inside ``map_groups``.
                       Oracle-checked (identical blocking rule in SQL).
* ``dedup_minhash``  — shingle → 64-perm MinHash → banded LSH: one
                       signature pass materialized as a bounded sidecar,
                       SLIM (doc, band, band_hash) rows through the
                       ``groupby(band, band_hash)`` shuffle, candidate
                       pairs verified by two co-partitioned signature
                       joins with one vectorized estimate per group —
                       the 512-byte signature ships exactly twice, never
                       on the 8× band explosion, never token arrays.
* ``dedup_simhash``  — 64-bit SimHash, 4×16-bit band blocking, in-bucket
                       Hamming ≤ k verification.
* ``dedup_embed``    — embedding cosine near-dup via random-hyperplane
                       LSH buckets + in-bucket cosine verify on a
                       2^-20 integer grid (oracle-exact, see docstring).
* ``dup_clusters``   — connected components over the near-dup pair
                       graph (iterative min-label propagation), turning
                       pairwise hits into per-cluster survivor picks.

The pair operators emit ``(id_a, id_b)`` with ``id_a < id_b``,
deduplicated by a final ``groupby`` (a pair can surface from several
bands).
"""

from __future__ import annotations

import functools as _functools
import hashlib

import numpy as np
import pyarrow as pa
from ray.data.aggregate import Count, Min

from wbot_ray.pipelines.common import (
    batch_shingle_hashes,
    hash64,
    md5_lower64,
    read_table,
)

__all__ = [
    "dup_clusters",
    "dedup_keep",
    "dedup_segments",
    "dup_spans",
    "dup_spans_oracle_sql",
    "dedup_span_apply",
    "dedup_span_apply_oracle_sql",
    "dedup_exact",
    "dedup_ngram",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embed",
]

PAIR_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("sim_pm", pa.int64())]
)

# -- exact ---------------------------------------------------------------


def dedup_exact(sf_dir: str):
    """Exact dedup: one row per distinct text with the surviving doc_id
    (min) and the duplicate count. Shuffle key = content hash, so at
    scale each reducer owns disjoint fingerprints."""

    def fp(batch: pa.Table) -> pa.Table:
        md5s = [hashlib.md5(t.encode()).hexdigest() for t in batch.column("text").to_pylist()]
        return pa.table({"fp_md5": pa.array(md5s, pa.string()), "doc_id": batch.column("doc_id")})

    return (
        read_table(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(fp, batch_format="pyarrow")
        .groupby("fp_md5")
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="n_copies"))
    )


# -- shared pair helpers -------------------------------------------------


def _pairs_table(rows: list[tuple[int, int, int]]) -> pa.Table:
    if not rows:
        return PAIR_SCHEMA.empty_table()
    a, b, s = zip(*rows)
    return pa.table(
        {"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64()),
         "sim_pm": pa.array(s, pa.int64())},
        schema=PAIR_SCHEMA,
    )


def _capped_pair_indices(n: int, k: int | None) -> tuple[np.ndarray, np.ndarray]:
    """Pair index arrays for one LSH bucket of ``n`` (sorted) members
    under the star+first-k skew bound: full triu when ``n <= k``, else
    triu over the first ``k`` plus the star from member 0 to every
    member beyond rank k. O(k^2 + n), never O(n^2).

    ``k=None`` disables the cap (full recall, the library default —
    the skew bound trades recall for bounded work, so it is OPT-IN:
    the bench/gate harness passes an explicit cap, a library caller
    who didn't ask for one keeps e.g. simhash's unconditional
    pigeonhole recall guarantee)."""
    if k is None or n <= k:
        return np.triu_indices(n, k=1)
    iu, ju = np.triu_indices(k, k=1)
    return (
        np.concatenate([iu, np.zeros(n - k, dtype=iu.dtype)]),
        np.concatenate([ju, np.arange(k, n, dtype=ju.dtype)]),
    )


def _dedup_pairs(ds):
    """Collapse multi-band duplicates of the same pair (tiny groupby on
    the pair key). Unioned with a typed empty table so an all-empty
    result keeps the ``PAIR_SCHEMA`` columns (a schemaless empty Dataset
    would fail any downstream schema comparison)."""
    import ray.data as rd

    deduped = ds.groupby(["id_a", "id_b"]).aggregate(Min("sim_pm", alias_name="sim_pm"))
    return rd.from_arrow(PAIR_SCHEMA.empty_table()).union(deduped)


def _jaccard_pm(sa: np.ndarray, sb: np.ndarray) -> int:
    """Jaccard similarity in exact per-mille-of-2^20 integer form —
    (|∩| << 20) // |∪| — so thresholds compare exactly everywhere."""
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return (inter << 20) // union if union else 1 << 20


# -- n-gram jaccard (blocked exact) -------------------------------------


def dedup_ngram(sf_dir: str, threshold: float = 0.8):
    """Token-set Jaccard ≥ threshold with BOUNDED candidate blocks.

    Block key = ``(lang, source, token-count octave, min-md5 token)``:

    * **min-md5 token** (the lexicographic minimum of ``md5(token)`` over
      the doc's distinct tokens) is the recall rule: a pair is compared
      iff both docs agree on it. Under random hashing the probability two
      docs share their set-minimum equals their Jaccard similarity, so
      qualifying pairs (J ≥ 0.8) are found with P ≥ 0.8 — the standard
      1-permutation-MinHash blocking trade-off, and (unlike banded
      MinHash) expressible verbatim in SQL, so the DuckDB oracle applies
      the *identical* rule and both engines agree exactly.
    * **octave** (``bit_length`` of the distinct-token count; each doc is
      also emitted as a *guest* into the next octave, guest↔guest pairs
      skipped so no pair is produced twice) bounds the block when one
      min-token dominates. Provably lossless for the OUTPUT: J ≥ 0.8
      forces a size ratio ≤ 1.25 < 2, so every qualifying pair sits in
      the same or adjacent octave — the gate only prunes pairs that
      could never pass the threshold, which is why the oracle does not
      need to model it.

    The previous all-pairs-per-(lang, source) blocking was quadratic in
    the dominant block (≈ the whole corpus for an ``en``/``web`` crawl);
    this key keeps the biggest block ≈ docs-per-hot-min-token within one
    length octave."""
    thr_pm = int(threshold * (1 << 20))

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        srcs = batch.column("source").to_pylist()
        md5_cache: dict[str, str] = {}

        def min_md5(tokset: set[str]) -> str:
            best = None
            for t in tokset:
                h = md5_cache.get(t)
                if h is None:
                    h = md5_cache[t] = hashlib.md5(t.encode()).hexdigest()
                if best is None or h < best:
                    best = h
            return best or ""

        o_id, o_lang, o_src, o_lb, o_min, o_guest, o_tok = [], [], [], [], [], [], []
        for i, text in enumerate(batch.column("text").to_pylist()):
            tokset = set(text.split(" "))
            th = np.sort(
                np.fromiter((hash64(t) for t in tokset), dtype=np.uint64, count=len(tokset))
            )
            mm = min_md5(tokset)
            lb = len(tokset).bit_length()
            tl = th.tolist()
            for blk, guest in ((lb, False), (lb + 1, True)):
                o_id.append(ids[i])
                o_lang.append(langs[i])
                o_src.append(srcs[i])
                o_lb.append(blk)
                o_min.append(mm)
                o_guest.append(guest)
                o_tok.append(tl)
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "lang": pa.array(o_lang, pa.string()),
                "source": pa.array(o_src, pa.string()),
                "lb": pa.array(o_lb, pa.int32()),
                "min_md5": pa.array(o_min, pa.string()),
                "guest": pa.array(o_guest, pa.bool_()),
                "tokens": pa.array(o_tok, pa.list_(pa.uint64())),
            }
        )

    def block_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return PAIR_SCHEMA.empty_table()
        ids = group.column("doc_id").to_pylist()
        guests = group.column("guest").to_pylist()
        toks = [np.asarray(t, dtype=np.uint64) for t in group.column("tokens").to_pylist()]
        order = np.argsort(ids)
        rows = []
        for i in range(len(order)):
            for j in range(i + 1, len(order)):
                a, b = order[i], order[j]
                if guests[a] and guests[b]:
                    continue  # that pair already met in the lower octave
                pm = _jaccard_pm(toks[a], toks[b])
                if pm >= thr_pm:
                    rows.append((ids[a], ids[b], pm))
        return _pairs_table(rows)

    return (
        read_table(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["lang", "source", "lb", "min_md5"])
        .map_groups(block_pairs, batch_format="pyarrow")
    )


# -- minhash + LSH -------------------------------------------------------

N_PERM = 64
N_BANDS = 8  # 8 rows per band
MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne): products fit int64 AND BIGINT
_rng31 = np.random.RandomState(0xC0FFEE)
PERM_A = _rng31.randint(1, MINHASH_P, size=N_PERM).astype(np.int64)
PERM_B = _rng31.randint(0, MINHASH_P, size=N_PERM).astype(np.int64)



def band_hashes_batch(sigs: np.ndarray) -> np.ndarray:
    """(n_docs, N_PERM) signature matrix -> (n_docs, N_BANDS) uint64
    band bucket keys, fully vectorized (an FNV-style fold over each
    band's components). The key is BUCKET IDENTITY only: the oracle
    buckets on the exact component string (``string_agg(m, ',')``), so
    any deterministic, collision-negligible key yields the same groups
    — the per-band blake2b-of-joined-string this replaces was a per-doc
    Python loop, the last O(docs) Python in the minhash explode."""
    b = sigs.reshape(sigs.shape[0], N_BANDS, N_PERM // N_BANDS).astype(np.uint64)
    h = np.full(b.shape[:2], np.uint64(0xCBF29CE484222325), np.uint64)
    with np.errstate(over="ignore"):
        for j in range(b.shape[2]):
            h = (h ^ b[:, :, j]) * np.uint64(0x100000001B3)
            h ^= h >> np.uint64(29)
    return h


def _minhash_sig(tok: np.ndarray) -> np.ndarray:
    """64-perm MinHash over the shingle-hash set. The permutation family
    is the classic affine family mod the Mersenne prime 2^31-1:
    ``h_i(x) = (a_i * (x % P) + b_i) % P``. Both operands are < 2^31 so
    the product fits int64 — one vectorized (shingles × 64) op per doc —
    AND fits DuckDB BIGINT, so the SQL oracle (``oracle_sql()['
    dedup_minhash']``) recomputes the identical signatures from the same
    fixed (a_i, b_i) constants. Deterministic across processes/nodes."""
    if tok.size == 0:
        return np.full(N_PERM, MINHASH_P, dtype=np.int64)
    base = (tok % np.uint64(MINHASH_P)).astype(np.int64)
    z = (base[:, None] * PERM_A[None, :] + PERM_B[None, :]) % MINHASH_P  # (n, 64)
    return z.min(axis=0)


def dedup_minhash(
    sf_dir: str,
    threshold: float = 0.7,
    num_buckets: int = 64,
    small_verify_threshold: int = 200_000,
    max_bucket_docs: int | None = None,
):
    """MinHash-LSH near-dup pairs: shingle → sign once → slim band
    explode → bucket-groupby candidates → two co-partitioned signature
    joins → vectorized signature-estimated Jaccard ≥ threshold
    (matching components / 64).

    Exchange layout (the ``lshindex`` meta/payload split, applied to
    the batch pipeline): the band shuffle carries ONLY 20-byte
    ``(doc_id, band, band_hash)`` rows — the 512-byte 64-perm signature
    never rides the 8× band explosion. Signatures are materialized once
    as a bounded (520 B/doc) sidecar and shipped exactly TWICE, keyed
    by ``doc_id % num_buckets``, to resolve each candidate pair's two
    sides (a co-partitioned lookup join per side, the ``dedup_keep``
    union+groupby shape). Per-band duplicate candidates collapse inside
    the first join (all copies of a pair key on ``id_a``), so no extra
    dedup exchange exists. Net bytes through exchanges per doc:
    2 × 520 + 8 × 20 ≈ 1.2 KB vs the naive 8 × 520 ≈ 4.2 KB, plus slim
    pair rows (``minhash_exchange_stats`` measures the real totals).

    The estimator's std at J is sqrt(J(1-J)/64) ≤ 0.063, the standard
    at-scale trade; callers needing exact Jaccard re-verify the emitted
    candidate pairs with ``dedup_ngram``'s machinery on a second pass.

    ``small_verify_threshold``: below this many candidate rows the two
    signature joins finish DRIVER-side (collect the slim pairs, fetch
    only the wanted signatures, one vectorized estimate) — the
    distributed joins cost 2 × ~2 s fixed exchange latency on a small
    cluster, pure overhead when the candidate set is a few thousand
    rows. The exact analogue of the crawl driver's small-frontier
    merge; both paths are parity-pinned in tests. 0 forces the
    distributed path."""
    import ray.data as rd

    parts = _minhash_parts(
        sf_dir, threshold, num_buckets, small_verify_threshold, max_bucket_docs
    )
    return rd.from_arrow(PAIR_SCHEMA.empty_table()).union(parts["pairs"])


def _minhash_parts(
    sf_dir: str,
    threshold: float,
    num_buckets: int,
    small_verify_threshold: int = 0,
    max_bucket_docs: int | None = None,
    materialize_stages: bool = False,
) -> dict:
    """The dedup_minhash pipeline's stages, exposed so
    ``minhash_exchange_stats`` can count each exchange's rows."""
    thr_pm = int(threshold * (1 << 20))
    rows_per_band = N_PERM // N_BANDS

    def sign(batch: pa.Table) -> pa.Table:
        """One row per doc: the expensive shingle+minhash pass, run ONCE.
        Shingle hashing is the batched polars+DuckDB kernel (no
        per-shingle Python); only the slim per-doc perm-min remains a
        loop."""
        ids = batch.column("doc_id").to_pylist()
        sigs = [_minhash_sig(h).tolist() for h in batch_shingle_hashes(batch.column("text"))]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array(sigs, pa.list_(pa.int64())),
            }
        )

    # bounded sidecar (520 B/doc) consumed three times below — the one
    # deliberate materialization, same layout build_lsh_index persists
    sigs = (
        read_table(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(sign, batch_format="pyarrow")
        .materialize()
    )

    def explode(batch: pa.Table) -> pa.Table:
        """Slim LSH explode: (doc_id, band, band_hash) only — one
        vectorized band-hash fold over the whole batch."""
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sig_col = batch.column("sig")
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        sigs = sig_col.flatten().to_numpy(zero_copy_only=False).reshape(
            len(ids), N_PERM
        )
        bh = band_hashes_batch(sigs)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, N_BANDS), pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(N_BANDS, dtype=np.int32), len(ids)),
                    pa.int32(),
                ),
                "band_hash": pa.array(bh.ravel(), pa.uint64()),
            }
        )

    join_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("a", pa.int64()),
            ("b", pa.int64()),
            ("sig", pa.list_(pa.int64())),
            ("is_sig", pa.bool_()),
        ]
    )

    def bucket_cands(group: pa.Table) -> pa.Table:
        """Id pairs sharing this (band, band_hash) bucket, keyed by
        ``id_a % num_buckets`` for the sig_a join — vectorized triu.

        Skew bound (the mirror_hosts lesson applied to LSH): a bucket
        with more than ``max_bucket_docs`` members — in practice a
        mass-duplicated boilerplate cluster — emits the STAR from the
        min doc to every member plus the full triu over the
        ascending-first k members, never the O(n^2) all-pairs blowup.
        For the degenerate case that creates such buckets (identical
        or near-identical signatures) the star alone preserves
        ``dup_clusters``' connectivity (every member pairs with the
        min, which becomes the cluster label); heterogeneous pairs
        beyond rank k whose only witness bucket is this one are the
        documented recall envelope. The SQL twin applies the identical
        ``(rn_a <= k AND rn_b <= k) OR rn_a = 1`` rule."""
        if group.num_rows < 2:
            return join_schema.empty_table()
        ids = np.unique(group.column("doc_id").to_numpy(zero_copy_only=False))
        if ids.size < 2:
            return join_schema.empty_table()
        iu, ju = _capped_pair_indices(ids.size, max_bucket_docs)
        a, b = ids[iu], ids[ju]
        return pa.table(
            {
                "bucket": pa.array(a % num_buckets, pa.int64()),
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "sig": pa.nulls(len(a), pa.list_(pa.int64())),
                "is_sig": pa.array(np.zeros(len(a), dtype=bool), pa.bool_()),
            },
            schema=join_schema,
        )

    def tag_sigs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(ids % num_buckets, pa.int64()),
                "a": batch.column("doc_id"),
                "b": pa.nulls(batch.num_rows, pa.int64()),
                "sig": batch.column("sig"),
                "is_sig": pa.array(np.ones(batch.num_rows, dtype=bool), pa.bool_()),
            },
            schema=join_schema,
        )

    def _sig_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """Sorted doc ids + their (n, 64) signature matrix."""
        ids = t.column("a").to_numpy(zero_copy_only=False)
        mat = np.asarray(t.column("sig").to_pylist(), dtype=np.int64)
        order = np.argsort(ids)
        return ids[order], mat[order]

    def join_a(group: pa.Table) -> pa.Table:
        """Attach sig_a; per-band duplicate pairs collapse here (every
        copy of a pair has the same id_a, hence the same bucket)."""
        is_sig = group.column("is_sig").to_numpy(zero_copy_only=False)
        pairs = group.filter(pa.array(~is_sig))
        if pairs.num_rows == 0:
            return join_schema.empty_table()
        sid, smat = _sig_matrix(group.filter(pa.array(is_sig)))
        a = pairs.column("a").to_numpy(zero_copy_only=False)
        b = pairs.column("b").to_numpy(zero_copy_only=False)
        ab = np.unique(np.stack([a, b], axis=1), axis=0)
        a, b = ab[:, 0], ab[:, 1]
        sig_a = smat[np.searchsorted(sid, a)]
        return pa.table(
            {
                "bucket": pa.array(b % num_buckets, pa.int64()),
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "sig": pa.array(sig_a.tolist(), pa.list_(pa.int64())),
                "is_sig": pa.array(np.zeros(len(a), dtype=bool), pa.bool_()),
            },
            schema=join_schema,
        )

    def join_b_verify(group: pa.Table) -> pa.Table:
        """Attach sig_b and verify the whole group in one vectorized
        component-match count."""
        is_sig = group.column("is_sig").to_numpy(zero_copy_only=False)
        pairs = group.filter(pa.array(~is_sig))
        if pairs.num_rows == 0:
            return PAIR_SCHEMA.empty_table()
        sid, smat = _sig_matrix(group.filter(pa.array(is_sig)))
        a = pairs.column("a").to_numpy(zero_copy_only=False)
        b = pairs.column("b").to_numpy(zero_copy_only=False)
        sig_a = np.asarray(pairs.column("sig").to_pylist(), dtype=np.int64)
        sig_b = smat[np.searchsorted(sid, b)]
        est = np.count_nonzero(sig_a == sig_b, axis=1).astype(np.int64)
        pm = (est << 20) // N_PERM
        keep = pm >= thr_pm
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "sim_pm": pa.array(pm[keep], pa.int64()),
            },
            schema=PAIR_SCHEMA,
        )

    bands = sigs.map_batches(explode, batch_format="pyarrow")
    if materialize_stages:
        # stats path only: pin each stage so counting bands/cands/pairs
        # executes the chain ONCE, not once per .count() (ADVICE r3)
        bands = bands.materialize()
    cands = bands.groupby(["band", "band_hash"]).map_groups(
        bucket_cands, batch_format="pyarrow"
    )
    if materialize_stages:
        cands = cands.materialize()

    if small_verify_threshold > 0:
        # the groupby above is an all-to-all barrier anyway; holding its
        # slim (bucket, a, b) output to count it costs no extra exchange
        cands = cands.materialize()
        n_cand = cands.count()
        if n_cand <= small_verify_threshold:
            return {
                "sigs": sigs, "bands": bands, "cands": cands,
                "pairs": _small_verify(sigs, cands, thr_pm),
            }

    # every union input is MATERIALIZED before the union: any plan
    # containing a Sort (groupby is sort-based) runs with
    # preserve_order=True (ray plan.require_preserve_order), and an
    # order-preserving union BUFFERS its later inputs while waiting for
    # the earlier ones — under a tight object store the buffered side
    # starves the earlier side's tasks of store budget and the whole
    # pipeline LIVELOCKS (measured: 4 GB corpus vs 4 GB store — the
    # executor launched zero tasks for 20 min, zero spill requests,
    # union holding 858 MB in its input queue; with a 12 GB store the
    # identical chain finished in 205 s). With both union inputs
    # already in the store the union has no producer tasks to starve,
    # and each sort runs as a standalone bulk op. The tagged signature
    # table is built ONCE and reused by both joins (it was previously
    # computed twice).
    tagged = sigs.map_batches(tag_sigs, batch_format="pyarrow").materialize()
    cands_mat = cands if small_verify_threshold > 0 else cands.materialize()
    with_a = (
        cands_mat.union(tagged)
        .groupby("bucket")
        .map_groups(join_a, batch_format="pyarrow")
        .materialize()
    )
    pairs = (
        with_a.union(tagged)
        .groupby("bucket")
        .map_groups(join_b_verify, batch_format="pyarrow")
    )
    return {"sigs": sigs, "bands": bands, "cands": cands, "pairs": pairs}


def _small_verify(sigs, cands, thr_pm: int):
    """Driver-side finish of the candidate verify (small path): collect
    the bounded slim pair rows, pull ONLY the wanted signatures (pruned
    inside map_batches against a broadcast sorted id array — the corpus
    sidecar is never collected whole), estimate all pairs in one
    vectorized pass."""
    import ray.data as rd

    tbl = pa.concat_tables(
        [b.select(["a", "b"]) for b in cands.iter_batches(batch_format="pyarrow")]
        or [pa.schema([("a", pa.int64()), ("b", pa.int64())]).empty_table()]
    )
    if tbl.num_rows == 0:
        return rd.from_arrow(PAIR_SCHEMA.empty_table())
    ab = np.unique(
        np.stack(
            [
                tbl.column("a").to_numpy(zero_copy_only=False),
                tbl.column("b").to_numpy(zero_copy_only=False),
            ],
            axis=1,
        ),
        axis=0,
    )
    wanted = np.unique(ab)  # sorted

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(wanted, ids)
        pos[pos == len(wanted)] = 0
        return batch.filter(pa.array(wanted[pos] == ids))

    sid_list, smat_list = [], []
    for b in sigs.map_batches(pick, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            sid_list.append(b.column("doc_id").to_numpy(zero_copy_only=False))
            smat_list.append(np.asarray(b.column("sig").to_pylist(), dtype=np.int64))
    sid = np.concatenate(sid_list)
    smat = np.concatenate(smat_list, axis=0)
    order = np.argsort(sid)
    sid, smat = sid[order], smat[order]
    sig_a = smat[np.searchsorted(sid, ab[:, 0])]
    sig_b = smat[np.searchsorted(sid, ab[:, 1])]
    est = np.count_nonzero(sig_a == sig_b, axis=1).astype(np.int64)
    pm = (est << 20) // N_PERM
    keep = pm >= thr_pm
    return rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array(ab[keep, 0], pa.int64()),
                "id_b": pa.array(ab[keep, 1], pa.int64()),
                "sim_pm": pa.array(pm[keep], pa.int64()),
            },
            schema=PAIR_SCHEMA,
        )
    )


# measured by minhash_exchange_stats (driver-side, like LAST_PRUNE_STATS)
LAST_MINHASH_STATS: dict = {}


def minhash_exchange_stats(
    sf_dir: str,
    threshold: float = 0.7,
    num_buckets: int = 64,
    max_bucket_docs: int | None = 1024,
) -> dict:
    """Measure the bytes each dedup_minhash exchange carries (the
    round-2 verdict's 'log it' ask): runs the staged pipeline counting
    every intermediate, models per-row wire sizes, and compares against
    the naive sig-rides-every-band layout this round replaced.

    Each stage is materialized before counting so the chain executes
    ONCE (counting lazy datasets re-ran the signature pass ~3x —
    ADVICE r3), and ``capped_buckets`` counts the LSH buckets whose
    membership exceeds ``max_bucket_docs`` — the observable for when
    the star+first-k recall envelope engages."""
    parts = _minhash_parts(
        sf_dir,
        threshold,
        num_buckets,
        max_bucket_docs=max_bucket_docs,
        materialize_stages=True,
    )
    n_docs = parts["sigs"].count()
    n_band_rows = parts["bands"].count()
    n_cand_rows = parts["cands"].count()
    n_pairs = parts["pairs"].count()

    def _bucket_sizes(batch: pa.Table) -> pa.Table:
        # per-block partial: rows per (band, band_hash) — each doc has
        # exactly ONE row per (band, bucket) globally, so per-block row
        # counts sum to the exact distinct-doc bucket size
        band = batch.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        bh = (
            batch.column("band_hash")
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
            .view(np.int64)  # int64 view: same distinctness, Arrow-safe
        )
        key = np.stack([band, bh], axis=1)
        uk, counts = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "band": pa.array(uk[:, 0], pa.int64()),
                "bh": pa.array(uk[:, 1], pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    cap = max_bucket_docs if max_bucket_docs is not None else 1 << 62
    sizes = (
        parts["bands"]
        .map_batches(_bucket_sizes, batch_format="pyarrow")
        .groupby(["band", "bh"])
        .sum("n")
    )
    n_capped = sizes.map_batches(
        lambda t: pa.table(
            {
                "c": pa.array(
                    [int((t.column("sum(n)").to_numpy(zero_copy_only=False) > cap).sum())],
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    ).sum("c")
    sig_b = 8 * N_PERM + 8  # list<int64> payload + id
    band_b = 8 + 4 + 8
    pair_b = 8 + 8 + 8
    new_bytes = (
        n_band_rows * band_b  # exchange 1: slim bands
        + n_cand_rows * pair_b  # candidate pair rows into join_a
        + 2 * n_docs * sig_b  # sig sidecar shipped twice
        + n_cand_rows * (pair_b + sig_b)  # pairs+sig_a into join_b (upper bound)
    )
    old_bytes = n_band_rows * (band_b + 8 * N_PERM)  # sig rode every band row
    LAST_MINHASH_STATS.update(
        {
            "n_docs": n_docs,
            "band_rows": n_band_rows,
            "candidate_rows": n_cand_rows,
            "emitted_pairs": n_pairs,
            "exchange_bytes_new": int(new_bytes),
            "exchange_bytes_old_layout": int(old_bytes),
            "reduction_x": round(old_bytes / max(new_bytes, 1), 2),
            "max_bucket_docs": max_bucket_docs,
            "capped_buckets": int(n_capped or 0),
        }
    )
    print(f"[dedup_minhash] exchange bytes {new_bytes} vs naive {old_bytes} "
          f"({LAST_MINHASH_STATS['reduction_x']}x cut; {n_docs} docs, "
          f"{n_cand_rows} candidates, {n_pairs} pairs; "
          f"{LAST_MINHASH_STATS['capped_buckets']} bucket(s) over cap)")
    return dict(LAST_MINHASH_STATS)


# -- simhash -------------------------------------------------------------


def _simhash64(tok: np.ndarray) -> int:
    """Classic 64-bit SimHash over token hashes (unweighted)."""
    if tok.size == 0:
        return 0
    bits = ((tok[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def dedup_simhash(sf_dir: str, max_hamming: int = 3, max_bucket_docs: int | None = None):
    """SimHash near-dup: 4×16-bit band blocking guarantees recall for
    Hamming ≤ 3 (pigeonhole), in-bucket exact Hamming verify
    (vectorized XOR+popcount over the whole bucket at once).

    Shingle hash = DuckDB's ``md5_number_lower`` and the bit rule is a
    strict-majority vote, so the SQL oracle recomputes the identical
    64-bit signatures bit by bit — the emitted pairs are value-exact
    against ``oracle_sql()['dedup_simhash']``.

    ``max_bucket_docs``: hot-bucket bound (the dedup_minhash star+
    first-k envelope, same rule in the SQL twin) — a mass-duplicated
    cluster shares all four 16-bit bands, so an uncapped bucket would
    be O(n^2) pairs in one task. The pigeonhole recall guarantee
    applies in full among the first k of a bucket and through the star
    witness; identical-signature clusters stay fully connected."""

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sigs = np.fromiter(
            (_simhash64(hs) for hs in batch_shingle_hashes(batch.column("text"))),
            dtype=np.uint64,
            count=len(ids),
        )
        n = len(ids)
        keys = (
            (sigs[:, None] >> (np.uint64(16) * np.arange(4, dtype=np.uint64)))
            & np.uint64(0xFFFF)
        ).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(4, dtype=np.int32), n), pa.int32()
                ),
                "band_key": pa.array(keys.ravel(), pa.int32()),
                "sig": pa.array(np.repeat(sigs, 4), pa.uint64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return PAIR_SCHEMA.empty_table()
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        sigs = group.column("sig").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids)
        ids, sigs = ids[order], sigs[order]
        iu, ju = _capped_pair_indices(ids.size, max_bucket_docs)
        x = np.ascontiguousarray(sigs[iu] ^ sigs[ju])
        ham = (
            np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1)
            .sum(axis=1)
            .astype(np.int64)
        )
        keep = ham <= max_hamming
        return pa.table(
            {
                "id_a": pa.array(ids[iu][keep], pa.int64()),
                "id_b": pa.array(ids[ju][keep], pa.int64()),
                "sim_pm": pa.array(ham[keep], pa.int64()),
            },
            schema=PAIR_SCHEMA,
        )

    pairs = (
        read_table(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(sig_rows, batch_format="pyarrow")
        .groupby(["band", "band_key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    return _dedup_pairs(pairs)


# -- embedding cosine near-dup ------------------------------------------

_N_PLANES = 12  # 2^12 buckets per table
_N_TABLES = 4
EMBED_QUANT = 1 << 20  # per-component integer grid: q_i = floor(x_i * 2^20)


@_functools.lru_cache(maxsize=8)
def _embed_planes(dim: int, n_tables: int = _N_TABLES, n_planes: int = _N_PLANES) -> np.ndarray:
    """±1 (Rademacher) hyperplanes derived bit-by-bit from md5 — the SQL
    oracle recomputes the identical coefficients with
    ``md5_number_lower('hp:'||t||':'||j||':'||i) & 1`` (i is 1-based to
    match ``generate_series``), so both engines agree on every bucket."""
    keys = [
        f"hp:{t}:{j}:{i + 1}"
        for t in range(n_tables)
        for j in range(n_planes)
        for i in range(dim)
    ]
    bits = np.fromiter((md5_lower64(k) & 1 for k in keys), dtype=np.int64, count=len(keys))
    return (2 * bits - 1).reshape(n_tables, n_planes, dim)


def dedup_embed(
    sf_dir: str,
    threshold: float = 0.92,
    max_bucket_docs: int | None = None,
    n_tables: int = _N_TABLES,
    n_planes: int = _N_PLANES,
):
    """Embedding-cosine near-dup via random-hyperplane LSH: ``_N_TABLES``
    independent sign-bucket tables, cosine verify in-bucket.

    Every value the operator computes is a deterministic function of
    integers so the DuckDB oracle (``oracle_sql()['dedup_embed']``)
    reproduces it bit-for-bit:

    * components are quantized ``q_i = floor(x_i * 2^20)`` (one
      correctly-rounded multiply + floor — identical in numpy and SQL);
    * bucket bits are signs of **exact integer** dot products against
      md5-derived ±1 hyperplanes;
    * the verify cosine is computed on the quantized vectors via the
      fixed expression tree ``dot / (sqrt(na) * sqrt(nb))`` then
      ``floor(sim * 2^20)`` — integer inputs < 2^53 and only correctly
      rounded IEEE-754 ops (sqrt, *, /, *2^20, floor), so both engines
      produce the same ``sim_pm``. Quantization shifts each cosine by
      < 2^-18 versus the raw floats — that grid IS the operator's
      documented semantics.

    The shuffle carries the int32 quantized vector (256 B/doc/table),
    never raw float embeddings. ``max_bucket_docs`` applies the
    star+first-k hot-bucket envelope (same rule in the SQL twin) — a
    mass-duplicated embedding cluster fills a sign bucket in all
    ``_N_TABLES`` tables and would otherwise be O(n^2) in one task."""
    thr_pm = int(threshold * (1 << 20))

    def bucket_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        vecs = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        q = np.floor(vecs * float(EMBED_QUANT)).astype(np.int64)
        planes = _embed_planes(q.shape[1], n_tables, n_planes)
        out_id, out_tab, out_key, out_vec = [], [], [], []
        ql = q.astype(np.int32).tolist()
        for t in range(n_tables):
            signs = (q @ planes[t].T) > 0  # exact int64 dots, (n, planes)
            keys = (signs.astype(np.int64) << np.arange(n_planes, dtype=np.int64)).sum(axis=1)
            out_id.extend(ids.tolist())
            out_tab.extend([t] * len(ids))
            out_key.extend(keys.tolist())
            out_vec.extend(ql)
        return pa.table(
            {
                "vec_id": pa.array(out_id, pa.int64()),
                "tab": pa.array(out_tab, pa.int32()),
                "bkey": pa.array(out_key, pa.int64()),
                "q": pa.array(out_vec, pa.list_(pa.int32())),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return PAIR_SCHEMA.empty_table()
        ids = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
        q = np.asarray(group.column("q").to_pylist(), dtype=np.int64)
        order = np.argsort(ids)
        ids, q = ids[order], q[order]
        iu, ju = _capped_pair_indices(ids.size, max_bucket_docs)
        dots = q @ q.T  # exact: |q_i| <= 2^21, dim <= 2^10 → < 2^53
        s = np.sqrt(np.diag(dots).astype(np.float64))
        # same fixed IEEE expression tree as the scalar loop / oracle:
        # floor((dot / (s_a * s_b)) * 2^20), elementwise
        sa, sb = s[iu], s[ju]
        nonzero = (sa != 0.0) & (sb != 0.0)  # zero vector: never a dup
        d = dots[iu, ju].astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            pm = np.floor((d / (sa * sb)) * float(1 << 20)).astype(
                np.int64, copy=False, casting="unsafe"
            )
        keep = nonzero & (pm >= thr_pm)
        return pa.table(
            {
                "id_a": pa.array(ids[iu][keep], pa.int64()),
                "id_b": pa.array(ids[ju][keep], pa.int64()),
                "sim_pm": pa.array(pm[keep], pa.int64()),
            },
            schema=PAIR_SCHEMA,
        )

    pairs = (
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(bucket_rows, batch_format="pyarrow")
        .groupby(["tab", "bkey"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    return _dedup_pairs(pairs)


# -- dup clusters (connected components over the near-dup pair graph) ----


def dup_clusters(
    sf_dir: str,
    threshold: float = 0.7,
    max_rounds: int = 16,
    pairs=None,
    num_buckets: int = 32,
    local_threshold: int = 100_000,
    max_bucket_docs: int | None = None,
):
    """Connected components over the ``dedup_minhash`` pair graph:
    ``(doc_id, cluster_id)`` where ``cluster_id`` is the MINIMUM doc_id
    in the component — the canonical "pick one survivor per duplicate
    cluster" step that turns pairwise near-dup hits into keep/drop
    decisions. Only docs that appear in at least one pair are emitted
    (every other doc is trivially its own singleton).

    Ray-Data-native min-label propagation (the standard MapReduce CC),
    with the same FUSED bucketed round as ``graph.link_pagerank``:

    * the symmetric edge list is materialized ONCE with node / neighbor
      co-location buckets (it is the dup graph — ~pairs×2 rows, small
      relative to the corpus even at 50% dup rates, and never grows);
    * each round is ONE keyed exchange: a ``groupby(bucket).map_groups``
      task folds the node's incoming label messages (Arrow in-group
      min), joins the fresh labels to the bucket's out-edges (Arrow
      hash join) and emits next-round messages keyed by the neighbor's
      bucket — fold and fan-out never split into separate shuffles, and
      groups are per BUCKET, not per node, so group count scales with
      the cluster. O(log diameter) rounds, and near-dup components are
      star-shaped in practice (1–2 rounds);
    * labels only ever DECREASE, so convergence is detected by the
      (exact, integer) sum of the per-node self-messages going
      unchanged — one tiny per-block aggregate per round, no
      old-vs-new join.

    The per-round label values follow the identical recurrence as the
    textbook fanout/fold split (``lbl_k(n) = min(lbl_{k-1}(n),
    min_{m∈N(n)} lbl_{k-1}(m))``), and the fixpoint (min id per
    component) is unique, so the DuckDB oracle (a recursive-CTE
    transitive closure over the same SQL-recomputed pair set) agrees
    exactly regardless of iteration strategy."""
    import pyarrow.compute as pc
    import ray.data as rd

    out_schema = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").combine_chunks()
        b = batch.column("id_b").combine_chunks()
        node = pa.chunked_array([a, b]).combine_chunks()
        nbr = pa.chunked_array([b, a]).combine_chunks()
        n = len(node)
        return pa.table(
            {
                "bucket": _bucket_col(node, num_buckets),
                "node": node,
                "nbr": nbr,
                "nbr_bucket": _bucket_col(nbr, num_buckets),
                "lbl": pa.nulls(n, pa.int64()),
                "is_self": pa.array([False] * n, pa.bool_()),
            }
        )

    def _msg_rows(bucket, node, lbl, is_self: bool) -> pa.Table:
        n = len(node)
        return pa.table(
            {
                "bucket": bucket,
                "node": node,
                "nbr": pa.nulls(n, pa.int64()),
                "nbr_bucket": pa.nulls(n, pa.int64()),
                "lbl": lbl,
                "is_self": pa.array([is_self] * n, pa.bool_()),
            }
        )

    # ``pairs`` overrides the edge source: any Dataset of (id_a, id_b)
    # rows can be clustered (e.g. dedup_embed output, or a test graph)
    src = (
        pairs
        if pairs is not None
        else dedup_minhash(sf_dir, threshold, max_bucket_docs=max_bucket_docs)
    )
    pairs_mat = src.select_columns(["id_a", "id_b"]).materialize()
    n_pairs = pairs_mat.count()
    if n_pairs == 0:
        return rd.from_arrow(out_schema.empty_table())
    # local tiny-graph shortcut (the host_components scheduler choice):
    # near-dup pair graphs are tiny relative to the corpus — below the
    # threshold an exact driver-side union-find beats max_rounds keyed
    # exchanges at ~2 s fixed latency each; identical output contract,
    # distributed-path parity pytest-pinned
    if n_pairs <= local_threshold:
        import ray

        tbls = [t for t in ray.get(pairs_mat.to_arrow_refs()) if t.num_rows]
        return rd.from_arrow(_clusters_local(pa.concat_tables(tbls), out_schema))
    edges = pairs_mat.map_batches(sym, batch_format="pyarrow").materialize()

    # initial self-messages lbl = node (per-batch dupes across blocks are
    # harmless: round 1 folds them away before any sum is taken)
    msgs = edges.map_batches(
        lambda t: _msg_rows(t.column("bucket"), t.column("node"), t.column("node"), True),
        batch_format="pyarrow",
    )

    def fused_round(group: pa.Table) -> pa.Table:
        is_edge = pc.is_valid(group.column("nbr"))
        e = group.filter(is_edge)
        m = group.filter(pc.invert(is_edge))
        f = (
            m.select(["node", "bucket", "lbl"])
            .group_by(["node", "bucket"])
            .aggregate([("lbl", "min")])
        )
        out = [_msg_rows(f.column("bucket"), f.column("node"), f.column("lbl_min"), True)]
        if e.num_rows:
            j = e.select(["node", "nbr", "nbr_bucket"]).join(
                f.select(["node", "lbl_min"]), keys="node", join_type="inner"
            )
            out.append(
                _msg_rows(j.column("nbr_bucket"), j.column("nbr"), j.column("lbl_min"), False)
            )
        return pa.concat_tables(out)

    def self_sum(t: pa.Table) -> pa.Table:
        v = pc.sum(t.filter(t.column("is_self")).column("lbl")).as_py()
        return pa.table({"s": pa.array([v if v is not None else 0], pa.int64())})

    prev_sum = None
    for _ in range(max_rounds):
        out = (
            edges.union(msgs)
            .groupby("bucket")
            .map_groups(fused_round, batch_format="pyarrow")
            .materialize()
        )
        msgs = out
        s = out.map_batches(self_sum, batch_format="pyarrow").sum("s")
        if s == prev_sum:
            break
        prev_sum = s

    return msgs.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.filter(t.column("is_self")).column("node"),
                "cluster_id": t.filter(t.column("is_self")).column("lbl"),
            },
            schema=out_schema,
        ),
        batch_format="pyarrow",
    )


def _clusters_local(pairs: pa.Table, out_schema: pa.schema) -> pa.Table:
    """Driver-side exact union-find over a small (id_a, id_b) pair
    table — same semantics as the distributed min-label propagation:
    one row per node of the pair graph, ``cluster_id`` = min doc_id of
    its component."""
    a = pairs.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64).tolist()
    b = pairs.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64).tolist()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for n in a + b:
        parent.setdefault(n, n)
    for x, y in zip(a, b):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[rx] = ry
    groups: dict[int, list[int]] = {}
    for n in parent:
        groups.setdefault(find(n), []).append(n)
    ids, labels = [], []
    for members in groups.values():
        rep = min(members)
        for m in members:
            ids.append(m)
            labels.append(rep)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "cluster_id": pa.array(labels, pa.int64()),
        },
        schema=out_schema,
    )


def _bucket_col(ids, num_buckets: int) -> pa.Array:
    """Co-location bucket of non-negative int64 ids."""
    v = np.asarray(ids.to_numpy(zero_copy_only=False), dtype=np.int64)
    return pa.array(v % num_buckets, pa.int64())


def dedup_keep(
    sf_dir: str,
    threshold: float = 0.7,
    num_buckets: int = 32,
    max_bucket_docs: int | None = None,
):
    """The corpus AFTER near-dedup is applied: every cluster's canonical
    member (min doc_id) plus every singleton survives; non-canonical
    cluster members drop. This is the step that turns ``dup_clusters``'
    labels into the clean training corpus.

    Ray shape — hash-partitioned ANTI-JOIN: the drop list (non-canonical
    members) is small relative to the corpus but unbounded, so it is NOT
    broadcast; both sides are co-partitioned on ``doc_id % num_buckets``
    and one ``map_groups`` task per bucket filters with a vectorized
    sorted-membership probe. Exactly one keyed exchange, carrying slim
    metadata rows — at 100 TB the text column rides the same exchange
    (or is re-joined by id from the bucketed corpus layout) and the
    bucket count scales with the cluster, not the corpus."""
    import pyarrow.compute as pc

    corpus = read_table(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    clusters = dup_clusters(sf_dir, threshold, max_bucket_docs=max_bucket_docs)

    def to_drops(t: pa.Table) -> pa.Table:
        d = t.filter(pc.not_equal(t.column("doc_id"), t.column("cluster_id")))
        ids = d.column("doc_id")
        return pa.table(
            {
                "bucket": _bucket_col(ids, num_buckets),
                "doc_id": ids,
                "lang": pa.nulls(d.num_rows, pa.string()),
                "n_chars": pa.nulls(d.num_rows, pa.int64()),
                "drop": pa.array([True] * d.num_rows, pa.bool_()),
            }
        )

    # materialize the (tiny) drop list ONCE: .count() executes the whole
    # dup_clusters pipeline, and without the materialize the union below
    # would re-execute every propagation round a second time
    drops = clusters.map_batches(to_drops, batch_format="pyarrow").materialize()
    if drops.count() == 0:
        return corpus  # no duplicates anywhere — the corpus IS the output

    def tag_corpus(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        return pa.table(
            {
                "bucket": _bucket_col(ids, num_buckets),
                "doc_id": ids,
                "lang": t.column("lang"),
                "n_chars": t.column("n_chars"),
                "drop": pa.array([False] * t.num_rows, pa.bool_()),
            }
        )

    def anti(group: pa.Table) -> pa.Table:
        is_drop = group.column("drop")
        d_ids = np.sort(
            group.filter(is_drop).column("doc_id").to_numpy(zero_copy_only=False)
        )
        c = group.filter(pc.invert(is_drop))
        ids = c.column("doc_id").to_numpy(zero_copy_only=False)
        if len(d_ids):
            pos = np.searchsorted(d_ids, ids)
            pos[pos == len(d_ids)] = 0
            member = d_ids[pos] == ids
        else:
            member = np.zeros(len(ids), dtype=bool)
        return c.filter(pa.array(~member)).select(["doc_id", "lang", "n_chars"])

    # drops (already materialized) goes FIRST in the union: with a Sort
    # downstream the union preserves input order, and a materialized
    # first input drains instantly so the streaming corpus side is
    # never buffered behind it (the union-under-sort livelock rule —
    # see _minhash_parts)
    return (
        drops.union(corpus.map_batches(tag_corpus, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(anti, batch_format="pyarrow")
    )


# -- segment-level exact dedup (duplicated-chunk removal) -----------------

SEG_WORDS = 16  # segment = 16 consecutive single-space tokens


def dedup_segments(sf_dir: str, seg_words: int = SEG_WORDS, num_buckets: int = 64):
    """Corpus-wide duplicated-SEGMENT removal (the line-dedup step of
    CCNet/RefinedWeb-style pipelines, adapted to this corpus's
    single-line documents): each document's token stream is cut into
    consecutive ``seg_words``-token segments, every segment occurrence
    whose exact text appeared earlier anywhere in the corpus (first =
    lexicographically smallest ``(doc_id, seg_idx)``) is dropped, and
    the document is rebuilt from its surviving segments.

    Identity = md5 of the segment text (128-bit — collision-free at any
    realistic corpus size; both engines compare md5, so the rule is
    identical even in principle). Output per doc: ``text_clean`` (may
    be ``''`` if everything was duplicated), ``n_segs``, ``n_dropped``.

    Ray shape — two keyed exchanges, both slim:

    1. explode → ``(hash-bucket, h0, h1, doc_id, seg_idx)`` 36-byte rows
       (never segment text), ``groupby(hb)`` → one vectorized
       first-occurrence pass per bucket emits the DROP coordinates;
    2. drops + corpus co-partitioned on ``doc_id % num_buckets``
       (the ``dedup_keep`` anti-join pattern) → one task per bucket
       rebuilds its documents. Untouched documents take a fast path
       (``text_clean = text`` — a segment join is the identity on the
       original token stream).

    Both bucket counts scale with the cluster, not the corpus.
    """
    import struct

    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_hb, o_h0, o_h1, o_id, o_ix = [], [], [], [], []
        for did, txt in zip(ids, texts):
            toks = txt.split(" ")
            nseg = -(-len(toks) // seg_words)  # ceil; len >= 1 always
            for i in range(nseg):
                seg = " ".join(toks[i * seg_words : (i + 1) * seg_words])
                dg = hashlib.md5(seg.encode()).digest()
                h0u, h1 = struct.unpack("<Qq", dg)
                o_hb.append(h0u % num_buckets)
                o_h0.append(h0u - (1 << 64) if h0u >= 1 << 63 else h0u)
                o_h1.append(h1)
                o_id.append(did)
                o_ix.append(i + 1)  # 1-based, matches SQL list indexing
        return pa.table(
            {
                "hb": pa.array(o_hb, pa.int64()),
                "h0": pa.array(o_h0, pa.int64()),
                "h1": pa.array(o_h1, pa.int64()),
                "doc_id": pa.array(o_id, pa.int64()),
                "seg_idx": pa.array(o_ix, pa.int64()),
            }
        )

    def to_drops(group: pa.Table) -> pa.Table:
        h0 = group.column("h0").to_numpy(zero_copy_only=False)
        h1 = group.column("h1").to_numpy(zero_copy_only=False)
        did = group.column("doc_id").to_numpy(zero_copy_only=False)
        six = group.column("seg_idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((six, did, h1, h0))
        h0s, h1s = h0[order], h1[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (h0s[1:] != h0s[:-1]) | (h1s[1:] != h1s[:-1])
        drop = order[~first]
        return pa.table(
            {
                "doc_id": pa.array(did[drop], pa.int64()),
                "seg_idx": pa.array(six[drop], pa.int64()),
            }
        )

    drops = (
        read_table(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(to_drops, batch_format="pyarrow")
    )

    def tag_drops(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        return pa.table(
            {
                "bucket": _bucket_col(ids, num_buckets),
                "doc_id": ids,
                "text": pa.nulls(t.num_rows, pa.string()),
                "seg_idx": t.column("seg_idx"),
            }
        )

    def tag_corpus(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        return pa.table(
            {
                "bucket": _bucket_col(ids, num_buckets),
                "doc_id": ids,
                "text": t.column("text"),
                "seg_idx": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text_clean", pa.string()),
            ("n_segs", pa.int64()),
            ("n_dropped", pa.int64()),
        ]
    )

    def rebuild(group: pa.Table) -> pa.Table:
        is_doc = pc.invert(pc.is_null(group.column("text")))
        d = group.filter(pc.invert(is_doc))
        dropped: dict[int, set[int]] = {}
        for did, six in zip(
            d.column("doc_id").to_pylist(), d.column("seg_idx").to_pylist()
        ):
            dropped.setdefault(did, set()).add(six)
        docs = group.filter(is_doc)
        o_id, o_txt, o_ns, o_nd = [], [], [], []
        for did, txt in zip(
            docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
        ):
            toks = txt.split(" ")
            nseg = -(-len(toks) // seg_words)
            dset = dropped.get(did)
            if not dset:
                o_txt.append(txt)  # join of all segments == original text
                o_nd.append(0)
            else:
                kept = [
                    " ".join(toks[(i - 1) * seg_words : i * seg_words])
                    for i in range(1, nseg + 1)
                    if i not in dset
                ]
                o_txt.append(" ".join(kept))
                o_nd.append(len(dset))
            o_id.append(did)
            o_ns.append(nseg)
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "text_clean": pa.array(o_txt, pa.string()),
                "n_segs": pa.array(o_ns, pa.int64()),
                "n_dropped": pa.array(o_nd, pa.int64()),
            },
            schema=out_schema,
        )

    corpus = read_table(sf_dir, "documents", ["doc_id", "text"])
    # slim drop rows materialized + first (union-under-sort livelock
    # rule — see _minhash_parts): the corpus side streams unbuffered
    tagged_drops = drops.map_batches(tag_drops, batch_format="pyarrow").materialize()
    return (
        tagged_drops.union(corpus.map_batches(tag_corpus, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(rebuild, batch_format="pyarrow")
    )


WIN_WORDS = 20  # duplicated-span window: 20 consecutive tokens


def dup_spans(sf_dir: str, win_words: int = WIN_WORDS, num_buckets: int = 64):
    """Sliding-window exact duplicate-SPAN detection — the detection
    phase of suffix-array exact-substring dedup ("Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2022):
    every ``win_words``-token window (stride 1) of every document is
    hashed, and a window is *duplicated* when its exact text occurs in
    ≥ 2 DISTINCT documents. Unlike :func:`dedup_segments` (fixed
    16-token boundaries), stride-1 windows catch UNALIGNED copies — a
    span pasted mid-sentence still collides. Output per document:
    ``(doc_id, n_windows, n_dup_windows)`` (docs shorter than the
    window report ``0, 0``).

    Identity = md5 of the window text, carried as two int64 halves
    (16 B) — window TEXT never crosses the wire, so the exchange is
    ~32 B × tokens-per-doc rows: slim but proportional to the token
    stream, exactly the suffix-array cost class; the stride and window
    are parameters when that budget needs cutting.

    Ray shape — two slim keyed exchanges:

    1. explode → ``(bucket(h), h0, h1, doc_id)`` per window;
       ``groupby(bucket)`` → per-group hash fold marks hashes with
       ≥ 2 distinct docs and emits per-(doc, bucket) partial dup
       counts — duplicated-window COUNTS leave the group, never
       window coordinates;
    2. the dup partials union the explode-time per-doc window totals
       (discriminated rows) and fold on ``bucket(doc_id)`` into the
       final per-doc pair.
    """
    import pyarrow.compute as pc

    def _doc_bucket(ids: np.ndarray) -> np.ndarray:
        return (ids & ((1 << 62) - 1)) % num_buckets

    def explode(batch: pa.Table) -> pa.Table:
        """Window rows keyed by bucket(hash) in [0, B); per-doc window
        TOTALS ride the same exchange as already-final partials, keyed
        into the disjoint bucket range [B, 2B) by bucket(doc_id) — no
        single hot pass-through group, no second tokenize pass."""
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_b, o_h0, o_h1, o_id = [], [], [], []
        tot_id, tot_n = [], []
        for did, txt in zip(ids, texts):
            toks = txt.split(" ")
            nwin = max(0, len(toks) - win_words + 1)
            tot_id.append(did)
            tot_n.append(nwin)
            for i in range(nwin):
                dg = hashlib.md5(" ".join(toks[i : i + win_words]).encode()).digest()
                h0 = int.from_bytes(dg[:8], "big", signed=True)
                h1 = int.from_bytes(dg[8:], "big", signed=True)
                o_b.append((h0 & ((1 << 63) - 1)) % num_buckets)
                o_h0.append(h0)
                o_h1.append(h1)
                o_id.append(did)
        tot_b = (num_buckets + _doc_bucket(np.asarray(tot_id, dtype=np.int64))).tolist()
        return pa.table(
            {
                "bucket": pa.array(o_b + tot_b, pa.int64()),
                "h0": pa.array(o_h0 + [0] * len(tot_id), pa.int64()),
                "h1": pa.array(o_h1 + [0] * len(tot_id), pa.int64()),
                "doc_id": pa.array(o_id + tot_id, pa.int64()),
                "n": pa.array([1] * len(o_id) + tot_n, pa.int64()),
            }
        )

    def mark(group: pa.Table) -> pa.Table:
        """Hash-bucket groups emit per-doc DUP partial counts (kind 1);
        totals-bucket groups fold their per-doc totals (kind 0). Both
        come out keyed by bucket(doc_id) for the final exchange."""
        if group.num_rows and group.column("bucket")[0].as_py() >= num_buckets:
            part = group.group_by("doc_id").aggregate([("n", "sum")])
            kind = 0
        else:
            g = group.group_by(["h0", "h1"]).aggregate([("doc_id", "count_distinct")])
            dup = g.filter(
                pc.greater_equal(g.column("doc_id_count_distinct"), 2)
            ).select(["h0", "h1"])
            hits = group.join(dup, keys=["h0", "h1"], join_type="inner")
            part = hits.group_by("doc_id").aggregate([("n", "sum")])
            kind = 1
        ids = part.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_bucket": pa.array(_doc_bucket(ids), pa.int64()),
                "doc_id": part.column("doc_id"),
                "kind": pa.array([kind] * part.num_rows, pa.int64()),
                "n": part.column("n_sum"),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(group.select(["doc_id", "kind", "n"]))
            .group_by("doc_id")
            .agg(
                n_windows=pl.col("n").filter(pl.col("kind") == 0).sum(),
                n_dup_windows=pl.col("n").filter(pl.col("kind") == 1).sum(),
            )
        )
        return df.to_arrow().cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_windows", pa.int64()),
                    ("n_dup_windows", pa.int64()),
                ]
            )
        )

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    return (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(mark, batch_format="pyarrow")
        .groupby("doc_bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def dup_spans_oracle_sql(win_words: int = WIN_WORDS) -> str:
    """DuckDB twin: the same stride-1 windows via list slicing, md5
    identity, ≥2-distinct-docs rule, per-doc fold."""
    return f"""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        w AS (
          SELECT doc_id,
                 md5(array_to_string(toks[i + 1 : i + {win_words}], ' ')) AS h
          FROM t, UNNEST(range(len(toks) - {win_words} + 1)) AS u(i)
        ),
        dup AS (
          SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
        ),
        perdoc AS (
          SELECT w.doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_windows,
                 CAST(SUM(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_windows
          FROM w LEFT JOIN dup ON dup.h = w.h
          GROUP BY w.doc_id
        )
        SELECT t.doc_id,
               COALESCE(p.n_windows, 0) AS n_windows,
               COALESCE(p.n_dup_windows, 0) AS n_dup_windows
        FROM t LEFT JOIN perdoc p ON p.doc_id = t.doc_id
    """


def dedup_span_apply(sf_dir: str, win_words: int = WIN_WORDS, num_buckets: int = 64):
    """The APPLY phase of exact-substring dedup (Lee et al. 2022):
    rebuild every document with its later-duplicate spans REMOVED.
    Rule (deterministic and cross-engine exact): every ``win_words``-
    token stride-1 window whose exact text occurs ≥ 2 times anywhere
    in the corpus (within-doc repeats count) keeps only its GLOBAL
    first occurrence — ``min (doc_id, start)`` — and every other
    occurrence's token range ``[start, start + win)`` is deleted;
    overlapping deleted ranges union. A position covered by a losing
    window is removed even where it also overlaps the winning window —
    the simple position-mask rule both engines share (the published
    algorithm's byte-exact span arithmetic would need a suffix array;
    this is the streaming approximation of its effect). Output:
    ``(doc_id, text_clean, n_tokens, n_removed)``.

    Ray shape — two exchanges, the :func:`dedup_segments` pattern:

    1. explode → slim ``(bucket(h), h0, h1, doc_id, start)`` rows; one
       lexsort per hash-bucket group marks every non-first occurrence
       and emits LOSER coordinates only;
    2. losers + corpus co-partitioned on ``bucket(doc_id)``; one task
       per bucket rebuilds its documents with a numpy position mask.
    Untouched documents take the identity fast path (single-space
    token split/join is lossless).
    """
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_b, o_h0, o_h1, o_id, o_st = [], [], [], [], []
        for did, txt in zip(ids, texts):
            toks = txt.split(" ")
            for i in range(max(0, len(toks) - win_words + 1)):
                dg = hashlib.md5(" ".join(toks[i : i + win_words]).encode()).digest()
                h0 = int.from_bytes(dg[:8], "big", signed=True)
                h1 = int.from_bytes(dg[8:], "big", signed=True)
                o_b.append((h0 & ((1 << 63) - 1)) % num_buckets)
                o_h0.append(h0)
                o_h1.append(h1)
                o_id.append(did)
                o_st.append(i)
        return pa.table(
            {
                "bucket": pa.array(o_b, pa.int64()),
                "h0": pa.array(o_h0, pa.int64()),
                "h1": pa.array(o_h1, pa.int64()),
                "doc_id": pa.array(o_id, pa.int64()),
                "start": pa.array(o_st, pa.int64()),
            }
        )

    def to_losers(group: pa.Table) -> pa.Table:
        h0 = group.column("h0").to_numpy(zero_copy_only=False)
        h1 = group.column("h1").to_numpy(zero_copy_only=False)
        did = group.column("doc_id").to_numpy(zero_copy_only=False)
        st = group.column("start").to_numpy(zero_copy_only=False)
        order = np.lexsort((st, did, h1, h0))
        h0s, h1s = h0[order], h1[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (h0s[1:] != h0s[:-1]) | (h1s[1:] != h1s[:-1])
        lose = order[~first]
        return pa.table(
            {
                "doc_id": pa.array(did[lose], pa.int64()),
                "start": pa.array(st[lose], pa.int64()),
            }
        )

    losers = (
        read_table(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(to_losers, batch_format="pyarrow")
    )

    def tag_losers(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        return pa.table(
            {
                "bucket": _bucket_col(ids, num_buckets),
                "doc_id": ids,
                "text": pa.nulls(t.num_rows, pa.string()),
                "start": t.column("start"),
            }
        )

    def tag_corpus(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        return pa.table(
            {
                "bucket": _bucket_col(ids, num_buckets),
                "doc_id": ids,
                "text": t.column("text"),
                "start": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text_clean", pa.string()),
            ("n_tokens", pa.int64()),
            ("n_removed", pa.int64()),
        ]
    )

    def rebuild(group: pa.Table) -> pa.Table:
        is_doc = pc.invert(pc.is_null(group.column("text")))
        l = group.filter(pc.invert(is_doc))
        starts: dict[int, list[int]] = {}
        for did, st in zip(
            l.column("doc_id").to_pylist(), l.column("start").to_pylist()
        ):
            starts.setdefault(did, []).append(st)
        docs = group.filter(is_doc)
        o_id, o_txt, o_nt, o_nr = [], [], [], []
        for did, txt in zip(
            docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
        ):
            toks = txt.split(" ")
            o_id.append(did)
            o_nt.append(len(toks))
            sts = starts.get(did)
            if not sts:
                o_txt.append(txt)
                o_nr.append(0)
                continue
            mask = np.zeros(len(toks), dtype=bool)
            for s in sts:
                mask[s : s + win_words] = True
            o_txt.append(" ".join(t for t, m in zip(toks, mask) if not m))
            o_nr.append(int(mask.sum()))
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "text_clean": pa.array(o_txt, pa.string()),
                "n_tokens": pa.array(o_nt, pa.int64()),
                "n_removed": pa.array(o_nr, pa.int64()),
            },
            schema=out_schema,
        )

    corpus = read_table(sf_dir, "documents", ["doc_id", "text"])
    # slim loser rows materialized + first (union-under-sort livelock
    # rule — see _minhash_parts): the corpus side streams unbuffered
    tagged_losers = losers.map_batches(tag_losers, batch_format="pyarrow").materialize()
    return (
        tagged_losers.union(corpus.map_batches(tag_corpus, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(rebuild, batch_format="pyarrow")
    )


def dedup_span_apply_oracle_sql(win_words: int = WIN_WORDS) -> str:
    """DuckDB twin: same windows, global-first-wins rank, position-mask
    union, ordered token rebuild."""
    return f"""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        w AS (
          SELECT doc_id, i,
                 md5(array_to_string(toks[i + 1 : i + {win_words}], ' ')) AS h
          FROM t, UNNEST(range(len(toks) - {win_words} + 1)) AS u(i)
        ),
        r AS (
          SELECT doc_id, i, h,
                 ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn,
                 COUNT(*) OVER (PARTITION BY h) AS cnt
          FROM w
        ),
        losers AS (SELECT doc_id, i FROM r WHERE cnt >= 2 AND rn > 1),
        cov AS (
          SELECT DISTINCT losers.doc_id, losers.i + d.d AS p
          FROM losers, UNNEST(range({win_words})) AS d(d)
        ),
        pos AS (
          SELECT t.doc_id, u.i AS p, t.toks[u.i + 1] AS tok
          FROM t, UNNEST(range(len(t.toks))) AS u(i)
        ),
        kept AS (
          SELECT pos.doc_id, pos.p, pos.tok
          FROM pos LEFT JOIN cov ON cov.doc_id = pos.doc_id AND cov.p = pos.p
          WHERE cov.p IS NULL
        ),
        agg AS (
          SELECT doc_id,
                 COALESCE(array_to_string(list(tok ORDER BY p), ' '), '') AS text_clean,
                 CAST(COUNT(*) AS BIGINT) AS n_kept
          FROM kept GROUP BY doc_id
        )
        SELECT t.doc_id,
               COALESCE(agg.text_clean, '') AS text_clean,
               CAST(len(t.toks) AS BIGINT) AS n_tokens,
               CAST(len(t.toks) - COALESCE(agg.n_kept, 0) AS BIGINT) AS n_removed
        FROM t LEFT JOIN agg ON agg.doc_id = t.doc_id
    """
