"""Training-data preparation operators — the corpus-to-training-run
steps a 100-TB LLM pipeline needs between "filtered corpus" and
"token shards": deterministic sampling and sequence packing.

Both are oracle-exact by construction: sampling keys on the DuckDB-
recomputable ``md5_number_lower`` hash (see ``common.md5_lower64``)
and packing is a pure integer prefix-sum, so a SQL window function
reproduces it bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Sum

from wbot_ray.pipelines.common import read_table

__all__ = [
    "sample_hash",
    "source_mix",
    "token_budget_mix",
    "token_budget_mix_oracle_sql",
    "pack_sequences",
    "stratified_sample",
    "global_shuffle",
    "prepare_corpus",
    "doc_chunks",
]


def prepare_corpus(sf_dir: str, threshold: float = 0.7):
    """The composed end-to-end corpus-preparation pipeline — what a user
    actually runs before training: near-dedup APPLY ∧ Gopher quality
    gate, as ONE streaming DAG. Every stage is the same operator users
    call individually (``dedup.dedup_keep``, ``textops.quality_score``,
    ``join.hash_join``); nothing materializes between them — the
    composition is pure Dataset-lazy, so the streaming executor
    pipelines the dedup exchanges with the quality scan.

    Output: one row per surviving document —
    ``(doc_id, lang, n_chars, n_words)``."""
    from wbot_ray.pipelines.dedup import dedup_keep
    from wbot_ray.pipelines.join import hash_join
    from wbot_ray.pipelines.textops import quality_score

    keep = dedup_keep(sf_dir, threshold)  # (doc_id, lang, n_chars)

    def pass_only(t: pa.Table) -> pa.Table:
        return t.filter(t.column("passes")).select(["doc_id", "n_words"])

    passing = quality_score(sf_dir).map_batches(pass_only, batch_format="pyarrow")
    # static schemas: keep is (doc_id, lang, n_chars), passing is
    # (doc_id, n_words) — passing them avoids a schema() probe that
    # would execute the dedup exchanges an extra time
    return hash_join(
        keep,
        passing,
        key="doc_id",
        num_buckets=32,
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("lang", pa.string()), ("n_chars", pa.int64())]
        ),
        right_schema=pa.schema([("doc_id", pa.int64()), ("n_words", pa.int64())]),
    )


def _salted_id_hash(doc_ids, salt: str) -> np.ndarray:
    """Vectorized ``md5_lower64(salt + str(doc_id))`` over a column —
    one Arrow cast+join and one DuckDB md5 call, no per-row Python."""
    import pyarrow.compute as pc

    from wbot_ray.pipelines.common import md5_lower64_batch

    salted = pc.binary_join_element_wise(
        salt, pc.cast(doc_ids, pa.string()), ""
    )
    return md5_lower64_batch(salted)


# p = num/2^64: the keep predicate is an integer compare, no float rate
SAMPLE_SALT = "sample:"


def sample_hash(sf_dir: str, num: int = 1 << 62):
    """Deterministic Bernoulli sample of documents at rate num/2^64
    (default 1/4): keep doc iff ``md5_lower64("sample:"+doc_id) < num``.

    The canonical reproducible-sampling shape for training sets: the
    keep decision is a pure function of the stable doc key — stateless,
    embarrassingly parallel, re-runnable on any subset of shards, and
    the complement set (the holdout) is exactly the other rows. No RNG
    state, no seed coordination across workers.
    """

    def keep(batch: pa.Table) -> pa.Table:
        h = _salted_id_hash(batch.column("doc_id"), SAMPLE_SALT)
        return batch.filter(pa.array(h < np.uint64(num)))

    return read_table(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).map_batches(
        keep, batch_format="pyarrow"
    )


def _bottomk_per_key(keys: np.ndarray, val: np.ndarray, tiebreak: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k smallest (val, tiebreak) rows per key — one
    lexsort + a run-length rank, no Python loop over keys."""
    order = np.lexsort((tiebreak, val, keys))
    k_sorted = keys[order]
    is_start = np.r_[True, k_sorted[1:] != k_sorted[:-1]]
    run_start = np.maximum.accumulate(np.where(is_start, np.arange(len(order)), 0))
    rank = np.arange(len(order)) - run_start
    return order[rank < k]


STRAT_SALT = "strat:"


def stratified_sample(sf_dir: str, k: int = 50):
    """Deterministic per-stratum fixed-count sample: for each lang, the
    ``k`` documents with the smallest ``md5_lower64("strat:"+doc_id)``
    — i.e. a uniform random-looking sample of exactly k per stratum
    that any worker can recompute from the doc key alone.

    Ray shape: per-BATCH partial bottom-k per lang (lossless — a row
    outside its batch's stratum bottom-k can never be in the global
    bottom-k), then ``groupby(lang).map_groups`` finishes and ranks.
    The exchange carries ≤ k rows per (batch, stratum); final groups
    are ≤ k·#blocks rows regardless of corpus size."""

    def hashes(batch: pa.Table) -> np.ndarray:
        return _salted_id_hash(batch.column("doc_id"), STRAT_SALT)

    def prep(batch: pa.Table) -> pa.Table:
        h = hashes(batch)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # factorize lang: np.unique codes preserve lexicographic order
        _, codes = np.unique(np.asarray(batch.column("lang").to_pylist(), dtype=object), return_inverse=True)
        keep = np.sort(_bottomk_per_key(codes, h, ids, k))
        return batch.append_column("h", pa.array(h, pa.uint64())).take(pa.array(keep))

    def finish(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))[: min(k, len(ids))]
        out = group.select(["doc_id", "lang", "n_chars"]).take(pa.array(order))
        return out.append_column(
            "strat_rank", pa.array(np.arange(1, len(order) + 1, dtype=np.int64), pa.int64())
        )

    return (
        read_table(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(finish, batch_format="pyarrow")
    )


WSAMP_SALT = "wsamp:"


def weighted_sample(sf_dir: str, k: int = 200):
    """Deterministic WEIGHT-proportional priority sample: the ``k``
    documents with the smallest ``md5_lower64("wsamp:"+doc_id) //
    max(n_chars, 1)`` — an integer-rational priority key, so a longer
    document's key shrinks ~proportionally to its length and the sample
    tilts toward token-mass (the "sample by token budget, not by doc
    count" mixing rule used when assembling training sets from corpora
    of very different document lengths). All arithmetic is unsigned
    64-bit integer (hash and one integer division), so a DuckDB oracle
    reproduces every key bit-for-bit — no float priority (``-ln(u)/w``)
    whose libm would have to agree across engines.

    Ray shape: per-BATCH bottom-k on the key (lossless: a row outside
    its batch's bottom-k can never be in the global bottom-k), then one
    tiny single-group finish — the exchange carries ≤ k rows per block
    regardless of corpus size; the big table is never shuffled.
    """

    def prep(batch: pa.Table) -> pa.Table:
        h = _salted_id_hash(batch.column("doc_id"), WSAMP_SALT)
        w = np.maximum(
            batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.uint64),
            np.uint64(1),
        )
        key = h // w
        ids_np = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(ids_np)
        keep = np.sort(np.lexsort((ids_np, key))[: min(k, n)])
        return (
            batch.append_column("wkey", pa.array(key, pa.uint64()))
            .append_column("g", pa.array(np.zeros(n, dtype=np.int32), pa.int32()))
            .take(pa.array(keep))
        )

    def finish(group: pa.Table) -> pa.Table:
        key = group.column("wkey").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, key))[: min(k, len(key))]
        out = group.select(["doc_id", "lang", "n_chars"]).take(pa.array(order))
        return out.append_column(
            "w_rank", pa.array(np.arange(1, len(order) + 1, dtype=np.int64), pa.int64())
        )

    return (
        read_table(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("g")
        .map_groups(finish, batch_format="pyarrow")
    )


BUDGET_SALT = "budget:"


def token_budget_mix_oracle_sql(budget: int = 800) -> str:
    """DuckDB twin of :func:`token_budget_mix`, parameterized on the
    budget so tests exercise non-default budgets against the REAL
    generated SQL (not string surgery over a literal)."""
    return f"""
        -- per-source token-budget fill: hash-ordered running total,
        -- keep while the tokens BEFORE the doc fit the budget
        WITH d AS (
          SELECT doc_id, source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents
        ), c AS (
          SELECT doc_id, source, n_tokens,
                 SUM(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY md5_number_lower('{BUDGET_SALT}' || doc_id), doc_id
                   ROWS UNBOUNDED PRECEDING
                 ) - n_tokens AS cum_prev
          FROM d)
        SELECT doc_id, source, n_tokens, CAST(cum_prev AS BIGINT) AS cum_prev
        FROM c WHERE cum_prev < {budget}
    """


def token_budget_mix(sf_dir: str, budget: int = 800, part_bits: int = 58):
    """TOKEN-budget mixture selection — fill each source's token budget
    (not doc count: sources differ in doc length, and training mixtures
    are specified in tokens) with a deterministic, reproducible subset:
    documents are ordered inside their source by the salted hash
    ``md5_number_lower('budget:' || doc_id)`` (doc_id tie-break) and
    taken while the tokens BEFORE them fit the budget — the crossing
    document is kept, so a source with supply ≥ budget always reaches
    it. Pure function of the doc key: no RNG state, re-runnable on any
    shard subset, and the complement is exactly the unkept rows.

    Ray shape — the :func:`pack_sequences` distributed prefix sum, but
    ordered by the hash key instead of doc_id, which makes the range
    partitioner free: ``part = key >> part_bits`` is a contiguous key
    range, so per-``(source, part)`` token sums (a metadata-sized
    ``groupby``) give exclusive per-part base offsets on the driver,
    broadcast once; each part task sorts its own bounded slice by
    ``(key, doc_id)`` and adds its local cumsum. The text column never
    moves — the slim pass carries four int64-ish columns.

    Output: ``(doc_id, source, n_tokens, cum_prev)`` for kept docs.
    Oracle: ``SUM(n_tokens) OVER (PARTITION BY source ORDER BY
    md5_number_lower(...), doc_id) - n_tokens < budget``."""

    def prep(batch: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(pc.split_pattern(batch.column("text"), " "))
        key = _salted_id_hash(batch.column("doc_id"), BUDGET_SALT)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "n_tokens": pc.cast(n_tok, pa.int64()),
                "key": pa.array(key, pa.uint64()),
                "part": pa.array((key >> np.uint64(part_bits)).astype(np.int64)),
            }
        )

    slim = (
        read_table(sf_dir, "documents", ["doc_id", "source", "text"])
        .map_batches(prep, batch_format="pyarrow")
        .materialize()
    )
    part_sums = slim.groupby(["source", "part"]).aggregate(
        Sum("n_tokens", alias_name="part_tokens")
    )
    rows = part_sums.take_all()  # |sources|·|parts| rows — metadata-sized
    base: dict[tuple[str, int], int] = {}
    acc: dict[str, int] = {}
    for r in sorted(rows, key=lambda r: (r["source"], r["part"])):
        base[(r["source"], int(r["part"]))] = acc.get(r["source"], 0)
        acc[r["source"]] = acc.get(r["source"], 0) + int(r["part_tokens"])
    base_ref = ray.put(base)

    def take(group: pa.Table) -> pa.Table:
        offsets = ray.get(base_ref)
        part = int(group.column("part")[0].as_py())
        ids = np.asarray(group.column("doc_id").to_pylist(), dtype=np.int64)
        srcs = np.asarray(group.column("source").to_pylist(), dtype=object)
        ntok = np.asarray(group.column("n_tokens").to_pylist(), dtype=np.int64)
        key = np.asarray(group.column("key").to_pylist(), dtype=np.uint64)
        order = np.lexsort((ids, key))
        ids, srcs, ntok = ids[order], srcs[order], ntok[order]
        cum_prev = np.empty(len(ids), dtype=np.int64)
        for src in np.unique(srcs):
            m = srcs == src
            local = np.cumsum(ntok[m]) - ntok[m]
            cum_prev[m] = local + offsets.get((src, part), 0)
        keep = cum_prev < budget
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "source": pa.array(list(srcs[keep]), pa.string()),
                "n_tokens": pa.array(ntok[keep], pa.int64()),
                "cum_prev": pa.array(cum_prev[keep], pa.int64()),
            }
        )

    return slim.groupby("part").map_groups(take, batch_format="pyarrow")


def pack_sequences(sf_dir: str, seq_len: int = 2048, part_size: int = 1024):
    """Sequence packing (the streaming concat-and-chunk used for LLM
    training): per language, documents are laid out in doc_id order on
    one virtual token tape, which is cut into fixed ``seq_len`` chunks;
    each doc gets its (seq_id, seq_offset) placement.

    This is a DISTRIBUTED PREFIX SUM — the one primitive Ray Data has
    no operator for — built from its own pieces:

    1. a slim pass computes (doc_id, lang, n_tokens, part) where
       ``part = doc_id // part_size`` (any stable pre-existing shard
       key works; no shuffle is spent creating it);
    2. a tiny ``groupby((lang, part)).sum`` yields per-partition token
       totals — |langs|·|parts| rows, safe to collect and scan on the
       driver at any corpus size (it is the *partition* count, not the
       row count);
    3. the exclusive per-partition base offsets are broadcast once
       (``ray.put``) and a ``groupby(part).map_groups`` sorts each
       partition by doc_id and adds its local cumulative sum — every
       task touches only its own bounded partition.

    The slim dataset is materialized between (2) and (3): three int64
    columns plus lang, orders of magnitude smaller than the corpus —
    the re-read it avoids is the full text column.
    """

    def prep(batch: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(pc.split_pattern(batch.column("text"), " "))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "n_tokens": pc.cast(n_tok, pa.int64()),
                # doc_id >= 0, so integer (trunc) division == floor
                "part": pc.cast(pc.divide(batch.column("doc_id"), part_size), pa.int64()),
            }
        )

    slim = (
        read_table(sf_dir, "documents", ["doc_id", "lang", "text"])
        .map_batches(prep, batch_format="pyarrow")
        .materialize()
    )

    part_sums = slim.groupby(["lang", "part"]).aggregate(
        Sum("n_tokens", alias_name="part_tokens")
    )
    rows = part_sums.take_all()  # |langs|·|parts| rows — metadata-sized
    base: dict[tuple[str, int], int] = {}
    acc: dict[str, int] = {}
    for r in sorted(rows, key=lambda r: (r["lang"], r["part"])):
        base[(r["lang"], int(r["part"]))] = acc.get(r["lang"], 0)
        acc[r["lang"]] = acc.get(r["lang"], 0) + int(r["part_tokens"])
    base_ref = ray.put(base)

    def place(group: pa.Table) -> pa.Table:
        offsets = ray.get(base_ref)
        part = int(group.column("part")[0].as_py())
        ids = np.asarray(group.column("doc_id").to_pylist(), dtype=np.int64)
        langs = np.asarray(group.column("lang").to_pylist(), dtype=object)
        ntok = np.asarray(group.column("n_tokens").to_pylist(), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids, langs, ntok = ids[order], langs[order], ntok[order]
        cum_prev = np.empty(len(ids), dtype=np.int64)
        for lang in np.unique(langs):
            m = langs == lang
            local = np.cumsum(ntok[m]) - ntok[m]
            cum_prev[m] = local + offsets.get((lang, part), 0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(list(langs), pa.string()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "seq_id": pa.array(cum_prev // seq_len, pa.int64()),
                "seq_offset": pa.array(cum_prev % seq_len, pa.int64()),
            }
        )

    return slim.groupby("part").map_groups(place, batch_format="pyarrow")


def global_shuffle(sf_dir: str, num_shards: int = 8):
    """Deterministic global training shuffle: every document gets a
    dense position in the order of its salted hash, and a round-robin
    shard assignment — the "shuffle once, stream shards in order" step
    that fixes an epoch's data order reproducibly across reruns.

    Ray shape: a DISTRIBUTED SORT on the salted ``md5_lower64`` key
    (slim rows: doc_id + 8-byte key — the text never moves), then the
    block-offset dense-rank pattern (``stages.order.assign_crawl_ord``,
    the same zipWithIndex the crawl frontier uses): per-block row
    counts come from block metadata, one tiny remote task per block
    appends ``base + arange`` — no row passes through the driver.
    Oracle = ``ROW_NUMBER() OVER (ORDER BY md5_number_lower(...))``."""
    from wbot_ray.stages.order import assign_crawl_ord

    def key(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shuf_key": pa.array(
                    _salted_id_hash(batch.column("doc_id"), "shuf:"), pa.uint64()
                ),
            }
        )

    ds = (
        read_table(sf_dir, "documents", ["doc_id"])
        .map_batches(key, batch_format="pyarrow")
        .sort(["shuf_key", "doc_id"])
    )
    ranked, _ = assign_crawl_ord(ds, 0)

    def finish(t: pa.Table) -> pa.Table:
        pos = np.asarray(t.column("crawl_ord").to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "pos": pa.array(pos, pa.int64()),
                "shard": pa.array(pos % num_shards, pa.int64()),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


def doc_chunks(sf_dir: str, chunk_len: int = 64, stride: int = 48):
    """RAG/pretraining CHUNKING: split each document into overlapping
    token windows (``chunk_len`` tokens every ``stride`` — adjacent
    chunks share ``chunk_len − stride`` tokens), emitting one slim row
    per chunk: ``(doc_id, chunk_idx, n_tokens, chunk_md5)`` — the md5
    identity stands in for the chunk payload so the exchange-free
    output stays bytes-light (a real pipeline would write the chunk
    text to the partitioned sink keyed by these coordinates).

    Ray shape: one stateless ``map_batches`` pass over a pruned read —
    chunking is embarrassingly per-document, no exchange at all. Chunk
    starts are ``i·stride`` while ``i·stride < n_tokens``, so the final
    chunk may be short (never empty); a doc with ≤ chunk_len tokens is
    exactly one chunk. All engine-side values (token counts, md5 of the
    space-joined window) are recomputable in DuckDB via
    ``list_slice`` — the oracle rebuilds every chunk from scratch."""
    import hashlib

    def fn(batch: pa.Table) -> pa.Table:
        o_id, o_ci, o_n, o_md5 = [], [], [], []
        for did, txt in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = txt.split(" ")
            n = len(toks)
            n_chunks = (n - 1) // stride + 1
            for ci in range(n_chunks):
                s = ci * stride
                window = toks[s : s + chunk_len]
                o_id.append(did)
                o_ci.append(ci)
                o_n.append(len(window))
                o_md5.append(hashlib.md5(" ".join(window).encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "chunk_idx": pa.array(o_ci, pa.int64()),
                "n_tokens": pa.array(o_n, pa.int64()),
                "chunk_md5": pa.array(o_md5, pa.string()),
            }
        )

    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


# default mixture spec for the fixture corpus: weight(srcK) = K+1 — a
# deliberately non-uniform ramp so the gate exercises real rate spread
DEFAULT_MIX = {f"src{i}": i + 1 for i in range(20)}
MIX_SALT = "mix:"
PPM = 1_000_000


def mix_rates_ppm(
    counts: dict[str, int], weights: dict[str, int], n_out: int
) -> dict[str, int]:
    """Per-source keep rates (parts-per-million) that reshape a corpus
    with per-source ``counts`` toward the target mixture ``weights``
    under a total budget of ``n_out`` docs — pure integer math
    (floor-div), so any engine recomputes it bit-for-bit. A source
    whose fair share exceeds its supply clamps at 10^6 (upsampling is
    out of scope for a keep/drop gate); sources absent from the spec
    get rate 0 (dropped)."""
    w_total = sum(weights.get(s, 0) for s in counts)
    out = {}
    for s, n in counts.items():
        w = weights.get(s, 0)
        out[s] = min(PPM, (n_out * w * PPM) // (w_total * n)) if w and n else 0
    return out


def source_mix(sf_dir: str, weights: dict[str, int] | None = None, out_frac: int = 2):
    """Data mixing — reshape the corpus toward a target per-source
    mixture (the Pile/Dolma-style rebalancing step between filtering
    and tokenization). Two passes:

    1. per-source counts: per-batch ``value_counts`` partials into a
       tiny keyed aggregate (≤ |sources| rows reach the driver — a
       mixture spec is small by definition);
    2. keep gate: each doc kept iff
       ``md5_number_lower('mix:' || doc_id) % 10^6 < rate_ppm[source]``
       where the rates come from :func:`mix_rates_ppm` with budget
       ``n_in_spec // out_frac`` — a pure function of the stable doc key,
       so the sample is reproducible on any subset of shards and needs
       no RNG coordination (same contract as ``sample_hash``).

    Scale shape: pass 1's exchange carries one row per (batch ×
    source); pass 2 is a stateless ``map_batches`` gate with the rate
    table closed over (broadcast-by-closure — it is ≤ |sources|
    entries). Output: ``(doc_id, source, rate_ppm)`` for kept docs.
    """
    weights = DEFAULT_MIX if weights is None else weights

    def part_counts(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("source"))
        return pa.table(
            {
                "source": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    counts_rows = (
        read_table(sf_dir, "documents", ["source"])
        .map_batches(part_counts, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    counts = {r["source"]: int(r["n"]) for r in counts_rows}
    # budget = a fraction of the IN-SPEC corpus: out-of-spec sources are
    # dropped by the gate, so they don't get to inflate everyone's rates
    n_out = sum(n for s, n in counts.items() if weights.get(s, 0)) // out_frac
    rates = mix_rates_ppm(counts, weights, n_out)

    def gate(batch: pa.Table) -> pa.Table:
        src = batch.column("source")
        codes = pc.dictionary_encode(src).combine_chunks()
        dict_vals = codes.dictionary.to_pylist()
        rate_by_code = np.array([rates.get(v, 0) for v in dict_vals], dtype=np.int64)
        row_rates = rate_by_code[codes.indices.to_numpy()]
        h = (_salted_id_hash(batch.column("doc_id"), MIX_SALT) % np.uint64(PPM)).astype(
            np.int64
        )
        keep = h < row_rates
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": src,
                "rate_ppm": pa.array(row_rates, pa.int64()),
            }
        ).filter(pa.array(keep))

    return read_table(sf_dir, "documents", ["doc_id", "source"]).map_batches(
        gate, batch_format="pyarrow"
    )
