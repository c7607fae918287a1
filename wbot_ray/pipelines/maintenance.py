"""Storage-maintenance query surface — drives ``sinks.compact_dir``
(the small-file compaction pass) at the driver gate.

``compact_corpus`` proves the whole maintenance cycle LOSSLESS end to
end: the documents table is sharded into many small parquet files (the
shape a crawl round / streaming sink / incremental tick leaves behind),
compacted into a handful of target-size files, and the compacted layout
is re-scanned into ``(doc_id, text_md5)`` — which the DuckDB oracle
recomputes from the ORIGINAL table, so any lost / duplicated / mangled
row fails the value gate.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = [
    "compact_corpus",
    "corpus_diff",
    "corpus_diff_oracle_sql",
    "snapshot_latest",
    "snapshot_latest_oracle_sql",
    "upsert_merge",
    "upsert_merge_oracle_sql",
    "LAST_COMPACT_STATS",
]

_CACHE_VERSION = 1

# compaction accounting of the most recent compact_corpus call
LAST_COMPACT_STATS: dict = {}


def _sharded_corpus(sf_dir: str, n_shards: int) -> str:
    """Deterministic small-file fixture: the documents table cut into
    ``n_shards`` row-contiguous parquet shards (cached per source file
    fingerprint — built once, compacted many times)."""
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    fp = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    d = f"/tmp/wbot_ray_compact/v{_CACHE_VERSION}/{fp}/shards{n_shards}"
    if os.path.exists(os.path.join(d, "_DONE")):
        return d
    os.makedirs(d, exist_ok=True)
    t = pq.read_table(src, columns=["doc_id", "text"])
    step = -(-t.num_rows // n_shards)  # ceil
    for i in range(n_shards):
        part = t.slice(i * step, step)
        if part.num_rows == 0:
            break
        tmp = os.path.join(d, f".shard-{i:04d}.tmp")
        pq.write_table(part, tmp)
        os.replace(tmp, os.path.join(d, f"shard-{i:04d}.parquet"))
    with open(os.path.join(d, "_DONE"), "w") as f:
        f.write("ok")
    return d


def compact_corpus(sf_dir: str, n_shards: int = 32, merge_factor: int = 6):
    """Shard → compact → verify-scan. ``target_bytes`` is derived from
    the input total so roughly ``merge_factor`` shards fold into each
    output file regardless of scale; the returned Dataset streams the
    COMPACTED layout only (the original table never enters the result
    path — parity with the oracle is what proves losslessness)."""
    import glob

    import ray.data as rd

    from wbot_ray.sinks import compact_dir

    shards = _sharded_corpus(sf_dir, n_shards)
    sizes = [os.stat(p).st_size for p in glob.glob(os.path.join(shards, "*.parquet"))]
    target = (sum(sizes) // max(len(sizes) // merge_factor, 1)) + 1
    out_dir = os.path.join(os.path.dirname(shards), f"compacted{n_shards}m{merge_factor}")
    stats = compact_dir(shards, out_dir, target_bytes=target)
    LAST_COMPACT_STATS.clear()
    LAST_COMPACT_STATS.update(stats)
    print(
        f"[compact_corpus] {stats['n_input_files']} shards -> "
        f"{stats['n_groups']} files ({stats['n_skipped']} cached), "
        f"{stats['n_rows']} rows"
    )

    def verify(batch: pa.Table) -> pa.Table:
        md5s = [
            hashlib.md5(t.encode()).hexdigest() for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "text_md5": pa.array(md5s, pa.string())}
        )

    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    return rd.read_parquet(files).map_batches(verify, batch_format="pyarrow")


def corpus_diff(sf_dir: str, num_buckets: int = 32):
    """Snapshot DIFF between two corpus versions — the change-data
    audit every periodically-rebuilt training corpus needs: which
    documents were ``added``, ``removed``, or ``changed`` between the
    old and new snapshot (unchanged docs are dropped — at 100 TB the
    diff output is proportional to the CHURN, never the corpus).

    The "new" snapshot is synthesized deterministically from the
    documents table (drop ``doc_id % 17 == 3``, append ``' v2'`` where
    ``doc_id % 13 == 1``, add fresh ids ``doc_id + 1_000_000`` where
    ``doc_id % 29 == 5``) so the DuckDB oracle can rebuild the exact
    same pair of snapshots in SQL; the diff operator itself never sees
    the rule — it only compares ``(doc_id, md5)`` pairs.

    Ray shape: each side collapses to slim 40-byte ``(doc_id, md5)``
    rows in its scan pass (text never enters the exchange), then ONE
    co-partitioned FULL OUTER ``hash_join`` on ``doc_id`` and a
    vectorized classification — the one join type where both sides'
    orphans must survive, exercised nowhere else in the engine."""
    import pyarrow.compute as pc

    from wbot_ray.pipelines.common import read_table
    from wbot_ray.pipelines.join import hash_join

    def _md5s(texts: list[str]) -> pa.Array:
        return pa.array(
            [hashlib.md5(t.encode()).hexdigest() for t in texts], pa.string()
        )

    def old_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "old_md5": _md5s(batch.column("text").to_pylist()),
            }
        )

    def new_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_tx = [], []
        for i, t in zip(ids, texts):
            if i % 17 == 3:
                continue  # removed in the new snapshot
            out_id.append(i)
            out_tx.append(t + " v2" if i % 13 == 1 else t)
        for i in ids:
            if i % 29 == 5:
                out_id.append(i + 1_000_000)
                out_tx.append(f"added doc {i}")
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "new_md5": _md5s(out_tx),
            }
        )

    docs = lambda: read_table(sf_dir, "documents", ["doc_id", "text"])  # noqa: E731
    joined = hash_join(
        docs().map_batches(old_side, batch_format="pyarrow"),
        docs().map_batches(new_side, batch_format="pyarrow"),
        key="doc_id",
        num_buckets=num_buckets,
        join_type="full outer",
    )

    def classify(batch: pa.Table) -> pa.Table:
        old = batch.column("old_md5")
        new = batch.column("new_md5")
        status = pc.if_else(
            pc.is_null(old),
            pa.scalar("added", pa.string()),
            pc.if_else(
                pc.is_null(new),
                pa.scalar("removed", pa.string()),
                pa.scalar("changed", pa.string()),
            ),
        )
        t = pa.table({"doc_id": batch.column("doc_id"), "status": status})
        same = pc.and_kleene(
            pc.is_valid(old), pc.and_kleene(pc.is_valid(new), pc.equal(old, new))
        )
        return t.filter(pc.invert(pc.fill_null(same, False)))

    return joined.map_batches(classify, batch_format="pyarrow")


def corpus_diff_oracle_sql() -> str:
    """DuckDB oracle: rebuild both snapshots with the same deterministic
    mutation rule, FULL OUTER join, same classification."""
    return """
        WITH newsnap AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 1 THEN text || ' v2' ELSE text END AS text
          FROM documents WHERE doc_id % 17 <> 3
          UNION ALL
          SELECT doc_id + 1000000, 'added doc ' || CAST(doc_id AS VARCHAR)
          FROM documents WHERE doc_id % 29 = 5
        ), o AS (SELECT doc_id, md5(text) AS m FROM documents),
           n AS (SELECT doc_id, md5(text) AS m FROM newsnap)
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    ELSE 'changed' END AS status
        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.m <> n.m
    """


def _recrawl_batches(batch: pa.Table) -> pa.Table:
    """Slim multi-snapshot rows for one pages batch: the original
    snapshot plus the deterministic re-crawls (rule shared with the
    SQL oracle): urls with ``length(url) % 3 == 1`` gain a snapshot
    1 h later with ``text || ' updated'``; urls with ``length(url) %
    7 == 2`` gain another 2 h later with ``text || ' updated twice'``.
    Only ``(url, warc_ts, n_chars)`` leave the task — html/text never
    enter the exchange."""
    import polars as pl

    df = pl.from_arrow(batch.select(["url", "warc_ts", "text"])).with_columns(
        n_chars=pl.col("text").str.len_chars().cast(pl.Int64)
    ).drop("text")
    ulen = pl.col("url").str.len_chars()
    snap1 = df.filter(ulen % 3 == 1).with_columns(
        warc_ts=pl.col("warc_ts") + pl.duration(hours=1),
        n_chars=pl.col("n_chars") + 8,  # len(' updated')
    )
    snap2 = df.filter(ulen % 7 == 2).with_columns(
        warc_ts=pl.col("warc_ts") + pl.duration(hours=2),
        n_chars=pl.col("n_chars") + 14,  # len(' updated twice')
    )
    return pl.concat([df, snap1, snap2]).to_arrow().cast(
        pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us")),
                ("n_chars", pa.int64()),
            ]
        )
    )


def snapshot_latest(sf_dir: str, num_buckets: int = 32, pages_path: str | None = None):
    """Latest-snapshot-per-URL — the re-crawl dedup every periodically
    refreshed web corpus runs (Common Crawl keeps one record per
    (url, capture); a training corpus keeps the NEWEST capture): one
    row per url with ``(url, warc_ts, n_chars, n_snapshots)`` of the
    most recent snapshot. The multi-snapshot input is synthesized
    deterministically from the pages table (rule in
    :func:`_recrawl_batches`) so the DuckDB oracle rebuilds the exact
    same snapshot stream in SQL; the operator itself never sees the
    rule — it argmax-folds whatever (url, warc_ts) rows arrive.

    Ray shape — partial argmax before the shuffle: each batch is
    reduced to one candidate row per url (batch-local sort + first)
    with a batch-local snapshot count, then ONE
    ``groupby(bucket(url)).map_groups`` fold finishes the argmax and
    sums the counts. The exchange carries ≤ one 40-byte row per url
    per batch; html/text stay in the scan tasks. Ties (impossible by
    construction — re-crawl offsets are distinct) are still totally
    ordered by (warc_ts, n_chars, url) so the fold is deterministic
    on any input."""
    import numpy as np
    import ray.data as rd

    if pages_path is None:
        from wbot_ray.pipelines.crawlq import _pages_path, scale_for_sf

        pages_path = _pages_path(scale_for_sf(sf_dir))
    pages = rd.read_parquet(pages_path, columns=["url", "warc_ts", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        snaps = pl.from_arrow(_recrawl_batches(batch))
        df = (
            snaps.sort(
                ["url", "warc_ts", "n_chars"], descending=[False, True, True]
            )
            .group_by("url", maintain_order=True)
            .agg(
                warc_ts=pl.col("warc_ts").first(),
                n_chars=pl.col("n_chars").first(),
                n_snapshots=pl.len().cast(pl.Int64),
            )
            .with_columns(
                bucket=(pl.col("url").hash(seed=0) % np.uint64(num_buckets)).cast(
                    pl.Int64
                )
            )
        )
        return df.select(["bucket", "url", "warc_ts", "n_chars", "n_snapshots"]).to_arrow().cast(
            pa.schema(
                [
                    ("bucket", pa.int64()),
                    ("url", pa.string()),
                    ("warc_ts", pa.timestamp("us")),
                    ("n_chars", pa.int64()),
                    ("n_snapshots", pa.int64()),
                ]
            )
        )

    def fold(group: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(group.select(["url", "warc_ts", "n_chars", "n_snapshots"]))
            .sort(["url", "warc_ts", "n_chars"], descending=[False, True, True])
            .group_by("url", maintain_order=True)
            .agg(
                warc_ts=pl.col("warc_ts").first(),
                n_chars=pl.col("n_chars").first(),
                n_snapshots=pl.col("n_snapshots").sum(),
            )
        )
        return df.to_arrow().cast(
            pa.schema(
                [
                    ("url", pa.string()),
                    ("warc_ts", pa.timestamp("us")),
                    ("n_chars", pa.int64()),
                    ("n_snapshots", pa.int64()),
                ]
            )
        )

    return (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def snapshot_latest_oracle_sql(pages_path: str) -> str:
    """DuckDB oracle: rebuild the same snapshot stream (same rule),
    window argmax + count per url."""
    return f"""
        WITH base AS (
          SELECT url, warc_ts,
                 CAST(length(text) AS BIGINT) AS n_chars
          FROM read_parquet('{pages_path}')
        ),
        snaps AS (
          SELECT url, warc_ts, n_chars FROM base
          UNION ALL
          SELECT url, warc_ts + INTERVAL 1 HOUR, n_chars + 8
          FROM base WHERE length(url) % 3 = 1
          UNION ALL
          SELECT url, warc_ts + INTERVAL 2 HOUR, n_chars + 14
          FROM base WHERE length(url) % 7 = 2
        ),
        r AS (
          SELECT url, warc_ts, n_chars,
                 ROW_NUMBER() OVER (
                   PARTITION BY url ORDER BY warc_ts DESC, n_chars DESC
                 ) AS rn,
                 COUNT(*) OVER (PARTITION BY url) AS n_snapshots
          FROM snaps
        )
        SELECT url, warc_ts, n_chars, CAST(n_snapshots AS BIGINT) AS n_snapshots
        FROM r WHERE rn = 1
    """


def _changelog_batch(batch: pa.Table) -> pa.Table:
    """Deterministic CDC changelog synthesized from a documents batch —
    base rows (seq 0, op I) plus per-key inserts/updates/deletes whose
    seq numbers are distinct per key by construction. The RULE is the
    fixture (shared verbatim with the SQL twin); :func:`upsert_merge`
    itself never sees it — it folds whatever (key, seq, op) rows
    arrive. All masks are vectorized polars expressions."""
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", "lang", "n_chars"])).with_columns(
        pl.col("n_chars").cast(pl.Int64)
    )
    d = pl.col("doc_id")
    base = df.with_columns(seq=pl.lit(0, pl.Int64), op=pl.lit("I"))
    upd = (
        df.filter(d % 5 == 1)
        .with_columns(
            n_chars=pl.col("n_chars") + 100,
            seq=(1 + d % 3).cast(pl.Int64),
            op=pl.lit("U"),
        )
    )
    dele = (
        df.filter(d % 5 == 2)
        .with_columns(seq=(1 + d % 2).cast(pl.Int64), op=pl.lit("D"))
    )
    upd2 = (
        df.filter(d % 35 == 1)
        .with_columns(
            n_chars=pl.col("n_chars") + 500,
            seq=pl.lit(5, pl.Int64),
            op=pl.lit("U"),
        )
    )
    ins = (
        df.filter(d % 11 == 3)
        .with_columns(
            doc_id=d + 1_000_000_000,
            n_chars=(d % 997).cast(pl.Int64),
            seq=pl.lit(2, pl.Int64),
            op=pl.lit("I"),
        )
    )
    resurrect = (
        df.filter((d % 5 == 2) & (d % 3 == 0))
        .with_columns(n_chars=pl.lit(7, pl.Int64), seq=pl.lit(3, pl.Int64), op=pl.lit("I"))
    )
    cols = ["doc_id", "lang", "n_chars", "seq", "op"]
    return pl.concat([t.select(cols) for t in (base, upd, dele, upd2, ins, resurrect)]).to_arrow().cast(
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("lang", pa.string()),
                ("n_chars", pa.int64()),
                ("seq", pa.int64()),
                ("op", pa.string()),
            ]
        )
    )


def upsert_merge(sf_dir: str, num_buckets: int = 32):
    """CDC merge-on-read — the Delta/Hudi/Iceberg upsert compaction
    every mutable-table lakehouse runs: fold a base snapshot (implicit
    inserts at seq 0) with an insert/update/delete changelog into the
    CURRENT state. Max-seq wins per key; a trailing delete removes the
    key; a later insert resurrects it. Output one row per live key:
    ``(doc_id, lang, n_chars, last_seq, n_ops)`` with ``n_ops`` the
    total log rows folded (base included).

    Ray shape — partial argmax before the shuffle (the
    :func:`snapshot_latest` fold): each batch reduces its log rows to
    one max-seq candidate per key plus a count, then ONE
    ``groupby(bucket(key)).map_groups`` fold finishes the argmax, sums
    the counts and drops keys whose final op is D. The exchange
    carries ≤ one slim row per key per batch; payload columns would
    stay in the scan tasks at 100 TB (re-joined by key from the
    bucketed layout). Seq ties cannot occur per key by construction,
    but the fold still totally orders on (seq, op, n_chars) so it is
    deterministic on any input."""
    import numpy as np
    import ray.data as rd

    from wbot_ray.pipelines.common import read_table

    docs = read_table(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    _OUT = pa.schema(
        [
            ("bucket", pa.int64()),
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("n_chars", pa.int64()),
            ("seq", pa.int64()),
            ("op", pa.string()),
            ("n_ops", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        log = pl.from_arrow(_changelog_batch(batch))
        df = (
            log.sort(["doc_id", "seq", "op", "n_chars"], descending=[False, True, True, True])
            .group_by("doc_id", maintain_order=True)
            .agg(
                lang=pl.col("lang").first(),
                n_chars=pl.col("n_chars").first(),
                seq=pl.col("seq").first(),
                op=pl.col("op").first(),
                n_ops=pl.len().cast(pl.Int64),
            )
            .with_columns(
                bucket=(pl.col("doc_id").hash(seed=0) % np.uint64(num_buckets)).cast(
                    pl.Int64
                )
            )
        )
        return df.select([f.name for f in _OUT]).to_arrow().cast(_OUT)

    def fold(group: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(group.drop_columns(["bucket"]))
            .sort(["doc_id", "seq", "op", "n_chars"], descending=[False, True, True, True])
            .group_by("doc_id", maintain_order=True)
            .agg(
                lang=pl.col("lang").first(),
                n_chars=pl.col("n_chars").first(),
                last_seq=pl.col("seq").first(),
                op=pl.col("op").first(),
                n_ops=pl.col("n_ops").sum(),
            )
            .filter(pl.col("op") != "D")
        )
        return df.select(["doc_id", "lang", "n_chars", "last_seq", "n_ops"]).to_arrow().cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("lang", pa.string()),
                    ("n_chars", pa.int64()),
                    ("last_seq", pa.int64()),
                    ("n_ops", pa.int64()),
                ]
            )
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def upsert_merge_oracle_sql() -> str:
    """DuckDB twin: same changelog rule, window argmax + count, final
    delete filter."""
    return """
        WITH base AS (
          SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
                 CAST(0 AS BIGINT) AS seq, 'I' AS op
          FROM documents
        ),
        ops AS (
          SELECT doc_id, lang, CAST(n_chars + 100 AS BIGINT),
                 CAST(1 + doc_id % 3 AS BIGINT), 'U'
          FROM documents WHERE doc_id % 5 = 1
          UNION ALL
          SELECT doc_id, lang, CAST(n_chars AS BIGINT),
                 CAST(1 + doc_id % 2 AS BIGINT), 'D'
          FROM documents WHERE doc_id % 5 = 2
          UNION ALL
          SELECT doc_id, lang, CAST(n_chars + 500 AS BIGINT),
                 CAST(5 AS BIGINT), 'U'
          FROM documents WHERE doc_id % 35 = 1
          UNION ALL
          SELECT doc_id + 1000000000, lang, CAST(doc_id % 997 AS BIGINT),
                 CAST(2 AS BIGINT), 'I'
          FROM documents WHERE doc_id % 11 = 3
          UNION ALL
          SELECT doc_id, lang, CAST(7 AS BIGINT), CAST(3 AS BIGINT), 'I'
          FROM documents WHERE doc_id % 5 = 2 AND doc_id % 3 = 0
        ),
        log AS (SELECT * FROM base UNION ALL SELECT * FROM ops),
        folded AS (
          SELECT doc_id, lang, n_chars, seq, op,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id
                   ORDER BY seq DESC, op DESC, n_chars DESC
                 ) AS BIGINT) AS rn,
                 CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_ops
          FROM log
        )
        SELECT doc_id, lang, n_chars, seq AS last_seq, n_ops
        FROM folded WHERE rn = 1 AND op <> 'D'
    """
