"""Data-layout operators — Z-order clustering and zone-map pruning.

At 100 TB the cheapest query is the one that never reads the file: a
one-time CLUSTERED REWRITE of a table (Delta/Iceberg ``OPTIMIZE
ZORDER BY``) makes per-file min/max zone maps selective on EVERY
clustered dimension at once, so a reader prunes files from parquet
footer metadata alone. ``zorder_layout`` is that pass expressed
Ray-Data-first:

1. one vectorized ``map_batches`` computes the 32-bit Morton key
   (bit-interleave of two 16-bit dimensions — here document length and
   a stable language bucket),
2. ONE distributed range-partitioned sort on ``(zkey, doc_id)`` — the
   single all-to-all the rewrite pays,
3. dense global ranks come from block METADATA offsets (the
   ``stages/order.py`` block-offset pattern — no row transits the
   driver), ``file_id = rank // file_rows`` assigns rows to output
   files in z order,
4. a tiny ``groupby(file_id)`` aggregate emits each file's zone map
   (min/max of both dimensions + row count) and evaluates a reference
   range-plus-point predicate against it — the ``survives`` flag IS
   the pruning decision a scan planner would take.

Everything is integer math (Morton interleave, ``md5_number_lower``
language bucket), so the DuckDB oracle recomputes the identical
layout from the raw table with a window function.

Why Morton keys prune: sorting by ``(x, y)`` lexicographically makes
zone maps selective on ``x`` only — every file spans ~the full ``y``
range. The interleave gives locality in BOTH dimensions, so a
predicate on either (or both) prunes most files. The reference engine
has no layout pass at all (it streams fetch results to a sink); this
operator exists for the training-data side, where re-clustering a
crawled corpus by (length, language) is what makes curriculum /
per-language scans cheap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min

from wbot_ray.pipelines.common import md5_lower64, read_table

__all__ = ["zorder_layout", "zorder_layout_oracle_sql", "morton32"]

Z_BITS = 16  # bits per dimension; zkey fits 32 bits
Z_LANG_SALT = "zl:"  # language-bucket hash domain (shared with the SQL twin)

# reference predicate evaluated against every zone map: a length range
# AND one language — the canonical "per-language curriculum slice" scan
Z_PRED_X_LO = 100
Z_PRED_X_HI = 300
Z_PRED_LANG = "en"


def morton32(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized 32-bit Morton (Z-order) key: bit ``i`` of ``x`` lands
    at position ``2i``, bit ``i`` of ``y`` at ``2i + 1``. Plain
    shift/mask formula (16 vectorized iterations), shared term-for-term
    with the SQL twin's generated expression."""
    x = x.astype(np.int64) & 0xFFFF
    y = y.astype(np.int64) & 0xFFFF
    z = np.zeros(len(x), dtype=np.int64)
    for i in range(Z_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def _morton_sql_expr(x: str, y: str) -> str:
    """The same interleave as :func:`morton32`, as one DuckDB integer
    expression (BIGINT shifts/masks — exact)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _lang_bucket(lang: str) -> int:
    """Stable 16-bit language bucket — ``md5_number_lower('zl:'||lang)
    % 65536``, recomputable in DuckDB."""
    return md5_lower64(f"{Z_LANG_SALT}{lang}") % (1 << Z_BITS)


def zorder_layout(sf_dir: str, file_rows: int = 64):
    """Z-order the documents table on (length, language-bucket) and
    emit each output file's ZONE MAP plus whether the reference
    predicate (``n_chars BETWEEN 100 AND 300 AND lang = 'en'``) would
    have to read it.

    Output, one row per planned file: ``file_id``, ``n_docs``,
    ``min_x`` / ``max_x`` (length), ``min_y`` / ``max_y`` (language
    bucket), ``survives`` (1 = the scan must read this file, 0 =
    pruned from metadata alone).

    Scale shape: the sort is the only all-to-all and it is exactly the
    rewrite's required data movement; the zone-map aggregate exchanges
    one slim row per (block × file) — at 100 TB that is the file count,
    millions at most, never the corpus. ``file_rows`` models the
    target file size (rows-per-file stands in for bytes here; a real
    rewrite would cut on bytes)."""
    from wbot_ray.stages.order import assign_crawl_ord

    def keyed(batch: pa.Table) -> pa.Table:
        x = np.minimum(
            batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64),
            (1 << Z_BITS) - 1,
        )
        codes = pc.dictionary_encode(batch.column("lang")).combine_chunks()
        buckets = np.array(
            [_lang_bucket(v) for v in codes.dictionary.to_pylist()], dtype=np.int64
        )
        y = buckets[codes.indices.to_numpy()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "zkey": pa.array(morton32(x, y), pa.int64()),
            }
        )

    ranked, _ = assign_crawl_ord(
        read_table(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        .map_batches(keyed, batch_format="pyarrow")
        .sort(["zkey", "doc_id"]),
        0,
    )

    def file_of(batch: pa.Table) -> pa.Table:
        fid = batch.column("crawl_ord").to_numpy() // file_rows
        return pa.table(
            {
                "file_id": pa.array(fid, pa.int64()),
                "x": batch.column("x"),
                "y": batch.column("y"),
            }
        )

    zones = (
        ranked.map_batches(file_of, batch_format="pyarrow")
        .groupby("file_id")
        .aggregate(
            Count(alias_name="n_docs"),
            Min("x", alias_name="min_x"),
            Max("x", alias_name="max_x"),
            Min("y", alias_name="min_y"),
            Max("y", alias_name="max_y"),
        )
    )
    target_y = _lang_bucket(Z_PRED_LANG)

    def flag(batch: pa.Table) -> pa.Table:
        survives = (
            (batch.column("max_x").to_numpy(zero_copy_only=False) >= Z_PRED_X_LO)
            & (batch.column("min_x").to_numpy(zero_copy_only=False) <= Z_PRED_X_HI)
            & (batch.column("min_y").to_numpy(zero_copy_only=False) <= target_y)
            & (batch.column("max_y").to_numpy(zero_copy_only=False) >= target_y)
        )
        return batch.append_column(
            "survives", pa.array(survives.astype(np.int64), pa.int64())
        )

    return zones.map_batches(flag, batch_format="pyarrow")


def zorder_layout_oracle_sql(file_rows: int = 64) -> str:
    """DuckDB twin: identical Morton expression, identical
    ``row_number // file_rows`` file assignment, identical zone-map
    predicate."""
    zexpr = _morton_sql_expr("x", "y")
    return f"""
        WITH d AS (
          SELECT doc_id,
                 LEAST(n_chars, {(1 << Z_BITS) - 1}) AS x,
                 CAST(md5_number_lower('{Z_LANG_SALT}' || lang) % {1 << Z_BITS} AS BIGINT) AS y
          FROM documents),
        z AS (SELECT doc_id, x, y, {zexpr} AS zkey FROM d),
        r AS (SELECT x, y,
                     (row_number() OVER (ORDER BY zkey, doc_id) - 1) // {file_rows} AS file_id
              FROM z),
        f AS (SELECT file_id,
                     CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
                     CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y
              FROM r GROUP BY file_id)
        SELECT file_id, n_docs, min_x, max_x, min_y, max_y,
               CAST(CASE WHEN max_x >= {Z_PRED_X_LO} AND min_x <= {Z_PRED_X_HI}
                          AND min_y <= (md5_number_lower('{Z_LANG_SALT}{Z_PRED_LANG}') % {1 << Z_BITS})
                          AND max_y >= (md5_number_lower('{Z_LANG_SALT}{Z_PRED_LANG}') % {1 << Z_BITS})
                    THEN 1 ELSE 0 END AS BIGINT) AS survives
        FROM f
    """
