"""WARC-lite source/sink — a Common-Crawl-style record format for the
pages table, so the engine can ingest/export web corpora that are NOT
parquet (real crawl archives ship as WARC record streams, one
header-block + payload per fetched page).

This is a deliberately small, self-describing subset of the WARC idea
(versioned header lines + length-prefixed binary payloads — binary-safe
for any html bytes, no escaping), not the full ISO 28500 format: the
container has no warc/gzip libraries, and the point here is the RAY
SHAPE of a record-stream connector, which is format-independent:

- write: one ``map_batches`` pass serializes each Arrow block to one
  ``.warc`` shard file, committed atomically (tmp + rename, the
  ``wbot_ray.sinks`` rule) and named by the content hash of its urls —
  deterministic, so a re-run overwrites the same shards instead of
  duplicating them; the returned manifest Dataset carries
  (shard, n_records, n_bytes) rows.
- read: ``ray.data.read_binary_files`` streams shard files as blocks;
  one ``map_batches`` parse turns each file into pages-schema rows.
  Parallelism = number of shard files (exactly like the parquet reads),
  and a 100-TB archive is just more shards — no stage ever holds more
  than one file.

Record layout (version-tagged, all lengths explicit)::

    WARC-Lite/1.0\\n
    url: <url>\\n
    warc-ts-us: <int64 microseconds since epoch>\\n
    lang: <lang>\\n
    html-length: <n>\\n
    text-length: <m>\\n
    \\n
    <n html bytes>\\n
    <m utf-8 text bytes>\\n
    \\n

Reference parity note: the reference crawler has no archive IO at all
(its fetcher consumes a live socket, ``pkg/services/fetcher/
http_client.go``); this connector exists for the training-data side —
the same role ``read_parquet`` plays for the fixture corpus.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import ray.data

__all__ = ["write_warcish", "read_warcish", "PAGES_ARROW_SCHEMA"]

_MAGIC = b"WARC-Lite/1.0\n"

PAGES_ARROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _encode_batch(batch: pa.Table) -> bytes:
    urls = batch.column("url").to_pylist()
    tss = batch.column("warc_ts").cast(pa.int64()).to_pylist()
    htmls = batch.column("html").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    out = bytearray()
    for url, ts, html, text, lang in zip(urls, tss, htmls, texts, langs):
        tb = text.encode()
        out += _MAGIC
        out += f"url: {url}\n".encode()
        out += f"warc-ts-us: {ts}\n".encode()
        out += f"lang: {lang}\n".encode()
        out += f"html-length: {len(html)}\n".encode()
        out += f"text-length: {len(tb)}\n".encode()
        out += b"\n"
        out += html + b"\n"
        out += tb + b"\n\n"
    return bytes(out)


def _decode_file(data: bytes) -> pa.Table:
    urls: list[str] = []
    tss: list[int] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(_MAGIC, pos):
            raise ValueError(f"bad WARC-lite magic at byte {pos}")
        pos += len(_MAGIC)
        hdr: dict[str, str] = {}
        while True:
            nl = data.index(b"\n", pos)
            line = data[pos:nl]
            pos = nl + 1
            if not line:
                break
            k, _, v = line.decode().partition(": ")
            hdr[k] = v
        hlen = int(hdr["html-length"])
        tlen = int(hdr["text-length"])
        html = data[pos : pos + hlen]
        pos += hlen + 1  # payload + \n
        text = data[pos : pos + tlen].decode()
        pos += tlen + 2  # payload + \n\n
        urls.append(hdr["url"])
        tss.append(int(hdr["warc-ts-us"]))
        htmls.append(html)
        texts.append(text)
        langs.append(hdr["lang"])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_warcish(pages: "ray.data.Dataset", out_dir: str) -> "ray.data.Dataset":
    """Serialize a pages-schema Dataset to WARC-lite shard files under
    ``out_dir`` (one shard per Arrow block, atomic tmp→rename commit,
    shard name = md5 of the block's url list — deterministic across
    re-runs). Returns the manifest Dataset; consume it (e.g.
    ``take_all``) to drive the write."""
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "shard": pa.array([], pa.string()),
                    "n_records": pa.array([], pa.int64()),
                    "n_bytes": pa.array([], pa.int64()),
                }
            )
        payload = _encode_batch(batch)
        key = hashlib.md5("\n".join(batch.column("url").to_pylist()).encode()).hexdigest()
        name = f"shard-{key}.warc"
        tmp = os.path.join(out_dir, f".tmp-{key}")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {
                "shard": pa.array([name], pa.string()),
                "n_records": pa.array([batch.num_rows], pa.int64()),
                "n_bytes": pa.array([len(payload)], pa.int64()),
            }
        )

    return pages.map_batches(write_shard, batch_format="pyarrow")


def read_warcish(in_dir: str) -> "ray.data.Dataset":
    """Stream WARC-lite shards back as a pages-schema Dataset (block
    parallelism = shard count)."""

    def parse(batch: pa.Table) -> pa.Table:
        tables = [_decode_file(b) for b in batch.column("bytes").to_pylist()]
        return (
            pa.concat_tables(tables)
            if tables
            else pa.table({f.name: pa.array([], f.type) for f in PAGES_ARROW_SCHEMA})
        )

    return ray.data.read_binary_files(in_dir).map_batches(parse, batch_format="pyarrow")
