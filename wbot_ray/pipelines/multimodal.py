"""Multimodal payload plumbing — opaque ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages.

The container has no image/audio codecs, so the *decode kernels* are
stubs: ``ImageDecoder.decode`` raises ``NotImplementedError`` and the
pipelines run on ``fake_decode`` — a deterministic pure-Python stand-in
with the same signature/shape contract. Everything Ray-side is real and
tested: the binary schema, actor ``__init__``-once setup, batch sizing
for large payloads, and the feature-output layout.

At 100 TB the rule encoded here: payload bytes never transit a shuffle —
features are extracted in the first ``map_batches`` after the read and
the binary column is dropped immediately (``select`` projection), so all
wide stages downstream move only small feature rows.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

from wbot_ray.pipelines.common import read_table

__all__ = [
    "PAYLOAD_SCHEMA",
    "ImageDecoder",
    "FeatureExtractor",
    "FrameSampler",
    "AudioChunker",
    "payload_features",
    "frame_features",
    "audio_features",
    "payload_table",
]

# canonical multimodal row: opaque bytes + typed metadata
PAYLOAD_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),  # "image/fake" | "audio/fake" | ...
        ("n_bytes", pa.int64()),
    ]
)


class ImageDecoder:
    """Decode seam. A real deployment plugs PIL/ffmpeg here; the stub
    keeps the exact contract (bytes → HxWxC uint8 array)."""

    def decode(self, payload: bytes) -> "np.ndarray":
        raise NotImplementedError(
            "image/audio codecs are not available in this environment; "
            "use fake_decode (deterministic stand-in) or inject a real codec"
        )

    @staticmethod
    def fake_decode(payload: bytes, h: int = 4, w: int = 4, c: int = 3) -> np.ndarray:
        """Deterministic fake: payload bytes → tiled uint8 image."""
        raw = np.frombuffer(payload, dtype=np.uint8)
        need = h * w * c
        if raw.size == 0:
            raw = np.zeros(1, dtype=np.uint8)
        rep = np.resize(raw, need)
        return rep.reshape(h, w, c)


class FeatureExtractor:
    """Actor-pool stage: model/codec setup once per actor in __init__
    (here: the decoder + a fixed projection 'model'), vectorized work per
    batch in __call__."""

    def __init__(self, embed_dim: int = 8) -> None:
        self.decoder = ImageDecoder()
        rng = np.random.RandomState(1234)
        self.proj = rng.standard_normal((48, embed_dim))  # the 'model'
        self.embed_dim = embed_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        md5s, crcs, embeds = [], [], []
        for p in payloads:
            md5s.append(hashlib.md5(p).hexdigest())
            crcs.append(zlib.crc32(p))
            img = ImageDecoder.fake_decode(p)
            embeds.append((img.reshape(-1).astype(np.float64) @ self.proj).tolist())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_type": batch.column("media_type"),
                "n_bytes": batch.column("n_bytes"),
                "payload_md5": pa.array(md5s, pa.string()),
                "payload_crc32": pa.array(crcs, pa.uint32()),
                "embed": pa.array(embeds, pa.list_(pa.float64())),
            }
        )


def payload_table(sf_dir: str):
    """Documents re-materialized as multimodal rows: the text bytes stand
    in for the opaque media payload (deterministic, schema-faithful)."""

    def to_payload(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        payloads = [t.encode() for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array(["image/fake"] * len(payloads), pa.string()),
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            },
            schema=PAYLOAD_SCHEMA,
        )

    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        to_payload, batch_format="pyarrow"
    )


class FrameSampler:
    """Actor-pool frame-sampling stage (the video pattern): one payload
    row explodes into its sampled frames — fixed frame length, fixed
    stride — each frame hashed and feature-extracted. A real deployment
    plugs ffmpeg keyframe extraction into ``cut_frames``; the
    deterministic byte-slicing stand-in keeps the exact plumbing (actor
    ``__init__``-once setup, row explosion, bounded batch of large
    payloads, per-frame feature layout) real and testable."""

    def __init__(self, frame_len: int = 128, stride: int = 128, embed_dim: int = 4) -> None:
        self.frame_len = frame_len
        self.stride = stride
        rng = np.random.RandomState(77)
        self.proj = rng.standard_normal((frame_len, embed_dim))

    def cut_frames(self, payload: bytes) -> list[bytes]:
        """Deterministic stand-in for a codec's frame extraction: fixed
        byte windows every ``stride`` bytes (ffmpeg seam)."""
        n = len(payload)
        starts = range(0, max(1, n - self.frame_len + 1), self.stride)
        return [payload[s : s + self.frame_len] for s in starts]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_id, o_idx, o_nb, o_md5, o_emb = [], [], [], [], []
        for d, p in zip(ids, payloads):
            for fi, frame in enumerate(self.cut_frames(p)):
                o_id.append(d)
                o_idx.append(fi)
                o_nb.append(len(frame))
                o_md5.append(hashlib.md5(frame).hexdigest())
                raw = np.zeros(self.frame_len)
                arr = np.frombuffer(frame, dtype=np.uint8)
                raw[: len(arr)] = arr
                o_emb.append((raw @ self.proj).tolist())
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "frame_idx": pa.array(o_idx, pa.int32()),
                "frame_bytes": pa.array(o_nb, pa.int64()),
                "frame_md5": pa.array(o_md5, pa.string()),
                "frame_embed": pa.array(o_emb, pa.list_(pa.float64())),
            }
        )


class AudioChunker:
    """Actor-pool audio-windowing stage (the audio pattern, complement
    to ``FrameSampler``'s video pattern): one payload row explodes into
    OVERLAPPING analysis windows — window ``win`` samples, hop ``hop``
    — with per-window integer energy. A real deployment plugs an audio
    codec into ``pcm``; the deterministic stand-in (the payload's
    Unicode codepoint stream as fake PCM) keeps the plumbing real:
    actor ``__init__``-once setup, overlapping-window explosion via one
    cumulative-sum pass (no per-window recompute), bounded batches.

    Energy is an exact integer (sum of squared codepoints < 2^53 per
    window), so a DuckDB oracle recomputes it bit-for-bit from
    ``ord(substr(text, j+1, 1))`` — character-based on BOTH sides, no
    ASCII assumption."""

    def __init__(self, win: int = 256, hop: int = 128) -> None:
        self.win = win
        self.hop = hop

    def pcm(self, payload: bytes) -> np.ndarray:
        """Codec seam: bytes → int64 sample array. Stand-in: the UTF-8
        payload's codepoints (vectorized via a utf-32 re-encode)."""
        return np.frombuffer(payload.decode().encode("utf-32-le"), dtype=np.uint32).astype(
            np.int64
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_id, o_idx, o_ns, o_en = [], [], [], []
        for d, p in zip(ids, payloads):
            v = self.pcm(p)
            n = len(v)
            csq = np.concatenate([[0], np.cumsum(v * v)])
            for ci, s in enumerate(range(0, max(1, n - self.win + 1), self.hop)):
                e = min(s + self.win, n)
                o_id.append(d)
                o_idx.append(ci)
                o_ns.append(e - s)
                o_en.append(int(csq[e] - csq[s]))
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "chunk_idx": pa.array(o_idx, pa.int32()),
                "n_samples": pa.array(o_ns, pa.int64()),
                "energy": pa.array(o_en, pa.int64()),
            }
        )


def audio_features(sf_dir: str):
    """Audio-windowing pipeline: payload → actor-pool overlapping-window
    explode → per-window energy (payload dropped at the stage boundary;
    samples never transit a shuffle)."""
    return payload_table(sf_dir).map_batches(
        AudioChunker,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(2, 8),
    )


def frame_features(sf_dir: str):
    """Frame-sampling pipeline: payload → actor-pool frame explode →
    per-frame hash/embedding (payload dropped at the stage boundary;
    frames never transit a shuffle)."""
    return payload_table(sf_dir).map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(2, 8),
    )


def payload_features(sf_dir: str):
    """Full multimodal feature pipeline: binary payload → actor-pool
    extract → md5/crc/embedding features (payload column dropped at the
    stage boundary). Small batches: payload bytes × batch_size must fit
    the actor heap."""
    feats = payload_table(sf_dir).map_batches(
        FeatureExtractor,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(2, 8),  # autoscaling actor pool — sized up on a real cluster
    )
    return feats.select_columns(["doc_id", "n_bytes", "payload_md5"])
