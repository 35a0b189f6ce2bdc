"""Multimodal columns: opaque binary payloads + typed metadata through
actor-pool stages.

The engine treats image/audio/video as ``binary`` columns with typed
metadata, exactly like ``html:binary`` in the frontier. The Ray-side
plumbing (schemas, batch sizing, actor signatures, output layout) is
real and tested; the codec work itself is STUBBED because no image or
audio libraries exist in this container:

- ``MediaDecodeActor`` tries ``import PIL.Image`` / ``import av`` in
  ``__init__`` (once per actor — the stateful-stage seam where a real
  deployment loads codecs/models) and otherwise uses
  ``decode_fake_header`` on the deterministic fake payloads below, or
  raises ``NotImplementedError`` for real media bytes.

Payload format (deterministic fake, for tests/benches):
``b"FAKE" + kind(1B: 0=img,1=aud,2=vid) + width(4B LE) + height(4B LE)
+ n_frames(4B LE) + payload bytes``.

Batch sizing: media rows are orders of magnitude wider than text —
callers must pass small ``batch_size`` (default 32 here vs 512 for
text) so batch x concurrency fits worker heaps (SURVEY §7 hard part e).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"FAKE"
KIND_IMAGE, KIND_AUDIO, KIND_VIDEO = 0, 1, 2

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.int8()),
        ("payload", pa.binary()),
    ]
)

DECODED_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.int8()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("n_bytes", pa.int64()),
        ("feature", pa.list_(pa.float32())),
    ]
)


def encode_fake_media(media_id: int, kind: int, width: int, height: int, n_frames: int, body_len: int = 64) -> bytes:
    """Deterministic fake payload (pure function of the args)."""
    body = bytes((media_id * 31 + i * 7 + kind) % 256 for i in range(body_len))
    return MAGIC + struct.pack("<BIII", kind, width, height, n_frames) + body


def decode_fake_header(payload: bytes) -> tuple[int, int, int, int]:
    """(kind, width, height, n_frames) from a fake payload; raises
    ValueError on anything that is not the fake format."""
    if payload[:4] != MAGIC:
        raise ValueError("not a fake media payload")
    kind, w, h, f = struct.unpack("<BIII", payload[4:17])
    return kind, w, h, f


def fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a codec/model feature vector: byte
    histogram folded to ``dim`` float32 buckets, L2-normalized."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    norm = float(np.linalg.norm(hist))
    return hist / norm if norm else hist


class MediaDecodeActor:
    """Actor-pool decode/feature stage: ``map_batches(MediaDecodeActor,
    concurrency=N, batch_size=32, batch_format="pyarrow")``.

    ``__init__`` probes for real codec libraries once per actor; absent
    (this container), fake payloads decode via the header and real
    media bytes raise ``NotImplementedError`` so nothing silently
    fabricates pixels.
    """

    def __init__(self, feature_dim: int = 8):
        self.feature_dim = feature_dim
        try:  # pragma: no cover - not installed here
            import PIL.Image  # noqa: F401

            self.has_pil = True
        except ImportError:
            self.has_pil = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        kinds, ws, hs, fs, nb, feats = [], [], [], [], [], []
        for p in payloads:
            try:
                kind, w, h, f = decode_fake_header(p)
            except ValueError:
                if self.has_pil:
                    raise NotImplementedError("real-codec path not wired in this container")
                raise NotImplementedError(
                    "media decode requires PIL/av (absent in this container); "
                    "only FAKE payloads are decodable"
                )
            kinds.append(kind)
            ws.append(w)
            hs.append(h)
            fs.append(f)
            nb.append(len(p))
            feats.append(fake_feature(p, self.feature_dim))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.int8()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "n_frames": pa.array(fs, pa.int32()),
                "n_bytes": pa.array(nb, pa.int64()),
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


class FrameSampleActor:
    """Frame-sampling stage signature: emits one row per sampled frame
    index (``flat_map``-shaped via map_batches). Sampling is uniform
    every ``stride`` frames — deterministic."""

    def __init__(self, stride: int = 10):
        self.stride = max(1, stride)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, frames = [], [], []
        for mid, kind, nf in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("n_frames").to_pylist(),
        ):
            for fr in range(0, max(1, nf), self.stride):
                ids.append(mid)
                kinds.append(kind)
                frames.append(fr)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.int8()),
                "frame_index": pa.array(frames, pa.int32()),
            }
        )


def generate_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table (pure function of (seed, n))."""
    rows_id, rows_kind, rows_payload = [], [], []
    for i in range(n):
        h = (i * 2654435761 + seed) & 0xFFFFFFFF
        kind = h % 3
        w = 16 + (h >> 4) % 512
        hh = 16 + (h >> 13) % 512
        nf = 1 if kind == KIND_IMAGE else 1 + (h >> 21) % 100
        rows_id.append(i)
        rows_kind.append(kind)
        rows_payload.append(encode_fake_media(i, kind, w, hh, nf))
    return pa.table(
        {
            "media_id": pa.array(rows_id, pa.int64()),
            "kind": pa.array(rows_kind, pa.int8()),
            "payload": pa.array(rows_payload, pa.binary()),
        }
    )
