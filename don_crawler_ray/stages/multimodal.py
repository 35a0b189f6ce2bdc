"""Multimodal columns: opaque binary payloads + typed metadata through
actor-pool stages.

The engine treats image/audio/video as ``binary`` columns with typed
metadata, exactly like ``html:binary`` in the frontier. The Ray-side
plumbing (schemas, batch sizing, actor signatures, output layout) is
real and tested. Decoding is REAL for the uncompressed formats pure
numpy can parse, and honestly stubbed for everything that needs a
codec library (absent in this container):

- **PPM (P6) images**: full decode to an ``(h, w, 3)`` uint8 array,
  real luminance-histogram features, and a real nearest-neighbor
  resize stage (``ImageResizeActor``);
- **WAV (RIFF PCM16) audio**: header + sample decode, real RMS /
  zero-crossing / FFT-band features;
- compressed formats (JPEG/PNG/MP4/...): ``MediaDecodeActor`` probes
  ``import PIL.Image`` in ``__init__`` (once per actor — the
  stateful-stage seam where a real deployment loads codecs/models)
  and otherwise raises ``NotImplementedError`` so nothing silently
  fabricates pixels;
- the deterministic FAKE payloads below remain for benches that only
  exercise plumbing.

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


# ---------------------------------------------------------------------------
# REAL decoders — uncompressed formats pure numpy can parse
# ---------------------------------------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) -> (h, w, 3) uint8 pixel array.
    Handles whitespace and ``#`` comments in the header per the netpbm
    spec; raises ValueError on anything else."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM (maxval {maxval}, {w}x{h})")
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, np.uint8).reshape(h, w, 3)


def encode_ppm(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 bytes (the inverse of decode_ppm)."""
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(rgb, np.uint8).tobytes()


def resize_nearest(rgb: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy indexing — the real image
    transform behind ``ImageResizeActor``."""
    h, w, _ = rgb.shape
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return rgb[rows][:, cols]


def _fit_dim(feat: np.ndarray, dim: int) -> np.ndarray:
    """Exactly ``dim`` L2-normalized float32 values — truncate or
    zero-pad first, so every decoder emits the same feature length
    within a batch whatever the payload format."""
    feat = feat.astype(np.float32)
    if len(feat) > dim:
        feat = feat[:dim]
    elif len(feat) < dim:
        feat = np.pad(feat, (0, dim - len(feat)))
    norm = float(np.linalg.norm(feat))
    return feat / norm if norm else feat


def image_feature(rgb: np.ndarray, dim: int = 8) -> np.ndarray:
    """Real image feature: per-channel means + a (dim-3)-bucket
    luminance histogram, fitted to exactly ``dim`` values and
    L2-normalized."""
    means = rgb.reshape(-1, 3).mean(axis=0)
    lum = (rgb @ np.array([0.299, 0.587, 0.114])).ravel()
    hist, _ = np.histogram(lum, bins=max(1, dim - 3), range=(0.0, 255.0))
    return _fit_dim(np.concatenate([means, hist]), dim)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 -> (sample_rate, channel-0 int16 samples).
    Walks the chunk list properly (fmt may not be first); raises
    ValueError on non-PCM16 or malformed files — including short fmt
    chunks, zero channels, and data chunks whose declared size
    overruns the payload (a truncated download must not decode as
    shorter valid audio)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = n_channels = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if pos + 8 + size > len(payload):
            raise ValueError(f"truncated WAV: chunk {cid!r} overruns the payload")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"truncated WAV fmt chunk ({len(body)} bytes)")
            fmt_tag, n_channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt_tag != 1 or bits != 16 or n_channels < 1:
                raise ValueError(
                    f"unsupported WAV (fmt {fmt_tag}, {bits}-bit, {n_channels} ch)"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    samples = np.frombuffer(data[: len(data) - len(data) % (2 * n_channels)], "<i2")
    return int(rate), samples[::n_channels].copy()  # channel 0


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """(rate, int16 mono samples) -> minimal RIFF/WAVE PCM16 bytes."""
    data = np.ascontiguousarray(samples, "<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def audio_feature(samples: np.ndarray, dim: int = 8) -> np.ndarray:
    """Real audio feature: RMS + zero-crossing rate + (dim-2)
    FFT-band energies, fitted to exactly ``dim`` values and
    L2-normalized."""
    x = samples.astype(np.float64)
    if len(x) == 0:
        return np.zeros(dim, np.float32)
    rms = float(np.sqrt((x * x).mean()))
    zcr = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) / max(1, len(x) - 1)
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, max(1, dim - 2))
    return _fit_dim(
        np.concatenate([[rms, zcr * 1000.0], [float(b.sum()) for b in bands]]), dim
    )


class MediaDecodeActor:
    """Actor-pool decode/feature stage: ``map_batches(MediaDecodeActor,
    concurrency=N, batch_size=32, batch_format="pyarrow")``.

    Dispatches per payload on magic bytes: P6 PPM and RIFF/WAVE PCM16
    decode for REAL (pure numpy — pixels/samples out, real features);
    FAKE payloads decode via the header for plumbing benches. For
    anything else ``__init__`` probes for codec libraries once per
    actor (the held-client seam); absent, compressed media raises
    ``NotImplementedError`` so nothing silently fabricates pixels.

    Audio maps onto the decoded schema as ``width = sample_rate``,
    ``height = 1``, ``n_frames = n_samples``.
    """

    def __init__(self, feature_dim: int = 8):
        self.feature_dim = feature_dim
        try:  # pragma: no cover - not installed here
            import PIL.Image  # noqa: F401

            self.has_pil = True
        except ImportError:
            self.has_pil = False

    def _decode_one(self, p: bytes):
        """-> (kind, width, height, n_frames, feature)"""
        if p[:4] == MAGIC:
            kind, w, h, f = decode_fake_header(p)
            return kind, w, h, f, fake_feature(p, self.feature_dim)
        if p[:2] == b"P6":
            rgb = decode_ppm(p)
            return (
                KIND_IMAGE,
                rgb.shape[1],
                rgb.shape[0],
                1,
                image_feature(rgb, self.feature_dim),
            )
        if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            rate, samples = decode_wav(p)
            return (
                KIND_AUDIO,
                rate,
                1,
                len(samples),
                audio_feature(samples, self.feature_dim),
            )
        if self.has_pil:
            raise NotImplementedError("real-codec path not wired in this container")
        raise NotImplementedError(
            "compressed media decode requires PIL/av (absent in this "
            "container); PPM, WAV and FAKE payloads are decodable"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        kinds, ws, hs, fs, nb, feats = [], [], [], [], [], []
        for p in payloads:
            kind, w, h, f, feat = self._decode_one(p)
            kinds.append(kind)
            ws.append(w)
            hs.append(h)
            fs.append(f)
            nb.append(len(p))
            feats.append(feat)
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


class ImageResizeActor:
    """REAL image-resize stage for P6 PPM payloads: decode -> nearest-
    neighbor resize (pure numpy) -> re-encode, emitting the resized
    payload plus old/new dims. Non-PPM payloads raise — resizing
    compressed formats needs a codec library."""

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        out_payloads, src_ws, src_hs = [], [], []
        for p in batch.column("payload").to_pylist():
            rgb = decode_ppm(p)
            src_hs.append(rgb.shape[0])
            src_ws.append(rgb.shape[1])
            out_payloads.append(encode_ppm(resize_nearest(rgb, self.out_w, self.out_h)))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "src_width": pa.array(src_ws, pa.int32()),
                "src_height": pa.array(src_hs, pa.int32()),
                "width": pa.array([self.out_w] * len(ids), pa.int32()),
                "height": pa.array([self.out_h] * len(ids), pa.int32()),
                "payload": pa.array(out_payloads, pa.binary()),
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
