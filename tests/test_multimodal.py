"""Multimodal stage tests: schema, actor plumbing, stubbed decode."""

import numpy as np
import pyarrow as pa
import pytest

from don_crawler_ray.stages.multimodal import (
    DECODED_SCHEMA,
    FrameSampleActor,
    KIND_IMAGE,
    MediaDecodeActor,
    decode_fake_header,
    encode_fake_media,
    fake_feature,
    generate_media_table,
)


def test_fake_payload_roundtrip():
    p = encode_fake_media(7, KIND_IMAGE, 320, 240, 1)
    assert decode_fake_header(p) == (KIND_IMAGE, 320, 240, 1)


def test_generate_media_deterministic():
    assert generate_media_table(50).equals(generate_media_table(50))
    assert not generate_media_table(50, seed=1).equals(generate_media_table(50, seed=2))


def test_decode_actor_direct():
    t = generate_media_table(40)
    out = MediaDecodeActor()(t)
    assert out.schema.equals(DECODED_SCHEMA)
    assert out.num_rows == 40
    # feature vectors normalized
    feats = out.column("feature").to_pylist()
    for f in feats:
        assert abs(np.linalg.norm(f) - 1.0) < 1e-5


def test_decode_real_media_raises():
    t = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "kind": pa.array([0], pa.int8()),
            "payload": pa.array([b"\x89PNG\r\n..."], pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError):
        MediaDecodeActor()(t)


def test_frame_sampling():
    t = generate_media_table(30)
    decoded = MediaDecodeActor()(t)
    frames = FrameSampleActor(stride=10)(decoded)
    by_id = {}
    for mid, fr in zip(frames.column("media_id").to_pylist(), frames.column("frame_index").to_pylist()):
        by_id.setdefault(mid, []).append(fr)
    nf = dict(zip(decoded.column("media_id").to_pylist(), decoded.column("n_frames").to_pylist()))
    for mid, frs in by_id.items():
        assert frs == list(range(0, max(1, nf[mid]), 10))


def test_media_pipeline_on_ray(ray_session, tmp_path):
    """Full Ray plumbing: parquet -> decode actor pool (small batches)
    -> frame sample -> parquet."""
    import pyarrow.parquet as pq
    import ray

    src = str(tmp_path / "media.parquet")
    pq.write_table(generate_media_table(200), src)
    ds = ray.data.read_parquet(src)
    # fractional num_cpus: two actor pools + write tasks must coexist in
    # the 4-cpu test session without deadlocking on full-CPU actors
    decoded = ds.map_batches(
        MediaDecodeActor, batch_format="pyarrow", batch_size=32, concurrency=2,
        num_cpus=0.5,
    )
    frames = decoded.map_batches(
        FrameSampleActor, batch_format="pyarrow", batch_size=64, concurrency=2,
        num_cpus=0.5,
    )
    out = str(tmp_path / "frames")
    frames.write_parquet(out)
    t = pq.read_table(out)
    assert t.num_rows > 200  # videos expand to multiple frames
    assert set(t.column_names) == {"media_id", "kind", "frame_index"}


def test_fake_feature_deterministic():
    p = encode_fake_media(3, 1, 10, 10, 5)
    assert np.array_equal(fake_feature(p), fake_feature(bytes(p)))
