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


class TestRealCodecs:
    """PPM / WAV decode for real — pure numpy, no codec library."""

    def _rgb(self, w=6, h=4, seed=5):
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def test_ppm_roundtrip(self):
        from don_crawler_ray.stages.multimodal import decode_ppm, encode_ppm

        rgb = self._rgb()
        assert np.array_equal(decode_ppm(encode_ppm(rgb)), rgb)

    def test_ppm_header_comments(self):
        from don_crawler_ray.stages.multimodal import decode_ppm, encode_ppm

        rgb = self._rgb(3, 2)
        raw = encode_ppm(rgb)
        commented = b"P6\n# a comment\n3 2\n# another\n255\n" + raw.split(b"255\n", 1)[1]
        assert np.array_equal(decode_ppm(commented), rgb)

    def test_ppm_rejects_garbage(self):
        from don_crawler_ray.stages.multimodal import decode_ppm, encode_ppm

        with pytest.raises(ValueError):
            decode_ppm(b"P5\n1 1\n255\n\x00")
        with pytest.raises(ValueError):
            decode_ppm(encode_ppm(self._rgb())[:-5])  # truncated raster

    def test_wav_roundtrip(self):
        from don_crawler_ray.stages.multimodal import decode_wav, encode_wav

        samples = (np.sin(np.linspace(0, 40, 400)) * 20000).astype(np.int16)
        rate, got = decode_wav(encode_wav(16000, samples))
        assert rate == 16000
        assert np.array_equal(got, samples)

    def test_wav_rejects_non_pcm16(self):
        from don_crawler_ray.stages.multimodal import decode_wav, encode_wav
        import struct

        good = encode_wav(8000, np.zeros(4, np.int16))
        bad = good.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1)
        with pytest.raises(ValueError):
            decode_wav(bad)

    def test_resize_nearest_exact(self):
        from don_crawler_ray.stages.multimodal import resize_nearest

        rgb = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
        out = resize_nearest(rgb, 2, 2)
        # rows/cols 0 and 2 survive under (i*4)//2 indexing
        assert np.array_equal(out, rgb[[0, 2]][:, [0, 2]])

    def test_decode_actor_mixed_formats(self):
        from don_crawler_ray.stages.multimodal import (
            KIND_AUDIO,
            KIND_IMAGE,
            MediaDecodeActor,
            encode_ppm,
            encode_wav,
        )

        rgb = self._rgb(8, 5)
        wav = encode_wav(22050, (np.arange(300) % 97).astype(np.int16))
        batch = pa.table(
            {
                "media_id": pa.array([1, 2, 3], pa.int64()),
                "kind": pa.array([0, 1, 0], pa.int8()),
                "payload": pa.array(
                    [encode_ppm(rgb), wav, encode_fake_media(3, 0, 7, 7, 1)],
                    pa.binary(),
                ),
            }
        )
        out = MediaDecodeActor()(batch)
        rows = {r["media_id"]: r for r in out.to_pylist()}
        assert rows[1]["kind"] == KIND_IMAGE
        assert (rows[1]["width"], rows[1]["height"]) == (8, 5)
        assert rows[2]["kind"] == KIND_AUDIO
        assert rows[2]["width"] == 22050 and rows[2]["n_frames"] == 300
        assert rows[3]["width"] == 7  # fake path still works
        for r in rows.values():
            feat = np.array(r["feature"], np.float32)
            assert len(feat) == 8 and abs(float(np.linalg.norm(feat)) - 1.0) < 1e-5

    def test_decode_actor_rejects_compressed(self):
        from don_crawler_ray.stages.multimodal import MediaDecodeActor

        jpegish = pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "kind": pa.array([0], pa.int8()),
                "payload": pa.array([b"\xff\xd8\xff\xe0 not decodable"], pa.binary()),
            }
        )
        with pytest.raises(NotImplementedError):
            MediaDecodeActor()(jpegish)

    def test_resize_stage_on_ray(self, ray_session):
        from don_crawler_ray.stages.multimodal import (
            ImageResizeActor,
            decode_ppm,
            encode_ppm,
            resize_nearest,
        )
        import ray

        rgbs = [self._rgb(10 + i, 6 + i, seed=i) for i in range(20)]
        src = pa.table(
            {
                "media_id": pa.array(list(range(20)), pa.int64()),
                "payload": pa.array([encode_ppm(r) for r in rgbs], pa.binary()),
            }
        )
        out = (
            ray.data.from_arrow(src)
            .map_batches(
                ImageResizeActor,
                fn_constructor_kwargs={"out_w": 4, "out_h": 3},
                batch_format="pyarrow",
                batch_size=8,
                concurrency=2,
                num_cpus=0.5,
            )
            .take_all()
        )
        assert len(out) == 20
        for r in out:
            expect = resize_nearest(rgbs[r["media_id"]], 4, 3)
            assert np.array_equal(decode_ppm(r["payload"]), expect)
            assert (r["width"], r["height"]) == (4, 3)


class TestCodecErrorContracts:
    """Review-hardened contracts: malformed PPM/WAV always raise
    ValueError; non-WAVE RIFF (WebP/AVI) routes to the compressed-media
    NotImplementedError; features are exactly feature_dim long."""

    def test_webp_riff_is_not_implemented_not_valueerror(self):
        from don_crawler_ray.stages.multimodal import MediaDecodeActor
        import struct

        webp = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 " + b"\x00" * 12
        batch = pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "kind": pa.array([0], pa.int8()),
                "payload": pa.array([webp], pa.binary()),
            }
        )
        with pytest.raises(NotImplementedError):
            MediaDecodeActor()(batch)

    def test_wav_short_fmt_chunk(self):
        from don_crawler_ray.stages.multimodal import decode_wav
        import struct

        bad = b"RIFF" + struct.pack("<I", 16) + b"WAVE" + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
        with pytest.raises(ValueError, match="fmt"):
            decode_wav(bad)

    def test_wav_zero_channels(self):
        from don_crawler_ray.stages.multimodal import decode_wav, encode_wav
        import struct

        good = encode_wav(8000, np.zeros(4, np.int16))
        bad = good.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 1, 0), 1)
        with pytest.raises(ValueError, match="0 ch"):
            decode_wav(bad)

    def test_wav_truncated_data_chunk(self):
        from don_crawler_ray.stages.multimodal import decode_wav, encode_wav

        good = encode_wav(8000, np.arange(100, dtype=np.int16))
        with pytest.raises(ValueError, match="overruns"):
            decode_wav(good[:-50])  # data header claims more than remains

    def test_feature_dims_exact_for_small_dim(self):
        from don_crawler_ray.stages.multimodal import (
            audio_feature,
            image_feature,
        )

        rgb = np.zeros((4, 4, 3), np.uint8) + 7
        for dim in (2, 3, 4, 8, 16):
            assert len(image_feature(rgb, dim)) == dim
            assert len(audio_feature(np.arange(50, dtype=np.int16), dim)) == dim
