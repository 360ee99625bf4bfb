"""Multimodal stage tests — RAW codecs + numpy feature extraction."""

from __future__ import annotations

import numpy as np
import pytest

from tiny_lingua_ray.sources.media import make_media_table
from tiny_lingua_ray.stages.multimodal import (
    AudioFeatures,
    ImageFeatures,
    decode_audio,
    decode_image,
    dhash64,
    encode_raw_audio,
    encode_raw_image,
    resize_block_mean,
)


def test_raw_image_roundtrip():
    img = np.arange(24 * 32 * 3, dtype=np.uint8).reshape(24, 32, 3)
    assert (decode_image(encode_raw_image(img)) == img).all()


def test_real_codec_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 not actually decodable jpeg")
    with pytest.raises(NotImplementedError):
        decode_audio(b"\xff\xfb\x90\x44 not actually decodable mp3")


def test_bmp_real_format_roundtrip():
    """A genuine 24-bit BMP (odd width -> nonzero row padding) decodes
    back to the exact pixels, and feature extraction over BMP payloads
    matches the RAW-container path bit for bit."""
    from tiny_lingua_ray.stages.multimodal import ImageFeatures, encode_bmp

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (23, 31, 3), dtype=np.uint8)  # 31*3 % 4 != 0
    assert (decode_image(encode_bmp(img)) == img).all()

    import pyarrow as pa

    stage = ImageFeatures()
    out_bmp = stage(
        pa.table({"media_id": pa.array([1], pa.int64()),
                  "payload": pa.array([encode_bmp(img)], pa.binary())})
    ).to_pandas()
    out_raw = stage(
        pa.table({"media_id": pa.array([1], pa.int64()),
                  "payload": pa.array([encode_raw_image(img)], pa.binary())})
    ).to_pandas()
    assert out_bmp.equals(out_raw)


def test_wav_real_format_roundtrip():
    """A genuine 16-bit PCM WAV decodes to the quantized samples, and
    feature extraction over WAV payloads matches the RAW path when the
    source samples sit on the int16 grid (quantization-exact)."""
    from tiny_lingua_ray.stages.multimodal import (
        AudioFeatures,
        encode_raw_audio,
        encode_wav,
    )

    rng = np.random.RandomState(7)
    # samples already on the int16 grid -> WAV round-trip is exact
    q = rng.randint(-32768, 32768, 4000).astype(np.float64) / 32768.0
    samples = q.astype(np.float32)
    dec, rate = decode_audio(encode_wav(samples, 16000))
    assert rate == 16000
    np.testing.assert_allclose(dec, samples, atol=1.0 / 32768.0)

    import pyarrow as pa

    stage = AudioFeatures()
    out_wav = stage(
        pa.table({"media_id": pa.array([1], pa.int64()),
                  "payload": pa.array([encode_wav(samples, 16000)],
                                      pa.binary())})
    ).to_pandas()
    out_raw = stage(
        pa.table({"media_id": pa.array([1], pa.int64()),
                  "payload": pa.array(
                      [encode_raw_audio(dec, 16000)], pa.binary())})
    ).to_pandas()
    assert out_wav.equals(out_raw)
    # stereo + 8-bit widths also decode
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(
            np.repeat(np.array([100, -100], "<i2"), 2).tobytes()
        )
    st, r = decode_audio(buf.getvalue())
    assert r == 8000 and len(st) == 2  # stereo averaged to mono


def test_resize_block_mean_constant():
    img = np.full((16, 16, 3), 7, dtype=np.uint8)
    out = resize_block_mean(img, 4, 4)
    assert out.shape == (4, 4, 3)
    assert np.allclose(out, 7.0)


def test_dhash_similar_images_close():
    rng = np.random.RandomState(0)
    a = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    b = a.copy()
    b[0, 0] = 255 - b[0, 0]  # tiny change
    c = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    ham_ab = bin(dhash64(a) ^ dhash64(b)).count("1")
    ham_ac = bin(dhash64(a) ^ dhash64(c)).count("1")
    assert ham_ab <= ham_ac


def test_image_features_stage():
    t = make_media_table(8)
    imgs = t.filter(
        np.array([k == "image" for k in t.column("kind").to_pylist()])
    )
    out = ImageFeatures()(imgs)
    assert "payload" not in out.column_names
    assert out.column("img_width").to_pylist() == imgs.column(
        "meta_width"
    ).to_pylist()
    assert all(0 <= v <= 255 for v in out.column("mean_r").to_pylist())


def test_audio_features_stage():
    t = make_media_table(8)
    auds = t.filter(
        np.array([k == "audio" for k in t.column("kind").to_pylist()])
    )
    out = AudioFeatures(frame_sec=0.1)(auds)
    durs = out.column("duration_sec").to_pylist()
    frames = out.column("n_frames").to_pylist()
    assert all(d > 0 for d in durs)
    # frame sampling: n_frames == ceil(duration / frame_sec)
    for d, f in zip(durs, frames):
        assert f == pytest.approx(np.ceil(d / 0.1), abs=1)


def test_media_table_deterministic():
    assert make_media_table(6).equals(make_media_table(6))


def test_video_roundtrip_and_features(ray_session):
    """RAW video container round-trips exactly; the frame-sampling stage
    emits deterministic per-clip features."""
    import numpy as np
    import ray.data as rd

    from tiny_lingua_ray.sources.media import make_video_table
    from tiny_lingua_ray.stages.multimodal import (
        VideoFeatures,
        decode_video,
        encode_raw_video,
    )

    frames = np.arange(4 * 8 * 8 * 3, dtype=np.uint8).reshape(4, 8, 8, 3)
    out, fps = decode_video(encode_raw_video(frames, fps=30))
    assert fps == 30 and np.array_equal(out, frames)

    t = make_video_table(12)
    got = (
        rd.from_arrow(t)
        .map_batches(VideoFeatures, batch_format="pyarrow", batch_size=4,
                     concurrency=2, num_cpus=1)
        .to_pandas()
        .sort_values("media_id")
    )
    assert len(got) == 12
    # sample_every=5 -> ceil(n/5) sampled frames
    assert (
        got["vid_sampled"].to_numpy()
        == -(-got["vid_frames"].to_numpy() // 5)
    ).all()
    assert (got["fps"] == 24).all()
    # deterministic across runs
    got2 = (
        rd.from_arrow(make_video_table(12))
        .map_batches(VideoFeatures, batch_format="pyarrow", batch_size=4,
                     concurrency=2, num_cpus=1)
        .to_pandas()
        .sort_values("media_id")
    )
    assert got.reset_index(drop=True).equals(got2.reset_index(drop=True))


def test_video_real_codec_guard():
    import pytest as _pytest

    from tiny_lingua_ray.stages.multimodal import decode_video

    with _pytest.raises(NotImplementedError):
        decode_video(b"\x00\x00\x01\xbamp4-ish garbage")


def test_audio_near_dup_finds_perturbed_twins(ray_session):
    """Every amplitude-scaled + noised audio twin must pair with its
    original at Hamming<=3 via the energy-delta fingerprint, and no
    cross pairs appear between unrelated clips."""
    from tiny_lingua_ray.pipelines.queries import QUERIES

    out = QUERIES["audio_near_dup"]("/root/testdata/sf0.001").to_pandas()
    twin = out[(out["id_b"] - out["id_a"]) == 10_000]
    assert len(twin) == 32  # one per synthetic audio clip
    others = out[(out["id_b"] - out["id_a"]) != 10_000]
    assert len(others) == 0, others.head()


def test_afp64_invariances():
    """afp64 is amplitude-invariant and separates unrelated signals."""
    import numpy as np

    from tiny_lingua_ray.stages.multimodal import afp64

    rng = np.random.RandomState(5)
    a = rng.normal(0, 1, 8000)
    assert afp64(a) == afp64(a * 7.5)
    b = rng.normal(0, 1, 8000)
    ham = bin(afp64(a) ^ afp64(b)).count("1")
    assert ham > 10, ham


def test_video_near_dup_finds_perturbed_twins(ray_session):
    """Every corner-perturbed re-encoded video twin pairs with its
    original at Hamming<=3 on the mid-frame dHash; no cross pairs."""
    from tiny_lingua_ray.pipelines.queries import QUERIES

    out = QUERIES["video_near_dup"]("/root/testdata/sf0.001").to_pandas()
    twin = out[(out["id_b"] - out["id_a"]) == 10_000]
    assert len(twin) == 32
    assert len(out[(out["id_b"] - out["id_a"]) != 10_000]) == 0
