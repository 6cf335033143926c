"""Audio/video payload plumbing: real dependency-free codecs, decode +
DSP features, frame sampling composing with the image operators."""

import numpy as np
import pytest

from osm_legal_default_speeds_spark.payload.images import (
    decode_image,
    image_features,
    reference_pixels,
)
from osm_legal_default_speeds_spark.payload.media import (
    _FREQS,
    audio_features,
    audio_samples,
    decode_pcm16,
    encode_pcm16,
    sample_frames,
    synth_audio_table,
    synth_video_table,
)


def test_pcm_roundtrip_exact():
    x = audio_samples(7, 2000)
    assert np.array_equal(decode_pcm16(encode_pcm16(x)), x.astype(np.float64))


@pytest.fixture(scope="module")
def audio(spark):
    return synth_audio_table(spark, 24, parts=3).cache()


@pytest.fixture(scope="module")
def video(spark):
    return synth_video_table(spark, 18, parts=3).cache()


def test_audio_features_dominant_freq(audio):
    rows = {r["audio_id"]: r for r in audio_features(audio).collect()}
    assert len(rows) == 24
    for i in range(24):
        r = rows[f"aud-{i}"]
        # the synthesized fundamental must win the Goertzel scan
        assert r["dominant_freq"] == _FREQS[i % len(_FREQS)]
        assert 0.3 < r["rms"] < 0.8
        assert 0.0 < r["zcr"] < 1.0
        assert r["duration_s"] == pytest.approx(
            (1600 + (i % 5) * 400) / 8000.0
        )
        assert r["caption"]  # caption rides the kernel untouched


def test_audio_determinism(spark, audio):
    b = {r["audio_id"]: bytes(r["bytes"])
         for r in synth_audio_table(spark, 24, parts=7).collect()}
    a = {r["audio_id"]: bytes(r["bytes"]) for r in audio.collect()}
    assert a == b


def test_frame_sampling_decodes_to_reference(video):
    frames = sample_frames(video, every=2).collect()
    by_vid: dict = {}
    for r in frames:
        by_vid.setdefault(r["video_id"], []).append(r)
    meta = {r["video_id"]: r for r in video.collect()}
    for vid, rows in by_vid.items():
        i = int(vid.split("-")[1])
        nf = meta[vid]["n_frames"]
        assert len(rows) == (nf + 1) // 2
        for r in rows:
            px = decode_image(bytes(r["bytes"]), r["fmt"])
            exp = reference_pixels(i * 1000 + r["frame_no"], r["w"], r["h"])
            assert np.array_equal(px, exp)  # lossless through the slice
            assert r["caption"] == meta[vid]["caption"]


def test_frame_sampling_rejects_nonpositive_stride(video):
    """every < 1 fails on the driver at plan time — inside the kernel
    every=0 is a cryptic range() error and a negative stride silently
    emits nothing, both per executor task."""
    for bad in (0, -2):
        with pytest.raises(ValueError, match="every must be >= 1"):
            sample_frames(video, every=bad)


def test_sampled_frames_compose_with_image_operators(video):
    frames = sample_frames(video, every=3).withColumnRenamed(
        "video_id", "image_id"
    )
    feats = image_features(frames.drop("frame_no")).collect()
    assert len(feats) > 0
    for r in feats:
        assert r["w"] > 0 and r["h"] > 0


def test_dft_bin_powers_matches_goertzel_reference():
    """The vectorized kernel path (dft_bin_powers, one matmul pair per
    equal-length group) computes the same single-bin DFT power as the
    scalar Goertzel recurrence it replaced in the hot path — the
    recurrence is the reference, the matmul is the implementation."""
    import numpy as np

    from osm_legal_default_speeds_spark.payload.media import (
        _FREQS,
        SAMPLE_RATE,
        audio_samples,
        dft_bin_powers,
        goertzel_power,
    )

    for n in (1600, 2000, 2800):
        X = np.stack(
            [audio_samples(i, n).astype(np.float64) / 32768.0 for i in range(4)]
        )
        got = dft_bin_powers(X, _FREQS, SAMPLE_RATE)
        want = np.array(
            [
                [goertzel_power(X[r], f, SAMPLE_RATE) for f in _FREQS]
                for r in range(4)
            ]
        )
        # identical math, different summation order -> relative tol
        assert np.allclose(got, want, rtol=1e-9, atol=1e-6), (n, got, want)
