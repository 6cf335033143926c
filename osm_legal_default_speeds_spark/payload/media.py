"""Audio/video payload columns: opaque ``binary`` with typed metadata,
decoded and feature-extracted by Arrow-vectorized ``mapInPandas``
kernels — the multimodal plumbing a training-data pipeline needs
(the task brief's image/audio/video axis; images live in
``payload.images``).

Codecs are REAL but dependency-free (this environment ships no
audio/video libraries):

- audio: PCM16LE mono, synthesized as a deterministic sum of
  harmonics per id; decode = ``np.frombuffer``; features = RMS,
  zero-crossing rate, dominant frequency via the Goertzel algorithm
  (pure NumPy DSP — no FFT library needed for a known small
  frequency grid).
- video: a clip is the concatenation of RAW RGB frames (the same
  ``reference_pixels`` generator the image table uses, phase-shifted
  per frame); frame sampling slices the byte buffer — the
  every-k-th-frame decimation a vision pipeline runs before feature
  extraction — and emits image-table-shaped rows.

Scale notes: payload bytes stay inside per-row kernels and never cross
a shuffle; every metadata column is a pure function of the id, so both
tables are deterministic fixtures for oracle checks. A real container
format (mp4/mkv) would slot in behind ``decode`` only — the schema,
batching, and sampling plumbing are format-agnostic.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from osm_legal_default_speeds_spark.payload.images import (
    caption_for,
    encode_raw,
    reference_pixels,
)

AUDIO_SCHEMA = (
    "audio_id string, bytes binary, sample_rate int, n_samples int, "
    "caption string"
)
SAMPLE_RATE = 8000
_FREQS = [220.0, 330.0, 440.0, 550.0, 660.0, 880.0]


def audio_samples(num: int, n_samples: int) -> np.ndarray:
    """Deterministic PCM: fundamental + two harmonics chosen by id."""
    f0 = _FREQS[num % len(_FREQS)]
    t = np.arange(n_samples, dtype=np.float64) / SAMPLE_RATE
    x = (
        0.6 * np.sin(2 * math.pi * f0 * t)
        + 0.25 * np.sin(2 * math.pi * 2 * f0 * t + 0.5)
        + 0.1 * np.sin(2 * math.pi * 3 * f0 * t + 1.0)
    )
    return np.clip(x * 32000.0, -32767, 32767).astype(np.int16)


def encode_pcm16(x: np.ndarray) -> bytes:
    return x.astype("<i2").tobytes()


def decode_pcm16(data: bytes) -> np.ndarray:
    return np.frombuffer(data, dtype="<i2").astype(np.float64)


def goertzel_power(x: np.ndarray, freq: float, sr: int) -> float:
    """Single-bin DFT power (Goertzel recurrence) — the scalar
    REFERENCE implementation. The hot path uses
    :func:`dft_bin_powers` (same quantity, vectorized across a whole
    batch of clips); a pytest pins their agreement. Per-sample Python
    looping is why this stays out of the mapInPandas kernel
    (CLAUDE.md: vectorize across rows)."""
    n = len(x)
    k = int(0.5 + n * freq / sr)
    w = 2.0 * math.pi * k / n
    coeff = 2.0 * math.cos(w)
    s0 = s1 = 0.0
    for v in x:
        s0, s1 = v + coeff * s0 - s1, s0
    return s1 * s1 + s0 * s0 - coeff * s0 * s1


def dft_bin_powers(
    X: np.ndarray, freqs: list[float], sr: int
) -> np.ndarray:
    """Power at the DFT bin nearest each grid frequency, for every row
    of ``X`` (a stack of equal-length clips) in one matmul pair —
    mathematically identical to running the Goertzel recurrence per
    clip per frequency (the recurrence evaluates the same single-bin
    DFT), but (rows x samples) @ (samples x freqs) instead of
    ~samples x freqs Python iterations per row. Returns (rows, freqs)."""
    n = X.shape[1]
    k = np.floor(0.5 + n * np.asarray(freqs, np.float64) / sr)
    w = 2.0 * np.pi * k / n
    ang = np.outer(np.arange(n, dtype=np.float64), w)  # (n, F)
    c = X @ np.cos(ang)
    s = X @ np.sin(ang)
    return c * c + s * s


def synth_audio_table(
    spark: SparkSession, n: int, parts: int | None = None
) -> DataFrame:
    """Deterministic audio+caption table (PCM16 payload)."""
    ids = spark.range(n, numPartitions=parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_np = pdf["id"].to_numpy()
            blobs, counts = [], []
            for i in ids_np.tolist():
                ns = 1600 + (i % 5) * 400  # 0.2-0.6 s clips
                blobs.append(encode_pcm16(audio_samples(i, ns)))
                counts.append(ns)
            yield pd.DataFrame(
                {
                    "audio_id": np.char.add("aud-", ids_np.astype(str)),
                    "bytes": blobs,
                    "sample_rate": np.full(len(ids_np), SAMPLE_RATE, np.int32),
                    "n_samples": np.array(counts, np.int32),
                    "caption": caption_for(ids_np),
                }
            )

    return ids.mapInPandas(gen, AUDIO_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "audio_id string, caption string, rms double, zcr double, "
    "dominant_freq double, duration_s double"
)


def audio_features(audio: DataFrame) -> DataFrame:
    """Decode + DSP features per clip: RMS level, zero-crossing rate,
    dominant frequency from a single-bin DFT scan over the known grid
    (:func:`dft_bin_powers` — the vectorized Goertzel). Rows are
    grouped by (n_samples, sample_rate) inside each Arrow batch so the
    DSP runs as one matmul per group, never per sample in Python
    (CLAUDE.md: vectorize across rows in mapInPandas kernels)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        freq_grid = np.asarray(_FREQS, np.float64)
        for pdf in batches:
            m = len(pdf)
            rms = np.empty(m)
            zcr = np.empty(m)
            dom = np.empty(m)
            dur = np.empty(m)
            xs = [decode_pcm16(b) / 32768.0 for b in pdf["bytes"]]
            lens = np.array([len(x) for x in xs], np.int64)
            srs = pdf["sample_rate"].to_numpy()
            for n, sr in {(int(a), int(b)) for a, b in zip(lens, srs)}:
                idx = np.nonzero((lens == n) & (srs == sr))[0]
                X = np.stack([xs[i] for i in idx])  # (rows, n)
                rms[idx] = np.sqrt(np.mean(X * X, axis=1))
                zcr[idx] = np.mean(
                    np.abs(np.diff(np.signbit(X), axis=1)), axis=1
                )
                P = dft_bin_powers(X, _FREQS, sr)
                dom[idx] = freq_grid[np.argmax(P, axis=1)]
                dur[idx] = n / sr
            yield pd.DataFrame(
                {
                    "audio_id": pdf["audio_id"],
                    "caption": pdf["caption"],
                    "rms": rms,
                    "zcr": zcr,
                    "dominant_freq": dom,
                    "duration_s": dur,
                }
            )

    return audio.select(
        "audio_id", "bytes", "sample_rate", "caption"
    ).mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# video: concatenated raw RGB frames + frame sampling
# ---------------------------------------------------------------------------

VIDEO_SCHEMA = (
    "video_id string, bytes binary, w int, h int, n_frames int, "
    "caption string"
)


def synth_video_table(
    spark: SparkSession, n: int, parts: int | None = None
) -> DataFrame:
    """Deterministic clips: 4-9 raw RGB frames per id, each frame the
    image generator's pattern phase-shifted by the frame index."""
    ids = spark.range(n, numPartitions=parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_np = pdf["id"].to_numpy()
            blobs, ws, hs, nf = [], [], [], []
            for i in ids_np.tolist():
                w, h = 16 + (i % 3) * 8, 12 + (i % 2) * 8
                frames = 4 + i % 6
                buf = b"".join(
                    reference_pixels(i * 1000 + f, w, h).tobytes()
                    for f in range(frames)
                )
                blobs.append(buf)
                ws.append(w)
                hs.append(h)
                nf.append(frames)
            yield pd.DataFrame(
                {
                    "video_id": np.char.add("vid-", ids_np.astype(str)),
                    "bytes": blobs,
                    "w": np.array(ws, np.int32),
                    "h": np.array(hs, np.int32),
                    "n_frames": np.array(nf, np.int32),
                    "caption": caption_for(ids_np),
                }
            )

    return ids.mapInPandas(gen, VIDEO_SCHEMA)


FRAME_SCHEMA = (
    "video_id string, frame_no int, bytes binary, w int, h int, "
    "fmt string, caption string"
)


def sample_frames(video: DataFrame, every: int = 2) -> DataFrame:
    """Every-``every``-th-frame decimation: one output row per sampled
    frame, shaped like the image table ('raw' fmt) so every downstream
    image operator (features, resize, phash near-dup) composes. The
    clip buffer is sliced per frame (only sampled frames are touched)
    and each sampled frame is wrapped in the image codec's raw
    container."""
    if every < 1:
        # fail on the driver at plan time: inside the kernel this is a
        # cryptic range() error (0) or a silent empty output (negative)
        # per executor task
        raise ValueError(f"every must be >= 1, got {every}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "video_id", "frame_no", "bytes", "w", "h", "fmt",
                    "caption",
                )
            }
            for vid, blob, w, h, nf, cap in zip(
                pdf["video_id"], pdf["bytes"], pdf["w"], pdf["h"],
                pdf["n_frames"], pdf["caption"],
            ):
                fsize = int(w) * int(h) * 3
                for f in range(0, int(nf), every):
                    px = np.frombuffer(
                        blob[f * fsize : (f + 1) * fsize], dtype=np.uint8
                    ).reshape(int(h), int(w), 3)
                    out["video_id"].append(vid)
                    out["frame_no"].append(f)
                    out["bytes"].append(encode_raw(px))
                    out["w"].append(int(w))
                    out["h"].append(int(h))
                    out["fmt"].append("raw")
                    out["caption"].append(cap)
            yield pd.DataFrame(out)

    return video.mapInPandas(kernel, FRAME_SCHEMA)
