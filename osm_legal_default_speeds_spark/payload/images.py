"""Image+caption payload table: deterministic synthesis, real codecs,
decode / verify / feature-extract / resize operators.

Input contract (BASELINE.json ``input_hint``): an Iceberg-shaped table
with columns ``(image_id:string, bytes:binary, w:int, h:int,
fmt:string, caption:string, phash:long)``. Everything here is
DataFrame + Arrow-batched ``mapInPandas`` / ``pandas_udf`` — no
per-row Python UDFs in any hot path; inner loops are NumPy over whole
batches (the unavoidable per-image codec calls operate on whole-image
ndarrays, i.e. thousands of pixels per Python-level iteration).

Codecs (stdlib-only, so the decode step is REAL, not stubbed, and the
PSNR >= 40 dB per-row invariant is genuinely measured):

- ``png``  — RGB8 PNG, zlib + filter-0 scanlines (lossless).
- ``raw``  — zlib-compressed raw RGB8 (lossless).
- ``q6``   — 6-bit/channel quantized + zlib (lossy; quantization error
  is uniform on [0,3] per channel => PSNR ~= 47 dB, comfortably over
  the 40 dB gate but failing if decode is ever wrong).

Pixel content is a pure integer function of (image_id, x, y, channel),
so any executor — or any other engine — can regenerate the reference
pixels without shipping them: that is what makes the per-row
decoded-pixel invariant testable at any scale with zero data movement.

Scale design:

- Synthesis/decode are narrow ``mapInPandas`` passes: the ``bytes``
  column never crosses a shuffle. Wide operations (dedup groupBys,
  joins, rollups) run on metadata projections (image_id, phash, w, h)
  and re-join by ``image_id`` only if the payload is needed again
  (SURVEY.md §7.3 hard-part 6).
- Batches are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
  at 10^12-image scale partition sizing comes from the table layout
  (Iceberg file/row-group pruning on id ranges), not from this module.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)

_ADJ = ["red", "green", "blue", "dark", "pale", "bright", "dusty"]
_NOUN = ["road", "bridge", "sign", "lane", "tunnel", "crossing"]
_PLACE = ["berlin", "paris", "oslo", "cape town", "austin"]


# ---------------------------------------------------------------------------
# Deterministic reference pixels / captions (pure functions of the id)
# ---------------------------------------------------------------------------

def image_dims(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    w = 24 + (ids % 5) * 8
    h = 16 + (ids % 7) * 8
    return w.astype(np.int32), h.astype(np.int32)


def reference_pixels(image_num: int, w: int, h: int) -> np.ndarray:
    """(h, w, 3) uint8 — integer texture regenerable anywhere. The id is
    additionally embedded verbatim in the first 8 pixels' R channel, so
    two distinct ids can never produce byte-identical images (makes
    exact-dedup groups provably equal to id groups)."""
    y, x = np.mgrid[0:h, 0:w]
    c = np.arange(3)[None, None, :]
    base = (image_num * 31 + x[..., None] * 7 + y[..., None] * 13 + c * 101)
    tex = (x * y)[..., None] & 0xFF
    px = ((base + tex) & 0xFF).astype(np.uint8)
    ident = np.frombuffer(
        struct.pack(">q", image_num), dtype=np.uint8
    )
    px[0, :8, 0] = ident
    return px


def caption_for(ids: np.ndarray) -> np.ndarray:
    adj = np.array(_ADJ)[ids % len(_ADJ)]
    noun = np.array(_NOUN)[ids % len(_NOUN)]
    place = np.array(_PLACE)[ids % len(_PLACE)]
    return np.char.add(
        np.char.add(np.char.add(adj, " "), noun),
        np.char.add(" in ", place),
    )


CAPTION_SQL = (
    "['red','green','blue','dark','pale','bright','dusty'][(({id}) % 7 + 1)::INT]"
    " || ' ' || ['road','bridge','sign','lane','tunnel','crossing'][(({id}) % 6 + 1)::INT]"
    " || ' in ' || ['berlin','paris','oslo','cape town','austin'][(({id}) % 5 + 1)::INT]"
)


def fmt_for(ids: np.ndarray) -> np.ndarray:
    return np.array(["png", "raw", "q6"])[ids % 3]


def phash64(px: np.ndarray) -> int:
    """Perceptual-ish 64-bit hash: 8x8 block-mean of luminance,
    thresholded at its own mean, row-major bit pack (MSB first)."""
    gray = px.astype(np.uint32).sum(axis=2) // 3
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    bits = (blocks > blocks.mean()).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return int(np.int64(np.uint64(val)))  # wrap to signed for LongType


# ---------------------------------------------------------------------------
# Codecs (stdlib zlib/struct only)
# ---------------------------------------------------------------------------

def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # RGB8
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = px.reshape(h, w * 3)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "bad PNG signature"
    pos, idat = 8, b""
    w = h = 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert depth == 8 and ctype == 2, "only RGB8 supported"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    assert (raw[:, 0] == 0).all(), "only filter-0 scanlines supported"
    return raw[:, 1:].reshape(h, w, 3).copy()


def encode_raw(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return struct.pack(">II", w, h) + zlib.compress(px.tobytes(), 1)


def decode_raw(data: bytes) -> np.ndarray:
    w, h = struct.unpack(">II", data[:8])
    return (
        np.frombuffer(zlib.decompress(data[8:]), dtype=np.uint8)
        .reshape(h, w, 3)
        .copy()
    )


def encode_q6(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return struct.pack(">II", w, h) + zlib.compress((px >> 2).tobytes(), 1)


def decode_q6(data: bytes) -> np.ndarray:
    w, h = struct.unpack(">II", data[:8])
    q = np.frombuffer(zlib.decompress(data[8:]), dtype=np.uint8).reshape(h, w, 3)
    return (q << 2).copy()  # dequantize to low edge; error uniform [0,3]


_ENCODERS = {"png": encode_png, "raw": encode_raw, "q6": encode_q6}
_DECODERS = {"png": decode_png, "raw": decode_raw, "q6": decode_q6}
LOSSLESS_FMTS = frozenset({"png", "raw"})


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode one payload; raises on unknown fmt. Real image-codec
    libraries (jpeg/webp) are not in this container — plugging one in is
    a one-line addition to ``_DECODERS``."""
    try:
        dec = _DECODERS[fmt]
    except KeyError:
        raise NotImplementedError(
            f"fmt {fmt!r}: only {sorted(_DECODERS)} codecs are built-in; "
            "register external codecs in _DECODERS"
        ) from None
    return dec(data)


def psnr(ref: np.ndarray, got: np.ndarray) -> float:
    if ref.shape != got.shape:
        return 0.0
    mse = np.mean((ref.astype(np.float64) - got.astype(np.float64)) ** 2)
    if mse == 0.0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


# ---------------------------------------------------------------------------
# Table synthesis (distributed, deterministic)
# ---------------------------------------------------------------------------

def images_from_ids(
    ids_df: DataFrame, dup_group: int | None = None
) -> DataFrame:
    """Deterministic image+caption rows from any single-column ``id``
    (bigint) DataFrame — one narrow ``mapInPandas`` pass, no shuffle, no
    driver materialization. With ``dup_group=g`` the image *content*
    (pixels, dims, fmt, phash — and hence bytes) derives from
    ``(id // g) * g`` while image_id/caption stay per-id: groups of g
    consecutive ids become exact byte-duplicates, the deterministic
    fixture for the dedup operators."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            content = (ids // dup_group) * dup_group if dup_group else ids
            ws, hs = image_dims(content)
            fmts = fmt_for(content)
            captions = caption_for(ids)
            blobs, hashes = [], []
            for i, w, h, fmt in zip(
                content.tolist(), ws.tolist(), hs.tolist(), fmts
            ):
                px = reference_pixels(i, w, h)
                blobs.append(_ENCODERS[fmt](px))
                hashes.append(phash64(px))
            yield pd.DataFrame(
                {
                    "image_id": np.char.add("img-", ids.astype(str)),
                    "bytes": blobs,
                    "w": ws,
                    "h": hs,
                    "fmt": fmts,
                    "caption": captions,
                    "phash": np.array(hashes, dtype=np.int64),
                }
            )

    return ids_df.mapInPandas(gen, IMAGE_SCHEMA)


def synth_image_table(
    spark: SparkSession, n: int, parts: int | None = None
) -> DataFrame:
    """Deterministic image+caption table with the input-contract schema."""
    rng = spark.range(0, n, 1, parts) if parts else spark.range(0, n)
    return images_from_ids(rng)


def _image_num(ids: pd.Series) -> np.ndarray:
    return ids.str.slice(4).astype(np.int64).to_numpy()


# ---------------------------------------------------------------------------
# Operators: decode+verify, features, resize
# ---------------------------------------------------------------------------

VERIFY_SCHEMA = (
    "image_id string, fmt string, psnr double, pixels_ok boolean, "
    "caption_ok boolean, w int, h int, phash long"
)


def decode_and_verify(images: DataFrame) -> DataFrame:
    """Per-row payload invariant (BASELINE.json input_hint): decode the
    binary payload and measure PSNR against the regenerated reference
    pixels (allclose for lossless, >= 40 dB for lossy), plus caption
    equality and phash recompute-match. Narrow mapInPandas — bytes never
    shuffle; output is metadata-only."""

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nums = _image_num(pdf["image_id"])
            exp_caps = caption_for(nums)
            n = len(pdf)
            psnrs = np.empty(n)
            pix_ok = np.zeros(n, dtype=bool)
            hashes = np.empty(n, dtype=np.int64)
            for i in range(n):
                px = decode_image(pdf["bytes"].iloc[i], pdf["fmt"].iloc[i])
                ref = reference_pixels(
                    int(nums[i]), int(pdf["w"].iloc[i]), int(pdf["h"].iloc[i])
                )
                p = psnr(ref, px)
                psnrs[i] = p
                lossless = pdf["fmt"].iloc[i] in LOSSLESS_FMTS
                pix_ok[i] = (
                    np.array_equal(ref, px) if lossless else p >= 40.0
                )
                hashes[i] = phash64(px)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "fmt": pdf["fmt"],
                    "psnr": psnrs,
                    "pixels_ok": pix_ok,
                    "caption_ok": (
                        pdf["caption"].to_numpy() == exp_caps
                    ),
                    "w": pdf["w"],
                    "h": pdf["h"],
                    "phash": hashes,
                }
            )

    return images.mapInPandas(verify, VERIFY_SCHEMA)


FEATURES_SCHEMA = (
    "image_id string, mean_lum double, std_lum double, edge_energy double, "
    "phash long, w int, h int, lum_total bigint, edge_total bigint"
)


def image_features(images: DataFrame) -> DataFrame:
    """Feature extraction: mean/std luminance, gradient edge energy,
    recomputed phash. The downstream dedup/ANN layers consume these
    metadata rows — not the payload.

    ``lum_total``/``edge_total`` are INTEGER-EXACT decode pins: the sum
    of all decoded channel values, and the sum of |forward-difference|
    of the per-pixel channel sums along x and y. Pure integer functions
    of the decoded array, so an oracle engine that regenerates the
    reference pixels (incl. the q6 quantization) reproduces them
    bit-for-bit — no float summation-order hazards, unlike the float
    features."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            mean_l = np.empty(n)
            std_l = np.empty(n)
            edge = np.empty(n)
            hashes = np.empty(n, dtype=np.int64)
            lum_tot = np.empty(n, dtype=np.int64)
            edge_tot = np.empty(n, dtype=np.int64)
            for i in range(n):
                px = decode_image(pdf["bytes"].iloc[i], pdf["fmt"].iloc[i])
                gray = px.astype(np.float64).mean(axis=2)
                mean_l[i] = gray.mean()
                std_l[i] = gray.std()
                gx = np.abs(np.diff(gray, axis=1)).mean() if gray.shape[1] > 1 else 0
                gy = np.abs(np.diff(gray, axis=0)).mean() if gray.shape[0] > 1 else 0
                edge[i] = gx + gy
                hashes[i] = phash64(px)
                s = px.astype(np.int64).sum(axis=2)
                lum_tot[i] = int(s.sum())
                edge_tot[i] = int(
                    np.abs(np.diff(s, axis=1)).sum()
                    + np.abs(np.diff(s, axis=0)).sum()
                )
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "mean_lum": mean_l,
                    "std_lum": std_l,
                    "edge_energy": edge,
                    "phash": hashes,
                    "w": pdf["w"],
                    "h": pdf["h"],
                    "lum_total": lum_tot,
                    "edge_total": edge_tot,
                }
            )

    return images.mapInPandas(feats, FEATURES_SCHEMA)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize; re-encodes with the row's own fmt.
    Returns the full image schema with updated bytes/w/h."""
    if out_w < 1 or out_h < 1:
        # numpy's empty-arange makes a <= 0 target a silent ZERO-pixel
        # image per executor row (empty // 0 raises nothing on an
        # empty array); fail on the driver instead
        raise ValueError(
            f"resize target must be >= 1x1, got {out_w}x{out_h}"
        )

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, hashes = [], []
            for i in range(len(pdf)):
                px = decode_image(pdf["bytes"].iloc[i], pdf["fmt"].iloc[i])
                h, w, _ = px.shape
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                small = px[ys][:, xs]
                blobs.append(_ENCODERS[pdf["fmt"].iloc[i]](small))
                hashes.append(phash64(small))
            out = pdf.copy()
            out["bytes"] = blobs
            out["w"] = np.full(len(pdf), out_w, dtype=np.int32)
            out["h"] = np.full(len(pdf), out_h, dtype=np.int32)
            out["phash"] = np.array(hashes, dtype=np.int64)
            yield out[["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]]

    return images.mapInPandas(rz, IMAGE_SCHEMA)


def phash_near_dup_pairs(
    meta: DataFrame,
    max_hamming: int = 6,
    band_bits: int = 8,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Near-duplicate image pairs by phash banding (LSH on bit-bands):
    two hashes within ``max_hamming`` of each other must agree exactly on
    at least one of the 64/band_bits bands (pigeonhole — which needs
    max_hamming < #bands, enforced), so candidate generation is an
    equi-join per band with COMPLETE recall — no cross product, no
    missed pairs. Input: metadata projection only (image_id, phash);
    the payload column must NOT be in ``meta`` (keeps bytes out of the
    shuffle).

    ``carry`` names extra (narrow!) columns of ``meta`` to ride the band
    rows and come back as ``<col>_a`` / ``<col>_b`` on each pair —
    cheaper than joining pair ids back to a corpus-sized table, which
    has no stats and sort-merge-spills (CLAUDE.md)."""
    nbands = 64 // band_bits
    if max_hamming >= nbands:
        raise ValueError(
            f"max_hamming={max_hamming} with {nbands} bands of "
            f"{band_bits} bits voids the pigeonhole guarantee: a pair "
            f"within the radius could disagree in every band and be "
            f"silently missed. Use band_bits <= {64 // (max_hamming + 1)} "
            f"so that max_hamming < 64/band_bits."
        )
    mask = (1 << band_bits) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("phash"), b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for b in range(nbands)
        ]
    )
    exploded = meta.select(
        F.col("image_id"), F.col("phash"), *carry, F.explode(bands).alias("bk")
    ).select(
        "image_id", "phash", *carry,
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
    )
    # shuffle-hash self-join: identical Exchange subplans -> any
    # upstream phash-extraction pipeline is computed once
    # (ReuseExchange), and the image-metadata table is never broadcast
    # (see operators/dedup.py::minhash_dedup_pairs)
    left = exploded.hint("shuffle_hash").alias("a")
    right = exploded.hint("shuffle_hash").alias("b")
    pairs = (
        left.join(right, ["band", "key"])
        .where(F.col("a.image_id") < F.col("b.image_id"))
        .select(
            F.col("a.image_id").alias("id_a"),
            F.col("b.image_id").alias("id_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
            *[F.col(f"a.{c}").alias(f"{c}_a") for c in carry],
            *[F.col(f"b.{c}").alias(f"{c}_b") for c in carry],
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


def caption_conflict_pairs(
    meta: DataFrame, max_hamming: int = 6, band_bits: int = 8
) -> DataFrame:
    """Label-noise detection for image+caption training data: pairs of
    visually near-duplicate images (phash band LSH, same shape as
    :func:`phash_near_dup_pairs`) whose captions DISAGREE — the rows a
    curation pipeline must reconcile before training, since conflicting
    labels on near-identical inputs teach the model noise.

    Captions are compared as ``xxhash64`` digests carried through the
    band join (8 bytes per row instead of the text, and no join-back of
    pair ids against the corpus-sized table). A hash collision would
    mask a real conflict with probability ~2^-64 per pair — acceptable
    for QA triage; the emitted pairs themselves are exact.

    Input must contain narrow ``image_id, phash, caption`` only."""
    hashed = meta.select(
        "image_id", "phash", F.xxhash64(F.col("caption")).alias("cap_h")
    )
    pairs = phash_near_dup_pairs(
        hashed, max_hamming=max_hamming, band_bits=band_bits, carry=("cap_h",)
    )
    return pairs.where(F.col("cap_h_a") != F.col("cap_h_b")).select(
        "id_a", "id_b", "hamming"
    )


DEFAULT_AR_BUCKETS: tuple[tuple[int, int], ...] = (
    (1, 1),
    (4, 3),
    (3, 4),
    (16, 9),
    (9, 16),
    (3, 2),
    (2, 3),
)


def aspect_ratio_buckets(
    meta: DataFrame,
    buckets: tuple[tuple[int, int], ...] = DEFAULT_AR_BUCKETS,
) -> DataFrame:
    """Aspect-ratio bucketing for batched image training: assign every
    image to the nearest target ratio so a batch can be built from one
    bucket and resized without letterboxing/cropping distortion (the
    standard multi-aspect training trick — batches must be
    shape-homogeneous, so bucket FIRST, then shuffle within buckets).

    The argmin is integer-exact and therefore engine-portable: the
    distance of (w, h) to bucket (bw, bh) is |w/h - bw/bh|; comparing
    two buckets multiplies through by h and by lcm(all bh), giving
    |w*bh - bw*h| * (L/bh) — pure 64-bit integer arithmetic with no
    float rounding to disagree across engines. Ties break to the
    earlier bucket in the list. Pure Column algebra (array_sort over a
    7-struct literal array), map-side, zero shuffles, whole-stage
    codegen. Input needs (image_id, w, h) only."""
    import math

    lcm = math.lcm(*[bh for _, bh in buckets])
    w = F.col("w").cast("bigint")
    h = F.col("h").cast("bigint")
    entries = [
        F.struct(
            (
                F.abs(w * F.lit(bh) - F.lit(bw) * h) * F.lit(lcm // bh)
            ).alias("d"),
            F.lit(i).alias("bucket_id"),
            F.lit(f"{bw}:{bh}").alias("ratio"),
        )
        for i, (bw, bh) in enumerate(buckets)
    ]
    best = F.array_sort(F.array(*entries))[0]
    return meta.select(
        "image_id",
        "w",
        "h",
        best["bucket_id"].alias("bucket_id"),
        best["ratio"].alias("ratio"),
    )


def multimodal_dup_classes(
    meta: DataFrame,
    max_hamming: int = 2,
    band_bits: int = 16,
    max_caption_bucket: int = 64,
) -> DataFrame:
    """Joint image x caption duplicate classification — the curation
    triage an image+caption corpus needs before training, one class per
    pair:

    - ``both``: visually near-duplicate (phash hamming <=
      ``max_hamming``) AND caption identical — a true duplicate; drop
      one row.
    - ``image_only``: visually near-duplicate, captions disagree —
      label noise (same signal as :func:`caption_conflict_pairs`);
      reconcile before training.
    - ``caption_only``: caption identical on visually DISTINCT images —
      boilerplate / low-information captions (scraped alt-text reuse);
      keep the images, down-weight or rewrite the caption.

    Scale shape: the image side is the phash bit-band LSH self-join
    (:func:`phash_near_dup_pairs`) with the 8-byte ``xxhash64`` caption
    digest riding the band rows (``carry=``) — no join-back against the
    corpus-sized table. The caption side is groupBy(cap_h) -> in-bucket
    pair expansion, NOT a self-join: the metadata source is typically a
    ``mapInPandas`` codec node, which defeats canonicalized-plan
    equality and would decode twice (CLAUDE.md); a boilerplate caption
    shared by a corpus-scale slice of rows is a quadratic hot bucket,
    so buckets larger than ``max_caption_bucket`` are dropped (the
    stop-gram rule — such captions carry no pairing signal, only the
    per-caption frequency, which the groupBy already yields). The two
    pair sets are made disjoint by the hamming cut (the caption side
    keeps only ``hamming > max_hamming``), so the union needs no
    dedup. ``max_hamming`` must stay below 64/band_bits for the LSH
    pigeonhole guarantee, keeping the class split exact.

    Input must contain narrow ``image_id, phash, caption`` only (bytes
    never enter a shuffle). The projection is consumed by three passes
    (band join, stop-caption count, bucket collect) — when it hangs off
    an expensive codec node, persist/localCheckpoint ``meta`` first
    (mapInPandas sources defeat plan-equality reuse, CLAUDE.md).
    Output: (id_a, id_b, dup_class)."""
    n_bands = 64 // band_bits
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} voids the LSH pigeonhole "
            f"guarantee with {n_bands} bands of {band_bits} bits: a "
            f"pair within max_hamming could disagree in every band, "
            f"and a missed image-side pair with equal captions would "
            f"be MISCLASSIFIED as caption_only. Require max_hamming < "
            f"64/band_bits (use smaller band_bits for larger radii)."
        )
    hashed = meta.select(
        "image_id", "phash", F.xxhash64(F.col("caption")).alias("cap_h")
    )
    img = phash_near_dup_pairs(
        hashed, max_hamming=max_hamming, band_bits=band_bits, carry=("cap_h",)
    ).select(
        "id_a",
        "id_b",
        F.when(F.col("cap_h_a") == F.col("cap_h_b"), F.lit("both"))
        .otherwise(F.lit("image_only"))
        .alias("dup_class"),
    )
    # stop-caption keys are dropped BEFORE the collect, not after: a
    # corpus-scale boilerplate caption would otherwise materialize its
    # whole bucket in one collect_list aggregation buffer (executor
    # OOM) before a post-hoc size filter could discard it. The count
    # pass is map-side-combinable (O(distinct keys) per task, no big
    # buffers) and the hot-key set is small by construction (each hot
    # key owns > max_caption_bucket rows, so there are < n/cap of
    # them; real boilerplate captions number in the thousands) — hence
    # the explicit broadcast for the anti-join (UDF-shaped sources
    # carry no stats, CLAUDE.md).
    hot_caps = (
        hashed.groupBy("cap_h")
        .count()
        .where(F.col("count") > max_caption_bucket)
        .select("cap_h")
    )
    buckets = (
        hashed.join(F.broadcast(hot_caps), "cap_h", "left_anti")
        .groupBy("cap_h")
        .agg(F.collect_list(F.struct("image_id", "phash")).alias("es"))
        .where(F.size("es") >= 2)
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("es"),
            lambda a: F.filter(
                F.transform(
                    F.col("es"),
                    lambda b: F.struct(
                        a["image_id"].alias("id_a"),
                        b["image_id"].alias("id_b"),
                        F.bit_count(
                            a["phash"].bitwiseXOR(b["phash"])
                        ).alias("hamming"),
                    ),
                ),
                lambda p: p["id_a"] < p["id_b"],
            ),
        )
    )
    cap = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .where(F.col("p.hamming") > max_hamming)
        .select(
            F.col("p.id_a").alias("id_a"),
            F.col("p.id_b").alias("id_b"),
            F.lit("caption_only").alias("dup_class"),
        )
    )
    return img.unionByName(cap)


PATCH_SCHEMA = (
    "image_id string, patch_id int, x int, y int, pw int, ph int, "
    "bytes binary, fmt string, phash long, lum_total bigint"
)


def sample_patches(
    images: DataFrame, grid: int = 2, pw: int = 8, ph: int = 8
) -> DataFrame:
    """Deterministic patch sampling — the still-image analogue of
    video frame-sampling: a ``grid x grid`` lattice of ``pw x ph``
    crops per image, each re-encoded with the row's own codec. One
    expanding ``mapInPandas`` pass (1 -> grid^2 rows); patch offsets
    are pure functions of the image dims, so any engine reproduces the
    exact crops. Output carries per-patch phash for downstream dedup/
    ANN over patches instead of whole images, plus the integer-exact
    ``lum_total`` decode pin (sum of the crop's channel values — an
    oracle regenerating reference pixels reproduces it exactly)."""
    if grid < 1 or pw < 1 or ph < 1:
        # grid=0 silently emits ZERO patches per image (an empty
        # lattice, indistinguishable from an empty corpus downstream);
        # non-positive crop dims emit zero-pixel patches
        raise ValueError(
            f"need grid >= 1 and patch dims >= 1x1, got grid={grid}, "
            f"{pw}x{ph}"
        )

    def patches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "image_id", "patch_id", "x", "y", "pw", "ph",
                "bytes", "fmt", "phash", "lum_total",
            )}
            for i in range(len(pdf)):
                px = decode_image(pdf["bytes"].iloc[i], pdf["fmt"].iloc[i])
                h, w, _ = px.shape
                pid = 0
                for gy in range(grid):
                    for gx in range(grid):
                        x0 = (gx * max(w - pw, 0)) // max(grid - 1, 1)
                        y0 = (gy * max(h - ph, 0)) // max(grid - 1, 1)
                        crop = px[y0 : y0 + ph, x0 : x0 + pw]
                        rows["image_id"].append(pdf["image_id"].iloc[i])
                        rows["patch_id"].append(pid)
                        rows["x"].append(x0)
                        rows["y"].append(y0)
                        rows["pw"].append(crop.shape[1])
                        rows["ph"].append(crop.shape[0])
                        rows["bytes"].append(
                            _ENCODERS[pdf["fmt"].iloc[i]](crop)
                        )
                        rows["fmt"].append(pdf["fmt"].iloc[i])
                        rows["phash"].append(phash64(crop))
                        rows["lum_total"].append(
                            int(crop.astype(np.int64).sum())
                        )
                        pid += 1
            out = pd.DataFrame(rows)
            out["patch_id"] = out["patch_id"].astype("int32")
            for c in ("x", "y", "pw", "ph"):
                out[c] = out[c].astype("int32")
            out["phash"] = out["phash"].astype("int64")
            out["lum_total"] = out["lum_total"].astype("int64")
            yield out

    return images.mapInPandas(patches, PATCH_SCHEMA)


def patch_phash_containment(
    images: DataFrame,
    grid: int = 2,
    pw: int = 8,
    ph: int = 8,
    min_shared: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Sub-image duplicate pairs: images sharing at least
    ``min_shared`` patch phashes — the crop/collage detector that
    whole-image phash misses (a crop changes the global hash but
    reuses patch content). Pipeline: deterministic patch lattice
    (:func:`sample_patches`) -> metadata projection (bytes never
    shuffle) -> EXACT-phash equi-join -> per-pair distinct-source-slot
    count.

    ``n_shared`` counts DISTINCT left-side patch slots, so a patch
    matching several right-side positions (periodic textures) still
    counts once — for byte-identical images it equals ``grid**2``
    regardless of internal repeats.

    Scale shape: groupBy(phash) -> in-bucket pair expansion, NOT a
    self-join. A SHUFFLE_HASH self-join would be semantically equal,
    but its two sides cannot share the upstream exchange here — the
    patch source is a Python ``mapInPandas`` node, which defeats
    Spark's canonicalized-plan equality (same failure mode as
    createDataFrame sources, see CLAUDE.md), so the CODEC DECODE would
    run twice. The groupBy shape runs the decode once, shuffles once
    (keyed by the 64-bit hash — exact equality is the right semantic
    for reused content), and expands pairs inside each tiny bucket
    (bucket size = duplicate multiplicity of one patch). A
    non-discriminative ubiquitous patch (solid color at corpus scale)
    is a quadratic hot bucket: ``max_bucket`` drops buckets larger
    than the cap — the standard stop-gram rule; such patches carry no
    dedup signal. The cap is enforced BEFORE the collect (hot-key
    pre-count + broadcast anti-join), so a corpus-scale bucket never
    materializes in an aggregation buffer; the capped path eagerly
    ``localCheckpoint``-s the narrow patch projection so the codec
    decode still runs exactly ONCE across the count and collect
    passes (a recompute would decode the corpus twice — the
    mapInPandas source defeats plan-equality reuse, CLAUDE.md). Pass
    ``max_bucket=None`` for exact semantics and a fully lazy plan."""
    meta = sample_patches(images, grid=grid, pw=pw, ph=ph).select(
        "image_id", "patch_id", "phash"
    )
    if max_bucket is not None:
        # ~28 bytes/patch row staged to executor MEMORY_AND_DISK: the
        # price of decoding once while scanning twice
        meta = meta.localCheckpoint()
        hot = (
            meta.groupBy("phash")
            .count()
            .where(F.col("count") > max_bucket)
            .select("phash")
        )
        meta = meta.join(F.broadcast(hot), "phash", "left_anti")
    buckets = meta.groupBy("phash").agg(
        F.collect_list(F.struct("image_id", "patch_id")).alias("ps")
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ps"),
            lambda a: F.filter(
                F.transform(
                    F.col("ps"),
                    lambda b: F.struct(
                        a["image_id"].alias("id_a"),
                        b["image_id"].alias("id_b"),
                        a["patch_id"].alias("slot"),
                    ),
                ),
                lambda p: p["id_a"] < p["id_b"],
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_arr).alias("p"))
        .groupBy(
            F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b")
        )
        .agg(F.countDistinct(F.col("p.slot")).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def drop_near_dup_images(
    images: DataFrame, max_hamming: int = 2, band_bits: int = 16
) -> DataFrame:
    """End-to-end image near-duplicate removal — the image-axis twin of
    ``operators.dedup.drop_near_dups``: phash bit-band LSH pairs over
    the METADATA projection (bytes never enter the join or any
    shuffle) -> star connected components over the pair graph (string
    image ids are fine: the algorithm only needs a total order; the
    kept representative is the lexicographic minimum) -> anti-join of
    the full rows against the non-representatives. Rows the LSH never
    pairs survive untouched."""
    from osm_legal_default_speeds_spark.operators.dedup import (
        connected_components,
    )

    pairs = phash_near_dup_pairs(
        images.select("image_id", "phash"),
        max_hamming=max_hamming,
        band_bits=band_bits,
    )
    cc = connected_components(pairs)
    losers = cc.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("image_id")
    )
    return images.join(losers, "image_id", "left_anti")
