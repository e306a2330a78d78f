"""Multimodal column processing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

Design (the part that matters at 100 TB):
- payloads live in a BinaryType column next to typed metadata
  (media_type, width/height/duration, codec) — scans prune to metadata
  unless the payload is actually consumed;
- decode / feature-extract / resize / frame-sample run via mapInPandas:
  one Python worker per partition, Arrow batches in, bounded batch size
  so a partition of large blobs never materializes at once;
- partitioning: blobs are skew bombs — repartition by a uniform key
  before a heavy decode stage so one executor doesn't eat all 4K videos.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
``decode_image`` et al. are stubbed: the deterministic fake path is
exercised end-to-end in tests (schema, batching, partitioning are real);
the real path raises NotImplementedError with the dependency named.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("meta_json", StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("sha256", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

_HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    pass


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a real decoder: dimensions derived
    from the payload hash. Replaced wholesale when PIL is present."""
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real decode — gated on pillow (absent in this container; the
    conditional test in tests/test_multimodal.py proves this path the
    day the dependency exists)."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decode requires pillow; install PIL and replace "
            "_fake_dims with PIL.Image.open(io.BytesIO(payload)).size"
        )
    import io

    import PIL.Image

    return PIL.Image.open(io.BytesIO(payload)).size


def _have_ffprobe() -> bool:
    import shutil as _shutil

    return _shutil.which("ffprobe") is not None


def probe_media_duration(payload: bytes, suffix: str = ".bin") -> float:
    """Real container probe via ffprobe (audio/video duration in
    seconds) — gated on ffmpeg being installed, like decode_image on
    pillow. The payload is spooled to a temp file because ffprobe wants
    a seekable input; per Arrow batch that's one small file per blob,
    deleted immediately (the same shape a real decode stage uses)."""
    if not _have_ffprobe():
        raise NotImplementedError(
            "media probe requires ffmpeg/ffprobe; install ffmpeg — "
            "probe_media_duration then shells out to "
            "'ffprobe -show_entries format=duration'"
        )
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=suffix) as f:
        f.write(payload)
        f.flush()
        out = subprocess.run(
            [
                "ffprobe", "-v", "error", "-show_entries", "format=duration",
                "-of", "default=noprint_wrappers=1:nokey=1", f.name,
            ],
            capture_output=True,
            text=True,
            check=True,
        )
        return float(out.stdout.strip())


def image_features(media: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Extract per-image features. The mapInPandas plumbing — schema,
    Arrow batching, per-partition iteration — is the real scale path;
    only the pixel decode is faked without PIL."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"media_id": [], "n_bytes": [], "sha256": [], "width": [], "height": []}
            for mid, payload in zip(b["media_id"], b["payload"]):
                data = bytes(payload) if payload is not None else b""
                w, h = (
                    decode_image(data) if use_real_decoder else _fake_dims(data)
                )
                out["media_id"].append(mid)
                out["n_bytes"].append(len(data))
                out["sha256"].append(hashlib.sha256(data).hexdigest())
                out["width"].append(w)
                out["height"].append(h)
            yield pd.DataFrame(out)

    # blobs skew partitions; rebalance before the python stage
    n = media.sparkSession.sparkContext.defaultParallelism
    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "payload")
        .repartition(n)
        .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling — same plumbing shape; the ffmpeg call is
    stubbed to a deterministic fake (frame count from payload size)."""

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_no", IntegerType(), False),
            StructField("frame_sha", StringType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, frames, shas = [], [], []
            for mid, payload in zip(b["media_id"], b["payload"]):
                data = bytes(payload) if payload is not None else b""
                n_frames = max(1, len(data) // 64)  # fake: 1 frame per 64B
                for fno in range(0, n_frames, every_n):
                    ids.append(mid)
                    frames.append(fno)
                    shas.append(
                        hashlib.sha256(data + fno.to_bytes(4, "little")).hexdigest()[:16]
                    )
            yield pd.DataFrame({"media_id": ids, "frame_no": frames, "frame_sha": shas})

    n = media.sparkSession.sparkContext.defaultParallelism
    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", "payload")
        .repartition(n)
        .mapInPandas(run, schema=schema)
    )


def synthesize_media(spark, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media table from a text table for testing: payload =
    utf-8 bytes (opaque to everything downstream), round-robin types."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.to_json(F.struct(F.length(text_col).alias("n_chars"))).alias("meta_json"),
    )


THUMB_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mean_px", IntegerType(), False),
        StructField("std_px", IntegerType(), False),
        StructField("grad_energy", LongType(), False),
    ]
)


def thumbnail_features(
    media: DataFrame, out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """REAL vectorized image compute over the (faked) decode: the raw
    payload is rasterized into its _fake_dims grid (the stand-in for a
    codec), then numpy does genuine production work per Arrow batch —
    mean-pool resize to (out_h, out_w), global mean/std, and gradient
    energy (sum |dx|+|dy| over the thumbnail). Only the codec parse is
    a stub; the resize/feature math is the real thing and vectorized
    (no per-pixel Python).
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"media_id": [], "mean_px": [], "std_px": [], "grad_energy": []}
            for mid, payload in zip(b["media_id"], b["payload"]):
                data = bytes(payload) if payload is not None else b""
                w, h = _fake_dims(data)
                buf = np.frombuffer(data, dtype=np.uint8)
                px = np.resize(buf if buf.size else np.zeros(1, np.uint8), h * w)
                img = px.reshape(h, w).astype(np.float64)
                # mean-pool to (out_h, out_w): crop to a divisible grid
                ch, cw = (h // out_h) * out_h, (w // out_w) * out_w
                if ch == 0 or cw == 0:  # tiny image: pad up by tiling
                    img = np.resize(img, (out_h, out_w))
                    thumb = img
                else:
                    thumb = (
                        img[:ch, :cw]
                        .reshape(out_h, ch // out_h, out_w, cw // out_w)
                        .mean(axis=(1, 3))
                    )
                dx = np.abs(np.diff(thumb, axis=1)).sum()
                dy = np.abs(np.diff(thumb, axis=0)).sum()
                out["media_id"].append(mid)
                out["mean_px"].append(int(round(float(thumb.mean()))))
                out["std_px"].append(int(round(float(thumb.std()))))
                out["grad_energy"].append(int(round(float(dx + dy))))
            yield pd.DataFrame(out)

    n = media.sparkSession.sparkContext.defaultParallelism
    return (
        media.filter(F.col("media_type") == "image")
        .select("media_id", "payload")
        .repartition(n)
        .mapInPandas(run, schema=THUMB_FEATURES_SCHEMA)
    )


AUDIO_ENERGY_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("rms", IntegerType(), False),
        StructField("peak", IntegerType(), False),
    ]
)


def audio_frame_energy(
    media: DataFrame, frame_len: int = 256
) -> DataFrame:
    """REAL vectorized audio compute over the (faked) decode: payload
    bytes are interpreted as centered 8-bit PCM samples (the codec-parse
    stand-in), then numpy computes per-frame RMS and peak amplitude over
    fixed-length frames — the VAD/silence-trim primitives of an audio
    curation pipeline. Frame loop is vectorized via reshape; no
    per-sample Python.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, fnos, rmss, peaks = [], [], [], []
            for mid, payload in zip(b["media_id"], b["payload"]):
                data = bytes(payload) if payload is not None else b""
                pcm = (
                    np.frombuffer(data, dtype=np.uint8).astype(np.float64)
                    - 128.0
                )
                if pcm.size == 0:
                    pcm = np.zeros(1)
                n_frames = max(1, pcm.size // frame_len)
                frames = np.resize(pcm, n_frames * frame_len).reshape(
                    n_frames, frame_len
                )
                rms = np.sqrt((frames**2).mean(axis=1))
                peak = np.abs(frames).max(axis=1)
                for i in range(n_frames):
                    ids.append(mid)
                    fnos.append(i)
                    rmss.append(int(round(float(rms[i]))))
                    peaks.append(int(round(float(peak[i]))))
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": fnos, "rms": rmss, "peak": peaks}
            )

    n = media.sparkSession.sparkContext.defaultParallelism
    return (
        media.filter(F.col("media_type") == "audio")
        .select("media_id", "payload")
        .repartition(n)
        .mapInPandas(run, schema=AUDIO_ENERGY_SCHEMA)
    )


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("phash", LongType(), False),
    ]
)


def image_phash(media: DataFrame, out: int = 8) -> DataFrame:
    """Perceptual hash (pHash) per image: mean-pool to a 32x32 raster,
    2D DCT-II (explicit cosine-matrix matmul — numpy only), keep the
    top-left ``out`` x ``out`` low-frequency block, threshold each
    coefficient against the block's median (DC excluded) → 64 bits
    packed into a signed int64.

    This is the standard image near-dup fingerprint: small visual
    edits (recompression, resize, brightness) perturb high-frequency
    DCT coefficients first, so the low-frequency sign pattern is
    stable and Hamming distance ranks perceptual similarity. Only the
    codec parse is the honest stub (_fake_dims raster); the
    DCT/threshold/packing is the real algorithm, vectorized per Arrow
    batch. Pairs are extracted scale-safely in phash_hamming_pairs.
    """
    import numpy as np

    n_in = 32

    # DCT-II basis, orthonormal — computed once per executor batch fn
    k = np.arange(n_in)
    basis = np.sqrt(2.0 / n_in) * np.cos(
        np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n_in)
    )
    basis[0, :] = np.sqrt(1.0 / n_in)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json

        for b in batches:
            ids, hashes = [], []
            metas = (
                b["meta_json"] if "meta_json" in b.columns else [None] * len(b)
            )
            for mid, payload, meta in zip(b["media_id"], b["payload"], metas):
                data = bytes(payload) if payload is not None else b""
                # dims from typed metadata when the catalog carries them
                # (how real pipelines ship width/height); the content-
                # hashed _fake_dims fallback means any byte flip is a
                # "different image" — fine for exact dups, but
                # perturbation robustness needs metadata dims.
                w = h = None
                if meta:
                    try:
                        m = json.loads(meta)
                        w, h = m.get("width"), m.get("height")
                    except (ValueError, TypeError):
                        pass
                if not (w and h):
                    w, h = _fake_dims(data)
                buf = np.frombuffer(data, dtype=np.uint8)
                px = np.resize(buf if buf.size else np.zeros(1, np.uint8), h * w)
                img = px.reshape(h, w).astype(np.float64)
                # canonical pHash smooths BEFORE the DCT: mean-pool the
                # whole raster to n_in x n_in (averaging ~(h·w)/1024
                # pixels per cell) so small payload edits nudge cell
                # means instead of replacing raster pixels outright —
                # this is what makes the low-frequency sign pattern
                # stable under light perturbation. Tiny images tile up.
                # images smaller than the raster are UPSAMPLED by
                # nearest-neighbor pixel repetition, never tiled:
                # tiling doubles the spatial period, which zeroes every
                # odd DCT frequency — half the hash bits would carry no
                # signal and 64-bit collisions explode (measured 1.5M
                # Hamming<=3 pairs over 20k small blobs). NN-repeat
                # keeps the low-frequency content intact, so all 64
                # bits discriminate.
                if h < n_in:
                    r = -(-n_in // h)  # ceil
                    img = np.repeat(img, r, axis=0)
                    h *= r
                if w < n_in:
                    r = -(-n_in // w)
                    img = np.repeat(img, r, axis=1)
                    w *= r
                ch, cw = (h // n_in) * n_in, (w // n_in) * n_in
                raster = (
                    img[:ch, :cw]
                    .reshape(n_in, ch // n_in, n_in, cw // n_in)
                    .mean(axis=(1, 3))
                )
                coeffs = basis @ raster @ basis.T
                block = coeffs[:out, :out].copy()
                flat = block.flatten()
                med = np.median(flat[1:])  # DC excluded from the median
                # tolerance keyed to the raster's energy scale: rasters
                # with structurally-zero coefficients (flat images,
                # tiled small images — every odd frequency vanishes)
                # would otherwise emit float-noise SIGN bits, making
                # the hash unstable under perceptual no-ops like a
                # uniform brightness shift. Deviations within eps of
                # the median deterministically map to 0.
                eps = 1e-8 * max(1.0, abs(flat[0]))
                bits = (flat > med + eps).astype(np.uint64)
                val = np.uint64(0)
                for i, bit in enumerate(bits):
                    val |= np.uint64(bit) << np.uint64(i)
                ids.append(mid)
                hashes.append(int(val.astype(np.int64)))  # wrap to signed
            yield pd.DataFrame({"media_id": ids, "phash": hashes})

    n = media.sparkSession.sparkContext.defaultParallelism
    cols = ["media_id", "payload"] + (
        ["meta_json"] if "meta_json" in media.columns else []
    )
    return (
        media.filter(F.col("media_type") == "image")
        .select(*cols)
        .repartition(n)
        .mapInPandas(run, schema=PHASH_SCHEMA)
    )


def phash_hamming_pairs(
    hashes: DataFrame, radius: int = 3, max_bucket: int | None = None
) -> DataFrame:
    """All pairs with Hamming(phash_a, phash_b) <= radius, without the
    all-pairs join: pigeonhole banding over four 16-bit bands — any
    pair within radius <= 3 agrees on at least one band exactly
    (4 bands, <=3 differing bits → recall 1), so candidates come from
    four equi-joins on (band, 16-bit value) and the verify step is one
    bit_count(XOR) per candidate. The same topology as the SimHash
    pair extractor in functions/dedup.py, widened to 64-bit hashes.
    ``max_bucket`` drops degenerate bands (e.g. all-zero high bits on
    near-constant rasters) exactly like the LSH bucket caps."""
    if radius > 3:
        raise ValueError(
            f"radius {radius} needs >4 bands for recall 1 with 16-bit "
            "bands; use more/narrower bands"
        )
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("phash"), 16 * i)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("bv"),
            )
            for i in range(4)
        ]
    )
    b = hashes.select("media_id", "phash", F.explode(bands).alias("bk")).select(
        "media_id", "phash", F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv")
    )
    if max_bucket is not None:
        from pyspark.sql.window import Window

        b = (
            b.withColumn(
                "__bsz", F.count(F.lit(1)).over(Window.partitionBy("band", "bv"))
            )
            .filter(F.col("__bsz") <= max_bucket)
            .drop("__bsz")
        )
    left = b.select(
        F.col("media_id").alias("id_a"), F.col("phash").alias("ha"), "band", "bv"
    )
    right = b.select(
        F.col("media_id").alias("id_b"), F.col("phash").alias("hb"), "band", "bv"
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        left.join(right, ["band", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= radius)
        .distinct()
    )
