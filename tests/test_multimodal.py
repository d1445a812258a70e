"""Multimodal decode kernels (SURVEY §2.B L5): the BMP codec is real —
golden-tested byte-level encode/decode, nearest resize vs a numpy
reference, and a PY-oracle check of the Spark mapInPandas feature
pipeline against the same pure-Python computation."""

from __future__ import annotations

import numpy as np
import pytest

from kompactor_spark.operators.multimodal import (
    _image_features,
    bmp_file_size,
    decode_bmp,
    encode_bmp,
    extract_features,
    resize_images,
    resize_nearest,
    sample_frames,
    synth_pixels,
    synthesize_media,
)


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (2, 3), (5, 7), (8, 8), (16, 9)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = decode_bmp(encode_bmp(img))
        np.testing.assert_array_equal(back, img)


def test_bmp_golden_bytes():
    """Byte-level golden: 1×1 red pixel, bottom-up BGR, row padded to 4."""
    img = np.array([[[255, 0, 0]]], dtype=np.uint8)  # RGB red
    b = encode_bmp(img)
    assert b[:2] == b"BM"
    assert len(b) == 54 + 4  # header + one padded row
    assert bmp_file_size(b) == len(b)
    assert b[54:57] == b"\x00\x00\xff"  # stored as BGR
    np.testing.assert_array_equal(decode_bmp(b), img)


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        decode_bmp(b"PNG....not a bmp" * 10)
    with pytest.raises(ValueError):
        decode_bmp(b"")


def test_resize_nearest_reference():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = resize_nearest(img, 2, 2)
    # nearest with floor mapping: rows/cols 0 and 2
    np.testing.assert_array_equal(out, img[[0, 2]][:, [0, 2]])
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    np.testing.assert_array_equal(up[::2, ::2], img)


def test_feature_pipeline_py_oracle(spark):
    """Spark mapInPandas features == pure-Python decode on the same ids."""
    ids = list(range(20))
    df = spark.createDataFrame([(i,) for i in ids], "vec_id: long")
    media = synthesize_media(df, "vec_id", kind="image")
    got = {r.media_id: r for r in extract_features(media).collect()}
    for i in ids:
        img = synth_pixels(i)
        expected = [np.float32(x) for x in _image_features(img)]
        assert got[i].n_bytes == len(encode_bmp(img))
        assert got[i].feature == pytest.approx(expected, abs=1e-6)
        assert got[i].feature[0] == 8.0 and got[i].feature[1] == 8.0  # real dims


def test_resize_spark_roundtrip(spark):
    df = spark.createDataFrame([(i,) for i in range(6)], "vec_id: long")
    media = synthesize_media(df, "vec_id", kind="image")
    out = {r.media_id: r for r in resize_images(media, 4, 4).collect()}
    for i in range(6):
        expected = resize_nearest(synth_pixels(i), 4, 4)
        np.testing.assert_array_equal(decode_bmp(bytes(out[i].payload)), expected)


def test_frame_sampling_real_split(spark):
    """Video payload = concatenated BMPs; every_ms=500 keeps every 2nd."""
    df = spark.createDataFrame([(3,), (4,)], "vec_id: long")
    media = synthesize_media(df, "vec_id", kind="video")
    frames = sample_frames(media, every_ms=500).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    for mid, rows in by_id.items():
        assert [r.frame_idx for r in sorted(rows, key=lambda r: r.frame_idx)] == [0, 1]
        # each sampled frame is a decodable BMP equal to its source frame
        for out_i, src_i in [(0, 0), (1, 2)]:
            row = next(r for r in rows if r.frame_idx == out_i)
            np.testing.assert_array_equal(
                decode_bmp(bytes(row.frame)), synth_pixels(mid * 1000 + src_i)
            )


def test_phash_deterministic_and_collision_rejected(spark):
    """pHash golden values + the verify stage rejecting hash collisions."""
    from kompactor_spark.operators.multimodal import phash64, synth_pixels

    hs = [phash64(synth_pixels(i)) for i in range(50)]
    assert hs == [phash64(synth_pixels(i)) for i in range(50)]  # deterministic
    # the synthetic corpus is known to collide a few sign patterns —
    # byte-level payloads still differ, so any blocked pair from a
    # collision MUST be rejected by the equality verify
    from collections import Counter

    dup_hashes = [h for h, c in Counter(hs).items() if c > 1]
    assert dup_hashes  # the fixture keeps the verify stage load-bearing
    for h in dup_hashes:
        ids = [i for i, x in enumerate(hs) if x == h]
        pix = [synth_pixels(i).tobytes() for i in ids]
        assert len(set(pix)) == len(pix)  # colliding images are NOT equal


def test_pcm16_roundtrip_quantization_bound():
    import numpy as np

    from kompactor_spark.operators.multimodal import decode_pcm16, encode_pcm16, synth_audio

    s = synth_audio(13)
    rt = decode_pcm16(encode_pcm16(s))
    assert rt.shape == s.shape
    # 16-bit quantization: error bounded by half a code step
    assert float(np.max(np.abs(rt - s))) <= 0.5 / 32767.0 * 1.01


def test_audio_features_match_sine_ground_truth(spark):
    import math

    from kompactor_spark.operators.multimodal import extract_audio_features, synthesize_audio

    base = spark.range(0, 8).selectExpr("id AS doc_id")
    rows = {r.media_id: r for r in extract_audio_features(synthesize_audio(base, "doc_id")).collect()}
    assert set(rows) == set(range(8))
    for mid, r in rows.items():
        freq = 100.0 + 20.0 * (mid % 50)
        # sine: RMS = A/sqrt(2), peak = A, ZCR = f (within discretization)
        assert math.isclose(r.rms, 0.5 / math.sqrt(2), rel_tol=5e-3)
        assert math.isclose(r.peak, 0.5, rel_tol=5e-3)
        assert abs(r.zcr_hz - freq) <= 2.0
        assert math.isclose(r.duration_s, 4096 / 8000, rel_tol=1e-9)


def test_l5_audio_features_query(spark):
    from kompactor_spark.queries import all_queries

    rows = all_queries()["l5_audio_features"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    assert all(r.media_id % 4 == 0 for r in rows)
    assert all(0.34 < r.rms < 0.36 for r in rows)
