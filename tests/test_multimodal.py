"""Multimodal plumbing: stubbed decode kernels run the real Spark pipeline
(schema, batching, determinism); the non-fake path raises the documented
NotImplementedError."""

import pytest

import numpy as np

from searchengines_spark.multimodal import (
    audio_features,
    decode_audio,
    decode_image,
    image_features,
    resize_image,
    sample_frames,
    with_binary_payload,
)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x01\x02abc", fake=False)


def test_fake_decode_deterministic():
    w1, h1, px1 = decode_image(b"hello world!", fake=True)
    w2, h2, px2 = decode_image(b"hello world!", fake=True)
    assert (w1, h1) == (w2, h2) and (px1 == px2).all()
    assert px1.size == w1 * h1
    assert decode_image(b"", fake=True)[2].size == 0


def test_image_features_pipeline(spark):
    docs = spark.createDataFrame(
        [(1, "abc def"), (2, ""), (3, "zzzz" * 50)], ["doc_id", "text"]
    )
    feats = image_features(with_binary_payload(docs)).collect()
    by_id = {r["id"]: r for r in feats}
    assert set(by_id) == {1, 2, 3}
    r = by_id[1]
    assert r["n_bytes"] == 7 and len(r["sha"]) == 16
    assert r["width"] == (ord("a") % 32) + 1 and len(r["feature"]) == 8
    assert by_id[2]["feature"] is None  # empty payload
    # determinism across runs
    feats2 = {r["id"]: r for r in image_features(with_binary_payload(docs)).collect()}
    assert feats2[3]["feature"] == by_id[3]["feature"]


def test_resize_image_exact_box_filter(spark):
    docs = spark.createDataFrame([(1, "abc def"), (2, "")], ["doc_id", "text"])
    out = {r["id"]: r for r in
           resize_image(with_binary_payload(docs), out_w=2, out_h=2).collect()}
    r = out[1]
    # independently recompute the box filter on the fake-decoded pixels
    w, h, px = decode_image(b"abc def", fake=True)
    assert (r["src_w"], r["src_h"]) == (w, h)
    img = px.reshape(h, w)
    yi = np.minimum((np.arange(h) * 2) // h, 1)
    xi = np.minimum((np.arange(w) * 2) // w, 1)
    exp = np.zeros((2, 2)); cnt = np.zeros((2, 2))
    np.add.at(exp, (yi[:, None], xi[None, :]), img)
    np.add.at(cnt, (yi[:, None], xi[None, :]), 1)
    exp = (exp / np.maximum(cnt, 1)).ravel()
    assert np.allclose(r["pixels"], exp, atol=1e-6)
    assert out[2]["pixels"] is None  # empty payload


def test_resize_image_upscale_replicates(spark):
    """Upscaling (out > src): cells with no source pixel of their own must
    replicate the covering source pixel, never silently become 0.0. The
    check is formula-independent: when out >= src every target cell covers
    exactly one source pixel, so the output multiset must be drawn from the
    source pixels, with the corners pinned to the source corners."""
    payload = bytes([1, 2]) + b"ab"  # fake-decodes to w=2, h=3
    df = spark.createDataFrame([(1, bytearray(payload))], ["id", "payload"])
    r = resize_image(df, out_w=8, out_h=8).collect()[0]
    w, h, px = decode_image(payload, fake=True)
    assert (r["src_w"], r["src_h"]) == (2, 3)
    img = px.reshape(h, w)
    got = np.array(r["pixels"], dtype=np.float64).reshape(8, 8)
    src_vals = set(float(np.float32(v)) for v in img.ravel())
    assert all(any(abs(g - s) < 1e-6 for s in src_vals) for g in got.ravel())
    assert abs(got[0, 0] - img[0, 0]) < 1e-6
    assert abs(got[-1, -1] - img[-1, -1]) < 1e-6
    # downscale partition unchanged by the gather rewrite: row 0 of an
    # 8->2 downscale averages the first half of the source rows
    r2 = resize_image(df, out_w=1, out_h=1).collect()[0]
    assert abs(r2["pixels"][0] - img.mean()) < 1e-6


def test_audio_stub_and_features(spark):
    with pytest.raises(NotImplementedError):
        decode_audio(b"xyz", fake=False)
    sr1, w1 = decode_audio(b"xyz", fake=True)
    sr2, w2 = decode_audio(b"xyz", fake=True)
    assert sr1 == sr2 and (w1 == w2).all() and sr1 in (8000, 16000, 24000)
    docs = spark.createDataFrame([(1, "abc def"), (2, "")], ["doc_id", "text"])
    out = {r["id"]: r for r in audio_features(with_binary_payload(docs)).collect()}
    r = out[1]
    assert r["sample_rate"] in (8000, 16000, 24000)
    assert len(r["rms"]) == 8 and all(0.0 <= x <= 1.0 for x in r["rms"])
    assert 0.0 <= r["zero_cross_rate"] <= 1.0
    assert abs(r["duration_s"] - decode_audio(b"abc def", fake=True)[1].size
               / r["sample_rate"]) < 1e-6
    assert out[2]["rms"] is None  # empty payload


def test_sample_frames(spark):
    docs = spark.createDataFrame([(1, "x" * 300), (2, "y")], ["doc_id", "text"])
    frames = sample_frames(with_binary_payload(docs), every_n_bytes=64, max_frames=8).collect()
    per = {}
    for r in frames:
        per.setdefault(r["id"], []).append(r["frame_no"])
    assert sorted(per[1]) == [0, 1, 2, 3]  # 300 // 64 = 4 frames
    assert per[2] == [0]  # min one frame
