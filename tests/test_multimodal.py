"""Multimodal plumbing: stubbed decode kernels run the real Spark pipeline
(schema, batching, determinism); the non-fake path raises the documented
NotImplementedError."""

import pytest

from searchengines_spark.multimodal import (
    decode_image,
    image_features,
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


def test_sample_frames(spark):
    docs = spark.createDataFrame([(1, "x" * 300), (2, "y")], ["doc_id", "text"])
    frames = sample_frames(with_binary_payload(docs), every_n_bytes=64, max_frames=8).collect()
    per = {}
    for r in frames:
        per.setdefault(r["id"], []).append(r["frame_no"])
    assert sorted(per[1]) == [0, 1, 2, 3]  # 300 // 64 = 4 frames
    assert per[2] == [0]  # min one frame
