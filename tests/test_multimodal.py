"""Multimodal plumbing: schema, Arrow batch shape, row-count-changing
frame sampling, and the stubbed real-codec path."""

from __future__ import annotations

import random

import pytest

from pb_etl_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_media,
    encode_fake_media,
    extract_features,
    media_stats,
    sample_frames,
    _real_decode,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rng = random.Random(11)
    rows = []
    for i in range(40):
        w, h, c = rng.randint(8, 64), rng.randint(8, 64), rng.choice([1, 3])
        payload = bytes(rng.getrandbits(8) for _ in range(w * h))
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, encode_fake_media(w, h, c, payload), (f"src{i%4}", len(payload))))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(4)


def test_decode_media(spark, media_df):
    out = decode_media(media_df)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "width", "height", "channels", "n_payload_bytes",
    ]
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 40
    for r in rows.values():
        assert 8 <= r["width"] <= 64 and 8 <= r["height"] <= 64
        assert r["n_payload_bytes"] == r["width"] * r["height"]


def test_extract_features(spark, media_df):
    out = extract_features(media_df).collect()
    assert len(out) == 40
    for r in out:
        assert len(r["features"]) == FEATURE_DIM
        assert abs(sum(r["features"]) - 1.0) < 1e-5  # L1-normalized


def test_extract_features_deterministic(spark, media_df):
    a = {r["media_id"]: r["features"] for r in extract_features(media_df).collect()}
    b = {r["media_id"]: r["features"] for r in extract_features(media_df).collect()}
    assert a == b


def test_sample_frames_explodes_rows(spark, media_df):
    videos = media_df.filter("kind = 'video'")
    n_videos = videos.count()
    frames = sample_frames(videos, n_frames=4)
    out = frames.collect()
    assert len(out) == n_videos * 4
    per_vid = {}
    for r in out:
        per_vid.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in per_vid.values():
        assert sorted(idxs) == [0, 1, 2, 3]


def test_media_stats_jvm_only(spark, media_df):
    stats = {r["kind"]: r for r in media_stats(media_df).collect()}
    assert set(stats) == {"image", "audio", "video"}
    assert all(r["total_bytes"] > 0 for r in stats.values())


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        _real_decode(b"anything")
