"""Multimodal plumbing tests: schema contract, deterministic fake features,
frame-sampling plan shape, stubbed decode behavior."""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_check_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.synth_media(spark, n=48).cache()


def test_media_schema(media):
    assert media.schema == multimodal.MEDIA_SCHEMA
    kinds = {r[0] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_deterministic(media):
    a = {r["media_id"]: r["features"]
         for r in multimodal.extract_features(media).collect()}
    b = {r["media_id"]: r["features"]
         for r in multimodal.extract_features(media.repartition(7)).collect()}
    assert a == b
    assert all(len(v) == multimodal.FEATURE_DIM for v in a.values())
    # matches the local numpy computation exactly
    row = media.filter("media_id = 5").select("payload").head()
    assert a[5] == pytest.approx(
        multimodal.fake_features(bytes(row[0])).tolist())


def test_real_decode_is_stubbed():
    with pytest.raises(multimodal.DecodeNotAvailable):
        multimodal.real_decode(b"bytes", "image/png")


def test_frame_sample_plan(media):
    frames = multimodal.frame_sample_plan(media, every_ms=1000)
    rows = frames.collect()
    assert rows
    vids = {r["media_id"]: r["duration_ms"]
            for r in media.filter("kind = 'video'").collect()}
    per_vid = {}
    for r in rows:
        per_vid.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert set(per_vid) == set(vids)
    for mid, ts in per_vid.items():
        assert sorted(ts) == list(range(0, vids[mid], 1000))
