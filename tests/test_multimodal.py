"""Multimodal plumbing tests: schemas, Arrow batch shapes, determinism,
frame-sampling row expansion, and the guarded real-codec hook.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from unity_to_bigquery_spark.catalog import load_table
from unity_to_bigquery_spark.llm.multimodal import (
    decode_real,
    extract_features,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return synthesize_media(load_table(spark, sf_dir, "documents"))


def test_media_schema(media):
    assert media.schema["payload"].dataType.typeName() == "binary"
    meta = media.schema["meta"].dataType
    assert [f.name for f in meta.fields] == ["format", "width", "height", "n_frames"]


def test_feature_extraction_deterministic(spark, sf_dir, media):
    feats1 = extract_features(media).orderBy("doc_id").collect()
    feats2 = extract_features(media).orderBy("doc_id").collect()
    assert feats1 == feats2
    docs = {r.doc_id: r.n_chars for r in load_table(spark, sf_dir, "documents").collect()}
    for r in feats1:
        assert r.n_bytes == docs[r.doc_id]  # ascii text → bytes == chars
        assert len(r.sha1) == 40
        assert 0 < r.mean_byte < 256


def test_frame_sampling_shape(media):
    frames = sample_frames(media, every_k=4)
    rows = frames.collect()
    assert rows, "no video frames sampled"
    video_ids = {r.doc_id for r in media.filter(F.col("media_type") == "video").collect()}
    assert {r.doc_id for r in rows} <= video_ids
    for r in rows:
        assert r.frame_idx % 4 == 0
        assert isinstance(r.frame_bytes, (bytes, bytearray))


def test_real_codec_hook_is_guarded():
    with pytest.raises(NotImplementedError, match="no codec"):
        decode_real(b"\x00", "image")
