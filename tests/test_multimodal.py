"""Multimodal operators: binary container round-trip through Arrow/pandas,
codec-stub boundary, resize clamping, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
    multimodal as M,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources import (
    tables,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return M.synth_media(tables.load_table(spark, SF_DIR, "documents")).persist()


def test_synth_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "content"]
    assert media.schema["content"].dataType.typeName() == "binary"
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_roundtrip(media):
    decoded = M.decode_media(media)
    rows = {r.media_id: r for r in decoded.collect()}
    for mid, r in rows.items():
        k = mid % 3
        assert r.kind == ["image", "audio", "video"][k]
        if r.kind == "audio":
            assert (r.width, r.height, r.n_frames) == (0, 0, 0)
        elif r.kind == "image":
            assert (r.width, r.height, r.n_frames) == (16 + mid % 64, 16 + mid % 48, 1)
        else:
            assert r.n_frames == 8 + mid % 24
        assert r.payload_len == 64 + mid % 128


def test_decode_rejects_foreign_bytes(spark):
    bad = spark.createDataFrame([(1, bytearray(b"JFIF...not sgmm"))], "media_id long, content binary")
    with pytest.raises(Exception, match="not an SGMM container"):
        M.decode_media(bad).collect()


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_real(b"\xff\xd8\xff\xe0 fake jpeg")


def test_features_shape_and_determinism(media):
    feats = M.extract_features(media).collect()
    assert all(len(r.features) == M.FEATURE_DIM for r in feats)
    assert all(0.0 <= v < 1.0 for r in feats for v in r.features)
    again = {r.media_id: r.features for r in M.extract_features(media).collect()}
    assert all(again[r.media_id] == r.features for r in feats)


def test_resize_clamps_and_preserves_payload(media):
    resized = M.decode_media(M.resize_media(media, 32, 32))
    orig = {r.media_id: r for r in M.decode_media(media).collect()}
    for r in resized.collect():
        o = orig[r.media_id]
        assert r.payload_len == o.payload_len  # payload untouched
        assert r.width <= 32 and r.height <= 32
        if o.width <= 32 and o.height <= 32:
            assert (r.width, r.height) == (o.width, o.height)
        elif o.width and o.height:
            # aspect ratio preserved within floor rounding (relative)
            o_ratio = o.width / o.height
            assert abs(r.width / r.height - o_ratio) / o_ratio < 0.15


def test_frame_sampling_stride(media):
    frames = M.sample_frames(media, every_k=4)
    per = frames.groupBy("media_id").agg(
        F.count("*").alias("n"), F.max("frame_idx").alias("mx")
    )
    meta = {r.media_id: r.n_frames for r in M.decode_media(media).collect()}
    for r in per.collect():
        nf = meta[r.media_id]
        assert r.n == (nf + 3) // 4
        assert r.mx < nf and r.mx % 4 == 0
    # only videos produce frames
    vids = frames.select("media_id").distinct().count()
    assert vids == sum(1 for nf_kind in meta.items() if nf_kind[0] % 3 == 2)
