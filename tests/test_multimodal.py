"""Multimodal plumbing: binary payload columns, mapInPandas feature
extraction, and the gated decode stub."""

import pytest

from document_processor_spark.operators import multimodal


def test_real_codecs_stay_gated():
    with pytest.raises(NotImplementedError, match="image/png"):
        multimodal.decode_media(b"\x89PNG\r\n\x1a\n...", "image/png")
    with pytest.raises(ValueError, match="unrecognized"):
        multimodal.decode_media(b"garbage", "image/png")


def test_fake_codec_roundtrip():
    payload = multimodal.encode_fake_media("image/png", 320, 200, b"pixels!")
    d = multimodal.decode_media(payload, "image/png")
    assert d == {"media_type": "image/png", "width": 320, "height": 200,
                 "pixels": b"pixels!"}


def test_media_decode_pipeline(spark):
    out = multimodal.q_media_decode(spark, "/root/testdata/sf0.001")
    rows = out.limit(8).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["thumb_w"] == max(1, r["width"] // 2)
        assert r["thumb_h"] == max(1, r["height"] // 2)
        assert len(r["pixel_hash"]) == 32 and r["n_pixel_bytes"] > 0


def test_media_table_and_features(spark):
    media = multimodal.media_table(spark, "/root/testdata/sf0.001")
    assert dict(media.dtypes)["payload"] == "binary"
    feats = multimodal.extract_media_features(media)
    rows = feats.limit(5).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["media_ref"] == f"m-{r['doc_id']}"
        assert 64 <= r["width"] < 704 and 64 <= r["height"] < 544
        assert len(r["payload_hash"]) == 32
        assert r["media_type"] in ("image/png", "audio/wav", "video/mp4")
        assert r["n_bytes"] > 0
