"""Multimodal plumbing: binary payload columns, mapInPandas feature
extraction, and the gated decode stub."""

import pytest

from document_processor_spark.operators import multimodal


def test_decode_stub_is_gated():
    with pytest.raises(NotImplementedError, match="no decoder for image/png"):
        multimodal.decode_media(b"\x89PNG...", "image/png")


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
