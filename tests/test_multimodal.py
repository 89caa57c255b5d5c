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


def test_resize_geometry_exact():
    g = multimodal._resize_geometry
    assert g(100, 200) == (100, 200)          # fits: untouched (no upscale)
    assert g(256, 256) == (256, 256)
    assert g(512, 256) == (256, 128)          # landscape downscale
    assert g(100, 1000) == (25, 256)          # portrait downscale
    assert g(10000, 1) == (256, 1)            # extreme aspect clamps to >=1
    assert g(1, 10000) == (1, 256)
    # integer floor semantics, not round: 543*256//703 == 197
    assert g(703, 543) == (256, 543 * 256 // 703)


def test_media_resize_pipeline(spark):
    out = multimodal.q_media_resize(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows
    for r in rows:
        assert (r["out_w"], r["out_h"]) == multimodal._resize_geometry(
            r["width"], r["height"])
        assert r["is_downscaled"] == (max(r["width"], r["height"]) > 256)
        assert r["n_out_pixels"] == r["out_w"] * r["out_h"]


def test_frame_sample_fanout(spark):
    out = multimodal.q_frame_sample(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert r["ts_ms"] == r["frame_idx"] * multimodal.FRAME_MS
        assert r["frame_idx"] % multimodal.FRAME_STRIDE == 0
        assert len(r["frame_hash"]) == 32
    for doc_rows in by_doc.values():
        n_frames = doc_rows[0]["n_frames"]
        # every stride-th frame of the run sampled, nothing else
        want = list(range(0, n_frames, multimodal.FRAME_STRIDE))
        assert sorted(r["frame_idx"] for r in doc_rows) == want


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


def test_media_transcode_formats_and_quality(spark):
    import base64

    import pytest

    media = multimodal.fake_media_table(spark, "/root/testdata/sf0.001")
    webp = {r["doc_id"]: r for r in
            multimodal.transcode_media(media).collect()}
    png = {r["doc_id"]: r for r in
           multimodal.transcode_media(media, image_format="png").collect()}
    jp40 = {r["doc_id"]: r for r in
            multimodal.transcode_media(media, image_format="jpeg",
                                       quality=40).collect()}
    assert webp and set(webp) == set(png) == set(jp40)
    for doc_id, w in webp.items():
        n_px = w["n_pixel_bytes"]
        # png is lossless: full pixel run survives the re-encode
        p = png[doc_id]
        raw = base64.b64decode(p["data_b64"])
        d = multimodal.decode_media(raw, p["content_type"])
        assert (d["media_type"], d["width"], d["height"]) == (
            "image/png", p["width"], p["height"])
        assert len(d["pixels"]) == n_px
        # lossy formats keep a quality-proportional prefix
        kept_w = multimodal.decode_media(
            base64.b64decode(w["data_b64"]), w["content_type"])["pixels"]
        assert len(kept_w) == min(n_px, max(1, n_px * 80 // 125))
        kept_j = multimodal.decode_media(
            base64.b64decode(jp40[doc_id]["data_b64"]),
            "image/jpeg")["pixels"]
        assert len(kept_j) == min(n_px, max(1, n_px * 40 // 100))
        # lower quality never enlarges; png is the upper bound
        assert len(kept_j) <= len(d["pixels"])
    with pytest.raises(ValueError):
        multimodal.transcode_media(media, image_format="gif")
    with pytest.raises(ValueError):
        multimodal.transcode_media(media, quality=0)


def test_phash_fixture_is_ascii(spark):
    """The mm_phash_neardup oracle works at code-point level; the Python
    stage hashes bytes.  They agree iff the corpus text is pure ASCII —
    pin that (the same fixture assumption the other fake-codec oracles
    rely on)."""
    import pyspark.sql.functions as F
    bad = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
           .filter(F.length(F.encode("text", "UTF-8")) != F.length("text"))
           .count())
    assert bad == 0


def test_phash_neardup_exact_bruteforce(spark):
    """The pigeonhole bucket join must return EXACTLY the Hamming<=T pairs
    a brute-force all-pairs scan finds — recall 1.0 by the pigeonhole
    guarantee (T+1 chunks), precision 1.0 by the bit_count verify."""
    from document_processor_spark.operators import multimodal as mm

    rows = mm.q_phash_neardup(spark, "/root/testdata/sf0.001").collect()
    got = {(r["d1"], r["d2"]): r["hamming"] for r in rows}
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").collect()
    sigs = {d["doc_id"]: mm.dhash16(d["text"][:32].encode())
            for d in docs if d["n_chars"] % 3 == 0 and len(d["text"]) >= 17}
    want = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= mm.PHASH_HAMMING_T:
                want[(a, b)] = h
    assert got == want
    assert want, "fixture must produce at least one near-dup pair"
