"""Invariants for the session-10 operators: binaryFile-source media
ingestion, audio voice-activity detection, and the CSV interchange
roundtrip.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _load(spark, name):
    return spark.read.parquet(f"{SF_DIR}/{name}.parquet").collect()


def test_binary_ingest_equals_columnar_decode(spark):
    """The source swap (parquet payload column -> binaryFile scan) must be
    invisible downstream: row-for-row identical decode output."""
    from document_processor_spark.operators.multimodal import (
        q_binary_ingest, q_media_decode,
    )

    key = lambda r: r["doc_id"]  # noqa: E731
    a = sorted(q_media_decode(spark, SF_DIR).collect(), key=key)
    b = sorted(q_binary_ingest(spark, SF_DIR).collect(), key=key)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == len(_load(spark, "documents"))


def test_audio_vad_matches_python(spark):
    from document_processor_spark.operators.multimodal import (
        FRAME_BYTES, VAD_T, q_audio_vad,
    )

    want = {}
    for r in _load(spark, "documents"):
        if r["n_chars"] % 3 != 1:
            continue
        px = r["text"][:16 + r["n_chars"] % 24].encode("utf-8")
        for f in range(len(px) // FRAME_BYTES):
            e = sum(px[f * FRAME_BYTES:(f + 1) * FRAME_BYTES])
            want[(r["doc_id"], f)] = (e, e >= VAD_T)

    got = q_audio_vad(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        assert want[(r["doc_id"], r["frame_idx"])] == (r["energy"],
                                                       r["is_active"])
    flags = [r["is_active"] for r in got]
    assert any(flags) and not all(flags)  # threshold actually discriminates


def test_csv_roundtrip_equals_parquet_path(spark):
    """CSV flatten -> write -> multiLine read -> re-assemble -> extract
    must be span-for-span identical to the parquet-fed extraction,
    including docs whose span texts embed newlines and nulls."""
    from document_processor_spark.operators.pipeline_ops import (
        q_extract_csv_roundtrip, q_extract_sql,
    )

    key = lambda r: (r["doc_id"], r["offset"], r["kind"])  # noqa: E731
    a = sorted(q_extract_sql(spark, SF_DIR).collect(), key=key)
    b = sorted(q_extract_csv_roundtrip(spark, SF_DIR).collect(), key=key)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert a  # non-empty
