"""Oracle + fixture-generator invariants (pure Python, no Spark)."""

from document_processor_spark import contract as C
from document_processor_spark import fixtures, oracle


def test_generator_deterministic():
    a = fixtures.generate_corpus(0.001)
    b = fixtures.generate_corpus(0.001)
    assert a == b


def test_offsets_unique_per_doc(corpus):
    # ordering ties would make reading order ill-defined (T1)
    for d in corpus:
        offs = [s["offset"] for s in d["spans"]]
        assert len(offs) == len(set(offs)), d["doc_id"]


def test_edge_docs_present(corpus):
    ids = {d["doc_id"] for d in corpus}
    for name in ("empty", "glyph-only", "single-span", "all-fallback",
                 "fallback-empty", "unicode", "table-edges",
                 "media-null-text", "media-dup-ref"):
        assert f"doc-edge-{name}" in ids


def test_oracle_skip_semantics(golden):
    spans, m = golden
    # T5: empty, glyph-only and fallback-empty docs excluded, counted
    for name in ("empty", "glyph-only", "fallback-empty"):
        assert f"doc-edge-{name}" not in spans
    assert m.skipped_docs >= 3
    assert m.docs_in == m.docs_out + m.skipped_docs


def test_oracle_order_contiguous(golden):
    spans, _ = golden
    for doc_id, seq in spans.items():
        assert [s[3] for s in seq] == list(range(len(seq))), doc_id


def test_oracle_output_invariants(golden):
    import re
    spans, _ = golden
    glyph = re.compile(C.GLYPH_PATTERN)
    for doc_id, seq in spans.items():
        for kind, text, media_ref, _ in seq:
            assert kind in ("heading", "paragraph", "table", "figure", "media_ref")
            if kind in ("figure", "media_ref"):
                assert media_ref is not None, doc_id  # T7
            else:
                assert media_ref is None, doc_id
            if text is not None:
                assert not glyph.search(text), (doc_id, text)
                assert "  " not in text.replace("\n", "|"), (doc_id, text)
                if kind == "table":
                    # per-cell cleanliness; tabs/newlines are separators (T6)
                    for row in text.split("\n"):
                        for cell in row.split("\t"):
                            assert cell == cell.strip(" \t"), (doc_id, text)
                else:
                    assert text == text.strip(" \t")
            else:
                assert kind == "media_ref"


def test_fallback_counted(golden):
    _, m = golden
    assert m.fallback_pages > 0
    assert m.fallback_docs > 0
    assert 0.0 < m.ocr_fallback_rate < 1.0


def test_fallback_decodes_scan():
    docs = [{"doc_id": "d", "spans": [
        {"kind": "pdf_scan", "text": C.SCAN_PREFIX + __import__("base64").b64encode(b"H1: scanned title").decode(), "media_ref": None, "offset": 0},
    ]}]
    spans, m = oracle.extract_corpus(docs)
    assert spans["d"] == [("heading", "H1: scanned title", None, 0)]
    assert m.fallback_pages == 1


def test_fast_page_drops_scan_spans():
    """A page with embedded text is accepted by the fast pass; its scan
    regions are NOT decoded (reference: fast converter misses bitmap text
    but page has text slices -> accepted, content_extractor.py:105)."""
    import base64
    docs = [{"doc_id": "d", "spans": [
        {"kind": "pdf_text", "text": "real text", "media_ref": None, "offset": 0},
        {"kind": "pdf_scan", "text": "scan:" + base64.b64encode(b"hidden").decode(), "media_ref": None, "offset": 1},
    ]}]
    spans, m = oracle.extract_corpus(docs)
    assert spans["d"] == [("paragraph", "real text", None, 0)]
    assert m.fallback_pages == 0


def test_table_or_media_alone_triggers_fallback():
    """S12: tables/figures alone do not count as text -> page falls back."""
    docs = [{"doc_id": "d", "spans": [
        {"kind": "table_raw", "text": "a\tb", "media_ref": None, "offset": 0},
        {"kind": "media", "text": None, "media_ref": "m-1", "offset": 1},
    ]}]
    spans, m = oracle.extract_corpus(docs)
    # full pass re-emits the same table/media (unconditional acceptance)
    assert spans["d"] == [("table", "a\tb", None, 0), ("media_ref", None, "m-1", 1)]
    assert m.fallback_pages == 1


def test_reading_order_reconstruction():
    """Input arrays are shuffled; order comes from (page, block) (T1)."""
    docs = [{"doc_id": "d", "spans": [
        {"kind": "pdf_text", "text": "p2 first", "media_ref": None, "offset": 2 * C.PAGE_STRIDE},
        {"kind": "pdf_text", "text": "p0 second", "media_ref": None, "offset": 7},
        {"kind": "pdf_text", "text": "p0 first", "media_ref": None, "offset": 3},
        {"kind": "pdf_text", "text": "p1 only", "media_ref": None, "offset": C.PAGE_STRIDE + 1},
    ]}]
    spans, _ = oracle.extract_corpus(docs)
    assert [s[1] for s in spans["d"]] == ["p0 first", "p0 second", "p1 only", "p2 first"]
