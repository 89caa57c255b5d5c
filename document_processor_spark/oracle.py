"""Pure-Python oracle: the correctness anchor for the Spark engines.

Implements SURVEY.md §2.3 (T1-T7) over the fixture input schema
(FIXTURES.md §1) exactly; every rule is cited to /root/reference in
`contract.py`.  The end-to-end pytest gate asserts per-document
span-sequence equality (kind, text, media_ref, order) between this oracle
and the Spark pipeline (BASELINE.json:14-15).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

from . import contract as C

Span = tuple[str, str | None, str | None, int]  # (kind, text, media_ref, order)


@dataclass
class DocResult:
    doc_id: str
    spans: list[Span]
    pages_in: int = 0
    fallback_pages: int = 0
    skipped: bool = False
    # (page, block) slot of each output span, aligned with `spans` —
    # the inputs to the S21/S22 layout derivation (contract.position_for)
    slots: list[tuple[int, int]] = field(default_factory=list)


@dataclass
class CorpusMetrics:
    docs_in: int = 0
    docs_out: int = 0
    skipped_docs: int = 0
    spans_out: int = 0
    pages_in: int = 0
    fallback_pages: int = 0
    fallback_docs: int = 0

    @property
    def ocr_fallback_rate(self) -> float:
        return self.fallback_pages / self.pages_in if self.pages_in else 0.0


def _extract_span(kind: str, text: str | None, media_ref: str | None,
                  full: bool) -> tuple[str, str | None, str | None] | None:
    """Extract one raw span under the fast (full=False) or full (full=True)
    pipeline.  Returns (kind, text, media_ref) or None when the span yields
    nothing under that pipeline."""
    if kind == C.RAW_PDF_TEXT:
        cleaned = C.clean_text(text or "")
        if not cleaned:
            return None
        return (C.classify_textual(cleaned), cleaned, None)
    if kind == C.RAW_PDF_SCAN:
        if not full:
            return None  # fast pipeline cannot read bitmap regions (T4)
        decoded = C.decode_scan(text or "")
        if decoded is None:
            return None
        cleaned = C.clean_text(decoded)
        if not cleaned:
            return None
        return (C.classify_textual(cleaned), cleaned, None)
    if kind == C.RAW_HTML:
        raw = text or ""
        cleaned = C.clean_text(C.strip_tags(raw))
        if not cleaned:
            return None
        if C.html_density(raw, len(cleaned)) < C.HTML_DENSITY_THRESHOLD:
            return None  # boilerplate block dropped entirely
        k = C.KIND_HEADING if C.html_is_heading(raw) else C.KIND_PARAGRAPH
        return (k, cleaned, None)
    if kind == C.RAW_TABLE:
        flattened = C.flatten_table(text or "")
        if not flattened.strip():
            return None
        return (C.KIND_TABLE, flattened, None)
    if kind == C.RAW_MEDIA:
        alt = C.clean_text(text) if text is not None else ""
        if alt:
            return (C.KIND_FIGURE, alt, media_ref)
        return (C.KIND_MEDIA_REF, None, media_ref)
    return None  # unknown raw kind: tolerated and dropped (S28)


_TIE_NULL = "\x02"


def span_tiebreak(kind: str, text: str | None, media_ref: str | None) -> int:
    """Deterministic secondary sort key for spans sharing one (page, block):
    crc32 of the extracted content.  Shared contract with both Spark engines
    (pipeline.assemble computes the identical crc32 JVM-side), so reading
    order is total and engine-independent even on duplicate offsets."""
    key = f"{kind}\x1f{_TIE_NULL if text is None else text}" \
          f"\x1f{_TIE_NULL if media_ref is None else media_ref}"
    return zlib.crc32(key.encode("utf-8"))


def extract_document(doc_id: str, spans: list[dict],
                     first_page: int = 1,
                     last_page: int | None = None,
                     ocr_pipeline: str = "hybrid") -> DocResult:
    """Run the full per-document contract: reading-order reconstruction (T1),
    per-page fast→full OCR fallback (T4), classification (T2), cleaning (T3),
    renumbering, and skip semantics (T5).  Spans sharing one (page, block)
    slot order by the content tie-break key (see span_tiebreak).
    first_page/last_page (1-based, inclusive) bound the per-page loop —
    the reference's request parameters (app/api.py:69-70,
    content_extractor.py:64-70).

    ocr_pipeline selects the converter chain (models.OcrPipeline,
    api.py:69, content_extractor.py:125-134): "hybrid" = [fast, full]
    with the per-page fallback; "fast" = [fast] only — the fast page is
    the LAST converter, accepted unconditionally, scan regions yield
    nothing; "full" = [full] only — every page full-parsed.  The
    single-converter modes have no fallback chain, so fallback_pages
    stays 0."""
    if ocr_pipeline not in ("hybrid", "fast", "full"):
        raise ValueError(f"unknown ocr_pipeline: {ocr_pipeline!r}")
    if not spans:
        return DocResult(doc_id, [], skipped=True)

    pages: dict[int, list[tuple[int, dict]]] = {}
    for s in spans:
        page, block = C.split_offset(s["offset"])
        if page < first_page - 1 or (last_page is not None
                                     and page > last_page - 1):
            continue
        pages.setdefault(page, []).append((block, s))

    out: list[tuple[str, str | None, str | None]] = []
    slots: list[tuple[int, int]] = []
    fallback_pages = 0
    for page in sorted(pages):
        blocks = pages[page]
        if ocr_pipeline == "full":
            # single full converter: every page full-parsed, accepted
            # unconditionally (it is the last converter)
            pairs = [
                (b, r) for b, s in blocks
                if (r := _extract_span(s["kind"], s.get("text"), s.get("media_ref"), full=True))
                is not None
            ]
        else:
            fast = [(b, _extract_span(s["kind"], s.get("text"), s.get("media_ref"), full=False))
                    for b, s in blocks]
            has_text = any(r is not None and r[0] in C.TEXT_KINDS for _, r in fast)
            if has_text or ocr_pipeline == "fast":
                # fast accepted: it has text, or it is the last (only)
                # converter of the fast-only chain
                pairs = [(b, r) for b, r in fast if r is not None]
            else:
                # last-converter rule: accept the full pass unconditionally
                fallback_pages += 1
                pairs = [
                    (b, r) for b, s in blocks
                    if (r := _extract_span(s["kind"], s.get("text"), s.get("media_ref"), full=True))
                    is not None
                ]
        pairs.sort(key=lambda t: (t[0], span_tiebreak(*t[1])))
        out.extend(r for _, r in pairs)
        slots.extend((page, b) for b, _ in pairs)

    result = [(k, t, m, i) for i, (k, t, m) in enumerate(out)]
    return DocResult(doc_id, result, pages_in=len(pages),
                     fallback_pages=fallback_pages, skipped=not result,
                     slots=slots)


def extract_corpus(docs: list[dict], first_page: int = 1,
                   last_page: int | None = None,
                   ocr_pipeline: str = "hybrid"
                   ) -> tuple[dict[str, list[Span]], CorpusMetrics]:
    """Oracle over a whole corpus (list of {doc_id, spans}) + metrics
    (docs/spans processed, OCR fallback rate — BASELINE.json:6)."""
    metrics = CorpusMetrics(docs_in=len(docs))
    golden: dict[str, list[Span]] = {}
    for d in docs:
        r = extract_document(d["doc_id"], d["spans"], first_page, last_page,
                             ocr_pipeline)
        metrics.pages_in += r.pages_in
        metrics.fallback_pages += r.fallback_pages
        if r.fallback_pages:
            metrics.fallback_docs += 1
        if r.skipped:
            metrics.skipped_docs += 1
        else:
            golden[r.doc_id] = r.spans
            metrics.docs_out += 1
            metrics.spans_out += len(r.spans)
    return golden, metrics
