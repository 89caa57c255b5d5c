"""Deterministic synthetic corpus generator (FIXTURES.md, seed=42).

Generates the interleaved text+media input table mandated by
BASELINE.json `input_hint`::

    doc_id : string
    spans  : array<struct<kind:string, text:string, media_ref:string, offset:int>>

Raw span kinds: pdf_text | pdf_scan | html | table_raw | media
(FIXTURES.md §1.1).  `offset = page*10000 + block` encodes layout position;
the spans array is stored SHUFFLED to force the engine to reconstruct
reading order (FIXTURES.md §1.2).  Document family mix per FIXTURES.md §3;
the §4 edge cases (including the 1000-page/50k-span skew document) exist at
every scale factor.

Everything is a pure function of (sf, seed) — no wall-clock, no global RNG.
"""

from __future__ import annotations

import base64
import random

from . import contract as C

# vocabulary with fr/de/es accents (EasyOCR langs, dl_converter.py:26)
_WORDS = (
    "data span block layout page table figure media corpus engine batch "
    "arrow shuffle partition snapshot lineage resume metric fallback "
    "déjà être où côté élève über größe straße schön niño señor año "
    "jalapeño façade naïve coöperate zurück además"
).split()

_GLYPHS = (
    "glyph<c=12,font=/AB12+Foo-Bar>",
    "glyph<1234>",
    "GLYPH<c=7,font=/ZZ9+Times-Roman>",
    "GLyPh<88>",
    "glyph<c=3,font=/Q1+Arial-Narrow>",
)

_BOILER_TEMPLATES = (
    '<nav class="top-nav main"><a href="/home">Home</a> <a href="/about">About</a>'
    ' <a href="/contact">Contact</a></nav>',
    '<footer id="ft"><span class="copy">© 2024</span><a href="/tos">ToS</a>'
    '<a href="/privacy">Priv</a></footer>',
    '<div class="ad-banner" data-slot="728x90" data-provider="adnet">'
    '<img src="/ad.png" alt=""/><a href="/buy">Ad</a></div>',
    '<aside class="sidebar related"><ul><li><a href="/p/1">x</a></li>'
    '<li><a href="/p/2">y</a></li></ul></aside>',
)


def _words(rng: random.Random, lo: int, hi: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(lo, hi)))


def _dirty(rng: random.Random, text: str) -> str:
    """Inject glyph artifacts, tabs and multi-space runs (FIXTURES.md §4)."""
    parts = text.split(" ")
    out = []
    for w in parts:
        out.append(w)
        r = rng.random()
        if r < 0.12:
            out.append(rng.choice(_GLYPHS))
        if r > 0.93:
            out.append("\t" if rng.random() < 0.5 else "  ")
    sep = lambda: "  " if rng.random() < 0.08 else " "  # noqa: E731
    s = ""
    for i, w in enumerate(out):
        s += (sep() if i else "") + w
    if rng.random() < 0.15:
        s = " " + s
    if rng.random() < 0.15:
        s = s + "\t"
    # glyph adjacent to a word boundary (no surrounding space)
    if rng.random() < 0.1:
        s += rng.choice(_GLYPHS) + "end"
    return s


def _textual_payload(rng: random.Random, heading_prob: float) -> str:
    r = rng.random()
    if r < heading_prob / 2:
        base = "H1: " + _words(rng, 2, 5)
    elif r < heading_prob:
        base = "H2: " + _words(rng, 2, 6)
    else:
        base = _words(rng, 6, 28)
    return _dirty(rng, base)


def _span(kind: str, text: str | None, media_ref: str | None,
          page: int, block: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref,
            "offset": page * C.PAGE_STRIDE + block}


def _pdf_text(rng, page, block, heading_prob=0.25):
    return _span(C.RAW_PDF_TEXT, _textual_payload(rng, heading_prob), None, page, block)


def _pdf_scan(rng, page, block, payload: str | None = None):
    inner = payload if payload is not None else _textual_payload(rng, 0.2)
    enc = base64.b64encode(inner.encode("utf-8")).decode("ascii")
    return _span(C.RAW_PDF_SCAN, C.SCAN_PREFIX + enc, None, page, block)


def _html_main(rng, page, block):
    if rng.random() < 0.3:
        lvl = rng.randint(1, 6)
        body = _words(rng, 2, 6)
        raw = f"<h{lvl} class=\"sec\">{body}</h{lvl}>"
    else:
        body = _words(rng, 10, 30)
        if rng.random() < 0.3:
            ws = body.split(" ")
            mid = len(ws) // 2
            body = " ".join(ws[:mid]) + " <b>" + ws[mid] + "</b> " + " ".join(ws[mid + 1:])
        raw = f"<p>{body}</p>"
    return _span(C.RAW_HTML, raw, None, page, block)


def _html_boiler(rng, page, block):
    return _span(C.RAW_HTML, rng.choice(_BOILER_TEMPLATES), None, page, block)


def _table(rng, page, block):
    ncol = rng.randint(2, 4)
    nrow = rng.randint(2, 5)
    def cell(r):
        x = rng.random()
        if x < 0.12:
            return ""  # empty cell
        if x < 0.3:
            return str(rng.randint(0, 9999))  # numeric-looking, stays string
        c = _words(rng, 1, 3)
        if rng.random() < 0.15:
            c += " " + rng.choice(_GLYPHS)
        return c
    rows = [[f"col{j}" if rng.random() < 0.8 else cell(0) for j in range(ncol)]]
    rows += [[cell(i) for _ in range(ncol)] for i in range(nrow)]
    raw = C.TABLE_ROW_SEP.join(C.TABLE_CELL_SEP.join(r) for r in rows)
    return _span(C.RAW_TABLE, raw, None, page, block)


def _media(rng, page, block, with_alt: bool | None = None, ref: str | None = None):
    if with_alt is None:
        with_alt = rng.random() < 0.5
    mref = ref if ref is not None else "m-%08x" % rng.getrandbits(32)
    alt = _dirty(rng, _words(rng, 2, 8)) if with_alt else None
    return _span(C.RAW_MEDIA, alt, mref, page, block)


# --------------------------------------------------------------------------
# document families (FIXTURES.md §3)
# --------------------------------------------------------------------------

def _zipf_pages(rng: random.Random) -> int:
    """Heavy-tailed pages-per-doc, median 3."""
    u = rng.random()
    if u < 0.35:
        return rng.randint(1, 2)
    if u < 0.75:
        return rng.randint(3, 5)
    if u < 0.95:
        return rng.randint(6, 12)
    return rng.randint(13, 40)


def _doc_digital_pdf(rng) -> list[dict]:
    spans = []
    for page in range(_zipf_pages(rng)):
        block = 0
        n = rng.randint(2, 6)
        for i in range(n):
            r = rng.random()
            if i == 0 and rng.random() < 0.5:
                spans.append(_pdf_text(rng, page, block, heading_prob=0.9))
            elif r < 0.7:
                spans.append(_pdf_text(rng, page, block))
            elif r < 0.85:
                spans.append(_table(rng, page, block))
            else:
                spans.append(_media(rng, page, block))
            block += rng.randint(1, 3)
    return spans


def _doc_scanned_pdf(rng) -> list[dict]:
    spans = []
    for page in range(_zipf_pages(rng)):
        block = 0
        for _ in range(rng.randint(1, 4)):
            spans.append(_pdf_scan(rng, page, block))
            block += rng.randint(1, 3)
        if rng.random() < 0.2:  # table on a scan page: fast sees it but page
            spans.append(_table(rng, page, block))  # still falls back (S12)
    return spans


def _doc_mixed_pdf(rng) -> list[dict]:
    spans = []
    for page in range(_zipf_pages(rng)):
        block = 0
        if rng.random() < 0.5:  # digital page
            for _ in range(rng.randint(2, 5)):
                spans.append(_pdf_text(rng, page, block))
                block += rng.randint(1, 2)
        else:  # scan page
            for _ in range(rng.randint(1, 3)):
                spans.append(_pdf_scan(rng, page, block))
                block += rng.randint(1, 2)
            if rng.random() < 0.3:
                spans.append(_media(rng, page, block))
    return spans


def _doc_html(rng) -> list[dict]:
    spans = []
    for page in range(max(1, _zipf_pages(rng) // 2)):
        block = 0
        spans.append(_html_boiler(rng, page, block)); block += 1
        for _ in range(rng.randint(2, 6)):
            spans.append(_html_main(rng, page, block))
            block += rng.randint(1, 2)
            if rng.random() < 0.3:
                spans.append(_html_boiler(rng, page, block)); block += 1
        spans.append(_html_boiler(rng, page, block))
    return spans


def _doc_media_heavy(rng) -> list[dict]:
    spans = []
    for page in range(_zipf_pages(rng)):
        block = 0
        for _ in range(rng.randint(2, 6)):
            if rng.random() < 0.6:
                spans.append(_media(rng, page, block))
            else:
                spans.append(_pdf_text(rng, page, block))
            block += rng.randint(1, 2)
    return spans


def _edge_docs(seed: int) -> list[dict]:
    """FIXTURES.md §4 — fixed edge-case set present at every SF."""
    rng = random.Random(f"{seed}:edges")
    docs: list[dict] = []

    def add(name, spans):
        docs.append({"doc_id": f"doc-edge-{name}", "spans": spans})

    add("empty", [])
    add("glyph-only", [
        _span(C.RAW_PDF_TEXT, " glyph<123>  \t GLYPH<c=1,font=/A1+F-G> ", None, 0, 0),
        _span(C.RAW_PDF_TEXT, "\t  \t", None, 0, 1),
    ])
    add("single-span", [_span(C.RAW_PDF_TEXT, "H1: lone heading", None, 0, 0)])
    add("all-fallback", [
        _pdf_scan(rng, p, b)
        for p in range(3) for b in range(2)
    ])
    # fallback still yields nothing: scans decode to glyph-only text
    add("fallback-empty", [
        _pdf_scan(rng, 0, 0, payload=" glyph<42> \t "),
        _pdf_scan(rng, 0, 1, payload="GLYPH<7>"),
    ])
    add("unicode", [
        _span(C.RAW_PDF_TEXT, "H1: déjà  über\tniño façade", None, 0, 0),
        _span(C.RAW_PDF_TEXT, "élève GLyPh<55>straße  coöperate", None, 0, 1),
    ])
    add("table-edges", [
        _span(C.RAW_TABLE, "h1\th2\th3\n1\t\t3\n\t\t\nglyph<9>x\t42\t", None, 0, 0),
        _span(C.RAW_TABLE, "\t\n\t", None, 0, 1),  # all-empty table -> dropped
        _span(C.RAW_PDF_TEXT, "anchor paragraph", None, 0, 2),
    ])
    add("media-null-text", [
        _media(rng, 0, 0, with_alt=False, ref="m-shared001"),
        _media(rng, 0, 1, with_alt=True, ref="m-shared001"),  # duplicate ref
    ])
    add("media-dup-ref", [
        _media(rng, 0, 0, with_alt=False, ref="m-shared001"),  # dup across docs
        _span(C.RAW_PDF_TEXT, "caption-ish text near media", None, 0, 1),
    ])
    # same-prefix ids colliding into the same hash bucket territory
    add("collide-a", [_span(C.RAW_PDF_TEXT, "bucket sibling a", None, 0, 0)])
    add("collide-b", [_span(C.RAW_PDF_TEXT, "bucket sibling b", None, 0, 0)])
    return docs


def _skew_doc(seed: int, pages: int = 1000, spans_per_page: int = 50) -> dict:
    """One giant document per SF (FIXTURES.md §4): 1000 pages / ~50k spans.
    Forces the salting / two-level assembly path."""
    rng = random.Random(f"{seed}:skew")
    spans = []
    for page in range(pages):
        for block in range(spans_per_page):
            r = rng.random()
            if r < 0.9:
                spans.append(_span(
                    C.RAW_PDF_TEXT,
                    ("H2: " if block == 0 else "") + _words(rng, 3, 8),
                    None, page, block))
            elif r < 0.95:
                spans.append(_media(rng, page, block))
            else:
                spans.append(_pdf_scan(rng, page, block))
    return {"doc_id": "doc-edge-skew", "spans": spans}


_FAMILIES = (
    (0.40, _doc_digital_pdf),
    (0.15, _doc_scanned_pdf),
    (0.15, _doc_mixed_pdf),
    (0.20, _doc_html),
    (0.09, _doc_media_heavy),
    (0.01, _doc_digital_pdf),  # the remaining 1% budget backs the edge set
)


def _family_bounds() -> list[tuple[float, object]]:
    bounds = []
    acc = 0.0
    for share, fn in _FAMILIES:
        acc += share
        bounds.append((acc, fn))
    return bounds


def gen_doc(i: int, n_docs: int, seed: int = 42) -> dict:
    """Document #i of an n_docs corpus — a pure function of (seed, i,
    n_docs), so any worker can generate any slice independently (the
    property the dps_synth DataSource partitions on)."""
    rng = random.Random(f"{seed}:{i}")
    u = (i + 0.5) / n_docs  # stratified family assignment, deterministic
    fn = next(fn for b, fn in _family_bounds() if u <= b + 1e-9)
    spans = fn(rng)
    rng.shuffle(spans)  # force reading-order reconstruction
    return {"doc_id": f"doc-{i:08d}", "spans": spans}


def generate_corpus(sf: float, seed: int = 42, include_skew: bool = True) -> list[dict]:
    """Deterministic corpus at scale factor `sf` (SF=1.0 ≈ 10,000 docs)."""
    n_docs = max(1, round(10_000 * sf))
    docs = [gen_doc(i, n_docs, seed) for i in range(n_docs)]
    docs.extend(_edge_docs(seed))
    if include_skew:
        sk = _skew_doc(seed)
        random.Random(f"{seed}:skewshuffle").shuffle(sk["spans"])
        docs.append(sk)
    return docs


# --------------------------------------------------------------------------
# Spark interop
# --------------------------------------------------------------------------

INPUT_DDL = ("doc_id string, spans array<struct<"
             "kind:string, text:string, media_ref:string, offset:int>>")
OUTPUT_DDL = INPUT_DDL  # same shape; output kinds/offsets per FIXTURES.md §2


def corpus_df(spark, sf: float, seed: int = 42, include_skew: bool = True,
              n_partitions: int | None = None):
    """Materialize the corpus as a Spark DataFrame with the exact input
    schema.  Rows are built driver-side (fixture scale only — the real corpus
    is an Iceberg table scan, SURVEY.md §2.1 S1)."""
    docs = generate_corpus(sf, seed, include_skew)
    rows = [(d["doc_id"],
             [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]])
            for d in docs]
    df = spark.createDataFrame(rows, schema=INPUT_DDL)
    if n_partitions:
        df = df.repartition(n_partitions, "doc_id")
    return df
