"""The end-to-end Spark extraction pipeline.

Dataflow (SURVEY.md §3.5) — two shuffles total, no joins::

    input (doc_id, spans[])                       Iceberg/Parquet scan
      └─ explode ──────────────────────────────── span rows (narrow)
      └─ parse: fast+full extraction per span ─── narrow (codegen or Arrow)
      └─ groupBy(doc_id, page) ────────────────── shuffle 1 (partial agg —
           per-page fast/full arrays + has_text     the page level IS the
           = the OCR-fallback decision, T4)         salting of giant docs)
      └─ groupBy(doc_id) ──────────────────────── shuffle 2
           sort pages, flatten, renumber (T1)
      └─ filter non-empty ─────────────────────── output (doc_id, spans[])

The per-page fast→full fallback is set-based: BOTH variants are computed in
one narrow pass and the page picks fast_arr or full_arr — the reference's
try-fast-then-escalate loop (content_extractor.py:74-135) without a second
scan or a join.  The two-level aggregation (page, then doc) is the explicit
skew treatment for heavy-tailed documents: a 1000-page/50k-span document
becomes 1000 independent page groups with map-side partial aggregation,
never one giant reduce task (BASELINE.json north_rule "skew handled
explicitly").

Two interchangeable parse engines produce the identical `parsed` schema:

* ``engine="sql"``   — pure Catalyst expressions (whole-stage codegen,
                       zero Python).  Fastest for the string-encoded fixture
                       payloads.
* ``engine="arrow"`` — ``mapInArrow`` vectorized pandas batches: the shape
                       the real byte-stream parser (PDF layout analysis /
                       OCR) takes at 100 TB, where parsing is not
                       SQL-expressible.  Same contract, tested for parity.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from . import contract as C
from .functions import cleaning as X

PARSED_DDL = ("doc_id string, page int, block int, "
              "fast_kind string, fast_text string, fast_media_ref string, "
              "full_kind string, full_text string, full_media_ref string")

# The (doc_id, page) shuffle ahead of the parse stage gets an EXPLICIT
# partition count: repartition(cols) without one lets AQE coalesce by byte
# size (64 MB advisory), which on a CPU-bound stage yields too few tasks —
# measured 47 tasks on 32 cores = 2 scheduling waves with the second wave
# half empty (~30% of the cluster idle).  cores × WAVES gives every core
# WAVES uniform task slots, so the tail is one short task, not half a wave.
# A cluster submit can override via spark.document_processor.parse.factor.
_PARSE_WAVE_FACTOR = 6


def _parse_partitions(df: DataFrame) -> int:
    sc = df.sparkSession.sparkContext
    factor = int(df.sparkSession.conf.get(
        "spark.document_processor.parse.factor", str(_PARSE_WAVE_FACTOR)))
    return max(sc.defaultParallelism * factor, 48)

OUTPUT_SPAN_DDL = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


# ---------------------------------------------------------------------------
# stage 1 — explode the input table into span rows
# ---------------------------------------------------------------------------

def explode_spans(docs: DataFrame, first_page: int = 1,
                  last_page: int | None = None) -> DataFrame:
    """Explode the input table into span rows, optionally bounded to a page
    range.  `first_page`/`last_page` are 1-based and inclusive — the
    reference's request parameters bounding the per-page loop
    (app/api.py:69-70, content_extractor.py:64-70; SURVEY §2.1 S6).  The
    range is applied as an array filter on raw offsets BEFORE the explode,
    so out-of-range pages never enter the fan-out, the parse, or the
    shuffles — at scale, page-range requests cost proportional to the
    pages kept, not the document size."""
    if first_page > 1 or last_page is not None:
        lo = (first_page - 1) * C.PAGE_STRIDE
        hi = None if last_page is None else last_page * C.PAGE_STRIDE

        def keep(s):
            cond = s["offset"] >= F.lit(lo)
            if hi is not None:
                cond = cond & (s["offset"] < F.lit(hi))
            return cond

        docs = docs.withColumn("spans", F.filter("spans", keep))
    s = F.explode("spans").alias("s")
    return (docs.select("doc_id", s)
            .select("doc_id",
                    F.expr(f"s.offset div {C.PAGE_STRIDE}").cast("int").alias("page"),
                    F.pmod("s.offset", F.lit(C.PAGE_STRIDE)).cast("int").alias("block"),
                    F.col("s.kind").alias("raw_kind"),
                    F.col("s.text").alias("raw_text"),
                    F.col("s.media_ref").alias("raw_media_ref")))


# ---------------------------------------------------------------------------
# stage 2a — native-Catalyst parse (fast + full variants per span)
# ---------------------------------------------------------------------------

def _null_str() -> Column:
    return F.lit(None).cast("string")


def parse_sql(rows: DataFrame) -> DataFrame:
    """Per-span extraction as pure Catalyst expressions, two stages:

    shuffle first: explicit repartition on (doc_id, page) over the raw
    exploded rows.  This is the shuffle the page aggregation needs anyway,
    and doing it BEFORE the heavy expressions is the skew treatment: a
    1000-page document (or several hashed into one input partition) spreads
    across the whole cluster before any regex runs — the pre-shuffle work is
    just explode + shuffle write of raw text.

    stage A (post-shuffle): one lazy CASE per heavy derivation — each
    kind's regex battery appears exactly once, so common-subexpression
    elimination cannot hoist another kind's work onto a row.

    stage B: cheap classification over the stage-A strings; the page agg
    then runs without a second exchange (the (doc_id, page) partitioning
    is preserved through both projections).
    """
    rows = rows.repartition(_parse_partitions(rows), "doc_id", "page")
    text = F.col("raw_text")
    kind = F.col("raw_kind")

    # ---- stage A: heavy derivations, one lazy CASE occurrence each --------
    t_clean = X.clean_text_col(text)
    s_decoded = X.decode_scan_col(text)
    s_clean = F.when(s_decoded.isNotNull(), X.clean_text_col(s_decoded))
    h_raw = F.coalesce(text, F.lit(""))
    h_clean = X.clean_text_col(X.strip_tags_col(h_raw))
    h_keep = F.when(
        (h_clean != "") & (X.html_density_col(h_raw, h_clean)
                           >= F.lit(C.HTML_DENSITY_THRESHOLD)), h_clean)
    tb_flat = X.flatten_table_col(text)
    tb_keep = F.when(~X.is_blank_col(tb_flat), tb_flat)
    m_alt = F.when(text.isNotNull(), X.clean_text_col(text))
    m_keep = F.when(m_alt != "", m_alt)

    cleaned = (F.when(kind == C.RAW_PDF_TEXT, F.when(t_clean != "", t_clean))
                .when(kind == C.RAW_PDF_SCAN, F.when(s_clean != "", s_clean))
                .when(kind == C.RAW_HTML, h_keep)
                .when(kind == C.RAW_TABLE, tb_keep)
                .when(kind == C.RAW_MEDIA, m_keep))
    h_head = F.when(kind == C.RAW_HTML, X.html_is_heading_col(h_raw))

    stage_a = rows.select(
        "doc_id", "page", "block", "raw_kind", "raw_media_ref",
        cleaned.alias("cleaned"), h_head.alias("h_head"))

    # ---- stage B: cheap classification on the stage-A strings --------------
    k2 = F.col("raw_kind")
    cl = F.col("cleaned")
    has = cl.isNotNull()
    textual_kind = X.classify_textual_col(cl)
    html_kind = F.when(F.col("h_head"), F.lit(C.KIND_HEADING)) \
                 .otherwise(F.lit(C.KIND_PARAGRAPH))

    full_kind = (F.when(k2 == C.RAW_PDF_TEXT, F.when(has, textual_kind))
                  .when(k2 == C.RAW_PDF_SCAN, F.when(has, textual_kind))
                  .when(k2 == C.RAW_HTML, F.when(has, html_kind))
                  .when(k2 == C.RAW_TABLE, F.when(has, F.lit(C.KIND_TABLE)))
                  .when(k2 == C.RAW_MEDIA,
                        F.when(has, F.lit(C.KIND_FIGURE))
                         .otherwise(F.lit(C.KIND_MEDIA_REF))))
    full_text = F.when(k2 == C.RAW_MEDIA, F.when(has, cl)) \
                 .otherwise(F.when(has, cl))
    media_ref = F.when(k2 == C.RAW_MEDIA, F.col("raw_media_ref"))
    # fast pipeline: identical except scan regions yield nothing (T4)
    fast_kind = F.when(k2 == C.RAW_PDF_SCAN, _null_str()).otherwise(full_kind)
    fast_text = F.when(k2 == C.RAW_PDF_SCAN, _null_str()).otherwise(full_text)

    return stage_a.select(
        "doc_id", "page", "block",
        fast_kind.alias("fast_kind"), fast_text.alias("fast_text"),
        media_ref.alias("fast_media_ref"),
        full_kind.alias("full_kind"), full_text.alias("full_text"),
        media_ref.alias("full_media_ref"))


def parse_sql_union(rows: DataFrame) -> DataFrame:
    """Union-of-filtered-branches variant (kept for comparison)."""
    text = F.col("raw_text")
    keys = ["doc_id", "page", "block"]

    def out(df: DataFrame, fk: Column, ft: Column, fm: Column,
            uk: Column, ut: Column, um: Column) -> DataFrame:
        return df.select(
            *keys,
            fk.cast("string").alias("fast_kind"),
            ft.cast("string").alias("fast_text"),
            fm.cast("string").alias("fast_media_ref"),
            uk.cast("string").alias("full_kind"),
            ut.cast("string").alias("full_text"),
            um.cast("string").alias("full_media_ref"))

    ns = F.lit(None).cast("string")

    # pdf_text → both pipelines
    t = rows.filter(F.col("raw_kind") == C.RAW_PDF_TEXT)
    t_clean = X.clean_text_col(text)
    t_ok = t_clean != ""
    t_kind = F.when(t_ok, X.classify_textual_col(t_clean))
    t_text = F.when(t_ok, t_clean)
    b_text = out(t, t_kind, t_text, ns, t_kind, t_text, ns)

    # pdf_scan → full pipeline only (T4)
    s = rows.filter(F.col("raw_kind") == C.RAW_PDF_SCAN)
    s_decoded = X.decode_scan_col(text)
    s_clean = F.when(s_decoded.isNotNull(), X.clean_text_col(s_decoded))
    s_ok = s_clean.isNotNull() & (s_clean != "")
    b_scan = out(s, ns, ns, ns,
                 F.when(s_ok, X.classify_textual_col(s_clean)),
                 F.when(s_ok, s_clean), ns)

    # html → boilerplate strip by text-density
    h = rows.filter(F.col("raw_kind") == C.RAW_HTML)
    h_raw = F.coalesce(text, F.lit(""))
    h_clean = X.clean_text_col(X.strip_tags_col(h_raw))
    h_main = (h_clean != "") & (
        X.html_density_col(h_raw, h_clean) >= F.lit(C.HTML_DENSITY_THRESHOLD))
    h_kind = (F.when(h_main & X.html_is_heading_col(h_raw), F.lit(C.KIND_HEADING))
               .when(h_main, F.lit(C.KIND_PARAGRAPH)))
    h_text = F.when(h_main, h_clean)
    b_html = out(h, h_kind, h_text, ns, h_kind, h_text, ns)

    # table_raw → canonical flattening (T6)
    tb = rows.filter(F.col("raw_kind") == C.RAW_TABLE)
    tb_flat = X.flatten_table_col(text)
    tb_ok = ~X.is_blank_col(tb_flat)
    tb_kind = F.when(tb_ok, F.lit(C.KIND_TABLE))
    tb_text = F.when(tb_ok, tb_flat)
    b_table = out(tb, tb_kind, tb_text, ns, tb_kind, tb_text, ns)

    # media → figure / media_ref (T7)
    m = rows.filter(F.col("raw_kind") == C.RAW_MEDIA)
    m_alt = F.when(text.isNotNull(), X.clean_text_col(text)).otherwise(F.lit(""))
    m_is_fig = m_alt != ""
    m_kind = F.when(m_is_fig, F.lit(C.KIND_FIGURE)).otherwise(F.lit(C.KIND_MEDIA_REF))
    m_text = F.when(m_is_fig, m_alt)
    mr = F.col("raw_media_ref")
    b_media = out(m, m_kind, m_text, mr, m_kind, m_text, mr)

    # unknown raw kinds: keep the row (page inventory) but emit nothing (S28)
    known = [C.RAW_PDF_TEXT, C.RAW_PDF_SCAN, C.RAW_HTML, C.RAW_TABLE, C.RAW_MEDIA]
    u = rows.filter(~F.col("raw_kind").isin(*known) | F.col("raw_kind").isNull())
    b_unknown = out(u, ns, ns, ns, ns, ns, ns)

    return (b_text.unionByName(b_scan).unionByName(b_html)
            .unionByName(b_table).unionByName(b_media).unionByName(b_unknown))


def parse_sql_fused(rows: DataFrame) -> DataFrame:
    """Single-projection variant of parse_sql: one pass over the exploded
    rows (no 6× re-explode), kind dispatch via lazy CASE branches."""
    kind = F.col("raw_kind")
    text = F.col("raw_text")
    mref = F.col("raw_media_ref")

    t_clean = X.clean_text_col(text)
    s_decoded = X.decode_scan_col(text)
    s_clean = F.when(s_decoded.isNotNull(), X.clean_text_col(s_decoded))
    s_ok = s_clean.isNotNull() & (s_clean != "")
    h_raw = F.coalesce(text, F.lit(""))
    h_clean = X.clean_text_col(X.strip_tags_col(h_raw))
    h_main = (h_clean != "") & (
        X.html_density_col(h_raw, h_clean) >= F.lit(C.HTML_DENSITY_THRESHOLD))
    h_kind = (F.when(h_main & X.html_is_heading_col(h_raw), F.lit(C.KIND_HEADING))
               .when(h_main, F.lit(C.KIND_PARAGRAPH)))
    tb_flat = X.flatten_table_col(text)
    tb_ok = ~X.is_blank_col(tb_flat)
    m_alt = F.when(text.isNotNull(), X.clean_text_col(text)).otherwise(F.lit(""))
    m_is_fig = m_alt != ""

    def branch(full: bool) -> list[Column]:
        k = (F.when(kind == C.RAW_PDF_TEXT,
                    F.when(t_clean != "", X.classify_textual_col(t_clean)))
              .when(kind == C.RAW_HTML, h_kind)
              .when(kind == C.RAW_TABLE, F.when(tb_ok, F.lit(C.KIND_TABLE)))
              .when(kind == C.RAW_MEDIA,
                    F.when(m_is_fig, F.lit(C.KIND_FIGURE))
                     .otherwise(F.lit(C.KIND_MEDIA_REF))))
        t = (F.when(kind == C.RAW_PDF_TEXT, F.when(t_clean != "", t_clean))
              .when(kind == C.RAW_HTML, F.when(h_main, h_clean))
              .when(kind == C.RAW_TABLE, F.when(tb_ok, tb_flat))
              .when(kind == C.RAW_MEDIA, F.when(m_is_fig, m_alt)))
        m = F.when(kind == C.RAW_MEDIA, mref)
        if full:
            k = F.when(kind == C.RAW_PDF_SCAN,
                       F.when(s_ok, X.classify_textual_col(s_clean))).otherwise(k)
            t = F.when(kind == C.RAW_PDF_SCAN, F.when(s_ok, s_clean)).otherwise(t)
        else:
            k = F.when(kind == C.RAW_PDF_SCAN, _null_str()).otherwise(k)
            t = F.when(kind == C.RAW_PDF_SCAN, _null_str()).otherwise(t)
        return [k, t, m]

    fast, full = branch(False), branch(True)
    return rows.select(
        "doc_id", "page", "block",
        fast[0].alias("fast_kind"), fast[1].alias("fast_text"),
        fast[2].alias("fast_media_ref"),
        full[0].alias("full_kind"), full[1].alias("full_text"),
        full[2].alias("full_media_ref"))


# ---------------------------------------------------------------------------
# stage 2b — Arrow/pandas parse (mapInArrow): the real-parser shape
# ---------------------------------------------------------------------------

def _parse_pandas_batch(pdf):
    """Vectorized pandas/numpy implementation of the same contract.  Runs
    inside the Python worker on Arrow batches — no per-row Python at the
    Spark level; `.str` ops use Python `re` semantics, matching the oracle.
    All indexing is positional (numpy), no pandas index alignment."""
    import numpy as np
    import pandas as pd

    from . import contract as Ct

    n = len(pdf)
    kind = pdf["raw_kind"].fillna("").to_numpy(dtype=object)
    text_notnull = pdf["raw_text"].notna().to_numpy()
    raw = pdf["raw_text"].fillna("").reset_index(drop=True)
    mref = pdf["raw_media_ref"].to_numpy(dtype=object)

    def clean(s: "pd.Series") -> "pd.Series":
        s = s.str.replace(Ct.GLYPH_PATTERN, " ", regex=True)
        s = s.str.replace(Ct.SPACE_TAB_PATTERN, " ", regex=True)
        return s.str.replace(Ct.STRIP_PATTERN, "", regex=True)

    def classify(cleaned: "pd.Series") -> "np.ndarray":
        heads = cleaned.str.startswith(Ct.HEADING_MARKERS).to_numpy()
        return np.where(heads, Ct.KIND_HEADING, Ct.KIND_PARAGRAPH)

    out = {c: np.full(n, None, dtype=object)
           for c in ("fast_kind", "fast_text", "fast_media_ref",
                     "full_kind", "full_text", "full_media_ref")}

    def emit(idx: "np.ndarray", kinds, texts, refs=None, fast=True, full=True):
        targets = (["fast"] if fast else []) + (["full"] if full else [])
        for pre in targets:
            out[f"{pre}_kind"][idx] = kinds
            out[f"{pre}_text"][idx] = texts
            if refs is not None:
                out[f"{pre}_media_ref"][idx] = refs

    # pdf_text → both pipelines
    pos = np.flatnonzero(kind == Ct.RAW_PDF_TEXT)
    if pos.size:
        cl = clean(raw.iloc[pos].reset_index(drop=True))
        ok = (cl != "").to_numpy()
        keep = pos[ok]
        clk = cl.iloc[np.flatnonzero(ok)].reset_index(drop=True)
        emit(keep, classify(clk), clk.to_numpy(dtype=object))

    # pdf_scan → full pipeline only (T4)
    pos = np.flatnonzero(kind == Ct.RAW_PDF_SCAN)
    if pos.size:
        decoded = raw.iloc[pos].map(Ct.decode_scan).reset_index(drop=True)
        dn = decoded.notna().to_numpy()
        cl = clean(decoded.fillna("").astype(str))
        ok = dn & (cl != "").to_numpy()
        keep = pos[ok]
        clk = cl.iloc[np.flatnonzero(ok)].reset_index(drop=True)
        emit(keep, classify(clk), clk.to_numpy(dtype=object), fast=False)

    # html → boilerplate strip by text-density
    pos = np.flatnonzero(kind == Ct.RAW_HTML)
    if pos.size:
        h = raw.iloc[pos].reset_index(drop=True)
        cl = clean(h.str.replace(Ct.HTML_TAG_PATTERN, " ", regex=True))
        hlen = h.str.len().to_numpy().astype(float)
        dens = np.divide(cl.str.len().to_numpy(), hlen,
                         out=np.zeros(len(pos)), where=hlen > 0)
        main = (cl != "").to_numpy() & (dens >= Ct.HTML_DENSITY_THRESHOLD)
        keep = pos[main]
        sel = np.flatnonzero(main)
        is_h = h.iloc[sel].str.contains(Ct.HTML_HEADING_PATTERN, regex=True).to_numpy()
        kinds = np.where(is_h, Ct.KIND_HEADING, Ct.KIND_PARAGRAPH)
        emit(keep, kinds, cl.iloc[sel].to_numpy(dtype=object))

    # table_raw → canonical flattening (T6)
    pos = np.flatnonzero(kind == Ct.RAW_TABLE)
    if pos.size:
        flat = raw.iloc[pos].map(Ct.flatten_table).reset_index(drop=True)
        ok = (flat.str.strip() != "").to_numpy()
        keep = pos[ok]
        emit(keep, Ct.KIND_TABLE,
             flat.iloc[np.flatnonzero(ok)].to_numpy(dtype=object))

    # media → figure / media_ref (T7)
    pos = np.flatnonzero(kind == Ct.RAW_MEDIA)
    if pos.size:
        alt = clean(raw.iloc[pos].reset_index(drop=True))
        has_alt = text_notnull[pos] & (alt != "").to_numpy()
        kinds = np.where(has_alt, Ct.KIND_FIGURE, Ct.KIND_MEDIA_REF)
        texts = np.where(has_alt, alt.to_numpy(dtype=object), None)
        emit(pos, kinds, texts, refs=mref[pos])

    return pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(dtype=object),
                         "page": pdf["page"].to_numpy(),
                         "block": pdf["block"].to_numpy(), **out})


def parse_arrow(rows: DataFrame) -> DataFrame:
    import pyarrow as pa

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        schema = pa.schema([
            pa.field("doc_id", pa.string()), pa.field("page", pa.int32()),
            pa.field("block", pa.int32()),
            *(pa.field(f"{p}_{c}", pa.string())
              for p in ("fast", "full") for c in ("kind", "text", "media_ref")),
        ])
        for batch in batches:
            pdf = batch.to_pandas()
            res = _parse_pandas_batch(pdf)
            yield pa.RecordBatch.from_pandas(res, schema=schema,
                                             preserve_index=False)

    # same page-balancing shuffle as the sql engine (see parse_sql): the
    # mapInArrow stage then runs on evenly-spread page groups
    return (rows.repartition(_parse_partitions(rows), "doc_id", "page")
            .mapInArrow(fn, PARSED_DDL))


# ---------------------------------------------------------------------------
# stage 3 — shared assembly: fallback decision, ordering, renumbering
# ---------------------------------------------------------------------------

def _cmp_int(*keys):
    """array_sort comparator on one or two int fields: the generated
    comparator stays tiny.  (sort_array over nested struct arrays makes
    Catalyst generate and janino-compile a full deep-structural comparator —
    minutes of compile time serialized behind the codegen cache lock, with
    every executor thread blocked on it.)"""
    def cmp(a, b):
        c = F.lit(0)
        for key in reversed(keys):
            c = (F.when(a[key] < b[key], F.lit(-1))
                  .when(a[key] > b[key], F.lit(1))
                  .otherwise(c))
        return c
    return cmp


# must mirror oracle.span_tiebreak exactly (crc32 over the same key string)
_TIE_NULL = "\x02"


def _tiebreak_col() -> Column:
    key = F.concat_ws(
        "\x1f",
        F.col("full_kind"),
        F.coalesce(F.col("full_text"), F.lit(_TIE_NULL)),
        F.coalesce(F.col("full_media_ref"), F.lit(_TIE_NULL)))
    return F.crc32(F.encode(key, "UTF-8"))


def assemble(parsed: DataFrame, with_layout: bool = False) -> DataFrame:
    """Page-level fallback choice (T4) then doc-level reading order (T1).
    Two-level aggregation = explicit skew salting by page.
    with_layout=True additionally emits the S21/S22 lineage-metadata
    fields per span: Position struct + page dimensions (contract.py).

    One collect_list per page, not two: a span's fast/full results differ
    only on scan regions (fast = nothing), so each span is collected once
    with a `scan_only` flag and the page picks `filter(arr, !scan_only)`
    (fast accepted) or the whole array (full fallback) — half the
    aggregation buffer memory and GC traffic of parallel fast/full arrays."""
    span_s = F.when(
        F.col("full_kind").isNotNull(),
        F.struct(F.col("block"),
                 F.col("page").alias("pg"),
                 _tiebreak_col().alias("tb"),
                 F.col("full_kind").alias("kind"),
                 F.col("full_text").alias("text"),
                 F.col("full_media_ref").alias("media_ref"),
                 F.col("fast_kind").isNull().alias("scan_only")))

    page_level = (parsed.groupBy("doc_id", "page").agg(
        F.collect_list(span_s).alias("arr"),
        F.max(F.when(F.col("fast_kind").isin(*C.TEXT_KINDS), 1).otherwise(0)
              ).alias("has_text"),
    ))

    chosen = (F.when(F.col("has_text") == 1,
                     F.filter(F.col("arr"), lambda x: ~x["scan_only"]))
               .otherwise(F.col("arr")))
    page_level = page_level.select(
        "doc_id", "page",
        F.array_sort(chosen, _cmp_int("block", "tb")).alias("page_spans"),
        (F.lit(1) - F.col("has_text")).alias("fallback"),
    )

    doc_level = (page_level.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(F.col("page"), F.col("page_spans").alias("ps")))
         .alias("pages_arr"),
        F.sum("fallback").alias("fallback_pages"),
        F.count(F.lit(1)).alias("pages_in"),
    )).select(
        "doc_id",
        F.flatten(F.transform(
            F.array_sort(F.col("pages_arr"), _cmp_int("page")),
            lambda x: x["ps"])).alias("flat"),
        "fallback_pages", "pages_in",
    )

    if with_layout:
        # S21/S22: synthetic-layout Position struct + page dimensions —
        # deterministic functions of (page, block), contract.position_for
        def mk(x, i):
            portrait = x["pg"] % 2 == 0
            width = F.when(portrait, F.lit(C.PAGE_W_PORTRAIT)) \
                     .otherwise(F.lit(C.PAGE_H_PORTRAIT))
            height = F.when(portrait, F.lit(C.PAGE_H_PORTRAIT)) \
                      .otherwise(F.lit(C.PAGE_W_PORTRAIT))
            top = F.round(F.lit(C.MARGIN_PT)
                          + F.pmod(x["block"], F.lit(C.LINES_PER_PAGE))
                          * F.lit(C.LINE_H_PT), 2)
            return F.struct(
                x["kind"].alias("kind"),
                x["text"].alias("text"),
                x["media_ref"].alias("media_ref"),
                i.cast("int").alias("offset"),
                F.struct(
                    (x["pg"] + 1).cast("int").alias("page_num"),
                    top.alias("top"),
                    F.round(width - F.lit(C.MARGIN_PT), 2).alias("right"),
                    F.round(top + F.lit(C.LINE_H_PT - C.LINE_GAP_PT), 2)
                     .alias("bottom"),
                    F.lit(C.MARGIN_PT).alias("left"),
                    F.lit(C.COORD_ORIGIN).alias("coord_origin"),
                ).alias("position"),
                width.alias("page_width"),
                height.alias("page_height"))
        spans = F.transform(F.col("flat"), mk)
    else:
        spans = F.transform(
            F.col("flat"),
            lambda x, i: F.struct(
                x["kind"].alias("kind"),
                x["text"].alias("text"),
                x["media_ref"].alias("media_ref"),
                i.cast("int").alias("offset")))
    return doc_level.select(
        "doc_id", spans.alias("spans"), "fallback_pages", "pages_in")


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

ENGINES = {"sql": parse_sql, "sql_union": parse_sql_union,
           "sql_fused": parse_sql_fused, "arrow": parse_arrow}


def extract_documents(docs: DataFrame, engine: str = "sql",
                      with_layout: bool = False, first_page: int = 1,
                      last_page: int | None = None) -> DataFrame:
    """input (doc_id, spans) -> extracted (doc_id, spans) per the contract.
    Docs with zero surviving spans are excluded (T5).  with_layout=True
    widens each output span with position/page_width/page_height (S21/S22).
    first_page/last_page (1-based, inclusive) bound extraction to a page
    range (see explode_spans); offsets renumber within the restricted
    output, exactly as the reference numbers only the processed pages."""
    parsed = ENGINES[engine](explode_spans(docs, first_page, last_page))
    return (assemble(parsed, with_layout=with_layout)
            .filter(F.size("spans") > 0)
            .select("doc_id", "spans"))


def extract_with_metrics(docs: DataFrame, engine: str = "sql",
                         first_page: int = 1, last_page: int | None = None
                         ) -> tuple[DataFrame, Observation, Observation]:
    """Same plan plus zero-extra-pass metrics via Observations
    (docs/spans processed, OCR fallback rate — BASELINE.json:6).
    Returns (result_df, input_obs, output_obs); observation values are
    available after one action on result_df."""
    in_obs = Observation("extract_input")
    docs = docs.observe(
        in_obs,
        F.count(F.lit(1)).alias("docs_in"),
        F.sum(F.when(F.size("spans") <= 0, 1).otherwise(0)).alias("empty_docs"),
        F.sum(F.size("spans")).alias("spans_in"),
    )
    parsed = ENGINES[engine](explode_spans(docs, first_page, last_page))
    doc_level = assemble(parsed)
    out_obs = Observation("extract_output")
    doc_level = doc_level.observe(
        out_obs,
        F.count(F.lit(1)).alias("docs_converted"),
        F.sum(F.when(F.size("spans") > 0, 1).otherwise(0)).alias("docs_out"),
        F.sum(F.size("spans")).alias("spans_out"),
        F.sum("fallback_pages").alias("fallback_pages"),
        F.sum("pages_in").alias("pages_in"),
        F.sum(F.when(F.col("fallback_pages") > 0, 1).otherwise(0)
              ).alias("fallback_docs"),
    )
    result = (doc_level.filter(F.size("spans") > 0)
              .select("doc_id", "spans"))
    return result, in_obs, out_obs
