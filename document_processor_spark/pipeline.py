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

The per-page fast→full fallback is set-based: spans are parsed ONCE with a
`scan_only` flag (fast pass result ≡ the non-scan subset, T4) and the page
picks the filtered or the whole span set — the reference's
try-fast-then-escalate loop (content_extractor.py:74-135) without a second
scan, a join, or duplicated fast/full columns.  The two-level aggregation (page, then doc) is the explicit
skew treatment for heavy-tailed documents: a 1000-page/50k-span document
becomes 1000 independent page groups with map-side partial aggregation,
never one giant reduce task (BASELINE.json north_rule "skew handled
explicitly").

Two interchangeable parse engines produce the identical `parsed` schema:

* ``engine="sql"``    — pure Catalyst expressions (whole-stage codegen,
                        zero Python).  Fastest for the string-encoded
                        fixture payloads.
* ``engine="arrow"``  — ``mapInArrow`` with a pyarrow-native kernel: the
                        shape the real byte-stream parser (PDF layout
                        analysis / OCR) takes at 100 TB, where parsing is
                        not SQL-expressible.  Same contract, tested for
                        parity; see the stage-2b commentary for why the
                        kernel avoids Python-object materialization.
* ``engine="pandas"`` — the same mapInArrow stage via a pandas-object
                        kernel (comparison engine; object churn measured).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from . import contract as C
from .functions import cleaning as X

# The parsed schema is NARROW by design: one (kind, text, media_ref) per
# span plus a `scan_only` flag, NOT parallel fast_*/full_* column pairs.
# The fast pipeline's view of a span differs from the full pipeline's ONLY
# on scan regions (fast = nothing, T4), so fast ≡ full minus scan_only rows
# — carrying both variants would double the string volume through the parse
# stage, the Python↔JVM Arrow transfer, and the aggregation buffers for
# zero information.
PARSED_DDL = ("doc_id string, page int, block int, "
              "kind string, text string, media_ref string, scan_only boolean")

# The (doc_id, page) shuffle ahead of the parse stage gets an EXPLICIT
# partition count: repartition(cols) without one lets AQE coalesce by byte
# size (64 MB advisory), which on a CPU-bound stage yields too few tasks —
# measured 47 tasks on 32 cores = 2 scheduling waves with the second wave
# half empty (~30% of the cluster idle).  cores × WAVES gives every core
# WAVES uniform task slots, so the tail is one short task, not half a wave.
# A cluster submit can override via spark.document_processor.parse.factor.
#
# The count is additionally SIZE-AWARE: cores × factor is the ceiling for
# big inputs, but a small input stops at one task per ~TARGET bytes (floor:
# one task per core).  Without the cap, a sf0.1 bench corpus paid 192 tasks
# of scheduling overhead on work that fits a single 32-task wave (measured
# +44% on the small-scale extract; the interleaved A/B diagnostic in
# BENCH/diag_arrow_interleaved.py isolates the per-task cost).
_PARSE_WAVE_FACTOR = 6
# mapInArrow tasks each pay a fixed Python-worker round trip (stream
# open/close + first-batch latency, measured ~11 ms/task on this host), so
# the arrow stage wants FEWER, larger tasks than the pure-JVM stage: 2
# waves balances that amortization against scheduling granularity.
_ARROW_WAVE_FACTOR = 2
# Bytes of plan-stats input per parse task.  Deliberately far below AQE's
# 64 MB shuffle advisory: the parse stage is CPU-bound (regex battery per
# string), so a task is sized for ~0.5-1 s of compute, not for IO
# amortization — 64 MB slices re-create the 47-tasks-on-32-cores ragged
# wave the explicit count exists to avoid.
_TARGET_PARTITION_BYTES = 12 << 20


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's own size estimate for the optimized plan (bytes).  For a
    cached/materialized input this is accurate; for a cold scan it falls
    back to file-size-derived stats — either way the right ORDER for sizing
    a partition count.  A post-explode plan inflates the top-level estimate
    multiplicatively (worst-case row fan-out) into Long.MaxValue-ish
    sentinels; exploding an array redistributes roughly the SAME bytes over
    more rows, so when the top-level number is unusable the sum of the LEAF
    sizes (parquet scan = file bytes, cache = materialized bytes, local
    relation = row estimate) is the honest proxy.  None when nothing in the
    plan carries a usable size."""
    def _as_int(size) -> int | None:
        try:
            v = int(size if isinstance(size, int) else size.toString())
        except Exception:
            return None
        return v if 0 < v < (1 << 50) else None

    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        top = _as_int(plan.stats().sizeInBytes())
        if top is not None:
            return top
        leaves = plan.collectLeaves()
        total = 0
        for i in range(leaves.length()):
            leaf = _as_int(leaves.apply(i).stats().sizeInBytes())
            if leaf is not None:
                total += leaf
        return total or None
    except Exception:
        return None


def _parse_partitions(df: DataFrame, factor: int | None = None) -> int:
    sess = df.sparkSession
    cores = sess.sparkContext.defaultParallelism
    if factor is None:
        factor = int(sess.conf.get(
            "spark.document_processor.parse.factor", str(_PARSE_WAVE_FACTOR)))
    upper = max(cores * factor, 48)
    size = _plan_size_bytes(df)
    if size is None:
        return upper
    need = -(-size // _TARGET_PARTITION_BYTES)
    return max(min(upper, need), cores)


def _arrow_partitions(df: DataFrame) -> int:
    sess = df.sparkSession
    cores = sess.sparkContext.defaultParallelism
    factor = int(sess.conf.get(
        "spark.document_processor.parse.arrow_factor", str(_ARROW_WAVE_FACTOR)))
    upper = max(cores * factor, 16)
    size = _plan_size_bytes(df)
    if size is None:
        return upper
    need = -(-size // _TARGET_PARTITION_BYTES)
    return max(min(upper, need), cores)

OUTPUT_SPAN_DDL = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


# ---------------------------------------------------------------------------
# r6: single-parse SQL-string construction.
#
# Measured (OPTIMIZATION_r06.md): assembling the parse + assembly
# expressions Column-op-by-Column-op cost 0.36-0.49 s of DRIVER time per
# extract run — hundreds of py4j round trips — versus ~1.2 s of cluster
# execution.  The same trees written as SQL strings parse JVM-side in one
# call per select.  Every template below is a literal transcription of the
# Column form it replaces (same operators, same branch order, same
# duplicated subtrees), so the analyzed plan and the results are
# unchanged; equality is pinned by the oracle suite and the e2e tests.
# ---------------------------------------------------------------------------

def _sql_lit(s: str) -> str:
    """SQL string literal: escape backslashes/quotes for the parser's
    unescape pass; control characters are embedded raw (the lexer accepts
    them inside quotes)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


_WS_LIT = _sql_lit(C.JAVA_WS)


def _cat_clean(x: str) -> str:
    """SQL twin of functions.cleaning.clean_text_col."""
    return (f"btrim(regexp_replace(coalesce({x}, ''), "
            f"{_sql_lit(C.GLYPH_RUN_PATTERN)}, ' '), {_WS_LIT})")


def _clustered_by_doc(rows: DataFrame) -> bool:
    """True when the input's physical plan is already hash-partitioned on a
    subset of {doc_id, page} with at least core-count parallelism.  Then
    the explicit parse repartition is REDUNDANT — and so are both assembly
    exchanges, because HashPartitioning on a subset of the grouping keys
    satisfies the ClusteredDistribution of both the (doc_id, page) and the
    (doc_id) aggregation (guide §2.4: remove shuffles outright where the
    data is already partitioned as needed).  A corpus that arrives
    partitioned by doc_id (bucketed table, upstream repartition, cache)
    runs the WHOLE extract shuffle-free: scan → parse → page agg → doc agg
    in one stage.  Skew note: this keeps each document's pages on one
    task, which is exactly the trade the upstream partitioning already
    made; inputs without that layout keep the page-level salting path
    below.  Any inspection failure falls back to the repartition."""
    try:
        sess = rows.sparkSession
        plan = rows._jdf.queryExecution().sparkPlan()
        part = plan.outputPartitioning()
        if part.getClass().getSimpleName() != "HashPartitioning":
            return False
        if part.numPartitions() < sess.sparkContext.defaultParallelism:
            return False
        outs = {plan.output().apply(i).toString()
                for i in range(plan.output().length())
                if plan.output().apply(i).name() in ("doc_id", "page")}
        exprs = part.expressions()
        names = [exprs.apply(i).toString() for i in range(exprs.length())]
        return bool(names) and all(n in outs for n in names)
    except Exception:
        return False


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
    return (docs.selectExpr("doc_id", "explode(spans) AS s")
            .selectExpr(
                "doc_id",
                f"CAST(s.offset div {C.PAGE_STRIDE} AS INT) AS page",
                f"CAST(pmod(s.offset, {C.PAGE_STRIDE}) AS INT) AS block",
                "s.kind AS raw_kind",
                "s.text AS raw_text",
                "s.media_ref AS raw_media_ref"))


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

    r6: when the input already arrives hash-partitioned on doc_id (see
    _clustered_by_doc) the repartition is skipped and the entire extract
    plan becomes exchange-free — 2 Exchange → 0.
    """
    if not _clustered_by_doc(rows):
        rows = rows.repartition(_parse_partitions(rows), "doc_id", "page")

    # ---- stage A: heavy derivations, one lazy CASE occurrence each --------
    # (single-parse SQL strings — transcription of the former Column code;
    # subtree duplication mirrors the Column form, which also expanded each
    # reused Column object into a copy of its tree)
    t_clean = _cat_clean("raw_text")
    s_dec = (f"CASE WHEN raw_text RLIKE {_sql_lit(C.SCAN_PAYLOAD_PATTERN)} "
             f"THEN try_validate_utf8(CAST(unbase64(substr(raw_text, "
             f"{len(C.SCAN_PREFIX) + 1}, length(raw_text))) AS STRING)) "
             f"ELSE NULL END")
    s_clean = (f"CASE WHEN ({s_dec}) IS NOT NULL "
               f"THEN {_cat_clean(f'({s_dec})')} END")
    h_raw = "coalesce(raw_text, '')"
    h_clean = _cat_clean(
        f"regexp_replace({h_raw}, {_sql_lit(C.HTML_TAG_PATTERN)}, ' ')")
    density = (f"CASE WHEN length({h_raw}) > 0 "
               f"THEN CAST(length({h_clean}) AS DOUBLE)"
               f" / CAST(length({h_raw}) AS DOUBLE) ELSE 0.0D END")
    h_keep = (f"CASE WHEN (({h_clean}) != '') AND (({density}) >= "
              f"{C.HTML_DENSITY_THRESHOLD!r}D) THEN {h_clean} END")
    tb_flat = (f"array_join(transform(split(coalesce(raw_text, ''), '\\n', -1), "
               f"row -> array_join(transform(split(row, '\\t', -1), "
               f"cell -> {_cat_clean('cell')}), '\\t')), '\\n')")
    tb_blank = f"(btrim(coalesce({tb_flat}, ''), {_WS_LIT}) = '')"
    tb_keep = f"CASE WHEN NOT {tb_blank} THEN {tb_flat} END"
    m_alt = f"CASE WHEN raw_text IS NOT NULL THEN {_cat_clean('raw_text')} END"
    m_keep = f"CASE WHEN ({m_alt}) != '' THEN {m_alt} END"

    cleaned = (
        f"CASE WHEN raw_kind = '{C.RAW_PDF_TEXT}' "
        f"THEN CASE WHEN ({t_clean}) != '' THEN {t_clean} END "
        f"WHEN raw_kind = '{C.RAW_PDF_SCAN}' "
        f"THEN CASE WHEN ({s_clean}) != '' THEN {s_clean} END "
        f"WHEN raw_kind = '{C.RAW_HTML}' THEN {h_keep} "
        f"WHEN raw_kind = '{C.RAW_TABLE}' THEN {tb_keep} "
        f"WHEN raw_kind = '{C.RAW_MEDIA}' THEN {m_keep} END")
    h_head = (f"CASE WHEN raw_kind = '{C.RAW_HTML}' "
              f"THEN {h_raw} RLIKE {_sql_lit(C.HTML_HEADING_PATTERN)} END")

    stage_a = rows.selectExpr(
        "doc_id", "page", "block", "raw_kind", "raw_media_ref",
        f"{cleaned} AS cleaned", f"{h_head} AS h_head")

    # ---- stage B: cheap classification on the stage-A strings --------------
    # One (kind, text) per span + scan_only (see PARSED_DDL): the fast
    # pipeline's result is derived downstream as "non-scan_only rows" (T4),
    # never materialized as a second column set.
    marks = " OR ".join(f"startswith(cleaned, {_sql_lit(m)})"
                        for m in C.HEADING_MARKERS)
    textual = (f"CASE WHEN ({marks}) "
               f"THEN '{C.KIND_HEADING}' ELSE '{C.KIND_PARAGRAPH}' END")
    html_kind = (f"CASE WHEN h_head THEN '{C.KIND_HEADING}' "
                 f"ELSE '{C.KIND_PARAGRAPH}' END")
    kind_out = (
        f"CASE WHEN raw_kind = '{C.RAW_PDF_TEXT}' "
        f"THEN CASE WHEN cleaned IS NOT NULL THEN {textual} END "
        f"WHEN raw_kind = '{C.RAW_PDF_SCAN}' "
        f"THEN CASE WHEN cleaned IS NOT NULL THEN {textual} END "
        f"WHEN raw_kind = '{C.RAW_HTML}' "
        f"THEN CASE WHEN cleaned IS NOT NULL THEN {html_kind} END "
        f"WHEN raw_kind = '{C.RAW_TABLE}' "
        f"THEN CASE WHEN cleaned IS NOT NULL THEN '{C.KIND_TABLE}' END "
        f"WHEN raw_kind = '{C.RAW_MEDIA}' "
        f"THEN CASE WHEN cleaned IS NOT NULL THEN '{C.KIND_FIGURE}' "
        f"ELSE '{C.KIND_MEDIA_REF}' END END")

    return stage_a.selectExpr(
        "doc_id", "page", "block",
        f"{kind_out} AS kind",
        "CASE WHEN cleaned IS NOT NULL THEN cleaned END AS text",
        f"CASE WHEN raw_kind = '{C.RAW_MEDIA}' THEN raw_media_ref END"
        " AS media_ref",
        f"coalesce(raw_kind = '{C.RAW_PDF_SCAN}', false) AS scan_only")


def parse_sql_union(rows: DataFrame) -> DataFrame:
    """Union-of-filtered-branches variant (kept for comparison)."""
    text = F.col("raw_text")
    keys = ["doc_id", "page", "block"]

    def out(df: DataFrame, k: Column, t: Column, m: Column,
            scan: bool = False) -> DataFrame:
        return df.select(
            *keys,
            k.cast("string").alias("kind"),
            t.cast("string").alias("text"),
            m.cast("string").alias("media_ref"),
            F.lit(scan).alias("scan_only"))

    ns = F.lit(None).cast("string")

    # pdf_text → both pipelines
    t = rows.filter(F.col("raw_kind") == C.RAW_PDF_TEXT)
    t_clean = X.clean_text_col(text)
    t_ok = t_clean != ""
    b_text = out(t, F.when(t_ok, X.classify_textual_col(t_clean)),
                 F.when(t_ok, t_clean), ns)

    # pdf_scan → full pipeline only (T4): scan_only marks the rows the fast
    # pass cannot see
    s = rows.filter(F.col("raw_kind") == C.RAW_PDF_SCAN)
    s_decoded = X.decode_scan_col(text)
    s_clean = F.when(s_decoded.isNotNull(), X.clean_text_col(s_decoded))
    s_ok = s_clean.isNotNull() & (s_clean != "")
    b_scan = out(s, F.when(s_ok, X.classify_textual_col(s_clean)),
                 F.when(s_ok, s_clean), ns, scan=True)

    # html → boilerplate strip by text-density
    h = rows.filter(F.col("raw_kind") == C.RAW_HTML)
    h_raw = F.coalesce(text, F.lit(""))
    h_clean = X.clean_text_col(X.strip_tags_col(h_raw))
    h_main = (h_clean != "") & (
        X.html_density_col(h_raw, h_clean) >= F.lit(C.HTML_DENSITY_THRESHOLD))
    h_kind = (F.when(h_main & X.html_is_heading_col(h_raw), F.lit(C.KIND_HEADING))
               .when(h_main, F.lit(C.KIND_PARAGRAPH)))
    b_html = out(h, h_kind, F.when(h_main, h_clean), ns)

    # table_raw → canonical flattening (T6)
    tb = rows.filter(F.col("raw_kind") == C.RAW_TABLE)
    tb_flat = X.flatten_table_col(text)
    tb_ok = ~X.is_blank_col(tb_flat)
    b_table = out(tb, F.when(tb_ok, F.lit(C.KIND_TABLE)),
                  F.when(tb_ok, tb_flat), ns)

    # media → figure / media_ref (T7)
    m = rows.filter(F.col("raw_kind") == C.RAW_MEDIA)
    m_alt = F.when(text.isNotNull(), X.clean_text_col(text)).otherwise(F.lit(""))
    m_is_fig = m_alt != ""
    m_kind = F.when(m_is_fig, F.lit(C.KIND_FIGURE)).otherwise(F.lit(C.KIND_MEDIA_REF))
    b_media = out(m, m_kind, F.when(m_is_fig, m_alt), F.col("raw_media_ref"))

    # unknown raw kinds: keep the row (page inventory) but emit nothing (S28)
    known = [C.RAW_PDF_TEXT, C.RAW_PDF_SCAN, C.RAW_HTML, C.RAW_TABLE, C.RAW_MEDIA]
    u = rows.filter(~F.col("raw_kind").isin(*known) | F.col("raw_kind").isNull())
    b_unknown = out(u, ns, ns, ns)

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

    k = (F.when(kind == C.RAW_PDF_TEXT,
                F.when(t_clean != "", X.classify_textual_col(t_clean)))
          .when(kind == C.RAW_PDF_SCAN,
                F.when(s_ok, X.classify_textual_col(s_clean)))
          .when(kind == C.RAW_HTML, h_kind)
          .when(kind == C.RAW_TABLE, F.when(tb_ok, F.lit(C.KIND_TABLE)))
          .when(kind == C.RAW_MEDIA,
                F.when(m_is_fig, F.lit(C.KIND_FIGURE))
                 .otherwise(F.lit(C.KIND_MEDIA_REF))))
    t = (F.when(kind == C.RAW_PDF_TEXT, F.when(t_clean != "", t_clean))
          .when(kind == C.RAW_PDF_SCAN, F.when(s_ok, s_clean))
          .when(kind == C.RAW_HTML, F.when(h_main, h_clean))
          .when(kind == C.RAW_TABLE, F.when(tb_ok, tb_flat))
          .when(kind == C.RAW_MEDIA, F.when(m_is_fig, m_alt)))
    m = F.when(kind == C.RAW_MEDIA, mref)
    return rows.select(
        "doc_id", "page", "block",
        k.alias("kind"), t.alias("text"), m.alias("media_ref"),
        F.coalesce(kind == C.RAW_PDF_SCAN, F.lit(False)).alias("scan_only"))


# ---------------------------------------------------------------------------
# stage 2b — Arrow parse (mapInArrow): the real-parser shape
# ---------------------------------------------------------------------------
#
# This is the shape a real byte-stream parser (PDF layout analysis / OCR)
# takes at 100 TB: Arrow batches stream from the JVM into a reused Python
# worker, the kernel does its work in NATIVE code over the batch, and Arrow
# batches stream back.  The kernel below keeps the Python layer thin the
# same way a real parser would (pdfium/tesseract do the heavy work in C):
#
# * string transforms run in pyarrow.compute (RE2 + Arrow C++ kernels)
#   directly on the received buffers — the strings are NEVER materialized
#   as Python objects.  The earlier pandas-object kernel decoded every
#   string into a PyObject and back per batch, which multiplied per-row
#   memory traffic ~5x and pinned the stage at the host's memory-bandwidth
#   ceiling — flat scaling beyond ~8 cores while the catalyst engine (same
#   bus) scaled at 0.89 (BENCH/BASELINE.md r2).
# * per-row Python survives ONLY where the contract is genuinely
#   imperative — base64 scan decode (the "call tesseract on this region"
#   analog) and nested table flattening — and runs on the per-kind SUBSET,
#   never the whole batch.
# * per-kind work uses take(subset) + one output sub-batch per kind (row
#   order after parse is irrelevant: assembly sorts within page groups), so
#   nothing is ever scattered back row-by-row.

def _kernel_clean(pc, arr):
    """contract.clean_text over an Arrow string array (T3).  RE2 and Python
    `re` agree on these patterns for the ASCII-whitespace corpora the
    contract covers (contract.py:30-36 documents the same tolerance for the
    Java regex engine).  r6: same single-pass fusion as the Catalyst
    engine (C.GLYPH_RUN_PATTERN proof) — one RE2 rebuild plus a set-based
    trim instead of three rebuilds."""
    from . import contract as Ct
    a = pc.replace_substring_regex(arr, pattern=Ct.GLYPH_RUN_PATTERN,
                                   replacement=" ")
    return pc.utf8_trim(a, characters=Ct.JAVA_WS)


def _kernel_classify(pa, pc, cl):
    """heading/paragraph (T2): startswith any HEADING_MARKER."""
    from . import contract as Ct
    m = None
    for marker in Ct.HEADING_MARKERS:
        s = pc.starts_with(cl, pattern=marker)
        m = s if m is None else pc.or_(m, s)
    return pc.if_else(m, pa.scalar(Ct.KIND_HEADING),
                      pa.scalar(Ct.KIND_PARAGRAPH))


def _parse_arrow_batch(batch) -> Iterator["object"]:
    """Parse one Arrow batch of raw span rows into the narrow parsed schema
    (PARSED_DDL), yielding one sub-batch per raw kind class.  Every input
    row appears in exactly one output sub-batch (dropped spans keep their
    row with kind=null — the page inventory needs the (doc_id, page) pair,
    S28)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from . import contract as Ct

    kind = batch.column("raw_kind")
    text = batch.column("raw_text")
    mref = batch.column("raw_media_ref")
    keys = (batch.column("doc_id"), batch.column("page"),
            batch.column("block"))

    schema = pa.schema([
        pa.field("doc_id", pa.string()), pa.field("page", pa.int32()),
        pa.field("block", pa.int32()), pa.field("kind", pa.string()),
        pa.field("text", pa.string()), pa.field("media_ref", pa.string()),
        pa.field("scan_only", pa.bool_()),
    ])

    def sub(idx, kinds, texts, mrefs, scan):
        k = [pc.take(c, idx) for c in keys]
        n = len(idx)
        return pa.record_batch(
            [*k, kinds, texts,
             mrefs if mrefs is not None else pa.nulls(n, pa.string()),
             pa.array([scan] * n, pa.bool_()) if isinstance(scan, bool)
             else scan],
            schema=schema)

    def gated(ok, cl):
        """(classified kind, text) with null where the span is dropped."""
        null_s = pa.scalar(None, pa.string())
        kinds = pc.if_else(ok, _kernel_classify(pa, pc, cl), null_s)
        texts = pc.if_else(ok, cl, null_s)
        return kinds, texts

    matched = None

    def mask(raw_kind):
        nonlocal matched
        m = pc.fill_null(pc.equal(kind, raw_kind), False)
        matched = m if matched is None else pc.or_(matched, m)
        return pc.indices_nonzero(m)

    # pdf_text
    idx = mask(Ct.RAW_PDF_TEXT)
    if len(idx):
        cl = _kernel_clean(pc, pc.take(text, idx))
        ok = pc.fill_null(pc.not_equal(cl, ""), False)
        kinds, texts = gated(ok, cl)
        yield sub(idx, kinds, texts, None, False)

    # pdf_scan → imperative base64 "OCR" decode on the scan subset only;
    # the fast pass cannot see these rows (scan_only, T4)
    idx = mask(Ct.RAW_PDF_SCAN)
    if len(idx):
        raw = pc.take(text, idx)
        decoded = pa.array(
            [Ct.decode_scan(s) if s is not None else None
             for s in raw.to_pylist()], pa.string())
        cl = _kernel_clean(pc, decoded)
        ok = pc.fill_null(pc.not_equal(cl, ""), False)
        kinds, texts = gated(ok, cl)
        yield sub(idx, kinds, texts, None, True)

    # html → tag strip + text-density boilerplate gate
    idx = mask(Ct.RAW_HTML)
    if len(idx):
        raw = pc.fill_null(pc.take(text, idx), "")
        cl = _kernel_clean(pc, pc.replace_substring_regex(
            raw, pattern=Ct.HTML_TAG_PATTERN, replacement=" "))
        rl = pc.cast(pc.utf8_length(raw), pa.float64())
        cll = pc.cast(pc.utf8_length(cl), pa.float64())
        dens = pc.if_else(pc.greater(rl, 0.0), pc.divide(cll, rl), 0.0)
        main = pc.and_(pc.not_equal(cl, ""),
                       pc.greater_equal(dens, Ct.HTML_DENSITY_THRESHOLD))
        is_h = pc.match_substring_regex(raw, pattern=Ct.HTML_HEADING_PATTERN)
        null_s = pa.scalar(None, pa.string())
        kinds = pc.if_else(
            main, pc.if_else(is_h, pa.scalar(Ct.KIND_HEADING),
                             pa.scalar(Ct.KIND_PARAGRAPH)), null_s)
        texts = pc.if_else(main, cl, null_s)
        yield sub(idx, kinds, texts, None, False)

    # table_raw → imperative nested flattening on the table subset (T6)
    idx = mask(Ct.RAW_TABLE)
    if len(idx):
        raw = pc.take(text, idx)
        flat = pa.array(
            [Ct.flatten_table(s) if s is not None else None
             for s in raw.to_pylist()], pa.string())
        ok = pc.fill_null(
            pc.not_equal(pc.utf8_trim_whitespace(flat), ""), False)
        null_s = pa.scalar(None, pa.string())
        kinds = pc.if_else(ok, pa.scalar(Ct.KIND_TABLE), null_s)
        texts = pc.if_else(ok, flat, null_s)
        yield sub(idx, kinds, texts, None, False)

    # media → figure / media_ref (T7): every media row keeps a kind
    idx = mask(Ct.RAW_MEDIA)
    if len(idx):
        alt = _kernel_clean(pc, pc.take(text, idx))
        has_alt = pc.fill_null(pc.not_equal(alt, ""), False)
        kinds = pc.if_else(has_alt, pa.scalar(Ct.KIND_FIGURE),
                           pa.scalar(Ct.KIND_MEDIA_REF))
        texts = pc.if_else(has_alt, alt, pa.scalar(None, pa.string()))
        yield sub(idx, kinds, texts, pc.take(mref, idx), False)

    # unknown / null raw kinds: row kept, nothing emitted (S28)
    rem = pc.indices_nonzero(pc.invert(matched))
    if len(rem):
        n = len(rem)
        yield sub(rem, pa.nulls(n, pa.string()), pa.nulls(n, pa.string()),
                  None, False)


def _parse_pandas_batch(pdf):
    """Pandas-object variant of the kernel (narrow schema), kept as the
    reference shape for parsers whose vectorized library wants pandas in
    (and for an honest A/B of object-materialization cost — see
    BENCH/diag_kernel_scaling.py).  Not on the default engine path."""
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
           for c in ("kind", "text", "media_ref")}
    scan_only = np.zeros(n, dtype=bool)

    def emit(idx, kinds, texts, refs=None):
        out["kind"][idx] = kinds
        out["text"][idx] = texts
        if refs is not None:
            out["media_ref"][idx] = refs

    # pdf_text
    pos = np.flatnonzero(kind == Ct.RAW_PDF_TEXT)
    if pos.size:
        cl = clean(raw.iloc[pos].reset_index(drop=True))
        ok = (cl != "").to_numpy()
        keep = pos[ok]
        clk = cl.iloc[np.flatnonzero(ok)].reset_index(drop=True)
        emit(keep, classify(clk), clk.to_numpy(dtype=object))

    # pdf_scan → scan_only rows (T4)
    pos = np.flatnonzero(kind == Ct.RAW_PDF_SCAN)
    if pos.size:
        scan_only[pos] = True
        decoded = raw.iloc[pos].map(Ct.decode_scan).reset_index(drop=True)
        dn = decoded.notna().to_numpy()
        cl = clean(decoded.fillna("").astype(str))
        ok = dn & (cl != "").to_numpy()
        keep = pos[ok]
        clk = cl.iloc[np.flatnonzero(ok)].reset_index(drop=True)
        emit(keep, classify(clk), clk.to_numpy(dtype=object))

    # html
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

    # table_raw
    pos = np.flatnonzero(kind == Ct.RAW_TABLE)
    if pos.size:
        flat = raw.iloc[pos].map(Ct.flatten_table).reset_index(drop=True)
        ok = (flat.str.strip() != "").to_numpy()
        keep = pos[ok]
        emit(keep, Ct.KIND_TABLE,
             flat.iloc[np.flatnonzero(ok)].to_numpy(dtype=object))

    # media
    pos = np.flatnonzero(kind == Ct.RAW_MEDIA)
    if pos.size:
        alt = clean(raw.iloc[pos].reset_index(drop=True))
        has_alt = text_notnull[pos] & (alt != "").to_numpy()
        kinds = np.where(has_alt, Ct.KIND_FIGURE, Ct.KIND_MEDIA_REF)
        texts = np.where(has_alt, alt.to_numpy(dtype=object), None)
        emit(pos, kinds, texts, refs=mref[pos])

    return pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(dtype=object),
                         "page": pdf["page"].to_numpy(),
                         "block": pdf["block"].to_numpy(), **out,
                         "scan_only": scan_only})


def parse_arrow(rows: DataFrame) -> DataFrame:
    def fn(batches: Iterator["object"]) -> Iterator["object"]:
        for batch in batches:
            yield from _parse_arrow_batch(batch)

    # page-balancing shuffle as in parse_sql, but with the arrow-specific
    # (lower) wave factor — see _arrow_partitions
    return (rows.repartition(_arrow_partitions(rows), "doc_id", "page")
            .mapInArrow(fn, PARSED_DDL))


def parse_pandas(rows: DataFrame) -> DataFrame:
    """mapInArrow via the pandas-object kernel (comparison engine)."""
    import pyarrow as pa

    def fn(batches: Iterator["object"]) -> Iterator["object"]:
        schema = pa.schema([
            pa.field("doc_id", pa.string()), pa.field("page", pa.int32()),
            pa.field("block", pa.int32()), pa.field("kind", pa.string()),
            pa.field("text", pa.string()),
            pa.field("media_ref", pa.string()),
            pa.field("scan_only", pa.bool_()),
        ])
        for batch in batches:
            res = _parse_pandas_batch(batch.to_pandas())
            yield pa.RecordBatch.from_pandas(res, schema=schema,
                                             preserve_index=False)

    return (rows.repartition(_arrow_partitions(rows), "doc_id", "page")
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
        F.col("kind"),
        F.coalesce(F.col("text"), F.lit(_TIE_NULL)),
        F.coalesce(F.col("media_ref"), F.lit(_TIE_NULL)))
    return F.crc32(F.encode(key, "UTF-8"))


def assemble(parsed: DataFrame, with_layout: bool = False,
             ocr_pipeline: str = "hybrid") -> DataFrame:
    """Page-level fallback choice (T4) then doc-level reading order (T1).
    Two-level aggregation = explicit skew salting by page.
    with_layout=True additionally emits the S21/S22 lineage-metadata
    fields per span: Position struct + page dimensions (contract.py).

    One collect_list per page: each span is collected once with its
    `scan_only` flag and the page picks `filter(arr, !scan_only)` (fast
    pass accepted) or the whole array (full fallback) — the narrow parsed
    schema means the aggregation buffers hold each string exactly once.

    ocr_pipeline mirrors the reference's converter-chain choice
    (models.OcrPipeline, api.py:69, content_extractor.py:125-134):
    "hybrid" = per-page fast→full fallback; "fast" = fast only (the
    non-scan_only subset, accepted unconditionally as the last
    converter); "full" = full only (every span incl. scan decodes).
    Single-converter modes have no chain, so fallback_pages is 0."""
    if ocr_pipeline not in ("hybrid", "fast", "full"):
        raise ValueError(f"unknown ocr_pipeline: {ocr_pipeline!r}")
    # single-parse SQL strings (r6) — transcription of the former Column
    # aggregation; the named_struct field order, the tiebreak concat and
    # both comparators are byte-for-byte the same expressions
    tie = (f"crc32(encode(concat_ws({_sql_lit(chr(0x1f))}, kind, "
           f"coalesce(text, {_sql_lit(_TIE_NULL)}), "
           f"coalesce(media_ref, {_sql_lit(_TIE_NULL)})), 'UTF-8'))")
    span_s = (f"CASE WHEN kind IS NOT NULL THEN named_struct("
              f"'block', block, 'pg', page, 'tb', {tie}, 'kind', kind, "
              f"'text', text, 'media_ref', media_ref, "
              f"'scan_only', scan_only) END")
    kinds_in = ", ".join(_sql_lit(k) for k in C.TEXT_KINDS)

    page_level = (parsed.groupBy("doc_id", "page").agg(
        F.expr(f"collect_list({span_s})").alias("arr"),
        F.expr(f"max(CASE WHEN kind IN ({kinds_in}) AND (NOT scan_only) "
               f"THEN 1 ELSE 0 END)").alias("has_text"),
    ))

    fast_subset = "filter(arr, x -> NOT x.scan_only)"
    if ocr_pipeline == "fast":
        chosen, fallback = fast_subset, "0"
    elif ocr_pipeline == "full":
        chosen, fallback = "arr", "0"
    else:
        chosen = f"CASE WHEN has_text = 1 THEN {fast_subset} ELSE arr END"
        fallback = "1 - has_text"
    cmp_block_tb = ("(a, b) -> CASE WHEN a.block < b.block THEN -1 "
                    "WHEN a.block > b.block THEN 1 ELSE "
                    "CASE WHEN a.tb < b.tb THEN -1 "
                    "WHEN a.tb > b.tb THEN 1 ELSE 0 END END")
    page_level = page_level.selectExpr(
        "doc_id", "page",
        f"array_sort({chosen}, {cmp_block_tb}) AS page_spans",
        f"{fallback} AS fallback",
    )

    cmp_page = ("(a, b) -> CASE WHEN a.page < b.page THEN -1 "
                "WHEN a.page > b.page THEN 1 ELSE 0 END")
    doc_level = (page_level.groupBy("doc_id").agg(
        F.expr("collect_list(named_struct('page', page, 'ps', page_spans))")
         .alias("pages_arr"),
        F.expr("sum(fallback)").alias("fallback_pages"),
        F.expr("count(1)").alias("pages_in"),
    )).selectExpr(
        "doc_id",
        f"flatten(transform(array_sort(pages_arr, {cmp_page}), x -> x.ps))"
        " AS flat",
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
        return doc_level.select(
            "doc_id", spans.alias("spans"), "fallback_pages", "pages_in")
    return doc_level.selectExpr(
        "doc_id",
        "transform(flat, (x, i) -> named_struct('kind', x.kind, "
        "'text', x.text, 'media_ref', x.media_ref, "
        "'offset', CAST(i AS INT))) AS spans",
        "fallback_pages", "pages_in")


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

ENGINES = {"sql": parse_sql, "sql_union": parse_sql_union,
           "sql_fused": parse_sql_fused, "arrow": parse_arrow,
           "pandas": parse_pandas}


def extract_documents(docs: DataFrame, engine: str = "sql",
                      with_layout: bool = False, first_page: int = 1,
                      last_page: int | None = None,
                      ocr_pipeline: str = "hybrid") -> DataFrame:
    """input (doc_id, spans) -> extracted (doc_id, spans) per the contract.
    Docs with zero surviving spans are excluded (T5).  with_layout=True
    widens each output span with position/page_width/page_height (S21/S22).
    first_page/last_page (1-based, inclusive) bound extraction to a page
    range (see explode_spans); offsets renumber within the restricted
    output, exactly as the reference numbers only the processed pages.
    ocr_pipeline selects the converter chain (fast/full/hybrid — see
    assemble)."""
    parsed = ENGINES[engine](explode_spans(docs, first_page, last_page))
    return (assemble(parsed, with_layout=with_layout,
                     ocr_pipeline=ocr_pipeline)
            .filter(F.size("spans") > 0)
            .select("doc_id", "spans"))


def extract_with_metrics(docs: DataFrame, engine: str = "sql",
                         first_page: int = 1, last_page: int | None = None,
                         ocr_pipeline: str = "hybrid"
                         ) -> tuple[DataFrame, Observation, Observation]:
    """Same plan plus zero-extra-pass metrics via Observations
    (docs/spans processed, OCR fallback rate — BASELINE.json:6).
    Returns (result_df, input_obs, output_obs); observation values are
    available after one action on result_df."""
    in_obs = Observation("extract_input")
    docs = docs.observe(
        in_obs,
        F.expr("count(1)").alias("docs_in"),
        F.expr("sum(CASE WHEN size(spans) <= 0 THEN 1 ELSE 0 END)")
         .alias("empty_docs"),
        F.expr("sum(size(spans))").alias("spans_in"),
    )
    parsed = ENGINES[engine](explode_spans(docs, first_page, last_page))
    doc_level = assemble(parsed, ocr_pipeline=ocr_pipeline)
    out_obs = Observation("extract_output")
    doc_level = doc_level.observe(
        out_obs,
        F.expr("count(1)").alias("docs_converted"),
        F.expr("sum(CASE WHEN size(spans) > 0 THEN 1 ELSE 0 END)")
         .alias("docs_out"),
        F.expr("sum(size(spans))").alias("spans_out"),
        F.expr("sum(fallback_pages)").alias("fallback_pages"),
        F.expr("sum(pages_in)").alias("pages_in"),
        F.expr("sum(CASE WHEN fallback_pages > 0 THEN 1 ELSE 0 END)")
         .alias("fallback_docs"),
    )
    result = (doc_level.filter(F.size("spans") > 0)
              .select("doc_id", "spans"))
    return result, in_obs, out_obs
