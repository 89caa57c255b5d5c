"""End-to-end golden tests: Spark pipeline (both engines) vs the pure-Python
oracle — span-sequence equality (kind, text, media_ref, order) per document
(BASELINE.json:14-15)."""

import pytest

from document_processor_spark import fixtures, oracle, pipeline
from tests.conftest import collect_spans


@pytest.fixture(scope="module")
def input_df(spark, corpus):
    rows = [(d["doc_id"],
             [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]])
            for d in corpus]
    return spark.createDataFrame(rows, schema=fixtures.INPUT_DDL) \
                .repartition(8, "doc_id")


@pytest.mark.parametrize("engine", ["sql", "arrow"])
def test_e2e_matches_oracle(spark, input_df, golden, engine):
    expected, _ = golden
    got = collect_spans(pipeline.extract_documents(input_df, engine=engine))
    assert set(got) == set(expected)
    for doc_id in expected:
        assert got[doc_id] == expected[doc_id], doc_id


def test_engines_agree(spark, input_df):
    a = collect_spans(pipeline.extract_documents(input_df, engine="sql"))
    b = collect_spans(pipeline.extract_documents(input_df, engine="arrow"))
    assert a == b


def test_output_schema(spark, input_df):
    out = pipeline.extract_documents(input_df)
    assert out.schema.simpleString() == (
        "struct<doc_id:string,spans:array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>>")


def test_metrics_match_oracle(spark, input_df, golden):
    _, om = golden
    result, in_obs, out_obs = pipeline.extract_with_metrics(input_df)
    n_out = result.count()  # one action materializes both observations
    iv, ov = in_obs.get, out_obs.get
    assert iv["docs_in"] == om.docs_in
    assert ov["docs_out"] == om.docs_out == n_out
    assert ov["spans_out"] == om.spans_out
    assert ov["fallback_pages"] == om.fallback_pages
    assert ov["fallback_docs"] == om.fallback_docs
    assert ov["pages_in"] == om.pages_in
    assert iv["docs_in"] - ov["docs_out"] == om.skipped_docs


def test_skew_doc_salted_assembly(spark):
    """FIXTURES.md §4 skew doc: 1000 pages / 50k spans through the two-level
    (page → doc) assembly; exact equality with the oracle."""
    docs = [fixtures._skew_doc(42, pages=300, spans_per_page=50)]
    expected, _ = oracle.extract_corpus(docs)
    rows = [(d["doc_id"],
             [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]])
            for d in docs]
    df = spark.createDataFrame(rows, schema=fixtures.INPUT_DDL)
    got = collect_spans(pipeline.extract_documents(df))
    assert got == expected
    assert len(got["doc-edge-skew"]) > 10_000


@pytest.mark.parametrize("seed", [7, 99])
def test_property_other_seeds(spark, seed):
    """Property-style: different seeds, same invariants + oracle equality."""
    docs = fixtures.generate_corpus(0.0005, seed=seed, include_skew=False)
    expected, _ = oracle.extract_corpus(docs)
    rows = [(d["doc_id"],
             [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]])
            for d in docs]
    df = spark.createDataFrame(rows, schema=fixtures.INPUT_DDL)
    got = collect_spans(pipeline.extract_documents(df))
    assert got == expected
    for seq in got.values():
        assert [s[3] for s in seq] == list(range(len(seq)))


@pytest.mark.parametrize("engine", ["sql", "arrow"])
@pytest.mark.parametrize("page_range", [(2, 4), (1, 1), (3, None)])
def test_page_range_matches_oracle(spark, input_df, corpus, engine, page_range):
    """S1/S6: first_page/last_page bound extraction to a page range; the
    restricted Spark output equals the oracle restricted the same way
    (offsets renumbered within the range, fallback decided per kept page)."""
    first, last = page_range
    golden, _m = oracle.extract_corpus(corpus, first_page=first, last_page=last)
    got = collect_spans(pipeline.extract_documents(
        input_df, engine=engine, first_page=first, last_page=last))
    assert got == golden
    assert golden  # the range keeps some content (not a vacuous pass)


def test_parse_partitions_size_aware(spark, input_df):
    """Partition sizing: small inputs stop at one wave (cores), the
    cores x factor ceiling holds for huge plan sizes, and the arrow
    engine's ceiling is the lower wave factor."""
    cores = spark.sparkContext.defaultParallelism
    # size-awareness needs a plan that carries stats (cache, parquet scan);
    # a raw createDataFrame LogicalRDD has unknown size and falls back to
    # the ceiling — materialize, as bench.py and the jobs do
    cached = input_df.persist()
    cached.count()
    try:
        rows = pipeline.explode_spans(cached)
        p_sql = pipeline._parse_partitions(rows)
        p_arrow = pipeline._arrow_partitions(rows)
        assert cores <= p_sql <= max(cores * pipeline._PARSE_WAVE_FACTOR, 48)
        assert cores <= p_arrow <= max(cores * pipeline._ARROW_WAVE_FACTOR, 16)
        # the sf0.001 fixture corpus is far below one target slice per
        # core: both engines should sit at the one-wave floor, not the
        # ceiling
        assert p_sql == cores
        assert p_arrow == cores
    finally:
        cached.unpersist()


@pytest.mark.parametrize("engine", ["sql", "arrow"])
@pytest.mark.parametrize("mode", ["fast", "full"])
def test_ocr_pipeline_modes_match_oracle(spark, input_df, corpus, engine,
                                         mode):
    """S8-S10: ocr_pipeline=fast/full select a single-converter chain
    (reference models.OcrPipeline, content_extractor.py:125-134); the
    Spark output equals the oracle run in the same mode.  hybrid is the
    default exercised by every other e2e test."""
    golden, gm = oracle.extract_corpus(corpus, ocr_pipeline=mode)
    got = collect_spans(pipeline.extract_documents(
        input_df, engine=engine, ocr_pipeline=mode))
    assert got == golden
    assert gm.fallback_pages == 0  # single converter: no fallback chain
    if mode == "fast":
        # fast genuinely differs from hybrid on this corpus (scan pages
        # lose their text); full == hybrid here because no fixture page
        # mixes digital text and scan regions — that case is covered by
        # test_ocr_pipeline_modes_diverge_on_mixed_page
        hybrid, _ = oracle.extract_corpus(corpus)
        assert golden != hybrid


@pytest.mark.parametrize("engine", ["sql", "arrow"])
def test_ocr_pipeline_modes_diverge_on_mixed_page(spark, engine):
    """A partially-scanned page (digital text AND a scan region on ONE
    page) separates all three chains: hybrid keeps only the fast subset
    (page has text -> scan dropped), full decodes the scan too, fast
    equals hybrid here but pays no fallback anywhere."""
    import base64
    scan_payload = "scan:" + base64.b64encode(b"scanned words here").decode()
    docs = [{"doc_id": "mixed", "spans": [
        {"kind": "pdf_text", "text": "Digital paragraph text.",
         "media_ref": None, "offset": 0},
        {"kind": "pdf_scan", "text": scan_payload,
         "media_ref": None, "offset": 1},
    ]}]
    rows = [(d["doc_id"],
             [(s["kind"], s["text"], s["media_ref"], s["offset"])
              for s in d["spans"]]) for d in docs]
    df = spark.createDataFrame(rows, schema=fixtures.INPUT_DDL)
    results = {}
    for mode in ("hybrid", "fast", "full"):
        expected, _ = oracle.extract_corpus(docs, ocr_pipeline=mode)
        got = collect_spans(pipeline.extract_documents(
            df, engine=engine, ocr_pipeline=mode))
        assert got == expected, mode
        results[mode] = got
    assert results["fast"] == results["hybrid"]      # page has text
    assert results["full"] != results["hybrid"]      # scan decoded too
    n = {m: len(r["mixed"]) for m, r in results.items()}
    assert n["full"] == n["hybrid"] + 1
