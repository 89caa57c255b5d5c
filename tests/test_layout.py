"""S21/S22: position + page-dimension lineage metadata (with_layout=True)
must match the synthetic-layout contract exactly, on both engines."""

import pytest

from document_processor_spark import contract as C
from document_processor_spark import fixtures, oracle, pipeline


@pytest.mark.parametrize("engine", ["sql", "arrow"])
def test_layout_matches_oracle(spark, engine):
    docs = fixtures.generate_corpus(0.001, include_skew=False)
    expected = {}
    for d in docs:
        r = oracle.extract_document(d["doc_id"], d["spans"])
        if r.skipped:
            continue
        spans = []
        for (k, t, m, i), (page, block) in zip(r.spans, r.slots):
            pos = C.position_for(page, block)
            w, h = C.page_dims(page)
            spans.append((k, t, m, i, tuple(sorted(pos.items())), w, h))
        expected[r.doc_id] = spans

    df = fixtures.corpus_df(spark, 0.001, include_skew=False, n_partitions=8)
    out = pipeline.extract_documents(df, engine=engine, with_layout=True).collect()
    got = {}
    for row in out:
        spans = []
        for s in row["spans"]:
            p = s["position"].asDict()
            spans.append((s["kind"], s["text"], s["media_ref"], s["offset"],
                          tuple(sorted(p.items())),
                          s["page_width"], s["page_height"]))
        got[row["doc_id"]] = spans
    assert got == expected


def test_position_contract_shape():
    pos = C.position_for(0, 0)
    assert pos == {"page_num": 1, "top": 72.0, "right": 523.28,
                   "bottom": 96.85, "left": 72.0, "coord_origin": "TOPLEFT"}
    # odd pages are landscape
    assert C.page_dims(1) == (C.PAGE_H_PORTRAIT, C.PAGE_W_PORTRAIT)
    # line grid wraps at LINES_PER_PAGE
    assert C.position_for(0, C.LINES_PER_PAGE)["top"] == 72.0
