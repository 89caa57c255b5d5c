"""Invariants for the session-7 operators against independent pure-Python
recomputes: SQ8 scalar-quantized ANN, overlapping context-window chunking,
k-anonymity audit, sorted-neighborhood blocking, and boolean retrieval.

Each test recomputes the expected answer from the raw parquet rows with
plain Python (no Spark, no DuckDB) so a shared mistake in the two engines'
SQL cannot self-certify.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict

SF_DIR = "/root/testdata/sf0.001"


def _load(spark, name):
    return spark.read.parquet(f"{SF_DIR}/{name}.parquet").collect()


# -- ann_sq8_topk -------------------------------------------------------------------


def _sq8_codes(rows):
    dims = len(rows[0]["embedding"])
    mn = [math.inf] * dims
    mx = [-math.inf] * dims
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    for v in vecs.values():
        for i, x in enumerate(v):
            mn[i] = min(mn[i], x)
            mx[i] = max(mx[i], x)
    codes = {}
    for vid, v in vecs.items():
        codes[vid] = [
            min(255, math.floor((x - mn[i]) * 255.0 / (mx[i] - mn[i])))
            if mx[i] > mn[i] else 0
            for i, x in enumerate(v)]
    return codes


def test_sq8_topk_matches_python(spark):
    from document_processor_spark.operators.ann import (
        QUERY_MOD, TOP_K, q_ann_sq8_topk,
    )

    codes = _sq8_codes(_load(spark, "embeddings"))
    got = q_ann_sq8_topk(spark, SF_DIR).collect()

    by_q = defaultdict(list)
    for r in got:
        by_q[r["query_id"]].append(r)

    queries = sorted(v for v in codes if v % QUERY_MOD == 0)
    assert sorted(by_q) == queries
    for qid in queries:
        qc = codes[qid]
        scored = sorted(
            ((sum(a * b for a, b in zip(qc, c)), vid)
             for vid, c in codes.items() if vid != qid),
            key=lambda t: (-t[0], t[1]))
        want = scored[:TOP_K]
        rows = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [(r["score_q"], r["vec_id"]) for r in rows] == want
        assert [r["rank"] for r in rows] == list(range(1, TOP_K + 1))
        # every code must be a genuine uint8 value
        assert all(0 <= x <= 255 for c in codes.values() for x in c)


# -- cur_chunk_overlap --------------------------------------------------------------


def test_chunk_overlap_covers_every_token(spark):
    from document_processor_spark.operators.curation import (
        CHUNK_STRIDE, CHUNK_W, q_cur_chunk_overlap,
    )

    docs = {r["doc_id"]: r["text"] for r in _load(spark, "documents")}
    got = q_cur_chunk_overlap(spark, SF_DIR).collect()
    by_doc = defaultdict(dict)
    for r in got:
        by_doc[r["doc_id"]][r["chunk_idx"]] = r

    assert set(by_doc) == set(docs)
    for doc_id, text in docs.items():
        words = text.split(" ")
        starts = list(range(0, max(len(words) - 1, 0) + 1, CHUNK_STRIDE))
        chunks = by_doc[doc_id]
        assert sorted(chunks) == list(range(len(starts)))
        rebuilt = []
        for idx, s in enumerate(starts):
            want = words[s:s + CHUNK_W]
            r = chunks[idx]
            assert r["chunk_text"] == " ".join(want)
            assert r["n_tokens"] == len(want)
            rebuilt.extend(want if idx == 0 else want[CHUNK_W - CHUNK_STRIDE:])
        # total coverage: stitching de-overlapped chunks rebuilds the doc
        assert rebuilt == words


# -- cur_k_anonymity ----------------------------------------------------------------


def test_k_anonymity_matches_python(spark):
    from document_processor_spark.operators.curation import (
        K_ANON, q_cur_k_anonymity,
    )

    cells = defaultdict(int)
    for r in _load(spark, "documents"):
        bucket = min(r["n_chars"] // 100, 9)
        cells[(r["lang"], r["source"], bucket)] += 1

    got = q_cur_k_anonymity(spark, SF_DIR).collect()
    assert len(got) == len(cells)
    for r in got:
        n = cells[(r["lang"], r["source"], r["len_bucket"])]
        assert r["n_docs"] == n
        assert r["below_k"] == (n < K_ANON)


# -- dedup_sorted_blocking ----------------------------------------------------------


def test_sorted_blocking_matches_python(spark):
    from document_processor_spark.operators.dedup import (
        SNM_KEY_LEN, SNM_W, q_dedup_sorted_blocking,
    )

    rows = _load(spark, "documents")
    keyed = sorted(
        (re.sub("[^a-z]", "", r["text"].lower())[:SNM_KEY_LEN], r["doc_id"])
        for r in rows)
    want = set()
    for i in range(len(keyed)):
        for j in range(i + 1, min(i + SNM_W + 1, len(keyed))):
            want.add((keyed[i][1], keyed[j][1], j - i))

    got = q_dedup_sorted_blocking(spark, SF_DIR).collect()
    assert len(got) == len(want)
    assert {(r["doc_a"], r["doc_b"], r["gap"]) for r in got} == want


# -- ta_boolean_search --------------------------------------------------------------


def test_boolean_search_matches_python(spark):
    from document_processor_spark.operators.text_analysis import (
        BOOL_MIN_LEN, BOOL_MIN_MATCH, BOOL_QUERY_MOD, BOOL_TERMS,
        q_boolean_search,
    )

    post = {}
    for r in _load(spark, "documents"):
        if not r["text"]:
            continue
        post[r["doc_id"]] = {w for w in r["text"].split(" ") if w}

    want = {}
    for qid, words in post.items():
        if qid % BOOL_QUERY_MOD != 0:
            continue
        terms = sorted(w for w in words if len(w) >= BOOL_MIN_LEN)[:BOOL_TERMS]
        if not terms:
            continue
        for did, dwords in post.items():
            if did == qid:
                continue
            n = len(set(terms) & dwords)
            if n >= BOOL_MIN_MATCH:
                want[(qid, did)] = (n, n == len(terms))

    got = q_boolean_search(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        assert want[(r["query_id"], r["doc_id"])] == (r["n_matched"],
                                                      r["and_match"])
