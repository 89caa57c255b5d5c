"""Invariants for the session-12 operators: RAKE keyphrase extraction and
the skyline (Pareto-front) supplier query, against pure-Python recomputes.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

SF_DIR = "/root/testdata/sf0.001"

_C = Decimal("0.01")


def _d2(x: float) -> Decimal:
    return Decimal(x).quantize(_C, rounding=ROUND_HALF_UP)


def _load(spark, name):
    return spark.read.parquet(f"{SF_DIR}/{name}.parquet").collect()


def test_rake_matches_python(spark):
    from document_processor_spark.operators.text_analysis import (
        RAKE_STOPS, RAKE_TOP_K, q_rake_keyphrases,
    )

    stops = set(RAKE_STOPS)
    want = {}
    for r in _load(spark, "documents"):
        if not r["text"]:
            continue
        words = r["text"].split(" ")
        phrases, cur = [], []
        for w in words:
            if w == "" or w in stops:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
        if not phrases:
            continue
        freq, deg = defaultdict(int), defaultdict(int)
        for p in phrases:
            for w in p:
                freq[w] += 1
                deg[w] += len(p)
        scored = sorted(
            ((sum(deg[w] * 10000 // freq[w] for w in p), " ".join(p))
             for p in phrases),
            key=lambda t: (-t[0], t[1]))
        want[r["doc_id"]] = scored[:RAKE_TOP_K]

    got = defaultdict(list)
    for r in q_rake_keyphrases(spark, SF_DIR).collect():
        got[r["doc_id"]].append(r)
    assert set(got) == set(want)
    for doc_id, exp in want.items():
        rows = sorted(got[doc_id], key=lambda r: r["rank"])
        assert [(r["score_bp"], r["phrase"]) for r in rows] == exp


def test_skyline_matches_python(spark):
    from document_processor_spark.operators.relational import (
        q_skyline_suppliers,
    )

    per = defaultdict(lambda: [Decimal(0), Decimal(0)])
    for r in _load(spark, "lineitem"):
        rev = _d2(r["l_extendedprice"]) * (Decimal(1) - _d2(r["l_discount"]))
        per[r["l_suppkey"]][0] += rev
        per[r["l_suppkey"]][1] += _d2(r["l_quantity"])
    pts = {k: (int(v[0] * 10000), int(v[1])) for k, v in per.items()}

    def dominated(a):
        ra, qa = pts[a]
        return any(
            (rb >= ra and qb >= qa and (rb > ra or qb > qa))
            for b, (rb, qb) in pts.items() if b != a)

    want = {k: pts[k] for k in pts if not dominated(k)}
    got = q_skyline_suppliers(spark, SF_DIR).collect()
    assert {r["l_suppkey"]: (r["rev_units"], r["total_qty"])
            for r in got} == want
    # the front must be a real subset: nonempty and not everything
    assert 0 < len(got) < len(pts)
