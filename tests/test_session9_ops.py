"""Invariants for the session-9 operators against independent pure-Python
recomputes: CUBE grouping sets, DP-noised release counts, mergeable
histogram quantiles, and asymmetric shingle containment.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

SF_DIR = "/root/testdata/sf0.001"

_C = Decimal("0.01")


def _d2(x: float) -> Decimal:
    return Decimal(x).quantize(_C, rounding=ROUND_HALF_UP)


def _load(spark, name):
    return spark.read.parquet(f"{SF_DIR}/{name}.parquet").collect()


def _hash_u(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


# -- rel_cube_mix -------------------------------------------------------------------


def test_cube_mix_matches_python(spark):
    from document_processor_spark.operators.relational import q_cube_mix

    rows = _load(spark, "orders")
    want = {}
    for use_a in (True, False):
        for use_b in (True, False):
            gid = (0 if use_a else 2) + (0 if use_b else 1)
            cells = defaultdict(lambda: [Decimal(0), 0])
            for r in rows:
                k = (r["o_orderpriority"] if use_a else None,
                     r["o_orderstatus"] if use_b else None)
                cells[k][0] += _d2(r["o_totalprice"])
                cells[k][1] += 1
            for (a, b), (tot, n) in cells.items():
                want[(a, b, gid)] = (float(tot), n)

    got = q_cube_mix(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        tot, n = want[(r["o_orderpriority"], r["o_orderstatus"], r["gid"])]
        assert r["n_orders"] == n
        assert abs(r["total_price"] - tot) < 1e-6


# -- cur_dp_count -------------------------------------------------------------------


def test_dp_count_noise_distribution_and_determinism(spark):
    from document_processor_spark.operators.curation import (
        DP_EPS, DP_TRUNC, SAMPLE_MOD, _DP_THRESHOLDS, q_cur_dp_count,
    )

    # threshold table is a genuine truncated discrete-Laplace CDF
    alpha = math.exp(-DP_EPS)
    norm = (1 - alpha) / (1 + alpha)
    cdf = 0.0
    for (k, t), kk in zip(_DP_THRESHOLDS, range(-DP_TRUNC, DP_TRUNC)):
        assert k == kk
        cdf += norm * alpha ** abs(k)
        assert t == int(cdf * SAMPLE_MOD)

    true = Counter()
    for r in _load(spark, "documents"):
        true[(r["lang"], r["source"])] += 1

    got = q_cur_dp_count(spark, SF_DIR).collect()
    assert len(got) == len(true)
    for r in got:
        n = true[(r["lang"], r["source"])]
        u = _hash_u(f"{r['lang']}|{r['source']}", SAMPLE_MOD)
        noise = DP_TRUNC
        for k, t in _DP_THRESHOLDS:
            if u < t:
                noise = k
                break
        assert r["noisy_n"] == max(0, n + noise)
        assert abs(r["noisy_n"] - n) <= DP_TRUNC


# -- ta_hist_quantiles --------------------------------------------------------------


def test_hist_quantiles_matches_python(spark):
    from document_processor_spark.operators.text_analysis import (
        HIST_BINS, HIST_DIV, q_hist_quantiles,
    )

    by_src = defaultdict(list)
    for r in _load(spark, "documents"):
        by_src[r["source"]].append(min(r["n_chars"] // HIST_DIV,
                                       HIST_BINS - 1))

    got = {r["source"]: r for r in q_hist_quantiles(spark, SF_DIR).collect()}
    assert set(got) == set(by_src)
    for src, bins in by_src.items():
        bins.sort()
        n = len(bins)
        r = got[src]
        assert r["n_docs"] == n
        for q in (50, 90, 99):
            # smallest bin whose cumulative count reaches ceil(q% of n)
            need = -(-q * n // 100)
            assert r[f"p{q}_bin"] == bins[need - 1]


# -- ta_containment -----------------------------------------------------------------


def test_containment_matches_python(spark):
    from document_processor_spark.operators.text_analysis import (
        CONTAIN_STOP, CONTAIN_T_BP, q_containment,
    )

    sets = {}
    for r in _load(spark, "documents"):
        words = r["text"].split(" ")
        if len(words) < 3:
            continue
        sets[r["doc_id"]] = {" ".join(words[i:i + 3])
                             for i in range(len(words) - 2)}
    df = Counter(s for sh in sets.values() for s in sh)
    keep = {s for s, c in df.items() if c <= CONTAIN_STOP}
    sets = {d: sh & keep for d, sh in sets.items()}

    want = {}
    for a, sa in sets.items():
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b:
                continue
            inter = len(sa & sb)
            bp = inter * 10000 // len(sa)
            if bp >= CONTAIN_T_BP:
                want[(a, b)] = (inter, len(sa), bp)

    got = q_containment(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        assert want[(r["d_src"], r["d_dst"])] == (r["inter"], r["n_src"],
                                                  r["contain_bp"])
    assert want  # the fixture must actually contain contained pairs


# -- ann_mips_topk ------------------------------------------------------------------


def test_mips_topk_matches_python_and_transform_is_order_preserving(spark):
    from document_processor_spark.operators.ann import (
        QUERY_MOD, TOP_K, q_ann_mips_topk,
    )

    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in _load(spark, "embeddings")}
    m2 = max(sum(x * x for x in v) for v in vecs.values())

    got = defaultdict(list)
    for r in q_ann_mips_topk(spark, SF_DIR).collect():
        got[r["query_id"]].append(r)

    queries = sorted(v for v in vecs if v % QUERY_MOD == 0)
    assert sorted(got) == queries
    for qid in queries:
        qv = vecs[qid]
        qnrm = math.sqrt(sum(x * x for x in qv))
        scored = sorted(
            ((sum(a * b for a, b in zip(qv, v)), vid)
             for vid, v in vecs.items() if vid != qid),
            key=lambda t: (-t[0], t[1]))
        # the augmented-cosine order must equal the raw dot order: every
        # augmented vector has norm exactly sqrt(m2), so cos_aug is a
        # per-query monotonic rescale of the inner product
        aug = sorted(
            ((sum(a * b for a, b in zip(qv, v)) / (qnrm * math.sqrt(m2)),
              vid) for vid, v in vecs.items() if vid != qid),
            key=lambda t: (-t[0], t[1]))
        assert [v for _, v in aug[:TOP_K]] == [v for _, v in scored[:TOP_K]]

        rows = sorted(got[qid], key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rows] == [v for _, v in scored[:TOP_K]]
        for r, (dot, _) in zip(rows, scored):
            assert abs(r["ip"] - dot) < 1e-5
