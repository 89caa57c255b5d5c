"""Invariants for the session-4 operators that the hash gate can't see:
URL canonicalization against an independent pure-Python recompute, BPE
encoding against the reference greedy encoder, JSON field extraction
against a python-json fold.
"""

from __future__ import annotations

import json
import math
import re
from collections import Counter, defaultdict

SF_DIR = "/root/testdata/sf0.001"


# -- URL canonicalization + keep-first dedup ----------------------------------------

def _py_synth_url(doc_id: int, source: str) -> str:
    scheme = "https://" if doc_id % 2 == 0 else "HTTP://"
    www = "WWW." if doc_id % 3 == 0 else ""
    hostb = source.upper() if doc_id % 4 == 0 else source
    path = f"/articles/item-{doc_id % 17}"
    slash = "/" if doc_id % 5 == 0 else ""
    if doc_id % 2 == 0:
        q = f"?utm_source=feed&utm_campaign=c{doc_id % 4}"
    elif doc_id % 7 == 0:
        q = f"?ref=rss&page={doc_id % 3}"
    elif doc_id % 11 == 0:
        q = f"?page={doc_id % 3}&utm_medium=email"
    else:
        q = ""
    return f"{scheme}{www}{hostb}.example.com{path}{slash}{q}"


def _py_canon_url(url: str) -> str:
    no_scheme = re.sub(r"^[A-Za-z]+://", "", url)
    hostraw = no_scheme.split("/")[0]
    host = re.sub(r"^www\.", "", hostraw.lower())
    tail = no_scheme[len(hostraw):]
    t2 = re.sub(r"&(utm_[a-z]+|ref|fbclid|gclid)=[^&]*", "",
                tail.replace("?", "&"))
    path = re.sub(r"/+$", "", t2.split("&")[0])
    params = re.sub(r"^[^&]*&?", "", t2)
    return host + path + (("?" + params) if params else "")


def test_url_dedup_matches_python_recompute(spark):
    from document_processor_spark.operators.curation import q_cur_url_dedup

    docs = {r["doc_id"]: r["source"]
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "source").collect()}
    canon = {d: _py_canon_url(_py_synth_url(d, s)) for d, s in docs.items()}
    groups = defaultdict(list)
    for d, c in canon.items():
        groups[c].append(d)

    rows = q_cur_url_dedup(spark, SF_DIR).collect()
    assert len(rows) == len(docs)
    for r in rows:
        assert r["url"] == _py_synth_url(r["doc_id"], docs[r["doc_id"]])
        assert r["canon_url"] == canon[r["doc_id"]], r["url"]
        grp = groups[r["canon_url"]]
        assert r["group_size"] == len(grp)
        assert r["is_keeper"] == (r["doc_id"] == min(grp))


def test_url_canon_mutation_classes_collapse():
    """Every mutation class the operator claims to normalize — scheme
    case, www, host case, tracking params (any position), trailing
    slash — collapses to the bare canonical form; real params survive."""
    base = "https://sub.example.com/a/b"
    assert _py_canon_url("HTTP://sub.example.com/a/b") == "sub.example.com/a/b"
    assert _py_canon_url("https://WWW.SUB.example.com/a/b") == "sub.example.com/a/b"
    assert _py_canon_url(base + "/") == "sub.example.com/a/b"
    assert _py_canon_url(base + "?utm_source=x&utm_term=y") == "sub.example.com/a/b"
    assert _py_canon_url(base + "?page=2&utm_source=x") == "sub.example.com/a/b?page=2"
    assert _py_canon_url(base + "?utm_source=x&page=2") == "sub.example.com/a/b?page=2"
    assert _py_canon_url(base + "?a=1&b=2") == "sub.example.com/a/b?a=1&b=2"
    # 'ref' strips only as an exact param name, not as a prefix
    assert _py_canon_url(base + "?referrer=x") == "sub.example.com/a/b?referrer=x"


# -- BPE encode (tokenizer apply) ---------------------------------------------------

def _py_encode(word: str, merges) -> list[str]:
    seq = list(word)
    for _, w1, w2, _, _ in merges:
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == w1 and seq[i + 1] == w2:
                out.append(w1 + w2)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def test_bpe_encode_matches_python(spark):
    from document_processor_spark.operators.text_analysis import (
        BPE_ROUNDS,
        q_bpe_encode,
    )
    from tests.test_bpe_pmi import _python_bpe

    docs = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").collect() if r["text"] is not None}
    counts = Counter(w for t in docs.values() for w in t.split(" ") if w)
    merges = _python_bpe(dict(counts), BPE_ROUNDS)

    rows = {r["doc_id"]: r for r in q_bpe_encode(spark, SF_DIR).collect()}
    expect = {d: [w for w in t.split(" ") if w] for d, t in docs.items()}
    expect = {d: ws for d, ws in expect.items() if ws}
    assert set(rows) == set(expect)
    for d, ws in expect.items():
        r = rows[d]
        assert r["n_words"] == len(ws)
        assert r["n_syms"] == sum(len(w) for w in ws)
        assert r["n_tokens"] == sum(len(_py_encode(w, merges)) for w in ws)
        # merging can only ever shrink the sequence, never below one
        # token per word
        assert r["n_words"] <= r["n_tokens"] <= r["n_syms"]


# -- range join (point-in-interval) -------------------------------------------------

def test_range_join_matches_python_recompute(spark):
    """The bucketed equi-join + residual filter must equal the naive
    O(E x W) all-pairs recompute — including events that land in TWO
    overlapping windows and windows spanning a bucket boundary."""
    from document_processor_spark.operators.relational import (
        RANGE_LEN_US,
        RANGE_N_WINDOWS,
        RANGE_STRIDE_US,
        q_range_join,
    )

    evs = (spark.read.parquet(f"{SF_DIR}/events.parquet")
           .select("ts", "value").collect())
    t0 = min(r["ts"] for r in evs)
    expect: dict[int, list[float]] = defaultdict(list)
    for r in evs:
        tus = int((r["ts"] - t0).total_seconds() * 1_000_000)
        for w in range(RANGE_N_WINDOWS):
            ws = w * RANGE_STRIDE_US
            if ws <= tus < ws + RANGE_LEN_US:
                expect[w].append(r["value"])

    rows = {r["win_id"]: r for r in q_range_join(spark, SF_DIR).collect()}
    assert set(rows) == set(expect)
    # overlap sanity: with stride < len, some event must hit two windows
    assert sum(len(v) for v in expect.values()) > sum(
        1 for r in evs
        if 0 <= (r["ts"] - t0).total_seconds() * 1e6
        < RANGE_STRIDE_US * RANGE_N_WINDOWS)
    for w, vals in expect.items():
        r = rows[w]
        assert r["n_events"] == len(vals)
        assert abs(r["sum_value"] - sum(vals)) <= 1e-3


# -- gap fill + LOCF ----------------------------------------------------------------

def test_gapfill_locf_matches_python_recompute(spark):
    from document_processor_spark.operators.relational import q_gapfill_locf

    evs = (spark.read.parquet(f"{SF_DIR}/events.parquet")
           .select("ts", "event_type", "value").collect())
    t0 = min(r["ts"] for r in evs)
    agg: dict[tuple, list[float]] = defaultdict(list)
    for r in evs:
        hb = int((r["ts"] - t0).total_seconds() * 1_000_000
                 // 3_600_000_000)
        agg[(r["event_type"], hb)].append(r["value"])
    types = {r["event_type"] for r in evs}
    max_hb = max(hb for _, hb in agg)

    rows = {(r["event_type"], r["hour_bucket"]): r
            for r in q_gapfill_locf(spark, SF_DIR).collect()}
    # dense spine: every (type, hour) cell up to the global max exists
    assert set(rows) == {(et, hb) for et in types
                         for hb in range(max_hb + 1)}
    for et in types:
        carried = 0.0
        for hb in range(max_hb + 1):
            r = rows[(et, hb)]
            vals = agg.get((et, hb))
            if vals is None:
                assert r["is_gap"] and r["n"] == 0
            else:
                assert not r["is_gap"] and r["n"] == len(vals)
                carried = r["sum_locf"]
                assert abs(carried - sum(vals)) <= 1e-3
            # LOCF: a gap hour repeats the last observed value exactly
            assert r["sum_locf"] == carried


# -- TPC-H Q5 star join -------------------------------------------------------------

def test_local_supplier_volume_matches_python(spark):
    from datetime import datetime
    from decimal import Decimal

    from document_processor_spark.operators.relational import (
        q_local_supplier_volume,
    )

    def load(name):
        return spark.read.parquet(f"{SF_DIR}/{name}.parquet").collect()

    region = {r["r_regionkey"] for r in load("region") if r["r_name"] == "ASIA"}
    nation = {r["n_nationkey"]: r["n_name"] for r in load("nation")
              if r["n_regionkey"] in region}
    cust = {r["c_custkey"]: r["c_nationkey"] for r in load("customer")}
    supp = {r["s_suppkey"]: r["s_nationkey"] for r in load("supplier")}
    lo, hi = datetime(1996, 1, 1), datetime(1997, 1, 1)
    orders = {r["o_orderkey"]: r["o_custkey"] for r in load("orders")
              if lo <= r["o_orderdate"] < hi}
    q2 = Decimal("0.01")
    agg: dict[str, list] = defaultdict(lambda: [Decimal(0), 0])
    for r in load("lineitem"):
        ck = orders.get(r["l_orderkey"])
        sn = supp.get(r["l_suppkey"])
        if ck is None or sn is None or cust[ck] != sn or sn not in nation:
            continue
        rev = (Decimal(str(r["l_extendedprice"])).quantize(q2)
               * (1 - Decimal(str(r["l_discount"])).quantize(q2)))
        cell = agg[nation[sn]]
        cell[0] += rev
        cell[1] += 1

    rows = {r["n_name"]: r
            for r in q_local_supplier_volume(spark, SF_DIR).collect()}
    assert set(rows) == {k for k, v in agg.items() if v[1] > 0}
    for name, (rev, cnt) in agg.items():
        if cnt == 0:
            continue
        assert rows[name]["n_lineitems"] == cnt
        assert rows[name]["revenue"] == float(rev)


# -- sentence segmentation stats ----------------------------------------------------

def test_sentence_stats_matches_python(spark):
    from document_processor_spark.operators.text_analysis import (
        q_sentence_stats,
    )

    docs = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").collect() if r["text"] is not None}
    expect = {}
    for d, t in docs.items():
        sents = [s.strip(" ") for s in re.split(r"[.!?]+", t)]
        sents = [s for s in sents if s]
        if sents:
            expect[d] = sents

    rows = {r["doc_id"]: r for r in q_sentence_stats(spark, SF_DIR).collect()}
    assert set(rows) == set(expect)
    for d, sents in expect.items():
        r = rows[d]
        total = sum(len(s) for s in sents)
        assert r["n_sentences"] == len(sents)
        assert r["total_len"] == total
        assert r["max_len"] == max(len(s) for s in sents)
        assert r["mean_len_q"] == math.floor(total * 10000.0 / len(sents))


# -- mergeable moments + correlation ------------------------------------------------

def test_moments_corr_matches_python_recompute(spark):
    from decimal import Decimal

    from document_processor_spark.operators.relational import q_moments_corr

    li = (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
          .select("l_returnflag", "l_quantity", "l_extendedprice").collect())
    groups: dict[str, list[tuple]] = defaultdict(list)
    q2 = Decimal("0.01")
    for r in li:
        groups[r["l_returnflag"]].append(
            (Decimal(str(r["l_quantity"])).quantize(q2),
             Decimal(str(r["l_extendedprice"])).quantize(q2)))

    rows = {r["l_returnflag"]: r for r in q_moments_corr(spark, SF_DIR).collect()}
    assert set(rows) == set(groups)
    for flag, xy in groups.items():
        r = rows[flag]
        n = len(xy)
        sx, sy = sum(x for x, _ in xy), sum(y for _, y in xy)
        sxx = sum(x * x for x, _ in xy)
        syy = sum(y * y for _, y in xy)
        sxy = sum(x * y for x, y in xy)
        assert r["n_rows"] == n
        # the six moments are exact decimal sums (cast to double)
        assert r["sum_x"] == float(sx) and r["sum_y"] == float(sy)
        assert r["sum_xx"] == float(sxx) and r["sum_yy"] == float(syy)
        assert r["sum_xy"] == float(sxy)
        num = n * float(sxy) - float(sx) * float(sy)
        den = (math.sqrt(n * float(sxx) - float(sx) ** 2)
               * math.sqrt(n * float(syy) - float(sy) ** 2))
        corr = num / den
        assert -1.0 <= corr <= 1.0
        assert abs(r["corr_q"] - math.floor(corr * 1e6)) <= 1


# -- triangle counting --------------------------------------------------------------

def test_triangle_counts_on_crafted_graph(spark):
    """Known graph: K4 on {0,1,2,3} (4 triangles, 3 per node), a pendant
    5-0, an isolated doc 9, and a triangle-free star 6-{7,8}.  Pinned
    against hand counts — including the degree-tie direction path (K4 is
    all ties) and the skew rationale (the star center has degree 2 but
    zero triangles)."""
    from document_processor_spark.operators.dedup import triangle_counts

    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (5, 0), (6, 7), (6, 8)]
    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    rows = {r["doc_id"]: (r["degree"], r["n_triangles"])
            for r in triangle_counts(docs, pairs).collect()}
    assert rows == {0: (4, 3), 1: (3, 3), 2: (3, 3), 3: (3, 3),
                    5: (1, 0), 6: (2, 0), 7: (1, 0), 8: (1, 0),
                    9: (0, 0), 4: (0, 0)}


def test_triangles_match_python_on_fixture_graph(spark):
    from document_processor_spark.operators.dedup import (
        q_dedup_minhash_lsh,
        q_dedup_triangles,
    )

    prs = q_dedup_minhash_lsh(spark, SF_DIR).select("d1", "d2").collect()
    adj: dict[int, set[int]] = defaultdict(set)
    for r in prs:
        adj[r["d1"]].add(r["d2"])
        adj[r["d2"]].add(r["d1"])
    expect = {n: sum(1 for v in ns for w in ns
                     if v < w and w in adj[v]) // 1
              for n, ns in adj.items()}

    rows = {r["doc_id"]: r for r in q_dedup_triangles(spark, SF_DIR).collect()}
    for n, ns in adj.items():
        assert rows[n]["degree"] == len(ns)
        assert rows[n]["n_triangles"] == expect[n], n
    assert all(r["n_triangles"] == 0 and r["degree"] == 0
               for d, r in rows.items() if d not in adj)


# -- JSON props extraction ----------------------------------------------------------

def test_json_props_matches_python(spark):
    from document_processor_spark.operators.relational import q_json_props

    evs = (spark.read.parquet(f"{SF_DIR}/events.parquet")
           .select("event_type", "props").collect())
    agg: dict[str, list[int]] = defaultdict(list)
    for r in evs:
        k = json.loads(r["props"]).get("k")
        if k is not None:
            agg[r["event_type"]].append(int(k))

    rows = {r["event_type"]: r for r in q_json_props(spark, SF_DIR).collect()}
    assert set(rows) == set(agg)
    for et, ks in agg.items():
        r = rows[et]
        assert r["n_events"] == len(ks)
        assert r["sum_k"] == sum(ks)
        assert r["min_k"] == min(ks)
        assert r["max_k"] == max(ks)
        assert r["avg_k_q"] == math.floor(sum(ks) * 10000.0 / len(ks))


# -- positional phrase search -------------------------------------------------------

def test_phrase_search_matches_python(spark):
    from document_processor_spark.operators.text_analysis import (
        PHRASE_QUERY_MOD,
        PHRASE_TOP_K,
        q_phrase_search,
    )

    docs = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").collect()
            if r["text"] is not None and len(r["text"]) > 0}
    # postings with RAW split positions, empty tokens dropped after
    post = {d: [(i, w) for i, w in enumerate(t.split(" ")) if w]
            for d, t in docs.items()}
    queries = {}
    for d, toks in post.items():
        if d % PHRASE_QUERY_MOD != 0:
            continue
        by_pos = dict(toks)
        if 0 in by_pos and 1 in by_pos:
            queries[d] = (by_pos[0], by_pos[1])
    assert queries, "fixture must contain at least one query doc"

    expect = {}
    for qid, (w1, w2) in queries.items():
        counts = Counter()
        for d, toks in post.items():
            if d == qid:
                continue
            by_pos = dict(toks)
            n = sum(1 for p, w in toks
                    if w == w1 and by_pos.get(p + 1) == w2)
            if n:
                counts[d] = n
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expect[qid] = [(rank + 1, d, n)
                       for rank, (d, n) in enumerate(top[:PHRASE_TOP_K])]

    got = defaultdict(list)
    for r in q_phrase_search(spark, SF_DIR).collect():
        got[r["query_id"]].append((r["rank"], r["doc_id"], r["n_hits"]))
    for qid in got:
        got[qid].sort()
    assert dict(got) == {q: v for q, v in expect.items() if v}


# -- skewed equi-join with salting --------------------------------------------------

def test_skew_salted_join_matches_python(spark):
    from decimal import Decimal

    from document_processor_spark.operators.relational import (
        q_skew_salted_join,
    )

    evs = (spark.read.parquet(f"{SF_DIR}/events.parquet")
           .select("event_type", "value").collect())
    q2 = Decimal("0.01")
    agg = defaultdict(lambda: [0, Decimal(0)])
    for r in evs:
        tier = len(r["event_type"])
        cell = agg[r["event_type"]]
        cell[0] += 1
        cell[1] += Decimal(str(r["value"])).quantize(q2) * tier

    rows = {r["event_type"]: r
            for r in q_skew_salted_join(spark, SF_DIR).collect()}
    assert set(rows) == set(agg)
    for et, (cnt, wsum) in agg.items():
        r = rows[et]
        assert r["tier"] == len(et)
        assert r["n_events"] == cnt
        assert r["weighted_q"] == int(wsum * 100)


# -- per-source score normalization -------------------------------------------------

def test_score_normalize_matches_python(spark):
    from document_processor_spark.operators.curation import (
        q_cur_score_normalize,
    )

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "source", "n_chars").collect())
    by_src = defaultdict(list)
    for r in docs:
        by_src[r["source"]].append((r["doc_id"], r["n_chars"]))
    expect = {}
    for src, items in by_src.items():
        scores = sorted(s for _, s in items)
        n = len(scores)
        # percent_rank: min-rank of the tie group, (rank-1)/(n-1), in ppm
        first_rank = {}
        for i, s in enumerate(scores):
            first_rank.setdefault(s, i + 1)
        for d, s in items:
            pr_q = ((first_rank[s] - 1) * 1000000) // (n - 1) if n > 1 else 0
            expect[d] = (src, s, pr_q)

    rows = {r["doc_id"]: r for r in q_cur_score_normalize(spark, SF_DIR).collect()}
    assert set(rows) == set(expect)
    for d, (src, s, pr_q) in expect.items():
        r = rows[d]
        assert (r["source"], r["score"], r["pr_q"]) == (src, s, pr_q)
    # a UNIQUE top score sits at exactly 1.0 (ppm 10^6); a tied top takes
    # the min rank of its tie group (percent_rank semantics) and lands
    # strictly below it
    for src, items in by_src.items():
        if len(items) > 1:
            top_score = max(s for _, s in items)
            ties = sum(1 for _, s in items if s == top_score)
            for d, s in items:
                if s == top_score:
                    if ties == 1:
                        assert rows[d]["pr_q"] == 1000000
                    else:
                        assert rows[d]["pr_q"] < 1000000


# -- TPC-H Q18 agg-HAVING semi-join --------------------------------------------------

def test_large_orders_matches_python(spark):
    from decimal import Decimal

    from document_processor_spark.operators.relational import (
        LARGE_ORDER_QTY,
        q_large_orders,
    )

    def load(name):
        return spark.read.parquet(f"{SF_DIR}/{name}.parquet").collect()

    q2 = Decimal("0.01")
    qty = defaultdict(Decimal)
    for r in load("lineitem"):
        qty[r["l_orderkey"]] += Decimal(str(r["l_quantity"])).quantize(q2)
    big = {k: v for k, v in qty.items() if v > LARGE_ORDER_QTY}
    assert big, "fixture must contain at least one large order"
    cust = {r["c_custkey"]: r["c_name"] for r in load("customer")}
    orders = {r["o_orderkey"]: r for r in load("orders")}

    rows = {r["o_orderkey"]: r for r in q_large_orders(spark, SF_DIR).collect()}
    assert set(rows) == set(big)
    for ok, sq in big.items():
        r, o = rows[ok], orders[ok]
        assert r["sum_qty"] == float(sq)
        assert r["c_custkey"] == o["o_custkey"]
        assert r["c_name"] == cust[o["o_custkey"]]
        assert r["o_totalprice"] == o["o_totalprice"]
        assert r["o_orderdate_s"] == o["o_orderdate"].strftime(
            "%Y-%m-%d %H:%M:%S.%f")
