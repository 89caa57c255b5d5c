"""Invariants for the session-6 relational operators against independent
pure-Python recomputes: the remaining TPC-H shapes — Q6 pure scan-agg,
Q17 correlated-average de-correlation, Q19 disjunctive predicate join,
Q15 max-over-view, Q11 group-share-vs-global-scalar.

Decimal discipline mirrors the engines: doubles are taken at their exact
binary value (Decimal(x)) and quantized HALF_UP to scale 2 — the same
rounding Spark's double→DECIMAL(18,2) cast and DuckDB's CAST apply.
"""

from __future__ import annotations

import datetime
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

SF_DIR = "/root/testdata/sf0.001"

_C = Decimal("0.01")


def _d2(x: float) -> Decimal:
    return Decimal(x).quantize(_C, rounding=ROUND_HALF_UP)


def _load(spark, name):
    return spark.read.parquet(f"{SF_DIR}/{name}.parquet").collect()


def _rev(r) -> Decimal:
    return _d2(r["l_extendedprice"]) * (Decimal(1) - _d2(r["l_discount"]))


# -- TPC-H Q6-shape pure scan aggregate ---------------------------------------------


def test_forecast_revenue_matches_python(spark):
    from document_processor_spark.operators.relational import (
        q_forecast_revenue,
    )

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)
    units = Decimal(0)
    n = 0
    rows = _load(spark, "lineitem")
    for r in rows:
        if not (lo <= r["l_shipdate"] < hi):
            continue
        if not (0.05 <= r["l_discount"] <= 0.07):
            continue
        if not r["l_quantity"] < 24:
            continue
        units += _d2(r["l_extendedprice"]) * _d2(r["l_discount"])
        n += 1

    got = q_forecast_revenue(spark, SF_DIR).collect()
    assert len(got) == 1
    assert got[0]["revenue_units"] == int(units * 10000)
    assert got[0]["n_lines"] == n
    # every predicate must bite: the kept set is non-empty and a strict subset
    assert 0 < n < len(rows)


# -- TPC-H Q17-shape correlated-average de-correlation -------------------------------


def test_small_qty_revenue_matches_python(spark):
    from document_processor_spark.operators.relational import (
        q_small_qty_revenue,
    )

    small = {r["p_partkey"] for r in _load(spark, "part")
             if r["p_type"] == "SMALL"}
    assert small, "fixture must contain SMALL parts"
    li = _load(spark, "lineitem")
    sum_qty: dict[int, int] = defaultdict(int)
    n_li: dict[int, int] = defaultdict(int)
    for r in li:
        if r["l_partkey"] in small:
            sum_qty[r["l_partkey"]] += int(r["l_quantity"])
            n_li[r["l_partkey"]] += 1
    units = Decimal(0)
    n_small = 0
    n_cand = 0
    for r in li:
        pk = r["l_partkey"]
        if pk not in small:
            continue
        n_cand += 1
        if int(r["l_quantity"]) * 5 * n_li[pk] < sum_qty[pk]:
            units += _d2(r["l_extendedprice"])
            n_small += 1

    got = q_small_qty_revenue(spark, SF_DIR).collect()
    assert len(got) == 1
    assert got[0]["small_units"] == int(units * 100)
    assert got[0]["n_small"] == n_small
    # the quantity threshold must bite: strictly fewer than the brand rows
    assert 0 < n_small < n_cand


# -- TPC-H Q19-shape disjunctive predicate join --------------------------------------


def test_disjunctive_revenue_matches_python(spark):
    from document_processor_spark.operators.relational import (
        q_disjunctive_revenue,
    )

    parts = {r["p_partkey"]: r for r in _load(spark, "part")}
    units = Decimal(0)
    n = 0
    branch_hits = [0, 0, 0]
    for r in _load(spark, "lineitem"):
        if r["l_returnflag"] == "R":
            continue
        p = parts[r["l_partkey"]]
        q = r["l_quantity"]
        b = [p["p_brand"] == "Brand#1" and 1 <= p["p_size"] <= 15
             and 1 <= q <= 11,
             p["p_brand"] == "Brand#2" and 1 <= p["p_size"] <= 25
             and 10 <= q <= 20,
             p["p_brand"] == "Brand#3" and 1 <= p["p_size"] <= 35
             and 20 <= q <= 30]
        if any(b):
            units += _rev(r)
            n += 1
            for i, hit in enumerate(b):
                branch_hits[i] += int(hit)

    got = q_disjunctive_revenue(spark, SF_DIR).collect()
    assert len(got) == 1
    assert got[0]["revenue_units"] == int(units * 10000)
    assert got[0]["n_lines"] == n
    # the disjunction is real: at least two branches contribute rows
    assert sum(1 for h in branch_hits if h) >= 2


# -- TPC-H Q15-shape max-over-aggregated-view ----------------------------------------


def test_top_supplier_matches_python(spark):
    from document_processor_spark.operators.relational import q_top_supplier

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 7, 1)
    rev: dict[int, Decimal] = defaultdict(Decimal)
    for r in _load(spark, "lineitem"):
        if lo <= r["l_shipdate"] < hi:
            rev[r["l_suppkey"]] += _rev(r)
    units = {k: int(v * 10000) for k, v in rev.items()}
    mx = max(units.values())
    names = {r["s_suppkey"]: r["s_name"] for r in _load(spark, "supplier")}
    want = {(k, names[k], mx) for k, v in units.items() if v == mx}

    got = {(r["s_suppkey"], r["s_name"], r["total_units"])
           for r in q_top_supplier(spark, SF_DIR).collect()}
    assert got == want
    # the date window must bite: not every supplier ties at the max
    assert len(got) < len(units)


# -- TPC-H Q11-shape group share vs global scalar ------------------------------------


def test_supplier_concentration_matches_python(spark):
    from document_processor_spark.operators.relational import (
        q_supplier_concentration,
    )

    rev: dict[int, Decimal] = defaultdict(Decimal)
    for r in _load(spark, "lineitem"):
        rev[r["l_suppkey"]] += _rev(r)
    units = {k: int(v * 10000) for k, v in rev.items()}
    total = sum(units.values())
    n_supp = len(units)
    want = {(k, v) for k, v in units.items() if v * n_supp > total}

    got = {(r["s_suppkey"], r["rev_units"])
           for r in q_supplier_concentration(spark, SF_DIR).collect()}
    assert got == want
    # the threshold must bite both ways: some pass, some fail
    assert 0 < len(want) < n_supp


# -- shared dim folds for the Q2/Q7/Q8/Q9/Q20 recomputes -----------------------------


def _region_of(spark):
    nat = {r["n_nationkey"]: r["n_regionkey"] for r in _load(spark, "nation")}
    reg = {r["r_regionkey"]: r["r_name"] for r in _load(spark, "region")}
    return {k: reg[v] for k, v in nat.items()}


def _nation_of(spark):
    return {r["n_nationkey"]: r["n_name"] for r in _load(spark, "nation")}


# -- TPC-H Q2-shape correlated scalar-MIN de-correlation ------------------------------


def test_min_price_supplier_matches_python(spark):
    from document_processor_spark.operators.relational import (
        q_min_price_supplier,
    )

    region = _region_of(spark)
    nation = _nation_of(spark)
    eur = {r["s_suppkey"]: (r["s_name"], nation[r["s_nationkey"]])
           for r in _load(spark, "supplier")
           if region[r["s_nationkey"]] == "EUROPE"}
    small = {r["p_partkey"] for r in _load(spark, "part")
             if r["p_size"] <= 10}
    rows = [(r["l_partkey"], r["l_suppkey"],
             int(_d2(r["l_extendedprice"]) * 100))
            for r in _load(spark, "lineitem")
            if r["l_partkey"] in small and r["l_suppkey"] in eur]
    mn: dict[int, int] = {}
    for pk, _, cents in rows:
        mn[pk] = min(mn.get(pk, cents), cents)
    want = {(pk, sk, eur[sk][0], eur[sk][1], cents)
            for pk, sk, cents in rows if cents == mn[pk]}

    got = {(r["p_partkey"], r["s_suppkey"], r["s_name"], r["n_name"],
            r["min_units"])
           for r in q_min_price_supplier(spark, SF_DIR).collect()}
    assert got == want
    # both filters bite: some suppliers are not in EUROPE, some parts too big
    assert eur and len(eur) < len(_load(spark, "supplier"))
    assert want


# -- TPC-H Q7-shape region-pair trade volume ------------------------------------------


def test_region_trade_matches_python(spark):
    from document_processor_spark.operators.relational import q_region_trade

    region = _region_of(spark)
    sreg = {r["s_suppkey"]: region[r["s_nationkey"]]
            for r in _load(spark, "supplier")}
    creg = {r["c_custkey"]: region[r["c_nationkey"]]
            for r in _load(spark, "customer")}
    cust_of = {r["o_orderkey"]: r["o_custkey"] for r in _load(spark, "orders")}
    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1998, 1, 1)
    agg: dict[tuple, list] = defaultdict(lambda: [Decimal(0), 0])
    for r in _load(spark, "lineitem"):
        if not (lo <= r["l_shipdate"] < hi):
            continue
        sr = sreg[r["l_suppkey"]]
        cr = creg[cust_of[r["l_orderkey"]]]
        if {sr, cr} != {"AMERICA", "ASIA"}:
            continue
        cell = agg[(sr, cr, str(r["l_shipdate"].year))]
        cell[0] += _rev(r)
        cell[1] += 1

    want = {(sr, cr, y, int(v[0] * 10000), v[1])
            for (sr, cr, y), v in agg.items()}
    got = {(r["supp_region"], r["cust_region"], r["ship_year"],
            r["revenue_units"], r["n_lines"])
           for r in q_region_trade(spark, SF_DIR).collect()}
    assert got == want
    # both directions of the pair disjunction must appear
    assert len({(sr, cr) for sr, cr, *_ in want}) == 2


# -- TPC-H Q8-shape conditional market share ------------------------------------------


def test_market_share_matches_python(spark):
    from document_processor_spark.operators.relational import q_market_share

    region = _region_of(spark)
    sreg = {r["s_suppkey"]: region[r["s_nationkey"]]
            for r in _load(spark, "supplier")}
    amer = {r["c_custkey"] for r in _load(spark, "customer")
            if region[r["c_nationkey"]] == "AMERICA"}
    std = {r["p_partkey"] for r in _load(spark, "part")
           if r["p_type"] == "STANDARD"}
    cust_of = {r["o_orderkey"]: r["o_custkey"] for r in _load(spark, "orders")}
    num: dict[str, Decimal] = defaultdict(Decimal)
    den: dict[str, Decimal] = defaultdict(Decimal)
    for r in _load(spark, "lineitem"):
        if r["l_partkey"] not in std:
            continue
        if cust_of[r["l_orderkey"]] not in amer:
            continue
        y = str(r["l_shipdate"].year)
        rev = _rev(r)
        den[y] += rev
        if sreg[r["l_suppkey"]] == "ASIA":
            num[y] += rev

    want = set()
    for y, d in den.items():
        a = int(num[y] * 10000)
        al = int(d * 10000)
        want.add((y, a, al, a * 1000000 // al))
    got = {(r["ship_year"], r["asia_units"], r["all_units"], r["asia_ppm"])
           for r in q_market_share(spark, SF_DIR).collect()}
    assert got == want
    # the share is a real fraction somewhere: 0 < asia < all for some year
    assert any(0 < a < al for _, a, al, _ in want)


# -- TPC-H Q9-shape expression-profit rollup ------------------------------------------


def test_product_profit_matches_python(spark):
    from document_processor_spark.operators.relational import (
        q_product_profit,
    )

    nation = _nation_of(spark)
    snat = {r["s_suppkey"]: nation[r["s_nationkey"]]
            for r in _load(spark, "supplier")}
    bolts = {r["p_partkey"]: int(_d2(r["p_retailprice"]) * 10000)
             for r in _load(spark, "part") if "bolt" in r["p_name"]}
    assert bolts, "fixture must contain bolt parts"
    agg: dict[tuple, list] = defaultdict(lambda: [0, 0])
    for r in _load(spark, "lineitem"):
        if r["l_partkey"] not in bolts:
            continue
        profit = (int(_rev(r) * 10000)
                  - int(r["l_quantity"]) * bolts[r["l_partkey"]])
        cell = agg[(snat[r["l_suppkey"]], str(r["l_shipdate"].year))]
        cell[0] += profit
        cell[1] += 1

    want = {(n, y, v[0], v[1]) for (n, y), v in agg.items()}
    got = {(r["n_name"], r["ship_year"], r["profit_units"], r["n_lines"])
           for r in q_product_profit(spark, SF_DIR).collect()}
    assert got == want


# -- TPC-H Q16-shape distinct-count distribution with NOT-IN --------------------------


def test_part_supplier_counts_matches_python(spark):
    from document_processor_spark.operators.relational import (
        q_part_supplier_counts,
    )

    bad = {r["s_suppkey"] for r in _load(spark, "supplier")
           if r["s_acctbal"] < 2000}
    assert bad, "the exclusion must bite at sf0.001"
    parts = {r["p_partkey"]: (r["p_brand"], r["p_type"], r["p_size"])
             for r in _load(spark, "part") if r["p_type"] != "PROMO"}
    seen: dict[tuple, set] = defaultdict(set)
    for r in _load(spark, "lineitem"):
        if r["l_suppkey"] in bad or r["l_partkey"] not in parts:
            continue
        seen[parts[r["l_partkey"]]].add(r["l_suppkey"])

    want = {(b, t, s, len(v)) for (b, t, s), v in seen.items()}
    got = {(r["p_brand"], r["p_type"], r["p_size"], r["supplier_cnt"])
           for r in q_part_supplier_counts(spark, SF_DIR).collect()}
    assert got == want


# -- TPC-H Q20-shape two-level dominance + semi-join chain ----------------------------


def test_dominant_suppliers_matches_python(spark):
    from document_processor_spark.operators.relational import (
        q_dominant_suppliers,
    )

    nation = _nation_of(spark)
    promo = {r["p_partkey"] for r in _load(spark, "part")
             if r["p_type"] == "PROMO"}
    lo = datetime.datetime(1997, 1, 1)
    hi = datetime.datetime(1998, 1, 1)
    qty_ps: dict[tuple, int] = defaultdict(int)
    for r in _load(spark, "lineitem"):
        if r["l_partkey"] in promo and lo <= r["l_shipdate"] < hi:
            qty_ps[(r["l_partkey"], r["l_suppkey"])] += int(r["l_quantity"])
    qty_p: dict[int, int] = defaultdict(int)
    for (pk, _), q in qty_ps.items():
        qty_p[pk] += q
    dom = {sk for (pk, sk), q in qty_ps.items() if 2 * q > qty_p[pk]}
    supp = {r["s_suppkey"]: (r["s_name"], nation[r["s_nationkey"]])
            for r in _load(spark, "supplier")}
    want = {(sk, supp[sk][0], supp[sk][1]) for sk in dom}

    got = {(r["s_suppkey"], r["s_name"], r["n_name"])
           for r in q_dominant_suppliers(spark, SF_DIR).collect()}
    assert got == want
    # dominance must bite: some supplier is NOT dominant anywhere
    assert 0 < len(dom) < len(supp)


# -- hashed linear classifier scoring --------------------------------------------------


def test_hash_classifier_matches_python(spark):
    import hashlib

    from document_processor_spark.operators.text_analysis import (
        CLS_MOD,
        CLS_OFF,
        q_hash_classifier,
    )

    def wt(w: str) -> int:
        h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
        return h % CLS_MOD - CLS_OFF

    want = {}
    for r in _load(spark, "documents"):
        ws = [w for w in r["text"].lower().split(" ") if w]
        s = sum(wt(w) for w in ws)
        want[r["doc_id"]] = (len(ws), s, s > 0)

    rows = q_hash_classifier(spark, SF_DIR).collect()
    assert len(rows) == len(want)
    for r in rows:
        assert (r["n_tokens"], r["score_milli"],
                r["keep_doc"]) == want[r["doc_id"]]
    # the gate must bite both ways
    kept = sum(1 for _, _, k in want.values() if k)
    assert 0 < kept < len(want)


# -- ANN recall@k evaluation ------------------------------------------------------------


def test_ann_recall_eval_matches_composition(spark):
    """The recall operator's per-query numbers must equal the set
    algebra over its two (independently oracle-gated) input queries, and
    the eval must be informative: not every query at 100%."""
    from document_processor_spark.operators import ann

    truth: dict = {}
    for r in ann.q_ann_bruteforce_topk(spark, SF_DIR).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    got_ivf: dict = {}
    for r in ann.q_ann_ivf_topk(spark, SF_DIR).collect():
        got_ivf.setdefault(r["query_id"], set()).add(r["vec_id"])

    rows = {r["query_id"]: r
            for r in ann.q_ann_recall_eval(spark, SF_DIR).collect()}
    assert set(rows) == set(truth)
    for q, t in truth.items():
        hits = len(t & got_ivf.get(q, set()))
        r = rows[q]
        assert r["n_true"] == len(t) == ann.TOP_K
        assert r["n_hits"] == hits
        assert r["recall_pct"] == hits * 100 // len(t)
    assert any(r["recall_pct"] < 100 for r in rows.values())
    assert any(r["recall_pct"] > 0 for r in rows.values())
