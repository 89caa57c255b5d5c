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
