"""Invariants for the round-4 session-2 operators that the hash gate
can't see: HLL estimate accuracy with the linear-counting correction,
Bloom-filter superset-ness and false-positive bounds, CDC last-wins
recompute against a pure-Python fold.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_hll_estimate_accuracy(spark):
    """The sketch with the standard small-range (linear counting)
    correction must land within the published HLL error envelope
    (~1.04/sqrt(m) ~= 13% for m=64, with margin for one fixture draw)
    of the exact per-source distinct count it replaces."""
    from document_processor_spark.operators.text_analysis import (
        HLL_M,
        q_hll_distinct,
    )
    rows = q_hll_distinct(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_hit"] <= HLL_M
        # linear-counting correction applies whenever any register is
        # empty and the raw estimate is small — always true at this vocab
        if r["n_hit"] < HLL_M:
            est = HLL_M * math.log(HLL_M / (HLL_M - r["n_hit"]))
        else:
            est = float(r["hll_est"])
        assert abs(est - r["n_exact"]) <= max(3.0, 0.35 * r["n_exact"]), (
            r["source"], est, r["n_exact"])


def test_hll_registers_are_mergeable(spark):
    """Running the sketch over two disjoint halves and merging registers
    by max must equal the one-pass sketch — the property that makes the
    dataflow a partial+final aggregation at any cluster size."""
    from document_processor_spark.operators.text_analysis import HLL_M, _docs

    docs = _docs(spark, SF_DIR)
    words = docs.select(
        "source", F.explode(F.split("text", " ", -1)).alias("word"),
        (F.col("doc_id") % 2).alias("half"))
    u = F.conv(F.substring(F.md5("word"), 1, 15), 16, 10).cast("bigint")
    base = words.select("source", "half", u.alias("u")).select(
        "source", "half", F.expr(f"u & {HLL_M - 1}").alias("bucket"),
        F.expr("CASE WHEN (u >> 6) = 0 THEN 55"
               " ELSE 55 - length(conv(u >> 6, 10, 2)) END").alias("rho"))
    one_pass = {(r["source"], r["bucket"]): r["m"]
                for r in base.groupBy("source", "bucket")
                .agg(F.max("rho").alias("m")).collect()}
    halves = (base.groupBy("source", "half", "bucket")
              .agg(F.max("rho").alias("m"))
              .groupBy("source", "bucket").agg(F.max("m").alias("m")))
    merged = {(r["source"], r["bucket"]): r["m"] for r in halves.collect()}
    assert merged == one_pass


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Every exact decontamination hit must also be a Bloom hit (no false
    negatives — the property that makes the filter safe as a pre-filter),
    and the false-positive overhead must stay near the k=3, 3968-bit
    design point (~2% at this fill), far below a useless filter."""
    from document_processor_spark.operators.curation import (
        q_cur_bloom_decontaminate,
    )
    rows = q_cur_bloom_decontaminate(spark, SF_DIR).collect()
    assert rows
    n_sh = sum(r["n_shingles"] for r in rows)
    n_fp = 0
    for r in rows:
        assert r["n_hit_bloom"] >= r["n_hit_exact"], r["doc_id"]
        assert r["bloom_fp"] == r["n_hit_bloom"] - r["n_hit_exact"]
        n_fp += r["bloom_fp"]
    # FP rate over non-member probes; fixture fill keeps it comfortably low
    assert n_fp / n_sh < 0.25, (n_fp, n_sh)


def test_bloom_flag_is_superset_of_exact_flag(spark):
    """Bloom-flagged must cover every doc the exact CONTAM_T rule flags:
    the filter may over-flag (FPs) but can never under-flag."""
    from document_processor_spark.operators.curation import (
        q_cur_bloom_decontaminate,
    )
    for r in q_cur_bloom_decontaminate(spark, SF_DIR).collect():
        if r["n_hit_exact"] * 2 >= r["n_shingles"]:
            assert r["bloom_flagged"], r["doc_id"]


def test_cms_never_undercounts_and_is_tight_here(spark):
    """Count-Min's defining guarantee: the estimate is never below the
    true count; and at this vocabulary (31 words into 4x512 counters,
    collisions vanishingly unlikely) it should be exact for every word."""
    from document_processor_spark.operators.text_analysis import (
        q_cms_heavy_hitters,
    )
    rows = q_cms_heavy_hitters(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["cms_est"] >= r["n_exact"], r["word"]
        assert r["overcount"] == r["cms_est"] - r["n_exact"]
    # sparse fill -> the sketch is exact on the fixture
    assert all(r["overcount"] == 0 for r in rows)


def test_cdc_apply_matches_python_fold(spark):
    """Pure-Python replay of the changelog (sort by event_id, keep the
    last change per key, drop final tombstones) must equal the operator
    row-for-row."""
    from document_processor_spark.operators.relational import q_cdc_apply

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    state: dict[int, tuple] = {}
    counts: dict[int, int] = {}
    tombs: dict[int, int] = {}
    for e in sorted(ev, key=lambda e: e["event_id"]):
        state[e["user_id"]] = (e["event_id"], e["event_type"], e["value"])
        counts[e["user_id"]] = counts.get(e["user_id"], 0) + 1
        tombs[e["user_id"]] = (tombs.get(e["user_id"], 0)
                               + (e["event_type"] == "error"))
    want = {
        uid: (s[0], s[1], math.floor(s[2] * 100), counts[uid], tombs[uid])
        for uid, s in state.items() if s[1] != "error"}
    got = {r["user_id"]: (r["last_event_id"], r["last_type"],
                          r["last_value_q"], r["n_changes"],
                          r["n_tombstones"])
           for r in q_cdc_apply(spark, SF_DIR).collect()}
    assert got == want
