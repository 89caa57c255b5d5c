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
        _HLL_C,
        HLL_M,
        q_hll_distinct,
    )
    rows = q_hll_distinct(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_hit"] <= HLL_M
        # the shipped raw estimate must be exactly the documented single
        # floored division over the integer register mass (this is the
        # assertion the oracle gate can't make: DuckDB recomputes the
        # same formula, so a wrong formula would pass the hash compare)
        assert r["hll_est"] == math.floor(_HLL_C / r["s_scaled"]), r["source"]
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
    from document_processor_spark.functions.hashing import md5_u60
    from document_processor_spark.operators.text_analysis import (
        _HLL_P,
        _HLL_RHO_MAX,
        HLL_M,
        _docs,
    )

    docs = _docs(spark, SF_DIR)
    words = docs.select(
        "source", F.explode(F.split("text", " ", -1)).alias("word"),
        (F.col("doc_id") % 2).alias("half"))
    base = words.select("source", "half",
                        md5_u60(F.col("word")).alias("u")).select(
        "source", "half", F.expr(f"u & {HLL_M - 1}").alias("bucket"),
        F.expr(f"CASE WHEN (u >> {_HLL_P}) = 0 THEN {_HLL_RHO_MAX}"
               f" ELSE {_HLL_RHO_MAX} - length(conv(u >> {_HLL_P}, 10, 2))"
               f" END").alias("rho"))
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
    n_nonmember = sum(r["n_shingles"] - r["n_hit_exact"] for r in rows)
    n_fp = 0
    for r in rows:
        assert r["n_hit_bloom"] >= r["n_hit_exact"], r["doc_id"]
        assert r["bloom_fp"] == r["n_hit_bloom"] - r["n_hit_exact"]
        n_fp += r["bloom_fp"]
    # FP rate over NON-member probes (members can't be false positives);
    # fixture fill keeps it comfortably under the k=3 design envelope
    assert n_nonmember > 0
    assert n_fp / n_nonmember < 0.25, (n_fp, n_nonmember)


def test_bloom_flag_is_superset_of_exact_flag(spark):
    """Bloom-flagged must cover every doc the exact CONTAM_T rule flags:
    the filter may over-flag (FPs) but can never under-flag."""
    from document_processor_spark.operators.curation import (
        CONTAM_DEN,
        CONTAM_NUM,
        q_cur_bloom_decontaminate,
    )
    for r in q_cur_bloom_decontaminate(spark, SF_DIR).collect():
        if r["n_hit_exact"] * CONTAM_DEN >= r["n_shingles"] * CONTAM_NUM:
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


def test_scd2_intervals_tile_per_key(spark):
    """Per user, the version intervals must tile: sorted by event_id,
    row k's valid_to equals row k+1's valid_from, exactly the last row
    is current, and only it has a NULL valid_to."""
    from document_processor_spark.operators.relational import q_scd2_history

    rows = q_scd2_history(spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for uid, hist in by_user.items():
        hist.sort(key=lambda r: r["event_id"])
        for a, b in zip(hist, hist[1:]):
            assert a["valid_to_us"] == b["valid_from_us"], uid
            assert not a["is_current"]
        assert hist[-1]["is_current"] and hist[-1]["valid_to_us"] is None


def test_cohort_retention_offset0_is_cohort_size(spark):
    """Every user is by definition active at offset 0 of their own
    cohort, so the offset-0 cell must equal the cohort's user count; all
    offsets lie in [0, RETENTION_MAX_OFFSET]."""
    import pyspark.sql.functions as SF

    from document_processor_spark.operators.relational import (
        RETENTION_MAX_OFFSET,
        q_cohort_retention,
    )

    rows = q_cohort_retention(spark, SF_DIR).collect()
    assert rows
    assert all(0 <= r["offset_h"] <= RETENTION_MAX_OFFSET for r in rows)
    got0 = {r["cohort"]: r["n_active"] for r in rows if r["offset_h"] == 0}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    m = ev.agg(SF.min("ts").alias("t0"))
    cohorts = (ev.crossJoin(SF.broadcast(m))
               .select("user_id",
                       SF.floor(SF.expr("timestampdiff(MICROSECOND, t0, ts)")
                                / SF.lit(3_600_000_000)).alias("h"))
               .groupBy("user_id").agg(SF.min("h").alias("cohort"))
               .groupBy("cohort").count().collect())
    want0 = {r["cohort"]: r["count"] for r in cohorts}
    assert got0 == want0


def test_stream_join_attribution_equals_batch_join(spark):
    """The streaming drain must emit exactly the batch range-join answer
    (each qualifying pair once, none withheld in state) even though the
    two sides arrive as 2 micro-batches each."""
    from document_processor_spark.operators.stream_ops import (
        q_stream_join_attribution,
    )
    from document_processor_spark.streaming.join import attribution_join
    from document_processor_spark.streaming.windowed import EVENTS_DDL

    got = {(r["purchase_id"], r["click_id"], r["gap_us"])
           for r in q_stream_join_attribution(spark, SF_DIR).collect()}
    ev = spark.read.schema(EVENTS_DDL).parquet(f"{SF_DIR}/events.parquet")
    want_rows = attribution_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        watermark="2 hours", max_gap="1 hour").collect()
    want = {(r["purchase_id"], r["click_id"], r["gap_us"])
            for r in want_rows}
    assert got == want and got
    assert all(0 <= g <= 3_600_000_000 for _, _, g in got)


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
        v = e["value"] if e["value"] is not None else 0.0
        state[e["user_id"]] = (e["event_id"], e["event_type"], v)
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
