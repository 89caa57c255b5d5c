"""Edge-branch tests for residue operators (round 5).

Each operator below already has a python-recompute test over the fixture
tables; these exercise the documented edge branches the fixture data
never hits: a 1-document source in the percentile normalizer (the
n_src == 1 guard), a single-event user in TWAP (zero-weight tail drop),
and the pure-integer tiebreak in keep-best canonical election."""

from __future__ import annotations

from math import floor

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _stage_documents(spark, tmp_path, extra_rows):
    """Write fixture documents + extra rows as a corpus dir."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    extra = spark.createDataFrame(extra_rows, schema=base.schema)
    corpus = str(tmp_path / "corpus")
    base.unionByName(extra).write.parquet(f"{corpus}/documents.parquet")
    return corpus


def test_score_normalize_single_doc_source(spark, tmp_path):
    # a source with exactly ONE document must take the n_src == 1 branch
    # (percent_rank denominator would be 0) and emit pr_q = 0, without
    # disturbing any other source's percentiles
    from document_processor_spark.operators.curation import (
        q_cur_score_normalize,
    )

    corpus = _stage_documents(
        spark, tmp_path,
        [(100_000, "solo document text", "en", "solo_src", 18)])

    rows = q_cur_score_normalize(spark, corpus).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert [r["pr_q"] for r in by_src["solo_src"]] == [0]

    # multi-doc sources: min-rank percentile stays in [0, 1e6], the
    # max-score doc of each source sits at exactly 1e6 (no ties at top
    # => rank N of N), and equal scores share equal pr_q
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    for src, srows in by_src.items():
        if src == "solo_src":
            continue
        assert all(0 <= r["pr_q"] <= 1_000_000 for r in srows)
        top = max(srows, key=lambda r: r["score"])
        n_top = sum(1 for r in srows if r["score"] == top["score"])
        if n_top == 1:
            assert top["pr_q"] == 1_000_000
        seen: dict[int, int] = {}
        for r in srows:
            assert seen.setdefault(r["score"], r["pr_q"]) == r["pr_q"]
    assert len(rows) == len(base) + 1


def test_twap_single_event_user_dropped(spark, tmp_path):
    # a user whose only event has no successor integrates to zero weight:
    # the user must be ABSENT (wt > 0 filter), not present with nulls
    from document_processor_spark.operators.relational import q_twap

    base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lone_uid = 10_000_000
    assert base.filter(F.col("user_id") == lone_uid).count() == 0
    one = (base.limit(1)
           .withColumn("user_id", F.lit(lone_uid))
           .withColumn("event_id", F.lit(999_999_999)))
    corpus = str(tmp_path / "corpus")
    base.unionByName(one).write.parquet(f"{corpus}/events.parquet")

    got = {r["user_id"]: r for r in q_twap(spark, corpus).collect()}
    assert lone_uid not in got
    # and the untouched users' rows are identical to the fixture run
    want = {r["user_id"]: r for r in q_twap(spark, SF_DIR).collect()}
    assert got == want


def test_keep_best_integer_tiebreak(spark, tmp_path):
    # two docs sharing the 64-char prefix AND n_chars: the packed
    # (n_chars, -doc_id) BIGINT ordering must elect the LOWER doc_id
    from document_processor_spark.operators.curation import q_cur_keep_best

    prefix = "Z" * 64
    a = (200_001, prefix + "tail-A", "en", "src0", 70)
    b = (200_000, prefix + "tail-B", "en", "src0", 70)
    corpus = _stage_documents(spark, tmp_path, [a, b])

    import hashlib
    h = hashlib.md5(prefix.encode()).hexdigest()
    rows = {r["prefix_hash"]: r for r in q_cur_keep_best(spark, corpus).collect()}
    grp = rows[h]
    assert (grp["keeper_id"], grp["best_n_chars"], grp["n_docs"]) == (200_000, 70, 2)


def test_gapfill_locf_leading_and_mid_gaps(spark, tmp_path):
    # a type first observed at hour 3 must have hours 0-2 zero-filled
    # (no prior observation to carry), and hours after its observations
    # must CARRY the last value, not re-zero
    import datetime as dt

    from document_processor_spark.operators.relational import q_gapfill_locf

    base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    t0 = base.agg(F.min("ts")).collect()[0][0]
    mk = lambda eid, hours, val: (  # noqa: E731
        eid, t0 + dt.timedelta(hours=hours, minutes=1), 1, "late_type",
        val, "{}")
    extra = spark.createDataFrame(
        [mk(900_000_001, 3, 5.5), mk(900_000_002, 6, 7.25)],
        schema=base.schema)
    corpus = str(tmp_path / "corpus")
    base.unionByName(extra).write.parquet(f"{corpus}/events.parquet")

    rows = {(r["event_type"], r["hour_bucket"]): r
            for r in q_gapfill_locf(spark, corpus).collect()}
    mb = max(h for (_t, h) in rows)
    assert mb >= 8  # fixture horizon is ~30 days
    for h in range(0, 3):  # leading gap: zero fill, flagged
        r = rows[("late_type", h)]
        assert (r["n"], r["sum_locf"], r["is_gap"]) == (0, 0.0, True)
    assert rows[("late_type", 3)]["n"] == 1
    assert rows[("late_type", 3)]["sum_locf"] == 5.5
    for h in range(4, 6):  # mid gap: carried value, still flagged
        r = rows[("late_type", h)]
        assert (r["n"], r["sum_locf"], r["is_gap"]) == (0, 5.5, True)
    assert rows[("late_type", 6)]["sum_locf"] == 7.25
    for h in range(7, mb + 1):  # trailing gap: last value rides to the end
        r = rows[("late_type", h)]
        assert (r["sum_locf"], r["is_gap"]) == (7.25, True)
    # spine is dense for every type: |types| x (mb+1) rows exactly
    n_types = len({t for (t, _h) in rows})
    assert len(rows) == n_types * (mb + 1)


def test_interval_coverage_touching_nested_zero(spark, tmp_path):
    # end-exclusive [s, s+value) semantics: a touching successor
    # (s == prev end) MERGES into the island (strict > starts a new one),
    # a nested interval adds no coverage, and an isolated zero-length
    # interval is an island of zero covered time
    import datetime as dt

    from document_processor_spark.operators.relational import (
        q_interval_coverage,
    )

    base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    t0 = base.agg(F.min("ts")).collect()[0][0]
    mk = lambda eid, uid, off_s, dur_s: (  # noqa: E731
        eid, t0 + dt.timedelta(seconds=off_s), uid, "synthetic",
        float(dur_s), "{}")
    extra = spark.createDataFrame(
        [
            mk(910_000_001, 20_000_000, 0, 10),    # [0, 10)
            mk(910_000_002, 20_000_000, 10, 10),   # touches -> same island
            mk(910_000_003, 20_000_000, 100, 0),   # isolated zero-length
            mk(910_000_004, 20_000_001, 0, 30),    # [0, 30)
            mk(910_000_005, 20_000_001, 5, 5),     # nested, no new coverage
        ],
        schema=base.schema)
    corpus = str(tmp_path / "corpus")
    base.unionByName(extra).write.parquet(f"{corpus}/events.parquet")

    got = {r["user_id"]: (r["covered_us"], r["n_islands"])
           for r in q_interval_coverage(spark, corpus).collect()}
    assert got[20_000_000] == (20_000_000, 2)
    assert got[20_000_001] == (30_000_000, 1)
    # untouched users identical to the fixture-only run
    want = {r["user_id"]: (r["covered_us"], r["n_islands"])
            for r in q_interval_coverage(spark, SF_DIR).collect()}
    for uid, v in want.items():
        assert got[uid] == v


def test_json_props_malformed_values_dropped_both_engines(spark, tmp_path):
    # malformed props must be DROPPED identically by the Spark query and
    # the DuckDB oracle (bare casts diverge: non-ANSI Spark nulls '3.7'
    # where DuckDB TRY_CAST rounds to 4), and the query must survive an
    # ANSI session — the regex guard runs before any cast
    import duckdb

    from document_processor_spark.operators.relational import (
        SQL_JSON_PROPS,
        q_json_props,
    )

    base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    t0 = base.agg(F.min("ts")).collect()[0][0]
    bad = ["not json", "{}", '{"k": "x"}', '{"k": 3.7}',
           '{"k": 99999999999999999999}', None, '{"k": -7}', '{"k": "12"}',
           # trailing newline: Java find() lets '$' match before a final
           # line terminator, RE2 does not — the \A..\z guard must drop
           # it in BOTH engines (r5 ADVICE divergence)
           '{"k": "12\n"}']
    extra = spark.createDataFrame(
        [(920_000_000 + i, t0, 1, "json_edge", 1.0, p)
         for i, p in enumerate(bad)],
        schema=base.schema)
    corpus = str(tmp_path / "corpus")
    base.unionByName(extra).write.parquet(f"{corpus}/events.parquet")

    def run_spark():
        return {r["event_type"]: (r["n_events"], r["sum_k"], r["min_k"],
                                  r["max_k"], r["avg_k_q"])
                for r in q_json_props(spark, corpus).collect()}

    got = run_spark()
    # only -7 and "12" survive the integer guard
    assert got["json_edge"] == (2, 5, -7, 12, floor(5 / 2 * 10000))

    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        assert run_spark() == got
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{corpus}/events.parquet/*.parquet')")
    oracle = {r[0]: tuple(r[1:]) for r in con.execute(SQL_JSON_PROPS).fetchall()}
    assert oracle == got


def test_promo_share_ppm_survives_bigint_overflow_range(spark, tmp_path):
    # revenue-unit sums at 100 TB scale exceed 9.2e12, where the old
    # `promo_units * 1000000` BIGINT numerator silently wrapped negative
    # (non-ANSI); the DECIMAL(38,0)/HUGEINT numerator must return the
    # exact ppm on both engines
    import datetime as dt

    import duckdb

    from document_processor_spark.operators.relational import (
        SQL_PROMO_SHARE,
        q_promo_share,
    )

    ship = dt.datetime(2024, 3, 1)
    li = spark.createDataFrame(
        [(1, 5.0e8, 0.0, ship), (2, 5.0e8, 0.0, ship), (3, 1.0e8, 0.0, ship)],
        "l_partkey bigint, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp")
    p = spark.createDataFrame(
        [(1, "PROMO"), (2, "PROMO"), (3, "STANDARD")],
        "p_partkey bigint, p_type string")
    corpus = str(tmp_path / "corpus")
    li.write.parquet(f"{corpus}/lineitem.parquet")
    p.write.parquet(f"{corpus}/part.parquet")

    [r] = q_promo_share(spark, corpus).collect()
    promo_u, all_u = 10_000_000_000_000, 11_000_000_000_000
    assert promo_u * 1_000_000 > 2**63  # the fixed path must not wrap
    want = (r["ship_month"], r["promo_units"], r["all_units"], r["promo_ppm"])
    assert want == ("2024-03", promo_u, all_u,
                    promo_u * 1_000_000 // all_u)

    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{corpus}/{t}.parquet/*.parquet')")
    assert [tuple(x) for x in con.execute(SQL_PROMO_SHARE).fetchall()] \
        == [want]


def test_event_transitions_single_event_user_is_noop(spark, tmp_path):
    # a user with exactly one event has no (prev -> next) step: the
    # transition matrix (counts AND ppm) must be byte-identical to the
    # fixture-only run
    from document_processor_spark.operators.relational import (
        q_event_transitions,
    )

    base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    t0 = base.agg(F.min("ts")).collect()[0][0]
    one = spark.createDataFrame(
        [(930_100_000, t0, 30_000_000, "purchase", 1.0, "{}")],
        schema=base.schema)
    corpus = str(tmp_path / "corpus")
    base.unionByName(one).write.parquet(f"{corpus}/events.parquet")

    key = lambda r: (r["prev_type"], r["event_type"])  # noqa: E731
    got = {key(r): (r["n"], r["prob_ppm"])
           for r in q_event_transitions(spark, corpus).collect()}
    want = {key(r): (r["n"], r["prob_ppm"])
            for r in q_event_transitions(spark, SF_DIR).collect()}
    assert got == want
    # and the matrix is a proper conditional distribution: per prev_type
    # the floored ppm rows sum to within |targets| of exactly 1e6
    from collections import defaultdict
    acc = defaultdict(lambda: [0, 0])
    for (prev, _nxt), (_n, ppm) in got.items():
        acc[prev][0] += ppm
        acc[prev][1] += 1
    for prev, (s, k) in acc.items():
        assert 1_000_000 - k < s <= 1_000_000, prev


def test_length_quantiles_single_doc_language(spark, tmp_path):
    # n=1: every interpolated quantile position collapses to 1, so
    # p50 = p90 = p99 = the one value exactly (x100 quantized)
    from document_processor_spark.operators.text_analysis import (
        q_length_quantiles,
    )

    corpus = _stage_documents(
        spark, tmp_path, [(300_000, "x" * 777, "zz", "src0", 777)])
    rows = {r["lang"]: r for r in q_length_quantiles(spark, corpus).collect()}
    z = rows["zz"]
    assert (z["n_docs"], z["p50"], z["p90"], z["p99"]) \
        == (1, 77_700, 77_700, 77_700)


def test_min_price_supplier_ties_all_surface(spark, tmp_path):
    # two EUROPE suppliers hitting the identical integer-cents minimum
    # must BOTH surface (documented tie semantics); a cheaper non-EUROPE
    # supplier must not leak in through the region fold
    import datetime as dt

    from document_processor_spark.operators.relational import (
        q_min_price_supplier,
    )

    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")],
        "r_regionkey bigint, r_name string"
    ).write.parquet(f"{corpus}/region.parquet")
    spark.createDataFrame(
        [(0, "FRANCE", 0), (1, "GERMANY", 0), (2, "JAPAN", 1)],
        "n_nationkey bigint, n_name string, n_regionkey bigint"
    ).write.parquet(f"{corpus}/nation.parquet")
    spark.createDataFrame(
        [(10, "Supplier#10", 0, 0.0), (11, "Supplier#11", 1, 0.0),
         (12, "Supplier#12", 2, 0.0)],
        "s_suppkey bigint, s_name string, s_nationkey bigint, "
        "s_acctbal double"
    ).write.parquet(f"{corpus}/supplier.parquet")
    spark.createDataFrame(
        [(5, "widget", "B#1", "STANDARD", 3, 1.0),
         (6, "too-big", "B#1", "STANDARD", 30, 1.0)],
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size bigint, p_retailprice double"
    ).write.parquet(f"{corpus}/part.parquet")
    # two EUROPE ties at 12.34, one cheaper ASIA row, one oversize part
    li_schema = ("l_partkey bigint, l_suppkey bigint, "
                 "l_extendedprice double, l_orderkey bigint, "
                 "l_discount double, l_shipdate timestamp")
    ship = dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(5, 10, 12.34, 1, 0.0, ship), (5, 11, 12.34, 2, 0.0, ship),
         (5, 10, 99.0, 3, 0.0, ship), (5, 12, 1.0, 4, 0.0, ship),
         (6, 10, 0.5, 5, 0.0, ship)],
        li_schema).write.parquet(f"{corpus}/lineitem.parquet")

    rows = q_min_price_supplier(spark, corpus).collect()
    got = {(r["p_partkey"], r["s_suppkey"], r["n_name"], r["min_units"])
           for r in rows}
    assert got == {(5, 10, "FRANCE", 1234), (5, 11, "GERMANY", 1234)}


def test_range_join_boundary_inclusivity(spark, tmp_path):
    # interval semantics are [ws, we): an event exactly on a window's
    # start belongs to it, an event exactly on its end does not (it
    # falls only into the LATER overlapping windows) — the residual
    # filter after the bucket equi-join must keep that exact
    from document_processor_spark.operators.relational import q_range_join

    import datetime as dt
    base = dt.datetime(2024, 6, 1)
    us = dt.timedelta(microseconds=1)
    ev = spark.createDataFrame(
        [(1, base, 1, "synthetic", 1.0, "{}"),                    # tus=0
         (2, base + 3_600_000_000 * us, 1, "synthetic", 1.0, "{}"),  # =1h
         (3, base + 1_800_000_000 * us, 1, "synthetic", 1.0, "{}")],  # =30m
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string")
    corpus = str(tmp_path / "corpus")
    ev.write.parquet(f"{corpus}/events.parquet")

    got = {r["win_id"]: r["n_events"]
           for r in q_range_join(spark, corpus).collect()}
    # win0=[0,1h): e1@0 in, e3@30m in, e2@1h OUT.  win1=[30m,90m): e3, e2.
    # win2=[1h,2h): e2 only.  Empty windows do not surface.
    assert got == {0: 2, 1: 2, 2: 1}


def test_pack_sequences_oversize_doc_skips_sequence_ids(spark, tmp_path):
    # concat-then-chunk: a document 3x the budget still belongs to the
    # single sequence its FIRST token lands in, and the next document
    # starts 3 budgets later — sequence ids skip, no doc is split across
    # output rows and no tokens are lost
    from document_processor_spark.operators.curation import (
        PACK_BUDGET,
        q_cur_pack_sequences,
    )

    words = lambda n: " ".join(["w"] * n)  # noqa: E731
    docs = [(400_000, words(10), "en", "pack_src", 2 * 10 - 1),
            (400_001, words(3 * PACK_BUDGET), "en", "pack_src", 1),
            (400_002, words(10), "en", "pack_src", 2 * 10 - 1)]
    corpus = _stage_documents(spark, tmp_path, docs)

    got = {r["seq"]: (r["n_docs"], r["seq_tokens"])
           for r in q_cur_pack_sequences(spark, corpus).collect()
           if r["source"] == "pack_src"}
    # doc0 starts at token 0 (seq 0); the oversize doc starts at token 10
    # (still seq 0); doc2 starts at 10 + 3*256 = 778 -> seq 3
    assert got == {0: (2, 10 + 3 * PACK_BUDGET), 3: (1, 10)}
