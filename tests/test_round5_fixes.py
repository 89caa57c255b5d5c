"""Round-5 ADVICE regressions: quality-AUC empty-document guard and
decimal-before-multiply, Kneser-Ney discount interpolation, shared IVF-PQ
stage-1 SQL."""

from __future__ import annotations

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def test_quality_auc_survives_empty_document(spark, tmp_path):
    """An empty text must score punct_ratio = 0 (not 0/0 = NaN) in BOTH
    engines: previously Spark silently bucketed floor(NaN) at 0 while
    DuckDB errored on CAST(NaN AS BIGINT)."""
    from document_processor_spark.operators.text_analysis import (
        QUERIES, q_quality_auc,
    )

    corpus = str(tmp_path / "sf")
    rows = [(1, "", "en", "web", 0),
            (2, "the quick brown fox is on the web.", "en", "web", 34),
            (3, "zzz qqq xxx", "de", "web", 11),
            (4, "", "de", "web", 0)]
    (spark.createDataFrame(rows, "doc_id long, text string, lang string,"
                           " source string, n_chars long")
     .write.parquet(f"{corpus}/documents.parquet"))

    got = q_quality_auc(spark, corpus).collect()
    assert len(got) == 1
    assert got[0]["n_pos"] == 2 and got[0]["n_neg"] == 2
    assert 0 <= got[0]["auc_ppm"] <= 1_000_000

    con = duckdb.connect()
    con.execute(f"""CREATE VIEW documents AS
        SELECT * FROM read_parquet('{corpus}/documents.parquet/*.parquet')""")
    ora = con.execute(QUERIES["ta_quality_auc"][1]).fetchall()
    assert ora == [(got[0]["n_pos"], got[0]["n_neg"], got[0]["auc_ppm"])]


def test_quality_auc_pair_products_are_decimal_before_multiply():
    """The 2*n_pos*below / n_pos*n_neg products must not be evaluated in
    BIGINT (silent wrap at ~3e9 eval docs): the Spark plan must multiply
    decimal operands, the DuckDB oracle HUGEINT ones."""
    from document_processor_spark.operators.text_analysis import (
        QUERIES, _sql_quality_auc,
    )

    sql = _sql_quality_auc()
    assert sql.count("AS HUGEINT") >= 4
    assert QUERIES["ta_quality_auc"][1] == sql
    # huge bucket counts through the oracle's t-CTE arithmetic: 3e9 pos
    # against 3e9 neg in one bucket overflows int64 (9.2e18) in two_u
    con = duckdb.connect()
    con.execute("""CREATE VIEW c AS SELECT * FROM (VALUES
        (0, 0, 3000000000, 0), (1, 3000000000, 0, 3000000000))
        t(score_q, n_pos, n_neg, below)""")
    start = sql.index("), t AS (") + len("), t AS (")
    end = sql.index("FROM c)", start) + len("FROM c")
    t_cte = "WITH t AS (" + sql[start:end] + ")"
    val = con.execute(
        t_cte + " SELECT CAST((1000000 * two_u) // (2 * p * n) AS BIGINT)"
        " FROM t").fetchone()[0]
    assert val == 1_000_000  # perfect separation, no wrap


def test_kneser_ney_sql_derives_discount_from_constants():
    """The oracle must interpolate KN_D_NUM/KN_D_DEN rather than hardcode
    0.75, so changing the knob cannot desynchronize the two paths."""
    from document_processor_spark.operators import text_analysis as ta

    assert "0.75" not in ta.SQL_KNESER_NEY
    assert ta.SQL_KNESER_NEY.count(
        f"({ta.KN_D_NUM} / {ta.KN_D_DEN}.0)") == 2


def test_ivf_pq_oracles_share_stage1_sql():
    """Both IVF-PQ oracles must start with the SAME stage-1 CTE prefix —
    the factoring that keeps future stage-1 edits from drifting."""
    from document_processor_spark.operators import ann

    s1 = ann._pq_sql_stage1()
    assert ann._sql_ivf_pq().startswith(s1)
    assert ann._sql_rerank_exact().startswith(s1)
