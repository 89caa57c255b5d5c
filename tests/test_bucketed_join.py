"""Plan-level proof of the bucketed co-located join: two tables written
with `bucketBy` on the same key join with ZERO Exchange nodes — the
write-once-shuffle-never layout a 100 TB corpus uses for its hot join keys
(io/bucketed.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_processor_spark.io import bucketed

SF_DIR = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture()
def tables(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    stats = docs.select(
        "doc_id", F.size(F.split("text", " ", -1)).alias("n_words"))
    bucketed.write_bucketed(docs.select("doc_id", "lang", "source"),
                            "docs_b", "doc_id", N_BUCKETS,
                            path=str(tmp_path / "docs_b"))
    bucketed.write_bucketed(stats, "stats_b", "doc_id", N_BUCKETS,
                            path=str(tmp_path / "stats_b"))
    yield "docs_b", "stats_b"
    spark.sql("DROP TABLE IF EXISTS docs_b")
    spark.sql("DROP TABLE IF EXISTS stats_b")


def test_cobucketed_join_has_no_exchange(spark, tables):
    left, right = tables
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed.cobucketed_join(spark, left, right, "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # correctness alongside the plan shape
        n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        assert joined.count() == n_docs
        row = joined.filter(F.col("n_words") <= 0).count()
        assert row == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_unbucketed_join_shuffles_both_sides(spark, tables):
    """Contrast case: the same join off raw parquet DOES exchange — the
    bucketed layout is what removes it, not the data size."""
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        stats = docs.select(
            "doc_id", F.size(F.split("text", " ", -1)).alias("n_words"))
        plan = (docs.select("doc_id", "lang").join(stats, "doc_id")
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
