"""Curation job: one atomic snapshot per run, Observation-carried funnel
counters that reconcile exactly, and run_id idempotency."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_processor_spark.curation_job import (
    read_curated,
    run_curation_job,
)
from document_processor_spark.io.icelite import IceLite
from document_processor_spark.operators.curation import q_cur_corpus_build

SF_DIR = "/root/testdata/sf0.001"


def test_job_commits_once_with_reconciling_funnel(spark, tmp_path):
    wh = str(tmp_path / "wh")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s = run_curation_job(spark, docs, wh, "c1", n_parts=8)
    assert not s.skipped
    f = s.funnel
    # counters reconcile: every input doc is accounted for by exactly one
    # stage outcome
    assert f["docs_in"] == docs.count()
    assert f["docs_in"] == (f["gate_holdout_drops"] + f["exact_dup_drops"]
                            + f["contaminated_drops"] + f["docs_out"])
    assert f["docs_out"] > 0 and f["tokens_out"] > 0
    # NON-telescoping checks (the reconciliation above holds for ANY
    # keeper count): each counter must equal its independently recomputed
    # stage.  The fixture corpus has no exact duplicates, so the dedup
    # stage must be a no-op — this is exactly the assertion that catches
    # an Observation latching 0 (e.g. when placed directly under a lazy
    # localCheckpoint).
    from document_processor_spark.operators.curation import (
        EVAL_MOD,
        _gate_metrics,
    )
    n_passed = (docs.withColumn("reasons", _gate_metrics()["reasons"])
                .filter((F.col("reasons") == "")
                        & (F.col("doc_id") % EVAL_MOD != 0)).count())
    assert f["gate_holdout_survivors"] == n_passed
    assert f["post_dedup_keepers"] == n_passed
    assert f["exact_dup_drops"] == 0
    assert f["contaminated_drops"] == n_passed - f["docs_out"] >= 0

    # the committed table equals the operator query's result
    got = sorted(tuple(r) for r in read_curated(spark, wh)
                 .select("doc_id", "source", "tokens", "seq").collect())
    want = sorted(tuple(r) for r in
                  q_cur_corpus_build(spark, SF_DIR).collect())
    assert got == want

    # funnel + per-partition metrics persisted in the manifest
    snap = IceLite(wh, "curated").snapshots()[-1]
    assert snap["funnel"]["docs_out"] == f["docs_out"]
    per_part_docs = sum(m.get("docs_out", 0)
                        for m in snap["partitions"].values())
    assert per_part_docs == f["docs_out"]

    # idempotency: same run_id is a no-op returning the committed funnel
    s2 = run_curation_job(spark, docs, wh, "c1", n_parts=8)
    assert s2.skipped and s2.snapshot_id == s.snapshot_id
    assert s2.funnel["docs_out"] == f["docs_out"]
    assert len(IceLite(wh, "curated").snapshots()) == 1

    # a NEW run_id appends a second snapshot (snapshot isolation intact)
    s3 = run_curation_job(spark, docs, wh, "c2", n_parts=8)
    assert not s3.skipped
    assert len(IceLite(wh, "curated").snapshots()) == 2
