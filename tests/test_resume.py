"""Checkpoint-resume + snapshot semantics (FIXTURES.md §5, SURVEY.md §5.2-4):
process part of the corpus, 'crash' between snapshots, rerun — the final
table must equal the single-run golden output with no duplicates, and every
snapshot must carry per-partition lineage + metrics."""

import pytest
from pyspark.sql import functions as F

from document_processor_spark import fixtures
from document_processor_spark.io.icelite import IceLite, with_part
from document_processor_spark.job import SPANS_TABLE, read_spans, run_extraction_job
from tests.conftest import collect_spans

N_PARTS = 8


@pytest.fixture()
def input_df(spark, corpus):
    rows = [(d["doc_id"],
             [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]])
            for d in corpus]
    return spark.createDataFrame(rows, schema=fixtures.INPUT_DDL)


def test_single_run_equals_oracle(spark, input_df, golden, tmp_path):
    expected, om = golden
    s = run_extraction_job(spark, input_df, str(tmp_path), "r1", n_parts=N_PARTS)
    assert s.partitions_done == N_PARTS
    got = collect_spans(read_spans(spark, str(tmp_path)).select("doc_id", "spans"))
    assert got == expected
    # lineage rows: every partition present, metrics sum to corpus totals
    lineage = IceLite(str(tmp_path), SPANS_TABLE).lineage()
    assert sum(r.get("docs_in", 0) for r in lineage) == om.docs_in
    assert sum(r.get("spans_out", 0) for r in lineage) == om.spans_out
    assert sum(r.get("fallback_pages", 0) for r in lineage) == om.fallback_pages
    assert sum(r.get("skipped_docs", 0) for r in lineage) == om.skipped_docs
    # S29: every quarantined doc is attributed to a reason code
    assert sum(r.get("reason_empty_payload", 0) + r.get("reason_no_content", 0)
               for r in lineage) == om.skipped_docs
    # quarantine rows in the table carry the reason
    quarantined = (IceLite(str(tmp_path), SPANS_TABLE).read(spark)
                   .filter(F.size("spans") <= 0))
    assert quarantined.filter(F.col("skip_reason").isNull()).count() == 0


def test_resume_rejects_changed_n_parts(spark, input_df, tmp_path):
    wh = str(tmp_path)
    run_extraction_job(spark, input_df, wh, "r1", n_parts=N_PARTS,
                       partitions_per_commit=2, max_commits=1)
    with pytest.raises(ValueError, match="n_parts"):
        run_extraction_job(spark, input_df, wh, "r2", n_parts=N_PARTS * 2)


def test_kill_and_resume(spark, input_df, golden, tmp_path):
    expected, _ = golden
    wh = str(tmp_path)
    # first run "crashes" after 2 of 4 commits (2 partitions each)
    s1 = run_extraction_job(spark, input_df, wh, "r1", n_parts=N_PARTS,
                            partitions_per_commit=2, max_commits=2)
    assert s1.partitions_done == 4
    # resume: skips the 4 committed partitions, finishes the rest
    s2 = run_extraction_job(spark, input_df, wh, "r2", n_parts=N_PARTS,
                            partitions_per_commit=2)
    assert sorted(s2.skipped_partitions) == sorted(
        int(p) for c in s1.commits for p in c["partitions"])
    assert s1.partitions_done + s2.partitions_done == N_PARTS

    final = read_spans(spark, wh)
    # no duplicates
    assert final.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    assert collect_spans(final.select("doc_id", "spans")) == expected


def test_rerun_after_completion_is_noop(spark, input_df, tmp_path):
    wh = str(tmp_path)
    run_extraction_job(spark, input_df, wh, "r1", n_parts=N_PARTS)
    before = IceLite(wh, SPANS_TABLE).current_snapshot_id()
    s = run_extraction_job(spark, input_df, wh, "r2", n_parts=N_PARTS)
    assert s.commits == []
    assert IceLite(wh, SPANS_TABLE).current_snapshot_id() == before


def test_snapshot_isolation_read_as_of(spark, input_df, tmp_path):
    wh = str(tmp_path)
    run_extraction_job(spark, input_df, wh, "r1", n_parts=N_PARTS,
                       partitions_per_commit=4)
    t = IceLite(wh, SPANS_TABLE)
    assert t.current_snapshot_id() == 2
    n1 = t.read(spark, as_of=1).count()
    n2 = t.read(spark, as_of=2).count()
    assert 0 < n1 < n2


def test_uncommitted_data_invisible(spark, input_df, tmp_path):
    """Crash-safety: data files without a manifest are invisible to readers
    (the Iceberg model)."""
    wh = str(tmp_path)
    run_extraction_job(spark, input_df, wh, "r1", n_parts=N_PARTS)
    t = IceLite(wh, SPANS_TABLE)
    n = t.read(spark).count()
    # simulate a crashed writer: orphan data dir, no manifest
    out = with_part(input_df.limit(2), N_PARTS)
    out.write.partitionBy("part").parquet(str(t.data / "snap-999999"))
    assert t.read(spark).count() == n
