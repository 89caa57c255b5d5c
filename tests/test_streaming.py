"""Streaming front-end: file-source micro-batches through the identical
batch dataflow (foreachBatch) with IceLite snapshot commits; result equals
the batch/oracle output and restarts don't duplicate (checkpointed source +
idempotent commits)."""

import pytest
from pyspark.sql import functions as F

from document_processor_spark import fixtures
from document_processor_spark.io.icelite import IceLite, with_part
from document_processor_spark.job import SPANS_TABLE
from document_processor_spark.streaming.extract_stream import (
    make_batch_processor, start_extract_stream)
from tests.conftest import collect_spans


@pytest.fixture()
def input_dir(spark, corpus, tmp_path):
    rows = [(d["doc_id"],
             [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]])
            for d in corpus]
    df = spark.createDataFrame(rows, schema=fixtures.INPUT_DDL)
    path = tmp_path / "incoming"
    # several files so the stream sees multiple units of work
    df.repartition(6).write.parquet(str(path))
    return str(path)


def test_stream_equals_oracle(spark, input_dir, golden, tmp_path):
    expected, _ = golden
    wh = str(tmp_path / "wh")
    q = start_extract_stream(spark, input_dir, wh,
                             checkpoint_dir=str(tmp_path / "ckpt"),
                             available_now=True, max_files_per_trigger=2)
    q.awaitTermination(300)
    t = IceLite(wh, SPANS_TABLE)
    assert t.current_snapshot_id() >= 1
    out = t.read(spark).filter(F.size("spans") > 0).select("doc_id", "spans")
    assert collect_spans(out) == expected
    # lineage carries the streaming batch ids
    assert all("streaming_batch_id" in s for s in t.snapshots())


def test_stream_restart_no_duplicates(spark, input_dir, golden, tmp_path):
    expected, _ = golden
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    q = start_extract_stream(spark, input_dir, wh, checkpoint_dir=ckpt,
                             available_now=True, max_files_per_trigger=3)
    q.awaitTermination(300)
    # restart over the same input: the checkpointed file source has consumed
    # everything, so no new snapshots are committed
    before = IceLite(wh, SPANS_TABLE).current_snapshot_id()
    q2 = start_extract_stream(spark, input_dir, wh, checkpoint_dir=ckpt,
                              available_now=True)
    q2.awaitTermination(300)
    t = IceLite(wh, SPANS_TABLE)
    assert t.current_snapshot_id() == before
    out = t.read(spark).filter(F.size("spans") > 0)
    assert out.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    assert collect_spans(out.select("doc_id", "spans")) == expected


def test_batch_replay_is_idempotent(spark, corpus, golden, tmp_path):
    """Crash window between snapshot commit and checkpoint commit: Spark
    replays the micro-batch with the SAME batch_id.  The processor must
    recognize the committed streaming_batch_id and skip the append."""
    expected, _ = golden
    rows = [(d["doc_id"],
             [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]])
            for d in corpus]
    df = spark.createDataFrame(rows, schema=fixtures.INPUT_DDL)
    t = IceLite(str(tmp_path / "wh"), SPANS_TABLE)
    process = make_batch_processor(t, run_id="crashy", engine="sql", n_parts=8)

    process(df, 0)
    after_first = t.current_snapshot_id()
    # simulated replay: foreachBatch called again with the same batch_id
    # (exactly what happens when the checkpoint commit was never reached)
    process(df, 0)
    assert t.current_snapshot_id() == after_first
    out = t.read(spark).filter(F.size("spans") > 0)
    assert out.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    assert collect_spans(out.select("doc_id", "spans")) == expected
    # a NEW batch id still commits
    process(df.limit(0), 1)
    assert t.current_snapshot_id() == after_first + 1
