"""Invariant tests for the oracle-gated streaming driver queries
(operators/stream_ops.py).  The driver's hash compare proves each query's
OUTPUT equals its ANSI restatement; these pin what the content hash cannot
see — that the dedup stream really ingested every row twice across
multiple micro-batches, that the extraction stream committed one snapshot
per micro-batch, and that the windowed aggregate conserves the corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_processor_spark.operators import stream_ops

SF_DIR = "/root/testdata/sf0.001"


def test_dedup_replay_double_input_exactly_once_output(spark):
    out, q = stream_ops._run_dedup_replay(spark, SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = ev.count()
    # exactly-once output: every event once, none twice, none dropped
    assert out.count() == n
    assert out.select("event_id").distinct().count() == n
    # the progress log is the only witness that the replay file was real:
    # the source must have fed 2n rows across >= 2 micro-batches
    progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(progress) >= 2, "replay must cross micro-batches"
    assert sum(p["numInputRows"] for p in progress) == 2 * n


def test_extract_snapshot_commits_per_microbatch(spark):
    df, table = stream_ops._run_extract_snapshot(spark, SF_DIR)
    snaps = table.snapshots()
    # 4 input files at 2 files/trigger -> at least 2 snapshot commits,
    # each carrying its micro-batch id in lineage
    assert len(snaps) >= 2
    assert all("streaming_batch_id" in s for s in snaps)
    batch_ids = [s["streaming_batch_id"] for s in snaps]
    assert len(set(batch_ids)) == len(batch_ids)
    assert df.count() > 0


def test_tumbling_hourly_conserves_events(spark):
    out = stream_ops.q_stream_tumbling_hourly(spark, SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    agg = out.agg(F.sum("n_events").alias("n"),
                  F.min("hour_bucket").alias("lo")).collect()[0]
    # complete-mode AvailableNow drain: nothing late, nothing dropped
    assert agg["n"] == ev.count()
    assert agg["lo"] == 0
    # one row per (bucket, type): the groupBy key is unique in the sink
    assert (out.groupBy("hour_bucket", "event_type").count()
            .filter(F.col("count") > 1).count() == 0)
