"""The dps_synth custom DataSource must generate the corpus
partition-parallel and byte-identical to the driver-side fixture path,
honor its partition plan, and feed the extraction pipeline unchanged."""

from __future__ import annotations

from document_processor_spark import fixtures, pipeline
from document_processor_spark.sources import register_synth_source


def _spans_by_doc(df):
    return {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in df.collect()}


def test_synth_source_equals_driver_fixture(spark):
    register_synth_source(spark)
    got = (spark.read.format("dps_synth")
           .option("sf", "0.001").option("numPartitions", "4").load())
    want = fixtures.corpus_df(spark, 0.001, include_skew=False)
    assert _spans_by_doc(got) == _spans_by_doc(want)
    # the plan really is 4 executor-side slices, not a driver collect
    assert got.rdd.getNumPartitions() == 4


def test_synth_source_skew_and_pipeline(spark, golden):
    register_synth_source(spark)
    src = (spark.read.format("dps_synth")
           .option("sf", "0.001").option("numPartitions", "8")
           .option("includeSkew", "false").load())
    out = pipeline.extract_documents(src, engine="sql")
    got = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                         for s in r["spans"]] for r in out.collect()}
    assert got == golden[0]


def test_synth_source_partition_plan_caps_at_docs(spark):
    register_synth_source(spark)
    df = (spark.read.format("dps_synth")
          .option("sf", "0.0001").option("numPartitions", "64").load())
    # 1 doc + extras: the plan must not emit empty slices
    assert df.rdd.getNumPartitions() == 1
    assert df.count() >= 1
