"""The full extraction pipeline exposed as driver queries.

These run the real dataflow (explode → parse → fallback → assembly) over
the deterministic fixture corpus.  They are NOT SQL-expressible as a single
DuckDB statement (two-level page/doc aggregation with per-page pipeline
choice), so they take the driver's rows-only check; strict span-sequence
equality vs the pure-Python oracle is enforced by pytest
(tests/test_pipeline_e2e.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fixtures, pipeline

_FIXTURE_SF = 0.002  # ~20 docs: fast enough for the per-round driver check


def _run(spark: SparkSession, engine: str) -> DataFrame:
    docs = fixtures.corpus_df(spark, _FIXTURE_SF, include_skew=False,
                              n_partitions=8)
    out = pipeline.extract_documents(docs, engine=engine)
    return (out.select("doc_id", F.explode("spans").alias("s"))
            .select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"))


def q_extract_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, "sql")


def q_extract_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, "arrow")


QUERIES = {
    "pipe_extract_catalyst": (q_extract_sql, None),
    "pipe_extract_arrow": (q_extract_arrow, None),
}
