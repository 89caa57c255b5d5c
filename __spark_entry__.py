"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: the full extraction pipeline over the
                 deterministic fixture corpus (FIXTURES.md) at small scale.
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-equivalent SQL per query (omitted only for
                 non-SQL-expressible pipeline ops -> rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from document_processor_spark.operators.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: run the extraction pipeline (native-Catalyst engine) on the
    deterministic fixture corpus and return exploded spans."""
    from pyspark.sql import functions as F

    from document_processor_spark import fixtures, pipeline
    docs = fixtures.corpus_df(spark, 0.001, include_skew=False, n_partitions=8)
    out = pipeline.extract_documents(docs, engine="sql")
    return out.select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in all_queries().items()
            if sql is not None}
