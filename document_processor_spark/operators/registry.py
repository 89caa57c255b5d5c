"""Aggregated query registry for the driver contract (__spark_entry__).

Every entry pairs a Spark DataFrame implementation with a DuckDB-runnable
ANSI-SQL oracle (or None for genuinely non-SQL-expressible operators, which
get the driver's weaker rows-only check)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, tuple[QueryFn, str | None]]:
    # imports fail LOUDLY: a broken operator module must surface as a
    # driver error, not silently shrink the query surface
    import importlib

    from . import extraction_ops
    out: dict[str, tuple[QueryFn, str | None]] = {}
    out.update(extraction_ops.QUERIES)
    for mod_name in ("dedup", "ann", "text_analysis", "relational",
                     "multimodal", "pipeline_ops", "curation", "stream_ops"):
        mod = importlib.import_module(f".{mod_name}", __package__)
        out.update(mod.QUERIES)
    return out
