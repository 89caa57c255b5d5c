"""Dataflow + training-data operators, exposed as driver-checkable queries.

Each module defines queries as ``(spark, sf_dir) -> DataFrame`` plus an
equivalent DuckDB oracle SQL string; `registry.py` aggregates them for
``__spark_entry__``.
"""
