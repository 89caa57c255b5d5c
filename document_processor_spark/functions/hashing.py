"""Deterministic cross-engine hash columns.

Every sketch/sampling operator derives its hash bits the same way: hex
digits of md5, reinterpreted as a non-negative 60-bit integer — because
that exact construction is restatable in DuckDB as
``('0x' || substr(md5(x), START, 15))::BIGINT``, which is what keeps the
oracles bit-exact.  Centralized here so a drift in one copy (substring
offsets, width) can't silently break a single sketch: all Spark-side
users share these builders, and each operator's SQL literal mirrors
them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_u60(col: Column, start: int = 1) -> Column:
    """Non-negative 60-bit integer from 15 md5 hex digits of ``col``
    starting at 1-based hex position ``start`` (1 or 16 — an md5 yields
    two independent 60-bit values).  DuckDB mirror:
    ``('0x' || substr(md5(x), start, 15))::BIGINT``."""
    return (F.conv(F.substring(F.md5(col), start, 15), 16, 10)
            .cast("bigint"))


def md5_h1_h2(col: Column) -> tuple[Column, Column]:
    """The Kirsch-Mitzenmacher double-hashing base pair (h1 + i*h2) used
    by the Bloom filter and Count-Min sketches: both 60-bit halves of one
    md5."""
    return md5_u60(col, 1), md5_u60(col, 16)
