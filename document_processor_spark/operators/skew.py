"""Explicit skew treatment: salted joins and salted aggregation.

AQE's skew-join split (on in session.py) handles most runtime skew by
splitting oversized shuffle partitions, but it only sees skew AFTER a
shuffle materializes and only for sort-merge joins.  Salting is the
explicit, plan-level treatment for the cases AQE cannot fix — a hot key
in a stateful/streaming operator, aggregation skew, or a join whose hot
key must never serialize through one task.  The extraction pipeline's
page-level two-stage assembly (pipeline.assemble) is this same idea
specialized to documents; these helpers are the generic form for the
relational/dedup operators.

Both helpers are deterministic (salt is a hash of caller-named columns,
never rand()) so retried tasks and resumed jobs reproduce bit-identical
results — the same discipline as fixtures/oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(cols: list[str], n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): hash of the named columns.
    The columns must (together) spread the hot key's rows — a row-unique
    id is ideal; any high-cardinality payload column works."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]),
                  F.lit(n_salts)).cast("int")


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int, spread_cols: list[str]) -> DataFrame:
    """Equi-join where `big`'s hot keys are split across `n_salts` shuffle
    partitions: big gets a deterministic salt from `spread_cols`, small is
    replicated n_salts times (explode over a literal range — n_salts × its
    size, which is the explicit price of the technique: use it when small
    is dimension-sized and one key of big is task-breaking), and the join
    key becomes (key, salt).  Result is row-identical to
    ``big.join(small, key)``; only the shuffle layout changes."""
    salted_big = big.withColumn("_salt", _salt_col(spread_cols, n_salts))
    salted_small = (small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
        .withColumn("_salt", F.col("_salt").cast("int")))
    return (salted_big.join(salted_small, [key, "_salt"])
            .drop("_salt"))


def salted_agg(df: DataFrame, key: str, n_salts: int,
               spread_cols: list[str], *aggs: Column) -> DataFrame:
    """Two-phase aggregation for skewed group keys: a partial aggregate on
    (key, salt) — the hot key's rows combine in n_salts parallel tasks —
    then the final aggregate on key over n_salts-bounded partials.  The
    supplied `aggs` must be ALGEBRAIC (sum/count/min/max — reducible from
    partials); the helper applies them at both levels, so pass
    sum/count-shaped columns named for their output.

    (Spark's own hash aggregate already does map-side partial combine;
    this is for the cases where the FINAL reduce of one key is itself the
    bottleneck — enormous collect-style state or a downstream stage pinned
    to the key's partition.)"""
    partial = (df.withColumn("_salt", _salt_col(spread_cols, n_salts))
               .groupBy(key, "_salt").agg(*aggs))
    names = [c for c in partial.columns if c not in (key, "_salt")]
    finals = []
    for n in names:
        # counts and sums both combine by summation; min/max by themselves
        fn = (F.min if n.startswith("min_")
              else F.max if n.startswith("max_") else F.sum)
        finals.append(fn(n).alias(n))
    return partial.groupBy(key).agg(*finals)
