"""Salted join / salted aggregation: result equality with the unsalted
plan AND an empirical check that the hot key actually spreads across
salt groups (operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_processor_spark.operators import skew

N_SALTS = 8
HOT_ROWS = 5000


def _skewed(spark):
    """One task-breaking hot key (HOT_ROWS rows) + a uniform tail."""
    hot = spark.range(HOT_ROWS).select(
        F.lit(0).alias("k"), F.col("id").alias("row_id"),
        (F.col("id") % 97).alias("v"))
    tail = spark.range(500).select(
        (F.col("id") % 50 + 1).alias("k"), (F.col("id") + HOT_ROWS).alias("row_id"),
        (F.col("id") % 97).alias("v"))
    return hot.unionByName(tail)


def _dim(spark):
    return spark.range(51).select(
        F.col("id").alias("k"), F.concat(F.lit("dim"), "id").alias("label"))


def test_salted_join_equals_plain_join(spark):
    big, small = _skewed(spark), _dim(spark)
    plain = {(r["k"], r["row_id"], r["v"], r["label"])
             for r in big.join(small, "k").collect()}
    salted = {(r["k"], r["row_id"], r["v"], r["label"])
              for r in skew.salted_join(
                  big, small, "k", N_SALTS, ["row_id"]).collect()}
    assert salted == plain
    assert len(salted) == HOT_ROWS + 500


def test_salt_actually_spreads_the_hot_key(spark):
    big = _skewed(spark).withColumn(
        "_salt", skew._salt_col(["row_id"], N_SALTS))
    per_salt = (big.filter(F.col("k") == 0)
                .groupBy("_salt").count().collect())
    assert len(per_salt) == N_SALTS, "hot key must hit every salt group"
    counts = [r["count"] for r in per_salt]
    # xxhash64 spread: no salt group holds more than 2x the fair share
    assert max(counts) < 2 * (HOT_ROWS / N_SALTS)


def test_salted_agg_equals_plain_agg(spark):
    df = _skewed(spark)
    plain = {(r["k"], r["sum_v"], r["n"]) for r in
             df.groupBy("k").agg(F.sum("v").alias("sum_v"),
                                 F.count(F.lit(1)).alias("n")).collect()}
    salted = {(r["k"], r["sum_v"], r["n"]) for r in
              skew.salted_agg(
                  df, "k", N_SALTS, ["row_id"],
                  F.sum("v").alias("sum_v"),
                  F.count(F.lit(1)).alias("n")).collect()}
    # count partials combine by summation; names without a prefix sum too
    assert salted == plain
