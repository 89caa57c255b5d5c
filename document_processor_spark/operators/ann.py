"""Approximate-nearest-neighbor search over the embedding column.

Baseline: brute-force cosine top-k (exact) — window rank over the
query×corpus score matrix.  Scale path: random-hyperplane LSH bucketing —
each vector hashes to a small signature; only same-bucket pairs are scored,
so the join is bucket-local (shuffle on the bucket key, AQE splits hot
buckets).  At 100 TB the corpus side would additionally be IVF-partitioned
by coarse centroid; the bucket-join shape below is the same.

Determinism: hyperplanes are a fixed integer pattern (no RNG), cosine is an
exact-order double fold, ranks tie-break on vec_id — bit-identical with the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .dedup import (_SQL_DOT, _SQL_NORM, _bucket_expr, _dbl, _dot, _norm,
                    _sql_bucket)

TOP_K = 5
QUERY_MOD = 50          # vec_id % 50 == 0 → query set


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # norm materialized once per vector (never recomputed per candidate pair)
    return (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .repartition(spark.sparkContext.defaultParallelism)
            .select("vec_id", _dbl("embedding").alias("v"))
            .withColumn("nrm", _norm(F.col("v"))))


def q_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0) \
         .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                 F.col("nrm").alias("qnrm"))
    # corpus side is the big side; the query side broadcasts
    pairs = (e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
             .select("query_id", "vec_id",
                     (_dot(F.col("qv"), F.col("v"))
                      / (F.col("qnrm") * F.col("nrm"))).alias("cos")))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "vec_id",
                    F.col("rank").cast("bigint").alias("rank"),
                    F.round("cos", 6).alias("cosine")))


SQL_ANN_BRUTEFORCE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  {_SQL_NORM.format(a="(embedding::DOUBLE[])")} AS nrm
           FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM e
      WHERE vec_id % {QUERY_MOD} = 0),
pairs AS (
  SELECT q.query_id, e.vec_id,
         {_SQL_DOT.format(a="q.qv", b="e.v")} / (q.qnrm * e.nrm) AS cos
  FROM e JOIN q ON e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id) AS rank
  FROM pairs
)
SELECT query_id, vec_id, rank, round(cos, 6) AS cosine
FROM ranked WHERE rank <= {TOP_K}
"""


# -- LSH-bucketed variant ---------------------------------------------------------

def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: candidates restricted to the query's LSH bucket, then
    exact cosine rank within bucket."""
    e = _emb(spark, sf_dir).withColumn("bucket", _bucket_expr(F.col("v")))
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0) \
         .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                 F.col("nrm").alias("qnrm"), F.col("bucket"))
    pairs = (e.join(F.broadcast(q), "bucket")
             .filter(F.col("vec_id") != F.col("query_id"))
             .select("query_id", "vec_id",
                     (_dot(F.col("qv"), F.col("v"))
                      / (F.col("qnrm") * F.col("nrm"))).alias("cos")))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "vec_id",
                    F.col("rank").cast("bigint").alias("rank"),
                    F.round("cos", 6).alias("cosine")))


SQL_ANN_LSH = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         {_sql_bucket("(embedding::DOUBLE[])")} AS bucket,
         {_SQL_NORM.format(a="(embedding::DOUBLE[])")} AS nrm
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv, bucket, nrm AS qnrm FROM e
      WHERE vec_id % {QUERY_MOD} = 0),
pairs AS (
  SELECT q.query_id, e.vec_id,
         {_SQL_DOT.format(a="q.qv", b="e.v")} / (q.qnrm * e.nrm) AS cos
  FROM e JOIN q USING (bucket) WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id) AS rank
  FROM pairs
)
SELECT query_id, vec_id, rank, round(cos, 6) AS cosine
FROM ranked WHERE rank <= {TOP_K}
"""


QUERIES = {
    "ann_bruteforce_topk": (q_ann_bruteforce_topk, SQL_ANN_BRUTEFORCE),
    "ann_lsh_topk": (q_ann_lsh_topk, SQL_ANN_LSH),
}
