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
    e = _emb(spark, sf_dir).withColumn("bucket", _bucket_expr(F.col("v"), 0))
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
         {_sql_bucket("(embedding::DOUBLE[])", 0)} AS bucket,
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


# -- IVF-partitioned variant --------------------------------------------------------

CENT_MOD = 31           # vec_id % 31 == 0 → coarse centroid (deterministic)
N_PROBE = 4             # cells probed per query


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN — the 100 TB scale path: the corpus is partitioned into
    coarse cells (nearest centroid by cosine); each query probes only its
    N_PROBE nearest cells, so scored candidates are bounded by
    nprobe × cell size, never the corpus.  Centroids are a deterministic
    sample (vec_id % CENT_MOD == 0) and broadcast to both the assignment
    and the probe stage — no shuffle until the (cent_id)-bucketed
    candidate join, which AQE rebalances on skewed cells.  At real scale
    the centroid set comes from a KMeans sketch; the dataflow is identical."""
    e = _emb(spark, sf_dir)
    cents = (e.filter(F.col("vec_id") % CENT_MOD == 0)
             .select(F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"),
                     F.col("nrm").alias("cnrm")))

    def nearest_cells(side: DataFrame, id_col: str, n: int) -> DataFrame:
        cos = _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm"))
        w = W.partitionBy(id_col).orderBy(F.col("ccos").desc(), F.col("cent_id"))
        return (side.crossJoin(F.broadcast(cents))
                .select(id_col, "v", "nrm", "cent_id", cos.alias("ccos"))
                .withColumn("crank", F.row_number().over(w))
                .filter(F.col("crank") <= n)
                .drop("ccos", "crank"))

    assigned = nearest_cells(e, "vec_id", 1)
    q = (e.filter(F.col("vec_id") % QUERY_MOD == 0)
         .select(F.col("vec_id").alias("query_id"), "v", "nrm"))
    probes = nearest_cells(q, "query_id", N_PROBE) \
        .select("query_id", F.col("v").alias("qv"), F.col("nrm").alias("qnrm"),
                "cent_id")
    pairs = (assigned.join(probes, "cent_id")
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


SQL_ANN_IVF = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  {_SQL_NORM.format(a="(embedding::DOUBLE[])")} AS nrm
           FROM embeddings),
cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM e
          WHERE vec_id % {CENT_MOD} = 0),
assigned AS (
  SELECT vec_id, v, nrm, cent_id FROM (
    SELECT e.vec_id, e.v, e.nrm, c.cent_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_SQL_DOT.format(a="e.v", b="c.cv")} / (e.nrm * c.cnrm) DESC,
                      c.cent_id) AS crank
    FROM e CROSS JOIN cents c)
  WHERE crank <= 1
),
probes AS (
  SELECT query_id, qv, qnrm, cent_id FROM (
    SELECT q.vec_id AS query_id, q.v AS qv, q.nrm AS qnrm, c.cent_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_SQL_DOT.format(a="q.v", b="c.cv")} / (q.nrm * c.cnrm) DESC,
                      c.cent_id) AS crank
    FROM e q CROSS JOIN cents c WHERE q.vec_id % {QUERY_MOD} = 0)
  WHERE crank <= {N_PROBE}
),
pairs AS (
  SELECT p.query_id, a.vec_id,
         {_SQL_DOT.format(a="p.qv", b="a.v")} / (p.qnrm * a.nrm) AS cos
  FROM assigned a JOIN probes p USING (cent_id)
  WHERE a.vec_id <> p.query_id
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
    "ann_ivf_topk": (q_ann_ivf_topk, SQL_ANN_IVF),
}
