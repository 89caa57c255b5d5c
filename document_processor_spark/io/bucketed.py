"""Bucketed-table layout: shuffle-free co-located joins.

At 100 TB the dominant join cost is the shuffle that hash-partitions both
sides onto the join key.  Spark's bucketed tables pay that shuffle ONCE at
write time: `bucketBy(n, key)` hash-splits every output file set into n
buckets per partition, records the layout in the catalog, and every later
equi-join (or aggregation) on the key between tables with compatible
bucket counts is planned WITHOUT an Exchange on either side — the
SortMergeJoin zips bucket i against bucket i directly off the scan, and
`sortBy(key)` at write time additionally removes the per-task Sort.

This is the Iceberg `bucket(n, col)` partition-transform analog for the
snapshot tables IceLite models (icelite.py) — on a real cluster the same
layout comes from writing the Iceberg table with a bucket transform, and
Spark's storage-partitioned joins give the identical no-shuffle plan.

tests/test_bucketed_join.py asserts the plan property (zero Exchange, a
SortMergeJoin straight over the scans) rather than trusting this comment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   path: str | None = None) -> None:
    """Persist df as a parquet table bucketed (and sorted) on `key`.

    `path` makes the table external (data at path, metadata in the session
    catalog) — tests point this at a tmpdir; a cluster run omits it and
    lands in the warehouse.  The bucket count is the co-location contract:
    joins between tables bucketed on the same key shuffle neither side
    when the counts match (and only the smaller side when one count
    divides the other)."""
    w = (df.write.mode("overwrite").format("parquet")
         .bucketBy(n_buckets, key).sortBy(key))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def cobucketed_join(spark: SparkSession, left: str, right: str,
                    key: str) -> DataFrame:
    """Equi-join two bucketed tables on their bucket key.  With compatible
    bucket layouts the physical plan contains no Exchange: each task reads
    bucket i of both tables and merge-joins in place."""
    return spark.table(left).join(spark.table(right), key)
