"""Shard-export writer: materialize the deterministic shuffle+shard
layout (operators/curation.py shard_layout) as trainer-facing parquet —
one directory per shard, file row order == curriculum order.

Why the plan is right at 10^12 docs:

* `repartition(n_shards, "shard")` then `sortWithinPartitions("shard",
  "pos")` is ONE hash exchange + a per-task sort; `partitionBy("shard")`
  at write time then splits nothing in the common case (each task holds
  whole shards), so every `shard=K/` directory receives files whose ROW
  ORDER IS pos order — parquet preserves within-file row order, which is
  the property a sequential data loader consumes.  Hash collisions of
  shard keys into one task (or AQE splits) only change file COUNT, never
  within-file order, because the sort key leads with `shard`.
* the manifest is recomputed FROM THE WRITTEN FILES, not from the input
  — the returned counts double as a write verification.
* text is carried through the exchange because the trainer reads it; at
  real scale this is the one unavoidable full-data shuffle of an export
  (the layout columns alone would avoid it, but then the reader pays a
  join — the written-corpus form is the point of the job).

Reference scope: the reference service returns its extraction as one
JSON response (`/root/reference/app/api.py:82-96` — the "sink" is the
HTTP reply); a 100 TB corpus needs a layout sink instead, which is this
job plus io/icelite.py for snapshotted tables.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.curation import N_SHARDS, shard_layout


@dataclass(frozen=True)
class ShardManifest:
    n_shards: int
    n_docs: int
    total_tokens: int
    per_shard: dict[int, tuple[int, int]]  # shard -> (n_docs, tokens)


def run_shard_export(spark: SparkSession, docs: DataFrame, out_dir: str,
                     n_shards: int = N_SHARDS) -> ShardManifest:
    laid = shard_layout(docs, n_shards=n_shards)
    full = laid.join(docs.select("doc_id", "text"), "doc_id")
    (full.repartition(n_shards, "shard")
         .sortWithinPartitions("shard", "pos")
         .write.partitionBy("shard").mode("overwrite").parquet(out_dir))
    # manifest from the written files (read-back verification)
    written = spark.read.parquet(out_dir)
    rows = (written.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("tokens").alias("t"))
            .collect())
    per = {int(r["shard"]): (int(r["n"]), int(r["t"])) for r in rows}
    return ShardManifest(
        n_shards=n_shards,
        n_docs=sum(n for n, _ in per.values()),
        total_tokens=sum(t for _, t in per.values()),
        per_shard=per)
