#!/usr/bin/env python
"""Diagnostic: per-run extraction wall times at one parallelism level.

Usage: SPARK_GRAFT_CPUS=8 python BENCH/diag_thread_scaling.py [n_runs] [rep]
Prints every run's wall time so warm-up convergence is visible.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from document_processor_spark import fixtures, pipeline
from document_processor_spark.session import build_spark


def main() -> int:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    engine = os.environ.get("SPARK_GRAFT_ENGINE", "sql")
    sf = float(os.environ.get("SPARK_GRAFT_SF", "0.1"))

    spark = build_spark(app="diag", cores=cpus,
                        shuffle_partitions=max(cpus * 2, 16))
    base = fixtures.corpus_df(spark, sf, n_partitions=max(cpus, 16))
    corpus = (base.crossJoin(spark.range(rep).select(F.col("id").alias("rep")))
              .select(F.concat_ws("#", "doc_id", "rep").alias("doc_id"), "spans")
              .repartition(max(cpus * 2, 16), "doc_id")
              .persist())
    n_docs = corpus.count()
    print(f"cpus={cpus} rep={rep} docs={n_docs} engine={engine}", flush=True)

    for i in range(n_runs):
        t0 = time.perf_counter()
        result, in_obs, out_obs = pipeline.extract_with_metrics(corpus, engine=engine)
        result.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"run {i}: {dt:.2f}s  ({n_docs/dt:.0f} docs/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
